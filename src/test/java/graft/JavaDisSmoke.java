package graft;

import java.util.Arrays;
import java.util.List;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

/**
 * Java-API parity smoke for the dis connector: the reference ships Java
 * wrappers and a Java subscribe demo
 * (demo/java/.../DISSparkStreamingSubscribeJavaExample.java:77-106); the
 * DSv2/DataFrame surface must be equally usable from plain Java with no
 * Scala-only types at the call boundary. Driven from JavaParitySpec.
 */
public final class JavaDisSmoke {

    private JavaDisSmoke() {}

    /** Write 3 records through format("dis"), read them back through the
     * batch scan, return the distinct value count. */
    public static long writeReadRoundtrip(SparkSession spark, String root) {
        StructType schema = DataTypes.createStructType(Arrays.asList(
            DataTypes.createStructField("key", DataTypes.StringType, true),
            DataTypes.createStructField("value", DataTypes.StringType, false),
            DataTypes.createStructField("partition", DataTypes.IntegerType, false)));
        List<Row> rows = Arrays.asList(
            RowFactory.create("k0", "java-v0", 0),
            RowFactory.create("k1", "java-v1", 1),
            RowFactory.create("k2", "java-v2", 0));
        spark.createDataFrame(rows, schema)
            .write().format("dis")
            .option("client.root", root).option("stream", "javastream")
            .mode("append").save();

        Dataset<Row> back = spark.read().format("dis")
            .option("client.root", root).option("stream", "javastream")
            .load();
        return back.selectExpr("cast(value as string) AS v").distinct().count();
    }
}
