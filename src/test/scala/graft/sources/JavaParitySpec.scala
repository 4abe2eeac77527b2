package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** Drives the plain-Java smoke (src/test/java/graft/JavaDisSmoke.java):
  * proves the DSv2 surface is consumable from Java exactly like the
  * reference's Java demo consumed its DStream wrappers. */
class JavaParitySpec extends SparkTestBase {
  test("Java write + batch read round-trip through format(\"dis\")") {
    val root = Files.createTempDirectory("java-smoke-").toString
    new FileStreamClient(java.nio.file.Paths.get(root)).createStream("javastream", 2)
    assert(graft.JavaDisSmoke.writeReadRoundtrip(spark, root) === 3L)
  }
}
