package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The read side of the opt-in idempotent sink
  * (`option("exactlyOnceKey", "true")`, see [[DisDataWriter]]): records
  * carry an `XO1:<epoch>:<taskPartition>:<seq>:` identity envelope in
  * their key; [[view]] strips it and keeps exactly ONE copy per
  * identity — the keep-first pattern (min (partition, offset) wins, so
  * the surviving copy is deterministic). At-least-once duplicates from
  * replayed epochs or task retries carry the SAME identity (the
  * idempotent-producer contract) and collapse; records without an
  * envelope (plain writes into the same stream) pass through untouched.
  *
  * Scale shape: one per-row parse kernel (shuffle-free), then a keyed
  * keeper agg on the identity token with map-side partial combine —
  * the q_dedup_exact shape; duplicates collapse per-task before the
  * exchange. */
object DisExactlyOnce {

  private val MagicStr = "XO1:"
  private val Magic: Array[Byte] = MagicStr.getBytes("UTF-8")

  /** Wrap a user key in the identity envelope:
    * `XO1:<epoch>:<taskPartition>:<seq>:K<userKey>` (or `...:N` when
    * the user key is null — a flag, not a sentinel byte, so every
    * user-key byte string round-trips exactly). */
  private[sources] def envelope(epoch: Long, taskPartition: Int, seq: Long,
      userKey: Array[Byte]): Array[Byte] = {
    val head = s"$MagicStr$epoch:$taskPartition:$seq:${if (userKey == null) "N" else "K"}"
      .getBytes("UTF-8")
    if (userKey == null) head else head ++ userKey
  }

  /** Parse an enveloped key → (identity token, user key); null token if
    * the key carries no (well-formed) envelope. */
  private[sources] def parse(key: Array[Byte]): (String, Array[Byte]) = {
    if (key == null || key.length < Magic.length + 6) return (null, key)
    var i = 0
    while (i < Magic.length) { if (key(i) != Magic(i)) return (null, key); i += 1 }
    // three ':'-terminated decimal fields, then the K/N flag + ':'-free tail
    var fields = 0
    val start = i
    while (i < key.length && fields < 3) {
      val c = key(i)
      if (c == ':') fields += 1
      else if (c < '0' || c > '9') return (null, key)
      i += 1
    }
    if (fields < 3 || i >= key.length) return (null, key)
    val flag = key(i)
    val tok = new String(key, start, i - start - 1, "UTF-8")
    if (flag == 'N' && i == key.length - 1) (tok, null)
    else if (flag == 'K') (tok, java.util.Arrays.copyOfRange(key, i + 1, key.length))
    else (null, key)
  }

  /** Exactly-once view over a batch read of an exactlyOnceKey-written
    * stream: same schema as the dis source (key restored to the USER
    * key), one row per identity. */
  def view(df: DataFrame): DataFrame = {
    val cols = df.columns
    val ki = cols.indexOf("key")
    require(ki >= 0, s"view needs the dis read schema (key column), got ${df.schema.simpleString}")
    val enc = Encoders.row(StructType(
      StructField("__tok", StringType) +: df.schema.fields))
    val parsed = df.mapPartitions { it =>
      it.map { r =>
        val (tok, userKey) = parse(r.getAs[Array[Byte]](ki))
        Row.fromSeq(tok +: r.toSeq.updated(ki, userKey))
      }
    }(enc)
    val plain = parsed.filter(col("__tok").isNull).drop("__tok")
    // keep-first: min (partition, offset) — deterministic keeper; a
    // keyed agg with map-side combine, never a window over the stream
    val orderCols = Seq("partition", "offset").filter(cols.contains) ++
      cols.filterNot(c => c == "partition" || c == "offset")
    val deduped = parsed.filter(col("__tok").isNotNull)
      .groupBy(col("__tok"))
      .agg(min(struct(orderCols.map(col): _*)).as("__r"))
      .select(cols.map(c => col(s"__r.$c").as(c)): _*)
    deduped.unionByName(plain)
  }
}
