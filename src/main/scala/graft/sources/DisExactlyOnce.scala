package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The read side of the opt-in idempotent sink
  * (`option("exactlyOnceKey", "true")`, see [[DisDataWriter]]): records
  * carry an `XO2:<writerId>:<epoch>:<taskPartition>:<seq>:` identity
  * envelope in their key; [[view]] strips it and keeps exactly ONE copy
  * per identity — the keep-first pattern (min (partition, offset) wins,
  * so the surviving copy is deterministic). At-least-once duplicates
  * from replayed epochs or task retries carry the SAME identity (the
  * idempotent-producer contract) and collapse; records without an
  * envelope (plain writes into the same stream) pass through untouched.
  *
  * The `writerId` field scopes the (epoch, partition, seq) sequence to
  * one logical producer — Kafka's idempotent producer scopes sequence
  * numbers by a producer id for the same reason. Without it, two batch
  * jobs reusing an epoch, or a restarted streaming query with a FRESH
  * checkpoint (epochs restart at 0), would mint identical identities
  * for different records and the view would silently drop all but one.
  * The id must be stable across retries/restarts of the SAME logical
  * query (the writer derives it from `exactlyOnceWriterId` or the
  * checkpoint location) and distinct between independent writers.
  *
  * Known hazard (documented, not defended): a PLAIN record whose user
  * key happens to match the full envelope grammar (`XO2:` + four
  * all-digit fields + `K`/`N` flag) is indistinguishable from an
  * enveloped one and will be treated as such. If a stream is known to
  * be fully enveloped, pass `strict = true` to [[view]] and any
  * non-parsing key fails loudly instead of passing through.
  *
  * Upgrade caveat: v1 and v2 identities never collide BY DESIGN, which
  * also means a batch written as v1, crashed before its streaming
  * commit, and REPLAYED by an upgraded (v2-writing) binary produces
  * v2 identities that do not collapse against the v1 copies already
  * on the wire — that batch duplicates through the view. Upgrade a
  * live exactly-once query only at a committed checkpoint (let the
  * old binary finish its in-flight batch first).
  *
  * Scale shape: one per-row parse kernel (shuffle-free), then a keyed
  * keeper agg on the identity token with map-side partial combine —
  * the q_dedup_exact shape; duplicates collapse per-task before the
  * exchange. */
object DisExactlyOnce {

  // v2 (current writer): 4 fields incl. writer id. v1 (legacy, no
  // writer id) is still accepted on read; its tokens are prefixed with
  // their version so v1/v2 identities can never collide.
  private val MagicStr = "XO2:"

  /** Stable non-negative writer id from a caller-supplied identity
    * string (FNV-1a 64, masked to keep the envelope grammar decimal). */
  private[sources] def writerId(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    h & Long.MaxValue
  }

  /** Canonical form of a checkpoint location for writer-id derivation.
    * The id must be stable across restarts of the same query, but a
    * raw-string hash changes under COSMETIC path differences — a
    * trailing slash, `file:` vs `file://` vs no scheme, an unresolved
    * `.`/`..` segment — and a replayed in-flight batch would then mint
    * a non-colliding identity and duplicate through the view. This is
    * purely SYNTACTIC (it runs executor-side, where resolving a
    * relative path against a cwd would itself be unstable):
    * URI-normalize dot segments, default the scheme to `file`
    * (dropping an empty/localhost file authority), and strip trailing
    * slashes. Query and fragment components are PRESERVED — two
    * checkpoint URIs differing only there are different locations and
    * must not collide into one writer id. Spark hands sinks a
    * fully-qualified absolute checkpoint URI, so the
    * relative-vs-absolute case does not arise from the engine; callers
    * passing the option by hand should pass an absolute path
    * (documented on the writer option).
    *
    * ONE-TIME ID MIGRATION (round-12 → 13 canonicalization change,
    * documented on the writer option): a checkpoint that previously
    * hashed raw (e.g. `/tmp/ck/q1`) now hashes its canonical form
    * (`file:///tmp/ck/q1`), so the FIRST restart after upgrading mints
    * a new writer identity — an in-flight batch replayed across that
    * upgrade boundary can duplicate once through the exactly-once view
    * (exactly the window the canonicalization closes for every restart
    * after it). Writers that must upgrade with work in flight should
    * pin `exactlyOnceWriterId` explicitly (it hashes as-is, bypassing
    * canonicalization entirely), or drain before upgrading. */
  private[sources] def canonicalCheckpoint(s: String): String = {
    val trimmed = s.trim
    def stripSlashes(p: String): String = {
      var e = p.length
      while (e > 1 && p.charAt(e - 1) == '/') e -= 1
      p.substring(0, e)
    }
    try {
      val u = new java.net.URI(trimmed).normalize()
      val scheme = Option(u.getScheme).getOrElse("file").toLowerCase
      val auth = Option(u.getAuthority)
        .filterNot(a => a.isEmpty || (scheme == "file" && a == "localhost"))
        .getOrElse("")
      val path = stripSlashes(Option(u.getPath).filter(_.nonEmpty)
        .orElse(Option(u.getSchemeSpecificPart)).getOrElse(""))
      val query = Option(u.getQuery).map("?" + _).getOrElse("")
      val fragment = Option(u.getFragment).map("#" + _).getOrElse("")
      s"$scheme://$auth$path$query$fragment"
    } catch {
      // not URI-parseable (spaces, odd chars): best-effort stable form
      case _: Exception => stripSlashes(trimmed)
    }
  }

  /** Wrap a user key in the identity envelope:
    * `XO2:<writerId>:<epoch>:<taskPartition>:<seq>:K<userKey>` (or
    * `...:N` when the user key is null — a flag, not a sentinel byte,
    * so every user-key byte string round-trips exactly). */
  private[sources] def envelope(writerId: Long, epoch: Long, taskPartition: Int,
      seq: Long, userKey: Array[Byte]): Array[Byte] = {
    val head =
      s"$MagicStr$writerId:$epoch:$taskPartition:$seq:${if (userKey == null) "N" else "K"}"
        .getBytes("UTF-8")
    if (userKey == null) head else head ++ userKey
  }

  /** Parse an enveloped key → (identity token, user key); null token if
    * the key carries no (well-formed) envelope. Accepts v2 (4 fields)
    * and legacy v1 (3 fields); every field needs >= 1 digit, so
    * degenerate shapes like `XO2::::N` are plain keys, not envelopes. */
  private[sources] def parse(key: Array[Byte]): (String, Array[Byte]) = {
    if (key == null || key.length < 7) return (null, key)
    if (key(0) != 'X' || key(1) != 'O' || key(3) != ':') return (null, key)
    val nFields = key(2) match {
      case '1' => 3
      case '2' => 4
      case _   => return (null, key)
    }
    var i = 4
    var fields = 0
    var digits = 0
    while (i < key.length && fields < nFields) {
      val c = key(i)
      if (c == ':') {
        if (digits == 0) return (null, key)
        fields += 1; digits = 0
      } else if (c >= '0' && c <= '9') digits += 1
      else return (null, key)
      i += 1
    }
    if (fields < nFields || i >= key.length) return (null, key)
    val flag = key(i)
    // token keeps the version prefix: "XO1:…" and "XO2:…" never collide
    val tok = new String(key, 0, i - 1, "UTF-8")
    if (flag == 'N' && i == key.length - 1) (tok, null)
    else if (flag == 'K') (tok, java.util.Arrays.copyOfRange(key, i + 1, key.length))
    else (null, key)
  }

  /** Exactly-once view over a batch read of an exactlyOnceKey-written
    * stream: same schema as the dis source (key restored to the USER
    * key), one row per identity. With `strict = true`, a record whose
    * key does not parse as an envelope fails the job loudly instead of
    * passing through — use when the stream is known to be fully
    * enveloped (kills the envelope-looking-user-key hazard). */
  def view(df: DataFrame, strict: Boolean = false): DataFrame = {
    val cols = df.columns
    val ki = cols.indexOf("key")
    require(ki >= 0, s"view needs the dis read schema (key column), got ${df.schema.simpleString}")
    val enc = Encoders.row(StructType(
      StructField("__tok", StringType) +: df.schema.fields))
    val parsed = df.mapPartitions { it =>
      it.map { r =>
        val raw = r.getAs[Array[Byte]](ki)
        val (tok, userKey) = parse(raw)
        if (strict && tok == null) throw new IllegalStateException(
          "strict exactly-once view hit a record without a well-formed " +
            s"identity envelope (key = ${if (raw == null) "null" else new String(raw, "UTF-8")})")
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
