package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north star): media as opaque `binary`
  * columns with typed metadata, processed in batched per-partition
  * passes — the Scala analog of a Pandas-UDF/mapInPandas media
  * pipeline.
  *
  * Decode dispatches on the blob's magic bytes: real PNGs decode
  * through JDK ImageIO to luminance pixels (an actual codec, no extra
  * deps); other blobs use a deterministic byte-stream interpretation —
  * the fixture path, since the text-derived fixtures are not images
  * (audio/video codecs would plug into the same dispatch). The
  * blob/metadata schema, partition-batched iteration, feature schema
  * and frame-sampling arithmetic are the production shape either way.
  *
  * Scale notes: blobs never pass through a shuffle (all ops are
  * per-row/per-partition); metadata-only predicates prune on parquet
  * column stats without touching blob bytes.
  */
object MultimodalQueries {

  // JVM-global, set on object init (driver AND executor: any kernel
  // reaching encode/decode loads this object first). See the note on
  // DecodeStub for why the default disk-backed stream cache is a trap.
  javax.imageio.ImageIO.setUseCache(false)

  /** Blob decoder. Real PNG blobs (sniffed by magic bytes) decode
    * through JDK ImageIO to row-major grayscale pixels — an actual
    * media codec, zero extra dependencies. Anything else falls back to
    * the byte-stream interpretation (the deterministic stand-in used by
    * the text-derived fixtures, whose DuckDB oracle works per byte).
    * Formats the JDK can't decode (jpeg2000, webp, ...) would plug in
    * here behind the same sniff-and-dispatch; the call site, batching
    * and output contract never change. */
  object DecodeStub {
    // ImageIO's DEFAULT stream cache is disk-backed: every read/write
    // through it creates (and deletes) a temp FILE. At one blob per row
    // that is thousands of filesystem round-trips per task — measured as
    // multi-× run-to-run swings tracking /tmp state. The blobs are tiny;
    // the outer object's init caches in memory instead.

    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

    def isPng(blob: Array[Byte]): Boolean =
      blob.length >= PngMagic.length && java.util.Arrays.equals(
        java.util.Arrays.copyOf(blob, PngMagic.length), PngMagic)

    /** JPEG/JFIF sniff: every JPEG stream starts SOI (FF D8) followed by
      * a marker byte FF — three bytes are enough to dispatch and short
      * enough to never false-positive on the ASCII fixtures. */
    def isJpeg(blob: Array[Byte]): Boolean =
      blob.length >= 3 && blob(0) == 0xff.toByte && blob(1) == 0xd8.toByte &&
        blob(2) == 0xff.toByte

    def isImage(blob: Array[Byte]): Boolean = isPng(blob) || isJpeg(blob)

    private def readImage(blob: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      require(img != null, "ImageIO could not decode image blob")
      img
    }

    /** Row-major luminance (0-255, ITU-R BT.601 integer weights) of a
      * decoded image — deterministic across JVMs: PNG is lossless and
      * the weights are fixed integer arithmetic. */
    private def luminance(img: java.awt.image.BufferedImage): Array[Int] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          out(y * w + x) = (r * 299 + g * 587 + b * 114) / 1000
          x += 1
        }
        y += 1
      }
      out
    }

    def decodePng(blob: Array[Byte]): Array[Int] = luminance(readImage(blob))

    def decode(blob: Array[Byte]): Array[Int] =
      if (isImage(blob)) luminance(readImage(blob)) else blob.map(b => (b & 0xff))

    /** Decode keeping true dimensions: PNGs/JPEGs report the codec's
      * (w, h); raw byte blobs are a 1-row stream (len, 1). Row-major
      * pixels. One codec pass — dims come from the same decoded image. */
    def decodeWithDims(blob: Array[Byte]): (Int, Int, Array[Int]) =
      if (isImage(blob)) {
        val img = readImage(blob)
        (img.getWidth, img.getHeight, luminance(img))
      } else (blob.length, 1, blob.map(b => (b & 0xff)))

    /** Nearest-neighbor resize of a row-major w×h pixel array to
      * tw×th: out(y,x) = in(⌊y·h/th⌋, ⌊x·w/tw⌋) — the standard integer
      * index map, deterministic, separable per axis (so the 1-row case
      * reduces to 1-D stream resampling). */
    def resizeNearest(px: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
      require(w > 0 && h > 0 && tw > 0 && th > 0, s"bad dims $w x $h -> $tw x $th")
      val out = new Array[Int](tw * th)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          out(y * tw + x) = px(sy * w + (x.toLong * w / tw).toInt)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Deterministic multimodal table derived from `documents`: blob =
    * UTF-8 bytes of text (stand-in for image bytes), metadata struct
    * typed like an image header.
    *
    * The text is normalized to printable ASCII before encoding: the
    * Spark side computes byte-level stats while the DuckDB oracle works
    * per character, and the two only agree when bytes == characters.
    * (The real pipeline has no oracle and drops this normalization.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(regexp_replace(col("text"), "[^ -~]", ""), "UTF-8").as("blob"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
          .otherwise("webp").as("format"),
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height")).as("meta"))

  /** Metadata + blob-stat projection: the "don't decode what you can
    * prune" path — only header fields and byte-level stats, no decode. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width").cast("long"),
      col("meta.height").as("height").cast("long"),
      length(col("blob")).cast("long").as("blob_len"),
      ascii(decode(substring(col("blob"), 1, 1), "UTF-8")).cast("long").as("first_byte"))

  val metaOracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
      |  (n_chars % 640 + 1)::BIGINT AS width,
      |  (n_chars % 480 + 1)::BIGINT AS height,
      |  octet_length(encode(regexp_replace(text, '[^ -~]', '', 'g')))::BIGINT AS blob_len,
      |  ascii(substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 1))::BIGINT AS first_byte
      |FROM documents""".stripMargin

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("hist", ArrayType(LongType)),
    StructField("n_frames", LongType),
    StructField("sampled_sum", LongType)))

  /** Feature extraction through the stubbed decoder, batched per
    * partition (mapPartitions = the mapInPandas batch shape):
    *  - hist: 16-bucket histogram of decoded values mod 16
    *  - n_frames: blob sliced into 256-byte "frames" (frame-sample
    *    analog), count
    *  - sampled_sum: sum of the first decoded value of every 4th frame
    */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    features(mediaTable(spark, dir).select(col("doc_id"), col("blob")))

  /** The feature kernel on any (id: long, blob: binary) frame — decode
    * dispatches per blob, so text stand-ins and real PNGs mix freely. */
  def features(media: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val px = DecodeStub.decode(r.getAs[Array[Byte]](1))
        val hist = new Array[Long](16)
        px.foreach(v => hist(v % 16) += 1)
        val frames = px.grouped(256).toArray
        val sampled = frames.indices.collect {
          case i if i % 4 == 0 => frames(i).head.toLong
        }.sum
        Row(docId, hist.toSeq, frames.length.toLong, sampled)
      }
    }(enc)
      // scalar rows (doc_id, bucket, cnt, ...) rather than an array
      // column: hash-compare friendly and shuffle-free either way
      .select(col("doc_id"), posexplode(col("hist")),
        col("n_frames"), col("sampled_sum"))
      .select(col("doc_id"), col("pos").cast("long").as("bucket"),
        col("col").as("cnt"), col("n_frames"), col("sampled_sum"))
  }

  /** Fixture-derived REAL-PNG media table: each document's normalized
    * bytes become a 1×n TYPE_INT_RGB image (r=g=b=byte) encoded through
    * JDK ImageIO's PNG writer. PNG is lossless and the BT.601 integer
    * luminance of a gray pixel is the identity ((v·299+v·587+v·114)/1000
    * = v), so the decoded pixel stream equals the source bytes exactly —
    * which is what lets the production ImageIO decode path sit under the
    * driver's DuckDB hash oracle instead of a weaker rows-only check.
    * (TYPE_INT_RGB, not TYPE_BYTE_GRAY: Java converts gray color space
    * through a gamma ramp in getRGB, which would break the identity.)
    * Encode is CPU-bound per row → repartition off the single fixture
    * split before the kernel. */
  def pngMediaTable(spark: SparkSession, dir: String): DataFrame =
    grayPngTable(spark, dir, width = 0, minBytes = 1)

  /** Row-major gray PNG of `bytes(0 until w*h)` (r=g=b=byte — see
    * [[pngMediaTable]] for why TYPE_INT_RGB keeps the round-trip
    * byte-exact). */
  private def encodeGrayPng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val v = bytes(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", baos), "no PNG writer registered")
    baos.toByteArray
  }

  /** Fixture bytes → real gray PNGs. `width = 0` keeps the 1×n stream
    * shape; `width > 0` builds TRUE 2-D images — row-major width×h with
    * h = len/width, the trailing partial row dropped (codecs don't do
    * ragged rows). Encode is CPU-bound per row → repartition off the
    * single fixture split. */
  private def grayPngTable(spark: SparkSession, dir: String,
      width: Int, minBytes: Int): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    mediaTable(spark, dir).select(col("doc_id"), col("blob"))
      .filter(length(col("blob")) >= minBytes) // ImageIO needs w,h ≥ 1
      .transform(Spread.widen)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val w = if (width > 0) width else bytes.length
          val h = if (width > 0) bytes.length / width else 1
          Row(r.getLong(0), encodeGrayPng(bytes, w, h))
        }
      }(enc)
  }

  /** Row-major gray JPEG of `bytes` at explicit quality 0.92. Same
    * TYPE_INT_RGB gray trick as [[encodeGrayPng]]; unlike PNG the codec
    * is LOSSY, so only the geometry survives bit-exactly — which is
    * exactly what [[qMultimodalJpeg]] grades. Quality is pinned
    * MODE_EXPLICIT (not the writer default) so the encoded stream is
    * stable against JDK default changes. */
  private def encodeGrayJpeg(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < w * h) {
      val v = bytes(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.92f)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Fixture bytes → real 64-wide gray JPEGs (h = len/64, trailing
    * partial row dropped — same geometry contract as the 2-D PNG
    * table). Encode is CPU-bound per row → conditional widen off the
    * single fixture split. */
  def jpegMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    mediaTable(spark, dir).select(col("doc_id"), col("blob"))
      .filter(length(col("blob")) >= 64)
      .transform(Spread.widen)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), encodeGrayJpeg(bytes, 64, bytes.length / 64))
        }
      }(enc)
  }

  private val jpegSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_px", LongType)))

  /** The graded JPEG entry: encode fixtures as genuine 64×h JPEGs,
    * sniff-dispatch into the ImageIO decode path, and emit the
    * codec-reported geometry. JPEG is lossy so pixel VALUES can't sit
    * under a cross-engine hash oracle (and are codec-version
    * sensitive) — but the geometry is lossless and deterministic from
    * the fixture length, so dims + pixel count get the full hash
    * check; pixel-error bounds live in MultimodalSpec. */
  def qMultimodalJpeg(spark: SparkSession, dir: String): DataFrame = {
    val enc = Encoders.row(jpegSchema)
    jpegMediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](1)
        require(DecodeStub.isJpeg(blob), "jpegMediaTable emitted a non-JPEG blob")
        val (w, h, px) = DecodeStub.decodeWithDims(blob)
        Row(r.getLong(0), w.toLong, h.toLong, px.length.toLong)
      }
    }(enc)
  }

  val jpegOracle: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    octet_length(encode(regexp_replace(text, '[^ -~]', '', 'g'))) AS len
      |  FROM documents
      |)
      |SELECT doc_id, 64::BIGINT AS width, (len // 64)::BIGINT AS height,
      |  (64 * (len // 64))::BIGINT AS n_px
      |FROM n WHERE len >= 64""".stripMargin

  /** The graded real-codec entry: encode fixtures as actual PNGs, decode
    * them back through [[DecodeStub.decodePng]] (magic-byte dispatch
    * selects the ImageIO path), extract the same feature set as
    * [[qMultimodalFeatures]]. Identical output contract ⇒ identical
    * oracle, but the bytes flowing through `features` are genuine PNG. */
  def qMultimodalPng(spark: SparkSession, dir: String): DataFrame =
    features(pngMediaTable(spark, dir))

  val pngOracle: String =
    """WITH px AS (
      |  SELECT doc_id, list_transform(
      |    string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> ascii(c)) AS p
      |  FROM documents
      |)
      |SELECT doc_id, b.b::BIGINT AS bucket,
      |  len(list_filter(p, x -> x % 16 = b.b))::BIGINT AS cnt,
      |  ((len(p) + 255) // 256)::BIGINT AS n_frames,
      |  list_sum(list_transform(range(0, (len(p) + 255) // 256),
      |    f -> CASE WHEN f % 4 = 0 THEN p[(f * 256 + 1)::INT] ELSE 0 END))::BIGINT AS sampled_sum
      |FROM px, (SELECT unnest(range(0, 16)) AS b) b
      |WHERE len(p) > 0""".stripMargin

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("pos", LongType),
    StructField("v", LongType)))

  /** Nearest-neighbor resize to tw×th over any (id, blob) frame,
    * batched per partition: decode (magic-byte dispatch — real codec
    * for PNGs) → resizeNearest → one scalar row per target pixel.
    * The fixed target shape is what a training pipeline feeds a vision
    * tower; emitting scalars keeps the gate hash-comparable (no array
    * columns) and the op shuffle-free. */
  def resample(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val enc = Encoders.row(resizeSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, px) = DecodeStub.decodeWithDims(r.getAs[Array[Byte]](1))
        val out = DecodeStub.resizeNearest(px, w, h, tw, th)
        out.iterator.zipWithIndex.map { case (v, i) =>
          Row(r.getLong(0), i.toLong, v.toLong)
        }
      }
    }(enc)
  }

  /** Graded resize entry: fixture docs → genuine PNG encode →
    * production decode (true codec dims) → nearest-neighbor resize to a
    * 64×1 thumbnail. The PNG round-trip is byte-exact (see
    * [[pngMediaTable]]), so the target pixels equal 1-D resampling of
    * the source bytes — which the SQL oracle states directly. */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    resample(pngMediaTable(spark, dir), 64, 1)

  val resizeOracle: String =
    """WITH px AS (
      |  SELECT doc_id, list_transform(
      |    string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> ascii(c)) AS p
      |  FROM documents
      |)
      |SELECT doc_id, i.i::BIGINT AS pos, p[(i.i * len(p) // 64 + 1)::INT]::BIGINT AS v
      |FROM px, (SELECT unnest(range(0, 64)) AS i) i
      |WHERE len(p) > 0""".stripMargin

  /** Graded TRUE-2-D resize entry: 64-wide PNGs (h = len/64 rows of
    * fixture bytes, real codec geometry) → production decode → 8×8
    * thumbnail. Unlike [[qMultimodalResize]] (whose 1×n fixtures reduce
    * the index map to 1-D resampling), this pins the full 2-D map
    * out(y,x) = in(⌊y·h/8⌋·64 + ⌊x·64/8⌋) under the hash oracle, which
    * states it directly against the byte stream. */
  def qMultimodalResize2d(spark: SparkSession, dir: String): DataFrame =
    resample(grayPngTable(spark, dir, width = 64, minBytes = 64), 8, 8)

  val resize2dOracle: String =
    """WITH px AS (
      |  SELECT doc_id, list_transform(
      |    string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> ascii(c)) AS p
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, p, len(p) // 64 AS h FROM px WHERE len(p) >= 64
      |)
      |SELECT doc_id, (y.y * 8 + x.x)::BIGINT AS pos,
      |  p[((y.y * h // 8) * 64 + (x.x * 64 // 8) + 1)::INT]::BIGINT AS v
      |FROM d, (SELECT unnest(range(0, 8)) AS y) y,
      |       (SELECT unnest(range(0, 8)) AS x) x""".stripMargin

  val featuresOracle: String =
    """WITH px AS (
      |  SELECT doc_id, list_transform(
      |    string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> ascii(c)) AS p
      |  FROM documents
      |)
      |SELECT doc_id, b.b::BIGINT AS bucket,
      |  len(list_filter(p, x -> x % 16 = b.b))::BIGINT AS cnt,
      |  ((len(p) + 255) // 256)::BIGINT AS n_frames,
      |  list_sum(list_transform(range(0, (len(p) + 255) // 256),
      |    f -> CASE WHEN f % 4 = 0 THEN p[(f * 256 + 1)::INT] ELSE 0 END))::BIGINT AS sampled_sum
      |FROM px, (SELECT unnest(range(0, 16)) AS b) b""".stripMargin

  // ---------- blob-level dedup ----------

  private val PageBytes = 128

  /** Fixed-page blob dedup: blobs sliced into aligned 128-byte pages,
    * duplicate page groups by content digest with the canonical keeper
    * (min (doc, page)). This is the BLOCK-granular storage-dedup
    * baseline — alignment-sensitive, which is exactly the weakness
    * [[graft.api.Graft.cdcChunks]]' content-defined boundaries fix —
    * kept as the contrast point and for page-mapped stores where
    * alignment is free. One keyed agg on 16-byte digests; blobs never
    * shuffle, only page hashes. */
  def qBlobDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("blob"), length(col("blob")).as("__len"))
      .filter(col("__len") > 0)
      .select(col("doc_id"), col("blob"),
        explode(sequence(lit(0),
          ((col("__len") + (PageBytes - 1)) / PageBytes).cast("int") - 1)).as("__pg"))
      .select(col("doc_id"), col("__pg"),
        md5(expr(s"substring(blob, __pg * $PageBytes + 1, $PageBytes)")).as("page_md5"))
      // packed (doc, page) keeper: page count per doc ≪ 1e5, so the
      // integer min IS the lexicographic (doc, page) min — portable
      // where struct-min aggregation is not. The packing is injective
      // only for page < 1e5 and doc_id ∈ [0, MaxValue/1e5); out of
      // range must fail LOUDLY, never mis-attribute a keeper.
      .withColumn("__k0",
        when(col("__pg") < 100000L && col("doc_id").between(0L, Long.MaxValue / 100000L - 1L),
          col("doc_id") * 100000L + col("__pg"))
          .otherwise(raise_error(format_string(
            "blobDedup keeper packing out of range: doc_id=%d page=%d",
            col("doc_id"), col("__pg")))))
      .groupBy(col("page_md5"))
      .agg(count(lit(1)).as("cnt"), min(col("__k0")).as("__k"))
      .filter(col("cnt") > 1L)
      .select(col("page_md5"), col("cnt"),
        (col("__k") / 100000L).cast("long").as("keeper_doc"),
        pmod(col("__k"), lit(100000L)).as("keeper_page"))

  val blobDedupOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents
       |), pg AS (
       |  SELECT doc_id, i, md5(substr(t, (i * $PageBytes + 1)::INT, $PageBytes)) AS page_md5
       |  FROM d, unnest(range(0, (length(t) + ${PageBytes - 1}) // $PageBytes)) AS u(i)
       |  WHERE length(t) > 0
       |)
       |SELECT page_md5, count(*) AS cnt,
       |  (min(doc_id * 100000 + i) // 100000)::BIGINT AS keeper_doc,
       |  (min(doc_id * 100000 + i) % 100000)::BIGINT AS keeper_page
       |FROM pg GROUP BY page_md5 HAVING count(*) > 1""".stripMargin

  // ---------- perceptual hash ----------

  /** 64-bit average-hash (aHash, the classic perceptual fingerprint):
    * decode the real 64-wide gray PNG, resample to 8×8, set bit i iff
    * pixel i exceeds the thumbnail mean. Near-identical images get
    * near-identical hashes (hamming-banded pairing then follows the
    * [[DedupQueries]] simhash machinery). Emitted as hi/lo 32-bit
    * halves — bit 63 would overflow signed 64-bit in engines that
    * error rather than wrap. Shuffle work is (docs × 64) scalar rows,
    * never pixels of the original resolution. */
  def qPhash(spark: SparkSession, dir: String): DataFrame = {
    val px = resample(grayPngTable(spark, dir, width = 64, minBytes = 64), 8, 8)
    val mean = px.groupBy(col("doc_id"))
      .agg((sum(col("v")).cast("double") / 64.0).as("__mean"))
    px.join(mean, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("v").cast("double") > col("__mean") && col("pos") < 32L,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT))")).otherwise(0L))
          .as("phash_lo"),
        sum(when(col("v").cast("double") > col("__mean") && col("pos") >= 32L,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pos - 32 AS INT))")).otherwise(0L))
          .as("phash_hi"))
  }

  // def, not val: resize2dOracle is declared later in this object and a
  // forward val reference would interpolate null at init time
  def phashOracle: String =
    s"""WITH px AS ($resize2dOracle
       |), m AS (
       |  SELECT doc_id, sum(v)::DOUBLE / 64.0 AS mean FROM px GROUP BY doc_id
       |)
       |SELECT px.doc_id,
       |  sum(CASE WHEN px.v::DOUBLE > m.mean AND px.pos < 32
       |      THEN (1::BIGINT << px.pos::INT) ELSE 0 END)::BIGINT AS phash_lo,
       |  sum(CASE WHEN px.v::DOUBLE > m.mean AND px.pos >= 32
       |      THEN (1::BIGINT << (px.pos - 32)::INT) ELSE 0 END)::BIGINT AS phash_hi
       |FROM px JOIN m ON px.doc_id = m.doc_id
       |GROUP BY px.doc_id""".stripMargin

  private val PhashHam = 6

  /** Perceptual near-duplicate image pairs: aHash fingerprints within
    * hamming distance 6. Candidates come from the pigeonhole over 8
    * one-byte bands (≤ 7 differing bits ⇒ at least one band is
    * VERBATIM equal — complete for the threshold), so pairing is an
    * equi-join on (band, value), never all-pairs; the exact popcount
    * verify runs on candidates only — the [[DedupQueries.simhashOn]]
    * machinery at image granularity.
    *
    * Scale shape: the banding join runs over the DISTINCT signature
    * space, not the corpus — duplicate-heavy data collapses before any
    * quadratic step (the sf1 audit: 50k docs → 8.9k hashes; banding
    * docs directly put 290M candidate pairs through the verify because
    * one-byte bands saturate at 256 values, 78 s → banding hashes cuts
    * candidates ~250×). Doc multiplicity re-enters only through two
    * output-bounded joins: same-hash groups expand to their own
    * hamming-0 pairs, and verified cross-hash pairs expand to member
    * docs — both ∝ the result size, which is the floor for a
    * materialize-all-pairs operator. If the distinct-signature space
    * itself outgrows the 256-value bands (no duplication to collapse),
    * widen them: completeness needs only PhashHam + 1 bands. */
  def qPhashDupes(spark: SparkSession, dir: String): DataFrame = {
    // eager checkpoint: (doc_id, lo, hi) is 24 B/doc, but its subtree
    // is the full decode+resample pipeline and this plan consumes it
    // five times (distinct-hash table, both sides of the same-hash
    // self-join, both expansion joins) — without materialization each
    // consumer re-decodes the corpus (exchange reuse is not guaranteed
    // across the differing projections)
    // eager ckpt beats a lazy persist HERE (r19 A/B: 1.48 vs 2.32 s) —
    // five consumers of a decode-pipeline subtree; see ngramJaccardOn
    val ph = qPhash(spark, dir).localCheckpoint(true)
    val hashes = ph.select(col("phash_lo"), col("phash_hi")).distinct()
    val bandExprs = (0 until 8).map { j =>
      val src = if (j < 4) col("phash_lo") else col("phash_hi")
      shiftright(src, 8 * (j % 4)).bitwiseAND(lit(255L))
    }
    val bands = hashes.select(col("phash_lo"), col("phash_hi"),
      posexplode(array(bandExprs: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    // strict lexicographic order on the hash pair: each unordered pair
    // of DISTINCT hashes is generated once per shared band, deduped
    val candHash = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          (col("a.phash_lo") < col("b.phash_lo") ||
            (col("a.phash_lo") === col("b.phash_lo") &&
              col("a.phash_hi") < col("b.phash_hi"))))
      .select(col("a.phash_lo").as("__la"), col("a.phash_hi").as("__ha"),
        col("b.phash_lo").as("__lb"), col("b.phash_hi").as("__hb"))
      .distinct()
    val nearHash = candHash
      .withColumn("hamming",
        expr("bit_count(__la ^ __lb) + bit_count(__ha ^ __hb)").cast("long"))
      .filter(col("hamming") <= PhashHam)
    // expansion 1: docs sharing a signature are hamming-0 pairs
    val samePairs = ph.as("a").join(ph.as("b"),
        col("a.phash_lo") === col("b.phash_lo") &&
          col("a.phash_hi") === col("b.phash_hi") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    // expansion 2: verified cross-hash pairs × their member docs
    val crossPairs = nearHash
      .join(ph.select(col("doc_id").as("__ida"),
        col("phash_lo").as("__la"), col("phash_hi").as("__ha")), Seq("__la", "__ha"))
      .join(ph.select(col("doc_id").as("__idb"),
        col("phash_lo").as("__lb"), col("phash_hi").as("__hb")), Seq("__lb", "__hb"))
      .select(least(col("__ida"), col("__idb")).as("doc_a"),
        greatest(col("__ida"), col("__idb")).as("doc_b"), col("hamming"))
    samePairs.unionByName(crossPairs)
  }

  /** Quadratic pairwise reference (fine at the gate's sf0.01; the
    * engine side never materializes the cross product). */
  def phashDupesOracle: String =
    s"""WITH ph AS ($phashOracle
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  (bit_count(xor(a.phash_lo::BIT, b.phash_lo::BIT))
       |   + bit_count(xor(a.phash_hi::BIT, b.phash_hi::BIT)))::BIGINT AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash_lo::BIT, b.phash_lo::BIT))
       |      + bit_count(xor(a.phash_hi::BIT, b.phash_hi::BIT)) <= $PhashHam""".stripMargin

  // ---------- audio arm: real RIFF/WAV containers ----------

  /** Standard 44-byte PCM WAV container around `samples` (8-bit
    * unsigned mono), little-endian per the RIFF spec — a REAL audio
    * file any player parses. 8-bit PCM is lossless, so the decoded
    * sample stream equals the source bytes exactly (the audio analog of
    * the gray-PNG identity that keeps this arm under the hash oracle). */
  private def encodeWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byteRate = rate * channels * bits/8
      .putShort(1) // blockAlign
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(samples)
    bb.array()
  }

  /** Chunk-walking RIFF parser (not offset-44 hardcoding: handles
    * extra chunks between fmt and data, the layout real encoders emit).
    * Returns (sampleRate, channels, bits, samples). */
  private[ops] def parseWav(blob: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourCC() == "WAVE", "not a WAVE form")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Byte] = null
    while (bb.remaining() >= 8 && (samples == null || rate < 0)) {
      val id = fourCC(); val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort == 1, "only PCM supported")
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort // byteRate, blockAlign
          bits = bb.getShort.toInt
          bb.position(fmtEnd)
        case "data" =>
          samples = new Array[Byte](size); bb.get(samples)
        case _ =>
          bb.position(bb.position() + size + (size & 1)) // chunks pad to even
      }
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    (rate, channels, bits, samples)
  }

  /** Fixture bytes → real WAV files, sample rate varied per doc
    * (8/12/16 kHz) so the parse is load-bearing. */
  def wavMediaTable(spark: SparkSession, dir: String): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    mediaTable(spark, dir).select(col("doc_id"), col("blob"))
      .transform(Spread.widen)
      .mapPartitions { rows =>
        rows.map { r =>
          val idv = r.getLong(0)
          val rate = 8000 + (idv % 3).toInt * 4000
          Row(idv, encodeWav(r.getAs[Array[Byte]](1), rate))
        }
      }(enc)
  }

  /** Audio metadata + decode: parse the RIFF container, decode the
    * 8-bit PCM stream, report header fields and sample stats — the
    * audio analog of [[qMultimodalPng]]. Blobs never shuffle; the
    * parse+decode kernel runs wherever the rows live. */
  def qMultimodalWav(spark: SparkSession, dir: String): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("sample_rate", LongType),
      StructField("channels", LongType), StructField("bits", LongType),
      StructField("n_samples", LongType), StructField("sample_sum", LongType),
      StructField("peak", LongType))))
    wavMediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, bits, samples) = parseWav(r.getAs[Array[Byte]](1))
        var sum = 0L; var peak = 0L
        var i = 0
        while (i < samples.length) {
          val v = (samples(i) & 0xff).toLong
          sum += v; if (v > peak) peak = v
          i += 1
        }
        Row(r.getLong(0), rate.toLong, ch.toLong, bits.toLong,
          samples.length.toLong, sum, peak)
      }
    }(enc)
  }

  /** The container fields are pinned by construction; the sample
    * stream must decode back to exactly the normalized text bytes. */
  val wavOracle: String =
    """WITH px AS (
      |  SELECT doc_id, list_transform(
      |    string_split(regexp_replace(text, '[^ -~]', '', 'g'), ''), c -> ascii(c)) AS p
      |  FROM documents
      |)
      |SELECT doc_id,
      |  (8000 + (doc_id % 3) * 4000)::BIGINT AS sample_rate,
      |  1::BIGINT AS channels, 8::BIGINT AS bits,
      |  len(p)::BIGINT AS n_samples,
      |  coalesce(list_sum(p), 0)::BIGINT AS sample_sum,
      |  coalesce(list_max(p), 0)::BIGINT AS peak
      |FROM px""".stripMargin
}
