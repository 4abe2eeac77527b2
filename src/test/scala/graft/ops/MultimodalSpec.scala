package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The decode path is real for PNG: JDK ImageIO behind a magic-byte
  * sniff, luminance out. Non-image blobs keep the deterministic
  * byte-stream interpretation the fixtures/oracle rely on. */
class MultimodalSpec extends SparkTestBase {
  import MultimodalQueries.DecodeStub

  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pixels(y)(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v) // gray: r=g=b=v
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("PNG blobs decode through ImageIO to row-major luminance") {
    val pixels = Array(Array(0, 128, 255), Array(17, 42, 200))
    val blob = pngBytes(pixels)
    assert(DecodeStub.isPng(blob))
    // gray pixels: luminance == the value, PNG lossless ⇒ exact
    assert(DecodeStub.decode(blob).toSeq === Seq(0, 128, 255, 17, 42, 200))
  }

  test("non-PNG blobs keep the byte-stream interpretation (fixture/oracle path)") {
    val blob = "hello".getBytes("UTF-8")
    assert(!DecodeStub.isPng(blob))
    assert(DecodeStub.decode(blob).toSeq === Seq(104, 101, 108, 108, 111))
  }

  test("the feature kernel runs real PNGs and text blobs through one pipeline") {
    val png = pngBytes(Array.tabulate(20, 20)((y, x) => (x * y) % 256))
    val txt = "just bytes, not an image".getBytes("UTF-8")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, png), Row(2L, txt)), schema)
    val rows = MultimodalQueries.features(media).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L, 2L))
    // 16 histogram buckets per doc; counts add up to the pixel/byte count
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(1L).length === 16 && byDoc(1L).map(_.getLong(2)).sum === 400L)
    assert(byDoc(2L).length === 16 && byDoc(2L).map(_.getLong(2)).sum === txt.length.toLong)
    // 400 px → 2 frames of 256; 24 bytes → 1 frame
    assert(byDoc(1L).head.getLong(3) === 2L && byDoc(2L).head.getLong(3) === 1L)
  }

  test("resizeNearest does true 2-D nearest-neighbor resize through a real PNG") {
    // 4×4 gradient, downsample to 2×2: nearest-neighbor picks the
    // top-left pixel of each 2×2 block (floor index map)
    val pixels = Array.tabulate(4, 4)((y, x) => y * 40 + x * 10)
    val blob = pngBytes(pixels)
    val (w, h, px) = DecodeStub.decodeWithDims(blob)
    assert((w, h) === (4, 4))
    val out = DecodeStub.resizeNearest(px, w, h, 2, 2)
    assert(out.toSeq === Seq(0, 20, 80, 100))
    // upscale 2×2 → 4×4 replicates each source pixel into a 2×2 block
    val up = DecodeStub.resizeNearest(Array(1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.toSeq === Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    // raw byte blobs resize as a 1-row stream
    val (bw, bh, bpx) = DecodeStub.decodeWithDims(Array[Byte](10, 20, 30, 40))
    assert((bw, bh) === (4, 1))
    assert(DecodeStub.resizeNearest(bpx, bw, bh, 2, 1).toSeq === Seq(10, 30))
  }

  test("JPEG blobs sniff-dispatch into ImageIO with true dims and bounded " +
      "pixel error") {
    // smooth gradient: lossy DCT error stays small on low-frequency content
    val w = 32; val h = 8
    val src = Array.tabulate(h, w)((y, x) => ((x * 8 + y * 4) % 256))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = src(y)(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val blob = out.toByteArray
    assert(MultimodalQueries.DecodeStub.isJpeg(blob) && !MultimodalQueries.DecodeStub.isPng(blob))
    val (dw, dh, px) = MultimodalQueries.DecodeStub.decodeWithDims(blob)
    assert((dw, dh) === (w, h))
    val flat = src.flatten
    val mae = px.indices.map(i => math.abs(px(i) - flat(i))).sum.toDouble / px.length
    assert(mae <= 6.0, s"JPEG decode mean abs error $mae above bound on a smooth gradient")
  }

  test("q_multimodal_jpeg: fixture blobs are genuine JPEGs; geometry is " +
      "lossless and pixel error bounded even on high-frequency text bytes") {
    val dir = "/root/testdata/sf0.001"
    val media = MultimodalQueries.jpegMediaTable(spark, dir).collect()
    assert(media.nonEmpty)
    assert(media.forall(r => MultimodalQueries.DecodeStub.isJpeg(r.getAs[Array[Byte]](1))),
      "jpegMediaTable emitted a non-JPEG blob")
    val srcBytes = MultimodalQueries.mediaTable(spark, dir)
      .select("doc_id", "blob").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // geometry: codec-reported dims equal the 64-wide layout of the
    // source bytes — the exact contract the DuckDB hash oracle states
    media.take(25).foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MultimodalQueries.DecodeStub.decodeWithDims(r.getAs[Array[Byte]](1))
      val n = srcBytes(id).length
      assert((w, h) === (64, n / 64), s"doc $id: JPEG geometry diverged")
      // lossy values, bounded error: printable-ASCII text bytes are
      // high-frequency content, so the bound is loose but must hold
      val flat = srcBytes(id).take(64 * (n / 64)).map(_ & 0xff)
      val mae = px.indices.map(i => math.abs(px(i) - flat(i))).sum.toDouble / px.length
      assert(mae <= 24.0, s"doc $id: JPEG decode MAE $mae above bound")
    }
    // the gate query's output equals the oracle's arithmetic
    val gate = MultimodalQueries.qMultimodalJpeg(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    gate.foreach { case (id, (w, h, npx)) =>
      val n = srcBytes(id).length
      assert((w, h, npx) === ((64L, (n / 64).toLong, (64L * (n / 64)))), s"doc $id gate row")
    }
  }

  test("q_multimodal_png: fixture-derived blobs are genuine PNGs and decode " +
      "round-trips to the source bytes exactly") {
    val dir = "/root/testdata/sf0.001"
    val media = MultimodalQueries.pngMediaTable(spark, dir).collect()
    assert(media.nonEmpty)
    assert(media.forall(r => DecodeStub.isPng(r.getAs[Array[Byte]](1))),
      "pngMediaTable emitted a non-PNG blob")
    // round-trip identity on a sample: ImageIO decode of the 1×n gray
    // PNG must reproduce the normalized text bytes bit-for-bit
    val expected = MultimodalQueries.mediaTable(spark, dir)
      .select("doc_id", "blob").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).map(_ & 0xff).toSeq).toMap
    media.take(25).foreach { r =>
      val id = r.getLong(0)
      assert(DecodeStub.decode(r.getAs[Array[Byte]](1)).toSeq === expected(id),
        s"doc $id: PNG decode diverged from source bytes")
    }
    // and the graded query's stats equal the text-path stats for the
    // same (non-empty) docs: same features through a real codec
    val viaPng = MultimodalQueries.qMultimodalPng(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val viaText = MultimodalQueries.qMultimodalFeatures(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(viaPng.keySet.map(_._1).toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(viaPng === viaText)
  }

  test("WAV parser: javax.sound validates our container; chunk walk skips LIST chunks") {
    // our encoder's output must parse with the JDK's own audio stack
    val samples = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val rate = 12000
    // build a WAV through the gate path (wavMediaTable kernel uses the
    // same private encoder) — reconstruct it here via the public query
    // on a tiny frame instead: simpler to re-encode manually
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
    val wav = bb.array()
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate === rate.toFloat)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFormat.getSampleSizeInBits === 8)
    val decoded = ais.readAllBytes()
    assert(decoded.toSeq === samples.toSeq, "JDK decode must equal source bytes")

    // adversarial layout: a LIST chunk between fmt and data (what real
    // encoders emit); the chunk-walking parser must skip it, and an
    // odd-sized chunk must honor RIFF's even-byte padding
    val junk = "INFOsome-metadata".getBytes("US-ASCII") // 17 bytes → padded
    val bb2 = java.nio.ByteBuffer.allocate(44 + junk.length + 1 + 8 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.put("RIFF".getBytes("US-ASCII")).putInt(36 + junk.length + 1 + 8 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate).putShort(1).putShort(8)
      .put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
      .put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
    val (r2, ch2, bits2, s2) = MultimodalQueries.parseWav(bb2.array())
    assert((r2, ch2, bits2) === ((rate, 1, 8)))
    assert(s2.toSeq === samples.toSeq)

    // corrupt containers fail loudly, not with garbage data
    intercept[IllegalArgumentException] {
      MultimodalQueries.parseWav("NOTARIFFCONTAINER!!!".getBytes("US-ASCII"))
    }
    val noData = java.util.Arrays.copyOf(wav, 36) // header only, data chunk gone
    intercept[Exception] { MultimodalQueries.parseWav(noData) }
  }
}
