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
}
