package graft.llmops

import graft.SparkTestBase
import graft.expressions.ImageDims
import org.apache.spark.sql.functions._

class ImageDimsSpec extends SparkTestBase {
  import spark.implicits._

  private def dims(bytes: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageDims.compute(bytes)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("png/gif/bmp/jpeg headers round-trip their dimensions") {
    assert(dims(ImageWriter.png(640, 480)) === Some(("png", 640, 480)))
    assert(dims(ImageWriter.gif(320, 200)) === Some(("gif", 320, 200)))
    assert(dims(ImageWriter.bmp(1024, 768)) === Some(("bmp", 1024, 768)))
    assert(dims(ImageWriter.jpeg(800, 600)) === Some(("jpeg", 800, 600)))
    // dimensions beyond 16 bits in the 32-bit formats
    assert(dims(ImageWriter.png(70000, 2)) === Some(("png", 70000, 2)))
  }

  test("jpeg parser walks marker segments to reach a later SOF") {
    // SOI + APP0(JFIF) + COM segment before the SOF0
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte) ++ new Array[Byte](14)
    val com = Array(0xFF, 0xFE, 0x00, 0x07).map(_.toByte) ++ "hello".getBytes
    val sof = ImageWriter.jpeg(321, 123)
    val jpeg = sof.take(2) ++ app0 ++ com ++ sof.drop(2)
    assert(dims(jpeg) === Some(("jpeg", 321, 123)))
  }

  test("top-down BMP (negative height) reports the magnitude") {
    val b = ImageWriter.bmp(100, 50)
    // flip height to -50 little-endian at offset 22
    val neg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-50).array()
    System.arraycopy(neg, 0, b, 22, 4)
    assert(dims(b) === Some(("bmp", 100, 50)))
  }

  test("garbage, truncated, and null bytes yield NULL") {
    assert(dims("definitely not an image".getBytes) === None)
    assert(dims(ImageWriter.png(10, 10).take(12)) === None)
    assert(dims(Array.emptyByteArray) === None)
    assert(dims(null) === None)
    // JPEG with no SOF before EOI
    assert(dims(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) === None)
  }

  test("withImageDims runs in the scan projection over a DataFrame") {
    val rows = Seq(
      (1L, ImageWriter.png(12, 34)),
      (2L, ImageWriter.gif(56, 78)),
      (3L, "junk".getBytes))
    val df = rows.toDF("id", "content")
    val out = Multimodal.withImageDims(df).orderBy("id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"image dims left Tungsten:\n$plan")
    val got = out.select("id", "img.format", "img.width", "img.height").collect()
    assert((got(0).getString(1), got(0).getInt(2), got(0).getInt(3)) === ("png", 12, 34))
    assert((got(1).getString(1), got(1).getInt(2), got(1).getInt(3)) === ("gif", 56, 78))
    assert(got(2).isNullAt(1) || got(2).get(1) == null)
  }

  test("TIFF dims in both byte orders; WebP VP8L/VP8X/VP8 flavors") {
    for (le <- Seq(true, false)) {
      val r = graft.expressions.ImageDims.compute(
        MediaWriter.tiff(640, 480, littleEndian = le))
      assert(r != null && r.getUTF8String(0).toString === "tiff", s"le=$le")
      assert(r.getInt(1) === 640 && r.getInt(2) === 480, s"le=$le")
    }
    val w = graft.expressions.ImageDims.compute(
      WebpWriter.gray(33, 21, (x, y) => (x + y) % 256))
    assert(w != null && w.getUTF8String(0).toString === "webp")
    assert(w.getInt(1) === 33 && w.getInt(2) === 21)
  }
}
