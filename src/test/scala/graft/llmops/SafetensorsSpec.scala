package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SafetensorsSpec extends SparkTestBase {

  test("roundtrip: i64 vector + f32 matrix, header order, offsets") {
    val b = Safetensors.write(Seq(
      Safetensors.writeI64("ids", Array(5L, -6L, 1L << 40)),
      Safetensors.writeF32("emb",
        Seq(Array(1.5f, -0.25f), Array(0f, 2f)))))
    val (ts, dataOff) = Safetensors.parseHeader(b)
    assert(ts.map(_.name) == Vector("ids", "emb"))
    assert(ts(0).dtype == "I64" && ts(0).shape == Vector(3))
    assert(ts(1).shape == Vector(2, 2))
    val ids = Safetensors.tensorRows(b, dataOff, ts(0))
    assert(ids.length == 1 && ids(0).toSeq ==
      Seq(5.0, -6.0, (1L << 40).toDouble))
    val emb = Safetensors.tensorRows(b, dataOff, ts(1))
    assert(emb.length == 2 && emb(0).toSeq == Seq(1.5, -0.25))
  }

  test("golden bytes: the exact spec layout (hand-checkable)") {
    val b = Safetensors.write(Seq(
      ("t", "U8", Seq(2), Array[Byte](7, 9))))
    // 8-byte LE header length, then the JSON, then the payload
    val hlen = (0 until 8).map(k => (b(k) & 0xffL) << (8 * k)).sum
    val json = new String(b, 8, hlen.toInt, "UTF-8")
    assert(json ==
      """{"t":{"dtype":"U8","shape":[2],"data_offsets":[0,2]}}""")
    assert(b.length == 8 + hlen + 2 && b(b.length - 2) == 7 &&
      b.last == 9)
  }

  test("tensors(): DataFrame explode; __metadata__ ignored; junk vanishes") {
    val ss = spark
    import ss.implicits._
    val good = Safetensors.write(Seq(
      Safetensors.writeI64("a", Array(1L, 2L))))
    // splice a __metadata__ entry in by hand
    val withMeta = {
      val (ts, off) = Safetensors.parseHeader(good)
      val json =
        """{"__metadata__":{"format":"pt"},""" +
        s""""a":{"dtype":"I64","shape":[2],"data_offsets":[0,16]}}"""
      val h = json.getBytes("UTF-8")
      val o = new java.io.ByteArrayOutputStream()
      (0 until 8).foreach(k => o.write(((h.length.toLong >> (8 * k)) & 0xff).toInt))
      o.write(h)
      o.write(good, off.toInt, good.length - off.toInt)
      assert(ts.nonEmpty)
      o.toByteArray
    }
    val out = Safetensors.tensors(
      Seq((1L, good), (2L, withMeta), (3L, Array[Byte](9, 9, 9)))
        .toDF("id", "content"), "id", "content")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Double](3)))
    assert(out.count(_._1 == 1L) == 1)
    assert(out.filter(_._1 == 2L).head._3 == Seq(1.0, 2.0))
    assert(!out.exists(_._1 == 3L))
    assert(!out.exists(_._2 == "__metadata__"))
  }

  test("refusals: F16, size mismatch, header overrun") {
    intercept[IllegalArgumentException] {
      Safetensors.write(Seq(("h", "F16", Seq(2), Array[Byte](0, 0, 0, 0))))
    }
    val bad = ("""{"x":{"dtype":"I64","shape":[4],""" +
      """"data_offsets":[0,8]}}""").getBytes("UTF-8")
    val o = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(k => o.write(((bad.length.toLong >> (8 * k)) & 0xff).toInt))
    o.write(bad); o.write(new Array[Byte](8))
    intercept[IllegalArgumentException] {
      Safetensors.parseHeader(o.toByteArray) // 4×8 ≠ 8 bytes
    }
    intercept[IllegalArgumentException] {
      Safetensors.parseHeader(Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1))
    }
  }
}
