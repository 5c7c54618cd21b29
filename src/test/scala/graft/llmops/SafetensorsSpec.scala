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

  test("half precision: F16 and BF16 decode exact bit tiers") {
    def le(bits: Seq[Int]): Array[Byte] =
      bits.flatMap(b => Seq((b & 0xff).toByte, ((b >> 8) & 0xff).toByte))
        .toArray
    // F16: 1.0, -2.0, 2^-24 subnormal, 0.099975586 (0x2E66), +inf, NaN
    val f16 = le(Seq(0x3C00, 0xC000, 0x0001, 0x2E66, 0x7C00, 0x7E00))
    // BF16: 1.0, -3.0, 0.5, 2^-126 min normal, -inf
    val bf16 = le(Seq(0x3F80, 0xC040, 0x3F00, 0x0080, 0xFF80))
    val bytes = Safetensors.write(Seq(
      ("h", "F16", Seq(6), f16), ("b", "BF16", Seq(5), bf16)))
    val (ts, off) = Safetensors.parseHeader(bytes)
    val h = Safetensors.tensorRows(bytes, off,
      ts.find(_.name == "h").get).head
    assert(h(0) == 1.0 && h(1) == -2.0)
    assert(h(2) == math.pow(2, -24))
    assert(math.abs(h(3) - 0.0999755859375) < 1e-12)
    assert(h(4).isPosInfinity && h(5).isNaN)
    val b2 = Safetensors.tensorRows(bytes, off,
      ts.find(_.name == "b").get).head
    assert(b2.toSeq.take(4) == Seq(1.0, -3.0, 0.5,
      java.lang.Float.intBitsToFloat(0x00800000).toDouble))
    assert(b2(4).isNegInfinity)
  }

  test("refusals: unknown dtype, size mismatch, header overrun") {
    intercept[IllegalArgumentException] {
      Safetensors.write(Seq(("h", "F128", Seq(2), Array[Byte](0, 0, 0, 0))))
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
