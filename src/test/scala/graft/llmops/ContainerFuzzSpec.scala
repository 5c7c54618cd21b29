package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.Row
import java.nio.file.Files

/** Mutation fuzz for the round-12c container parsers — the task-side
  * kernels (region/batch/stripe decode) carry a never-throw contract
  * (structural failure = empty, the block is the blast radius); the
  * driver-side metadata parsers may only refuse with
  * IllegalArgumentException, never mangle memory or hang.
  */
class ContainerFuzzSpec extends SparkTestBase {

  private def mutate(b: Array[Byte], r: java.util.Random): Array[Byte] = {
    val m = b.clone()
    val flips = 1 + r.nextInt(4)
    (0 until flips).foreach { _ =>
      m(r.nextInt(m.length)) =
        (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
    }
    m
  }

  test("avro: parseRegion never throws; parseHeader only refuses") {
    val schemaJson =
      """{"type":"record","name":"F","fields":[
         {"name":"id","type":"long"},{"name":"t","type":"string"}]}"""
    val sch = Avro.parseSchema(schemaJson)
    val rows = (0 until 50).map(i => Row(i.toLong, s"fuzz row $i"))
    val file = AvroWriter.write(schemaJson, rows, "deflate",
      recordsPerBlock = 10)
    val h = Avro.parseHeader(file)
    val region = java.util.Arrays.copyOfRange(file, h.headerEnd.toInt,
      file.length)
    val r = new java.util.Random(42)
    (0 until 600).foreach { _ =>
      Avro.parseRegion(h, sch, mutate(region, r)) // must not throw
      try Avro.parseHeader(mutate(file, r))
      catch { case _: IllegalArgumentException => }
    }
  }

  test("arrow: decodeBatch never throws on mutated meta or body") {
    val fields = Vector(
      Arrow.AField("id", nullable = false, Arrow.AInt(64)),
      Arrow.AField("t", nullable = true, Arrow.AString(large = false)),
      Arrow.AField("xs", nullable = true,
        Arrow.AList(Arrow.AField("item", nullable = true,
          Arrow.AInt(32)), large = false)))
    val rows = (0 until 40).map(i => Row(i.toLong,
      if (i % 5 == 0) null else s"v$i", (0 until i % 4).toSeq))
    val bytes = ArrowWriter.write(fields, rows, rowsPerBatch = 40)
    val footer = {
      val dir = Files.createTempDirectory("graft-fuzz").toString + "/f.arrow"
      Files.write(java.nio.file.Paths.get(dir), bytes)
      Arrow.readFooter(spark.sparkContext.hadoopConfiguration, dir)
    }
    val b = footer.batches.head
    val meta = java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
      b.offset.toInt + b.metaLen)
    val body = java.util.Arrays.copyOfRange(bytes,
      b.offset.toInt + b.metaLen, (b.offset + b.metaLen + b.bodyLen).toInt)
    val wanted = fields.indices.toVector
    val r = new java.util.Random(43)
    (0 until 600).foreach { _ =>
      Arrow.decodeBatch(footer.fields, mutate(meta, r), body, wanted)
      Arrow.decodeBatch(footer.fields, meta, mutate(body, r), wanted)
    }
  }

  test("arrow intervals: decodeBatch never throws on mutated meta or body") {
    val fields = Vector(
      Arrow.AField("id", nullable = false, Arrow.AInt(64)),
      Arrow.AField("ym", nullable = true, Arrow.AInterval(0)),
      Arrow.AField("dt", nullable = true, Arrow.AInterval(1)),
      Arrow.AField("mdn", nullable = true, Arrow.AInterval(2)))
    val rows = (0 until 40).map { i =>
      Row(i.toLong,
        if (i % 5 == 0) null else java.time.Period.ofMonths(i - 20),
        if (i % 5 == 1) null
        else java.time.Duration.ofDays(i - 20L).plusMillis(i * 13L),
        if (i % 5 == 2) null
        else new org.apache.spark.unsafe.types.CalendarInterval(
          i % 7, i - 20, i * 250000L))
    }
    val bytes = ArrowWriter.write(fields, rows, rowsPerBatch = 40)
    val footer = {
      val f = Files.createTempDirectory("graft-fuzz").toString + "/i.arrow"
      Files.write(java.nio.file.Paths.get(f), bytes)
      Arrow.readFooter(spark.sparkContext.hadoopConfiguration, f)
    }
    val b = footer.batches.head
    val meta = java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
      b.offset.toInt + b.metaLen)
    val body = java.util.Arrays.copyOfRange(bytes,
      b.offset.toInt + b.metaLen, (b.offset + b.metaLen + b.bodyLen).toInt)
    val wanted = fields.indices.toVector
    val r = new java.util.Random(47)
    (0 until 600).foreach { _ =>
      Arrow.decodeBatch(footer.fields, mutate(meta, r), body, wanted)
      Arrow.decodeBatch(footer.fields, meta, mutate(body, r), wanted)
    }
    // the unmutated batch still decodes exactly after the fuzz storm
    val clean = Arrow.decodeBatch(footer.fields, meta, body, wanted)
    assert(clean.length == 40)
    assert(clean(1).getAs[java.time.Period](1).toTotalMonths == -19L)
  }

  test("orc: decodeStripe never throws on mutated stripe bytes") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-fuzz").toString + "/o"
    (0 until 200).map(i => (i.toLong, s"orc fuzz $i", i % 3 == 0))
      .toDF("id", "t", "f").coalesce(1)
      .write.mode("overwrite").option("compression", "zlib").orc(dir)
    val path = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
    val meta = Orc.readTail(spark.sparkContext.hadoopConfiguration, path)
    val st = meta.stripes.head
    val all = Files.readAllBytes(java.nio.file.Paths.get(path))
    val stripeBytes = java.util.Arrays.copyOfRange(all, st.offset.toInt,
      (st.offset + st.indexLength + st.dataLength + st.footerLength).toInt)
    val wanted = meta.types(0).subtypes.indices.toVector
    val r = new java.util.Random(44)
    (0 until 600).foreach { _ =>
      Orc.decodeStripe(meta, st, mutate(stripeBytes, r), wanted)
    }
  }

  test("orc typed columns: decimal/timestamp/list/map stripes never throw") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-fuzz").toString + "/ot"
    (0 until 200).map { i =>
      (i.toLong,
        new java.math.BigDecimal(s"${i * 37 - 1000}.${10 + i % 80}"),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          (i.toLong - 100) * 9973L, (i % 1000) * 1000L)),
        (0 until i % 4).map(j => s"x$j"),
        Map(s"k${i % 3}" -> i.toLong))
    }.toDF("id", "dec", "ts", "xs", "m")
      .select(col("id"), col("dec").cast("decimal(18,2)").as("dec"),
        col("ts"), col("xs"), col("m"))
      .coalesce(1)
      .write.mode("overwrite").option("compression", "zlib").orc(dir)
    val path = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
    val meta = Orc.readTail(spark.sparkContext.hadoopConfiguration, path)
    val st = meta.stripes.head
    val all = Files.readAllBytes(java.nio.file.Paths.get(path))
    val stripeBytes = java.util.Arrays.copyOfRange(all, st.offset.toInt,
      (st.offset + st.indexLength + st.dataLength + st.footerLength).toInt)
    val wanted = meta.types(0).subtypes.indices.toVector
    val r = new java.util.Random(46)
    (0 until 600).foreach { _ =>
      Orc.decodeStripe(meta, st, mutate(stripeBytes, r), wanted)
    }
  }

  test("safetensors: half-precision containers only refuse under mutation") {
    def le(bits: Seq[Int]): Array[Byte] =
      bits.flatMap(b => Seq((b & 0xff).toByte, ((b >> 8) & 0xff).toByte))
        .toArray
    val bytes = Safetensors.write(Seq(
      ("h", "F16", Seq(8), le((0 until 8).map(k => 0x3C00 + k * 37))),
      ("b", "BF16", Seq(8), le((0 until 8).map(k => 0x3F80 + k * 53))),
      ("i", "I64", Seq(4), Array.tabulate[Byte](32)(k => k.toByte))))
    val r = new java.util.Random(47)
    (0 until 600).foreach { _ =>
      val mb = mutate(bytes, r)
      try {
        val (ts, off) = Safetensors.parseHeader(mb)
        ts.foreach(t => Safetensors.tensorRows(mb, off, t))
      } catch {
        case _: IllegalArgumentException =>
        case _: ArrayIndexOutOfBoundsException =>
        // Json parse of a mutated header may surface either refusal
        case _: ClassCastException =>
        case _: scala.MatchError =>
      }
    }
  }

  test("npy: npzMembers never throws; rows only refuses") {
    val npz = Npy.writeNpz(Seq(
      "a.npy" -> Npy.writeNpyLongs(Array.tabulate(64)(_.toLong)),
      "b.npy" -> Npy.writeNpyFloats(Seq(Array(1f, 2f, 3f)))))
    val npy = Npy.writeNpyLongs(Array.tabulate(128)(i => i * 7L))
    val r = new java.util.Random(45)
    (0 until 600).foreach { _ =>
      Npy.npzMembers(mutate(npz, r)).foreach { case (_, mb) =>
        try Npy.rows(mb)
        catch { case _: IllegalArgumentException => }
      }
      try Npy.rows(mutate(npy, r))
      catch { case _: IllegalArgumentException => }
    }
  }

  test("arrow stream: the per-file walk never throws on mutation") {
    import Arrow._
    val fields = Vector(
      AField("id", nullable = false, AInt(64)),
      AField("t", nullable = true, AString(large = false)))
    val rows = (0 until 60).map(i => Row(i.toLong, s"stream fuzz $i"))
    val good = ArrowWriter.writeStream(fields, rows, rowsPerBatch = 16)
    val dir = Files.createTempDirectory("graft-fuzz-arrows").toString
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val r = new java.util.Random(46)
    (0 until 300).foreach { k =>
      val path = s"$dir/m$k.arrows"
      Files.write(java.nio.file.Paths.get(path), mutate(good, r))
      // rows decoded before the damage survive; never throws, never
      // hangs — corrupt tails just end the file
      val got = Arrow.decodeStreamFile(confB, path, good.length.toLong,
        fields, Vector(0, 1), Array(0, 1)).toVector
      assert(got.length <= 60)
    }
  }

  test("seekable zstd: seek-table parse only refuses; frames verify") {
    val chunks = (0 until 20).map(i =>
      s"seekable fuzz chunk $i".getBytes("UTF-8"))
    val good = ZstdSeekable.write(chunks)
    val dir = Files.createTempDirectory("graft-fuzz-zsk").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val r = new java.util.Random(47)
    (0 until 300).foreach { k =>
      val path = s"$dir/m$k.zst"
      Files.write(java.nio.file.Paths.get(path), mutate(good, r))
      // driver parse refuses structurally-bad tables; a table that
      // still parses has entries whose checksums catch frame damage
      // at decode time — wrong data never comes back silently
      try {
        val entries = ZstdSeekable.readSeekTable(conf, path)
        val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
        entries.zipWithIndex.foreach { case (e, i) =>
          if (e.decompressedSize > 0 &&
              e.offset + e.compressedSize <= bytes.length) {
            val frame = java.util.Arrays.copyOfRange(bytes,
              e.offset.toInt, e.offset.toInt + e.compressedSize)
            val plain = Zstd.decode(frame)
            if (plain != null && plain.length == e.decompressedSize &&
                e.checksum.forall(_ ==
                  (XxHash.xxh64(plain, 0, plain.length, 0L) &
                    0xFFFFFFFFL).toInt)) {
              // frame verified: if it's an undamaged original index,
              // content must be the original chunk
              if (i < chunks.length &&
                  plain.length == chunks(i).length &&
                  e.checksum.isDefined)
                assert(plain.toSeq == chunks(i).toSeq)
            }
          }
        }
      } catch { case _: IllegalArgumentException => }
    }
  }
}
