package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class OrcWriterSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("flag", BooleanType),
    StructField("b", ByteType),
    StructField("s", ShortType),
    StructField("i", IntegerType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("txt", StringType),
    StructField("bin", BinaryType),
    StructField("day", DateType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(18, 2)),
    StructField("bigdec", DecimalType(38, 6))))

  private def mkRow(i: Int): Row = Row(
    i.toLong,
    if (i % 13 == 1) null else java.lang.Boolean.valueOf(i % 2 == 0),
    if (i % 13 == 2) null else java.lang.Byte.valueOf(i.toByte),
    if (i % 13 == 3) null else java.lang.Short.valueOf((i * 3).toShort),
    if (i % 13 == 4) null else java.lang.Integer.valueOf(i - 500),
    if (i % 13 == 5) null else java.lang.Float.valueOf(i / 4.0f),
    if (i % 13 == 6) null else java.lang.Double.valueOf(i / 8.0),
    if (i % 13 == 7) null else s"text $i " + ("y" * (i % 9)),
    if (i % 13 == 8) null else Array.tabulate[Byte](i % 6)(k => (i + k).toByte),
    if (i % 13 == 9) null
    else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong - 300)),
    if (i % 13 == 10) null
    else {
      // spans pre-1970 (never the refused (-1s,0)+ms window), pre-2015
      // and post-2015; i%3 picks sub-millisecond-only vs ≥1 ms
      // fractions (the two negative-epoch truncation tiers) vs zero
      val micros = (i.toLong - 200) * 86400L * 1000000L * 11 +
        ((i % 3) match {
          case 0 => (i % 1000).toLong // sub-ms only
          case 1 => 500000L + (i % 1000).toLong // ≥ 1 ms
          case _ => 0L
        })
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L))
    },
    if (i % 13 == 11) null
    else new java.math.BigDecimal(s"${i * 997 - 40000}.${10 + i % 90}"),
    if (i % 13 == 12) null
    else new java.math.BigDecimal(
      s"${if (i % 2 == 0) "-" else ""}9876543210987654321098765432.${100000 + i}"))

  private def writeTwin(n: Int, rowsPerStripe: Int): String = {
    val f = Files.createTempDirectory("graft-orcw").toString + "/twin.orc"
    val out = new java.io.FileOutputStream(f)
    val w = new OrcWriter.Streamer(schema, out, rowsPerStripe = rowsPerStripe)
    w.append((0 until n).map(mkRow))
    w.finish()
    out.close()
    f
  }

  private def render(r: Row): String =
    (0 until r.length).map(i =>
      if (r.isNullAt(i)) "∅"
      else r.get(i) match {
        case b: Array[Byte] => b.mkString("<", ",", ">")
        case x => x.toString
      }).mkString("|")

  test("spark.read.orc consumes twin output (both-direction interop)") {
    val f = writeTwin(700, rowsPerStripe = 128) // several stripes
    val got = spark.read.orc(f)
    assert(got.schema == StructType(schema.map(_.copy(nullable = true))))
    val mine = got.collect().map(render).sorted
    val want = (0 until 700).map(mkRow).map(render).sorted
    assert(mine.length == 700)
    assert(mine.toSeq == want)
  }

  test("own reader consumes twin output (identity round trip)") {
    val f = writeTwin(400, rowsPerStripe = 100)
    val got = Orc.readOrc(spark, f).collect().map(render).sorted
    val want = (0 until 400).map(mkRow).map(render).sorted
    assert(got.toSeq == want)
    // and the tail parses as 4 stripes
    val meta = Orc.readTail(spark.sparkContext.hadoopConfiguration, f)
    assert(meta.stripes.length == 4 && meta.rows == 400)
  }

  test("writeShards: one file per shard, readOrcFiles identity, deterministic bytes") {
    val ss = spark
    import ss.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"doc $i", (i * 3).toLong))
      .toDF("doc_id", "text", "n")
    val dir = Files.createTempDirectory("graft-orcw").toString + "/shards"
    OrcWriter.writeShards(df, "doc_id", dir, nShards = 4,
      rowsPerStripe = 64)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).map(_.getName).sorted
    assert(files.toSeq ==
      (0 until 4).map(s => f"shard-$s%05d.orc"))
    val back = Orc.readOrcFiles(spark, dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("path", "doc_id", "text", "n"))
    val got = back.drop("path").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq == (0 until 500)
      .map(i => (i.toLong, s"doc $i", (i * 3).toLong)))
    // spark's own reader consumes the shard directory too
    assert(spark.read.orc(dir).count() == 500)
    // deterministic: a second export writes byte-identical shards
    val dir2 = Files.createTempDirectory("graft-orcw").toString + "/shards2"
    OrcWriter.writeShards(df, "doc_id", dir2, nShards = 4,
      rowsPerStripe = 64)
    (0 until 4).foreach { s =>
      val a = Files.readAllBytes(java.nio.file.Paths.get(
        dir, f"shard-$s%05d.orc"))
      val b = Files.readAllBytes(java.nio.file.Paths.get(
        dir2, f"shard-$s%05d.orc"))
      assert(java.util.Arrays.equals(a, b), s"shard $s bytes differ")
    }
  }

  test("twin emits stripe statistics; pruned reads skip its stripes") {
    val ss = spark
    import ss.implicits._
    // sorted single shard, small stripes → disjoint key ranges
    val df = (0 until 3000).map(i => (i.toLong, s"val $i ${"p" * 20}"))
      .toDF("k", "v")
    val dir = Files.createTempDirectory("graft-orcw").toString + "/st"
    OrcWriter.writeShards(df, "k", dir, nShards = 1, rowsPerStripe = 250)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = Orc.readTail(conf, f)
    assert(meta.stripes.length == 12)
    val stats = Orc.readStripeStats(conf, f)
    assert(stats.isDefined && stats.get.length == 12)
    // int stats on k (type id 1), string stats on v (type id 2)
    assert(stats.get.forall(s => s.ints(1).isDefined && s.strs(2).isDefined))
    // writeShards sorts within the shard, so stripe key ranges tile
    val ranges = stats.get.map(_.ints(1).get)
    assert(ranges.map(_._1).sorted == ranges.map(_._1))
    val kept = Orc.pruneByIntRange(12, stats, 1, 1000L, 1249L)
    assert(kept.nonEmpty && kept.length <= 2)
    val pruned = Orc.readOrcFiles(spark, dir,
        pruneBy = Some(("k", 1000L, 1249L)))
      .filter(col("k").between(1000, 1249))
      .collect().map(_.getLong(1)).sorted
    assert(pruned.toSeq == (1000L to 1249L))
    // an all-pruned range returns empty cleanly
    assert(Orc.readOrcFiles(spark, dir,
      pruneBy = Some(("k", 100000L, 200000L))).count() == 0)
    // spark.read.orc still accepts the file with its Metadata section
    assert(spark.read.orc(f).count() == 3000)
  }

  test("refusals: nested types and the (-1s,0) epoch instant") {
    val ss = spark
    import ss.implicits._
    intercept[IllegalArgumentException] {
      OrcWriter.writeShards(
        Seq((1L, Seq("a"))).toDF("id", "xs"), "id", "/tmp/never", 1)
    }
    val tsSchema = StructType(Seq(StructField("ts", TimestampType)))
    val out = new java.io.ByteArrayOutputStream()
    val w = new OrcWriter.Streamer(tsSchema, out, rowsPerStripe = 4)
    intercept[IllegalArgumentException] {
      w.append(Seq(Row(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(-1L, 500000000L)))))
      w.finish()
    }
    // sub-millisecond fractions in that second ARE representable
    val out2 = new java.io.ByteArrayOutputStream()
    val w2 = new OrcWriter.Streamer(tsSchema, out2, rowsPerStripe = 4)
    w2.append(Seq(Row(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(-1L, 999000L)))))
    w2.finish()
    val f = Files.createTempDirectory("graft-orcw").toString + "/edge.orc"
    Files.write(java.nio.file.Paths.get(f), out2.toByteArray)
    val got = spark.read.orc(f).collect()
    assert(got.length == 1 && got(0).getTimestamp(0).toInstant ==
      java.time.Instant.ofEpochSecond(-1L, 999000L))
    assert(Orc.readOrc(spark, f).collect()(0).getTimestamp(0).toInstant ==
      java.time.Instant.ofEpochSecond(-1L, 999000L))
  }

  test("rleV2Direct round-trips through the reader's rleV2") {
    val signedVals = Array.tabulate(1500)(i =>
      if (i % 97 == 5) Long.MinValue / 2 + i
      else if (i % 31 == 7) (1L << 50) + i
      else (i - 700).toLong)
    assert(Orc.rleV2(OrcWriter.rleV2Direct(signedVals, signed = true),
      1500, signed = true).toSeq == signedVals.toSeq)
    val unsignedVals = Array.tabulate(700)(i => (i.toLong * 977) % 100000)
    assert(Orc.rleV2(OrcWriter.rleV2Direct(unsignedVals, signed = false),
      700, signed = false).toSeq == unsignedVals.toSeq)
    // bool/byte rle twins
    val bits = Array.tabulate(333)(i => i % 3 == 0)
    assert(Orc.boolRle(OrcWriter.boolRleEncode(bits), 333).toSeq == bits.toSeq)
    val bytes = Array.tabulate[Byte](517)(i => (i * 7).toByte)
    assert(Orc.byteRle(OrcWriter.byteRleEncode(bytes), 517).toSeq == bytes.toSeq)
    // decimal varints round-trip through varBigInts
    val bigs = (0 until 50).map(i => new java.math.BigInteger(
      s"${if (i % 2 == 0) "-" else ""}123456789012345678901234567$i"))
    assert(Orc.varBigInts(OrcWriter.varBigIntEncode(bigs), 50).toSeq == bigs)
  }

  test("blockSize past the 3-byte chunk-length ceiling refuses up front") {
    // (len << 1 | original) must fit 24 bits — a bigger block would
    // silently truncate chunk headers and corrupt the file
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    val out = new java.io.ByteArrayOutputStream()
    val e = intercept[IllegalArgumentException] {
      new OrcWriter.Streamer(st, out, blockSize = 16 << 20)
    }
    assert(e.getMessage.contains("chunk-length ceiling"))
    // the ceiling itself is accepted
    new OrcWriter.Streamer(st, out, blockSize = (1 << 23) - 1)
    ()
  }
}
