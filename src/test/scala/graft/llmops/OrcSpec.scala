package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

class OrcSpec extends SparkTestBase {

  /** Fixture writer: SPARK'S OWN orc sink (orc-core under the hood) —
    * the interop twin for the from-scratch reader.
    */
  private def sparkWrite(dir: String, n: Int, codec: String,
      repeatStrings: Boolean = false,
      stripeSize: Int = 0): Unit = {
    val ss = spark
    import ss.implicits._
    val df = (0 until n).map { i =>
      val text =
        if (i % 7 == 6) null
        else if (repeatStrings) s"tag${i % 5}"
        else s"unique text $i " + ("z" * (i % 19))
      (i.toLong, text,
        if (i % 3 == 0) null else java.lang.Double.valueOf(i / 8.0),
        i % 2 == 0, i - 1000)
    }.toDF("doc_id", "text", "score", "flag", "delta")
    var w = df.coalesce(1).write.mode("overwrite")
      .option("compression", codec)
    if (stripeSize > 0) w = w.option("orc.stripe.size", stripeSize.toString)
    w.orc(dir)
  }

  private def firstOrc(dir: String): String =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".orc")).head.getAbsolutePath

  private def check(dir: String, n: Int): Unit = {
    val mine = Orc.readOrc(spark, firstOrc(dir)).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getBoolean(3), r.getInt(4))).sortBy(_._1)
    val theirs = spark.read.orc(dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getBoolean(3), r.getInt(4))).sortBy(_._1)
    assert(mine.length == n && theirs.length == n)
    assert(mine.toSeq == theirs.toSeq)
  }

  test("interop: spark-written orc reads back identically (zlib)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    sparkWrite(dir, 500, "zlib")
    check(dir, 500)
  }

  test("codecs: none, snappy, zstd, lz4, lzo") {
    for (codec <- Seq("none", "snappy", "zstd", "lz4", "lzo")) {
      val dir = Files.createTempDirectory("graft-orc").toString + s"/$codec"
      sparkWrite(dir, 300, codec)
      check(dir, 300)
    }
  }

  test("lzo1x kernel: never throws on mutated streams, refuses to null") {
    // a genuine aircompressor lzo chunk out of a spark-written file:
    // take the first compressed chunk of the first stripe
    val dir = Files.createTempDirectory("graft-orc").toString + "/lzf"
    sparkWrite(dir, 400, "lzo")
    val all = Files.readAllBytes(java.nio.file.Paths.get(firstOrc(dir)))
    // walk the stripe's STREAM layout (footer-listed lengths) and take
    // the first compressed chunk at a true chunk boundary
    val meta = Orc.readTail(spark.sparkContext.hadoopConfiguration,
      firstOrc(dir))
    val st = meta.stripes.head
    val sfBytes = Orc.decompressStream(meta.compression, all,
      (st.offset + st.indexLength + st.dataLength).toInt,
      st.footerLength.toInt)
    val (streams, _, _) = Orc.parseStripeFooter(sfBytes)
    var chunk: Array[Byte] = null
    var pos = st.offset
    streams.foreach { s =>
      var p = pos.toInt
      val streamEnd = (pos + s.length).toInt
      while (chunk == null && p + 3 <= streamEnd) {
        val h = (all(p) & 0xff) | ((all(p + 1) & 0xff) << 8) |
          ((all(p + 2) & 0xff) << 16)
        val clen = h >>> 1
        if ((h & 1) == 0 && clen > 32 && p + 3 + clen <= streamEnd)
          chunk = java.util.Arrays.copyOfRange(all, p + 3, p + 3 + clen)
        else p += 3 + clen // next chunk boundary of this stream
      }
      pos += s.length
    }
    assert(chunk != null, "no compressed lzo chunk found")
    assert(Lzo.decodeRaw(chunk, 0, chunk.length, 1 << 24) != null)
    val r = new java.util.Random(48)
    (0 until 800).foreach { _ =>
      val m = chunk.clone()
      (0 until 1 + r.nextInt(4)).foreach { _ =>
        m(r.nextInt(m.length)) =
          (m(r.nextInt(m.length)) ^ (1 << r.nextInt(8))).toByte
      }
      Lzo.decodeRaw(m, 0, m.length, 1 << 24) // null or bytes, no throw
    }
    assert(Lzo.decodeRaw(null, 0, 0, 10) == null)
    assert(Lzo.decodeRaw(Array[Byte](1, 2), 5, 1, 10) == null)
  }

  test("dictionary-encoded strings (repetitive values)") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/dict"
    sparkWrite(dir, 400, "zlib", repeatStrings = true)
    check(dir, 400)
  }

  test("schema surface and null scattering") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/s"
    sparkWrite(dir, 50, "zlib")
    val df = Orc.readOrc(spark, firstOrc(dir))
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "score", "flag", "delta"))
    val r6 = df.filter(col("doc_id") === 6L).collect()(0)
    assert(r6.isNullAt(1) && r6.getBoolean(3) && r6.getInt(4) == -994)
    val r0 = df.filter(col("doc_id") === 0L).collect()(0)
    assert(r0.isNullAt(2))
  }

  test("readOrcFiles: spark multi-part dir with path provenance") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/multi"
    (0 until 200).map(i => (i.toLong, s"row $i"))
      .toDF("doc_id", "text")
      .repartition(3).write.mode("overwrite").orc(dir)
    val out = Orc.readOrcFiles(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("path", "doc_id", "text"))
    assert(out.count() == 200)
    assert(out.select("path").distinct().count() == 3)
    assert(out.agg(sum(col("doc_id"))).collect()(0).getLong(0) ==
      (0 until 200).map(_.toLong).sum)
  }

  test("UNION schema shape, non-orc bytes refuse") {
    // union (kind 13) lands as the tagged sparse struct on a synthetic
    // type tree (the decode itself is covered by the orc-core fixture)
    val st = Orc.rootStruct(Vector(
      Orc.TypeNode(12, Vector(1), Vector("u")),
      Orc.TypeNode(13, Vector(2, 3), Vector.empty),
      Orc.TypeNode(3, Vector.empty, Vector.empty),
      Orc.TypeNode(7, Vector.empty, Vector.empty)))
    val ut = st("u").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(ut.fieldNames.toSeq == Seq("tag", "m_0", "m_1"))
    assert(ut("m_0").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(ut("m_1").dataType ==
      org.apache.spark.sql.types.StringType)
    val junk = Files.createTempDirectory("graft-orc").toString + "/j.orc"
    Files.write(java.nio.file.Paths.get(junk),
      ("J" * 128).getBytes("US-ASCII"))
    intercept[Exception] {
      Orc.readTail(spark.sparkContext.hadoopConfiguration, junk)
    }
  }

  test("readTail refuses a multi-GB declared footer instead of wrapping") {
    // a >2 GB SPARSE file whose postscript declares a ~3 GB footer: the
    // "footer exceeds the file itself" check passes, and without the tail
    // cap the Long→Int narrowing of (need + 1024) wraps negative
    // (NegativeArraySizeException) or demands a ~3 GB driver buffer
    def varint(v0: Long): Array[Byte] = {
      var v = v0
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      out += v.toByte
      out.toArray
    }
    val footerLen = 3000000000L
    val ps = Array[Byte](0x08) ++ varint(footerLen) // field 1 varint
    val path = Files.createTempDirectory("graft-orc").toString + "/big.orc"
    val raf = new java.io.RandomAccessFile(path, "rw")
    try {
      raf.setLength(footerLen + 256) // sparse on linux: ~0 disk
      raf.seek(raf.length() - ps.length - 1)
      raf.write(ps)
      raf.write(ps.length) // trailing psLen byte
    } finally raf.close()
    val e = intercept[IllegalArgumentException] {
      Orc.readTail(spark.sparkContext.hadoopConfiguration, path)
    }
    assert(e.getMessage.contains("tail cap"))
  }

  test("decimal + timestamp columns vs spark.read.orc (incl. pre-2015/pre-1970)") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/dec"
    val df = (0 until 600).map { i =>
      val dec =
        if (i % 11 == 3) null
        else new java.math.BigDecimal(s"${i * 7919 - 100000}.${i % 100}")
          .setScale(2)
      // micros spanning pre-1970, pre-2015 and post-2015, with varying
      // trailing-zero counts AND both negative-epoch truncation tiers
      // (sub-millisecond-only vs ≥1 ms fractional parts)
      val micros = (i.toLong - 200) * 86400L * 1000000L * 37 +
        ((i % 3) match {
          case 0 => (i % 1000).toLong
          case 1 => 500000L + i.toLong * 7 % 1000L
          case _ => 0L
        })
      val ts =
        if (i % 13 == 6) null
        else java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L))
      (i.toLong, dec, ts)
    }.toDF("id", "dec", "ts")
      .select(col("id"), col("dec").cast("decimal(18,2)").as("dec"), col("ts"))
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "zlib").orc(dir)
    val mine = Orc.readOrc(spark, firstOrc(dir)).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDecimal(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2))).sortBy(_._1)
    val theirs = spark.read.orc(dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDecimal(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2))).sortBy(_._1)
    assert(mine.length == 600)
    assert(mine.toSeq == theirs.toSeq)
  }

  test("spark's timestamp_ntz attribute convention reads back NTZ-typed") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/ntz"
    val df = (0 until 300).map { i =>
      val us = (i.toLong - 100) * 86400000000L * 7 + i * 13L
      (i.toLong,
        if (i % 9 == 4) null
        else java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L),
          java.time.ZoneOffset.UTC))
    }.toDF("id", "wall")
    df.coalesce(1).write.mode("overwrite").orc(dir)
    assert(spark.read.orc(dir).schema("wall").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val mine = Orc.readOrc(spark, firstOrc(dir))
    assert(mine.schema("wall").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = mine.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getAs[java.time.LocalDateTime](1)))
      .sortBy(_._1)
    val theirs = spark.read.orc(dir).collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getAs[java.time.LocalDateTime](1)))
      .sortBy(_._1)
    assert(got.length == 300)
    assert(got.toSeq == theirs.toSeq)
  }

  test("high-precision decimal (>18 digits) round-trips") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/bigdec"
    val df = (0 until 200).map { i =>
      (i.toLong, new java.math.BigDecimal(
        s"${if (i % 2 == 0) "-" else ""}12345678901234567890123456789.${1000 + i}"))
    }.toDF("id", "big")
      .select(col("id"), col("big").cast("decimal(38,6)").as("big"))
    df.coalesce(1).write.mode("overwrite").orc(dir)
    val mine = Orc.readOrc(spark, firstOrc(dir)).collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).sortBy(_._1)
    val theirs = spark.read.orc(dir).collect()
      .map(r => (r.getLong(0), r.getDecimal(1))).sortBy(_._1)
    assert(mine.toSeq == theirs.toSeq)
  }

  test("list, map and nested struct columns vs spark.read.orc") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/nest"
    val df = (0 until 400).map { i =>
      val xs = if (i % 9 == 4) null else (0 until i % 5).map(j => s"v$i-$j")
      val m = if (i % 7 == 2) null
        else (0 until i % 4).map(j => (s"k$j", (i * 10 + j).toLong)).toMap
      val nested = if (i % 11 == 5) null
        else (s"name$i", if (i % 3 == 0) None else Some(i.toLong * 3))
      (i.toLong, xs, m, nested)
    }.toDF("id", "xs", "m", "nested")
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "zlib").orc(dir)
    def render(r: org.apache.spark.sql.Row): String =
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅"
        else r.get(i) match {
          case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
          case m: scala.collection.Map[_, _] =>
            m.toSeq.map { case (k, v) => s"$k=$v" }.sorted.mkString("{", ",", "}")
          case rr: org.apache.spark.sql.Row => render(rr)
          case x => x.toString
        }).mkString("(", "|", ")")
    val mine = Orc.readOrc(spark, firstOrc(dir)).collect()
      .map(render).sorted
    val theirs = spark.read.orc(dir).collect().map(render).sorted
    assert(mine.length == 400)
    assert(mine.toSeq == theirs.toSeq)
  }

  test("outlier-heavy ints (PATCHED_BASE territory) and full scalar breadth") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/outlier"
    val df = (0 until 2000).map { i =>
      val v = if (i % 90 == 7) 1L << 50 else (i % 512).toLong
      (i.toLong, v, i.toByte, (i * 3).toShort, i.toFloat / 2,
        java.sql.Date.valueOf("2020-01-01"))
    }.toDF("id", "outliers", "b", "s", "f", "d")
    df.coalesce(1).write.mode("overwrite").orc(dir)
    val mine = Orc.readOrc(spark, firstOrc(dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getByte(2), r.getShort(3),
        r.getFloat(4), r.getDate(5))).sortBy(_._1)
    assert(mine.length == 2000)
    mine.foreach { case (id, v, b, s, f, d) =>
      val i = id.toInt
      assert(v == (if (i % 90 == 7) 1L << 50 else (i % 512).toLong))
      assert(b == i.toByte && s == (i * 3).toShort && f == i.toFloat / 2)
      assert(d == java.sql.Date.valueOf("2020-01-01"))
    }
  }

  test("rle building blocks: byte rle, bool rle, rleV2 submodes") {
    // short repeat: 10 copies of 7 → header 0x02? width1 count 10-3=7
    val sr = Array[Byte](0x07, 7)
    assert(Orc.rleV2(sr, 10, signed = false).toSeq ==
      Seq.fill(10)(7L))
    // delta, fixed: 1,2,3,4,5 (signed) — header 0xC0|len, n=5
    // base=1 (zigzag 2), delta=+1 (zigzag 2)
    val d = Array[Byte](0xc0.toByte, 4, 2, 2)
    assert(Orc.rleV2(d, 5, signed = true).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // byte rle: run of 5 zeros then literals 1,2
    val br = Array[Byte](2, 0, -2, 1, 2)
    assert(Orc.byteRle(br, 7).toSeq == Seq[Byte](0, 0, 0, 0, 0, 1, 2))
  }

  test("rleV1 decoder: runs, deltas, signed literals (hand goldens)") {
    // run: control 7 → 10 values, delta +3, base 100 (unsigned varint)
    val run = Array[Byte](7, 3, 0x64)
    assert(Orc.rleV1(run, 10, signed = false).toSeq ===
      (0 until 10).map(k => 100L + 3 * k))
    // negative delta: control 0 → 3 values, delta -2, base 10
    val nd = Array[Byte](0, -2, 10)
    assert(Orc.rleV1(nd, 3, signed = false).toSeq === Seq(10L, 8L, 6L))
    // literals, signed zigzag: -1 (zz 1), 0 (zz 0), 300 (zz 600)
    val lit = Array[Byte](-3, 1, 0, 0xD8.toByte, 0x04)
    assert(Orc.rleV1(lit, 3, signed = true).toSeq === Seq(-1L, 0L, 300L))
    // overrun refuses
    intercept[IllegalArgumentException] {
      Orc.rleV1(Array[Byte](7, 1, 1), 5, signed = false)
    }
  }

  test("RLEv1 interop: Hive-0.11-version file (orc-core twin) reads exactly") {
    // orc-core with Version.V_0_11 writes RLEv1 DIRECT/DICTIONARY column
    // encodings (kinds 0/1) — decoding them with the v2 decoder returns
    // garbage that often parses, so this pins the per-encoding dispatch
    import org.apache.orc.{OrcFile, TypeDescription}
    import org.apache.hadoop.hive.ql.exec.vector._
    val dir = Files.createTempDirectory("graft-orc-v11").toString
    val path = s"$dir/v11.orc"
    val schema = TypeDescription.fromString(
      "struct<id:bigint,name:string,score:int>")
    val conf = new org.apache.hadoop.conf.Configuration()
    val w = OrcFile.createWriter(new org.apache.hadoop.fs.Path(path),
      OrcFile.writerOptions(conf).setSchema(schema)
        .version(OrcFile.Version.V_0_11)
        .compress(org.apache.orc.CompressionKind.ZLIB))
    val batch = schema.createRowBatch(1024)
    val ids = batch.cols(0).asInstanceOf[LongColumnVector]
    val names = batch.cols(1).asInstanceOf[BytesColumnVector]
    val scores = batch.cols(2).asInstanceOf[LongColumnVector]
    for (i <- 0 until 1000) {
      val r = batch.size
      ids.vector(r) = i * 7L - 100
      names.setVal(r, s"name${i % 5}".getBytes("UTF-8")) // → dictionary
      scores.vector(r) = i % 13
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
    // guard against a vacuous pass: the stripe must really carry v1
    // encodings (kind 0 DIRECT / 1 DICTIONARY)
    val meta = Orc.readTail(conf, path)
    val st = meta.stripes.head
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val buf = new Array[Byte]((st.indexLength + st.dataLength +
      st.footerLength).toInt)
    try in.readFully(st.offset, buf) finally in.close()
    val sf = Orc.decompressStream(meta.compression, buf,
      (st.indexLength + st.dataLength).toInt, st.footerLength.toInt)
    val (_, encs, _) = Orc.parseStripeFooter(sf)
    assert(encs.exists(e => e.kind == 0 || e.kind == 1),
      s"fixture must carry RLEv1 encodings, got ${encs.map(_.kind)}")
    val rows = Orc.readOrc(spark, path).collect().sortBy(_.getLong(0))
    assert(rows.length === 1000)
    (0 until 1000).foreach { i =>
      val r = rows(i)
      assert(r.getLong(0) === i * 7L - 100)
      assert(r.getString(1) === s"name${i % 5}", s"row $i")
      assert(r.getInt(2) === i % 13, s"row $i")
    }
  }

  test("stripe pruning: stats skip non-intersecting stripes, results exact") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/stats"
    // sorted key + tiny stripes → many stripes with disjoint key ranges
    // (values are incompressible-ish digits so stripes actually roll)
    (0 until 20000).map(i => (i.toLong,
        s"row $i " + (i * 2654435761L).toString * 8))
      .toDF("k", "v").coalesce(1)
      .sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("orc.stripe.size", "65536")
      .option("orc.compress", "NONE").orc(dir)
    val path = firstOrc(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = Orc.readTail(conf, path)
    assume(meta.stripes.length >= 3, "fixture produced too few stripes")
    val stats = Orc.readStripeStats(conf, path)
    assert(stats.isDefined && stats.get.length == meta.stripes.length)
    // the key column (type id 1) carries int stats in every stripe
    assert(stats.get.forall(_.ints(1).isDefined))
    val keptAll = Orc.pruneByIntRange(meta.stripes.length, stats, 1,
      Long.MinValue, Long.MaxValue)
    assert(keptAll.length == meta.stripes.length)
    val keptMid = Orc.pruneByIntRange(meta.stripes.length, stats, 1,
      9000L, 9999L)
    assert(keptMid.nonEmpty && keptMid.length < meta.stripes.length)
    // pruned + residual filter equals the unpruned read's filter
    val pruned = Orc.readOrc(spark, path,
        pruneBy = Some(("k", 9000L, 9999L)))
      .filter(col("k").between(9000, 9999))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val full = Orc.readOrc(spark, path)
      .filter(col("k").between(9000, 9999))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(pruned.length == 1000 && pruned.toSeq == full.toSeq)
    // an empty range prunes every stripe
    assert(Orc.pruneByIntRange(meta.stripes.length, stats, 1,
      -500L, -1L).isEmpty)
    // unknown prune column refuses
    intercept[IllegalArgumentException] {
      Orc.readOrc(spark, path, pruneBy = Some(("nope", 0L, 1L)))
    }
  }

  test("column pruning: subset equals full read's projection; unknown refuses") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/prune"
    sparkWrite(dir, 300, "zlib")
    val path = firstOrc(dir)
    val pruned = Orc.readOrc(spark, path, columns = Seq("delta", "doc_id"))
    assert(pruned.schema.fieldNames.toSeq == Seq("delta", "doc_id"))
    val got = pruned.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._2)
    assert(got.length == 300)
    got.foreach { case (d, id) => assert(d == id.toInt - 1000) }
    intercept[IllegalArgumentException] {
      Orc.readOrc(spark, path, columns = Seq("nope")).collect()
    }
    // multi-file variant prunes too
    val multi = Orc.readOrcFiles(spark, dir, columns = Seq("doc_id"))
    assert(multi.schema.fieldNames.toSeq == Seq("path", "doc_id"))
    assert(multi.count() == 300)
  }

  test("union columns land as tagged sparse structs (orc-core twin)") {
    // Spark's sink cannot write unions, so the fixture comes from
    // orc-core's own Writer — the on-classpath reference implementation
    // for the packed-children union layout (tag byte RLE + per-branch
    // packed child columns)
    import org.apache.orc.{OrcFile, TypeDescription}
    import org.apache.hadoop.hive.ql.exec.vector._
    val dir = Files.createTempDirectory("graft-orc-union").toString
    val path = s"$dir/u.orc"
    val schema = TypeDescription.fromString(
      "struct<doc_id:bigint,v:uniontype<bigint,string>," +
        "w:uniontype<int,struct<a:int,b:string>>>")
    val conf = new org.apache.hadoop.conf.Configuration()
    val w = OrcFile.createWriter(new org.apache.hadoop.fs.Path(path),
      OrcFile.writerOptions(conf).setSchema(schema)
        .stripeSize(64 * 1024).compress(
          org.apache.orc.CompressionKind.ZLIB))
    val batch = schema.createRowBatch(64)
    val ids = batch.cols(0).asInstanceOf[LongColumnVector]
    val uv = batch.cols(1).asInstanceOf[UnionColumnVector]
    val uvL = uv.fields(0).asInstanceOf[LongColumnVector]
    val uvS = uv.fields(1).asInstanceOf[BytesColumnVector]
    val wv = batch.cols(2).asInstanceOf[UnionColumnVector]
    val wvI = wv.fields(0).asInstanceOf[LongColumnVector]
    val wvP = wv.fields(1).asInstanceOf[StructColumnVector]
    val wvPa = wvP.fields(0).asInstanceOf[LongColumnVector]
    val wvPb = wvP.fields(1).asInstanceOf[BytesColumnVector]
    uv.noNulls = false
    for (i <- 0 until 300) {
      val r = batch.size
      ids.vector(r) = i.toLong
      i % 3 match {
        case 0 => uv.isNull(r) = true
        case 1 => uv.tags(r) = 0; uvL.vector(r) = i * 101L
        case _ =>
          uv.tags(r) = 1
          uvS.setVal(r, s"str$i".getBytes("UTF-8"))
      }
      if (i % 2 == 0) { wv.tags(r) = 0; wvI.vector(r) = i - 7 }
      else {
        wv.tags(r) = 1
        wvPa.vector(r) = i * 3L
        wvPb.setVal(r, s"pb$i".getBytes("UTF-8"))
      }
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset(); uv.noNulls = false }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()

    val df = Orc.readOrc(spark, path)
    val vt = df.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt.fieldNames.toSeq == Seq("tag", "m_0", "m_1"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == 300)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      i % 3 match {
        case 0 => assert(r.isNullAt(1))
        case 1 =>
          val u = r.getStruct(1)
          assert(u.getInt(0) == 0 && u.getLong(1) == i * 101L &&
            u.isNullAt(2))
        case _ =>
          val u = r.getStruct(1)
          assert(u.getInt(0) == 1 && u.isNullAt(1) &&
            u.getString(2) == s"str$i")
      }
      val uw = r.getStruct(2)
      if (i % 2 == 0)
        assert(uw.getInt(0) == 0 && uw.getInt(1) == i - 7 && uw.isNullAt(2))
      else {
        assert(uw.getInt(0) == 1 && uw.isNullAt(1))
        val p = uw.getStruct(2)
        assert(p.getInt(0) == i * 3 && p.getString(1) == s"pb$i")
      }
    }
    // column pruning through a union column stays exact
    val pruned = Orc.readOrc(spark, path, columns = Seq("v")).collect()
    assert(pruned.length == 300)
  }

}
