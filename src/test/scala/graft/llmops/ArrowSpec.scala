package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.nio.file.Files

class ArrowSpec extends SparkTestBase {

  import Arrow._

  private def javaWrite(path: String, n: Int, batchRows: Int,
      codec: String = "none"): Unit = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val fields = java.util.Arrays.asList(
        new org.apache.arrow.vector.types.pojo.Field("doc_id",
          org.apache.arrow.vector.types.pojo.FieldType.notNullable(
            new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true)),
          null),
        new org.apache.arrow.vector.types.pojo.Field("text",
          org.apache.arrow.vector.types.pojo.FieldType.nullable(
            org.apache.arrow.vector.types.pojo.ArrowType.Utf8.INSTANCE),
          null),
        new org.apache.arrow.vector.types.pojo.Field("score",
          org.apache.arrow.vector.types.pojo.FieldType.nullable(
            new org.apache.arrow.vector.types.pojo.ArrowType.FloatingPoint(
              org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)),
          null))
      val schema = new org.apache.arrow.vector.types.pojo.Schema(fields)
      val root = org.apache.arrow.vector.VectorSchemaRoot.create(schema,
        alloc)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w =
        if (codec == "none")
          new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        else {
          val codecType = codec match {
            case "lz4" => org.apache.arrow.vector.compression
              .CompressionUtil.CodecType.LZ4_FRAME
            case "zstd" => org.apache.arrow.vector.compression
              .CompressionUtil.CodecType.ZSTD
          }
          new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch,
            null, org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
            org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
            codecType)
        }
      w.start()
      var written = 0
      while (written < n) {
        val m = math.min(batchRows, n - written)
        root.allocateNew()
        val ids = root.getVector("doc_id")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val texts = root.getVector("text")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        val scores = root.getVector("score")
          .asInstanceOf[org.apache.arrow.vector.Float8Vector]
        (0 until m).foreach { k =>
          val i = written + k
          ids.setSafe(k, i.toLong)
          if (i % 5 == 4) texts.setNull(k)
          else texts.setSafe(k,
            s"text $i ${"y" * (i % 23)}".getBytes("UTF-8"))
          if (i % 3 == 0) scores.setNull(k)
          else scores.setSafe(k, i / 4.0)
        }
        root.setRowCount(m)
        w.writeBatch()
        written += m
      }
      w.end(); w.close(); ch.close()
      root.close()
    } finally alloc.close()
  }

  private def checkJavaFile(path: String, n: Int): Unit = {
    val df = Arrow.readArrow(spark, path)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text", "score"))
    val rows = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).sortBy(_._1)
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case ((id, text, score), i) =>
      assert(id == i.toLong)
      if (i % 5 == 4) assert(text == null)
      else assert(text == s"text $i ${"y" * (i % 23)}")
      if (i % 3 == 0) assert(score == null) else assert(score == i / 4.0)
    }
  }

  test("interop: arrow-java files read back, multiple batches, nulls") {
    val path = Files.createTempDirectory("graft-arrow").toString + "/a.arrow"
    javaWrite(path, 250, batchRows = 64)
    checkJavaFile(path, 250)
  }

  test("interop: lz4 and zstd compressed bodies decode") {
    for (codec <- Seq("lz4", "zstd")) {
      val path = Files.createTempDirectory("graft-arrow").toString +
        s"/$codec.arrow"
      javaWrite(path, 150, batchRows = 50, codec = codec)
      checkJavaFile(path, 150)
    }
  }

  test("interop: our writer's bytes read by arrow's own reader") {
    val fields = Vector(
      AField("doc_id", nullable = false, AInt(64)),
      AField("text", nullable = true, AString(large = false)),
      AField("flag", nullable = true, ABool))
    val rows = (0 until 90).map(i => Row(i.toLong,
      if (i % 4 == 3) null else s"mine $i",
      if (i % 7 == 0) null else java.lang.Boolean.valueOf(i % 2 == 0)))
    val bytes = ArrowWriter.write(fields, rows, rowsPerBatch = 32)
    val path = Files.createTempDirectory("graft-arrow").toString + "/w.arrow"
    Files.write(java.nio.file.Paths.get(path), bytes)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val r = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(path).getChannel, alloc)
      var i = 0
      while (r.loadNextBatch()) {
        val root = r.getVectorSchemaRoot
        val ids = root.getVector("doc_id")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val texts = root.getVector("text")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        val flags = root.getVector("flag")
          .asInstanceOf[org.apache.arrow.vector.BitVector]
        (0 until root.getRowCount).foreach { k =>
          assert(ids.get(k) == i.toLong)
          if (i % 4 == 3) assert(texts.isNull(k))
          else assert(new String(texts.get(k), "UTF-8") == s"mine $i")
          if (i % 7 == 0) assert(flags.isNull(k))
          else assert((flags.get(k) == 1) == (i % 2 == 0))
          i += 1
        }
      }
      r.close()
      assert(i == 90)
    } finally alloc.close()
    // and through our own reader
    val mine = Arrow.readArrow(spark, path).collect()
      .map(r => r.getLong(0)).sorted
    assert(mine.toSeq == (0L until 90L))
  }

  test("roundtrip breadth: ints, floats, binary, lists, structs") {
    val fields = Vector(
      AField("i8", nullable = true, AInt(8)),
      AField("i16", nullable = true, AInt(16)),
      AField("i32", nullable = true, AInt(32)),
      AField("f32", nullable = true, AFloat),
      AField("bin", nullable = true, ABinary(large = false)),
      AField("ls", nullable = true,
        AList(AField("item", nullable = true, AInt(64)), large = false)),
      AField("st", nullable = true, AStruct(Vector(
        AField("a", nullable = true, AInt(32)),
        AField("b", nullable = true, AString(large = false))))))
    val rows = Seq(
      Row(1.toByte, 300.toShort, 70000, 1.5f, Array[Byte](1, 2),
        Seq(1L, 2L, 3L), Row(7, "x")),
      Row(null, null, null, null, null, Seq.empty[Long], Row(null, "y")),
      Row(2.toByte, (-5).toShort, -1, -0.25f, Array[Byte](),
        null, null))
    val bytes = ArrowWriter.write(fields, rows, rowsPerBatch = 2)
    val path = Files.createTempDirectory("graft-arrow").toString + "/b.arrow"
    Files.write(java.nio.file.Paths.get(path), bytes)
    val out = Arrow.readArrow(spark, path).collect()
      .sortBy(r => if (r.isNullAt(0)) Byte.MaxValue else r.getByte(0))
    assert(out.length == 3)
    val r0 = out.find(r => !r.isNullAt(0) && r.getByte(0) == 1).get
    assert(r0.getShort(1) == 300 && r0.getInt(2) == 70000 &&
      r0.getFloat(3) == 1.5f)
    assert(r0.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2))
    assert(r0.getSeq[Long](5) == Seq(1L, 2L, 3L))
    assert(r0.getStruct(6).getInt(0) == 7 &&
      r0.getStruct(6).getString(1) == "x")
    val rn = out.find(r => r.isNullAt(0)).get
    assert(rn.getSeq[Long](5) == Seq.empty)
    assert(rn.getStruct(6).isNullAt(0) &&
      rn.getStruct(6).getString(1) == "y")
    val r2 = out.find(r => !r.isNullAt(0) && r.getByte(0) == 2).get
    assert(r2.isNullAt(5) && r2.isNullAt(6))
  }

  test("corruption blast radius: one batch drops, footer keeps the rest") {
    val path = Files.createTempDirectory("graft-arrow").toString + "/c.arrow"
    javaWrite(path, 200, batchRows = 40, codec = "zstd")
    val b = Files.readAllBytes(java.nio.file.Paths.get(path))
    val mid = b.length / 2
    (0 until 16).foreach(k => b(mid + k) = (b(mid + k) ^ 0x77).toByte)
    val cpath = path + ".corrupt"
    Files.write(java.nio.file.Paths.get(cpath), b)
    val n = Arrow.readArrow(spark, cpath).count()
    assert(n < 200 && n >= 120, s"one-batch blast radius, got $n")
  }

  private def javaWriteDict(path: String, n: Int, batchRows: Int,
      withDelta: Boolean = false): Vector[String] = {
    val dictVals = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val enc = new org.apache.arrow.vector.types.pojo.DictionaryEncoding(
        7L, false, new org.apache.arrow.vector.types.pojo.ArrowType.Int(
          32, true))
      val dictVec = new org.apache.arrow.vector.VarCharVector(
        "dict7", alloc)
      dictVec.allocateNew()
      dictVals.zipWithIndex.foreach { case (v, i) =>
        dictVec.setSafe(i, v.getBytes("UTF-8")) }
      dictVec.setValueCount(dictVals.length)
      val dict = new org.apache.arrow.vector.dictionary.Dictionary(
        dictVec, enc)
      val provider = new org.apache.arrow.vector.dictionary
        .DictionaryProvider.MapDictionaryProvider(dict)
      val idsField = new org.apache.arrow.vector.types.pojo.Field(
        "doc_id", org.apache.arrow.vector.types.pojo.FieldType.notNullable(
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true)),
        null)
      val tagField = new org.apache.arrow.vector.types.pojo.Field("tag",
        new org.apache.arrow.vector.types.pojo.FieldType(true,
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(32, true),
          enc), null)
      val ids = idsField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.BigIntVector]
      val tags = tagField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.IntVector]
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(idsField, tagField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, tags), 0)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        provider, ch)
      w.start()
      var written = 0
      while (written < n) {
        val m = math.min(batchRows, n - written)
        root.allocateNew()
        (0 until m).foreach { k =>
          val i = written + k
          ids.setSafe(k, i.toLong)
          if (i % 11 == 3) tags.setNull(k)
          else tags.setSafe(k, i % dictVals.length)
        }
        root.setRowCount(m)
        w.writeBatch()
        written += m
      }
      w.end(); w.close(); ch.close(); root.close(); dictVec.close()
    } finally alloc.close()
    dictVals
  }

  test("interop: dictionary-encoded strings from arrow-java") {
    val path = Files.createTempDirectory("graft-arrow").toString +
      "/dict.arrow"
    val dictVals = javaWriteDict(path, 300, batchRows = 64)
    val df = Arrow.readArrow(spark, path)
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "tag"))
    assert(df.schema("tag").dataType ==
      org.apache.spark.sql.types.StringType)
    val rows = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1)
    assert(rows.length == 300)
    rows.foreach { case (id, tag) =>
      if (id % 11 == 3) assert(tag == null)
      else assert(tag == dictVals((id % dictVals.length).toInt))
    }
    // pruning composes: the dict column skips cleanly, and reads alone
    assert(Arrow.readArrow(spark, path, columns = Seq("doc_id"))
      .count() == 300)
    val tagsOnly = Arrow.readArrow(spark, path, columns = Seq("tag"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(tagsOnly.count(_ == null) == rows.count(_._2 == null))
    // and the multi-file reader resolves per-file dictionaries
    val dir = Files.createTempDirectory("graft-arrow").toString + "/dd"
    new java.io.File(dir).mkdirs()
    javaWriteDict(dir + "/s0.arrow", 40, batchRows = 16)
    javaWriteDict(dir + "/s1.arrow", 40, batchRows = 16)
    assert(Arrow.readArrowFiles(spark, dir).count() == 80)
  }

  test("temporal columns land typed; twin round-trips both directions") {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val path = Files.createTempDirectory("graft-arrow").toString +
      "/temporal.arrow"
    try {
      import org.apache.arrow.vector.types.pojo._
      val dayField = new Field("day", FieldType.nullable(
        new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)),
        null)
      val tsField = new Field("ts", FieldType.nullable(
        new ArrowType.Timestamp(
          org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")),
        null)
      val ntzField = new Field("ntz", FieldType.nullable(
        new ArrowType.Timestamp(
          org.apache.arrow.vector.types.TimeUnit.MICROSECOND, null)),
        null)
      val day = dayField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.DateDayVector]
      val ts = tsField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.TimeStampMicroTZVector]
      val ntz = ntzField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.TimeStampMicroVector]
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(dayField, tsField, ntzField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          day, ts, ntz), 0)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
        ch)
      w.start()
      root.allocateNew()
      (0 until 100).foreach { i =>
        if (i % 7 == 1) day.setNull(i) else day.setSafe(i, i - 50)
        if (i % 7 == 2) ts.setNull(i)
        else ts.setSafe(i, (i.toLong - 50) * 86400000000L * 3 + i * 7L)
        if (i % 7 == 3) ntz.setNull(i)
        else ntz.setSafe(i, (i.toLong - 50) * 86400000000L + i * 11L)
      }
      root.setRowCount(100)
      w.writeBatch()
      w.end(); w.close(); ch.close(); root.close()
    } finally alloc.close()
    val df = Arrow.readArrow(spark, path)
    import org.apache.spark.sql.types._
    assert(df.schema("day").dataType == DateType)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ntz").dataType == TimestampNTZType)
    val rows = df.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      // recover i from whichever column is non-null
      val i =
        if (!r.isNullAt(0))
          r.getDate(0).toLocalDate.toEpochDay.toInt + 50
        else (Math.floorDiv(
          r.getTimestamp(1).toInstant.getEpochSecond, 86400L * 3).toInt + 50)
      if (i % 7 == 1) assert(r.isNullAt(0))
      else assert(r.getDate(0).toLocalDate.toEpochDay == i - 50L)
      if (i % 7 == 2) assert(r.isNullAt(1))
      else {
        val us = (i.toLong - 50) * 86400000000L * 3 + i * 7L
        assert(r.getTimestamp(1).toInstant == java.time.Instant
          .ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L))
      }
      if (i % 7 == 3) assert(r.isNullAt(2))
      else {
        val us = (i.toLong - 50) * 86400000000L + i * 11L
        assert(r.getAs[java.time.LocalDateTime](2) ==
          java.time.LocalDateTime.ofInstant(java.time.Instant
            .ofEpochSecond(Math.floorDiv(us, 1000000L),
              Math.floorMod(us, 1000000L) * 1000L),
            java.time.ZoneOffset.UTC))
      }
    }
    // twin direction: our writer's temporal bytes read by arrow-java
    // and by our own reader
    val fields = ArrowWriter.fieldsFor(
      StructType(Seq(
        StructField("day", DateType),
        StructField("ts", TimestampType),
        StructField("ntz", TimestampNTZType))))
    val mkRows = (0 until 60).map { i =>
      Row(
        if (i % 5 == 1) null
        else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i - 30L)),
        if (i % 5 == 2) null
        else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          (i.toLong - 30) * 997L, (i % 1000).toLong * 1000L)),
        if (i % 5 == 3) null
        else java.time.LocalDateTime.ofEpochSecond(
          (i.toLong - 30) * 991L, (i % 1000) * 1000, java.time.ZoneOffset.UTC))
    }
    val twin = Files.createTempDirectory("graft-arrow").toString +
      "/temporal_twin.arrow"
    val out = new java.io.FileOutputStream(twin)
    val streamer = new ArrowWriter.Streamer(fields, out)
    streamer.append(mkRows)
    streamer.finish(); out.close()
    // arrow-java consumes it
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(twin).getChannel, alloc2)
      val sch = rdr.getVectorSchemaRoot.getSchema
      assert(sch.findField("day").getType ==
        new org.apache.arrow.vector.types.pojo.ArrowType.Date(
          org.apache.arrow.vector.types.DateUnit.DAY))
      assert(sch.findField("ts").getType ==
        new org.apache.arrow.vector.types.pojo.ArrowType.Timestamp(
          org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC"))
      assert(rdr.loadNextBatch())
      val vroot = rdr.getVectorSchemaRoot
      assert(vroot.getRowCount == 60)
      val dv = vroot.getVector("day")
        .asInstanceOf[org.apache.arrow.vector.DateDayVector]
      assert(dv.get(0) == -30 && dv.isNull(1))
      rdr.close()
    } finally alloc2.close()
    // and our reader round-trips it typed
    val back = Arrow.readArrow(spark, twin).collect()
    assert(back.length == 60)
    assert(back.count(_.isNullAt(0)) == mkRows.count(_.isNullAt(0)))
    val b5 = back.map(r => (if (r.isNullAt(1)) null
      else r.getTimestamp(1))).filter(_ != null).map(_.toInstant).toSet
    val w5 = mkRows.map(r => r.get(1)).filter(_ != null)
      .map(_.asInstanceOf[java.sql.Timestamp].toInstant).toSet
    assert(b5 == w5)
  }

  test("interval columns land typed; twin round-trips both directions") {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val path = Files.createTempDirectory("graft-arrow").toString +
      "/interval.arrow"
    try {
      import org.apache.arrow.vector.types.pojo._
      import org.apache.arrow.vector.types.IntervalUnit
      val ymField = new Field("ym", FieldType.nullable(
        new ArrowType.Interval(IntervalUnit.YEAR_MONTH)), null)
      val dtField = new Field("dt", FieldType.nullable(
        new ArrowType.Interval(IntervalUnit.DAY_TIME)), null)
      val mdnField = new Field("mdn", FieldType.nullable(
        new ArrowType.Interval(IntervalUnit.MONTH_DAY_NANO)), null)
      val ym = ymField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.IntervalYearVector]
      val dt = dtField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.IntervalDayVector]
      val mdn = mdnField.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.IntervalMonthDayNanoVector]
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ymField, dtField, mdnField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ym, dt, mdn), 0)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
        ch)
      w.start()
      root.allocateNew()
      (0 until 90).foreach { i =>
        if (i % 7 == 1) ym.setNull(i) else ym.setSafe(i, i - 45)
        if (i % 7 == 2) dt.setNull(i)
        else dt.setSafe(i, i - 45, i * 977 - 40000)
        if (i % 7 == 3) mdn.setNull(i)
        // nanos: whole micros on most rows; row 11 carries a sub-micro
        // remainder and must land NULL (refuse-to-NULL, not truncate)
        else mdn.setSafe(i, i % 13, i - 45,
          if (i == 11) 1500L else (i.toLong - 45) * 1000000L)
      }
      root.setRowCount(90)
      w.writeBatch()
      w.end(); w.close(); ch.close(); root.close()
    } finally alloc.close()
    val df = Arrow.readArrow(spark, path)
    import org.apache.spark.sql.types._
    assert(df.schema("ym").dataType == YearMonthIntervalType())
    assert(df.schema("dt").dataType == DayTimeIntervalType())
    assert(df.schema("mdn").dataType == CalendarIntervalType)
    val rows = df.collect()
    assert(rows.length == 90)
    rows.zipWithIndex.foreach { case (r, idx) =>
      val i = idx // single batch preserves slot order
      if (i % 7 == 1) assert(r.isNullAt(0))
      else assert(r.getAs[java.time.Period](0).toTotalMonths == i - 45L)
      if (i % 7 == 2) assert(r.isNullAt(1))
      else assert(r.getAs[java.time.Duration](1) ==
        java.time.Duration.ofDays(i - 45L).plusMillis(i * 977L - 40000L))
      if (i % 7 == 3 || i == 11) assert(r.isNullAt(2))
      else {
        val ci = r.getAs[
          org.apache.spark.unsafe.types.CalendarInterval](2)
        assert(ci.months == i % 13 && ci.days == i - 45 &&
          ci.microseconds == (i.toLong - 45) * 1000L)
      }
    }
    // intervals are usable in Catalyst arithmetic straight off the scan
    val shifted = df.select(
      org.apache.spark.sql.functions.expr(
        "date '2000-01-15' + ym").as("d")).na.drop().collect()
    assert(shifted.map(_.getDate(0).toLocalDate).contains(
      java.time.LocalDate.parse("2000-02-15"))) // i=46 → +1 month
    // twin direction: our writer's interval bytes read by arrow-java
    // and by our own reader
    val fields = ArrowWriter.fieldsFor(
      StructType(Seq(
        StructField("ym", YearMonthIntervalType()),
        StructField("dt", DayTimeIntervalType()),
        StructField("mdn", CalendarIntervalType))))
    val mkRows = (0 until 40).map { i =>
      Row(
        if (i % 5 == 1) null else java.time.Period.ofMonths(i - 20),
        if (i % 5 == 2) null
        else java.time.Duration.ofDays(i - 20L).plusMillis(i * 31L),
        if (i % 5 == 3) null
        else new org.apache.spark.unsafe.types.CalendarInterval(
          i % 7, i - 20, i * 500000L - 3000000L))
    }
    val twin = Files.createTempDirectory("graft-arrow").toString +
      "/interval_twin.arrow"
    val out = new java.io.FileOutputStream(twin)
    val streamer = new ArrowWriter.Streamer(fields, out)
    streamer.append(mkRows)
    streamer.finish(); out.close()
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(twin).getChannel, alloc2)
      val sch = rdr.getVectorSchemaRoot.getSchema
      assert(sch.findField("ym").getType ==
        new org.apache.arrow.vector.types.pojo.ArrowType.Interval(
          org.apache.arrow.vector.types.IntervalUnit.YEAR_MONTH))
      assert(sch.findField("mdn").getType ==
        new org.apache.arrow.vector.types.pojo.ArrowType.Interval(
          org.apache.arrow.vector.types.IntervalUnit.MONTH_DAY_NANO))
      assert(rdr.loadNextBatch())
      val vroot = rdr.getVectorSchemaRoot
      assert(vroot.getRowCount == 40)
      val yv = vroot.getVector("ym")
        .asInstanceOf[org.apache.arrow.vector.IntervalYearVector]
      assert(yv.get(0) == -20 && yv.isNull(1))
      val mv = vroot.getVector("mdn")
        .asInstanceOf[org.apache.arrow.vector.IntervalMonthDayNanoVector]
      val h = new org.apache.arrow.vector.holders
        .NullableIntervalMonthDayNanoHolder()
      mv.get(0, h)
      assert(h.months == 0 && h.days == -20 &&
        h.nanoseconds == -3000000000L)
      rdr.close()
    } finally alloc2.close()
    val back = Arrow.readArrow(spark, twin).collect()
    assert(back.length == 40)
    (0 until 40).foreach { i =>
      val r = back(i)
      if (i % 5 == 1) assert(r.isNullAt(0))
      else assert(r.getAs[java.time.Period](0).toTotalMonths == i - 20L)
      if (i % 5 == 2) assert(r.isNullAt(1))
      else assert(r.getAs[java.time.Duration](1) ==
        java.time.Duration.ofDays(i - 20L).plusMillis(i * 31L))
      if (i % 5 == 3) assert(r.isNullAt(2))
      else {
        val ci = r.getAs[
          org.apache.spark.unsafe.types.CalendarInterval](2)
        assert(ci.months == i % 7 && ci.days == i - 20 &&
          ci.microseconds == i * 500000L - 3000000L)
      }
    }
  }

  test("decimal128 columns: arrow-java interop both directions") {
    val path = Files.createTempDirectory("graft-arrow").toString +
      "/dec.arrow"
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      import org.apache.arrow.vector.types.pojo._
      val f = new Field("price", FieldType.nullable(
        new ArrowType.Decimal(18, 2, 128)), null)
      val v = f.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.DecimalVector]
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(f),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](v), 0)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
        ch)
      w.start()
      root.allocateNew()
      (0 until 90).foreach { i =>
        if (i % 8 == 5) v.setNull(i)
        else v.setSafe(i, new java.math.BigDecimal(
          s"${i * 317 - 9000}.${10 + i % 90}").setScale(2))
      }
      root.setRowCount(90)
      w.writeBatch()
      w.end(); w.close(); ch.close(); root.close()
    } finally alloc.close()
    val df = Arrow.readArrow(spark, path)
    assert(df.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 2))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDecimal(0))
    assert(got.length == 90 &&
      got.count(_ == null) == (0 until 90).count(_ % 8 == 5))
    val want = (0 until 90).map(i =>
      if (i % 8 == 5) null
      else new java.math.BigDecimal(s"${i * 317 - 9000}.${10 + i % 90}")
        .setScale(2))
    assert(got.filter(_ != null).toSet == want.filter(_ != null).toSet)
    // twin direction: our Decimal128 bytes read by arrow-java
    val fields = ArrowWriter.fieldsFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DecimalType(18, 2)))))
    val rows = (0 until 40).map(i => Row(
      if (i % 6 == 3) null
      else new java.math.BigDecimal(s"${i * 991 - 2000}.${10 + i % 80}")
        .setScale(2)))
    val twin = Files.createTempDirectory("graft-arrow").toString +
      "/dec_twin.arrow"
    val out = new java.io.FileOutputStream(twin)
    val streamer = new ArrowWriter.Streamer(fields, out)
    streamer.append(rows)
    streamer.finish(); out.close()
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(twin).getChannel, alloc2)
      assert(rdr.loadNextBatch())
      val vr = rdr.getVectorSchemaRoot
      val dv = vr.getVector("price")
        .asInstanceOf[org.apache.arrow.vector.DecimalVector]
      (0 until 40).foreach { i =>
        if (i % 6 == 3) assert(dv.isNull(i))
        else assert(dv.getObject(i) == new java.math.BigDecimal(
          s"${i * 991 - 2000}.${10 + i % 80}").setScale(2))
      }
      rdr.close()
    } finally alloc2.close()
    // and our own reader round-trips it
    assert(Arrow.readArrow(spark, twin).collect()
      .count(!_.isNullAt(0)) == rows.count(_.get(0) != null))
  }

  test("fixed-size-list embeddings from arrow-java land as arrays") {
    val path = Files.createTempDirectory("graft-arrow").toString +
      "/fsl.arrow"
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      import org.apache.arrow.vector.types.pojo._
      val child = new Field("item", FieldType.nullable(
        new ArrowType.FloatingPoint(
          org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)),
        null)
      val f = new Field("emb", FieldType.nullable(
        new ArrowType.FixedSizeList(4)),
        java.util.Arrays.asList(child))
      val v = f.createVector(alloc)
        .asInstanceOf[org.apache.arrow.vector.complex.FixedSizeListVector]
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(f),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](v), 0)
      val ch = java.nio.channels.Channels.newChannel(
        new java.io.FileOutputStream(path))
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null,
        ch)
      w.start()
      root.allocateNew()
      val data = v.getDataVector
        .asInstanceOf[org.apache.arrow.vector.Float4Vector]
      (0 until 120).foreach { i =>
        if (i % 9 == 4) v.setNull(i)
        else {
          v.setNotNull(i)
          (0 until 4).foreach(j => data.setSafe(i * 4 + j, i + j / 8.0f))
        }
      }
      root.setRowCount(120)
      w.writeBatch()
      w.end(); w.close(); ch.close(); root.close()
    } finally alloc.close()
    val df = Arrow.readArrow(spark, path)
    assert(df.schema("emb").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val rows = df.collect()
    assert(rows.length == 120)
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i % 9 == 4) assert(r.isNullAt(0))
      else assert(r.getSeq[Float](0) ==
        (0 until 4).map(j => i + j / 8.0f))
    }
  }

  test("refusals: bad magic, unsigned ints") {
    intercept[IllegalArgumentException] {
      Arrow.readFooter(spark.sparkContext.hadoopConfiguration,
        { val p = Files.createTempDirectory("graft-arrow").toString +
            "/junk.arrow"
          Files.write(java.nio.file.Paths.get(p),
            ("X" * 64).getBytes("US-ASCII"))
          p })
    }
  }

  test("readArrowFiles: directory of shards, path provenance, schema gate") {
    val dir = Files.createTempDirectory("graft-arrow-multi").toString
    val fields = Vector(
      AField("doc_id", nullable = false, AInt(64)),
      AField("text", nullable = true, AString(large = false)))
    for (s <- 0 until 3) {
      val rows = (0 until 30).map(i => Row(s * 100L + i, s"s$s r$i"))
      Files.write(java.nio.file.Paths.get(s"$dir/part-$s.arrow"),
        ArrowWriter.write(fields, rows, rowsPerBatch = 8))
    }
    val out = Arrow.readArrowFiles(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("path", "doc_id", "text"))
    assert(out.count() == 90)
    assert(out.select("path").distinct().count() == 3)
    Files.write(java.nio.file.Paths.get(s"$dir/part-bad.arrow"),
      ArrowWriter.write(Vector(AField("z", nullable = true, ABool)),
        Seq(Row(true))))
    intercept[IllegalArgumentException] {
      Arrow.readArrowFiles(spark, dir)
    }
  }


  test("column pruning: skipped fields never decode; unknown refuses") {
    val path = Files.createTempDirectory("graft-arrow").toString + "/p.arrow"
    javaWrite(path, 120, batchRows = 40, codec = "zstd")
    val pruned = Arrow.readArrow(spark, path, columns = Seq("score", "doc_id"))
    assert(pruned.schema.fieldNames.toSeq == Seq("score", "doc_id"))
    val got = pruned.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getDouble(0), r.getLong(1)))
      .sortBy(_._2)
    assert(got.length == 120)
    got.foreach { case (s, id) =>
      if (id % 3 == 0) assert(s == null) else assert(s == id / 4.0)
    }
    intercept[IllegalArgumentException] {
      Arrow.readArrow(spark, path, columns = Seq("ghost")).collect()
    }
  }


  test("writeShards: distributed export, read back by both readers") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-arrow-sh").toString
    val df = (0 until 200).map(i => (i.toLong,
      if (i % 6 == 5) null else s"exp $i", i * 0.25))
      .toDF("doc_id", "text", "score")
    ArrowWriter.writeShards(df, "doc_id", dir, nShards = 3,
      rowsPerBatch = 32)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 3)
    val back = Arrow.readArrowFiles(spark, dir)
    assert(back.count() == 200)
    assert(back.select("doc_id").distinct().count() == 200)
    val r10 = back.filter(org.apache.spark.sql.functions.col("doc_id")
      === 10L).collect()(0)
    assert(r10.getString(2) == "exp 10" && r10.getDouble(3) == 2.5)
    val r11 = back.filter(org.apache.spark.sql.functions.col("doc_id")
      === 11L).collect()(0)
    assert(r11.isNullAt(2)) // 11 % 6 == 5 → planted null survives
    // arrow's own reader consumes a shard
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val r = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(files.head).getChannel, alloc)
      var n = 0
      while (r.loadNextBatch()) n += r.getVectorSchemaRoot.getRowCount
      r.close()
      assert(n > 0)
    } finally alloc.close()
  }

  test("sparse union columns land as tagged sparse structs") {
    // arrow-java's own sparse UnionVector: per-row type-id byte,
    // full-length children
    import org.apache.arrow.vector.types.Types.MinorType
    val path = Files.createTempDirectory("graft-arrow-u").toString +
      "/sparse.arrow"
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val uv = new org.apache.arrow.vector.complex.UnionVector("v",
        alloc, org.apache.arrow.vector.types.pojo.FieldType.nullable(
          new org.apache.arrow.vector.types.pojo.ArrowType.Union(
            org.apache.arrow.vector.types.UnionMode.Sparse, null)), null)
      val big = uv.getBigIntVector()
      val str = uv.getVarCharVector()
      val n = 150
      for (i <- 0 until n) {
        if (i % 2 == 0) {
          big.setSafe(i, i * 17L)
          uv.setType(i, MinorType.BIGINT)
        } else {
          str.setSafe(i, s"u$i".getBytes("UTF-8"))
          uv.setType(i, MinorType.VARCHAR)
        }
      }
      uv.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(uv.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](uv),
        n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
      uv.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    val vt = df.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt.fieldNames.head == "tag" && vt.fieldNames.length == 3)
    // member order follows the union's child order; tag ids come from
    // the schema's typeIds, so read them back rather than assuming
    val rows = df.collect()
    assert(rows.length == 150)
    rows.zipWithIndex.foreach { case (r, i) =>
      val u = r.getStruct(0)
      if (i % 2 == 0) {
        assert(u.getLong(1) == i * 17L && u.isNullAt(2))
      } else {
        assert(u.isNullAt(1) && u.getString(2) == s"u$i")
      }
    }
    // two distinct tag values, aligned with the branch picker
    val tags = rows.map(_.getStruct(0).getInt(0)).distinct.sorted
    assert(tags.length == 2)
  }

  test("run-end encoded columns expand transparently to the value type") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    val path = Files.createTempDirectory("graft-arrow-ree").toString +
      "/ree.arrow"
    val n = 200
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val ids = new org.apache.arrow.vector.BigIntVector("id", alloc)
      ids.allocateNew(n)
      for (i <- 0 until n) ids.setSafe(i, i.toLong)
      ids.setValueCount(n)
      val reeField = new Field("s",
        FieldType.notNullable(ArrowType.RunEndEncoded.INSTANCE),
        java.util.Arrays.asList(
          Field.notNullable("run_ends", new ArrowType.Int(32, true)),
          Field.nullable("values", ArrowType.Utf8.INSTANCE)))
      val ree = new org.apache.arrow.vector.complex.RunEndEncodedVector(
        reeField, alloc, null)
      ree.initializeChildrenFromFields(reeField.getChildren)
      val ends = ree.getRunEndsVector
        .asInstanceOf[org.apache.arrow.vector.IntVector]
      val vals = ree.getValuesVector
        .asInstanceOf[org.apache.arrow.vector.VarCharVector]
      ends.allocateNew(4); vals.allocateNew()
      val runs = Seq((30, "alpha"), (31, null), (80, "beta"), (200, "gamma"))
      runs.zipWithIndex.foreach { case ((end, v), k) =>
        ends.setSafe(k, end)
        if (v == null) vals.setNull(k)
        else vals.setSafe(k, v.getBytes("UTF-8"))
      }
      ends.setValueCount(runs.length)
      vals.setValueCount(runs.length)
      ree.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, ree.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, ree), n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
      ids.close(); ree.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    assert(df.schema("s").dataType ==
      org.apache.spark.sql.types.StringType)
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == n)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val expect =
        if (i < 30) "alpha" else if (i < 31) null
        else if (i < 80) "beta" else "gamma"
      if (expect == null) assert(r.isNullAt(1))
      else assert(r.getString(1) == expect)
    }
  }

  test("utf8view/binaryview columns: inline and variadic views") {
    val path = Files.createTempDirectory("graft-arrow-view").toString +
      "/views.arrow"
    val n = 180
    def strFor(i: Int): String =
      if (i % 5 == 4) null
      else if (i % 2 == 0) s"s$i" // ≤ 12 bytes: inline view
      else s"long view payload number $i " + ("x" * (i % 23)) // variadic
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val ids = new org.apache.arrow.vector.BigIntVector("id", alloc)
      val sv = new org.apache.arrow.vector.ViewVarCharVector("s", alloc)
      val bv = new org.apache.arrow.vector.ViewVarBinaryVector("b", alloc)
      ids.allocateNew(n); sv.allocateNew(); bv.allocateNew()
      for (i <- 0 until n) {
        ids.setSafe(i, i.toLong)
        val s = strFor(i)
        if (s == null) sv.setNull(i)
        else sv.setSafe(i, s.getBytes("UTF-8"))
        bv.setSafe(i, Array.fill[Byte](i % 19 + 1)((i % 127).toByte))
      }
      ids.setValueCount(n); sv.setValueCount(n); bv.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, sv.getField, bv.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, sv, bv), n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
      ids.close(); sv.close(); bv.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    assert(df.schema("s").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(df.schema("b").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == n)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val expect = strFor(i)
      if (expect == null) assert(r.isNullAt(1))
      else assert(r.getString(1) == expect)
      assert(r.getAs[Array[Byte]](2).toSeq ==
        Array.fill[Byte](i % 19 + 1)((i % 127).toByte).toSeq)
    }
    // pruning past a view column stays aligned: variadic entries for
    // the skipped 's' must still be consumed before 'b' decodes
    val pruned = Arrow.readArrow(spark, path, columns = Seq("id", "b"))
      .collect().sortBy(_.getLong(0))
    pruned.foreach { r =>
      val i = r.getLong(0).toInt
      assert(r.getAs[Array[Byte]](1).length == i % 19 + 1)
    }
  }

  test("writer twins: sparse union, run-end, utf8view — arrow-java reads back") {
    import Arrow._
    val fields = Vector(
      AField("id", nullable = false, AInt(64)),
      // non-contiguous type ids prove the tag is the ID, not the index
      AField("u", nullable = false, AUnion(Vector(
        AField("lng", nullable = true, AInt(64)),
        AField("txt", nullable = true, AString(large = false))),
        Vector(4, 9), dense = false)),
      AField("r", nullable = true, ARunEnd(
        AField("run_ends", nullable = false, AInt(32)),
        AField("values", nullable = true, AString(large = false)))),
      AField("v", nullable = true, AView(binary = false)))
    val n = 120
    def viewStr(i: Int): String =
      if (i % 7 == 6) null
      else if (i % 2 == 0) s"in$i"
      else s"a long out-of-line view value $i " + ("y" * (i % 11))
    val rows = (0 until n).map { i =>
      val u =
        if (i % 3 == 0) Row(4, i * 13L, null)
        else Row(9, null, s"u$i")
      Row(i.toLong, u, s"run${i / 40}", viewStr(i))
    }
    val bytes = ArrowWriter.write(fields, rows)
    val dir = Files.createTempDirectory("graft-arrow-twin").toString
    val path = s"$dir/twin.arrow"
    Files.write(java.nio.file.Paths.get(path), bytes)

    // own reader round-trips
    val back = Arrow.readArrow(spark, path).collect().sortBy(_.getLong(0))
    assert(back.length == n)
    back.foreach { r =>
      val i = r.getLong(0).toInt
      val u = r.getStruct(1)
      if (i % 3 == 0)
        assert(u.getInt(0) == 4 && u.getLong(1) == i * 13L && u.isNullAt(2))
      else
        assert(u.getInt(0) == 9 && u.isNullAt(1) &&
          u.getString(2) == s"u$i")
      assert(r.getString(2) == s"run${i / 40}")
      val vs = viewStr(i)
      if (vs == null) assert(r.isNullAt(3)) else assert(r.getString(3) == vs)
    }

    // arrow-java agrees on every wire value
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(path).getChannel, alloc)
      var seen = 0
      while (rdr.loadNextBatch()) {
        val root = rdr.getVectorSchemaRoot
        val ids = root.getVector("id")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val uv = root.getVector("u")
          .asInstanceOf[org.apache.arrow.vector.complex.UnionVector]
        val rv = root.getVector("r")
          .asInstanceOf[org.apache.arrow.vector.complex.RunEndEncodedVector]
        val vv = root.getVector("v")
          .asInstanceOf[org.apache.arrow.vector.ViewVarCharVector]
        for (k <- 0 until root.getRowCount) {
          val i = ids.get(k).toInt
          val uo = uv.getObject(k)
          if (i % 3 == 0) assert(uo == i * 13L)
          else assert(uo.toString == s"u$i")
          assert(rv.getObject(k).toString == s"run${i / 40}")
          val vs = viewStr(i)
          if (vs == null) assert(vv.isNull(k))
          else assert(new String(vv.get(k), "UTF-8") == vs)
          seen += 1
        }
      }
      rdr.close()
      assert(seen == n)
    } finally alloc.close()
  }

  test("map, fixed-size-binary and null columns both directions") {
    val path = Files.createTempDirectory("graft-arrow-map").toString +
      "/map.arrow"
    val n = 90
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val ids = new org.apache.arrow.vector.BigIntVector("id", alloc)
      val mv = org.apache.arrow.vector.complex.MapVector.empty(
        "m", alloc, false)
      val fb = new org.apache.arrow.vector.FixedSizeBinaryVector(
        "f", alloc, 6)
      val nv = new org.apache.arrow.vector.NullVector("z", n)
      ids.allocateNew(n); fb.allocateNew(n)
      val w = mv.getWriter
      for (i <- 0 until n) {
        ids.setSafe(i, i.toLong)
        w.setPosition(i)
        if (i % 9 == 8) { /* null map slot: skip writing */ }
        else {
          w.startMap()
          for (k <- 0 to i % 3) {
            w.startEntry()
            w.key().bigInt().writeBigInt(k * 10L + i % 5)
            w.value().varChar().writeVarChar(s"v$i-$k")
            w.endEntry()
          }
          w.endMap()
        }
        fb.setSafe(i, Array.tabulate[Byte](6)(j => (i + j).toByte))
      }
      w.setValueCount(n)
      ids.setValueCount(n); fb.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, mv.getField, fb.getField,
          nv.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, mv, fb, nv), n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val fw = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      fw.start(); fw.writeBatch(); fw.end(); fw.close(); ch.close()
      ids.close(); mv.close(); fb.close(); nv.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    assert(df.schema("m").dataType.isInstanceOf[
      org.apache.spark.sql.types.MapType])
    assert(df.schema("z").dataType ==
      org.apache.spark.sql.types.NullType)
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == n)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      if (i % 9 == 8) assert(r.isNullAt(1))
      else {
        val m = r.getMap[Long, String](1)
        assert(m.size == i % 3 + 1)
        for (k <- 0 to i % 3)
          assert(m(k * 10L + i % 5) == s"v$i-$k")
      }
      assert(r.getAs[Array[Byte]](2).toSeq ==
        Array.tabulate[Byte](6)(j => (i + j).toByte).toSeq)
      assert(r.isNullAt(3))
    }

    // twin: our writer emits the same shapes; arrow-java reads back
    import Arrow._
    val fields = Vector(
      AField("id", nullable = false, AInt(64)),
      AField("m", nullable = true, AMap(
        AField("entries", nullable = false, AStruct(Vector(
          AField("key", nullable = false, AInt(64)),
          AField("value", nullable = true,
            AString(large = false))))))),
      AField("f", nullable = true, AFixedBinary(4)),
      AField("z", nullable = true, ANull))
    val twinRows = (0 until 40).map { i =>
      Row(i.toLong,
        if (i % 5 == 4) null else Map(i.toLong -> s"tv$i"),
        Array.tabulate[Byte](4)(j => (i * 2 + j).toByte),
        null)
    }
    val bytes = ArrowWriter.write(fields, twinRows)
    val p2 = Files.createTempDirectory("graft-arrow-map").toString +
      "/twin.arrow"
    Files.write(java.nio.file.Paths.get(p2), bytes)
    val back = Arrow.readArrow(spark, p2).collect().sortBy(_.getLong(0))
    back.foreach { r =>
      val i = r.getLong(0).toInt
      if (i % 5 == 4) assert(r.isNullAt(1))
      else assert(r.getMap[Long, String](1)(i.toLong) == s"tv$i")
      assert(r.getAs[Array[Byte]](2)(0) == (i * 2).toByte)
    }
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowFileReader(
        new java.io.FileInputStream(p2).getChannel, alloc2)
      assert(rdr.loadNextBatch())
      val root = rdr.getVectorSchemaRoot
      val mvec = root.getVector("m")
        .asInstanceOf[org.apache.arrow.vector.complex.MapVector]
      val fvec = root.getVector("f")
        .asInstanceOf[org.apache.arrow.vector.FixedSizeBinaryVector]
      for (i <- 0 until root.getRowCount) {
        if (i % 5 == 4) assert(mvec.isNull(i))
        else assert(mvec.getObject(i).toString.contains(s"tv$i"))
        assert(fvec.get(i)(0) == (i * 2).toByte)
      }
      rdr.close()
    } finally alloc2.close()
  }

  test("stream format (.arrows): both directions, multi-batch, corruption tail") {
    import Arrow._
    val dir = Files.createTempDirectory("graft-arrows").toString
    // arrow-java ArrowStreamWriter → our reader
    val n = 130
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val ids = new org.apache.arrow.vector.BigIntVector("id", alloc)
      val txt = new org.apache.arrow.vector.VarCharVector("text", alloc)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, txt.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, txt), 0)
      val ch = new java.io.FileOutputStream(s"$dir/a.arrows").getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root,
        null, ch)
      w.start()
      for (b <- 0 until 5) {
        val rows = math.min(30, n - b * 30)
        ids.allocateNew(rows); txt.allocateNew()
        for (i <- 0 until rows) {
          val id = b * 30 + i
          ids.setSafe(i, id.toLong)
          if (id % 11 == 10) txt.setNull(i)
          else txt.setSafe(i, s"stream row $id".getBytes("UTF-8"))
        }
        ids.setValueCount(rows); txt.setValueCount(rows)
        root.setRowCount(rows)
        w.writeBatch()
      }
      w.end(); w.close(); ch.close()
      ids.close(); txt.close()
    } finally alloc.close()

    val df = Arrow.readArrowStream(spark, s"$dir/a.arrows")
    assert(df.schema.fieldNames.toSeq == Seq("path", "id", "text"))
    val rows = df.collect().sortBy(_.getLong(1))
    assert(rows.length == n)
    rows.foreach { r =>
      val i = r.getLong(1).toInt
      if (i % 11 == 10) assert(r.isNullAt(2))
      else assert(r.getString(2) == s"stream row $i")
    }

    // our stream twin → arrow-java reads back; our reader round-trips
    val fields = Vector(
      AField("id", nullable = false, AInt(64)),
      AField("v", nullable = true, AView(binary = false)))
    val twinRows = (0 until 40).map(i =>
      Row(i.toLong, if (i % 7 == 6) null else s"view payload $i"))
    val bytes = ArrowWriter.writeStream(fields, twinRows,
      rowsPerBatch = 12)
    Files.write(java.nio.file.Paths.get(s"$dir/twin.arrows"), bytes)
    val back = Arrow.readArrowStream(spark, s"$dir/twin.arrows")
      .collect().sortBy(_.getLong(1))
    assert(back.length == 40)
    back.foreach { r =>
      val i = r.getLong(1).toInt
      if (i % 7 == 6) assert(r.isNullAt(2))
      else assert(r.getString(2) == s"view payload $i")
    }
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    try {
      val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc2)
      var seen = 0
      while (rdr.loadNextBatch()) {
        val vr = rdr.getVectorSchemaRoot
        val vv = vr.getVector("v")
          .asInstanceOf[org.apache.arrow.vector.ViewVarCharVector]
        for (k <- 0 until vr.getRowCount) {
          val i = vr.getVector("id")
            .asInstanceOf[org.apache.arrow.vector.BigIntVector].get(k)
            .toInt
          if (i % 7 == 6) assert(vv.isNull(k))
          else assert(new String(vv.get(k), "UTF-8") == s"view payload $i")
          seen += 1
        }
      }
      rdr.close()
      assert(seen == 40)
    } finally alloc2.close()

    // corruption: damage the THIRD batch's message — rows decoded
    // before it survive, the rest of the file drops (no footer to
    // skip ahead with)
    val full = Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/twin.arrows"))
    // find the third continuation marker after the schema message
    var seenMarks = 0
    var at = -1
    var i = 0
    while (at < 0 && i + 8 <= full.length) {
      if (full(i) == -1 && full(i + 1) == -1 && full(i + 2) == -1 &&
          full(i + 3) == -1) {
        seenMarks += 1
        if (seenMarks == 4) at = i // schema + 2 batches, then damage
        else i += 8
      } else i += 8
    }
    assert(at > 0)
    val damaged = full.clone()
    damaged(at + 4) = 127 // absurd metaLen
    Files.write(java.nio.file.Paths.get(s"$dir/dmg.arrows"), damaged)
    val partial = Arrow.readArrowStream(spark, s"$dir/dmg.arrows")
      .collect()
    assert(partial.length == 24) // exactly the first two 12-row batches
  }

  test("list-view columns: out-of-order and overlapping ranges decode") {
    import org.apache.arrow.vector.types.pojo.{ArrowType, FieldType}
    val path = Files.createTempDirectory("graft-arrow-lv").toString +
      "/lv.arrow"
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val ids = new org.apache.arrow.vector.BigIntVector("id", alloc)
      val lv = org.apache.arrow.vector.complex.ListViewVector
        .empty("l", alloc)
      val child = lv.addOrGetVector[org.apache.arrow.vector.FieldVector](
        FieldType.nullable(new ArrowType.Int(64, true)))
        .getVector.asInstanceOf[org.apache.arrow.vector.BigIntVector]
      val n = 6
      ids.allocateNew(n); lv.allocateNew()
      child.allocateNew(10)
      for (j <- 0 until 10) child.setSafe(j, j * 5L)
      child.setValueCount(10)
      // slots: overlapping (1 reuses 0's tail), null, out-of-order
      // (3 indexes past 5's range), empty
      val slots = Seq(
        Some((0, 3)), Some((2, 2)), None,
        Some((7, 3)), Some((0, 0)), Some((5, 2)))
      slots.zipWithIndex.foreach {
        case (Some((off, sz)), i) =>
          ids.setSafe(i, i.toLong)
          lv.setValidity(i, 1); lv.setOffset(i, off); lv.setSize(i, sz)
        case (None, i) =>
          ids.setSafe(i, i.toLong)
          lv.setValidity(i, 0); lv.setOffset(i, 0); lv.setSize(i, 0)
      }
      ids.setValueCount(n); lv.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(ids.getField, lv.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](
          ids, lv), n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
      ids.close(); lv.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    assert(df.schema("l").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    val rows = df.collect().sortBy(_.getLong(0))
    val got = rows.map(r =>
      if (r.isNullAt(1)) null else r.getSeq[Long](1).toList)
    assert(got(0) == List(0L, 5L, 10L))
    assert(got(1) == List(10L, 15L)) // overlaps slot 0's range
    assert(got(2) == null)
    assert(got(3) == List(35L, 40L, 45L)) // out of order
    assert(got(4) == List())
    assert(got(5) == List(25L, 30L))
  }

  test("dense union columns: offsets into packed children") {
    val path = Files.createTempDirectory("graft-arrow-u").toString +
      "/dense.arrow"
    val alloc = new org.apache.arrow.memory.RootAllocator()
    try {
      val duv = org.apache.arrow.vector.complex.DenseUnionVector
        .empty("d", alloc)
      val tidL = duv.registerNewTypeId(
        org.apache.arrow.vector.types.pojo.Field.nullable("lng",
          new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true)))
      val tidS = duv.registerNewTypeId(
        org.apache.arrow.vector.types.pojo.Field.nullable("txt",
          org.apache.arrow.vector.types.pojo.ArrowType.Utf8.INSTANCE))
      val lv = duv.addVector(tidL,
        new org.apache.arrow.vector.BigIntVector("lng", alloc))
        .asInstanceOf[org.apache.arrow.vector.BigIntVector]
      val sv = duv.addVector(tidS,
        new org.apache.arrow.vector.VarCharVector("txt", alloc))
        .asInstanceOf[org.apache.arrow.vector.VarCharVector]
      duv.allocateNew()
      val n = 151
      var nl = 0
      var ns = 0
      for (i <- 0 until n) {
        if (i % 3 == 0) {
          duv.setTypeId(i, tidL); duv.setOffset(i, nl)
          lv.setSafe(nl, i * 23L); nl += 1
        } else {
          duv.setTypeId(i, tidS); duv.setOffset(i, ns)
          sv.setSafe(ns, s"d$i".getBytes("UTF-8")); ns += 1
        }
      }
      lv.setValueCount(nl)
      sv.setValueCount(ns)
      duv.setValueCount(n)
      val root = new org.apache.arrow.vector.VectorSchemaRoot(
        java.util.Arrays.asList(duv.getField),
        java.util.Arrays.asList[org.apache.arrow.vector.FieldVector](duv),
        n)
      val ch = new java.io.FileOutputStream(path).getChannel
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root,
        null, ch)
      w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
      duv.close()
    } finally alloc.close()

    val df = Arrow.readArrow(spark, path)
    val rows = df.collect()
    assert(rows.length == 151)
    rows.zipWithIndex.foreach { case (r, i) =>
      val u = r.getStruct(0)
      if (i % 3 == 0) assert(u.getLong(1) == i * 23L && u.isNullAt(2))
      else assert(u.isNullAt(1) && u.getString(2) == s"d$i")
    }
  }

  test("dictionary discovery walks the FULL type tree (r17)") {
    import Arrow._
    // dictionaries may hang off children of maps, unions, fixed lists,
    // list views and run-end values — a list/struct-only walk left their
    // ids unregistered and the whole read refused
    val dictStr = AField("v", nullable = true, AString(large = false),
      dict = Some((7L, 32)))
    val fields = Vector(
      AField("m", nullable = true, AMap(AField("entries", nullable = false,
        AStruct(Vector(AField("key", nullable = false, AString(large = false)),
          dictStr))))),
      AField("u", nullable = true, AUnion(Vector(
        AField("a", nullable = true, AInt(64)),
        dictStr.copy(dict = Some((8L, 32)))), Vector(0, 1), dense = false)),
      AField("fl", nullable = true, AFixedList(
        dictStr.copy(dict = Some((9L, 32))), 4)),
      AField("re", nullable = true, ARunEnd(
        AField("run_ends", nullable = false, AInt(32)),
        dictStr.copy(dict = Some((10L, 32))))),
      AField("lv", nullable = true, AListView(
        dictStr.copy(dict = Some((11L, 32))), large = false)))
    val byId = Arrow.dictFieldsById(fields)
    assert(byId.keySet === Set(7L, 8L, 9L, 10L, 11L))
  }

  test("map columns re-export: fieldsFor wires MapType (r17)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-arrow-map").toString
    val df = Seq(
      (1L, Map("a" -> 1, "b" -> 2)),
      (2L, Map.empty[String, Int]),
      (3L, Map("z" -> 9))).toDF("doc_id", "m")
    ArrowWriter.writeShards(df, "doc_id", dir, nShards = 1)
    val back = Arrow.readArrowFiles(spark, dir).orderBy("doc_id").collect()
    assert(back.length === 3)
    assert(back(0).getMap[String, Int](2).toMap === Map("a" -> 1, "b" -> 2))
    assert(back(1).getMap[String, Int](2).toMap === Map.empty)
  }

  test("writeShards routes NULL keys to shard 0 (r17)") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-arrow-nulkey").toString
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "nullkey"))
      .toDF("doc_id", "text")
    ArrowWriter.writeShards(df, "doc_id", dir, nShards = 2)
    val back = Arrow.readArrowFiles(spark, dir)
    assert(back.count() === 2)
  }

  test("REE writer refuses run-end widths the row count cannot fit (r17)") {
    import Arrow._
    val fields = Vector(AField("r", nullable = true, ARunEnd(
      AField("run_ends", nullable = false, AInt(16)),
      AField("values", nullable = true, AString(large = false)))))
    val rows = (0 until 40000).map(i => Row(s"v${i / 1000}"))
    val e = intercept[IllegalArgumentException] {
      ArrowWriter.write(fields, rows, rowsPerBatch = 40000)
    }
    assert(e.getMessage.contains("run-end width"))
    // a fitting width works
    val ok = ArrowWriter.write(fields.map(f => f.copy(tpe = ARunEnd(
      AField("run_ends", nullable = false, AInt(32)),
      AField("values", nullable = true, AString(large = false))))),
      rows, rowsPerBatch = 40000)
    assert(ok.nonEmpty)
  }
}
