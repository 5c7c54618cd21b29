package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.nio.file.Files

class AvroSpec extends SparkTestBase {

  private val schemaJson =
    """{"type":"record","name":"Doc","namespace":"graft.test","fields":[
       {"name":"doc_id","type":"long"},
       {"name":"text","type":"string"},
       {"name":"score","type":["null","double"]},
       {"name":"tags","type":{"type":"array","items":"string"}}]}"""

  private def avroJavaWrite(path: String, n: Int, codec: String,
      syncInterval: Int = 256): Unit = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    codec match {
      case "null" =>
      case "deflate" =>
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      case "snappy" =>
        w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      case "zstandard" =>
        w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
      case "bzip2" =>
        w.setCodec(org.apache.avro.file.CodecFactory.bzip2Codec())
      case "xz" =>
        w.setCodec(org.apache.avro.file.CodecFactory.xzCodec(6))
    }
    w.setSyncInterval(syncInterval)
    w.create(schema, new java.io.File(path))
    (0 until n).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("doc_id", i.toLong)
      rec.put("text", s"document $i body " + ("x" * (i % 37)))
      rec.put("score", if (i % 3 == 0) null else java.lang.Double.valueOf(i / 10.0))
      val tags = new java.util.ArrayList[CharSequence]()
      (0 until i % 3).foreach(t => tags.add(s"t$t"))
      rec.put("tags", tags)
      w.append(rec)
    }
    w.close()
  }

  private def checkAll(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      r.getSeq[String](3))).sortBy(_._1)
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case ((id, text, score, tags), i) =>
      assert(id == i.toLong)
      assert(text == s"document $i body " + ("x" * (i % 37)))
      if (i % 3 == 0) assert(score == null)
      else assert(score == i / 10.0)
      assert(tags == (0 until i % 3).map(t => s"t$t"))
    }
  }

  test("interop: avro's own writer reads back through the splittable reader") {
    for (codec <- Seq("null", "deflate", "snappy", "zstandard", "bzip2", "xz")) {
      val path = Files.createTempDirectory("graft-avro").toString + "/d.avro"
      avroJavaWrite(path, 120, codec)
      checkAll(Avro.readAvro(spark, path), 120)
    }
  }

  test("splittable: tiny ranges recover exactly the same rows") {
    val path = Files.createTempDirectory("graft-avro").toString + "/d.avro"
    avroJavaWrite(path, 300, "deflate", syncInterval = 128) // many blocks
    checkAll(Avro.readAvro(spark, path, rangeBytes = 1024), 300)
  }

  test("interop: our writer's bytes read back through avro's own reader") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val path = Files.createTempDirectory("graft-avro").toString + "/w.avro"
      val rows = (0 until 75).map(i => Row(i.toLong, s"row $i",
        if (i % 2 == 0) null else java.lang.Double.valueOf(i * 0.5),
        (0 until i % 4).map(t => s"g$t")))
      Files.write(java.nio.file.Paths.get(path),
        AvroWriter.write(schemaJson, rows, codec, recordsPerBlock = 10))
      val r = new org.apache.avro.file.DataFileReader(
        new java.io.File(path),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      var i = 0
      while (r.hasNext) {
        val rec = r.next()
        assert(rec.get("doc_id") == i.toLong)
        assert(rec.get("text").toString == s"row $i")
        if (i % 2 == 0) assert(rec.get("score") == null)
        else assert(rec.get("score") == i * 0.5)
        i += 1
      }
      r.close()
      assert(i == 75)
      // and through our own reader too
      val mine = Avro.readAvro(spark, path).collect()
        .map(x => (x.getLong(0), x.getString(1),
          if (x.isNullAt(2)) null else x.getDouble(2),
          x.getSeq[String](3))).sortBy(_._1)
      assert(mine.length == 75)
      mine.zipWithIndex.foreach { case ((id, text, score, tags), k) =>
        assert(id == k.toLong && text == s"row $k")
        if (k % 2 == 0) assert(score == null) else assert(score == k * 0.5)
        assert(tags == (0 until k % 4).map(t => s"g$t"))
      }
    }
  }

  test("schema breadth: enum, fixed, map, nested record, int/float/bool") {
    val sj =
      """{"type":"record","name":"Full","fields":[
         {"name":"e","type":{"type":"enum","name":"Color",
          "symbols":["RED","GREEN","BLUE"]}},
         {"name":"fx","type":{"type":"fixed","name":"F4","size":4}},
         {"name":"m","type":{"type":"map","values":"int"}},
         {"name":"nested","type":{"type":"record","name":"Inner",
          "fields":[{"name":"a","type":"int"},{"name":"b","type":"float"}]}},
         {"name":"ok","type":"boolean"}]}"""
    val path = Files.createTempDirectory("graft-avro").toString + "/f.avro"
    val rows = Seq(
      Row("GREEN", Array[Byte](1, 2, 3, 4), Map("k" -> 7),
        Row(5, 1.5f), true),
      Row("RED", Array[Byte](9, 9, 9, 9), Map.empty[String, Int],
        Row(-1, -2.25f), false))
    Files.write(java.nio.file.Paths.get(path),
      AvroWriter.write(sj, rows, "null"))
    val out = Avro.readAvro(spark, path).collect().sortBy(_.getString(0))
    assert(out.length == 2)
    val g = out.find(_.getString(0) == "GREEN").get
    assert(g.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(g.getMap[String, Int](2) == Map("k" -> 7))
    assert(g.getStruct(3).getInt(0) == 5 && g.getStruct(3).getFloat(1) == 1.5f)
    assert(g.getBoolean(4))
  }

  test("corruption blast radius: one flipped block drops, others survive") {
    val path = Files.createTempDirectory("graft-avro").toString + "/c.avro"
    // deflate: structural corruption is detectable (a flipped "null"-
    // codec block still parses, just with garbled strings)
    avroJavaWrite(path, 200, "deflate", syncInterval = 128)
    val b = Files.readAllBytes(java.nio.file.Paths.get(path))
    // find a mid-file position inside a block body and trash 8 bytes
    val mid = b.length / 2
    (0 until 8).foreach(k => b(mid + k) = (b(mid + k) ^ 0x5a).toByte)
    val cpath = path + ".corrupt"
    Files.write(java.nio.file.Paths.get(cpath), b)
    val n = Avro.readAvro(spark, cpath).count()
    assert(n < 200, "the corrupted block must drop")
    assert(n > 100, s"only the corrupted block may drop, got $n")
  }

  test("logical types: avro-java decimal/date/timestamp land typed") {
    val lschema = """{"type":"record","name":"L","fields":[
      {"name":"id","type":"long"},
      {"name":"price","type":["null",{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}]},
      {"name":"pfix","type":{"type":"fixed","name":"d16","size":8,"logicalType":"decimal","precision":18,"scale":3}},
      {"name":"day","type":{"type":"int","logicalType":"date"}},
      {"name":"tsm","type":{"type":"long","logicalType":"timestamp-millis"}},
      {"name":"tsu","type":["null",{"type":"long","logicalType":"timestamp-micros"}]}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(lschema)
    val path = java.nio.file.Files.createTempDirectory("graft-avro")
      .toString + "/logical.avro"
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.setSyncInterval(512)
    w.create(schema, new java.io.File(path))
    def dec(s: String, scale: Int): java.math.BigDecimal =
      new java.math.BigDecimal(s).setScale(scale)
    (0 until 300).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("price",
        if (i % 7 == 2) null
        else java.nio.ByteBuffer.wrap(
          dec(s"${i * 31 - 4000}.${10 + i % 80}", 2)
            .unscaledValue().toByteArray))
      // fixed(8) decimal: sign-extended big-endian two's complement
      val fx = dec(s"${i - 150}.${100 + i % 900}", 3).unscaledValue()
      val fb = fx.toByteArray
      val padded = new Array[Byte](8)
      java.util.Arrays.fill(padded, if (fx.signum() < 0) (-1).toByte else 0.toByte)
      System.arraycopy(fb, 0, padded, 8 - fb.length, fb.length)
      rec.put("pfix", new org.apache.avro.generic.GenericData.Fixed(
        schema.getField("pfix").schema(), padded))
      rec.put("day", i - 100)
      rec.put("tsm", (i.toLong - 150) * 86400000L * 13 + i * 7L)
      rec.put("tsu",
        if (i % 5 == 1) null
        else java.lang.Long.valueOf(
          (i.toLong - 150) * 86400000000L * 13 + i * 997L))
      w.append(rec)
    }
    w.close()
    val df = Avro.readAvro(spark, path, rangeBytes = 4096)
    import org.apache.spark.sql.types._
    assert(df.schema("price").dataType == DecimalType(18, 2))
    assert(df.schema("pfix").dataType == DecimalType(18, 3))
    assert(df.schema("day").dataType == DateType)
    assert(df.schema("tsm").dataType == TimestampType)
    assert(df.schema("tsu").dataType == TimestampType)
    val rows = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getDecimal(1),
      r.getDecimal(2), r.getDate(3), r.getTimestamp(4),
      if (r.isNullAt(5)) null else r.getTimestamp(5))).sortBy(_._1)
    assert(rows.length == 300)
    rows.foreach { case (idL, price, pfix, day, tsm, tsu) =>
      val i = idL.toInt
      if (i % 7 == 2) assert(price == null)
      else assert(price == dec(s"${i * 31 - 4000}.${10 + i % 80}", 2))
      assert(pfix == dec(s"${i - 150}.${100 + i % 900}", 3))
      assert(day == java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(i.toLong - 100)))
      assert(tsm.toInstant == java.time.Instant.ofEpochMilli(
        (i.toLong - 150) * 86400000L * 13 + i * 7L))
      if (i % 5 == 1) assert(tsu == null)
      else {
        val micros = (i.toLong - 150) * 86400000000L * 13 + i * 997L
        assert(tsu.toInstant == java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      }
    }
  }

  test("logical types: our writer's typed columns read by avro-java") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 120).map { i =>
      (i.toLong, s"${i * 13 - 500}.${10 + i % 80}",
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong - 60)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          (i.toLong - 60) * 9973L, (i % 1000).toLong * 1000L)))
    }.toDF("id", "decStr", "day", "ts")
      .select(col("id"), col("decStr").cast("decimal(18,2)").as("price"),
        col("day"), col("ts"))
    val schemaJson2 = AvroWriter.schemaFor(df.schema)
    assert(schemaJson2.contains("\"logicalType\":\"decimal\"") &&
      schemaJson2.contains("\"logicalType\":\"date\"") &&
      schemaJson2.contains("\"logicalType\":\"timestamp-micros\""))
    val bytes = AvroWriter.write(schemaJson2,
      df.collect().toSeq.sortBy(_.getLong(0)), codec = "deflate")
    val path = java.nio.file.Files.createTempDirectory("graft-avro")
      .toString + "/twin_logical.avro"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    // avro-java reads the twin's bytes and sees the logical annotations
    val rdr = new org.apache.avro.file.DataFileReader(
      new java.io.File(path),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val sch = rdr.getSchema
    assert(sch.getField("price").schema().getTypes.get(1)
      .getLogicalType.getName == "decimal")
    var count = 0
    while (rdr.hasNext) {
      val rec = rdr.next()
      val i = rec.get("id").asInstanceOf[Long].toInt
      val bb = rec.get("price").asInstanceOf[java.nio.ByteBuffer]
      val raw = new Array[Byte](bb.remaining()); bb.get(raw)
      assert(new java.math.BigDecimal(new java.math.BigInteger(raw), 2) ==
        new java.math.BigDecimal(s"${i * 13 - 500}.${10 + i % 80}")
          .setScale(2))
      assert(rec.get("day").asInstanceOf[Int] == i - 60)
      count += 1
    }
    rdr.close()
    assert(count == 120)
    // and our own reader round-trips it typed
    val back = Avro.readAvro(spark, path, rangeBytes = 4096)
    assert(back.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 2))
    assert(back.count() == 120)
  }

  test("logical types: local-timestamp lands TimestampNTZ both directions") {
    val lschema = """{"type":"record","name":"N","fields":[
      {"name":"id","type":"long"},
      {"name":"wall","type":{"type":"long","logicalType":"local-timestamp-micros"}}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(lschema)
    val path = java.nio.file.Files.createTempDirectory("graft-avro")
      .toString + "/ntz.avro"
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    (0 until 100).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", i.toLong)
      rec.put("wall", (i.toLong - 50) * 9973000001L)
      w.append(rec)
    }
    w.close()
    val df = Avro.readAvro(spark, path, rangeBytes = 4096)
    assert(df.schema("wall").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = df.collect().map(r => (r.getLong(0),
      r.getAs[java.time.LocalDateTime](1))).sortBy(_._1)
    got.foreach { case (idL, wall) =>
      val us = (idL - 50) * 9973000001L
      assert(wall == java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L), java.time.ZoneOffset.UTC))
    }
    // twin: NTZ column round-trips through our writer
    val sj = AvroWriter.schemaFor(org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("wall",
        org.apache.spark.sql.types.TimestampNTZType))))
    assert(sj.contains("local-timestamp-micros"))
    val rows = (0 until 40).map(i => org.apache.spark.sql.Row(
      java.time.LocalDateTime.ofEpochSecond(i * 7919L, i * 1000,
        java.time.ZoneOffset.UTC)))
    val bytes = AvroWriter.write(sj, rows)
    val p2 = java.nio.file.Files.createTempDirectory("graft-avro")
      .toString + "/ntz2.avro"
    java.nio.file.Files.write(java.nio.file.Paths.get(p2), bytes)
    val back = Avro.readAvro(spark, p2, rangeBytes = 4096).collect()
      .map(_.getAs[java.time.LocalDateTime](0)).sortBy(_.toString)
    assert(back.toSeq == rows.map(_.getAs[java.time.LocalDateTime](0))
      .sortBy(_.toString))
  }

  test("refusals: bad magic, unknown codec") {
    intercept[IllegalArgumentException] {
      Avro.parseHeader("NotAvroAtAll".getBytes)
    }
    intercept[IllegalArgumentException] {
      Avro.decodeBlock("lzo", Array[Byte](1, 2, 3))
    }
  }

  test("multi-branch union: tagged sparse struct, avro-java both ways") {
    val sj =
      """{"type":"record","name":"M","fields":[
         {"name":"id","type":"long"},
         {"name":"v","type":["null","long","string",
           {"type":"record","name":"P","fields":[
             {"name":"a","type":"int"},{"name":"b","type":"string"}]}]}]}"""
    // shape: struct(tag, m_long, m_string, m_P)
    val sch = Avro.parseSchema(sj)
    val st = Avro.rootStruct(sch)
    val vt = st("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt.fieldNames.toSeq ==
      Seq("tag", "m_long", "m_string", "m_P"))

    // avro-java writes all four branches; our reader lands them tagged
    val path = Files.createTempDirectory("graft-avro-u").toString +
      "/m.avro"
    val as = new org.apache.avro.Schema.Parser().parse(sj)
    val ps = as.getField("v").schema().getTypes.get(3)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](as))
    w.create(as, new java.io.File(path))
    for (i <- 0 until 40) {
      val rec = new org.apache.avro.generic.GenericData.Record(as)
      rec.put("id", i.toLong)
      rec.put("v", (i % 4) match {
        case 0 => null
        case 1 => java.lang.Long.valueOf(i * 7L)
        case 2 => s"s$i"
        case _ =>
          val p = new org.apache.avro.generic.GenericData.Record(ps)
          p.put("a", i); p.put("b", s"b$i"); p
      })
      w.append(rec)
    }
    w.close()
    val got = Avro.readAvro(spark, path).collect().sortBy(_.getLong(0))
    assert(got.length == 40)
    got.foreach { r =>
      val i = r.getLong(0).toInt
      if (i % 4 == 0) assert(r.isNullAt(1))
      else {
        val u = r.getStruct(1)
        assert(u.getInt(0) == i % 4)
        i % 4 match {
          case 1 =>
            assert(u.getLong(1) == i * 7L && u.isNullAt(2) && u.isNullAt(3))
          case 2 =>
            assert(u.isNullAt(1) && u.getString(2) == s"s$i" && u.isNullAt(3))
          case _ =>
            assert(u.isNullAt(1) && u.isNullAt(2))
            assert(u.getStruct(3).getInt(0) == i &&
              u.getStruct(3).getString(1) == s"b$i")
        }
      }
    }

    // twin writer: tagged rows → avro-java reads the same branches back
    val rows = (0 until 24).map { i =>
      Row(i.toLong, (i % 4) match {
        case 0 => null
        case 1 => Row(1, i * 11L, null, null)
        case 2 => Row(2, null, s"t$i", null)
        case _ => Row(3, null, null, Row(i, s"c$i"))
      })
    }
    val p2 = Files.createTempDirectory("graft-avro-u").toString +
      "/twin.avro"
    Files.write(java.nio.file.Paths.get(p2),
      AvroWriter.write(sj, rows, "deflate"))
    val rd = new org.apache.avro.file.DataFileReader(
      new java.io.File(p2),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var n = 0
    while (rd.hasNext) {
      val rec = rd.next()
      val i = rec.get("id").asInstanceOf[Long].toInt
      (i % 4) match {
        case 0 => assert(rec.get("v") == null)
        case 1 => assert(rec.get("v") == i * 11L)
        case 2 => assert(rec.get("v").toString == s"t$i")
        case _ =>
          val p = rec.get("v")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          assert(p.get("a") == i && p.get("b").toString == s"c$i")
      }
      n += 1
    }
    rd.close()
    assert(n == 24)

    // simple-name collision across namespaces dedups with a suffix;
    // null branch anywhere makes the struct nullable the same way
    val sj2 = """["null",
      {"type":"record","name":"x.T","fields":[{"name":"a","type":"int"}]},
      {"type":"record","name":"y.T","fields":[{"name":"a","type":"long"}]}]"""
    val st2 = Avro.rootStruct(Avro.parseSchema(sj2))
    val vt2 = st2("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(vt2.fieldNames.toSeq == Seq("tag", "m_T", "m_T_1"))
  }

  test("nullable-union order both ways; single-branch union") {
    val sj =
      """{"type":"record","name":"U","fields":[
         {"name":"a","type":["double","null"]},
         {"name":"b","type":["null","string"]},
         {"name":"c","type":["long"]}]}"""
    val path = Files.createTempDirectory("graft-avro").toString + "/u.avro"
    val rows = Seq(Row(1.5, null, 7L), Row(null, "hi", 8L))
    Files.write(java.nio.file.Paths.get(path),
      AvroWriter.write(sj, rows, "null"))
    val out = Avro.readAvro(spark, path).collect().sortBy(_.getLong(2))
    assert(out(0).getDouble(0) == 1.5 && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).getString(1) == "hi")
    // avro's own reader agrees on the union coding
    val r = new org.apache.avro.file.DataFileReader(
      new java.io.File(path),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val rec = r.next()
    assert(rec.get("a") == 1.5 && rec.get("b") == null &&
      rec.get("c") == 7L)
    r.close()
  }

  test("readAvroFiles: directory and glob of shards, path provenance") {
    val dir = Files.createTempDirectory("graft-avro-multi").toString
    for (s <- 0 until 3) {
      val rows = (0 until 40).map(i =>
        Row(s * 1000L + i, s"shard $s row $i", null, Seq.empty[String]))
      Files.write(java.nio.file.Paths.get(s"$dir/part-$s.avro"),
        AvroWriter.write(schemaJson, rows, "deflate", recordsPerBlock = 7))
    }
    val out = Avro.readAvroFiles(spark, dir)
    assert(out.schema.fieldNames.head == "path")
    assert(out.count() == 120)
    val byShard = out.collect().groupBy(_.getString(0)).view
      .mapValues(_.length).toMap
    assert(byShard.size == 3 && byShard.values.forall(_ == 40))
    // glob form names the same set
    assert(Avro.readAvroFiles(spark, s"$dir/part-*.avro").count() == 120)
    // mismatched shard schema refuses wholesale
    Files.write(java.nio.file.Paths.get(s"$dir/part-bad.avro"),
      AvroWriter.write(
        """{"type":"record","name":"Other","fields":[
           {"name":"x","type":"int"}]}""",
        Seq(Row(1)), "null"))
    intercept[IllegalArgumentException] {
      Avro.readAvroFiles(spark, dir)
    }
  }

  test("readAvroFiles: 96-shard landing dir plans through the bounded pool") {
    // many-file fixture for the parallel planning pass: header reads
    // fan out over DriverPar, and the answer must be byte-identical to
    // what the serial loop produced (every shard present exactly once,
    // per-shard rows intact, first-bad-file refusal still first)
    val dir = Files.createTempDirectory("graft-avro-many").toString
    for (s <- 0 until 96) {
      val rows = (0 until 2).map(i =>
        Row(s * 100L + i, s"shard $s row $i", null, Seq.empty[String]))
      Files.write(java.nio.file.Paths.get(f"$dir/part-$s%03d.avro"),
        AvroWriter.write(schemaJson, rows, "null"))
    }
    val out = Avro.readAvroFiles(spark, dir)
    assert(out.count() == 192)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq ==
      (0 until 96).flatMap(s => Seq(s * 100L, s * 100L + 1)).sorted)
    assert(out.select("path").distinct().count() == 96)
  }

  test("array columns with null elements export and read back (r17)") {
    // ArrayType.containsNull must surface as ["null", item] in the
    // generated schema — a null element under non-null items NPE'd
    // mid-write and aborted the shard
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-avro-nularr").toString
    val df = Seq(
      (1L, Seq("a", null, "c")),
      (2L, Seq[String]()),
      (3L, Seq[String](null, null))).toDF("doc_id", "tags")
    AvroWriter.writeShards(df, "doc_id", dir, nShards = 1)
    val back = Avro.readAvroFiles(spark, dir).orderBy("doc_id").collect()
    assert(back.length === 3)
    assert(back(0).getSeq[String](2) === Seq("a", null, "c"))
    assert(back(1).getSeq[String](2) === Seq())
    assert(back(2).getSeq[String](2) === Seq(null, null))
  }

  test("writeShards routes NULL keys to shard 0 instead of an executor NPE") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-avro-nulkey").toString
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "nullkey"),
      (java.lang.Long.valueOf(3L), "c")).toDF("doc_id", "text")
    AvroWriter.writeShards(df, "doc_id", dir, nShards = 2)
    val back = Avro.readAvroFiles(spark, dir)
    assert(back.count() === 3)
    assert(back.filter(org.apache.spark.sql.functions.col("text")
      === "nullkey").count() === 1)
  }

  test("illegal avro field names refuse with the offending field named") {
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a\"b",
        org.apache.spark.sql.types.StringType)))
    val e = intercept[IllegalArgumentException] { AvroWriter.schemaFor(st) }
    assert(e.getMessage.contains("a\"b"))
    val e2 = intercept[IllegalArgumentException] {
      AvroWriter.schemaFor(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ok",
          org.apache.spark.sql.types.StringType))), name = "bad name")
    }
    assert(e2.getMessage.contains("bad name"))
  }

  test("a large non-avro file fails FAST with the real diagnostic") {
    val dir = Files.createTempDirectory("graft-avro-stray").toString
    val junk = new Array[Byte](1 << 20)
    new java.util.Random(5).nextBytes(junk)
    junk(0) = 'P'; junk(1) = 'A'; junk(2) = 'R'; junk(3) = '1'
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/stray.bin"), junk)
    val e = intercept[IllegalArgumentException] {
      Avro.readHeader(spark.sparkContext.hadoopConfiguration,
        s"$dir/stray.bin")
    }
    assert(e.getMessage.contains("not an avro object container"))
    // only the FAST arm (typed NotAvroException on the first chunk) wraps
    // the path in; the slow end-of-file rethrow never did — so this pins
    // that the fast-fail actually fired instead of whole-file accumulation
    assert(e.getMessage.contains("stray.bin"))
  }

  test("writeShards: distributed export, read back by both readers") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-avro-sh").toString
    val df = (0 until 300).map(i => (i.toLong,
      if (i % 9 == 8) null else s"exported $i", i % 2 == 0))
      .toDF("doc_id", "text", "flag")
    AvroWriter.writeShards(df, "doc_id", dir, nShards = 4,
      codec = "deflate", recordsPerBlock = 16)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4)
    val back = Avro.readAvroFiles(spark, dir)
    assert(back.count() == 300)
    val r7 = back.filter(org.apache.spark.sql.functions.col("doc_id")
      === 7L).collect()(0)
    assert(r7.getString(2) == "exported 7" && !r7.getBoolean(3))
    // avro's own reader consumes a shard
    val r = new org.apache.avro.file.DataFileReader(files.head,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var n = 0
    while (r.hasNext) { r.next(); n += 1 }
    r.close()
    assert(n > 0)
    // all shards together hold every row exactly once
    assert(back.select("doc_id").distinct().count() == 300)
  }

}
