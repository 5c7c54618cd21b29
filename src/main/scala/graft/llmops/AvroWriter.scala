package graft.llmops

import graft.llmops.Avro._

/** Writer twin for [[Avro]]: canonical object-container bytes from rows
  * of Spark-external values, for fixtures and both-direction interop
  * tests (Avro's own `DataFileReader` reads these back verbatim —
  * asserted in the spec). Deterministic: the sync marker derives from
  * the schema text, not an RNG.
  */
object AvroWriter {

  private def writeVlong(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var x = (v << 1) ^ (v >> 63) // zigzag
    while ((x & ~0x7fL) != 0) {
      o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7
    }
    o.write(x.toInt)
  }

  private def writeBytes(o: java.io.ByteArrayOutputStream,
      b: Array[Byte]): Unit = {
    writeVlong(o, b.length.toLong); o.write(b, 0, b.length)
  }

  private def writeStr(o: java.io.ByteArrayOutputStream, s: String): Unit =
    writeBytes(o, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[llmops] def writeDatum(o: java.io.ByteArrayOutputStream,
      s: Sch, v: Any): Unit = s match {
    case SNull => require(v == null, "non-null for null schema")
    case SBool => o.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case SInt => writeVlong(o, v.asInstanceOf[Int].toLong)
    case SLong => writeVlong(o, v.asInstanceOf[Long])
    case SFloat =>
      val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
      o.write(bits & 0xff); o.write((bits >> 8) & 0xff)
      o.write((bits >> 16) & 0xff); o.write((bits >> 24) & 0xff)
    case SDouble =>
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      var k = 0
      while (k < 8) { o.write(((bits >> (8 * k)) & 0xff).toInt); k += 1 }
    case SString => writeStr(o, v.asInstanceOf[String])
    case SBytes => writeBytes(o, v.asInstanceOf[Array[Byte]])
    case SFixed(_, n) =>
      val b = v.asInstanceOf[Array[Byte]]
      require(b.length == n, s"fixed($n) got ${b.length}")
      o.write(b, 0, n)
    case SEnum(_, syms) =>
      val k = syms.indexOf(v.asInstanceOf[String])
      require(k >= 0, s"unknown enum symbol $v")
      writeVlong(o, k.toLong)
    case SArray(items) =>
      // collection.Seq, not immutable.Seq: Spark rows carry
      // mutable.ArraySeq for array columns (CCE otherwise)
      val seq = v.asInstanceOf[scala.collection.Seq[Any]]
      if (seq.nonEmpty) {
        writeVlong(o, seq.size.toLong)
        seq.foreach(writeDatum(o, items, _))
      }
      writeVlong(o, 0L)
    case SMap(values) =>
      val m = v.asInstanceOf[scala.collection.Map[String, Any]]
      if (m.nonEmpty) {
        writeVlong(o, m.size.toLong)
        m.foreach { case (k, mv) => writeStr(o, k); writeDatum(o, values, mv) }
      }
      writeVlong(o, 0L)
    case SOpt(inner, nullFirst) =>
      if (v == null) { writeVlong(o, if (nullFirst) 0L else 1L) }
      else {
        writeVlong(o, if (nullFirst) 1L else 0L)
        writeDatum(o, inner, v)
      }
    case SUnion(bs, _) =>
      // value is the reader's tagged sparse struct: Row(tag, m_...);
      // NULL writes the union's null branch (must exist)
      if (v == null) {
        val nb = bs.indexOf(SNull)
        require(nb >= 0, "null for a union without a null branch")
        writeVlong(o, nb.toLong)
      } else {
        val r = v.asInstanceOf[org.apache.spark.sql.Row]
        val tag = r.getInt(0)
        require(tag >= 0 && tag < bs.length && bs(tag) != SNull,
          s"bad union tag $tag")
        writeVlong(o, tag.toLong)
        // member slot for this tag: 1 + count of non-null branches
        // before it
        var m = 1
        var k = 0
        while (k < tag) { if (bs(k) != SNull) m += 1; k += 1 }
        writeDatum(o, bs(tag), r.get(m))
      }
    case SDecimal(_, scale, fixedSize) =>
      val bd = v.asInstanceOf[java.math.BigDecimal]
        .setScale(scale, java.math.RoundingMode.UNNECESSARY)
      val raw = bd.unscaledValue().toByteArray // big-endian 2's compl.
      fixedSize match {
        case None => writeBytes(o, raw)
        case Some(n) =>
          require(raw.length <= n, s"decimal overflows fixed($n)")
          // sign-extend on the left to the fixed width
          val pad: Byte = if (bd.signum() < 0) -1 else 0
          var k = raw.length
          while (k < n) { o.write(pad); k += 1 }
          o.write(raw, 0, raw.length)
      }
    case SDate =>
      writeVlong(o,
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay)
    case STimestamp(micros) =>
      val inst = v.asInstanceOf[java.sql.Timestamp].toInstant
      val value =
        if (micros) inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        else inst.toEpochMilli
      writeVlong(o, value)
    case SLocalTimestamp(micros) =>
      val inst = v.asInstanceOf[java.time.LocalDateTime]
        .toInstant(java.time.ZoneOffset.UTC)
      val value =
        if (micros) inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        else inst.toEpochMilli
      writeVlong(o, value)
    case SRecord(_, fields) =>
      val r = v.asInstanceOf[org.apache.spark.sql.Row]
      var k = 0
      while (k < fields.length) {
        writeDatum(o, fields(k)._2, r.get(k)); k += 1
      }
  }

  private def encodeBlock(codec: String, plain: Array[Byte]): Array[Byte] =
    codec match {
      case "null" => plain
      case "deflate" =>
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(plain); d.finish()
        val o = new java.io.ByteArrayOutputStream(plain.length / 2 + 64)
        val buf = new Array[Byte](64 << 10)
        while (!d.finished()) o.write(buf, 0, d.deflate(buf))
        d.end()
        o.toByteArray
      case "snappy" =>
        val comp = SnappyWriter.encodeRaw(plain)
        val crc = new java.util.zip.CRC32()
        crc.update(plain)
        val o = new java.io.ByteArrayOutputStream(comp.length + 4)
        o.write(comp, 0, comp.length)
        val c = crc.getValue
        o.write(((c >> 24) & 0xff).toInt); o.write(((c >> 16) & 0xff).toInt)
        o.write(((c >> 8) & 0xff).toInt); o.write((c & 0xff).toInt)
        o.toByteArray
      case other =>
        throw new IllegalArgumentException(s"writer codec $other")
    }

  /** Header bytes (schema + codec + deterministic sync); returns the
    * sync for the block stream that follows.
    */
  private[llmops] def headerBytes(schemaJson: String,
      codec: String): (Array[Byte], Array[Byte]) = {
    val o = new java.io.ByteArrayOutputStream()
    o.write('O'); o.write('b'); o.write('j'); o.write(1)
    writeVlong(o, 2L)
    writeStr(o, "avro.schema")
    writeStr(o, schemaJson)
    writeStr(o, "avro.codec")
    writeStr(o, codec)
    writeVlong(o, 0L)
    val sync = java.util.Arrays.copyOf(
      java.security.MessageDigest.getInstance("MD5")
        .digest(("graft-avro:" + schemaJson + ":" + codec)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)), 16)
    o.write(sync, 0, 16)
    (o.toByteArray, sync)
  }

  private[llmops] def blockBytes(sch: Sch,
      group: Seq[org.apache.spark.sql.Row], codec: String,
      sync: Array[Byte]): Array[Byte] = {
    val plain = new java.io.ByteArrayOutputStream()
    group.foreach { r =>
      sch match {
        case rec: SRecord => writeDatum(plain, rec, r)
        case other => writeDatum(plain, other, r.get(0))
      }
    }
    val block = encodeBlock(codec, plain.toByteArray)
    val o = new java.io.ByteArrayOutputStream(block.length + 32)
    writeVlong(o, group.size.toLong)
    writeVlong(o, block.length.toLong)
    o.write(block, 0, block.length)
    o.write(sync, 0, 16)
    o.toByteArray
  }

  /** Container bytes: header (schema + codec + deterministic sync), then
    * one block per `recordsPerBlock` rows. Root record schemas take one
    * row per record; other roots take single-value rows.
    */
  def write(schemaJson: String, rows: Seq[org.apache.spark.sql.Row],
      codec: String = "null", recordsPerBlock: Int = 100): Array[Byte] = {
    val sch = Avro.parseSchema(schemaJson)
    val o = new java.io.ByteArrayOutputStream()
    val (header, sync) = headerBytes(schemaJson, codec)
    o.write(header, 0, header.length)
    rows.grouped(recordsPerBlock).foreach { group =>
      val b = blockBytes(sch, group, codec, sync)
      o.write(b, 0, b.length)
    }
    o.toByteArray
  }

  /** Avro record-schema JSON for a Spark StructType (the writer's
    * supported scalar subset; nullable fields become `[null, X]`).
    */
  def schemaFor(schema: org.apache.spark.sql.types.StructType,
      name: String = "Row"): String = {
    import org.apache.spark.sql.types._
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case d: DecimalType =>
        s"""{"type":"bytes","logicalType":"decimal","precision":${d.precision},"scale":${d.scale}}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case TimestampType =>
        """{"type":"long","logicalType":"timestamp-micros"}"""
      case TimestampNTZType =>
        """{"type":"long","logicalType":"local-timestamp-micros"}"""
      case ArrayType(e, containsNull) =>
        // element nullability must survive: a null element under
        // non-null "items" would NPE mid-write and abort the shard
        val items =
          if (containsNull) s"""["null",${prim(e)}]""" else prim(e)
        s"""{"type":"array","items":$items}"""
      case other => throw new IllegalArgumentException(
        s"unsupported spark type for avro export: $other")
    }
    // Avro names are [A-Za-z_][A-Za-z0-9_]* — anything else would splice
    // broken JSON (or a subtly wrong name) into the schema document;
    // refuse with the offending field named instead
    def checkName(n: String, what: String): String = {
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"$what '$n' is not a legal avro name " +
          "([A-Za-z_][A-Za-z0-9_]*); rename the column before export")
      n
    }
    checkName(name, "record name")
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null",${prim(f.dataType)}]"""
        else prim(f.dataType)
      s"""{"name":"${checkName(f.name, "field")}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Distributed shard export: one `shard-NNNNN.avro` per shard under
    * `dir`, written by exactly one task each (the TarShards protocol:
    * portable-hash shard assignment, repartition on the shard id, roll
    * files as the sorted shard id changes). Blocks stream to the
    * filesystem — a shard never materializes in memory.
    */
  def writeShards(df: org.apache.spark.sql.DataFrame, keyCol: String,
      dir: String, nShards: Int, codec: String = "deflate",
      recordsPerBlock: Int = 1000): Unit = {
    import org.apache.spark.sql.functions._
    val schemaJson = schemaFor(df.schema)
    val sch = Avro.parseSchema(schemaJson)
    val sharded = df
      .withColumn("__shard",
        // null keys hash to null → coalesce to shard 0, never an NPE
        coalesce(pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"), lit(0)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(keyCol))
    val dirB = dir
    val codecB = codec
    val rpb = recordsPerBlock
    val nFields = df.schema.fields.length
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sharded.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      var out: java.io.OutputStream = null
      var sync: Array[Byte] = null
      var curShard = -1
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      def flushBlock(): Unit = if (buf.nonEmpty) {
        val b = blockBytes(sch, buf.toSeq, codecB, sync)
        out.write(b, 0, b.length)
        buf.clear()
      }
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        flushBlock(); out.close(); out = null
      }
      // a failed shard must not survive as a valid-looking container
      // missing rows: delete the partial file, rethrow the original
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value); out = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getInt(nFields) // __shard appended last
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.avro")
            val fs = curPath.getFileSystem(confB.value)
            out = fs.create(curPath, true)
            val (header, s) = headerBytes(schemaJson, codecB)
            sync = s
            out.write(header, 0, header.length)
          }
          buf += org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1))
          if (buf.size >= rpb) flushBlock()
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }
}
