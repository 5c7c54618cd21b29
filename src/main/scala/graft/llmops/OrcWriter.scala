package graft.llmops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal Apache ORC writer twin, from scratch (the ORC v1 spec is
  * public): struct root over scalar columns, DIRECT/DIRECT_V2
  * encodings, zlib chunked compression, no row index
  * (rowIndexStride 0) — the smallest file every conforming reader
  * accepts. Closes the container family's both-direction proof
  * pattern: [[Orc]] is the reader, orc-core (under Spark's sink) is
  * the interop twin in both directions, and [[writeShards]] gives the
  * distributed TarShards-protocol export. Reference hook: stage-layer
  * landing, `artifacts/aws-glue/code/stage/light_transform.py:1328-1354`
  * (the typed-column contract this writer serializes).
  *
  * Type support: BOOLEAN, BYTE, SHORT, INT, LONG, FLOAT, DOUBLE,
  * STRING, BINARY, DATE, TIMESTAMP (UTC writer timezone),
  * DECIMAL(p,s). Nested types refuse — the READER handles them; a
  * minimal writer earns nothing by duplicating Spark's own sink for
  * shapes this repo never exports.
  *
  * One honest refusal: instants inside (-1 s, 0) of the epoch whose
  * fractional part carries a full millisecond (1969-12-31
  * 23:59:59.001Z .. .999…Z). ORC's seconds field truncates a
  * millisecond value toward zero while the reader's negative-seconds
  * rule subtracts one, and for exactly that second the two cancel into
  * an unrepresentable value — the writer refuses rather than shift by
  * a second silently.
  */
object OrcWriter {

  import java.nio.charset.StandardCharsets.UTF_8

  private val UtcBase = 1420070400L // 2015-01-01T00:00:00Z

  // ------------------------------------------------------- protobuf write

  private final class PbOut {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      var more = true
      while (more) {
        val b = (x & 0x7f).toInt
        x >>>= 7
        more = x != 0
        out.write(if (more) b | 0x80 else b)
      }
    }
    def intField(num: Int, v: Long): Unit = {
      varint((num.toLong << 3) | 0); varint(v)
    }
    /** proto sint64: zigzag varint. */
    def sintField(num: Int, v: Long): Unit =
      intField(num, (v << 1) ^ (v >> 63))
    def bytesField(num: Int, b: Array[Byte]): Unit = {
      varint((num.toLong << 3) | 2); varint(b.length.toLong); out.write(b)
    }
    def strField(num: Int, s: String): Unit =
      bytesField(num, s.getBytes(UTF_8))
    def toByteArray: Array[Byte] = out.toByteArray
  }

  // ----------------------------------------------------------- bit output

  private final class BitOut(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var left = 8
    def write(v: Long, bits: Int): Unit = {
      var need = bits
      while (need > 0) {
        val take = math.min(left, need)
        cur |= (((v >>> (need - take)) & ((1L << take) - 1)).toInt
          << (left - take))
        need -= take
        left -= take
        if (left == 0) { out.write(cur); cur = 0; left = 8 }
      }
    }
    def flush(): Unit = if (left < 8) { out.write(cur); cur = 0; left = 8 }
  }

  // ----------------------------------------------------------- RLE coders

  /** The 5-bit width code for an already-quantized width. */
  private def widthCode(w: Int): Int =
    if (w <= 24) w - 1
    else w match {
      case 26 => 24
      case 28 => 25
      case 30 => 26
      case 32 => 27
      case 40 => 28
      case 48 => 29
      case 56 => 30
      case _ => 31
    }

  /** RLEv2 DIRECT runs of ≤512 values — always valid, never optimal;
    * zlib recovers the redundancy a smarter sub-encoding would.
    */
  private[llmops] def rleV2Direct(values: Array[Long],
      signed: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(values.length * 2 + 16)
    var i = 0
    while (i < values.length) {
      val n = math.min(512, values.length - i)
      val enc = new Array[Long](n)
      var maxBits = 1
      var k = 0
      while (k < n) {
        val v = values(i + k)
        val u = if (signed) (v << 1) ^ (v >> 63) else v
        enc(k) = u
        val bits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(u))
        if (bits > maxBits) maxBits = bits
        k += 1
      }
      val w = Orc.closestFixedBits(maxBits)
      out.write(0x40 | (widthCode(w) << 1) | ((n - 1) >>> 8))
      out.write((n - 1) & 0xff)
      val bo = new BitOut(out)
      k = 0
      while (k < n) { bo.write(enc(k), w); k += 1 }
      bo.flush()
      i += n
    }
    out.toByteArray
  }

  /** Byte RLE: literal runs of ≤128 (valid for any content). */
  private[llmops] def byteRleEncode(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
    var i = 0
    while (i < bytes.length) {
      val n = math.min(128, bytes.length - i)
      out.write(-n)
      out.write(bytes, i, n)
      i += n
    }
    out.toByteArray
  }

  /** Boolean RLE: MSB-first bitpack, then byte RLE. */
  private[llmops] def boolRleEncode(bits: Array[Boolean]): Array[Byte] = {
    val packed = new Array[Byte]((bits.length + 7) / 8)
    var i = 0
    while (i < bits.length) {
      if (bits(i)) packed(i >> 3) = (packed(i >> 3) | (0x80 >>> (i & 7))).toByte
      i += 1
    }
    byteRleEncode(packed)
  }

  /** Decimal DATA: unbounded little-endian base-128 zigzag varints. */
  private[llmops] def varBigIntEncode(
      values: Seq[java.math.BigInteger]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(values.length * 6 + 16)
    values.foreach { v =>
      var u =
        if (v.signum() >= 0) v.shiftLeft(1)
        else v.negate().shiftLeft(1).subtract(java.math.BigInteger.ONE)
      var more = true
      while (more) {
        val b = u.intValue() & 0x7f
        u = u.shiftRight(7)
        more = u.signum() != 0
        out.write(if (more) b | 0x80 else b)
      }
    }
    out.toByteArray
  }

  /** Timestamp SECONDARY value: nanos with ≥2 trailing zeros store
    * (nanos/10^z) << 3 | (z-1).
    */
  private[llmops] def encodeNanos(nanos: Int): Long = {
    if (nanos == 0) return 0L
    var z = 0
    var n = nanos
    while (n % 10 == 0 && z < 9) { n /= 10; z += 1 }
    if (z < 2) nanos.toLong << 3
    else (n.toLong << 3) | (z - 1).toLong
  }

  // --------------------------------------------------------- compression

  /** ORC chunked zlib framing: each ≤blockSize chunk is raw-deflated,
    * or stored when deflate does not shrink it; 3-byte LE header
    * `(len << 1) | isOriginal`.
    */
  private[llmops] def deflateChunks(raw: Array[Byte],
      blockSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    def header(len: Int, original: Boolean): Unit = {
      val h = (len << 1) | (if (original) 1 else 0)
      out.write(h & 0xff); out.write((h >>> 8) & 0xff)
      out.write((h >>> 16) & 0xff)
    }
    var i = 0
    while (i < raw.length) {
      val n = math.min(blockSize, raw.length - i)
      val defl = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      defl.setInput(raw, i, n)
      defl.finish()
      val buf = new Array[Byte](n + 64)
      var got = 0
      while (!defl.finished() && got < buf.length)
        got += defl.deflate(buf, got, buf.length - got)
      val fits = defl.finished() && got < n
      defl.end()
      if (fits) { header(got, original = false); out.write(buf, 0, got) }
      else { header(n, original = true); out.write(raw, i, n) }
      i += n
    }
    out.toByteArray
  }

  // -------------------------------------------------------- schema bridge

  /** ORC type kind for a supported Spark type; refuses otherwise. */
  private def kindOf(dt: DataType): Int = dt match {
    case BooleanType => 0
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 3
    case LongType => 4
    case FloatType => 5
    case DoubleType => 6
    case StringType => 7
    case BinaryType => 8
    case TimestampType => 9
    case _: DecimalType => 14
    case DateType => 15
    case other => throw new IllegalArgumentException(
      s"unsupported spark type for orc export: $other")
  }

  /** DIRECT_V2 for RLE-versioned kinds, DIRECT otherwise. */
  private def encodingOf(kind: Int): Int = kind match {
    case 2 | 3 | 4 | 7 | 8 | 9 | 14 | 15 => 2 // DIRECT_V2
    case _ => 0 // DIRECT
  }

  // -------------------------------------------------------- stripe build

  private final case class StreamOut(kind: Int, column: Int,
      bytes: Array[Byte])

  /** Per-column stripe statistics (what [[Orc.readStripeStats]] reads
    * back): integer min/max for the RLE-int kinds, string min/max for
    * strings; None for kinds without a stats arm or all-null columns.
    */
  private final case class ColStats(values: Long,
      ints: Option[(Long, Long)], strs: Option[(String, String)])

  private def statsOf(dt: DataType, values: Array[Any]): ColStats = {
    val nn = values.filter(_ != null)
    dt match {
      case ShortType | IntegerType | LongType if nn.nonEmpty =>
        val ls = nn.map(_.asInstanceOf[Number].longValue())
        ColStats(nn.length.toLong, Some((ls.min, ls.max)), None)
      case StringType if nn.nonEmpty =>
        val ss = nn.map(_.asInstanceOf[String])
        ColStats(nn.length.toLong, None, Some((ss.min, ss.max)))
      case _ => ColStats(nn.length.toLong, None, None)
    }
  }

  /** Encode one column's buffered values into its streams. */
  private def columnStreams(colId: Int, dt: DataType,
      values: Array[Any]): Vector[StreamOut] = {
    val count = values.length
    val hasNulls = values.exists(_ == null)
    val present =
      if (!hasNulls) Vector.empty
      else Vector(StreamOut(0, colId,
        boolRleEncode(values.map(_ != null))))
    val nn: Array[Any] = if (hasNulls) values.filter(_ != null) else values
    val body: Vector[StreamOut] = dt match {
      case BooleanType =>
        Vector(StreamOut(1, colId,
          boolRleEncode(nn.map(_.asInstanceOf[Boolean]))))
      case ByteType =>
        Vector(StreamOut(1, colId,
          byteRleEncode(nn.map(_.asInstanceOf[Byte]))))
      case ShortType | IntegerType | LongType =>
        Vector(StreamOut(1, colId, rleV2Direct(
          nn.map(_.asInstanceOf[Number].longValue()), signed = true)))
      case DateType =>
        Vector(StreamOut(1, colId, rleV2Direct(
          nn.map(_.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay),
          signed = true)))
      case FloatType =>
        val out = new java.io.ByteArrayOutputStream(nn.length * 4)
        nn.foreach { v =>
          val b = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
          out.write(b & 0xff); out.write((b >>> 8) & 0xff)
          out.write((b >>> 16) & 0xff); out.write((b >>> 24) & 0xff)
        }
        Vector(StreamOut(1, colId, out.toByteArray))
      case DoubleType =>
        val out = new java.io.ByteArrayOutputStream(nn.length * 8)
        nn.foreach { v =>
          val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
          var k = 0
          while (k < 8) { out.write(((b >>> (8 * k)) & 0xff).toInt); k += 1 }
        }
        Vector(StreamOut(1, colId, out.toByteArray))
      case StringType =>
        val data = new java.io.ByteArrayOutputStream(nn.length * 16)
        val lens = new Array[Long](nn.length)
        var k = 0
        while (k < nn.length) {
          val b = nn(k).asInstanceOf[String].getBytes(UTF_8)
          data.write(b, 0, b.length)
          lens(k) = b.length.toLong
          k += 1
        }
        Vector(StreamOut(1, colId, data.toByteArray),
          StreamOut(2, colId, rleV2Direct(lens, signed = false)))
      case BinaryType =>
        val data = new java.io.ByteArrayOutputStream(nn.length * 16)
        val lens = new Array[Long](nn.length)
        var k = 0
        while (k < nn.length) {
          val b = nn(k).asInstanceOf[Array[Byte]]
          data.write(b, 0, b.length)
          lens(k) = b.length.toLong
          k += 1
        }
        Vector(StreamOut(1, colId, data.toByteArray),
          StreamOut(2, colId, rleV2Direct(lens, signed = false)))
      case d: DecimalType =>
        val unscaled = nn.map { v =>
          val bd = v.asInstanceOf[java.math.BigDecimal]
            .setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
          bd.unscaledValue()
        }
        Vector(StreamOut(1, colId, varBigIntEncode(unscaled.toSeq)),
          StreamOut(5, colId, rleV2Direct(
            Array.fill(nn.length)(d.scale.toLong), signed = true)))
      case TimestampType =>
        val secs = new Array[Long](nn.length)
        val nanos = new Array[Long](nn.length)
        var k = 0
        while (k < nn.length) {
          val inst = nn(k).asInstanceOf[java.sql.Timestamp].toInstant
          val e = inst.getEpochSecond
          val n = inst.getNano
          require(!(e == -1L && n >= 1000000),
            "orc cannot represent instants inside (-1s, 0) of the epoch " +
              "with a millisecond-or-larger fractional part")
          secs(k) = (if (e < 0 && n >= 1000000) e + 1 else e) - UtcBase
          nanos(k) = encodeNanos(n)
          k += 1
        }
        Vector(StreamOut(1, colId, rleV2Direct(secs, signed = true)),
          StreamOut(5, colId, rleV2Direct(nanos, signed = false)))
      case other => throw new IllegalArgumentException(
        s"unsupported spark type for orc export: $other")
    }
    require(count >= 0, "negative row count")
    present ++ body
  }

  // ------------------------------------------------------- the streamer

  /** Streaming single-file writer: append rows, stripes flush every
    * `rowsPerStripe`, `finish()` writes footer + postscript. One
    * instance per output file; the file never materializes in memory
    * beyond one stripe.
    */
  final class Streamer(schema: StructType, out: java.io.OutputStream,
      rowsPerStripe: Int = 4096, blockSize: Int = 64 << 10) {
    require(rowsPerStripe > 0 && blockSize >= 1024,
      "rowsPerStripe must be positive, blockSize at least 1 KiB")
    // the ORC chunk header is 3 bytes: (len << 1 | original) must fit 24
    // bits, so a stream longer than 2^23-1 bytes is unrepresentable — a
    // bigger blockSize would silently truncate lengths and corrupt the file
    require(blockSize <= (1 << 23) - 1,
      s"blockSize $blockSize exceeds the ORC 3-byte chunk-length ceiling " +
        s"(${(1 << 23) - 1})")
    schema.fields.foreach(f => kindOf(f.dataType)) // refuse up front
    private val nCols = schema.fields.length
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    private val stripes =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    private val stripeStats =
      scala.collection.mutable.ArrayBuffer.empty[Vector[ColStats]]
    private var offset = 3L
    private var rowCount = 0L
    out.write("ORC".getBytes(UTF_8))

    def append(rows: Seq[Row]): Unit = {
      rows.foreach { r =>
        buf += r
        if (buf.length >= rowsPerStripe) flushStripe()
      }
    }

    private def flushStripe(): Unit = {
      if (buf.isEmpty) return
      val n = buf.length
      val colStats = Vector.newBuilder[ColStats]
      colStats += ColStats(n.toLong, None, None) // the struct root
      val streams = (0 until nCols).flatMap { c =>
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          vals(i) = if (buf(i).isNullAt(c)) null else buf(i).get(c)
          i += 1
        }
        colStats += statsOf(schema.fields(c).dataType, vals)
        columnStreams(c + 1, schema.fields(c).dataType, vals)
      }
      stripeStats += colStats.result()
      val compressed = streams.map(s =>
        (s, deflateChunks(s.bytes, blockSize)))
      val dataLen = compressed.map(_._2.length.toLong).sum
      val sf = new PbOut
      compressed.foreach { case (s, b) =>
        val one = new PbOut
        one.intField(1, s.kind.toLong)
        one.intField(2, s.column.toLong)
        one.intField(3, b.length.toLong)
        sf.bytesField(1, one.toByteArray)
      }
      // encodings: root struct + one per column, in column-id order
      (0 to nCols).foreach { c =>
        val one = new PbOut
        val enc =
          if (c == 0) 0
          else encodingOf(kindOf(schema.fields(c - 1).dataType))
        if (enc != 0) one.intField(1, enc.toLong)
        sf.bytesField(2, one.toByteArray)
      }
      sf.strField(3, "UTC")
      val sfComp = deflateChunks(sf.toByteArray, blockSize)
      compressed.foreach { case (_, b) => out.write(b) }
      out.write(sfComp)
      stripes += ((offset, dataLen, sfComp.length.toLong, n.toLong))
      offset += dataLen + sfComp.length
      rowCount += n
      buf.clear()
    }

    def finish(): Unit = {
      flushStripe()
      // Metadata section: per-stripe column statistics, so range reads
      // over THIS writer's files stripe-prune exactly like orc-core's
      val md = new PbOut
      stripeStats.foreach { cols =>
        val ss = new PbOut
        cols.foreach { cs =>
          val one = new PbOut
          one.intField(1, cs.values)
          cs.ints.foreach { case (mn, mx) =>
            val is = new PbOut
            is.sintField(1, mn)
            is.sintField(2, mx)
            one.bytesField(2, is.toByteArray)
          }
          cs.strs.foreach { case (mn, mx) =>
            val st = new PbOut
            st.strField(1, mn)
            st.strField(2, mx)
            one.bytesField(4, st.toByteArray)
          }
          ss.bytesField(1, one.toByteArray)
        }
        md.bytesField(1, ss.toByteArray)
      }
      val mdComp = deflateChunks(md.toByteArray, blockSize)
      out.write(mdComp)
      val footer = new PbOut
      footer.intField(1, 3L) // headerLength
      footer.intField(2, offset) // contentLength
      stripes.foreach { case (off, dl, fl, rows) =>
        val one = new PbOut
        one.intField(1, off)
        one.intField(2, 0L) // indexLength
        one.intField(3, dl)
        one.intField(4, fl)
        one.intField(5, rows)
        footer.bytesField(3, one.toByteArray)
      }
      // type tree: struct root, then one scalar node per column
      val root = new PbOut
      root.intField(1, 12L)
      (1 to nCols).foreach(c => root.intField(2, c.toLong))
      schema.fields.foreach(f => root.strField(3, f.name))
      footer.bytesField(4, root.toByteArray)
      schema.fields.foreach { f =>
        val one = new PbOut
        one.intField(1, kindOf(f.dataType).toLong)
        f.dataType match {
          case d: DecimalType =>
            one.intField(5, d.precision.toLong)
            one.intField(6, d.scale.toLong)
          case _ =>
        }
        footer.bytesField(4, one.toByteArray)
      }
      footer.intField(6, rowCount)
      footer.intField(8, 0L) // rowIndexStride: no row index
      val footComp = deflateChunks(footer.toByteArray, blockSize)
      out.write(footComp)
      val ps = new PbOut
      ps.intField(1, footComp.length.toLong)
      ps.intField(2, 1L) // ZLIB
      ps.intField(3, blockSize.toLong)
      ps.intField(4, 0L); ps.intField(4, 12L) // version 0.12
      ps.intField(5, mdComp.length.toLong) // metadataLength
      ps.intField(6, 6L) // writerVersion
      ps.strField(8000, "ORC")
      val psB = ps.toByteArray
      require(psB.length < 256, "postscript too long")
      out.write(psB)
      out.write(psB.length)
    }
  }

  /** Distributed shard export: one `shard-NNNNN.orc` per shard under
    * `dir`, written by exactly one task each (the TarShards protocol:
    * portable-hash shard assignment, repartition on the shard id, roll
    * files as the sorted shard id changes). Stripes stream to the
    * filesystem — a shard never materializes in memory.
    */
  def writeShards(df: org.apache.spark.sql.DataFrame, keyCol: String,
      dir: String, nShards: Int, rowsPerStripe: Int = 4096): Unit = {
    import org.apache.spark.sql.functions._
    val schema = df.schema
    schema.fields.foreach(f => kindOf(f.dataType)) // refuse on driver
    val sharded = df
      .withColumn("__shard",
        // null keys hash to null → coalesce to shard 0, never an NPE
        coalesce(pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"), lit(0)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(keyCol))
    val dirB = dir
    val rps = rowsPerStripe
    val nFields = schema.fields.length
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sharded.foreachPartition { rows: Iterator[Row] =>
      var out: java.io.OutputStream = null
      var streamer: Streamer = null
      var curShard = -1
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        streamer.finish(); out.close()
        out = null; streamer = null
      }
      // a failed shard must not survive as a valid-looking container
      // missing rows: delete the partial file, rethrow the original
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value)
        out = null; streamer = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getInt(nFields)
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.orc")
            val fs = curPath.getFileSystem(confB.value)
            out = fs.create(curPath, true)
            streamer = new Streamer(schema, out, rowsPerStripe = rps)
          }
          streamer.append(Seq(Row.fromSeq(r.toSeq.dropRight(1))))
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }
}
