package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop SequenceFile ingestion — a from-scratch SPLITTABLE reader for
  * the classic key/value container older crawl corpora and Hadoop-era
  * pipelines still ship (early Common Crawl segments were Text/Text
  * SequenceFiles). Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Public format (Hadoop `SequenceFile`, version 6):
  * {{{
  *   header: "SEQ" 0x06 | keyClass vstr | valueClass vstr |
  *     compressed u8 | blockCompressed u8 | [codecClass vstr] |
  *     metadata (i32 BE count, count × (vstr, vstr)) | sync 16 B
  *   record:      i32 BE recordLen | i32 BE keyLen | key | value
  *   sync escape: i32 BE -1 | the file's 16 sync bytes
  *   block (blockCompressed): vint nRecords | 4 × (vint len +
  *     codec-compressed buffer): keyLens(vints) keys valLens(vints) vals
  * }}}
  * vints/vstrs are `WritableUtils.writeVInt`/`Text.writeString` codings.
  *
  * Scale shape — the same parallel recovery as the `.warc.gz` /
  * multistream-bz2 splitters: byte-range tasks scan for the 20-byte
  * sync escape (4 × 0xFF + the file's RANDOM 16-byte marker — false
  * positives are 2⁻¹⁶⁰), consecutive sync positions pair into record
  * regions via one narrow-row shuffle, and each region parses its
  * records with exactly one ranged read. Codecs: none,
  * `DefaultCodec` (zlib), `GzipCodec`, `SnappyCodec` (Hadoop block
  * stream over the native [[Snappy]] kernel). A malformed region (bad
  * lengths, codec refusal) drops from the record stream without
  * refusing the file — corruption costs one sync interval, not the
  * archive. Interop is tested BOTH directions against Hadoop's own
  * `SequenceFile.Writer`/`Reader` (on the Spark classpath).
  */
object SeqFile {

  private final val MaxRecord = 64 << 20
  private final val MaxRegion = 256 << 20

  final case class Header(version: Int, keyClass: String, valueClass: String,
      recordCompressed: Boolean, blockCompressed: Boolean,
      codec: Option[String], sync: Array[Byte], headerEnd: Long,
      metadata: Map[String, String])

  // --------------------------------------------------------- primitives

  private final class Cursor(val b: Array[Byte], var i: Int) {
    def u8(): Int = { val v = b(i) & 0xff; i += 1; v }
    def i32(): Int = {
      val v = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      i += 4; v
    }
    /** WritableUtils.readVLong. */
    def vlong(): Long = {
      val first = b(i).toInt; i += 1
      if (first >= -112) first.toLong
      else {
        val neg = first < -120
        val len = if (neg) -(first + 120) else -(first + 112)
        var v = 0L
        var k = 0
        while (k < len) { v = (v << 8) | (b(i) & 0xffL); i += 1; k += 1 }
        if (neg) ~v else v
      }
    }
    def vint(): Int = {
      val v = vlong()
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException("vint out of range")
      v.toInt
    }
    /** Text.writeString coding: vint byte length + UTF-8. */
    def vstr(): String = {
      val n = vint()
      require(n >= 0 && n <= b.length - i, "bad vstr length")
      val s = new String(b, i, n, java.nio.charset.StandardCharsets.UTF_8)
      i += n; s
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && n <= b.length - i, "bad byte run")
      val out = java.util.Arrays.copyOfRange(b, i, i + n); i += n; out
    }
  }

  private def zlibInflate(data: Array[Byte]): Array[Byte] =
    try {
      val inf = new java.util.zip.Inflater(false)
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 3 + 16)
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.io.EOFException()
        out.write(buf, 0, n)
        if (out.size() > MaxRegion) throw new java.io.EOFException()
      }
      inf.end()
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Hadoop `BlockCompressorStream` framing for SnappyCodec: repeated
    * [i32 BE uncompressed chunk len, then per sub-chunk i32 BE
    * compressed len + raw snappy block] until the buffer is consumed.
    */
  private def hadoopSnappyDecode(data: Array[Byte]): Array[Byte] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 3 + 16)
      val c = new Cursor(data, 0)
      while (c.i < data.length) {
        val unLen = c.i32()
        if (unLen < 0 || unLen > MaxRegion) return null
        var got = 0
        while (got < unLen) {
          val compLen = c.i32()
          val chunk = Snappy.decodeRaw(data, c.i, c.i + compLen)
          if (chunk == null) return null
          c.i += compLen
          out.write(chunk, 0, chunk.length)
          got += chunk.length
        }
        if (got != unLen) return null
        if (out.size() > MaxRegion) return null
      }
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Decompress one codec buffer; `null` on refusal/unknown codec. */
  private[llmops] def codecDecode(codec: String, data: Array[Byte]): Array[Byte] =
    codec match {
      case "org.apache.hadoop.io.compress.DefaultCodec" => zlibInflate(data)
      case "org.apache.hadoop.io.compress.GzipCodec" =>
        Compression.decode(data, "gzip")
      case "org.apache.hadoop.io.compress.SnappyCodec" =>
        hadoopSnappyDecode(data)
      case _ => null
    }

  /** Strip the writable's own length prefix where one exists, so the
    * surfaced bytes are the PAYLOAD (Text → UTF-8 bytes, BytesWritable
    * → content); other writables surface their raw serialized form
    * (LongWritable/IntWritable = big-endian fixed width).
    */
  private[llmops] def payload(className: String, raw: Array[Byte]): Array[Byte] =
    className match {
      case "org.apache.hadoop.io.Text" =>
        try {
          val c = new Cursor(raw, 0)
          val n = c.vint()
          if (n == raw.length - c.i) c.bytes(n) else raw
        } catch { case scala.util.control.NonFatal(_) => raw }
      case "org.apache.hadoop.io.BytesWritable" =>
        if (raw.length >= 4) {
          val n = ((raw(0) & 0xff) << 24) | ((raw(1) & 0xff) << 16) |
            ((raw(2) & 0xff) << 8) | (raw(3) & 0xff)
          if (n == raw.length - 4) java.util.Arrays.copyOfRange(raw, 4,
            raw.length) else raw
        } else raw
      case _ => raw
    }

  // ------------------------------------------------------------- header

  def readHeader(conf: org.apache.hadoop.conf.Configuration,
      path: String): Header = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val head = new Array[Byte](math.min(len, 1L << 16).toInt)
      in.readFully(0, head)
      require(head.length > 4 && head(0) == 'S' && head(1) == 'E' &&
        head(2) == 'Q', "not a SequenceFile (bad magic)")
      val version = head(3) & 0xff
      require(version == 6, s"unsupported SequenceFile version $version")
      val c = new Cursor(head, 4)
      val keyClass = c.vstr()
      val valueClass = c.vstr()
      val compressed = c.u8() != 0
      val blockCompressed = c.u8() != 0
      val codec = if (compressed || blockCompressed) Some(c.vstr()) else None
      val nMeta = c.i32()
      require(nMeta >= 0 && nMeta < 4096, "implausible metadata count")
      val meta = (0 until nMeta).map(_ => (c.vstr(), c.vstr())).toMap
      val sync = c.bytes(16)
      Header(version, keyClass, valueClass,
        compressed && !blockCompressed, blockCompressed, codec, sync,
        c.i.toLong, meta)
    } finally in.close()
  }

  // ------------------------------------------------------ region parse

  /** Parse one record region (bytes between sync escapes) into raw
    * (key, value) pairs. Empty on any malformation — a region is the
    * corruption blast radius.
    */
  private[llmops] def parseRegion(h: Header, region: Array[Byte]): Seq[(Array[Byte], Array[Byte])] =
    try {
      if (h.blockCompressed) parseBlock(h, region)
      else {
        val out = Seq.newBuilder[(Array[Byte], Array[Byte])]
        val c = new Cursor(region, 0)
        while (c.i < region.length) {
          if (region.length - c.i < 8) return Seq.empty
          val recLen = c.i32()
          val keyLen = c.i32()
          if (recLen < keyLen || keyLen < 0 || recLen > MaxRecord ||
              recLen - keyLen > region.length - c.i ||
              keyLen > region.length - c.i) return Seq.empty
          val key = c.bytes(keyLen)
          val rawVal = c.bytes(recLen - keyLen)
          val value = if (h.recordCompressed)
            codecDecode(h.codec.getOrElse(""), rawVal) else rawVal
          if (value == null) return Seq.empty
          out += ((key, value))
        }
        out.result()
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  private def parseBlock(h: Header, region: Array[Byte]): Seq[(Array[Byte], Array[Byte])] = {
    if (h.codec.isEmpty) return Seq.empty
    val codec = h.codec.get
    val c = new Cursor(region, 0)
    val n = c.vint()
    if (n < 0 || n > MaxRegion / 8) return Seq.empty
    def buf(): Array[Byte] = {
      val len = c.vint()
      codecDecode(codec, c.bytes(len))
    }
    val keyLensBuf = buf(); if (keyLensBuf == null) return Seq.empty
    val keysBuf = buf(); if (keysBuf == null) return Seq.empty
    val valLensBuf = buf(); if (valLensBuf == null) return Seq.empty
    val valsBuf = buf(); if (valsBuf == null) return Seq.empty
    def slice(lens: Array[Byte], data: Array[Byte]): Array[Array[Byte]] = {
      val lc = new Cursor(lens, 0)
      val out = new Array[Array[Byte]](n)
      var off = 0
      var k = 0
      while (k < n) {
        val l = lc.vint()
        if (l < 0 || l > data.length - off) return null
        out(k) = java.util.Arrays.copyOfRange(data, off, off + l)
        off += l; k += 1
      }
      if (off != data.length) return null
      out
    }
    val keys = slice(keyLensBuf, keysBuf); if (keys == null) return Seq.empty
    val vals = slice(valLensBuf, valsBuf); if (vals == null) return Seq.empty
    keys.zip(vals).toSeq
  }

  // ---------------------------------------------------------- Spark API

  /** Sync-escape positions (offset of the i32 -1), ascending — the
    * split points. Byte-range tasks scan in parallel; the 20-byte
    * pattern is matched across range boundaries via overlap.
    */
  private def syncOffsets(spark: SparkSession, path: String, sync: Array[Byte],
      fileLen: Long, rangeBytes: Int): DataFrame = {
    import spark.implicits._
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val syncB = sync
    val ranges = (0L until fileLen by rangeBytes.toLong)
      .map(s => (s, math.min(s + rangeBytes, fileLen)))
    ranges.toDF("start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._2 - r._1).sum, rangeBytes.toLong))
      .as[(Long, Long)]
      .flatMap { case (start, end) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(confB.value)
        val in = fs.open(p)
        val buf = new Array[Byte]((end - start + 20).toInt)
        val got = try {
          in.seek(start)
          var g = 0; var n = 0
          while (g < buf.length && n >= 0) {
            n = in.read(buf, g, buf.length - g); if (n > 0) g += n
          }
          g
        } finally in.close()
        val lim = math.min(got, (end - start).toInt)
        (0 until lim).iterator.filter { i =>
          got - i >= 20 &&
          buf(i) == -1 && buf(i + 1) == -1 && buf(i + 2) == -1 &&
          buf(i + 3) == -1 && {
            var k = 0; var ok = true
            while (ok && k < 16) { ok = buf(i + 4 + k) == syncB(k); k += 1 }
            ok
          }
        }.map(start + _)
      }
      .toDF("offset")
  }

  /** Read a SequenceFile as `(offset, key binary, value binary)` —
    * payload-extracted per the header's writable classes ([[payload]]).
    * `rangeBytes` sizes the parallel sync scan; record regions then
    * parse one ranged read each. Works for uncompressed,
    * record-compressed and block-compressed files over
    * DefaultCodec/GzipCodec/SnappyCodec.
    */
  def readRecords(spark: SparkSession, path: String,
      rangeBytes: Int = 32 << 20): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= 1024, "rangeBytes must be at least 1 KiB")
    val conf = spark.sparkContext.hadoopConfiguration
    val h = readHeader(conf, path)
    val fileLen = Bz2Streams.fileLength(spark, path)
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val hB = h
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("start"))
    // regions = [headerEnd, sync₁) ∪ [syncᵢ+20, syncᵢ₊₁) — one narrow
    // (start,end) row per region, corpus bytes never shuffle
    syncOffsets(spark, path, h.sync, fileLen, rangeBytes)
      .select((col("offset") + 20).as("start"), col("offset").as("esc"))
      .unionByName(Seq((h.headerEnd, -1L)).toDF("start", "esc"))
      .withColumn("end",
        coalesce(lead(col("esc"), 1).over(w), lit(fileLen)))
      .select("start", "end")
      .repartition(col("start"))
      .as[(Long, Long)]
      .flatMap { case (start, end) =>
        val len = end - start
        if (len <= 0 || len > MaxRegion) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val buf = new Array[Byte](len.toInt)
          try { in.seek(start); in.readFully(buf, 0, len.toInt) }
          finally in.close()
          parseRegion(hB, buf).iterator.map { case (k, v) =>
            (start, payload(hB.keyClass, k), payload(hB.valueClass, v))
          }
        }
      }
      .toDF("offset", "key", "value")
  }

  /** Text/Text convenience view: `(key string, value string)`. */
  def readText(spark: SparkSession, path: String,
      rangeBytes: Int = 32 << 20): DataFrame =
    readRecords(spark, path, rangeBytes)
      .select(decode(col("key"), "UTF-8").as("key"),
        decode(col("value"), "UTF-8").as("value"))
}
