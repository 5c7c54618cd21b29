package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** BGZF — blocked gzip (the htslib/tabix container, and the other
  * splittable-compression format next to [[ZstdSeekable]]): a valid
  * multi-member gzip stream whose every member carries its own
  * compressed size in a 'BC' FEXTRA subfield (BSIZE = member length
  * − 1), capping members at 64 KiB. Any gzip decoder decompresses the
  * whole file; a BGZF-aware reader seeks. Unlike seekable zstd there
  * is no trailing seek table — the size chain is IN-BAND, so the
  * parallel reader range-scans for member starts (magic + BC subfield
  * + a verifying inflate), then chains by BSIZE inside its range:
  * one ranged read per task, no whole-file decode on one core.
  *
  * Reference hook: raw-layer ingestion
  * (`aje_libs/common/helpers/utils/dynamodb_helper.py` table-driven
  * loads) — engine-addition scope for compressed text corpora.
  */
object Bgzf {

  /** Canonical 28-byte empty EOF member (the spec's end marker). */
  private val Eof: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)

  /** Max UNCOMPRESSED chunk a member may carry (the format's ISIZE
    * bound is 64 KiB; stored-deflate worst case needs slack below it).
    */
  val MaxChunk: Int = 60 * 1024

  /** BGZF bytes from chunks, one member each, closed by the EOF
    * member. `zcat` on the output reproduces the chunk concatenation.
    * Chunks past [[MaxChunk]] refuse — BGZF is a 64 KiB-block format
    * by definition; split larger units upstream.
    */
  def write(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    chunks.foreach(writeMember(out, _))
    out.write(Eof, 0, Eof.length)
    out.toByteArray
  }

  /** The 28-byte empty-member EOF marker, streamed (named helper — a
    * task lambda touching the object-private [[Eof]] array directly
    * would capture the module in the closure).
    */
  private[llmops] def writeEof(out: java.io.OutputStream): Unit =
    out.write(Eof, 0, Eof.length)

  /** One chunk as one BGZF member, streamed to `out` — the unit
    * [[write]] loops and the shard writer appends row by row (memory
    * = one member, never one shard). Close a member sequence with
    * [[Eof]].
    */
  private[llmops] def writeMember(out: java.io.OutputStream,
      c: Array[Byte]): Unit = {
    require(c.length <= MaxChunk,
      s"bgzf member payload ${c.length} exceeds $MaxChunk — BGZF " +
        "members cap at 64 KiB; split larger units upstream")
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(c); d.finish()
    val comp = new Array[Byte](c.length + (c.length >> 9) + 64)
    var n = 0
    while (!d.finished()) n += d.deflate(comp, n, comp.length - n)
    d.end()
    val crc = new java.util.zip.CRC32()
    crc.update(c, 0, c.length)
    val total = 18 + n + 8
    require(total <= 65536, s"bgzf member $total exceeds 64 KiB")
    val bsize = total - 1
    out.write(0x1f); out.write(0x8b); out.write(0x08); out.write(0x04)
    out.write(Array[Byte](0, 0, 0, 0)) // mtime
    out.write(0); out.write(0xff) // XFL, OS
    out.write(6); out.write(0) // XLEN = 6
    out.write('B'); out.write('C'); out.write(2); out.write(0)
    out.write(bsize & 0xff); out.write((bsize >>> 8) & 0xff)
    out.write(comp, 0, n)
    val cv = crc.getValue
    out.write((cv & 0xff).toInt); out.write(((cv >>> 8) & 0xff).toInt)
    out.write(((cv >>> 16) & 0xff).toInt)
    out.write(((cv >>> 24) & 0xff).toInt)
    out.write(c.length & 0xFF); out.write((c.length >>> 8) & 0xff)
    out.write((c.length >>> 16) & 0xff)
    out.write((c.length >>> 24) & 0xff)
  }

  /** Member at `off` in `b`: (payload, memberLength), or null when the
    * bytes are not a CRC-verified BGZF member. Empty members (the EOF
    * marker) return a zero-length payload.
    */
  private[llmops] def memberAt(b: Array[Byte], off: Int): (Array[Byte], Int) = {
    if (off + 18 > b.length) return null
    if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
        (b(off + 2) & 0xff) != 0x08 || (b(off + 3) & 0xff) != 0x04)
      return null
    val xlen = (b(off + 10) & 0xff) | ((b(off + 11) & 0xff) << 8)
    if (off + 12 + xlen + 8 > b.length) return null
    // find the BC subfield inside FEXTRA
    var p = off + 12
    val xEnd = off + 12 + xlen
    var bsize = -1
    while (bsize < 0 && p + 4 <= xEnd) {
      val slen = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
      if (b(p) == 'B' && b(p + 1) == 'C' && slen == 2 &&
          p + 6 <= xEnd)
        bsize = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)
      else p += 4 + slen
    }
    if (bsize < 0) return null
    val total = bsize + 1
    if (total < 12 + xlen + 8 || off + total > b.length) return null
    val dataStart = off + 12 + xlen
    val dataLen = total - (12 + xlen) - 8
    if (dataLen < 0) return null
    val isizeOff = off + total - 4
    val isize = (b(isizeOff) & 0xff) | ((b(isizeOff + 1) & 0xff) << 8) |
      ((b(isizeOff + 2) & 0xff) << 16) | ((b(isizeOff + 3) & 0xff) << 24)
    if (isize < 0 || isize > 65536) return null
    val plain = new Array[Byte](isize)
    try {
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, dataStart, dataLen)
      var got = 0
      var stalled = false
      while (got < isize && !inf.finished() && !stalled) {
        val n = inf.inflate(plain, got, isize - got)
        got += n
        // truncated payload (corrupt BSIZE): inflate returns 0 wanting
        // more input forever — refuse the member, never spin
        if (n == 0 && inf.needsInput()) stalled = true
      }
      val ok = !stalled && got == isize && inf.finished()
      inf.end()
      if (!ok) return null
    } catch { case _: Exception => return null }
    val crc = new java.util.zip.CRC32()
    crc.update(plain, 0, plain.length)
    val crcOff = off + total - 8
    val want = (b(crcOff) & 0xffL) | ((b(crcOff + 1) & 0xffL) << 8) |
      ((b(crcOff + 2) & 0xffL) << 16) | ((b(crcOff + 3) & 0xffL) << 24)
    if (crc.getValue != want) return null
    (plain, total)
  }

  /** Multi-file [[readBgzf]]: a file, glob, or directory reads as one
    * DataFrame with a leading `path` provenance column — ONE plan with
    * one (file, range) row per task, never a union of per-file plans
    * (a thousand-shard directory must not become a thousand-node
    * logical plan).
    */
  def readBgzfFiles(spark: SparkSession, pathOrGlob: String,
      rangeBytes: Int = 32 << 20): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= 1024, "rangeBytes must be at least 1 KiB")
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Avro.resolveFiles(conf, pathOrGlob)
    require(files.nonEmpty, s"no files match $pathOrGlob")
    // driver gate per file: must open with a verified member
    // (bounded-parallel — one 70 KB head read per file)
    DriverPar.parMap(files) { case (p0, len) =>
      val fp = new org.apache.hadoop.fs.Path(p0)
      val fs = fp.getFileSystem(conf)
      val head = new Array[Byte](math.min(len, 70000L).toInt)
      val in0 = fs.open(fp)
      try in0.readFully(0L, head) finally in0.close()
      require(memberAt(head, 0) != null,
        s"$p0 does not open with a BGZF member — plain gzip decodes " +
          "via Compression.decode (whole-file, not splittable)")
    }
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val ranges = files.flatMap { case (p0, len) =>
      (0L until math.max(1L, len) by rangeBytes.toLong)
        .map(start => (p0, len, start, math.min(start + rangeBytes, len)))
    }
    val struct = StructType(Seq(StructField("path", StringType),
      StructField("offset", LongType),
      StructField("content", BinaryType)))
    ranges.toDF("path", "len", "start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._4 - r._3).sum, rangeBytes.toLong))
      .as[(String, Long, Long, Long)]
      .flatMap { case (p0, len, start, end) =>
        Bgzf.scanRange(confB, p0, len, start, end)
          .map(r => Row(p0, r.get(0), r.get(1)))
      }(org.apache.spark.sql.Encoders.row(struct))
  }

  /** Distributed BGZF export — the [[TarShards]] shard protocol: rows
    * hash-shard on `keyCol`, each task streams ITS shard's rows as one
    * member each, rolling files on the sorted shard boundary.
    * Byte-deterministic given the same rows.
    */
  def writeShards(df: DataFrame, keyCol: String, contentCol: String,
      dir: String, nShards: Int): Unit = {
    import org.apache.spark.sql.functions._
    val sharded = df
      .withColumn("__shard",
        // null keys hash to null → coalesce to shard 0, never an NPE
        coalesce(pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"), lit(0)))
      .select(col("__shard"), col(keyCol).cast("string").as("__key"),
        col(contentCol).cast("binary").as("__content"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirB = dir
    sharded.foreachPartition { rows: Iterator[Row] =>
      // several shard ids can hash into one partition — roll files on
      // the (sorted) shard boundary. Members stream row by row: task
      // memory is ONE member, never one shard (a shard is corpus-sized
      // divided by nShards — buffering it whole would OOM at scale)
      var out: java.io.OutputStream = null
      var shard = -1
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        writeEof(out); out.close(); out = null
      }
      // a failed shard must not survive as a structurally VALID file
      // missing rows: drop the EOF marker and delete the partial file,
      // then rethrow the ORIGINAL failure unmasked
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value); out = null
      }
      try {
        rows.foreach { r =>
          val s = r.getInt(0)
          if (s != shard) {
            closeCurrent(); shard = s
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.bgz")
            val fs = curPath.getFileSystem(confB.value)
            out = new java.io.BufferedOutputStream(
              fs.create(curPath, true), 64 << 10)
          }
          val c = r.getAs[Array[Byte]](2)
          // an empty BGZF member is indistinguishable from the EOF
          // marker, so the reader drops it — refuse loudly instead of
          // losing the row silently (xz and tar shards round-trip
          // empty documents; route such corpora there, or filter)
          require(c != null && c.nonEmpty,
            s"empty document (key ${r.getString(1)}) cannot round-trip " +
              "through a BGZF member — the reader treats empty members " +
              "as EOF padding; filter empty rows or use the xz/tar " +
              "shard protocol")
          writeMember(out, c)
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }

  /** Parallel BGZF read: `(offset LONG, content BINARY)` — each task
    * range-scans for its first CRC-verified member (magic + BC
    * subfield + inflate), then chains by BSIZE; a member belongs to
    * the range containing its start, so every member decodes exactly
    * once. Empty members (EOF markers) yield no row. Refuses files
    * whose first bytes are not a BGZF member (plain gzip decodes via
    * [[Compression.decode]] — whole-file, not splittable).
    */
  def readBgzf(spark: SparkSession, path: String,
      rangeBytes: Int = 32 << 20): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= 1024, "rangeBytes must be at least 1 KiB")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    // driver gate: the file must OPEN with a verified member
    val head = new Array[Byte](math.min(len, 70000L).toInt)
    val in0 = fs.open(p)
    try in0.readFully(0L, head) finally in0.close()
    require(memberAt(head, 0) != null,
      s"$path does not open with a BGZF member — plain gzip decodes " +
        "via Compression.decode (whole-file, not splittable)")
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val ranges = (0L until math.max(1L, len) by rangeBytes.toLong)
      .map(start => (start, math.min(start + rangeBytes, len)))
    val struct = StructType(Seq(StructField("offset", LongType),
      StructField("content", BinaryType)))
    ranges.toDF("start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._2 - r._1).sum, rangeBytes.toLong))
      .as[(Long, Long)]
      .flatMap { case (start, end) =>
        Bgzf.scanRange(confB, path, len, start, end)
      }(org.apache.spark.sql.Encoders.row(struct))
  }

  /** One range's member walk (named helper — lambdas touching
    * object-private members capture the module and break task
    * serialization). Reads [start, end) plus a 64 KiB overlap so a
    * member straddling `end` decodes in the range that OWNS its start.
    */
  private[llmops] def scanRange(
      confB: org.apache.spark.util.SerializableConfiguration,
      path: String, fileLen: Long, start: Long,
      end: Long): Iterator[Row] = {
    val readEnd = math.min(fileLen, end + 65536L)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(confB.value)
    val in = fs.open(p)
    val buf = new Array[Byte]((readEnd - start).toInt)
    try { in.readFully(start, buf) } finally in.close()
    val out = Vector.newBuilder[Row]
    // find the first verified member start inside [start, end)
    var off = 0
    var found = -1
    val limit = (end - start).toInt
    while (found < 0 && off < limit) {
      if ((buf(off) & 0xff) == 0x1f && off + 1 < buf.length &&
          (buf(off + 1) & 0xff) == 0x8b && memberAt(buf, off) != null)
        found = off
      else off += 1
    }
    if (found >= 0) {
      var cur = found
      var ok = true
      while (ok && cur < limit) {
        memberAt(buf, cur) match {
          case null => ok = false // chain damage: stop this range
          case (plain, total) =>
            if (plain.nonEmpty)
              out += Row(start + cur, plain)
            cur += total
        }
      }
    }
    out.result().iterator
  }
}
