package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Seekable zstd (the public zstd-contrib seekable format): a normal
  * zstd file whose content is cut into INDEPENDENT frames, with a seek
  * table riding a trailing skippable frame — any conformant zstd
  * decoder decompresses the whole file (skippable frames are skipped by
  * definition), while a seekable-aware reader random-accesses single
  * frames. That makes `.zst` corpora SPLITTABLE: one task per frame,
  * one ranged read each, no whole-file decode on a single core — the
  * difference between a 100 TB `.jsonl.zst` lake ingesting on one
  * executor thread and on all of them.
  *
  * Wire form (little-endian): body = zstd frames back to back; tail =
  * skippable frame magic 0x184D2A5E, frame size, then per-frame entries
  * (compressed_size u32, decompressed_size u32, [xxh64-low32 of the
  * decompressed bytes when the descriptor's checksum bit is set]),
  * closed by number_of_frames u32, seek_table_descriptor u8, seekable
  * magic 0x8F92EAB1.
  *
  * Reference hook: raw-layer ingestion
  * (`aje_libs/common/helpers/utils/dynamodb_helper.py` table-driven
  * loads) — engine-addition scope for compressed text corpora.
  */
object ZstdSeekable {

  private val SkippableMagic = 0x184D2A5E
  private val SeekableMagic = 0x8F92EAB1

  private def wr32(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Seekable file bytes from independent chunks (one zstd frame each,
    * via the repo's own frame writer) + the seek-table skippable frame.
    * `zstd -d` on the output reproduces the chunk concatenation.
    */
  def write(chunks: Seq[Array[Byte]],
      withChecksum: Boolean = true): Array[Byte] = {
    require(chunks.nonEmpty, "seekable file needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    val st = new SeekableStream(out, withChecksum)
    chunks.foreach(st.append)
    st.finish()
    out.toByteArray
  }

  /** Streaming seekable-zstd encoder: [[append]] writes one chunk as
    * one frame, [[finish]] closes with the seek-table skippable frame.
    * Byte-identical to [[write]] over the same chunk sequence; live
    * memory is one chunk plus 8–12 bytes of table entry per frame —
    * the shape that lets the shard writer stream corpus-sized shards
    * without holding one in memory.
    */
  final class SeekableStream(out: java.io.OutputStream,
      withChecksum: Boolean = true) {
    private val entries =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]

    def append(c: Array[Byte]): Unit = {
      val frame = ZstdWriter.encode(c)
      out.write(frame, 0, frame.length)
      entries += ((frame.length, c.length,
        (XxHash.xxh64(c, 0, c.length, 0L) & 0xFFFFFFFFL).toInt))
    }

    def finish(): Unit = {
      require(entries.nonEmpty, "seekable file needs at least one frame")
      val entryW = if (withChecksum) 12 else 8
      wr32(out, SkippableMagic)
      wr32(out, entries.length * entryW + 9)
      entries.foreach { case (cs, ds, ck) =>
        wr32(out, cs); wr32(out, ds)
        if (withChecksum) wr32(out, ck)
      }
      wr32(out, entries.length)
      out.write(if (withChecksum) 0x80 else 0x00)
      wr32(out, SeekableMagic)
    }
  }

  final case class Entry(offset: Long, compressedSize: Int,
      decompressedSize: Int, checksum: Option[Int])

  /** Driver-side seek-table parse from the file tail. Refuses files
    * without the seekable footer (they are still decodable as plain
    * zstd — by [[Zstd.decode]] — just not splittable).
    */
  def readSeekTable(conf: org.apache.hadoop.conf.Configuration,
      path: String): Vector[Entry] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 17, s"too short for a seekable footer: $path")
    val in = fs.open(p)
    try {
      def r32(b: Array[Byte], o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      val foot = new Array[Byte](9)
      in.readFully(len - 9, foot)
      require(r32(foot, 5) == SeekableMagic,
        s"no seekable-zstd footer in $path — plain zstd files decode " +
          "via Zstd.decode (whole-file, not splittable)")
      val nFrames = r32(foot, 0)
      val desc = foot(4) & 0xff
      require((desc & 0x7c) == 0, s"reserved descriptor bits set: $desc")
      val withCk = (desc & 0x80) != 0
      val entryW = if (withCk) 12 else 8
      require(nFrames >= 0 && nFrames <= 16_000_000, s"frames $nFrames")
      val tableLen = nFrames.toLong * entryW + 9
      val frameStart = len - tableLen - 8
      require(frameStart >= 0, "seek table exceeds file")
      val tbl = new Array[Byte](tableLen.toInt + 8)
      in.readFully(frameStart, tbl)
      require(r32(tbl, 0) == SkippableMagic &&
        r32(tbl, 4) == tableLen.toInt,
        "seek-table skippable frame header mismatch")
      var off = 0L
      val out = Vector.newBuilder[Entry]
      var k = 0
      while (k < nFrames) {
        val base = 8 + k * entryW
        val cs = r32(tbl, base)
        val ds = r32(tbl, base + 4)
        val ck = if (withCk) Some(r32(tbl, base + 8)) else None
        require(cs >= 0 && ds >= 0, "negative seek entry")
        out += Entry(off, cs, ds, ck)
        off += cs.toLong
        k += 1
      }
      require(off == frameStart,
        s"seek entries cover $off bytes, body is $frameStart")
      out.result()
    } finally in.close()
  }

  /** Multi-file [[readSeekable]]: a file, glob, or directory reads as
    * one DataFrame with a leading `path` provenance column; every
    * (file, frame) pair becomes one task. Seek tables are read on the
    * driver (bytes proportional to FRAME COUNT, not data) through
    * [[DriverPar.parMap]]'s bounded pool — one round-trip per file,
    * O(files / poolWidth) planning latency.
    */
  def readSeekableFiles(spark: SparkSession, pathOrGlob: String,
      groupBytes: Int = 4 << 20): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Avro.resolveFiles(conf, pathOrGlob)
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    // frames are the RANDOM-ACCESS unit, not the task unit: group
    // consecutive frames into ~groupBytes ranged reads (one task each)
    val groups = DriverPar.parMap(files) { case (p, _) =>
      groupEntries(readSeekTable(conf, p), groupBytes).map {
        case (firstIdx, es) => (p, firstIdx, es)
      }
    }.flatten
    val struct = StructType(Seq(StructField("path", StringType),
      StructField("frame_idx", LongType),
      StructField("content", BinaryType)))
    groups.toDF("path", "firstIdx", "entries")
      .repartition(math.min(math.max(groups.size, 1), 4096))
      .as[(String, Long, Seq[(Long, Int, Int, Long, Boolean)])]
      .flatMap { case (path, firstIdx, entries) =>
        decodeGroup(confB, path, firstIdx, entries)
      }(org.apache.spark.sql.Encoders.row(struct))
  }

  /** (firstFrameIdx, per-frame (offset, compSize, decompSize, checksum,
    * hasChecksum)) groups of consecutive non-empty frames, each group
    * spanning at most ~groupBytes compressed.
    */
  private[llmops] def groupEntries(entries: Vector[Entry],
      groupBytes: Int): Vector[(Long, Seq[(Long, Int, Int, Long, Boolean)])] = {
    val out = Vector.newBuilder[(Long, Seq[(Long, Int, Int, Long, Boolean)])]
    var cur = Vector.newBuilder[(Long, Int, Int, Long, Boolean)]
    var curFirst = -1L
    var curBytes = 0L
    def flush(): Unit = {
      val g = cur.result()
      if (g.nonEmpty) out += ((curFirst, g))
      cur = Vector.newBuilder
      curFirst = -1L
      curBytes = 0L
    }
    entries.zipWithIndex.foreach { case (e, i) =>
      if (e.decompressedSize > 0) {
        if (curBytes > 0 && curBytes + e.compressedSize > groupBytes)
          flush()
        if (curFirst < 0) curFirst = i.toLong
        cur += ((e.offset, e.compressedSize, e.decompressedSize,
          e.checksum.map(_.toLong).getOrElse(-1L), e.checksum.isDefined))
        curBytes += e.compressedSize
      } else flush() // empty/skippable frame: cut, so indices inside a
        // group stay consecutive and firstIdx + k labels exactly
    }
    flush()
    out.result()
  }

  /** One group's ranged read + per-frame decode (named helper: lambdas
    * touching object-private members capture the module and break task
    * serialization).
    */
  private[llmops] def decodeGroup(
      confB: org.apache.spark.util.SerializableConfiguration,
      path: String, firstIdx: Long,
      entries: Seq[(Long, Int, Int, Long, Boolean)]): Iterator[Row] = {
    if (entries.isEmpty) return Iterator.empty
    val start = entries.head._1
    val end = entries.last._1 + entries.last._2
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(confB.value)
    val in = fs.open(p)
    val buf = new Array[Byte]((end - start).toInt)
    try { in.readFully(start, buf) } finally in.close()
    // frame indices inside a group are consecutive by construction
    // (empty frames never enter a group and always cut one)
    entries.iterator.zipWithIndex.map { case ((off, cs, ds, ck, hasCk), k) =>
      val frame = java.util.Arrays.copyOfRange(buf, (off - start).toInt,
        (off - start).toInt + cs)
      val plain = Zstd.decode(frame)
      require(plain != null && plain.length == ds,
        s"frame ${firstIdx + k} decode mismatch in $path")
      if (hasCk)
        require((XxHash.xxh64(plain, 0, plain.length, 0L) &
          0xFFFFFFFFL).toInt == ck.toInt,
          s"frame ${firstIdx + k} checksum in $path")
      Row(path, firstIdx + k, plain)
    }
  }

  /** Distributed seekable export — the [[TarShards]] shard protocol:
    * rows hash-shard on `keyCol`, each task streams ITS shard's rows
    * as one frame each (the random-access unit) and closes with the
    * seek table. Byte-deterministic given the same rows.
    */
  def writeShards(df: DataFrame, keyCol: String, contentCol: String,
      dir: String, nShards: Int): Unit = {
    import org.apache.spark.sql.functions._
    val sharded = df
      .withColumn("__shard",
        pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"))
      .select(col("__shard"), col(keyCol).cast("string").as("__key"),
        col(contentCol).cast("binary").as("__content"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirB = dir
    sharded.foreachPartition { rows: Iterator[Row] =>
      // several shard ids can hash into one partition — roll files on
      // the (sorted) shard boundary, exactly like the tar/arrow shard
      // writers. Frames stream row by row through SeekableStream: task
      // memory is one frame + the (bounded) seek-table entries, never
      // a whole corpus-sized shard
      var out: java.io.OutputStream = null
      var st: SeekableStream = null
      var shard = -1
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        st.finish(); out.close(); out = null; st = null
      }
      // a failed shard must not survive as a structurally VALID file
      // missing rows: drop the seek table and delete the partial file,
      // then rethrow the ORIGINAL failure unmasked
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value)
        out = null; st = null
      }
      try {
        rows.foreach { r =>
          val s = r.getInt(0)
          if (s != shard) {
            closeCurrent(); shard = s
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.zst")
            val fs = curPath.getFileSystem(confB.value)
            out = new java.io.BufferedOutputStream(
              fs.create(curPath, true), 64 << 10)
            st = new SeekableStream(out)
          }
          val c = r.getAs[Array[Byte]](2)
          // a zero-decompressed-size frame reads as skippable padding,
          // so an empty row would vanish on read — refuse loudly (xz
          // and tar shards round-trip empty documents)
          require(c != null && c.nonEmpty,
            s"empty document (key ${r.getString(1)}) cannot round-trip " +
              "through a seekable-zstd frame — zero-size frames read " +
              "as padding; filter empty rows or use the xz/tar shard " +
              "protocol")
          st.append(c)
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }

  /** Frame-parallel read: `(frame_idx LONG, content BINARY)` — one task
    * per frame, one ranged read each. Frames with decompressed size 0
    * (skippable padding) yield no row. Checksums (when present) verify
    * per frame; a frame that fails decode or checksum refuses loudly
    * (a seekable index pointing at damaged bytes is corruption, not a
    * skippable tier).
    */
  def readSeekable(spark: SparkSession, path: String,
      groupBytes: Int = 4 << 20): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = readSeekTable(conf, path)
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val groups = groupEntries(entries, groupBytes)
    val struct = StructType(Seq(StructField("frame_idx", LongType),
      StructField("content", BinaryType)))
    groups.toDF("firstIdx", "entries")
      .repartition(math.min(math.max(groups.size, 1), 4096))
      .as[(Long, Seq[(Long, Int, Int, Long, Boolean)])]
      .flatMap { case (firstIdx, es) =>
        decodeGroup(confB, path, firstIdx, es)
          .map(r => Row(r.get(1), r.get(2)))
      }(org.apache.spark.sql.Encoders.row(struct))
  }
}
