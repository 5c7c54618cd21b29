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

  private def wr32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
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
    val entries = chunks.map { c =>
      val frame = ZstdWriter.encode(c)
      out.write(frame, 0, frame.length)
      (frame.length, c.length,
        (XxHash.xxh64(c, 0, c.length, 0L) & 0xFFFFFFFFL).toInt)
    }
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
    out.toByteArray
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

  /** Frame-parallel read: `(frame_idx LONG, content BINARY)` — one task
    * per frame, one ranged read each. Frames with decompressed size 0
    * (skippable padding) yield no row. Checksums (when present) verify
    * per frame; a frame that fails decode or checksum refuses loudly
    * (a seekable index pointing at damaged bytes is corruption, not a
    * skippable tier).
    */
  def readSeekable(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val entries = readSeekTable(conf, path)
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val rows = entries.zipWithIndex.collect {
      case (e, i) if e.decompressedSize > 0 =>
        (i.toLong, e.offset, e.compressedSize, e.decompressedSize,
          e.checksum.map(_.toLong).getOrElse(-1L), e.checksum.isDefined)
    }
    val struct = StructType(Seq(StructField("frame_idx", LongType),
      StructField("content", BinaryType)))
    rows.toDF("idx", "off", "cs", "ds", "ck", "hasCk")
      .repartition(math.min(math.max(rows.size, 1), 4096))
      .as[(Long, Long, Int, Int, Long, Boolean)]
      .map { case (idx, off, cs, ds, ck, hasCk) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(confB.value)
        val in = fs.open(p)
        val buf = new Array[Byte](cs)
        try { in.readFully(off, buf) } finally in.close()
        val plain = Zstd.decode(buf)
        require(plain != null && plain.length == ds,
          s"frame $idx decode mismatch (${if (plain == null) "refused"
            else plain.length.toString} vs $ds)")
        if (hasCk)
          require((XxHash.xxh64(plain, 0, plain.length, 0L) &
            0xFFFFFFFFL).toInt == ck.toInt, s"frame $idx checksum")
        Row(idx, plain)
      }(org.apache.spark.sql.Encoders.row(struct))
  }
}
