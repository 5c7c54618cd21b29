package graft.llmops

/** Parallel recovery of CONCATENATED bzip2 streams — the layout of both
  * the published MediaWiki multistream dumps and every pbzip2-produced
  * file (pbzip2 compresses blocks as independent streams precisely so
  * readers can do this). A giant `.bz2` is unsplittable to generic
  * readers (one file = one task, and the 64 MB decode cap refuses it
  * whole); here byte-range tasks scan for the 10-byte stream magic
  * (`BZh` + level + block magic 0x314159265359, byte-aligned because
  * every member is a complete bzip2 file), consecutive offsets pair
  * into slices (narrow rows — compressed corpus bytes never shuffle),
  * and each slice seeks + reads exactly its bytes and decodes with the
  * CRC-verifying [[Bzip2]] kernel. Reference hook: compressed-corpus
  * ingestion, `aje_libs/documents/helpers/document_processor.py:10-83`
  * — the reference handles one upload at a time; a 100 TB corpus's
  * "upload" is a multi-GB archive that must split across executors. A false magic inside compressed
  * payload (P ≈ bytes × 2⁻⁸⁰) makes its slice pair decode null and
  * drop — degrade, never mis-parse.
  */
object Bz2Streams {

  private final val MaxStream = 64 << 20

  /** Stream-start offsets, ascending: one row per bzip2 member. */
  def offsets(spark: org.apache.spark.sql.SparkSession, path: String,
      rangeBytes: Int = 32 << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    require(rangeBytes >= 1024, "rangeBytes must be at least 1 KiB")
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileLen = fileLength(spark, path)
    val ranges = (0L until fileLen by rangeBytes.toLong)
      .map(s => (s, math.min(s + rangeBytes, fileLen))).toSeq
    ranges.toDF("start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._2 - r._1).sum, rangeBytes.toLong))
      .as[(Long, Long)]
      .flatMap { case (start, end) =>
        // +16 overlap: a magic beginning in [start, end) is matched
        // even when its tail crosses the range end
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(confB.value)
        val in = fs.open(p)
        val buf = new Array[Byte]((end - start + 16).toInt)
        val got =
          try { in.seek(start); readUpTo(in, buf) } finally in.close()
        (0 until math.min(got, (end - start).toInt))
          .filter(i => got - i >= 10 && isStreamMagic(buf, i))
          .map(i => start + i)
      }
      .toDF("offset")
      .orderBy(col("offset"))
  }

  /** (offset, content) rows: each member stream decoded. Streams whose
    * compressed span exceeds 64 MB (or that fail the CRC) drop.
    */
  def readStreams(spark: org.apache.spark.sql.SparkSession, path: String,
      rangeBytes: Int = 32 << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileLen = fileLength(spark, path)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("offset"))
    // (offset, next) pairs: a single narrow-row shuffle of one long per
    // member; the decompressed corpus itself never shuffles
    offsets(spark, path, rangeBytes)
      .withColumn("next",
        coalesce(lead(col("offset"), 1).over(w), lit(fileLen)))
      .repartition(col("offset"))
      .as[(Long, Long)]
      .flatMap { case (off, next) =>
        val len = (next - off).toInt
        if (len <= 0 || len > MaxStream) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val buf = new Array[Byte](len)
          try { in.seek(off); in.readFully(buf, 0, len) } finally in.close()
          val plain = Bzip2.decode(buf)
          if (plain == null) Iterator.empty else Iterator((off, plain))
        }
      }
      .toDF("offset", "content")
  }

  private[llmops] def fileLength(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  private def readUpTo(in: org.apache.hadoop.fs.FSDataInputStream,
      buf: Array[Byte]): Int = {
    var got = 0
    var n = 0
    while (got < buf.length && n >= 0) {
      n = in.read(buf, got, buf.length - got)
      if (n > 0) got += n
    }
    got
  }

  /** `BZh` + level digit + compressed block magic 0x314159265359. */
  private[llmops] def isStreamMagic(b: Array[Byte], i: Int): Boolean =
    b(i) == 'B' && b(i + 1) == 'Z' && b(i + 2) == 'h' &&
      b(i + 3) >= '1' && b(i + 3) <= '9' &&
      (b(i + 4) & 0xff) == 0x31 && (b(i + 5) & 0xff) == 0x41 &&
      (b(i + 6) & 0xff) == 0x59 && (b(i + 7) & 0xff) == 0x26 &&
      (b(i + 8) & 0xff) == 0x53 && (b(i + 9) & 0xff) == 0x59
}
