package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WebDataset-style tar-shard export — the standard container for
  * multimodal training samples (a tar of `key.ext` members per shard,
  * streamed sequentially by data loaders). JDK-only USTAR writer/reader:
  * tar is 512-byte header blocks (name, octal size, checksum, "ustar"
  * magic) + content padded to block size, two zero blocks at the end —
  * no library needed.
  *
  * Scale shape: shard assignment is the deterministic portable hash of
  * [[TrainExport.shuffleShards]]; one shuffle routes rows to their shard,
  * then each shard tars inside its own task via `foreachPartition` (no
  * driver funnel, no collect). Shards are independent files a 1000-loader
  * training job reads concurrently.
  *
  * Member size cap 8 GiB − 1 (the 11-octal-digit USTAR size field);
  * member names cap at 100 bytes (the USTAR name field — keys are ids,
  * not paths, so the prefix field is deliberately unused).
  */
object TarShards {

  private val BlockSize = 512

  private[llmops] def headerFor(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"tar member name over 100 bytes: $name")
    require(size >= 0 && size <= 0x1FFFFFFFFL, s"tar member size out of range: $size")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(ISO_8859_1)
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000") // mode
    put(108, "0000000\u0000") // uid
    put(116, "0000000\u0000") // gid
    put(124, f"$size%011o\u0000")
    put(136, "00000000000\u0000") // mtime: fixed 0 — deterministic output
    put(156, "0") // typeflag: regular file
    put(257, "ustar\u0000") // magic
    put(263, "00") // version
    // checksum: sum of all header bytes with the chksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    h
  }

  private def padding(size: Long): Int =
    ((BlockSize - (size % BlockSize)) % BlockSize).toInt

  /** Write `(nameCol: string, contentCol: binary)` rows as
    * `shard-NNNNN.tar` files under `dir`, `nShards` shards assigned by
    * portable hash of `nameCol`. Members within a shard are written in
    * ascending name order (deterministic shard bytes for a given corpus).
    */
  def write(df: DataFrame, nameCol: String, contentCol: String,
      dir: String, nShards: Int): Unit = {
    // same portable-hash assignment as TrainExport.shuffleShards, without
    // its per-shard position window (tar members don't need ranks)
    val sharded = df
      .select(col(nameCol).cast("string").alias("__name"),
        col(contentCol).cast("binary").alias("__content"))
      .withColumn("shard",
        pmod(graft.llmops.Similarity.portable60(col("__name")),
          lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__name"))
    val dirB = dir // avoid serializing `this`
    // Carry the session's Hadoop settings (credentials, endpoints,
    // defaultFS) into the tasks instead of a fresh Configuration().
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sharded.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      // repartition(n, col) hash-partitions on murmur3(shard) % n, so a
      // partition can carry SEVERAL distinct shard ids (and some carry
      // none). Rows arrive sorted by (shard, __name), so roll to a new
      // tar whenever the shard id changes — every shard still gets
      // exactly one file, written by exactly one task.
      var out: java.io.OutputStream = null
      var curShard = -1
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        out.write(new Array[Byte](2 * BlockSize)) // archive end
        out.close()
        out = null
      }
      // a failed shard must not survive on disk at all (tar readers are
      // lenient about a missing end marker, so a partial tar would read
      // as a valid archive missing members): delete it, rethrow the
      // original error
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value); out = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getAs[Int]("shard")
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.tar")
            val fs = curPath.getFileSystem(confB.value)
            out = fs.create(curPath, true)
          }
          val name = r.getAs[String]("__name")
          val content = r.getAs[Array[Byte]]("__content")
          out.write(headerFor(name, content.length.toLong))
          out.write(content)
          out.write(new Array[Byte](padding(content.length.toLong)))
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }

  /** Read every tar under `dir` back to `(name: string, content: binary)`
    * rows — the loader-side contract, and the round-trip verifier for
    * [[write]]. Truncated or malformed members end that shard's parse
    * (curation posture: surface what parses, never throw mid-scan).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // *.tar plus any codec-wrapped variant (*.tar.gz / .zst / .bz2 / …):
    // WebDataset-style loaders meet both; the sniffing front door makes
    // the decompress codec-blind, one file per task either way
    spark.read.format("binaryFile").load(s"$dir/*.tar*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, raw) =>
        // sniff first; fall back to the file suffix for brotli, the one
        // codec with no magic bytes (.tar itself names no codec)
        Compression.sniffCodec(raw)
          .orElse(Compression.codecForName(path)) match {
          case Some(c) =>
            val d = Compression.decode(raw, c)
            if (d == null) Array.emptyByteArray else d
          case None => raw
        }
      }
      .flatMap { bytes =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
        var p = 0
        var done = false
        while (!done && p + BlockSize <= bytes.length) {
          if (bytes(p) == 0) done = true // end-of-archive zero block
          else {
            val nameEnd = {
              var e = p
              while (e < p + 100 && bytes(e) != 0) e += 1
              e
            }
            val name = new String(bytes, p, nameEnd - p, UTF_8)
            val sizeStr = new String(bytes, p + 124, 12, ISO_8859_1)
              .takeWhile(c => c >= '0' && c <= '7')
            val size = java.lang.Long.parseLong(
              if (sizeStr.isEmpty) "0" else sizeStr, 8)
            val dataStart = p + BlockSize
            if (size < 0 || dataStart + size > bytes.length) done = true
            else {
              out += ((name, java.util.Arrays.copyOfRange(
                bytes, dataStart, (dataStart + size).toInt)))
              p = dataStart + size.toInt +
                ((BlockSize - (size % BlockSize)) % BlockSize).toInt
            }
          }
        }
        out
      }
      .toDF("name", "content")
  }
}
