package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data export: the last mile between a curated corpus and a
  * trainer's input pipeline — a deterministic global shuffle into shards,
  * and contiguous-stream sequence packing within each shard.
  *
  * Shuffle quality matters for training (ordered or clustered corpora bias
  * early optimization), but `ORDER BY rand()` is irreproducible across
  * engines and re-runs. Hashing the document key gives a shuffle that is
  * deterministic, engine-portable (same md5-prefix trick as [[Sampling]] —
  * a SQL oracle reproduces shard and position bit-for-bit), stable under
  * corpus growth (a document's shard never changes), and embarrassingly
  * parallel: shard = hash mod n is a pure projection, and ordering is a
  * per-shard window, not a global sort.
  */
object TrainExport {

  /** Deterministic shuffle-shard assignment: `shard` = portable hash of the
    * key mod `nShards`, `pos` = the row's rank inside its shard in hash
    * order (hash ties break on the key). One hash shuffle on `shard`; no
    * global sort anywhere.
    */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // NULL keys hash to NULL → NULL shard, which unboxed to 0 in a
    // DIFFERENT shuffle partition than real shard 0 and let two tasks
    // clobber one shard file; route them all to shard 0 explicitly
    // (deterministic, same partition as the rest of shard 0)
    val h = coalesce(Similarity.portable60(col(keyCol)), lit(0L))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Contiguous-stream packing: documents laid out in shuffle order form
    * one token stream per shard; `bin` is the fixed-budget window the
    * document STARTS in (`floor(start_offset / budget)` with
    * `start_offset` = running token sum before the document) — the GPT-2
    * style chunked-stream layout. A document crossing a boundary stays in
    * its starting bin (packers cut or pad at read time; assignment here
    * must stay deterministic and one-pass). Window sums are per shard, so
    * parallelism is `nShards`, not 1.
    */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      tokenCountCol: String,
      nShards: Int,
      tokenBudget: Long
  ): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val sharded = shuffleShards(df, keyCol, nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum", sum(col(tokenCountCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(tokenCountCol)) / tokenBudget).cast("long"))
      .drop("__cum")
  }

  /** Token-exact [[packSequences]]: the budget column is the real BPE
    * token count from a trained merge table ([[Bpe.train]]) instead of a
    * character/whitespace proxy — the unit an actual trainer packs by.
    * The count is a native per-row kernel in the same scan that shards,
    * so the tokens mode adds zero shuffles over the proxy mode.
    */
  def packSequencesByTokens(
      df: DataFrame,
      keyCol: String,
      textCol: String,
      merges: Seq[BpeMerge],
      nShards: Int,
      tokenBudget: Long
  ): DataFrame =
    packSequences(
      df.withColumn("token_count", Bpe.tokenCount(col(textCol), merges)),
      keyCol, "token_count", nShards, tokenBudget)

  /** Write the sharded corpus as one directory per shard (a trainer reads
    * shard directories independently; `pos` preserves the shuffle order
    * inside each file set).
    */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int, path: String): Unit =
    shuffleShards(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** JSONL variant of [[writeShards]] — one directory per shard of
    * gzipped JSON lines, the layout dataloader stacks stream directly.
    */
  def writeShardsJsonl(df: DataFrame, keyCol: String, nShards: Int,
      path: String, gzip: Boolean = true): Unit = {
    val w = shuffleShards(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** JSONL shards through the native corpus codecs — one
    * `shard-NNNNN.jsonl.<ext>` file per shard, compressed with
    * [[Compression]] (`bzip2`/`xz`/`zstd`/`lz4`/`gzip`), lines in shuffle
    * order. Parallelism is per shard (the scale lever: size shards so a
    * file stays well under the 64 MB decode cap — the default trainer
    * shard of 16–64 MB compressed is exactly that envelope). The same
    * one-file-per-shard-id rolling as [[TarShards.write]]: a task may
    * carry several shard ids, each still becomes exactly one file.
    */
  def writeShardsJsonlCodec(df: DataFrame, keyCol: String, nShards: Int,
      path: String, codec: String): Unit = {
    require(Compression.Codecs.contains(codec), s"unknown codec $codec")
    val ext = Compression.extension(codec)
    // overwrite semantics like the DataFrameWriter-backed siblings: each
    // task only creates its own shard-NNNNN file, so a prior export with
    // MORE shards (or another codec's extension) would otherwise leave
    // stale files that readJsonlShards('dir/*') happily mixes back in.
    // Staged: write into a sibling temp dir and swap only after the job
    // succeeds — deleting the target up front would turn a mid-export
    // failure into "neither the old export nor a new one".
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // sweep staging orphans from runs the JVM-kill path (OOM, preemption)
    // never let clean up — UUID-named, so they would otherwise accumulate
    // full-corpus-sized garbage forever; concurrent exports to one target
    // are already unsupported (the commit swap itself races)
    val orphans =
      try rootFs.globStatus(
        new org.apache.hadoop.fs.Path(path + ".__staging-*"))
      catch { case scala.util.control.NonFatal(_) => null }
    if (orphans != null) orphans.foreach(s => rootFs.delete(s.getPath, true))
    val staging = new org.apache.hadoop.fs.Path(
      path + ".__staging-" + java.util.UUID.randomUUID().toString.take(8))
    val sharded = shuffleShards(df, keyCol, nShards)
      .withColumn("__json",
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .select(col("shard"), col("pos"), col("__json"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    val pathB = staging.toString
    val codecB = codec
    // The session's Hadoop settings (credentials, endpoints, defaultFS)
    // must travel to the tasks — a fresh Configuration() would drop them.
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    try {
      sharded.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var buf: java.io.ByteArrayOutputStream = null
        var curShard = -1
        def flush(): Unit = if (buf != null) {
          val p = new org.apache.hadoop.fs.Path(
            f"$pathB/shard-$curShard%05d.jsonl$ext")
          val fs = p.getFileSystem(confB.value)
          val out = fs.create(p, true)
          try out.write(Compression.encode(buf.toByteArray, codecB))
          finally out.close()
          buf = null
        }
        rows.foreach { r =>
          val shard = r.getAs[Int]("shard")
          if (shard != curShard) { flush(); curShard = shard
            buf = new java.io.ByteArrayOutputStream(1 << 16) }
          buf.write(r.getAs[String]("__json")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          buf.write('\n')
        }
        flush()
      }
      // an EMPTY export writes no shard files, so no task ever created
      // the staging dir — materialize it or the swap below would delete
      // the old export and then fail the rename with nothing to recover
      // (overwrite semantics: empty input => empty export, like the
      // DataFrameWriter-backed siblings)
      if (!rootFs.exists(staging)) rootFs.mkdirs(staging)
    } catch {
      // write-phase failure: the partial staging dir is worthless — sweep
      // it; the old export at `root` is untouched
      case e: Throwable =>
        try rootFs.delete(staging, true) catch { case _: Throwable => () }
        throw e
    }
    // commit: the old export disappears only once the new one is fully on
    // disk. The delete→rename window is the unavoidable residue of a
    // filesystem without atomic directory replace; a failure inside it
    // leaves the COMPLETE staging dir on disk to recover from (never
    // deleted here — it may be the only surviving copy), and the error
    // names it.
    if (rootFs.exists(root)) rootFs.delete(root, true)
    if (!rootFs.rename(staging, root))
      throw new java.io.IOException(
        s"writeShardsJsonlCodec: rename $staging -> $root failed; " +
          s"the complete export remains at $staging")
  }

  /** Read JSONL shards back as `(file, pos, line)` rows — any codec the
    * sniffing front door knows (plus plain files), one task per file.
    * The loader-side contract and round-trip verifier of
    * [[writeShardsJsonlCodec]]; parse `line` with `from_json` downstream.
    */
  /** Streaming twin of [[readJsonlShards]]: a file-source stream over a
    * landing directory — new shard files (any codec) become `(file, pos,
    * line)` micro-batches as producers drop them. Same per-file decode
    * as the batch reader, so a pipeline switches batch↔continuous
    * without changing the parse. Pair with `Trigger.AvailableNow` for
    * catch-up runs or a processing-time trigger for live landing.
    */
  def readJsonlShardsStream(spark: SparkSession, dir: String,
      zstdDict: Option[Array[Byte]] = None): DataFrame = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(schema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decodeJsonlLines(path, bytes, zstdDict)
      }
      .toDF("file", "pos", "line")
  }

  /** `zstdDict`: shard farms often compress every shard against one
    * shared trained dictionary (tiny per-record framing, one dictionary
    * broadcast) — when a zstd shard refuses the plain decode, it is
    * retried against this dictionary before being dropped.
    */
  /** Line rows from ONE giant multistream `.jsonl.bz2` (the pbzip2
    * shape: independent member streams, splittable by [[Bz2Streams]]) —
    * the per-FILE readers cap at 64 MB decoded and one task per file,
    * so a 10 GB pbzip2 shard needs this per-STREAM path: every member
    * decodes in its own task. `(file = path@offset, pos = line index
    * within the member, line)`.
    */
  def readJsonlMultistream(spark: SparkSession, path: String,
      rangeBytes: Int = 32 << 20): DataFrame = {
    import spark.implicits._
    // pbzip2 cuts members at fixed BYTE offsets, not line boundaries —
    // a line can straddle two members (truncated JSON tail in member k,
    // orphan head in member k+1). Stitch at member boundaries: each
    // member's FIRST split element is the continuation of the previous
    // member's LAST, joined through a lag window over the (narrow)
    // per-member boundary rows. A line spanning MORE than two whole
    // members (longer than a ~900 KB pbzip2 block) still mis-splits —
    // that shape needs a bigger block size at compression time.
    // localCheckpoint: boundary and body passes both read the decoded
    // members; without it each branch would re-decode the whole archive.
    val parts = Bz2Streams.readStreams(spark, path, rangeBytes)
      .as[(Long, Array[Byte])]
      .map { case (off, plain) =>
        val text = new String(plain, java.nio.charset.StandardCharsets.UTF_8)
        val p = text.split("\n", -1)
        val mids = if (p.length > 1) p.slice(1, p.length - 1) else Array.empty[String]
        val tail = if (p.length > 1) p.last else ""
        (off, p.head, mids, tail)
      }
      .toDF("off", "head", "mids", "tail")
      .localCheckpoint(true)
    // single-partition window over ONE narrow row per member (head/tail
    // strings only, never the body) — #members rows, not #lines
    val w = Window.orderBy(col("off"))
    val boundary = parts
      .select(col("off"), col("head"), col("tail"),
        size(col("mids")).cast("long").alias("n"))
      .withColumn("line",
        concat(coalesce(lag(col("tail"), 1).over(w), lit("")), col("head")))
      .withColumn("last", lead(col("off"), 1).over(w).isNull)
    val stitched = boundary
      .select(col("off"), lit(0L).alias("pos"), col("line"))
    // the LAST member's tail has no successor to stitch it into — when the
    // archive doesn't end with a newline, that tail IS the final line
    val finalTail = boundary
      .filter(col("last") && length(col("tail")) > 0)
      .select(col("off"), (col("n") + 1).alias("pos"), col("tail").alias("line"))
    val body = parts
      .select(col("off"), posexplode(col("mids")).as(Seq("i", "line")))
      .select(col("off"), (col("i") + 1).cast("long").alias("pos"), col("line"))
    stitched.unionByName(body).unionByName(finalTail)
      .filter(length(col("line")) > 0)
      .select(concat(lit(s"$path@"), col("off")).alias("file"),
        col("pos"), col("line"))
  }

  /** One shard's bytes → (file, pos, line) rows, shared by the batch and
    * streaming shard readers so their decode contracts can never drift.
    * Sniff first; suffix fallback for brotli (no magic to sniff);
    * dictionary-compressed zstd retries against the shared dictionary.
    * CONTRACT: a shard that decodes to null — corrupt bytes, a decoded
    * size past the 64 MB per-file envelope, or a dict-zstd shard without
    * its dictionary — is DROPPED WHOLESALE (a WARN with the path goes to
    * the executor log). Audit `input_file_name`/file counts after a read
    * if shard completeness matters more than scan resilience.
    */
  private def decodeJsonlLines(path: String, bytes: Array[Byte],
      zstdDict: Option[Array[Byte]]): Iterator[(String, Long, String)] = {
    val plain = Compression.sniffCodec(bytes)
      .orElse(Compression.codecForName(path)) match {
      case Some("zstd") =>
        val d = Compression.decode(bytes, "zstd")
        if (d != null) d
        else zstdDict.map(Zstd.decode(bytes, _)).orNull
      case Some(c) => Compression.decode(bytes, c)
      case None => bytes
    }
    if (plain == null) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"dropping undecodable jsonl shard: $path " +
          s"(${bytes.length} compressed bytes)")
      Iterator.empty
    } else {
      val text = new String(plain, java.nio.charset.StandardCharsets.UTF_8)
      text.split("\n", -1).iterator.filter(_.nonEmpty).zipWithIndex
        .map { case (line, idx) => (path, idx.toLong, line) }
    }
  }

  def readJsonlShards(spark: SparkSession, dir: String,
      zstdDict: Option[Array[Byte]] = None): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decodeJsonlLines(path, bytes, zstdDict)
      }
      .toDF("file", "pos", "line")
  }
}
