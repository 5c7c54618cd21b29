package graft.llmops

/** Content-defined chunking (the FastCDC construction) — binary-level
  * dedup for corpus storage: shard files, checkpoints and re-crawled
  * payloads that differ by small edits share most of their chunks, so a
  * chunk-hash store deduplicates storage the way MinHash deduplicates
  * text. Boundaries come from the data (a gear rolling hash), so an
  * insertion early in a file shifts at most the chunks around the edit
  * — the property fixed-size blocking lacks. Reference hook: binary
  * document ingestion, `aje_libs/documents/helpers/document_processor
  * .py:10-83`; construction: the published FastCDC design (gear hash,
  * normalized chunking with a harder mask before the target size and an
  * easier one after, min/max clamps).
  *
  * Determinism: the gear table derives from splitmix64 of the byte
  * value — fixed forever, so chunk hashes are stable across runs and
  * stores. Chunk identity = XXH64 of the chunk bytes.
  */
object Cdc {

  /** splitmix64-derived 64-bit gear constants, one per byte value. */
  private[llmops] val gear: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var z = (i.toLong + 1L) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      t(i) = z ^ (z >>> 31)
      i += 1
    }
    t
  }

  final case class Chunk(offset: Long, size: Int, hash: Long)

  /** Chunk `bytes` with target sizes (minSize ≤ avgSize ≤ maxSize, avg a
    * power of two). Empty input → zero chunks; the whole input is
    * covered contiguously (sum of sizes = length).
    */
  def chunks(bytes: Array[Byte], minSize: Int = 2048, avgSize: Int = 8192,
      maxSize: Int = 65536): Array[Chunk] = {
    require(minSize > 0 && minSize <= avgSize && avgSize <= maxSize,
      s"cdc sizes $minSize/$avgSize/$maxSize")
    require((avgSize & (avgSize - 1)) == 0, s"avgSize $avgSize not a power of 2")
    if (bytes == null || bytes.length == 0) return Array.empty
    // normalized chunking: 4x harder mask before avg, 4x easier after
    val bits = java.lang.Long.numberOfTrailingZeros(avgSize.toLong)
    val maskHard = (1L << math.min(bits + 2, 48)) - 1
    val maskEasy = (1L << math.max(bits - 2, 1)) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Chunk](
      bytes.length / avgSize + 2)
    var start = 0
    while (start < bytes.length) {
      val remaining = bytes.length - start
      var cut = remaining // default: final chunk
      if (remaining > minSize) {
        val limit = math.min(remaining, maxSize)
        val normal = math.min(remaining, avgSize)
        var h = 0L
        var i = minSize
        var found = false
        // skip the first minSize bytes entirely (FastCDC's cut-point skip)
        while (i < limit && !found) {
          h = (h << 1) + gear(bytes(start + i) & 0xff)
          val mask = if (i < normal) maskHard else maskEasy
          if ((h & mask) == 0L) { cut = i + 1; found = true }
          i += 1
        }
        if (!found) cut = limit
      }
      out += Chunk(start.toLong, cut,
        XxHash.xxh64(bytes, start, cut, 0L))
      start += cut
    }
    out.toArray
  }

  /** [[graft.expressions.CdcChunks]] as a Column. */
  def chunksCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CdcChunks(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Corpus-level binary dedup report: one row of
    * (n_blobs, n_chunks, n_unique, total_bytes, unique_bytes, ratio).
    * One shuffle (the chunk-hash aggregate) — equal hashes mean equal
    * bytes for dedup purposes, so `unique_bytes` sums one size per hash.
    * This is the storage-dedup analogue of the text near-dup reports:
    * size the win before rewriting shards against a chunk store.
    */
  def chunkDedupStats(df: org.apache.spark.sql.DataFrame, keyCol: String,
      contentCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val chunks = df
      .select(col(keyCol).as("__k"),
        explode(chunksCol(col(contentCol))).as("c"))
      .select(col("__k"), col("c.size").as("size"), col("c.hash").as("hash"))
    val perHash = chunks.groupBy("hash")
      .agg(count(lit(1)).as("refs"), first(col("size")).as("size"))
    perHash.agg(
      sum(col("refs")).cast("long").as("n_chunks"),
      count(lit(1)).cast("long").as("n_unique"),
      sum(col("refs") * col("size")).cast("long").as("total_bytes"),
      sum(col("size")).cast("long").as("unique_bytes"))
      .withColumn("dedup_ratio",
        col("total_bytes").cast("double") / col("unique_bytes"))
  }

  /** Incremental binary near-dup screen against a persistent chunk
    * store: a blob whose chunk hashes overlap the store by at least
    * `maxSharedFrac` (byte-weighted) is a re-delivery/re-crawl of stored
    * content and DROPS; survivors' hashes append to the store. Returns
    * the surviving rows. The crawl-media signature-store pattern at the
    * binary-bytes tier: equi-join on chunk hash (one shuffle), never
    * all-pairs; the store is a plain parquet of (hash, size) so 100-TB
    * stores stay joinable, not broadcastable.
    */
  def chunkStoreScreen(df: org.apache.spark.sql.DataFrame, keyCol: String,
      contentCol: String, storePath: String,
      maxSharedFrac: Double = 0.8): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val chunks = df
      .select(col(keyCol).as("__k"),
        explode(chunksCol(col(contentCol))).as("c"))
      .select(col("__k"), col("c.hash").as("hash"), col("c.size").as("size"))
    val store: Option[org.apache.spark.sql.DataFrame] =
      try {
        val d = spark.read.parquet(storePath)
        if (d.columns.contains("hash")) Some(d.select("hash").distinct())
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    val shared = store match {
      case Some(st) =>
        chunks.join(st.withColumn("__hit", lit(1)), Seq("hash"), "left")
          .groupBy("__k")
          .agg((sum(when(col("__hit").isNotNull, col("size")).otherwise(0))
            .cast("double") / sum(col("size"))).as("__frac"))
      case None =>
        chunks.groupBy("__k").agg(lit(0.0).as("__frac"))
    }
    val keep = df.join(
      shared.filter(col("__frac") < maxSharedFrac).select(col("__k")),
      df(keyCol) === col("__k"), "inner").drop("__k")
    val keepChunks = keep
      .select(explode(chunksCol(col(contentCol))).as("c"))
      .select(col("c.hash").as("hash"), col("c.size").as("size"))
      .distinct()
    if (!keepChunks.isEmpty)
      keepChunks.write.mode("append").parquet(storePath)
    keep
  }
}
