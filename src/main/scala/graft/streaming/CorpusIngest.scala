package graft.streaming

import graft.llmops.DedupOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Continuous corpus ingestion with near-duplicate control — the
  * streaming composition of [[DedupOps.minhashDedupAgainstCorpus]]:
  * every micro-batch is near-dup-screened within itself and against the
  * corpus accumulated so far, and only the survivors are appended.
  *
  * This is the production shape for keeping a growing training corpus
  * near-dup-free without ever reprocessing it: per batch, the corpus
  * contributes only narrow MinHash band rows (on a real deployment,
  * maintained as a signature store alongside the corpus — exactly the
  * table this recomputes from text; persisting it is an IO optimization,
  * not a protocol change), candidates join on band keys, and corpus text
  * is touched only for verification candidates. State lives entirely in
  * the corpus table — no Spark state store, so restarting the query is
  * safe and the checkpoint only tracks source offsets.
  */
object CorpusIngest {

  /** Run `f` under the per-corpus ingest lease when a [[LockStore]] is
    * given (multi-writer serialization — appends and store compaction
    * share ONE lock name per corpus), plainly otherwise. All four
    * ingest/compaction entry points route through here so a lease-naming
    * or staleness change cannot silently desynchronize one of them.
    */
  private def withIngestLock[A](
      lockStore: Option[graft.operators.LockStore],
      corpusPath: String)(f: => A): A = lockStore match {
    case Some(store) =>
      val lease = graft.operators.StoreLease.acquire(
        store, corpusPath + "__ingest_lock",
        graft.operators.MergeUpsert.DefaultLeaseStaleMs)
      try f finally lease.release()
    case None => f
  }

  /** One micro-batch: drop within-batch near-dups (keep the lowest key of
    * each candidate pair — for chains this keeps the first element, the
    * standard greedy pass; cluster-exact keep-one is
    * [[DedupOps.dedupByClusters]], overkill per micro-batch), then drop
    * near-dups of the existing corpus, then append survivors.
    *
    * @return number of rows appended
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      textCol: String,
      keyCol: String,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      /** Path of a persistent signature store in the
        * [[DedupOps.minhashBandRows]] schema. When given, corpus
        * signatures are READ, not recomputed — the screen costs O(batch)
        * instead of O(corpus) per batch — and survivors' band rows are
        * appended alongside the text, keeping the store in lockstep.
        * Omitting it re-signs the corpus each batch (fine for small
        * corpora; never at 100 TB). Append-per-batch accumulates small
        * files; compact periodically with
        * [[graft.operators.Maintenance.optimize]], same as any table.
        */
      signaturePath: Option[String] = None,
      /** Serializes the screen-and-append cycle when more than one ingest
        * process feeds the same corpus — without it, concurrent batches
        * both screen against the pre-append corpus and a near-dup pair
        * split across them lands twice. A single streaming query (the
        * normal deployment: foreachBatch runs batches sequentially) does
        * not need it.
        */
      lockStore: Option[graft.operators.LockStore] = None,
      /** Quality gate run on the batch's DEDUP SURVIVORS before they
        * append: compose judge scoring ([[graft.llmops.LlmScore
        * .scoreColumn]]), embeddings ([[graft.llmops.Embeddings]]), LM
        * quality ([[graft.llmops.TextAnalysis.lmQualityScore]]) and a
        * keep-filter here — a real curation pipeline filters DURING
        * ingest, not after. Running after the near-dup screen means the
        * expensive client stages only ever see documents that would
        * actually land. Retry and dead-batch policy are whatever the
        * batched-client operators inside the gate were built with; a
        * crash-replayed micro-batch re-runs its gate, but the screen has
        * already dropped the batch's appended rows as self-duplicates,
        * so replay appends nothing twice (same idempotency as the
        * ungated path). Columns the gate appends (scores, rationales,
        * embeddings) land in the corpus table — use one consistent gate
        * per corpus so the schema stays stable.
        */
      qualityGate: Option[DataFrame => DataFrame] = None
  ): Long = {
    withIngestLock(lockStore, corpusPath) {
      ingestBatchUnlocked(spark, batch, corpusPath, textCol, keyCol,
          wordShingleN, numHashes, bands, threshold, signaturePath,
          qualityGate)
    }
  }

  /** Signature-store adoption: when `signaturePath` is enabled on a
    * corpus that predates it (or the store was lost), backfill the store
    * ONCE from corpus content — a missing store must neither crash every
    * batch (PATH_NOT_FOUND) nor be created empty, which would silently
    * skip screening against the whole pre-existing corpus. The backfill
    * writes to a temp dir and publishes by rename, so a crashed backfill
    * never leaves a half-store that later batches would trust.
    */
  private def ensureStore(spark: SparkSession, sigPath: String,
      backfill: => DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(sigPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"signature store $sigPath absent for an existing corpus — " +
          "backfilling once from corpus content")
      val tmp = new org.apache.hadoop.fs.Path(
        sigPath + ".__backfill-" + java.util.UUID.randomUUID().toString.take(8))
      backfill.write.parquet(tmp.toString)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, true) // lost a race with a concurrent backfill
        ()
      }
    }
  }

  private def ingestBatchUnlocked(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      textCol: String,
      keyCol: String,
      wordShingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      signaturePath: Option[String],
      qualityGate: Option[DataFrame => DataFrame]
  ): Long = {
    // within-batch: every doc named as the greater key of a verified
    // near-dup pair is dropped
    val pairs = DedupOps.minhashNearDups(batch, textCol, keyCol,
      numHashes = numHashes, bands = bands, threshold = threshold,
      wordShingleN = Some(wordShingleN))
    val laterDups = pairs.select(col("key_b").alias("__dup")).distinct()
    val batchUnique = batch.join(laterDups,
      col(keyCol) === col("__dup"), "left_anti")

    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val corpusExists = fs.exists(new org.apache.hadoop.fs.Path(corpusPath))
    val survivors =
      if (!corpusExists) batchUnique
      else signaturePath match {
        case Some(sigPath) =>
          ensureStore(spark, sigPath,
            DedupOps.minhashBandRows(spark.read.parquet(corpusPath),
              textCol, keyCol, keyCol, wordShingleN, numHashes, bands))
          DedupOps.minhashDedupAgainstSignatures(
            batchUnique, textCol, keyCol,
            spark.read.parquet(sigPath)
              .select(col(keyCol).alias("__ckey"), col("band"), col("band_hash")),
            spark.read.parquet(corpusPath).select(
              col(keyCol).alias("__ckey"), col(textCol).alias("__ctxt")),
            wordShingleN, numHashes, bands, threshold)
        case None =>
          DedupOps.minhashDedupAgainstCorpus(
            batchUnique, textCol, keyCol,
            spark.read.parquet(corpusPath).select(
              col(keyCol).alias("__corpus_key"), col(textCol).alias("__corpus_text")),
            "__corpus_key", "__corpus_text",
            wordShingleN, numHashes, bands, threshold)
      }

    // the quality gate sees only dedup survivors (client calls are the
    // cost center — never judge a doc the screen already rejected)
    val gated = qualityGate.map(_(survivors)).getOrElse(survivors)
    // materialize before the append: the survivor plan reads the corpus
    // dir this write appends to — pinning rows in the block cache keeps
    // the write action from re-scanning a directory it is growing
    val pinned = gated
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = pinned.count()
      if (n > 0) {
        // SIGNATURES FIRST, corpus second — the crash-window analysis:
        // the two appends cannot be atomic, and a replayed batch is
        // screened through band candidates VERIFIED against corpus text.
        // Crash between sig and corpus append → replay finds its own
        // band rows but no text to verify against → rows survive → the
        // corpus append completes (benign duplicate sig rows, no data
        // loss). The other order is the bad one: crash between corpus
        // and sig append → replay finds NO band candidates → the whole
        // batch re-appends → permanent duplicate corpus rows.
        signaturePath.foreach { sigPath =>
          DedupOps.minhashBandRows(pinned, textCol, keyCol, keyCol,
              wordShingleN, numHashes, bands)
            .write.mode(SaveMode.Append).parquet(sigPath)
        }
        pinned.write.mode(SaveMode.Append).parquet(corpusPath)
      }
      n
    } finally {
      pinned.unpersist()
      ()
    }
  }

  /** Image micro-batch ingestion — the multimodal twin of [[ingestBatch]]:
    * within-batch dHash near-dup screen (keep the lowest key of each
    * candidate pair, same greedy pass), then the store screen via
    * [[graft.llmops.Multimodal.imageDedupAgainstSignatures]], then append
    * survivors to the corpus and their (key, dhash) rows to the
    * signature store. Cheaper than the text path in exactly the way
    * images should be: the store holds 16 bytes per image, there is no
    * verification join (the hash IS the verification), and corpus
    * content is never reread when `signaturePath` is set (None falls
    * back to hashing corpus content each batch —
    * [[graft.llmops.Multimodal.imageDedupAgainstCorpus]] — fine for
    * small corpora, not the 100 TB path).
    *
    * Restart safety mirrors the text path: signatures append BEFORE the
    * corpus, and the store is semi-joined to the corpus's actual keys at
    * screen time — a crash between the appends leaves orphan store rows
    * that cannot suppress the replayed batch (which correctly
    * re-appends), while a fully-landed batch's replay matches its stored
    * copies (Hamming 0) and drops out. Undecodable rows carry no
    * signature and would re-append on replay — the same caveat the text
    * path has for unshingleable docs. Screen them out with the
    * `qualityGate` if the corpus must be images-only.
    *
    * @return number of rows appended
    */
  /** A 64-bit-fingerprint modality for binary ingestion — how to screen
    * a batch of (key, content) rows. One implementation per fingerprint
    * family; the ingestion protocol itself is shared.
    */
  private trait BinaryScreen {
    /** Signature-store column (after `key`), e.g. `dhash` / `ahash`. */
    def sigCol: String
    def signatures(df: DataFrame, keyCol: String, contentCol: String): DataFrame
    def nearDups(df: DataFrame, keyCol: String, contentCol: String,
        maxDist: Int): DataFrame
    def dedupAgainstSignatures(batch: DataFrame, keyCol: String,
        contentCol: String, sigs: DataFrame, maxDist: Int): DataFrame
    def dedupAgainstCorpus(batch: DataFrame, keyCol: String,
        contentCol: String, corpus: DataFrame, maxDist: Int): DataFrame
  }

  private object ImageScreen extends BinaryScreen {
    private val M = graft.llmops.Multimodal
    def sigCol = "dhash"
    def signatures(df: DataFrame, k: String, c: String) = M.imageSignatures(df, k, c)
    def nearDups(df: DataFrame, k: String, c: String, d: Int) =
      M.imageNearDups(df, k, c, d)
    def dedupAgainstSignatures(b: DataFrame, k: String, c: String,
        s: DataFrame, d: Int) = M.imageDedupAgainstSignatures(b, k, c, s, d)
    def dedupAgainstCorpus(b: DataFrame, k: String, c: String,
        corpus: DataFrame, d: Int) =
      M.imageDedupAgainstCorpus(b, k, c, corpus, k, c, d)
  }

  private object AudioScreen extends BinaryScreen {
    private val M = graft.llmops.Multimodal
    def sigCol = "ahash"
    def signatures(df: DataFrame, k: String, c: String) = M.audioSignatures(df, k, c)
    def nearDups(df: DataFrame, k: String, c: String, d: Int) =
      M.audioNearDups(df, k, c, d)
    def dedupAgainstSignatures(b: DataFrame, k: String, c: String,
        s: DataFrame, d: Int) = M.audioDedupAgainstSignatures(b, k, c, s, d)
    def dedupAgainstCorpus(b: DataFrame, k: String, c: String,
        corpus: DataFrame, d: Int) =
      M.audioDedupAgainstCorpus(b, k, c, corpus, k, c, d)
  }

  /** The spectral audio screen — [[AudioScreen]] with the
    * frequency-domain fingerprint ([[graft.llmops.Multimodal.wavSpectralHash]]):
    * pick it when re-pitched/re-synthesized copies matter more than
    * re-gained ones; (key, shash) signature store.
    */
  private object SpectralAudioScreen extends BinaryScreen {
    private val M = graft.llmops.Multimodal
    def sigCol = "shash"
    def signatures(df: DataFrame, k: String, c: String) =
      M.audioSpectralSignatures(df, k, c)
    def nearDups(df: DataFrame, k: String, c: String, d: Int) =
      M.audioSpectralNearDups(df, k, c, d)
    def dedupAgainstSignatures(b: DataFrame, k: String, c: String,
        s: DataFrame, d: Int) =
      M.audioSpectralDedupAgainstSignatures(b, k, c, s, d)
    def dedupAgainstCorpus(b: DataFrame, k: String, c: String,
        corpus: DataFrame, d: Int) =
      M.audioSpectralDedupAgainstCorpus(b, k, c, corpus, k, c, d)
  }

  /** The video screen: multi-row signatures (one (key, fhash) per
    * decodable frame) and shared-frame-FRACTION semantics instead of a
    * Hamming radius — the protocol's `maxDist` is unused and the
    * threshold rides the screen instance. Everything else (keep-first
    * within batch, store screen, lockstep appends) is the shared
    * protocol untouched.
    */
  private final case class VideoScreen(minSharedFrac: Double,
      maxFramesPerVideo: Int = 0)
      extends BinaryScreen {
    private val M = graft.llmops.Multimodal
    def sigCol = "fhash"
    def signatures(df: DataFrame, k: String, c: String) =
      M.videoFrameSignatures(df, k, c, maxFramesPerVideo)
        .select(col("key"), col("fhash"))
    def nearDups(df: DataFrame, k: String, c: String, d: Int) =
      M.videoNearDups(df, k, c, minSharedFrac,
        maxFramesPerVideo = maxFramesPerVideo)
    def dedupAgainstSignatures(b: DataFrame, k: String, c: String,
        s: DataFrame, d: Int) =
      M.videoDedupAgainstSignatures(b, k, c, s, minSharedFrac,
        maxFramesPerVideo = maxFramesPerVideo)
    def dedupAgainstCorpus(b: DataFrame, k: String, c: String,
        corpus: DataFrame, d: Int) =
      M.videoDedupAgainstCorpus(b, k, c, corpus, k, c, minSharedFrac)
  }

  /** Shared binary-ingestion protocol: within-batch screen (keep the
    * lowest key of each near-dup pair), against-store screen, quality
    * gate on survivors, corpus + signature appends in lockstep, optional
    * multi-writer lock — identical for every fingerprint modality.
    */
  /** Code micro-batch ingestion — the shared protocol with the
    * comment-insensitive exact screen: a file drops when its CANONICAL
    * fingerprint (md5 of the comment-stripped, whitespace-collapsed,
    * lowercased text — [[graft.llmops.CodeCorpus.stripComments]] over
    * the extension/shebang language) already appears earlier in the
    * batch or in the corpus. The signature store holds (key, cfp) — 32
    * bytes/file, corpus file bytes never reread. Replay-idempotent:
    * a replayed file fingerprints identically and drops.
    * `requirePermissive` additionally gates on the license screen
    * BEFORE anything is admitted (the usual pretraining policy).
    *
    * Crash consistency (store-screened mode, `signaturePath` set): the
    * corpus and store appends cannot be atomic, so the store appends
    * FIRST and the screen semi-joins store rows to the corpus's actual
    * keys (one key-pruned columnar scan per batch). A crash between the
    * appends leaves orphan store rows that the semi-join ignores — the
    * replayed batch correctly re-appends (it never reached the corpus);
    * a crash after both appends replays into an exact-fingerprint match
    * and drops. Either way, replay neither loses rows nor duplicates
    * them. (With `signaturePath` unset the screen reads the corpus
    * itself and replay is idempotent outright.)
    */
  def ingestCodeBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      keyCol: String,
      pathCol: String,
      contentCol: String,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      requirePermissive: Boolean = false
  ): Long = {
    import graft.llmops.{CodeCorpus, TextAnalysis}
    def canonical(df: DataFrame): DataFrame =
      CodeCorpus.stripComments(
        df.withColumn("__lang",
          CodeCorpus.language(col(pathCol), col(contentCol))),
        contentCol, "__lang")
      .withColumn("cfp", TextAnalysis.fingerprint(col("code_nocomments")))
      .drop("__lang", "code_nocomments")
    def run(): Long = {
      val gated0 =
        if (requirePermissive)
          batch.filter(CodeCorpus.permissive(
            CodeCorpus.license(col(contentCol))))
        else batch
      // null-content rows are excluded wholesale: md5(null) = null, and
      // the dedup window would otherwise group EVERY null-content file
      // into one partition and silently keep exactly one of them — an
      // arbitrary survivor of unrelated files. A file with no content
      // has nothing to train on; dropping all of them is the honest,
      // deterministic posture
      val gated = gated0.filter(col(contentCol).isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cfp")).orderBy(col(keyCol))
      val batchUnique = canonical(gated)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val fs = new org.apache.hadoop.fs.Path(corpusPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val corpusExists = fs.exists(new org.apache.hadoop.fs.Path(corpusPath))
      val survivors =
        if (!corpusExists) batchUnique
        else {
          val refFps = (signaturePath match {
            case Some(sigPath) =>
              ensureStore(spark, sigPath,
                canonical(spark.read.parquet(corpusPath))
                  .select(col(keyCol).alias("key"), col("cfp")))
              // semi-join the store to the corpus's ACTUAL keys (one
              // key-pruned columnar scan): a crash between the store
              // append and the corpus append leaves orphan store rows
              // that must not suppress the replayed batch — that would
              // turn the crash into permanent data loss
              spark.read.parquet(sigPath)
                .join(spark.read.parquet(corpusPath)
                  .select(col(keyCol).alias("key")).distinct(),
                  Seq("key"), "left_semi")
            case None => canonical(spark.read.parquet(corpusPath))
          }).select(col("cfp").alias("__ref_fp")).distinct()
          batchUnique.join(refFps, col("cfp") === col("__ref_fp"),
            "left_anti")
        }
      val pinned = survivors
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = pinned.count()
        if (n > 0) {
          // SIGNATURES FIRST: a crash between the appends leaves orphan
          // store rows, which the corpus-key semi-join above neutralizes
          // on replay (the batch re-appends — correct, it never reached
          // the corpus). The old corpus-first order made a replayed
          // batch invisible to its own fingerprints: wholesale duplicate
          // corpus rows.
          signaturePath.foreach { sigPath =>
            pinned.select(col(keyCol).alias("key"), col("cfp"))
              .write.mode(SaveMode.Append).parquet(sigPath)
          }
          pinned.drop("cfp").write.mode(SaveMode.Append).parquet(corpusPath)
        }
        n
      } finally {
        pinned.unpersist()
        ()
      }
    }
    withIngestLock(lockStore, corpusPath)(run())
  }

  private def ingestBinaryBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      maxDist: Int,
      signaturePath: Option[String],
      lockStore: Option[graft.operators.LockStore],
      qualityGate: Option[DataFrame => DataFrame],
      screen: BinaryScreen
  ): Long = {
    def run(): Long = {
      val pairs = screen.nearDups(batch, keyCol, contentCol, maxDist)
      val laterDups = pairs.select(col("key_b").alias("__dup")).distinct()
      val batchUnique = batch.join(laterDups,
        col(keyCol) === col("__dup"), "left_anti")

      val fs = new org.apache.hadoop.fs.Path(corpusPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val corpusExists = fs.exists(new org.apache.hadoop.fs.Path(corpusPath))
      val survivors =
        if (!corpusExists) batchUnique
        else signaturePath match {
          case Some(sigPath) =>
            ensureStore(spark, sigPath,
              screen.signatures(
                spark.read.parquet(corpusPath), keyCol, contentCol))
            // store semi-joined to the corpus's real keys: orphan store
            // rows from a crash between the two appends must not
            // suppress the replayed batch (see ingestCodeBatch)
            screen.dedupAgainstSignatures(batchUnique, keyCol, contentCol,
              spark.read.parquet(sigPath)
                .select(col("key"), col(screen.sigCol))
                .join(spark.read.parquet(corpusPath)
                  .select(col(keyCol).alias("key")).distinct(),
                  Seq("key"), "left_semi"),
              maxDist)
          case None =>
            screen.dedupAgainstCorpus(batchUnique, keyCol, contentCol,
              spark.read.parquet(corpusPath), maxDist)
        }

      val gated = qualityGate.map(_(survivors)).getOrElse(survivors)
      val pinned = gated
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = pinned.count()
        if (n > 0) {
          // SIGNATURES FIRST — same crash analysis as ingestCodeBatch:
          // orphan store rows are neutralized by the corpus-key
          // semi-join; corpus-first re-appended a replayed batch
          // wholesale (permanent duplicates)
          signaturePath.foreach { sigPath =>
            screen.signatures(pinned, keyCol, contentCol)
              .write.mode(SaveMode.Append).parquet(sigPath)
          }
          pinned.write.mode(SaveMode.Append).parquet(corpusPath)
        }
        n
      } finally {
        pinned.unpersist()
        ()
      }
    }
    withIngestLock(lockStore, corpusPath)(run())
  }

  def ingestImageBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      maxDist: Int = 3,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      qualityGate: Option[DataFrame => DataFrame] = None
  ): Long =
    ingestBinaryBatch(spark, batch, corpusPath, contentCol, keyCol,
      maxDist, signaturePath, lockStore, qualityGate, ImageScreen)

  /** Audio micro-batch ingestion — [[ingestImageBatch]] with the
    * envelope-hash screen: same protocol, same replay-idempotency for
    * decodable clips, (key, ahash) signature store.
    */
  def ingestAudioBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      maxDist: Int = 3,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      qualityGate: Option[DataFrame => DataFrame] = None,
      /** `true` screens on the spectral fingerprint (pitch-sensitive,
        * (key, shash) store) instead of the energy envelope — keep one
        * choice per store, the two hash spaces don't mix.
        */
      spectral: Boolean = false
  ): Long =
    ingestBinaryBatch(spark, batch, corpusPath, contentCol, keyCol,
      maxDist, signaturePath, lockStore, qualityGate,
      if (spectral) SpectralAudioScreen else AudioScreen)

  /** Video micro-batch ingestion — the shared protocol with the
    * frame-signature screen: a batch video drops when its shared
    * distinct frame hashes reach `minSharedFrac` of the smaller side
    * against the batch or the store. The signature store holds
    * (key, fhash) per frame — 16 bytes/frame, corpus video bytes never
    * reread. Replay-idempotent: a replayed video shares every frame
    * with its stored copy (fraction 1.0) and drops.
    */
  def ingestVideoBatch(
      spark: SparkSession,
      batch: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      minSharedFrac: Double = 0.5,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      qualityGate: Option[DataFrame => DataFrame] = None,
      /** > 0 bounds per-video decode/signature work to n uniformly
        * sampled frames ([[graft.llmops.Multimodal.sampleFrames]]) —
        * keep one choice per signature store, sampled and exact frame
        * universes measure shared fractions differently.
        */
      maxFramesPerVideo: Int = 0
  ): Long =
    ingestBinaryBatch(spark, batch, corpusPath, contentCol, keyCol,
      0, signaturePath, lockStore, qualityGate,
      VideoScreen(minSharedFrac, maxFramesPerVideo))

  /** Structured-Streaming wrapper for [[ingestVideoBatch]]. */
  def ingestVideoStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      checkpointDir: String,
      minSharedFrac: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      signaturePath: Option[String] = None,
      compactEveryBatches: Option[Int] = None,
      compactTargetFileMB: Int = 128,
      qualityGate: Option[DataFrame => DataFrame] = None,
      maxFramesPerVideo: Int = 0
  ): StreamingQuery =
    binaryStream(spark, stream, corpusPath, contentCol, keyCol,
      checkpointDir, 0, trigger, signaturePath, compactEveryBatches,
      compactTargetFileMB, qualityGate,
      VideoScreen(minSharedFrac, maxFramesPerVideo))

  /** Structured-Streaming wrapper for [[ingestImageBatch]] — foreachBatch
    * per micro-batch, optional periodic [[compactStores]], exactly the
    * [[ingestStream]] wiring with the image screen swapped in.
    */
  def ingestImageStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      checkpointDir: String,
      maxDist: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      signaturePath: Option[String] = None,
      compactEveryBatches: Option[Int] = None,
      compactTargetFileMB: Int = 128,
      qualityGate: Option[DataFrame => DataFrame] = None
  ): StreamingQuery =
    binaryStream(spark, stream, corpusPath, contentCol, keyCol,
      checkpointDir, maxDist, trigger, signaturePath, compactEveryBatches,
      compactTargetFileMB, qualityGate, ImageScreen)

  /** Structured-Streaming wrapper for [[ingestAudioBatch]]. */
  def ingestAudioStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      checkpointDir: String,
      maxDist: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      signaturePath: Option[String] = None,
      compactEveryBatches: Option[Int] = None,
      compactTargetFileMB: Int = 128,
      qualityGate: Option[DataFrame => DataFrame] = None,
      spectral: Boolean = false
  ): StreamingQuery =
    binaryStream(spark, stream, corpusPath, contentCol, keyCol,
      checkpointDir, maxDist, trigger, signaturePath, compactEveryBatches,
      compactTargetFileMB, qualityGate,
      if (spectral) SpectralAudioScreen else AudioScreen)

  private def binaryStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      contentCol: String,
      keyCol: String,
      checkpointDir: String,
      maxDist: Int,
      trigger: Trigger,
      signaturePath: Option[String],
      compactEveryBatches: Option[Int],
      compactTargetFileMB: Int,
      qualityGate: Option[DataFrame => DataFrame],
      screen: BinaryScreen
  ): StreamingQuery = {
    compactEveryBatches.foreach(n =>
      require(n > 0, "compactEveryBatches must be positive"))
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBinaryBatch(spark, batch, corpusPath, contentCol, keyCol,
          maxDist, signaturePath, None, qualityGate, screen)
        compactEveryBatches.foreach { n =>
          if ((batchId + 1) % n == 0)
            compactStores(spark, corpusPath, signaturePath, compactTargetFileMB)
        }
        ()
      }
      .start()
  }

  /** Compact the corpus table and (when present) its signature store —
    * the periodic maintenance pass for append-per-batch small-file
    * accumulation. Pure IO: rewrites the same rows into ~targetFileMB
    * files via [[graft.operators.Maintenance.compact]], so screen
    * results are identical before and after (spec-asserted). Run it
    * between batches (the [[ingestStream]] wiring below) or under the
    * same [[ingestBatch]] lock when multiple writers share the corpus.
    */
  def compactStores(
      spark: SparkSession,
      corpusPath: String,
      signaturePath: Option[String] = None,
      targetFileMB: Int = 128,
      /** When multiple writers share the corpus via [[ingestBatch]]'s
        * `lockStore`, pass the SAME store here: compaction takes the same
        * `__ingest_lock`, so its directory swap never races an append.
        */
      lockStore: Option[graft.operators.LockStore] = None
  ): Unit = {
    def run(): Unit = {
      graft.operators.Maintenance.compact(spark, corpusPath, targetFileMB)
      signaturePath.foreach(p =>
        graft.operators.Maintenance.compact(spark, p, targetFileMB))
    }
    withIngestLock(lockStore, corpusPath)(run())
  }

  /** Structured-Streaming wrapper: [[ingestBatch]] per micro-batch via
    * foreachBatch, the same Delta-style pattern as
    * [[IncrementalRunner.runStream]].
    *
    * `compactEveryBatches = Some(n)` runs [[compactStores]] after every
    * n-th micro-batch — foreachBatch batches are sequential, so the
    * compaction swap never races the single writer's own appends.
    */
  def ingestStream(
      spark: SparkSession,
      stream: DataFrame,
      corpusPath: String,
      textCol: String,
      keyCol: String,
      checkpointDir: String,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      trigger: Trigger = Trigger.AvailableNow(),
      signaturePath: Option[String] = None,
      compactEveryBatches: Option[Int] = None,
      compactTargetFileMB: Int = 128,
      /** See [[ingestBatch]]'s `qualityGate`: the in-stream judge /
        * embedding / LM-score screen, run per micro-batch on dedup
        * survivors.
        */
      qualityGate: Option[DataFrame => DataFrame] = None
  ): StreamingQuery = {
    compactEveryBatches.foreach(n =>
      require(n > 0, "compactEveryBatches must be positive"))
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, corpusPath, textCol, keyCol,
          wordShingleN, numHashes, bands, threshold, signaturePath,
          qualityGate = qualityGate)
        compactEveryBatches.foreach { n =>
          if ((batchId + 1) % n == 0)
            compactStores(spark, corpusPath, signaturePath, compactTargetFileMB)
        }
        ()
      }
      .start()
  }
}
