package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC web-archive surface: the crawl-ingestion arm of the document
  * family — raw (or gzipped) WARC bytes → per-response rows → main
  * content, all inside the scan projection.
  *
  * Reference semantics anchor: heterogeneous document ingestion
  * (cdk-datalake-ingest-upeu aje_libs/documents/helpers/
  * document_processor.py handles uploads one-at-a-time); WARC is the
  * corpus-scale web-crawl analogue of the same extract step.
  */
object Warc {

  /** Native parse: `array<struct<warc_type, target_uri, warc_date,
    * http_status, mime, payload>>`, NULL for non-WARC/malformed bytes
    * ([[graft.expressions.WarcRecords]]).
    */
  def warcRecords(content: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WarcRecords(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** One parse pass exploded to per-record rows — the shared projection
    * every reader derives from (keeping the WarcRecords struct schema in
    * ONE place). `(key, rec, warc_type, target_uri, warc_date,
    * http_status, mime, payload)`, unfiltered.
    */
  private def explodedRecords(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    df.select(col(keyCol), posexplode(warcRecords(col(contentCol))))
      .select(col(keyCol), col("pos").as("rec"),
        col("col.warc_type").as("warc_type"),
        col("col.target_uri").as("target_uri"),
        col("col.warc_date").as("warc_date"),
        col("col.http_status").as("http_status"),
        col("col.mime").as("mime"),
        col("col.payload").as("payload"))

  /** The shared record-type → page_text projection (conversion = WET
    * UTF-8 passthrough; HTML through the main-content extractor; other
    * text mimes byte-transparent latin-1; binary NULL).
    */
  private def pageTextCol(minWords: Int): Column =
    when(lower(col("warc_type")) === "conversion",
      decode(col("payload"), "UTF-8"))
      .when(isHtmlMime(col("mime")),
        Html.mainContentCol(col("payload"), minWords = minWords))
      .when(isTextMime(col("mime")), decode(col("payload"), "ISO-8859-1"))

  /** One row per HTTP-response record: (key, rec, target_uri, warc_date,
    * http_status, mime, payload). Non-response records (warcinfo,
    * request, metadata) are filtered out AFTER the parse, so a malformed
    * archive still refuses as zero rows for its key rather than a
    * partial view. `rec` is the record's position in the archive.
    */
  def warcResponses(df: DataFrame, keyCol: String, contentCol: String): DataFrame =
    explodedRecords(df, keyCol, contentCol)
      .filter(lower(col("warc_type")) === "response")

  /** `true` for mimes whose payload may become page text: HTML/XHTML
    * (routed through the main-content extractor) and `text`-prefixed mimes (decoded
    * byte-transparent). Everything else — images, PDFs, audio, NULL
    * Content-Type — must NOT be latin-1-decoded into mojibake "pages"
    * that pass length screens and pollute a corpus; those rows keep
    * their metadata with NULL text (route binaries to the media
    * ingestion arms instead — [[curateCrawlMedia]]).
    */
  private[llmops] def isHtmlMime(mime: Column): Column =
    lower(mime).isin("text/html", "application/xhtml+xml")

  private[llmops] def isTextMime(mime: Column): Column =
    isHtmlMime(mime) || lower(mime).startsWith("text/")

  /** Crawl → text: HTML response bodies through the readability-style
    * main-content extractor; other `text`-prefixed responses pass their body
    * as latin-1 text (byte-transparent); binary mimes (and absent
    * Content-Type) yield NULL `page_text` — never mojibake. Pure
    * per-row projections.
    */
  def warcPages(df: DataFrame, keyCol: String, contentCol: String,
      minWords: Int = 1): DataFrame = {
    val resp = warcResponses(df, keyCol, contentCol)
    resp.withColumn("page_text",
      when(isHtmlMime(col("mime")),
        Html.mainContentCol(col("payload"), minWords = minWords))
        .when(isTextMime(col("mime")), decode(col("payload"), "ISO-8859-1")))
  }

  /** WET conversion records (the Common Crawl TEXT distribution — most
    * 100 TB-scale corpus builds start from WET, not the full WARC): one
    * row per `conversion` record, payload decoded as UTF-8 per the WET
    * convention. Same post-parse filter discipline as [[warcResponses]].
    */
  def wetTexts(df: DataFrame, keyCol: String, contentCol: String): DataFrame =
    explodedRecords(df, keyCol, contentCol)
      .withColumn("wet_text", decode(col("payload"), "UTF-8"))
      .drop("http_status", "payload")
      .filter(lower(col("warc_type")) === "conversion")

  /** Container-agnostic crawl text: ONE parse pass whose projection
    * splits on record type — `response` bodies go through the HTML
    * main-content extractor (other text-mime bodies byte-transparent
    * latin-1, binary mimes NULL — see [[isTextMime]]), `conversion`
    * records surface their pre-extracted UTF-8 text as-is.
    * A crawl's WARC and its WET distribution land in one schema
    * (`http_status` is NULL on the WET side — conversion records carry
    * no HTTP envelope), so every downstream stage (dedup, quality,
    * ingestion) is source-format-blind.
    */
  def crawlTexts(df: DataFrame, keyCol: String, contentCol: String,
      minWords: Int = 1): DataFrame =
    explodedRecords(df, keyCol, contentCol)
      .filter(lower(col("warc_type")).isin("response", "conversion"))
      .withColumn("page_text", pageTextCol(minWords))
      .drop("payload")

  /** Streaming arm of [[ingestCrawlBatch]]: a stream of (key, archive
    * bytes) — WARC or WET — micro-batched through the same keep-latest
    * → near-dup screen → append path via `foreachBatch`, with the same
    * replay-idempotency the batch form has (the signature store screens
    * re-delivered pages). The crawl twin of
    * [[graft.streaming.CorpusIngest.ingestAudioStream]].
    */
  def ingestCrawlStream(
      spark: org.apache.spark.sql.SparkSession,
      stream: DataFrame,
      keyCol: String,
      contentCol: String,
      corpusPath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      minTextChars: Int = 1,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      signaturePath: Option[String] = None,
      qualityGate: Option[DataFrame => DataFrame] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestCrawlBatch(spark, batch, keyCol, contentCol, corpusPath,
          minTextChars = minTextChars, wordShingleN = wordShingleN,
          numHashes = numHashes, bands = bands, threshold = threshold,
          signaturePath = signaturePath, qualityGate = qualityGate)
        ()
      }
      .start()

  /** The full crawl-curation front end, composed from this round's
    * parts as ONE dataflow: parse (WARC or WET) → text extraction →
    * HTML head metadata → canonical-aware URL keying (the page's
    * `rel=canonical` resolved against the capture URL, normalized) →
    * politeness and policy screens (RFC 9309 robots verdict from a
    * broadcast per-host table, `<meta robots>` noindex, UT1-style
    * domain blocklist) → keep-latest per canonical key. What's left is
    * exactly the rows a training corpus may use, with their metadata.
    *
    * Scale shape: everything except the robots broadcast join and the
    * final keep-latest window (one shuffle, on the canonical key) is a
    * scan projection; the blocklist rides the task binary.
    *
    * Screen semantics: rows whose URL refuses to parse drop (no key to
    * dedup on); absent robots hosts and NULL robots default open;
    * `honorNoindex`/`canonicalKeys` opt out of the HTML-metadata
    * stages (WET conversion records carry no HTML and never noindex).
    */
  def curateCrawl(
      archives: DataFrame,
      keyCol: String,
      contentCol: String,
      robots: Option[DataFrame] = None,
      blockedDomains: Set[String] = Set.empty,
      agent: String = "*",
      honorNoindex: Boolean = true,
      canonicalKeys: Boolean = true,
      minTextChars: Int = 1,
      minWords: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val U = UrlCuration
    val recs = explodedRecords(archives, keyCol, contentCol)
      .filter(lower(col("warc_type")).isin("response", "conversion"))
    val isHtml = lower(col("warc_type")) === "response" &&
      isHtmlMime(col("mime"))
    val withMeta = recs
      .withColumn("m", when(isHtml, Html.metaCol(col("payload"))))
      .withColumn("page_text", pageTextCol(minWords))
      .drop("payload")
      .withColumn("url_key",
        if (canonicalKeys)
          U.canonicalUrlKey(col("target_uri"), col("m.canonical"))
        else U.urlNormalize(col("target_uri")))
    val screened0 = robots match {
      case Some(r) => U.robotsScreen(withMeta, "target_uri", r, agent)
      case None => withMeta.withColumn("robots_allowed", lit(true))
    }
    val screened = screened0.withColumn("url_blocked",
      if (blockedDomains.isEmpty) lit(false)
      else coalesce(U.urlBlocked(col("target_uri"), blockedDomains),
        lit(false)))
    val kept = screened.filter(
      col("url_key").isNotNull &&
        !(col("robots_allowed") === false) &&
        !col("url_blocked") &&
        (if (honorNoindex) !coalesce(col("m.noindex"), lit(false))
        else lit(true)) &&
        col("page_text").isNotNull &&
        length(trim(col("page_text"))) >= minTextChars)
    val keepLatest = Window.partitionBy(col("url_key"))
      .orderBy(col("warc_date").desc_nulls_last, col("rec").desc)
    kept.withColumn("__rn", row_number().over(keepLatest))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("url_key"), col("target_uri"),
        col("warc_date"), col("http_status"), col("mime"),
        col("m.title").as("title"), col("m.description").as("description"),
        col("m.lang").as("lang"), col("page_text").as("text"))
  }

  /** Media routing of crawl responses — the binary complement of
    * [[crawlTexts]]: `response` records whose mime is `image/…`,
    * `audio/…` or `video/…`, keep-latest per normalized URL (a crawl
    * revisits media like it revisits pages), with `kind` = the mime's
    * top level. One parse pass + one keep-latest shuffle on the URL;
    * payload bytes stay opaque here — the per-format decoders in the
    * ingestion arms own refusal.
    */
  def crawlMedia(df: DataFrame, keyCol: String, contentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kind = split(lower(col("mime")), "/").getItem(0)
    val media = warcResponses(df, keyCol, contentCol)
      .filter(kind.isin("image", "audio", "video"))
      .withColumn("kind", kind)
      .withColumn("url",
        coalesce(UrlCuration.urlNormalize(col("target_uri")),
          col("target_uri")))
      .filter(col("url").isNotNull)
    val keepLatest = Window.partitionBy(col("url"))
      .orderBy(col("warc_date").desc_nulls_last, col("rec").desc)
    media.withColumn("__rn", row_number().over(keepLatest))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("url"), col("warc_date"),
        col("http_status"), col("mime"), col("kind"), col("payload"))
  }

  /** Crawl → media corpora: the [[crawlMedia]] routing fed into the
    * standard binary-ingestion protocol per modality
    * ([[graft.streaming.CorpusIngest.ingestImageBatch]]/
    * `ingestAudioBatch`/`ingestVideoBatch`) — within-batch near-dup
    * screen, against-store screen, corpus + signature appends, the
    * same replay idempotency the text arm has. Keys in each corpus are
    * the normalized URLs. Pass `None` for a modality to drop it.
    *
    * The routed frame is persisted once so the three modality filters
    * don't re-parse the archives three times.
    *
    * @return appended row count per kind ("image"/"audio"/"video")
    */
  def curateCrawlMedia(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      imageCorpusPath: Option[String] = None,
      audioCorpusPath: Option[String] = None,
      videoCorpusPath: Option[String] = None,
      maxDist: Int = 3,
      minSharedFrac: Double = 0.5,
      maxFramesPerVideo: Int = 0,
      imageSignaturePath: Option[String] = None,
      audioSignaturePath: Option[String] = None,
      videoSignaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None): Map[String, Long] = {
    val I = graft.streaming.CorpusIngest
    val media = crawlMedia(batch, keyCol, contentCol)
      .select(col("url"), col("warc_date"), col("http_status"),
        col("mime"), col("kind"), col("payload"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def arm(kind: String, run: DataFrame => Long): (String, Long) = {
        val rows = media.filter(col("kind") === kind).drop("kind")
        kind -> run(rows)
      }
      Map(
        arm("image", rows => imageCorpusPath.map(p =>
          I.ingestImageBatch(spark, rows, p, "payload", "url",
            maxDist = maxDist, signaturePath = imageSignaturePath,
            lockStore = lockStore)).getOrElse(0L)),
        arm("audio", rows => audioCorpusPath.map(p =>
          I.ingestAudioBatch(spark, rows, p, "payload", "url",
            maxDist = maxDist, signaturePath = audioSignaturePath,
            lockStore = lockStore)).getOrElse(0L)),
        arm("video", rows => videoCorpusPath.map(p =>
          I.ingestVideoBatch(spark, rows, p, "payload", "url",
            minSharedFrac = minSharedFrac,
            signaturePath = videoSignaturePath, lockStore = lockStore,
            maxFramesPerVideo = maxFramesPerVideo)).getOrElse(0L)))
    } finally {
      media.unpersist()
      ()
    }
  }

  /** Streaming arm of [[curateCrawlMedia]]: a stream of (key, archive
    * bytes) micro-batched through the same per-modality screen-and-
    * append path via `foreachBatch`, replay-idempotent per modality
    * (each signature store screens re-delivered media). The media twin
    * of [[ingestCrawlStream]].
    */
  def curateCrawlMediaStream(
      spark: org.apache.spark.sql.SparkSession,
      stream: DataFrame,
      keyCol: String,
      contentCol: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      imageCorpusPath: Option[String] = None,
      audioCorpusPath: Option[String] = None,
      videoCorpusPath: Option[String] = None,
      maxDist: Int = 3,
      minSharedFrac: Double = 0.5,
      maxFramesPerVideo: Int = 0,
      imageSignaturePath: Option[String] = None,
      audioSignaturePath: Option[String] = None,
      videoSignaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateCrawlMedia(spark, batch, keyCol, contentCol,
          imageCorpusPath = imageCorpusPath,
          audioCorpusPath = audioCorpusPath,
          videoCorpusPath = videoCorpusPath,
          maxDist = maxDist, minSharedFrac = minSharedFrac,
          maxFramesPerVideo = maxFramesPerVideo,
          imageSignaturePath = imageSignaturePath,
          audioSignaturePath = audioSignaturePath,
          videoSignaturePath = videoSignaturePath,
          lockStore = lockStore)
        ()
      }
      .start()

  /** The crawl arm of corpus ingestion: archives (full WARC or WET —
    * [[crawlTexts]] is source-format-blind) → pages → one page per
    * URL (a crawl revisits; keep the LATEST by WARC-Date, record order
    * breaking exact ties) → the standard text near-dup screen-and-append
    * ([[graft.streaming.CorpusIngest.ingestBatch]]: within-batch screen,
    * corpus screen against the persistent signature store, survivors +
    * band rows appended). Keys in the corpus are the target URIs.
    *
    * Plan shape at scale: parse/extract are scan projections, the
    * URL keep-latest is one shuffle on the URL, and the screen costs
    * O(batch) against a signature store — the corpus is never rescanned.
    *
    * @return rows appended
    */
  def ingestCrawlBatch(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      corpusPath: String,
      minTextChars: Int = 1,
      wordShingleN: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.6,
      signaturePath: Option[String] = None,
      lockStore: Option[graft.operators.LockStore] = None,
      qualityGate: Option[DataFrame => DataFrame] = None): Long = {
    import org.apache.spark.sql.expressions.Window
    val pages = crawlTexts(batch, keyCol, contentCol)
      .filter(col("target_uri").isNotNull &&
        col("page_text").isNotNull &&
        length(trim(col("page_text"))) >= minTextChars)
    val keepLatest = Window.partitionBy(col("target_uri"))
      .orderBy(col("warc_date").desc_nulls_last, col("rec").desc)
    val perUrl = pages
      .withColumn("__rn", row_number().over(keepLatest))
      .filter(col("__rn") === 1)
      .select(col("target_uri").as("url"),
        col("warc_date"), col("http_status"), col("mime"),
        col("page_text").as("text"))
    graft.streaming.CorpusIngest.ingestBatch(spark, perUrl, corpusPath,
      textCol = "text", keyCol = "url",
      wordShingleN = wordShingleN, numHashes = numHashes, bands = bands,
      threshold = threshold, signaturePath = signaturePath,
      lockStore = lockStore, qualityGate = qualityGate)
  }

  /** [[graft.expressions.CdxRecords]] as a Column. */
  def cdxRecords(content: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CdxRecords(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** SPLITTABLE `.warc.gz` reads — the storage convention of the big
    * public crawls is per-record gzip members concatenated into ~1 GB
    * archive files, and a gzip file is not splittable by generic means:
    * naïvely, one archive = one task, and a 1000-executor cluster reads
    * a 100 TB crawl on a few hundred cores. But per-record members ARE
    * independently decodable, so this reader makes the file splittable:
    *
    *  1. byte-range tasks (default 32 MB) scan their range for gzip
    *     member headers (`1f 8b 08`, reserved FLG bits zero) — cheap
    *     candidates, false positives expected at ~1 per 2^27 bytes;
    *  2. a task's FIRST member is the first candidate ≥ its range start
    *     that FULLY inflates with a verified CRC-32 + ISIZE trailer — a
    *     false positive surviving that check would need a 64-bit
    *     coincidence, so task starts are effectively exact;
    *  3. from there members decode SEQUENTIALLY (each member's end
    *     position is known after its trailer — no more scanning) until
    *     the range end; a member straddling the boundary belongs to the
    *     task where it STARTED, so every member lands exactly once.
    *
    * Accepts a single file, a glob, or a directory (a crawl bucket of
    * thousands of archives fans out into one range list). Returns one
    * row per member: (path, offset, content = the decoded record
    * bytes), ready for [[warcRecords]]/[[warcResponses]]/[[crawlTexts]]
    * — the whole crawl family becomes archive-splittable with no other
    * change. Members over 64 MB decoded, corrupt mid-range members stop
    * that task's walk (partial archives degrade, never mis-parse).
    * Plain (single-stream) `.warc.gz` or uncompressed WARCs have no
    * member boundaries to find: they fall back to one member per file.
    */
  def splitArchiveMembers(spark: org.apache.spark.sql.SparkSession,
      pathOrGlob: String, rangeBytes: Int = 32 << 20): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= (1 << 16), "rangeBytes must be at least 64 KiB")
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ranges = archiveRanges(spark, pathOrGlob, rangeBytes)
    ranges.toDF("path", "len", "start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._4 - r._3).sum, rangeBytes.toLong))
      .as[(String, Long, Long, Long)]
      .flatMap { case (file, fileLen, start, end) =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(confB.value)
        val in = fs.open(p)
        try WarcSplit.walkRange(in, start, end, fileLen)
          .map { case (off, bytes) => (file, off, bytes) }.toSeq
        finally in.close()
      }
      .toDF("path", "offset", "content")
  }

  /** (path, fileLen, start, end) range rows for every file the glob
    * names — a crawl bucket of thousands of archives fans out into one
    * range list (file boundaries are natural range boundaries).
    */
  private def archiveRanges(spark: org.apache.spark.sql.SparkSession,
      pathOrGlob: String,
      rangeBytes: Int): Seq[(String, Long, Long, Long)] = {
    val p0 = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = {
      val globbed = fs.globStatus(p0)
      if (globbed == null || globbed.isEmpty)
        throw new java.io.FileNotFoundException(pathOrGlob)
      globbed.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
        else Array(st)
      }
    }
    for {
      st <- statuses.toSeq
      len = st.getLen
      start <- 0L until math.max(1L, len) by rangeBytes.toLong
    } yield (st.getPath.toString, len, start,
      math.min(start + rangeBytes, len))
  }

  /** Splittable `.warc.zst` (the IIPC convention: one zstd frame per
    * record, optionally a LEADING SKIPPABLE DICTIONARY FRAME, magic
    * 0x184D2A5D, whose payload — raw or itself zstd-compressed — is the
    * dictionary every record frame was compressed against). Same
    * exactly-once range discipline as [[splitArchiveMembers]]; the
    * 4-byte frame magic plus a full structural decode validates task
    * starts. `dict` overrides the archive's own dictionary frame.
    */
  def splitZstdArchiveMembers(spark: org.apache.spark.sql.SparkSession,
      pathOrGlob: String, rangeBytes: Int = 32 << 20,
      dict: Option[Array[Byte]] = None): DataFrame = {
    import spark.implicits._
    require(rangeBytes >= (1 << 16), "rangeBytes must be at least 64 KiB")
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val ranges = archiveRanges(spark, pathOrGlob, rangeBytes)
    val fs0 = new org.apache.hadoop.fs.Path(pathOrGlob)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-ARCHIVE dictionary: explicit param, else each file's leading
    // skippable dictionary frame (payload possibly zstd-wrapped)
    // lengths come from the already-listed ranges (no per-file re-find:
    // that was O(files × ranges)); head probes run through the bounded
    // driver pool — a crawl bucket of thousands of archives must not
    // serialize thousands of open/read round-trips on the driver
    val lenByPath: Map[String, Long] =
      ranges.map(r => r._1 -> r._2).toMap
    val dictByPath: Map[String, Array[Byte]] =
      DriverPar.parMap(ranges.map(_._1).distinct) { file =>
        val bytes = dict.getOrElse {
          val p = new org.apache.hadoop.fs.Path(file)
          val fileLen = lenByPath(file)
          val in = fs0.open(p)
          try {
            val head = new Array[Byte](8)
            if (fileLen >= 8) in.readFully(0L, head, 0, 8)
            val magic = (head(0) & 0xff) | ((head(1) & 0xff) << 8) |
              ((head(2) & 0xff) << 16) | ((head(3) & 0xff) << 24)
            val sz = (head(4) & 0xff) | ((head(5) & 0xff) << 8) |
              ((head(6) & 0xff) << 16) | ((head(7) & 0xff) << 24)
            if (fileLen >= 8 && magic == 0x184D2A5D && sz > 0 &&
              sz <= (64 << 20) && 8L + sz <= fileLen) {
              val raw = new Array[Byte](sz)
              in.readFully(8L, raw, 0, sz)
              val unwrapped = Zstd.decode(raw)
              if (unwrapped != null) unwrapped else raw
            } else null
          } finally in.close()
        }
        if (bytes != null && Zstd.parseDict(bytes) == null)
          throw new IllegalArgumentException(
            s"malformed zstd dictionary for $file")
        file -> bytes
      }.toMap
    val dictB = spark.sparkContext.broadcast(dictByPath)
    ranges.toDF("path", "len", "start", "end")
      .repartition(DriverPar.planPartitions(spark, ranges.size,
        ranges.map(r => r._4 - r._3).sum, rangeBytes.toLong))
      .as[(String, Long, Long, Long)]
      .flatMap { case (file, fileLen, start, end) =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(confB.value)
        val in = fs.open(p)
        val d = dictB.value.get(file).flatMap(Option(_))
          .map(Zstd.parseDict).orNull
        try WarcSplit.walkZstRange(in, start, end, fileLen, d)
          .map { case (off, bytes) => (file, off, bytes) }.toSeq
        finally in.close()
      }
      .toDF("path", "offset", "content")
  }

  /** Plan partition-pruned WARC fetches from CDXJ index shards — the
    * index IS the 100-TB navigation layer: instead of scanning archives,
    * filter the captures (status / mime / host predicates push into the
    * index scan), keep the LATEST capture per URL, and emit one row per
    * (archive file, byte offset, length) — grouped so a fetch task reads
    * each archive once, offsets sorted for sequential I/O. A pure
    * dataflow: explode + filter + keep-latest window; the only shuffle
    * is the per-URL dedup.
    */
  def planFetches(index: DataFrame, contentCol: String,
      statusAllow: Seq[Int] = Seq(200),
      mimePrefixes: Seq[String] = Seq("text/")): DataFrame = {
    val recs = index
      .select(explode(cdxRecords(col(contentCol))).as("r"))
      .select(col("r.surt").as("surt"), col("r.ts").as("ts"),
        col("r.url").as("url"), col("r.mime").as("mime"),
        col("r.status").as("status"), col("r.filename").as("filename"),
        col("r.offset").as("offset"), col("r.length").as("length"))
      .filter(col("filename").isNotNull && col("offset").isNotNull &&
        col("length").isNotNull)
      .filter(col("status").isin(statusAllow.map(Int.box): _*))
      .filter(mimePrefixes.map(p => col("mime").startsWith(p))
        .reduce(_ || _))
    val keepLatest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("ts").desc)
    recs.withColumn("__rn", row_number().over(keepLatest))
      .filter(col("__rn") === 1)
      .select(col("filename"), col("offset"), col("length"), col("url"),
        col("ts"), col("mime"))
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("offset"))
  }
}

/** Writer twin for [[Warc]] fixtures and tests: standards-shaped WARC/1.0
  * bytes from closed-form inputs — no clocks, no randomness, every byte
  * derivable by an external oracle. Supports the two real-world layouts:
  * raw concatenated records and per-record gzip members (the Common
  * Crawl convention).
  */
object WarcWriter {

  private val CRLF = "\r\n"

  def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    sb.append("Content-Length: ").append(payload.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head)
    out.write(payload)
    out.write(CRLF.getBytes); out.write(CRLF.getBytes)
    out.toByteArray
  }

  def warcinfo(date: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> date,
      "Content-Type" -> "application/warc-fields"),
      ("software: graft" + CRLF).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  def responseRecord(uri: String, date: String, status: Int, mime: String,
      body: Array[Byte]): Array[Byte] = {
    val statusText = if (status == 200) "OK" else "Status"
    val http = new java.io.ByteArrayOutputStream()
    http.write((s"HTTP/1.1 $status $statusText" + CRLF +
      s"Content-Type: $mime; charset=UTF-8" + CRLF +
      s"Content-Length: ${body.length}" + CRLF + CRLF)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    http.write(body)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "Content-Type" -> "application/http; msgtype=response"),
      http.toByteArray)
  }

  /** Response record whose entity headers and WIRE body the caller
    * controls — the fixture surface for `Transfer-Encoding: chunked` /
    * `Content-Encoding` tiers: pass the already-coded wire bytes plus
    * the headers that describe the coding.
    */
  def responseRecordWire(uri: String, date: String, status: Int,
      mime: String, extraHeaders: Seq[(String, String)],
      wireBody: Array[Byte]): Array[Byte] = {
    val statusText = if (status == 200) "OK" else "Status"
    val http = new java.io.ByteArrayOutputStream()
    val hs = new StringBuilder(s"HTTP/1.1 $status $statusText").append(CRLF)
    hs.append(s"Content-Type: $mime; charset=UTF-8").append(CRLF)
    extraHeaders.foreach { case (k, v) =>
      hs.append(k).append(": ").append(v).append(CRLF) }
    hs.append(s"Content-Length: ${wireBody.length}").append(CRLF).append(CRLF)
    http.write(hs.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    http.write(wireBody)
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "Content-Type" -> "application/http; msgtype=response"),
      http.toByteArray)
  }

  /** RFC 9112 chunked transfer coding of `body`: fixed-size chunks with
    * hex size lines, a zero chunk, optional trailer fields — the writer
    * twin of the reader's de-chunker.
    */
  def chunked(body: Array[Byte], chunkSize: Int = 7,
      trailer: Seq[(String, String)] = Nil): Array[Byte] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    def ascii(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    var pos = 0
    while (pos < body.length) {
      val n = math.min(chunkSize, body.length - pos)
      ascii(Integer.toHexString(n) + CRLF)
      out.write(body, pos, n)
      ascii(CRLF)
      pos += n
    }
    ascii("0" + CRLF)
    trailer.foreach { case (k, v) => ascii(s"$k: $v" + CRLF) }
    ascii(CRLF)
    out.toByteArray
  }

  /** IIPC-style `.warc.zst`: optional leading skippable DICTIONARY
    * frame (magic 0x184D2A5D; `compressDict` zstd-wraps the payload as
    * the reference tools do), then ONE zstd frame per record — the
    * layout [[Warc.splitZstdArchiveMembers]] recovers in parallel.
    * Frames come from the store-mode twin, so they decode with or
    * without the dictionary.
    */
  def writeZstMembers(entries: Seq[(String, String, Int, String, Array[Byte])],
      date: String = "2026-01-01T00:00:00Z",
      dict: Option[Array[Byte]] = None,
      compressDict: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    dict.foreach { d =>
      val payload = if (compressDict) Compression.encode(d, "zstd") else d
      out.write(Array[Byte](0x5D, 0x2A, 0x4D, 0x18))
      var v = payload.length
      for (_ <- 0 until 4) { out.write(v & 0xff); v >>= 8 }
      out.write(payload)
    }
    val records = warcinfo(date) +:
      entries.map { case (uri, d, status, mime, body) =>
        responseRecord(uri, if (d == null) date else d, status, mime, body)
      }
    records.foreach(r => out.write(Compression.encode(r, "zstd")))
    out.toByteArray
  }

  /** WET conversion record: pre-extracted page text, UTF-8, no HTTP
    * envelope — the Common Crawl text-distribution shape.
    */
  def conversionRecord(uri: String, date: String, text: String): Array[Byte] =
    record(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "Content-Type" -> "text/plain"),
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** A complete WET archive: warcinfo + one conversion record per
    * (uri, date, text) entry; `gzipMembers` as in [[write]].
    */
  def writeWet(entries: Seq[(String, String, String)],
      date: String = "2026-01-01T00:00:00Z",
      gzipMembers: Boolean = false): Array[Byte] = {
    val records = warcinfo(date) +: entries.map { case (uri, d, text) =>
      conversionRecord(uri, if (d == null) date else d, text)
    }
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      if (gzipMembers) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r); gz.finish()
      } else out.write(r)
    }
    out.toByteArray
  }

  /** A complete archive: warcinfo + one response per entry. With
    * `gzipMembers` each record becomes its own gzip member (deflate
    * level 6, no OS/mtime variance — `GZIPOutputStream` writes mtime 0).
    */
  def write(entries: Seq[(String, String, Int, String, Array[Byte])],
      date: String = "2026-01-01T00:00:00Z",
      gzipMembers: Boolean = false): Array[Byte] = {
    val records = warcinfo(date) +:
      entries.map { case (uri, d, status, mime, body) =>
        responseRecord(uri, if (d == null) date else d, status, mime, body)
      }
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      if (gzipMembers) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r); gz.finish()
      } else out.write(r)
    }
    out.toByteArray
  }
}
