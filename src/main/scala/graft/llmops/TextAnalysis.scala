package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for LLM training-data pipelines (the north-star
  * extension over the reference's document helpers,
  * aje_libs/documents/helpers/document_processor.py:10-83).
  *
  * Every operator is a pure Column composition (whole-stage codegen, no
  * UDFs) so a 100 TB corpus is one projection pass over the parquet scan
  * with full pushdown/pruning.
  */
object TextAnalysis {

  /** Whitespace tokenization — single-space convention of the corpus. */
  def tokens(text: Column): Column = split(text, " ")

  /** NULL text counts NULL, never the legacy size(NULL) = -1 this
    * engine's ANSI-off config would otherwise give — a -1 silently
    * shrinks every token-budget sum it enters.
    */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int")).otherwise(size(tokens(text)))

  /** BPE-ish regex tokenizer: letter runs, digit runs, single other glyphs.
    * The pattern is deliberately RE2-compatible so external validators
    * (e.g. a DuckDB oracle) compute the identical count.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeishTokenCount(text: Column): Column =
    // same NULL guard as tokenCount: legacy size(NULL) = -1 would
    // silently shrink every token-budget sum a NULL doc enters
    when(text.isNull, lit(null).cast("int"))
      .otherwise(size(regexp_extract_all(text, lit(BpeishPattern), lit(0))))

  /** Stopword lists for the n-gram/stopword language-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans")
  )

  /** Count of tokens that appear in `words` — native codegen'd kernel
    * ([[graft.expressions.TokenInSetCount]]); the HOF filter composition it
    * replaces runs interpreted on every row of a corpus scan.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TokenInSetCount(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), words))

  /** Interpreted HOF form of [[stopwordHits]] — spec-level reference. */
  def stopwordHitsHof(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  def stopwordRatio(text: Column, words: Seq[String]): Column =
    stopwordHits(text, words) / greatest(tokenCount(text), lit(1))

  /** Language-ID: argmax over per-language stopword hit counts with a
    * deterministic tie-break (en > es > de > fr by list order), 'und'
    * (undetermined) when no list scores.
    *
    * Prefer [[langIdFromTokens]] over a pre-tokenized column in wide scans —
    * it tokenizes once instead of once per language list.
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  def langIdFromTokens(toks: Column): Column = {
    val order = Seq("en", "es", "de", "fr")
    val scores = order.map(l =>
      l -> size(filter(toks, t => lower(t).isin(Stopwords(l): _*))))
    // fold: keep the first language with the strictly-highest score
    val best = scores.tail.foldLeft((lit("en"), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Corpus-scan language-ID: explode tokens once and count stopword hits
    * per language in a single codegen'd aggregation — the per-row
    * [[langId]] expression runs interpreted (higher-order functions) and
    * is 5-10× slower on a full-corpus scan.
    * Returns (keyCol, lang_pred).
    */
  def langIdByKey(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val order = Seq("en", "es", "de", "fr")
    val hitSums = order.map(l =>
      sum(when(lower(col("t")).isin(Stopwords(l): _*), 1).otherwise(0)).alias(s"s_$l"))
    val scored = df
      .select(col(keyCol), explode(tokens(col(textCol))).alias("t"))
      .groupBy(col(keyCol))
      .agg(hitSums.head, hitSums.tail: _*)
    val best = order.tail.foldLeft((lit("en"), col("s_en"))) {
      case ((bestLang, bestScore), lang) =>
        (when(col(s"s_$lang") > bestScore, lit(lang)).otherwise(bestLang),
          when(col(s"s_$lang") > bestScore, col(s"s_$lang")).otherwise(bestScore))
    }
    scored.select(col(keyCol),
      when(best._2 > 0, best._1).otherwise(lit("und")).alias("lang_pred"))
  }

  /** Quality-score features: length, token stats, stopword & punctuation
    * ratios — the standard cheap pre-filters for corpus curation.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        (length(t) - (nTok - lit(1))).cast("double") / greatest(nTok, lit(1)))
      .withColumn("stopword_ratio",
        stopwordHits(t, Stopwords("en")).cast("double") / greatest(nTok, lit(1)))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") /
          greatest(length(t), lit(1)))
  }

  /** Composite 0..1 quality score from the features. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      least(lit(1.0),
        (col("n_tokens").cast("double") / lit(50.0)) * lit(0.5) +
          when(col("stopword_ratio") > 0.01, lit(0.5)).otherwise(lit(0.0))))

  /** Gopher-style repetition/quality features (Rae et al. 2021 §A1.1, the
    * standard heuristic battery every large-corpus curation run applies
    * before model-based filtering): per-document word statistics that
    * expose machine-generated or boilerplate text — word count bounds,
    * mean word length bounds, vocabulary diversity (unique-word fraction),
    * and repetition (most-frequent-word fraction).
    *
    * Plan shape: one explode of the whitespace tokens, one two-level
    * partial-aggregated groupBy ((key, word) counts → per-key moments) —
    * the word-count shape, fully codegen'd, no window. `passes_quality`
    * applies the Gopher-flavored bounds; callers wanting different
    * thresholds filter on the feature columns directly.
    */
  def gopherQualityFeatures(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val words = df.select(col(keyCol), explode(split(col(textCol), " ")).alias("w"))
      .filter(length(col("w")) > 0)
    val perWord = words.groupBy(col(keyCol), col("w"))
      .agg(count(lit(1)).alias("c"))
    perWord.groupBy(col(keyCol))
      .agg(
        sum(col("c")).alias("n_words"),
        round(sum(length(col("w")) * col("c")).cast("double") / sum(col("c")), 4)
          .alias("mean_word_len"),
        round(count(lit(1)).cast("double") / sum(col("c")), 4)
          .alias("frac_unique_words"),
        round(max(col("c")).cast("double") / sum(col("c")), 4)
          .alias("top_word_frac"))
      .withColumn("passes_quality",
        col("n_words") >= 40 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_unique_words") >= 0.2 && col("top_word_frac") <= 0.2)
  }

  /** Gopher repetition signals (Rae et al. 2021 §A1.1, the n-gram half of
    * the battery next to [[gopherQualityFeatures]]'s word statistics):
    * per-document fraction of characters covered by the single most
    * frequent word `topN`-gram, and by all word `dupN`-grams occurring
    * more than once — the standard detectors for looped/boilerplate text.
    *
    * Plan shape: two explodes of native [[graft.expressions.WordNGrams]]
    * occurrence arrays, each into a (key, gram) partial-agg count (the
    * word-count shape); the document char length travels in the grouping
    * key (functionally dependent on it — free) so no join back to the
    * corpus is needed. The top gram is picked by a per-key window with a
    * deterministic (count desc, gram asc) tie-break. Documents with fewer
    * than `topN` words have no grams and are absent from the output.
    *
    * `dup_ngram_char_frac` approximates the paper's coverage fraction by
    * summing `count * length` over every occurrence of each duplicated
    * gram; overlapping occurrences (e.g. "a a a a a a") count shared
    * characters more than once, so the raw sum can exceed the document
    * length where the true union-of-spans coverage cannot. The value is
    * capped at 1.0 so thresholds calibrated against Gopher-paper numbers
    * (which are ≤ 1 by construction) stay usable; between the cap and the
    * over-count the metric is an upper bound on true coverage — an
    * acceptable bias for a DROP-side quality filter.
    */
  def gopherRepetitionSignals(df: DataFrame, keyCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5): DataFrame = {
    def grams(n: Int) = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col(textCol)),
        n, distinct = false))
    val base = df.select(col(keyCol), length(col(textCol)).alias("__chars"),
      grams(topN).alias("__gt"), grams(dupN).alias("__gd"))

    val topCounts = base
      .select(col(keyCol), col("__chars"), explode(col("__gt")).alias("g"))
      .groupBy(col(keyCol), col("__chars"), col("g"))
      .agg(count(lit(1)).alias("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("c").desc, col("g"))
    val top = topCounts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__chars"), col("g").alias("top_ngram"),
        col("c").alias("__tc"))

    val dup = base
      .select(col(keyCol), explode(col("__gd")).alias("g"))
      .groupBy(col(keyCol), col("g"))
      .agg(count(lit(1)).alias("c"))
      .filter(col("c") > 1)
      .groupBy(col(keyCol))
      .agg(sum(col("c") * length(col("g"))).alias("__dchars"))

    top.join(dup, Seq(keyCol), "left")
      .select(col(keyCol), col("top_ngram"),
        // capped at 1.0 like dup coverage: overlapping occurrences of
        // the top gram can cover more chars than the text holds, and
        // Gopher-calibrated thresholds assume fractions <= 1
        round(least(lit(1.0), col("__tc") * length(col("top_ngram")) /
          col("__chars").cast("double")), 4).alias("top_ngram_char_frac"),
        round(least(lit(1.0), coalesce(col("__dchars"), lit(0L)) /
          col("__chars").cast("double")), 4).alias("dup_ngram_char_frac"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the T5
    * corpus rules, the other standard heuristic battery next to
    * [[gopherQualityFeatures]]): keep only lines that end in terminal
    * punctuation, have at least `minWordsPerLine` words, and don't mention
    * javascript; flag whole documents containing "lorem ipsum" or a curly
    * brace for dropping. Line rules rewrite the text (`c4_text`,
    * `n_kept_lines`); the document flag is surfaced as `doc_keep` so the
    * caller decides between filter and audit.
    *
    * Pure Catalyst higher-order functions over the split lines — no UDFs,
    * no shuffle, runs in the scan projection.
    */
  def c4CleanLines(df: DataFrame, textCol: String, minWordsPerLine: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => {
      // trailing \r (CRLF corpora) and \t must not hide the terminal
      // punctuation — rtrim strips only ASCII spaces
      val t = regexp_replace(l, "[ \\t\\r\\f]+$", "")
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(l, " "), w => length(w) > 0)) >= minWordsPerLine &&
        !lower(l).contains("javascript")
    })
    df.withColumn("c4_text", array_join(kept, "\n"))
      .withColumn("n_kept_lines", size(kept))
      .withColumn("doc_keep",
        !(lower(col(textCol)).contains("lorem ipsum") ||
          col(textCol).contains("{")))
  }

  /** Corpus n-gram OCCURRENCE counts — vocabulary/statistics pass (top
    * boilerplate phrases, stop-phrase candidates). One explode of word
    * n-grams, one partial-aggregated count, rank by (count desc, ngram) —
    * the word-count shape at 100 TB; `topK` bounds the result, not the
    * computation. Grams come from the native codegen'd
    * [[graft.expressions.WordNGrams]] kernel (occurrences, not distinct).
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int, topK: Int): DataFrame = {
    val grams = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col(textCol)),
        n, distinct = false))
    df.select(explode(grams).alias("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy("ngram").agg(count(lit(1)).alias("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(topK)
  }

  /** PII scrubbing patterns — deliberately RE2-compatible (no lookaheads,
    * ASCII classes) so external validators (DuckDB oracle, Go/Rust
    * pipelines) apply the byte-identical rewrite. Replacement order is part
    * of the contract: emails first (their local part may contain digits a
    * later pass would mangle), then IPs, then phone-like runs.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9][0-9() -]{6,14}[0-9]"

  /** Scrub emails/IPv4s/international-format phones to typed tokens —
    * the standard cheap PII pass of corpus curation. One projection, three
    * codegen'd regexp_replace steps, fixed order (see pattern docs).
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** Within-document exact line dedup (boilerplate removal): keeps the
    * first occurrence of each line, preserving order — array_distinct is
    * order-preserving on both Spark and DuckDB, which keeps the operation
    * oracle-checkable.
    */
  def dedupLines(text: Column, sep: String = "\n"): Column =
    concat_ws(sep, array_distinct(split(text, java.util.regex.Pattern.quote(sep))))

  /** CROSS-document line dedup — C4's global pass (Raffel et al. 2020
    * §2.2 dedup "occurring more than once in the data set"): each exact
    * line survives once in the whole corpus, in the first document that
    * contains it (order: key asc, then position). [[dedupLines]] is the
    * within-document variant.
    *
    * Shape at scale: two hash shuffles — one keep-first window over the
    * line fingerprint (narrow rows: key, position, fingerprint), one
    * per-document reassembly — no global sort, no driver state. Documents
    * whose every line was claimed elsewhere come back with empty text
    * (kept, like C4, which drops by a later length filter rather than
    * here).
    *
    * @return (keyCol, text_dedup)
    */
  def dedupLinesAcrossCorpus(df: DataFrame, keyCol: String,
      textCol: String, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(keyCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__ln", "__line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("__line")))
      .orderBy(col(keyCol), col("__ln"))
    // empty lines bypass the window entirely (the paragraph twin's rule):
    // every blank line in the corpus shares md5("") — one window
    // partition holding ALL of them (a straggler hot key at scale), and
    // keep-first would strip blank-line formatting from every document
    // but the globally first one. A blank line carries no duplicated
    // content; it survives everywhere.
    val kept = lines.filter(col("__line") =!= "")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .unionByName(lines.filter(col("__line") === "")
        .withColumn("__rk", lit(1)))
    val rebuilt = kept
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("__ln"), col("__line"))))
        .alias("__ls"))
      .select(col(keyCol),
        concat_ws(sep, transform(col("__ls"), x => x.getField("__line")))
          .alias("text_dedup"))
    df.select(col(keyCol)).join(rebuilt, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("text_dedup"), lit("")).alias("text_dedup"))
  }

  /** Cross-document PARAGRAPH dedup — RefinedWeb granularity (Penedo et
    * al. 2023 run their exact-match dedup on blank-line-separated blocks,
    * not single lines): each paragraph survives once corpus-wide, in the
    * first document that contains it (order: key asc, then position).
    * Matching is whitespace-insensitive — paragraphs are fingerprinted on
    * their text with runs of whitespace collapsed to one space and ends
    * trimmed, so a re-wrapped copy of a boilerplate block still dedups —
    * but the SURVIVING paragraph keeps its original bytes.
    * Whitespace-only paragraphs are formatting, not content: always kept,
    * and excluded from the fingerprint window (a shared "" fingerprint
    * would funnel every blank block corpus-wide into one window
    * partition — a guaranteed hot key at scale).
    *
    * Same two-shuffle shape as [[dedupLinesAcrossCorpus]]: keep-first
    * window over narrow (key, position, fingerprint) rows, then per-doc
    * reassembly; no global sort, no driver state. Engine-portable: the
    * whitespace class is spelled explicitly (`[ \t\n\r\f]`) because Java
    * and RE2 disagree on `\s`, and the fingerprint is plain md5 — an
    * external SQL engine replays keep-first exactly.
    *
    * @return (keyCol, text_dedup)
    */
  def dedupParagraphsAcrossCorpus(df: DataFrame, keyCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame = {
    val paras = df.select(col(keyCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pn", "__para")))
      .withColumn("__norm",
        trim(regexp_replace(col("__para"), "[ \\t\\n\\r\\f]+", " ")))
    // whitespace-only paragraphs get a per-occurrence partition key (md5
    // hex never contains ':', so the 'e:' namespace cannot collide) —
    // their window is always the single row, rank 1, kept
    val fp = when(col("__norm") === "",
        concat_ws(":", lit("e"), col(keyCol).cast("string"),
          col("__pn").cast("string")))
      .otherwise(md5(col("__norm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fp)
      .orderBy(col(keyCol), col("__pn"))
    val kept = paras
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
    val rebuilt = kept
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("__pn"), col("__para"))))
        .alias("__ps"))
      .select(col(keyCol),
        concat_ws(sep, transform(col("__ps"), x => x.getField("__para")))
          .alias("text_dedup"))
    df.select(col(keyCol)).join(rebuilt, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("text_dedup"), lit("")).alias("text_dedup"))
  }

  /** Paragraph-fingerprint store of a corpus: distinct md5 of each
    * whitespace-normalized non-empty blank-line block — the narrow
    * (one 32-char column) table incremental paragraph dedup screens
    * against. Persist alongside the corpus like the MinHash band store;
    * append new batches' survivors to keep it current.
    */
  def paragraphFingerprints(df: DataFrame, textCol: String,
      sep: String = "\n\n"): DataFrame =
    df.select(explode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).alias("__para"))
      .select(trim(regexp_replace(col("__para"), "[ \\t\\n\\r\\f]+", " "))
        .alias("__norm"))
      .filter(col("__norm") =!= "")
      .select(md5(col("__norm")).alias("fp"))
      .distinct()

  /** Incremental cross-document paragraph dedup — the against-corpus
    * twin of [[dedupParagraphsAcrossCorpus]], the same relationship
    * [[DedupOps.minhashDedupAgainstSignatures]] has to
    * [[DedupOps.minhashNearDups]]: a batch paragraph is cut when the
    * CORPUS already contains it (fingerprint in the store) or an
    * earlier batch position claimed it (keep-first within the batch);
    * whitespace-only blocks always survive as formatting. O(batch) per
    * batch: the corpus contributes only its narrow fingerprint store
    * (broadcastable when small, an equi-join on `fp` when not), corpus
    * text is never touched.
    *
    * @param fingerprints (fp) rows from [[paragraphFingerprints]]
    * @return (keyCol, text_dedup)
    */
  def dedupParagraphsAgainstFingerprints(batch: DataFrame, keyCol: String,
      textCol: String, fingerprints: DataFrame,
      sep: String = "\n\n"): DataFrame = {
    val paras = batch.select(col(keyCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pn", "__para")))
      .withColumn("__norm",
        trim(regexp_replace(col("__para"), "[ \\t\\n\\r\\f]+", " ")))
    val fp = when(col("__norm") === "",
        concat_ws(":", lit("e"), col(keyCol).cast("string"),
          col("__pn").cast("string")))
      .otherwise(md5(col("__norm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fp)
      .orderBy(col(keyCol), col("__pn"))
    // keep-first within the batch, then cut anything the corpus owns —
    // the 'e:' empty-block namespace cannot collide with md5 hex, so the
    // anti-join never drops formatting rows
    val kept = paras
      .withColumn("__fp", fp)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .join(fingerprints.select(col("fp").alias("__fp")), Seq("__fp"),
        "left_anti")
    val rebuilt = kept
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("__pn"), col("__para"))))
        .alias("__ps"))
      .select(col(keyCol),
        concat_ws(sep, transform(col("__ps"), x => x.getField("__para")))
          .alias("text_dedup"))
    batch.select(col(keyCol)).join(rebuilt, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("text_dedup"), lit("")).alias("text_dedup"))
  }

  /** [[dedupParagraphsAgainstFingerprints]] with the store computed from
    * corpus text — first-run convenience.
    */
  def dedupParagraphsAgainstCorpus(batch: DataFrame, keyCol: String,
      textCol: String, corpus: DataFrame, corpusTextCol: String,
      sep: String = "\n\n"): DataFrame =
    dedupParagraphsAgainstFingerprints(batch, keyCol, textCol,
      paragraphFingerprints(corpus, corpusTextCol, sep), sep)

  /** URL curation — the crawl-side filter battery (host routing, domain
    * blocklists, tracker-param stripping). All regexp-based and
    * deliberately RE2-compatible so external validators apply the
    * byte-identical parse; no java.net.URI (its parse failures throw and
    * its normalization differs between JDKs).
    */
  val UrlSchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val UrlHostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  val UrlPathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)"
  // the '?' must occur BEFORE any '#': an unanchored \? would match a
  // question mark inside the fragment and fabricate a query string from
  // fragment content ("...page#sec?tab=1" → "?tab=1"), splitting dedup
  // keys for one page. The lazy prefix stops at the first '?' or '#'.
  val UrlQueryRe = "^[^#]*?\\?([^#]*)"

  def urlScheme(url: Column): Column = lower(regexp_extract(url, UrlSchemeRe, 1))

  /** Lower-cased host with any `:port` suffix removed. */
  def urlHost(url: Column): Column =
    lower(regexp_replace(regexp_extract(url, UrlHostRe, 1), ":[0-9]+$", ""))

  /** Registrable-domain approximation: the last two dot-labels (a full
    * public-suffix list is a data file, not an algorithm — callers with
    * one can join it against `host`).
    */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** Canonical URL: lower-cased scheme+host, default ports stripped,
    * `utm_*` tracker params removed, fragment dropped. Empty queries lose
    * their `?`.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = regexp_extract(regexp_extract(url, UrlHostRe, 1), ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_extract(url, UrlPathRe, 1)
    val query = regexp_extract(url, UrlQueryRe, 1)
    val noUtm = regexp_replace(
      regexp_replace(query, "(^|&)utm_[A-Za-z_]*=[^&]*", ""), "^&", "")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(noUtm =!= "", concat(lit("?"), noUtm)).otherwise(lit("")))
  }

  /** URL feature battery over a URL column: scheme/host/domain/normalized
    * plus a blocklist verdict (exact host or registrable-domain match).
    * One projection, no shuffle — the blocklist is a literal `isin`, the
    * right shape for the few-thousand-entry lists curation runs carry
    * (larger lists should broadcast-join against `host` instead).
    */
  def urlFeatures(df: DataFrame, urlCol: String,
      blockedHosts: Seq[String] = Nil): DataFrame = {
    val u = col(urlCol)
    val host = urlHost(u)
    val domain = urlDomain(u)
    val blocked =
      if (blockedHosts.isEmpty) lit(false)
      else host.isin(blockedHosts: _*) || domain.isin(blockedHosts: _*)
    df.withColumn("scheme", urlScheme(u))
      .withColumn("host", host)
      .withColumn("domain", domain)
      .withColumn("url_norm", normalizeUrl(u))
      .withColumn("is_blocked", blocked)
  }

  /** TF-IDF top terms per document (tf × ln(N/df), the plain information-
    * retrieval form): the keyword/topic signal corpus triage uses before
    * anything model-based.
    *
    * Plan shape at 100 TB: one token explode → (doc, term) partial-agg
    * count (the word-count shape), a term-keyed shuffle join against the
    * document-frequency aggregate (vocabulary-sized — NOT broadcast, it
    * can be billions of terms), then a per-document ranking window over
    * ≤ vocabulary-of-doc rows. `numDocs` avoids the extra counting job
    * when the caller already knows the corpus size.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int,
      numDocs: Option[Long] = None): DataFrame = {
    val n = numDocs.getOrElse(df.select(col(idCol)).distinct().count())
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).alias("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).alias("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).alias("df_t"))
    val scoreRaw = col("tf") * log(lit(n.toDouble) / col("df_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(scoreRaw.desc, col("term"))
    tf.join(docFreq, "term")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"),
        round(scoreRaw, 4).alias("tfidf"), col("rnk"))
  }

  /** BM25 document ranking for a bag-of-terms query (Robertson/Okapi
    * formulation with the +1 idf floor, as in Lucene): the retrieval
    * sibling of [[tfidfTopTerms]], used for corpus triage ("which
    * documents match this topic probe") and contamination auditing.
    *
    * Plan shape at 100 TB: one token explode; doc lengths via per-key
    * partial-agg count; query-term tf from a literal `isin` filter on the
    * exploded tokens (the query is a few terms — the filter prunes the
    * explode output before any shuffle); per-term document frequencies are
    * ≤ |query| rows, joined back BROADCAST; corpus stats (N, avgdl) ride a
    * broadcast 1-row cross join so nothing leaves the plan. Output: top-k
    * docs by (score desc, id asc), deterministic.
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopDocs needs at least one query term")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).alias("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).alias("dl"))
    val stats = dl.agg(count(lit(1)).alias("n_docs"), avg(col("dl")).alias("avgdl"))
    val qtf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).alias("tf"))
    val dfT = qtf.groupBy(col("term")).agg(count(lit(1)).alias("df_t"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
    val termScore = idf * col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = qtf
      .join(broadcast(dfT), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(sum(termScore), 4).alias("bm25"),
        count(lit(1)).alias("n_terms_hit"))
    // global top-k as orderBy+limit -> TakeOrderedAndProject (per-partition
    // heaps, no single-partition sort of every matching doc); the ranking
    // window then sees only k rows. pmod(hash,1) is the non-foldable
    // constant partition key that keeps WindowExec's "no partition" warning
    // out of the logs without changing semantics.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(xxhash64(col(idCol)), lit(1)))
      .orderBy(col("bm25").desc, col(idCol))
    scored.orderBy(col("bm25").desc, col(idCol)).limit(k)
      .withColumn("rnk", row_number().over(w))
  }

  /** Unicode normalization (UAX #15) — NFC before hash-keyed dedup (composed
    * vs combining-mark encodings of identical text must hash identically),
    * NFKC before tokenization. Native codegen'd kernel with an
    * isNormalized fast path for the all-ASCII common case.
    */
  def unicodeNorm(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UnicodeNorm(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), form))

  /** Document fingerprint: md5 of the whitespace-normalized, lower-cased
    * text. md5 is engine-portable (identical in Spark, DuckDB, Python), so
    * fingerprints computed by different tools agree — the property that
    * matters for cross-system dedup.
    */
  // The whitespace class is spelled out ([ \t\n\r\f]) instead of \s:
  // Java's \s additionally matches \x0B where RE2 (DuckDB, Go, Rust
  // validators) does not — the explicit class is the intersection both
  // engines agree on, keeping the portability promise below exact.
  // Known edge (kept for cross-site hash stability — the identical chain
  // is pinned in DedupOps, the TextHashes native expression and every
  // DuckDB oracle): trim runs BEFORE the collapse, so text whose leading/
  // trailing whitespace is NON-space (\n, \t) keeps one edge space and
  // hashes apart from its space-trimmed twin. The paragraph-dedup path
  // normalizes collapse-then-trim; re-ordering HERE would change every
  // stored fingerprint, so the order is frozen.
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "[ \\t\\n\\r\\f]+", " "))

  /** 64-bit rolling fingerprint (xxhash64 of normalized text) for
    * numeric-key joins at scale — cheaper shuffle key than a 32-char hex.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "[ \\t\\n\\r\\f]+", " "))

  /** Encoding-damage signals — the ftfy-class screen every web-scale
    * corpus needs before training (mis-decoded text tokenizes into
    * garbage the model then reproduces):
    *
    *  - `n_replacement`: U+FFFD count — some decoder upstream already
    *    gave up on those bytes,
    *  - `n_c1_controls`: U+0080–U+009F — the classic
    *    cp1252-bytes-read-as-latin1/unicode damage (NEL, OSC et al.
    *    never appear in clean text),
    *  - `n_mojibake`: UTF-8-bytes-read-as-latin1 markers — 'Ã'/'Â'
    *    followed by a continuation-range char (U+0080–U+00BF: Ã©, Ã±,
    *    Â·, non-breaking-space damage) and the 'â€' prefix of
    *    mis-decoded smart punctuation (â€™ â€œ â€"),
    *  - `bad_char_frac` = (sum of the above) / chars (4 decimals),
    *    `enc_ok` = frac ≤ `maxBadFrac` (empty docs are ok).
    *
    * Pure per-row projection (pattern counts; RE2-compatible classes so
    * external engines replay the exact counts) — zero shuffles, the
    * screen composes with [[curationSignals]]' one-scan battery.
    */
  def encodingQuality(df: DataFrame, keyCol: String, textCol: String,
      maxBadFrac: Double = 0.001): DataFrame = {
    val t = col(textCol)
    // legacy size(NULL) = -1 under ANSI-off: a NULL doc would report -1
    // counts and decrement corpus-level audit sums
    def cnt(pattern: String): Column =
      when(t.isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(t, lit(pattern), lit(0))).cast("long"))
    df.select(col(keyCol), t.alias(textCol))
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_replacement", cnt("\uFFFD"))
      .withColumn("n_c1_controls", cnt("[\u0080-\u009F]"))
      .withColumn("n_mojibake", cnt("[\u00C3\u00C2][\u0080-\u00BF]|\u00E2\u20AC"))
      .withColumn("bad_char_frac",
        when(col("n_chars") > 0,
          round((col("n_replacement") + col("n_c1_controls") +
            col("n_mojibake")).cast("double") / col("n_chars"), 4))
          .otherwise(lit(0.0)))
      .withColumn("enc_ok", col("bad_char_frac") <= lit(maxBadFrac))
      .drop(textCol)
  }

  /** PII redaction screen (the CCNet/Dolma pre-release step): emails,
    * IPv4 literals, and phone-shaped digit runs replaced with typed
    * placeholder tokens, with per-class counts for the audit trail.
    * Three staged passes — emails first, then IPs on the email-redacted
    * text, then phones on the IP-redacted text — so a digit run inside
    * an address is never double-counted and the counts always equal the
    * replacements made.
    *
    * Pure per-row regexp projections, zero shuffles, composes with the
    * one-scan curation battery. Every pattern stays in the Java∩RE2
    * common syntax (character classes, bounded repetition, non-capturing
    * groups, ASCII `\b`) so an external SQL engine replays the exact
    * redactions.
    *
    * @return (keyCol, n_emails, n_ips, n_phones, text_redacted)
    */
  def redactPii(df: DataFrame, keyCol: String, textCol: String,
      emailToken: String = "<EMAIL>", ipToken: String = "<IP>",
      phoneToken: String = "<PHONE>"): DataFrame = {
    // NOTE: the email/IP patterns intentionally mirror
    // EmailPattern/Ipv4Pattern above (scrubPii); the PHONE patterns
    // deliberately DIFFER — scrubPii redacts international (+-prefixed)
    // numbers only, this pass also catches national formats with an
    // optional '+'. Both shapes are pinned by their own oracle gates; a
    // pattern fix here must consider both contracts, not unify them.
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d(?:[-() ]?\\d){8,14}"
    def cnt(c: Column, pattern: String): Column =
      // NULL text: NULL counts (not the legacy -1), keeping the
      // counts-equal-replacements audit invariant
      when(c.isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long"))
    val t0 = col(textCol)
    df.select(col(keyCol), t0.alias("__t0"))
      .withColumn("n_emails", cnt(col("__t0"), email))
      .withColumn("__t1", regexp_replace(col("__t0"), email, emailToken))
      .withColumn("n_ips", cnt(col("__t1"), ip))
      .withColumn("__t2", regexp_replace(col("__t1"), ip, ipToken))
      .withColumn("n_phones", cnt(col("__t2"), phone))
      .withColumn("text_redacted",
        regexp_replace(col("__t2"), phone, phoneToken))
      .select(col(keyCol), col("n_emails"), col("n_ips"), col("n_phones"),
        col("text_redacted"))
  }

  /** Cross-snapshot corpus diff — the data-versioning primitive for
    * ingestion operations: which documents were ADDED, REMOVED, or
    * CHANGED between two corpus snapshots (a failed backfill, a
    * re-crawl, a vendor drop). Documents compare by the portable
    * normalized-text [[fingerprint]], so formatting-identical copies do
    * not read as changes; unchanged documents are absent from the
    * output. Scale shape: one narrow (key, 32-char fp) projection per
    * side and a single full-outer equi-join on the key — no text moves,
    * no window, ~the cost of the exact-dedup screen.
    *
    * @return (keyCol, change) with change ∈ 'added' | 'removed' | 'changed'
    */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      textCol: String): DataFrame = {
    // presence is tracked with literal flags, NOT fingerprint nullness:
    // a row whose TEXT is NULL has a NULL fingerprint, and conflating
    // that with row absence misclassifies it (a removed NULL-text doc
    // would read 'added'). NULL-text rows compare via the null-safe <=>
    // below: NULL → NULL is unchanged, NULL → text is 'changed'.
    val o = oldSnap.select(col(keyCol),
      fingerprint(col(textCol)).alias("__ofp"), lit(true).alias("__oin"))
    val n = newSnap.select(col(keyCol),
      fingerprint(col(textCol)).alias("__nfp"), lit(true).alias("__nin"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("__oin").isNull, lit("added"))
          .when(col("__nin").isNull, lit("removed"))
          .when(!(col("__ofp") <=> col("__nfp")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(keyCol), col("change"))
  }

  /** One-call corpus health profile — the summary a curation run prints
    * before and after each pipeline stage: volume (docs, chars, tokens),
    * shape (avg/min/max length), emptiness, and the exact-duplicate rate
    * (1 − distinct fingerprints / docs). One aggregation pass with
    * map-side partials plus an exact distinct on the (narrow) fingerprint
    * — the same cost envelope as the exact-dedup screen itself. Returns a
    * single row; every column is engine-portable for oracle replay.
    */
  def corpusProfile(df: DataFrame, textCol: String,
      shortDocTokens: Int = 10): DataFrame = {
    val t = col(textCol)
    df.agg(
      count(lit(1)).alias("docs"),
      sum(length(t)).alias("total_chars"),
      round(avg(length(t)), 4).alias("avg_chars"),
      min(length(t)).alias("min_chars"),
      max(length(t)).alias("max_chars"),
      sum(tokenCount(t)).alias("total_tokens"),
      sum(when(t.isNull || trim(t) === "", 1).otherwise(0))
        .alias("empty_docs"),
      sum(when(tokenCount(t) < shortDocTokens, 1).otherwise(0))
        .alias("short_docs"),
      countDistinct(fingerprint(t)).alias("distinct_docs"),
      count(t).alias("__nonnull_docs"))
      // countDistinct skips NULL fingerprints while docs counts every
      // row — dup_rate ratios distinct against NON-NULL docs (count(t)),
      // or a corpus of failed extractions would read as pure duplicates
      .withColumn("dup_rate",
        when(col("__nonnull_docs") > 0,
          round(lit(1.0) - col("distinct_docs") / col("__nonnull_docs"), 6))
          .otherwise(lit(0.0)))
      .drop("__nonnull_docs")
  }

  // ---- character-LM quality scoring ----------------------------------------

  /** All positional character n-grams of `t` (one per start offset, NOT
    * distinct — these carry the occurrence counts an LM needs); empty
    * array below n chars. Pure codegen'd HOFs in the scan projection.
    */
  def charGrams(t: Column, n: Int): Column =
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
      .otherwise(array())

  /** Character n-gram counts of a reference corpus — the training half of
    * [[lmQualityScore]]. One explode + one count shuffle; run once per
    * corpus snapshot and persist, like any model artifact.
    */
  def charNgramCounts(corpus: DataFrame, textCol: String, n: Int): DataFrame =
    corpus.select(explode(charGrams(col(textCol), n)).alias("gram"))
      .groupBy("gram").agg(count(lit(1)).alias("cnt"))

  /** CCNet-style language-model quality score (Wenzek et al. 2020 use a
    * 5-gram KenLM; this is the dependency-free character-trigram analogue):
    * each document scores the average conditional log-probability of its
    * char trigrams under add-k-smoothed counts from a reference corpus,
    *
    *   score = avg_i ln( (cnt3(s_i..s_i+2) + k) / (cnt2(s_i..s_i+1) + kV) )
    *
    * Low scores mark text unlike the reference (boilerplate, garbled
    * encodings, other languages) for threshold filtering, exactly how
    * CCNet buckets by perplexity.
    *
    * Plan shape: the LM tables are bounded by the character-trigram space,
    * not the corpus (they stop growing once the alphabet is covered), so
    * both join BROADCAST against the document grams; the only shuffle is
    * the final per-document aggregate. Documents shorter than 3 chars have
    * no grams and are absent from the output.
    *
    * @param lmTri output of [[charNgramCounts]] with n=3
    * @param lmBi  output of [[charNgramCounts]] with n=2
    * @param vocab smoothing vocabulary size V (effective alphabet)
    * @param k     add-k smoothing constant, > 0
    * @return (key, n_grams, lm_score), score rounded to 4 decimals
    */
  /** Entry ceiling for collecting/broadcasting an LM gram table into
    * the scoring kernel: the default byte-bucket vocab (128) bounds a
    * trigram table at 128³ ≈ 2.1 M rows — inside this cap by design
    * margin; an unbounded multilingual gram table must be pre-pruned
    * (e.g. top-N grams) before scoring, not collected until the driver
    * OOMs.
    */
  val MaxLmTableEntries: Long = 4000000L

  /** Size-gated LM-table materialization with ONE evaluation of the
    * expensive stages. Two actions run on one RDD instance: the count
    * job registers every shuffle map stage with the output tracker, so
    * the collect job re-runs only the final post-shuffle reduce pass
    * (no persist — nothing to fill or evict). The exact count gates
    * BEFORE any row travels to the driver: an over-cap table refuses
    * with guidance having fetched nothing. A per-partition gate cannot
    * give that bound — partitions can all sit under the cap while the
    * total is 30× over it, and collecting them to find out IS the
    * OOM. This replaces a `limit(cap+1).collect()` fetch, which bounds
    * the driver the same way but re-plans the aggregation per call and
    * schedules CollectLimit's incremental partition waves.
    */
  private[llmops] def collectLmTable(
      df: DataFrame): Array[(String, Long)] = {
    val gateMsg =
      s"LM gram table exceeds $MaxLmTableEntries entries — it no " +
        "longer fits the scoring kernel; prune it first (cap the " +
        "vocab, or keep top-N grams by count) and retry"
    // ONE RDD instance, two actions: the count job registers every
    // shuffle map stage with the output tracker, so the collect job
    // recomputes only the final reduce pass — no cache to fill or
    // evict, and the expensive scan/exchange runs once
    val rdd = df.select(col("gram"), col("cnt"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
      .rdd
    require(rdd.count() <= MaxLmTableEntries, gateMsg)
    val rows = rdd.collect()
    // the two actions recompute from source; if the input dir mutated
    // between them the count gate no longer bounds what collect fetched —
    // re-validate the materialized array (cheap: it's already local)
    require(rows.length <= MaxLmTableEntries, gateMsg)
    rows
  }

  /** [[collectLmTable]] handed back as a LOCAL relation whose
    * broadcast is free.
    */
  private def boundedLmLocal(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, gramAlias: String, cntAlias: String): DataFrame = {
    val rows: Array[org.apache.spark.sql.Row] =
      collectLmTable(df).map { case (g, c) => org.apache.spark.sql.Row(g, c) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(gramAlias,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(cntAlias,
          org.apache.spark.sql.types.LongType))))
  }

  def lmQualityScore(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      lmTri: DataFrame,
      lmBi: DataFrame,
      vocab: Int = 128,
      k: Double = 1.0
  ): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val occ = docs.select(col(keyCol),
        explode(charGrams(col(textCol), 3)).alias("__g"))
    // the two table jobs are independent — run them concurrently
    // (Spark schedules jobs from separate threads side by side)
    val Vector(triLocal, biLocal) = DriverPar.parMap(Seq(
      () => boundedLmLocal(docs.sparkSession, lmTri, "__g", "__c3"),
      () => boundedLmLocal(docs.sparkSession, lmBi, "__bg", "__c2")))(_())
    val tri = broadcast(triLocal)
    val bi = broadcast(biLocal)
    occ.join(tri, Seq("__g"), "left")
      .join(bi, substring(col("__g"), 1, 2) === col("__bg"), "left")
      .select(col(keyCol),
        log((coalesce(col("__c3"), lit(0L)) + lit(k)) /
          (coalesce(col("__c2"), lit(0L)) + lit(k * vocab))).alias("__lp"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).alias("n_grams"),
        round(avg(col("__lp")), 4).alias("lm_score"))
  }

  /** The full standard curation-signal battery — Gopher word statistics
    * ([[gopherQualityFeatures]]), Gopher repetition signals
    * ([[gopherRepetitionSignals]]), C4 line rules ([[c4CleanLines]]) and
    * the CCNet char-trigram LM score ([[lmQualityScore]]) — computed in
    * ONE pass over the corpus. Run separately, the four operators scan
    * the corpus four times and shuffle it three (two word-count
    * aggregations, a window, a per-doc score aggregate); here every
    * signal is a per-row expression, so the corpus is scanned once and
    * NEVER shuffled:
    *
    *  - word/gram statistics (top word count, top n-gram, duplicated
    *    n-gram coverage) fold over the row's SORTED token/gram array —
    *    a run-length scan replaces the (key, gram) count shuffle; the
    *    per-row O(m log m) sort is CPU the executor has, the shuffle it
    *    replaces is network the cluster feels,
    *  - the LM tables are collected to the driver as a model artifact
    *    (bounded by the char-trigram space — they stop growing once the
    *    alphabet is covered — same argument that lets
    *    [[lmQualityScore]] broadcast them) and shipped in the task
    *    binary inside the native [[graft.expressions.CharTrigramLm]]
    *    kernel: O(1) hash probes per gram, and the per-doc score is a
    *    strict left-to-right fold, so an external SQL engine replays
    *    the exact doubles. NOTE: building this plan therefore RUNS the
    *    two LM-table jobs eagerly (train-then-apply),
    *  - the C4 rules were already pure projection.
    *
    * Output columns and semantics match the standalone operators
    * (documents with no words / no grams get NULL signal columns where
    * the standalone aggregation would simply have no row). The one
    * deliberate divergence: `top_ngram` ties break by (count desc, gram
    * asc) exactly like the window version, because the fold only
    * replaces its best candidate on a STRICTLY higher run length and
    * the array is scanned in ascending gram order.
    */
  def curationSignals(
      docs: DataFrame,
      keyCol: String,
      textCol: String,
      lmTri: DataFrame,
      lmBi: DataFrame,
      vocab: Int = 128,
      k: Double = 1.0,
      topN: Int = 2,
      dupN: Int = 5,
      minWordsPerLine: Int = 3): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    def grams(n: Int) = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col(textCol)),
        n, distinct = false))
    // collect the bounded LM tables once; cnt values are exact longs so
    // the model is deterministic regardless of collect order. The size
    // gate rides the same single-job evaluation that builds each table
    // (collectLmTable) — no CollectLimit wave scheduling, executor-side
    // fail-fast past the cap
    val Vector(triTable, biTable) =
      DriverPar.parMap(Seq(lmTri, lmBi))(collectLmTable)
    val lmModel = graft.expressions.CharTrigramLm.model(
      triTable, biTable, vocab, k)
    val lmCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CharTrigramLm(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col(textCol)),
        lmModel))

    // r18: the word/gram statistics run as ONE native kernel pass
    // ([[graft.expressions.CurationTextStats]]) — the former shape
    // (split + three array_sorts + three interpreted run-length
    // `aggregate` folds) allocated a named_struct per element per doc.
    // The kernel returns raw counts; every fraction below divides the
    // SAME values in Column space, so the output doubles are identical
    // (equality with the standalone operators stays spec-pinned).
    val statsCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CurationTextStats(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col(textCol)),
        topN, dupN))
    c4CleanLines(docs, textCol, minWordsPerLine)
      .withColumn("__st", statsCol)
      .withColumn("__lm", lmCol)
      .withColumn("__chars", length(col(textCol)))
      .withColumn("n_words", col("__st.n_words"))
      .withColumn("mean_word_len",
        round(col("__st.sum_word_len").cast("double") / col("n_words"), 4))
      .withColumn("frac_unique_words",
        round(col("__st.n_unique").cast("double") / col("n_words"), 4))
      .withColumn("top_word_frac",
        round(col("__st.max_word_run").cast("double") / col("n_words"), 4))
      .withColumn("passes_quality",
        col("n_words") >= 40 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_unique_words") >= 0.2 && col("top_word_frac") <= 0.2)
      .withColumn("top_ngram", col("__st.top_gram"))
      .withColumn("top_ngram_char_frac",
        when(col("__st.top_gram_run") > 0,
          round(least(lit(1.0),
            col("__st.top_gram_run") * length(col("top_ngram")) /
              col("__chars").cast("double")), 4)))
      // gated on the topN grams like the standalone operator's output row
      // (top_gram_run >= 1 ⇔ the doc has >= topN words; dup coverage is
      // already 0 when nothing repeats)
      .withColumn("dup_ngram_char_frac",
        when(col("__st.top_gram_run") > 0,
          round(least(lit(1.0),
            col("__st.dup_gram_chars") / col("__chars").cast("double")), 4)))
      // NULL text has a NULL __lm struct; coalesce to the 0-gram shape
      // the SQL array fold produced (n_grams 0, lm_score null)
      .withColumn("n_grams", coalesce(col("__lm.n_grams"), lit(0L)))
      .withColumn("lm_score",
        when(col("n_grams") > 0,
          round(col("__lm.lm_sum") / col("n_grams"), 4)))
      .drop("__st", "__lm", "__chars")
  }

  // --- trainable hashed-n-gram quality classifier -----------------------

  /** The classifier's feature list as a Column — non-empty words of the
    * single-space split of `lower(trim(text))`, then adjacent bigrams —
    * EXACTLY [[graft.expressions.HashedNgramScore.grams]], so training
    * features can never drift from the scoring kernel.
    */
  private def qualityGrams(text: Column): Column = {
    val words = filter(split(lower(trim(text)), " "), w => length(w) > 0)
    val bigrams = zip_with(
      slice(words, lit(1), greatest(size(words) - 1, lit(0))),
      slice(words, lit(2), greatest(size(words) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    concat(words, bigrams)
  }

  private def bucketOf(g: Column, numBuckets: Int): Column =
    Similarity.portable60(g) % numBuckets

  /** Train a Naive Bayes quality classifier over hashed word n-grams
    * (the closed-form trainable path — one aggregation pass, integer
    * counts, so an external SQL engine replays training exactly).
    * Weight `b` is the add-one-smoothed multinomial log-ratio
    * `ln((pos_b+1)/(posTot+D)) − ln((neg_b+1)/(negTot+D))`; the bias is
    * the document-count prior log-ratio. Labels: 1 = positive class
    * (e.g. spam/low-quality), scored `> 0` predicts that class.
    *
    * Scale shape: explode → one partial-aggregated groupBy on the
    * bucket id, at most `numBuckets` rows collected — the model is a
    * bounded artifact like the LM tables, never corpus-sized.
    */
  def trainQualityNb(labeled: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 4096): graft.expressions.HashedNgramModel = {
    val ex = labeled
      .select(col(labelCol).cast("int").alias("y"),
        explode(qualityGrams(col(textCol))).alias("g"))
      .select(col("y"), bucketOf(col("g"), numBuckets).alias("b"))
    val counts = ex.groupBy(col("b"))
      .agg(sum(col("y")).alias("pc"), sum(lit(1) - col("y")).alias("nc"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val pt = counts.map(_._2).sum
    val nt = counts.map(_._3).sum
    val docCounts = labeled.groupBy(col(labelCol).cast("int").alias("y"))
      .agg(count(lit(1)).alias("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pd = docCounts.getOrElse(1, 0L)
    val nd = docCounts.getOrElse(0, 0L)
    val weights = Array.fill(numBuckets)(
      math.log(1.0 / (pt + numBuckets)) - math.log(1.0 / (nt + numBuckets)))
    counts.foreach { case (b, pc, nc) =>
      weights(b) = math.log((pc + 1.0) / (pt + numBuckets)) -
        math.log((nc + 1.0) / (nt + numBuckets))
    }
    new graft.expressions.HashedNgramModel(numBuckets,
      math.log((pd + 1.0) / (nd + 1.0)), weights)
  }

  /** Train a logistic-regression quality classifier over the same hashed
    * features by full-batch gradient descent: forward pass through the
    * native scoring kernel (current weights shipped in the task binary),
    * residuals exploded per gram occurrence, gradients one groupBy on
    * the bucket id. Per-round gradient sums are float additions in
    * shuffle order, so trained weights can differ in final ulps across
    * runs — spec-gated (accuracy margins), exactly [[Similarity.pqTrain]]'s
    * contract; the NB trainer is the oracle-replayable path.
    */
  def trainQualityLr(labeled: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 4096, iters: Int = 20,
      step: Double = 0.5): graft.expressions.HashedNgramModel = {
    require(iters >= 0 && step > 0, s"bad GD config: iters=$iters step=$step")
    val base = labeled
      .select(col(labelCol).cast("double").alias("y"),
        col(textCol).alias("__t"))
      .localCheckpoint() // read once per round; lineage stays flat
    val n = base.count().toDouble
    require(n > 0, "trainQualityLr: empty training set")
    var bias = 0.0
    var weights = new Array[Double](numBuckets)
    for (_ <- 0 until iters) {
      val model = new graft.expressions.HashedNgramModel(numBuckets, bias, weights)
      val resid = base
        .withColumn("__q", qualityClassifierScore(col("__t"), model))
        .withColumn("__r",
          lit(1.0) / (lit(1.0) + exp(-col("__q.score"))) - col("y"))
      val grads = resid
        .select(col("__r"), explode(qualityGrams(col("__t"))).alias("g"))
        .select(col("__r"), bucketOf(col("g"), numBuckets).alias("b"))
        .groupBy(col("b")).agg(sum(col("__r")).alias("gr"))
        .collect().map(r => (r.getLong(0).toInt, r.getDouble(1)))
      val biasGrad = resid.agg(sum(col("__r"))).collect()(0).getDouble(0)
      val next = weights.clone()
      grads.foreach { case (b, g) => next(b) -= step * g / n }
      weights = next
      bias -= step * biasGrad / n
    }
    new graft.expressions.HashedNgramModel(numBuckets, bias, weights)
  }

  /** `struct<n_grams, score>` under a trained [[trainQualityNb]] /
    * [[trainQualityLr]] model — native kernel, per-row scan projection,
    * no join (the q96 lesson: models ride the task binary, not map
    * columns).
    */
  def qualityClassifierScore(text: Column,
      model: graft.expressions.HashedNgramModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HashedNgramScore(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), model))

  // --- multiclass hashed-n-gram classifier (fastText-lid shape) ---------

  /** Train a k-class multinomial Naive Bayes classifier over the SAME
    * hashed word uni+bigram features as [[trainQualityNb]] — the
    * closed-form multiclass path (one aggregation pass keyed on
    * (label, bucket), integer counts), so an external SQL engine
    * replays training exactly. Class order = sorted distinct labels.
    * Per class c: `w_c[b] = ln((cnt_c[b]+1)/(tot_c+D))` (add-one
    * multinomial log-likelihood), `bias_c = ln((docs_c+1)/(docs+k))`
    * (smoothed prior). Argmax of `bias_c + Σ w_c[h(g)]` predicts.
    *
    * Scale shape: explode → one partial-aggregated groupBy on
    * (label, bucket), at most k·D rows collected — the model is a
    * bounded artifact shipped in the task binary, never corpus-sized.
    */
  def trainLangIdNb(labeled: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 4096): graft.expressions.HashedNgramMulticlassModel = {
    val counts = labeled
      .select(col(labelCol).cast("string").alias("y"),
        explode(qualityGrams(col(textCol))).alias("g"))
      .select(col("y"), bucketOf(col("g"), numBuckets).alias("b"))
      .groupBy(col("y"), col("b")).agg(count(lit(1)).alias("c"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
    val docCounts = labeled
      .groupBy(col(labelCol).cast("string").alias("y"))
      .agg(count(lit(1)).alias("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = docCounts.keys.toArray.sorted
    require(labels.nonEmpty, "trainLangIdNb: empty training set")
    val idx = labels.zipWithIndex.toMap
    val totals = new Array[Long](labels.length)
    counts.foreach { case (y, _, c) => totals(idx(y)) += c }
    val weights = Array.tabulate(labels.length)(c =>
      Array.fill(numBuckets)(math.log(1.0 / (totals(c) + numBuckets))))
    counts.foreach { case (y, b, c) =>
      weights(idx(y))(b) = math.log((c + 1.0) / (totals(idx(y)) + numBuckets))
    }
    val nDocs = docCounts.values.sum
    val biases = labels.map(l =>
      math.log((docCounts(l) + 1.0) / (nDocs + labels.length.toDouble)))
    new graft.expressions.HashedNgramMulticlassModel(
      numBuckets, labels, biases, weights)
  }

  /** Train a k-class softmax (multinomial logistic regression)
    * classifier by full-batch gradient descent over the same hashed
    * features: forward pass through the native multi-score kernel,
    * per-class residuals `softmax_c − 1[y=c]` exploded per gram
    * occurrence, gradients one groupBy on (class, bucket). Float
    * iteration sums ride shuffle order, so final weights can differ in
    * ulps across runs — spec-gated (accuracy margins), exactly
    * [[trainQualityLr]]'s contract; the NB trainer is the
    * oracle-replayable path.
    */
  def trainLangIdLr(labeled: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 4096, iters: Int = 20,
      step: Double = 0.5): graft.expressions.HashedNgramMulticlassModel = {
    require(iters >= 0 && step > 0, s"bad GD config: iters=$iters step=$step")
    val base = labeled
      .select(col(labelCol).cast("string").alias("y"),
        col(textCol).alias("__t"))
      .localCheckpoint() // read once per round; lineage stays flat
    val n = base.count().toDouble
    require(n > 0, "trainLangIdLr: empty training set")
    val labels = base.select("y").distinct()
      .collect().map(_.getString(0)).sorted
    val k = labels.length
    var biases = new Array[Double](k)
    var weights = Array.fill(k)(new Array[Double](numBuckets))
    for (_ <- 0 until iters) {
      val model = new graft.expressions.HashedNgramMulticlassModel(
        numBuckets, labels, biases, weights)
      // per-row, per-class residual p_c − 1[y=c] via a numerically
      // stable softmax over the kernel's score array
      val resid = base
        .withColumn("__s", langIdScores(col("__t"), model).getField("scores"))
        .withColumn("__m", array_max(col("__s")))
        .withColumn("__z",
          aggregate(col("__s"), lit(0.0), (a, x) => a + exp(x - col("__m"))))
        .withColumn("__r", transform(col("__s"), (x, i) =>
          exp(x - col("__m")) / col("__z") -
            when(element_at(typedlit(labels.toSeq), i + 1) === col("y"), 1.0)
              .otherwise(0.0)))
      val biasGrads = resid
        .select(explode(transform(col("__r"), (r, i) =>
          struct(i.alias("c"), r.alias("r")))).alias("e"))
        .groupBy(col("e.c")).agg(sum(col("e.r")).alias("gr"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
      val grads = resid
        .select(col("__r"), explode(qualityGrams(col("__t"))).alias("g"))
        .select(col("__r"), bucketOf(col("g"), numBuckets).alias("b"))
        .select(col("b"), explode(transform(col("__r"), (r, i) =>
          struct(i.alias("c"), r.alias("r")))).alias("e"))
        .groupBy(col("e.c"), col("b")).agg(sum(col("e.r")).alias("gr"))
        .collect().map(r => (r.getInt(0), r.getLong(1).toInt, r.getDouble(2)))
      val nextW = weights.map(_.clone())
      grads.foreach { case (c, b, g) => nextW(c)(b) -= step * g / n }
      val nextB = biases.clone()
      biasGrads.foreach { case (c, g) => nextB(c) -= step * g / n }
      weights = nextW
      biases = nextB
    }
    new graft.expressions.HashedNgramMulticlassModel(
      numBuckets, labels, biases, weights)
  }

  /** `struct<n_grams, scores array<double>>` — per-class scores under a
    * trained multiclass model (class order = model label order).
    */
  def langIdScores(text: Column,
      model: graft.expressions.HashedNgramMulticlassModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HashedNgramMultiScores(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), model))

  /** `struct<n_grams, lang, score>` — argmax prediction under a trained
    * multiclass model (first class in model order wins exact ties).
    */
  def langIdPredict(text: Column,
      model: graft.expressions.HashedNgramMulticlassModel): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HashedNgramArgmax(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(text), model))

  /** CCNet's head/middle/tail partition over LM scores: corpus-level
    * exact percentile cuts (two scalars, broadcast), then a per-row
    * comparison — higher score = more reference-like = head. CCNet cuts
    * at thirds; the fractions are parameters (binary-exact values like
    * 0.25/0.75 make cross-engine verification bit-exact, which is why the
    * gate query uses quarters).
    *
    * Plan: one global exact-percentile aggregate over the score column +
    * a broadcast join — nothing else moves.
    */
  def lmPerplexityBuckets(scored: DataFrame, scoreCol: String,
      lo: Double = 1.0 / 3, hi: Double = 2.0 / 3): DataFrame = {
    val cuts = scored.agg(
      expr(s"percentile($scoreCol, $lo)").alias("__plo"),
      expr(s"percentile($scoreCol, $hi)").alias("__phi"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col(scoreCol) >= col("__phi"), "head")
          .when(col(scoreCol) >= col("__plo"), "middle")
          .otherwise("tail"))
      .drop("__plo", "__phi")
  }
}
