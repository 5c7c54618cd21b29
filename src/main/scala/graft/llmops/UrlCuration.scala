package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation: canonicalization + domain blocklist screening —
  * the step every web-corpus pipeline runs BEFORE text-level dedup
  * (C4's blocklist pass, CCNet/RefinedWeb URL dedup). Everything here
  * is a per-row scan projection: the blocklist is a bounded driver
  * artifact riding the task binary inside a native kernel (the same
  * shape as the hashed-n-gram classifier models), so screening a
  * 100 TB crawl costs one scan — zero joins, zero shuffles.
  */
object UrlCuration {

  /** Canonical URL ([[graft.expressions.UrlNormalize]]): lowercased
    * scheme/host, default ports and fragments stripped, tracking
    * parameters removed, query params sorted. NULL for not-a-URL text.
    */
  def urlNormalize(url: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UrlNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url)))

  /** Lowercased host ([[graft.expressions.UrlHost]]). */
  def urlHost(url: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UrlHost(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url)))

  /** Registrable-domain approximation ([[graft.expressions.UrlDomain]]). */
  def urlDomain(url: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UrlDomain(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url)))

  /** RFC 3986 reference resolution ([[graft.expressions.UrlResolve]]):
    * `urlResolve(base, ref)` — absolute refs pass through, relative
    * refs (incl. `//`, `/`, `?`, dot segments) resolve against base.
    */
  def urlResolve(base: Column, ref: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UrlResolve(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(base),
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(ref)))

  /** Canonical-aware URL key for crawl dedup: the page's
    * `<link rel=canonical>` (resolved against the capture URL — it is
    * routinely relative) when present, else the capture URL itself,
    * both through [[urlNormalize]]. The strongest "many URLs, one
    * page" signal a crawl offers, as one scan-local expression.
    */
  def canonicalUrlKey(targetUri: Column, canonicalHref: Column): Column =
    coalesce(
      urlNormalize(urlResolve(targetUri, canonicalHref)),
      urlNormalize(targetUri))

  /** `true` when the URL's host — or ANY parent domain of it — appears
    * in `blocked` (UT1-convention suffix matching: blocking
    * `example.com` blocks `a.b.example.com`; blocking `ads.example.com`
    * leaves `example.com` alone), `false` when clean, NULL when the URL
    * refuses to parse. The set is checked with O(labels) hash probes
    * per row — no explode, no join.
    *
    * `blocked` entries must be lowercase hosts/domains; the set is a
    * bounded driver artifact (UT1 adult ≈ 4M entries ≈ tens of MB —
    * fine in the task binary; anything far beyond that belongs in a
    * bloom-filtered store, not a closure).
    */
  def urlBlocked(url: Column, blocked: Set[String]): Column = {
    require(blocked.size <= MaxBlocklistEntries,
      s"blocklist has ${blocked.size} entries, over the " +
        s"$MaxBlocklistEntries task-binary budget (~hundreds of MB of " +
        "hosts); screen with a join against a domain table instead " +
        "(blocklistFilter(df, urlCol, blockedDomains: DataFrame) or a " +
        "left_anti join on urlDomain)")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.UrlBlocked(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url), blocked))
  }

  /** Ceiling on [[urlBlocked]]'s embedded set: UT1-class lists are
    * 4–5 M domains (~100 MB captured into every task binary) — inside
    * this bound by design margin; anything larger must join instead of
    * riding the closure.
    */
  val MaxBlocklistEntries: Int = 8000000

  /** Appends `url_blocked` from [[urlBlocked]] — the screen form. */
  def blocklistScreen(df: DataFrame, urlCol: String,
      blocked: Set[String]): DataFrame =
    df.withColumn("url_blocked", urlBlocked(col(urlCol), blocked))

  /** The filter form: drops rows whose URL suffix-matches the
    * blocklist. Rows whose URL refuses to parse are KEPT — a blocklist
    * must not silently eat malformed-URL rows that later stages may
    * still want; screen those separately.
    */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blocked: Set[String]): DataFrame =
    df.filter(!coalesce(urlBlocked(col(urlCol), blocked), lit(false)))

  /** robots.txt verdict ([[graft.expressions.RobotsAllowed]], RFC
    * 9309): may `agent` fetch `url` under `robotsTxt`? NULL robots →
    * allowed (fetch-failed default, via the coalesce here); NULL when
    * the URL refuses to parse.
    */
  def robotsAllowed(robotsTxt: Column, url: Column,
      agent: String = "*"): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.RobotsAllowed(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(
          coalesce(robotsTxt, lit(""))),
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url), agent))

  /** Host-count ceiling for broadcasting the robots table: above this
    * the per-host rules (~1 KB robots.txt each) stop fitting executor
    * memory and [[robotsScreen]] falls back to a shuffled equi-join.
    * A real-crawl host universe is ~10⁸ — always the shuffle path;
    * fixtures and per-site ingestion stay on the broadcast path.
    */
  val MaxBroadcastRobotsHosts: Long = 1000000L

  /** The crawl-politeness screen: join each page's host against the
    * per-host robots table (`host`, `robots_txt`) and append
    * `robots_allowed`. Hosts absent from the table default to allowed;
    * URLs that refuse to parse screen NULL.
    *
    * Join shape is SIZE-GATED: when the robots table has at most
    * `maxBroadcastHosts` rows (one cheap early-stopping count — the
    * table is a side input, not the corpus) it is broadcast and the
    * corpus never shuffles; beyond that — a web-scale host universe is
    * ~10⁸ hosts × ~1 KB robots.txt, far past any broadcast budget —
    * the screen becomes a shuffled equi-join on the page host, which
    * scales with executors instead of exploding one JVM.
    */
  def robotsScreen(df: DataFrame, urlCol: String,
      robots: DataFrame, agent: String = "*",
      maxBroadcastHosts: Long = MaxBroadcastRobotsHosts): DataFrame = {
    // one row per host: a robots table merged from several crawl
    // snapshots can carry a host twice, and a row-preserving left join
    // would silently DUPLICATE every corpus row for that host; keep the
    // longest robots_txt per host (a deterministic winner)
    val rhs = robots.select(lower(col("host")).as("__host"),
      col("robots_txt").as("__robots"))
      .groupBy(col("__host"))
      .agg(max_by(col("__robots"),
        struct(length(col("__robots")), col("__robots"))).as("__robots"))
    // early-stopping cardinality probe: scans at most threshold+1 rows
    val small = robots.limit(
      math.min(maxBroadcastHosts, Int.MaxValue - 1L).toInt + 1)
      .count() <= maxBroadcastHosts
    df.withColumn("__host", urlHost(col(urlCol)))
      .join(if (small) broadcast(rhs) else rhs, Seq("__host"), "left_outer")
      .withColumn("robots_allowed",
        robotsAllowed(col("__robots"), col(urlCol), agent))
      .drop("__host", "__robots")
  }

  /** Sitemap parse ([[graft.expressions.SitemapUrls]], sitemaps.org):
    * `array<struct<kind, loc, lastmod>>` from XML urlsets, sitemap
    * indexes, plain-text lists, any of them gzipped; NULL for
    * none-of-these. The discovery companion of [[robotsScreen]].
    */
  def sitemapUrls(content: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SitemapUrls(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** All label-boundary suffixes of the URL's host
    * ([[graft.expressions.HostSuffixes]]): `a.b.c` → `[a.b.c, b.c, c]`;
    * NULL for not-a-URL text. The join key of the shuffled blocklist.
    */
  def hostSuffixes(url: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.HostSuffixes(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(url)))

  /** Entry ceiling for COLLECTING the blocklist into the task binary:
    * past ~1M domains (~tens of MB serialized per task) the collected
    * set stops being the cheap path and the screen flips to the
    * shuffled suffix join. UT1-class lists stay collected; a web-scale
    * union of lists takes the join.
    */
  val MaxCollectBlocklistEntries: Long = 1000000L

  /** [[blocklistFilter]] from a one-column (`domain`) DataFrame. The
    * join shape is SIZE-GATED like [[robotsScreen]]: at most
    * `maxCollectEntries` distinct domains (one early-stopping count —
    * the list is a side input, not the corpus) the list is collected
    * into the per-row kernel and screening costs one scan; beyond that
    * the screen reproduces [[urlBlocked]]'s suffix semantics
    * distributively — explode each URL's host suffixes
    * ([[hostSuffixes]]), semi-join against the list to find blocked
    * row ids, anti-join those back — so an unbounded list can never
    * OOM the driver or the task binary.
    */
  def blocklistFilter(df: DataFrame, urlCol: String,
      blockedDomains: DataFrame,
      maxCollectEntries: Long = MaxCollectBlocklistEntries): DataFrame = {
    val cap = math.min(maxCollectEntries, MaxBlocklistEntries.toLong)
    val distinctDomains =
      blockedDomains.select(lower(col("domain")).as("domain")).distinct()
    val small =
      distinctDomains.limit(math.min(cap, Int.MaxValue - 1L).toInt + 1)
        .count() <= cap
    if (small)
      blocklistFilter(df, urlCol,
        distinctDomains.collect().map(_.getString(0)).toSet)
    else {
      // Shuffled form: suffix-expand (bounded by host label count, a
      // handful of narrow rows per URL), semi-join the list, anti-join
      // the hit ids back. The corpus shuffles once on the synthetic row
      // id; the suffix rows are (id, suffix) only — never corpus bytes.
      // localCheckpoint is LOAD-BEARING: monotonically_increasing_id is
      // only stable within one evaluation — `hits` and the anti-join's
      // left side would otherwise evaluate the plan twice, and a
      // shuffle upstream (or a task retry) can renumber rows between
      // the two runs, silently dropping clean URLs and keeping blocked
      // ones. Materializing pins one id assignment for both consumers.
      val keyed = df.withColumn("__rid", monotonically_increasing_id())
        .localCheckpoint(true)
      val hits = keyed
        .select(col("__rid"),
          explode(hostSuffixes(col(urlCol))).as("__suffix"))
        .join(distinctDomains, col("__suffix") === col("domain"), "left_semi")
        .select(col("__rid")).distinct()
      keyed.join(hits, Seq("__rid"), "left_anti").drop("__rid")
    }
  }
}
