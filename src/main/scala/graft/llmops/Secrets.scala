package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Credential scanning and redaction for code corpora — the screen every
  * public-code training set runs before release (leaked keys must not be
  * memorized). Reference hook: PII handling in the curation layer,
  * `aje_libs/common/helpers/` utilities; the pattern family itself is the
  * public gitleaks/trufflehog rule canon.
  *
  * Two tiers:
  *   - pattern tier: the well-known token shapes (AWS, GitHub, Slack, PEM,
  *     JWT, quoted credential assignments) as pure `Column` regex
  *     projections — codegen'd, SQL-replayable, zero shuffles;
  *   - entropy tier: long base64/hex-charset runs whose Shannon entropy
  *     exceeds a threshold (catches the random-secret long tail that has
  *     no fixed prefix), a per-row JVM scan like [[CodeCorpus.stripComments]].
  *
  * Both scale on row count alone; redaction is in-place string surgery so
  * downstream dedup/tokenization see stable placeholder text.
  */
object Secrets {

  /** kind → Java/RE2-compatible pattern (no backtracking constructs, so
    * the DuckDB oracle replays them verbatim). Order matters: redaction
    * applies them in sequence, most-specific first.
    */
  val Patterns: Seq[(String, String)] = Seq(
    "aws_key" -> "(?:A3T[A-Z0-9]|AKIA|ASIA|ABIA|ACCA)[A-Z0-9]{16}",
    "github_token" -> "gh[pousr]_[A-Za-z0-9]{36}",
    "slack_token" -> "xox[baprs]-[A-Za-z0-9-]{10,}",
    "private_key" -> "-----BEGIN [A-Z ]*PRIVATE KEY-----",
    "jwt" -> "eyJ[A-Za-z0-9_-]{4,}\\.[A-Za-z0-9_-]{4,}\\.[A-Za-z0-9_-]{4,}",
    "credential_assignment" ->
      "(?i)(?:api[_-]?key|secret|token|passwd|password)\\s*[:=]\\s*[\"'][^\"']{8,}[\"']")

  /** Comma-joined kind names present in `content` (stable Patterns order;
    * empty string = clean). `concat_ws` skips NULLs on both engines.
    */
  def kinds(content: Column): Column =
    concat_ws(",", Patterns.map { case (k, p) =>
      when(content.rlike(p), lit(k)).otherwise(lit(null).cast("string"))
    }: _*)

  /** Total non-overlapping matches across all kinds. */
  def count(content: Column): Column =
    Patterns.map { case (_, p) => regexp_count(content, lit(p)) }
      .reduce(_ + _).cast("long")

  /** Replace every match with `[REDACTED:<kind>]`, kinds applied in
    * Patterns order (deterministic when shapes overlap).
    */
  def redact(content: Column): Column =
    Patterns.foldLeft(content) { case (c, (k, p)) =>
      regexp_replace(c, p, s"[REDACTED:$k]")
    }

  /** Appends `secret_kinds`, `n_secrets`, `content_redacted` — the whole
    * pattern tier in one projection.
    */
  def screen(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("secret_kinds", kinds(col(contentCol)))
      .withColumn("n_secrets", count(col(contentCol)))
      .withColumn("content_redacted", redact(col(contentCol)))

  /** Shannon entropy in bits/char of `s` (0 for empty). */
  private[llmops] def shannonEntropy(s: String): Double = {
    if (s == null || s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Char, Int]
    var i = 0
    while (i < s.length) {
      counts.merge(s.charAt(i), 1, Integer.sum); i += 1
    }
    var h = 0.0
    counts.forEach { (_, c) =>
      val p = c.toDouble / s.length
      h -= p * (math.log(p) / math.log(2))
    }
    h
  }

  private def isB64(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '=' ||
    c == '-' || c == '_'

  /** The entropy tier: maximal base64/hex-charset runs of length ≥
    * `minLen` whose Shannon entropy is ≥ `minBits` bits/char. 4.5 bits
    * is the conventional base64 threshold — long camelCase identifiers
    * sit near 4.1, random 64-charset tokens above 4.6.
    */
  private[llmops] def highEntropyTokens(s: String, minLen: Int = 20,
      minBits: Double = 4.5): Seq[String] = {
    if (s == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      if (isB64(s.charAt(i))) {
        var j = i + 1
        while (j < n && isB64(s.charAt(j))) j += 1
        if (j - i >= minLen) {
          val run = s.substring(i, j)
          if (shannonEntropy(run) >= minBits) out += run
        }
        i = j
      } else i += 1
    }
    out.toSeq
  }

  /** DataFrame form of the entropy tier: appends `entropy_hits`
    * (array of flagged runs) and `content_entropy_redacted` with each
    * run replaced by `[REDACTED:entropy]`. Per-row JVM map — same
    * distribution shape as the comment stripper.
    */
  def entropyScreen(df: DataFrame, contentCol: String, minLen: Int = 20,
      minBits: Double = 4.5): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++
      Seq(
        org.apache.spark.sql.types.StructField("entropy_hits",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("content_entropy_redacted",
          org.apache.spark.sql.types.StringType)))
    val ci = df.schema.fieldIndex(contentCol)
    df.map { row =>
      val s = row.getString(ci)
      val hits = highEntropyTokens(s, minLen, minBits)
      val red = hits.foldLeft(s)((acc, h) =>
        acc.replace(h, "[REDACTED:entropy]"))
      org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(hits, red))
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
