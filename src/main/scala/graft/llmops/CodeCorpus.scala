package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus curation — the source-file arm of pretraining data prep
  * (The Stack / StarCoder-style pipelines): language identification,
  * license screening, comment stripping, and per-file quality signals.
  * Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Language/license/quality are pure `Column` projections (codegen'd,
  * SQL-replayable, zero shuffles); comment stripping is a per-row JVM
  * state machine (strings and comments interlock — no regex does this
  * correctly) over the two big comment families. Everything scales on
  * row count alone.
  */
object CodeCorpus {

  /** extension (lowercase, no dot) → language. */
  private[llmops] val ExtLang: Seq[(String, String)] = Seq(
    "py" -> "python", "pyi" -> "python",
    "js" -> "javascript", "mjs" -> "javascript", "cjs" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "jsx" -> "javascript",
    "java" -> "java", "scala" -> "scala", "sc" -> "scala",
    "c" -> "c", "h" -> "c",
    "cc" -> "cpp", "cpp" -> "cpp", "cxx" -> "cpp", "hpp" -> "cpp",
    "go" -> "go", "rs" -> "rust", "rb" -> "ruby", "php" -> "php",
    "cs" -> "csharp", "kt" -> "kotlin", "kts" -> "kotlin",
    "swift" -> "swift", "m" -> "objective-c",
    "sh" -> "shell", "bash" -> "shell", "zsh" -> "shell",
    "pl" -> "perl", "pm" -> "perl", "lua" -> "lua", "r" -> "r",
    "sql" -> "sql", "html" -> "html", "htm" -> "html", "css" -> "css",
    "json" -> "json", "yaml" -> "yaml", "yml" -> "yaml",
    "toml" -> "toml", "xml" -> "xml", "md" -> "markdown",
    "hs" -> "haskell", "ml" -> "ocaml", "ex" -> "elixir",
    "exs" -> "elixir", "erl" -> "erlang", "dart" -> "dart",
    "jl" -> "julia", "zig" -> "zig", "nim" -> "nim")

  /** shebang interpreter token → language. */
  private[llmops] val ShebangLang: Seq[(String, String)] = Seq(
    "python" -> "python", "python3" -> "python", "node" -> "javascript",
    "bash" -> "shell", "sh" -> "shell", "zsh" -> "shell",
    "perl" -> "perl", "ruby" -> "ruby", "Rscript" -> "r")

  /** Language id: file extension first (the reliable signal), shebang
    * interpreter for extensionless scripts, NULL when neither knows.
    */
  def language(path: Column, content: Column): Column = {
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    val byExt = ExtLang.foldLeft(lit(null).cast("string")) {
      case (acc, (e, l)) => when(ext === e, lit(l)).otherwise(acc)
    }
    // interpreter = last path segment of the shebang target, env-aware:
    // "#!/usr/bin/env python3" and "#!/usr/bin/python3" both → python3
    val tok1 = regexp_extract(content,
      "\\A#!\\s*(?:\\S*/)?([A-Za-z0-9.]+)", 1)
    val tok2 = regexp_extract(content,
      "\\A#!\\s*\\S+\\s+([A-Za-z0-9.]+)", 1)
    val shebang = when(tok1 === "env", tok2).otherwise(tok1)
    val byShebang = ShebangLang.foldLeft(lit(null).cast("string")) {
      case (acc, (t, l)) => when(shebang === t, lit(l)).otherwise(acc)
    }
    coalesce(byExt, byShebang)
  }

  /** License detection: the SPDX identifier when present (the modern
    * convention — exact extract), else first-KB fingerprints of the
    * common license headers. NULL = no license signal (which for a
    * permissive-only corpus screen means DROP, not keep).
    */
  def license(content: Column): Column = {
    val spdx = regexp_extract(content,
      "SPDX-License-Identifier:\\s*([A-Za-z0-9+.\\-]+)", 1)
    val head = substring(content, 1, 1024)
    when(length(spdx) > 0, spdx)
      .when(head.contains("Permission is hereby granted, free of charge"),
        "MIT")
      .when(head.contains("Licensed under the Apache License, Version 2.0"),
        "Apache-2.0")
      .when(head.contains("Redistribution and use in source and binary forms"),
        "BSD-3-Clause")
      .when(head.contains("GNU General Public License"), "GPL")
      .when(head.contains("GNU Lesser General Public License"), "LGPL")
      .when(head.contains("Mozilla Public License"), "MPL-2.0")
      .otherwise(lit(null).cast("string"))
  }

  /** Repo-level license names recognized as a license FILE (last path
    * segment, lowercased).
    */
  private[llmops] val LicenseFileNames: Seq[String] = Seq(
    "license", "license.md", "license.txt", "licence", "copying",
    "copying.md", "unlicense")

  /** License propagation — the repo-policy step after per-file
    * detection: a repo's license is the (deterministic min of the)
    * license detected in its LICENSE/COPYING files; files keep their own
    * header license when present and inherit the repo's otherwise.
    * Appends `repo_license` and `effective_license`.
    *
    * Scale shape: the license-file subset aggregates to ONE narrow row
    * per repo, then a repo-keyed equi-join back — both shuffles on the
    * repo key; no broadcast assumption (repos can number in the
    * hundreds of millions at 100 TB).
    */
  def propagateLicense(df: DataFrame, repoCol: String, pathCol: String,
      licenseCol: String): DataFrame = {
    val name = lower(element_at(split(col(pathCol), "/"), -1))
    val repoLic = df
      .filter(name.isin(LicenseFileNames: _*) && col(licenseCol).isNotNull)
      .groupBy(col(repoCol))
      .agg(min(col(licenseCol)).as("repo_license"))
    df.join(repoLic, Seq(repoCol), "left")
      .withColumn("effective_license",
        coalesce(col(licenseCol), col("repo_license")))
  }

  /** Permissive-license gate for the usual pretraining policy. */
  def permissive(licenseCol: Column): Column =
    licenseCol.isin("MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause",
      "Unlicense", "CC0-1.0", "ISC", "MPL-2.0")

  /** Per-file quality signals: `n_lines`, `max_line_len`,
    * `avg_line_len`, `alpha_frac` (letter fraction — binary/minified
    * junk scores low), `is_generated` (the DO-NOT-EDIT conventions),
    * `is_minified` (single-line megafiles). One projection.
    */
  def qualitySignals(df: DataFrame, contentCol: String): DataFrame = {
    val lines = split(col(contentCol), "\n", -1)
    val lens = transform(lines, l => length(l))
    df
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("max_line_len",
        coalesce(array_max(lens), lit(0)).cast("long"))
      .withColumn("avg_line_len",
        round(length(col(contentCol)).cast("double") /
          greatest(size(lines), lit(1)), 3))
      .withColumn("alpha_frac",
        round(length(regexp_replace(col(contentCol), "[^A-Za-z]", ""))
          .cast("double") /
          greatest(length(col(contentCol)), lit(1)), 3))
      .withColumn("is_generated",
        substring(col(contentCol), 1, 1024).contains("DO NOT EDIT") ||
        substring(col(contentCol), 1, 1024).contains("@generated") ||
        substring(col(contentCol), 1, 1024).contains("Code generated by"))
      .withColumn("is_minified",
        (col("max_line_len") > 1000) && (col("n_lines") < 10))
  }

  /** Comment families for [[stripComments]]. */
  private def familyOf(lang: String): String = lang match {
    case "python" | "shell" | "perl" | "ruby" | "r" | "yaml" | "toml"
       | "nim" => "hash"
    case "c" | "cpp" | "java" | "javascript" | "typescript" | "scala"
       | "go" | "rust" | "csharp" | "kotlin" | "swift" | "objective-c"
       | "php" | "css" | "dart" | "zig" => "c"
    case _ => "none"
  }

  /** Strip comments with a real state machine (per family): C family
    * (slash-slash and nesting-free block form) and hash family, BOTH aware
    * of single/double-quoted strings with backslash escapes (and
    * python triple quotes) so a `//` inside a string literal survives.
    * Unknown languages pass through untouched — silently mangling an
    * unlexed language would be worse than leaving its comments in.
    */
  private[llmops] def stripCommentsStr(src: String, lang: String): String = {
    if (src == null) return null
    familyOf(lang) match {
      case "none" => src
      case fam =>
        val out = new java.lang.StringBuilder(src.length)
        val n = src.length
        var i = 0
        var mode = 0 // 0 code, 1 line comment, 2 block comment
        var quote: Char = 0 // 0 = not in a string
        var triple = false
        while (i < n) {
          val c = src.charAt(i)
          if (mode == 1) { // line comment: drop until newline
            if (c == '\n') { mode = 0; out.append(c) }
          } else if (mode == 2) { // block comment: drop until */
            if (c == '*' && i + 1 < n && src.charAt(i + 1) == '/') {
              mode = 0; i += 1
            }
          } else if (quote != 0 && triple) { // inside '''…''' / """…"""
            if (c == quote && i + 2 < n && src.charAt(i + 1) == quote &&
                src.charAt(i + 2) == quote) {
              out.append(c).append(c).append(c)
              i += 2; triple = false; quote = 0
            } else if (c == '\\' && i + 1 < n) {
              out.append(c).append(src.charAt(i + 1)); i += 1
            } else out.append(c)
          } else if (quote != 0) { // inside '…' / "…" / `…`
            out.append(c)
            if (c == '\\' && i + 1 < n) {
              out.append(src.charAt(i + 1)); i += 1
            // backtick strings (JS templates, Go raw) are legitimately
            // multi-line — only the unterminated-quote recovery of the
            // single-line families exits at a newline
            } else if (c == quote || (c == '\n' && quote != '`')) quote = 0
          } else if (fam == "hash" && c == '#') {
            mode = 1
          } else if (fam == "c" && c == '/' && i + 1 < n &&
              src.charAt(i + 1) == '/') {
            mode = 1; i += 1
          } else if (fam == "c" && c == '/' && i + 1 < n &&
              src.charAt(i + 1) == '*') {
            mode = 2; i += 1
          } else if (c == '"' || c == '\'' || (fam == "c" && c == '`')) {
            // backtick opens a string in the C family: JS/TS template
            // literals and Go raw strings are everywhere, and a URL's
            // "//" inside one used to start a line comment and strip
            // real code (backticks never appear in valid C/Java code,
            // so the extra delimiter cannot mis-lex those)
            if (fam == "hash" && i + 2 < n && src.charAt(i + 1) == c &&
                src.charAt(i + 2) == c) {
              triple = true; quote = c
              out.append(c).append(c).append(c); i += 2
            } else { quote = c; out.append(c) }
          } else out.append(c)
          i += 1
        }
        out.toString
    }
  }

  /** DataFrame form of [[stripCommentsStr]]: appends `code_nocomments`
    * using the per-row language column.
    */
  def stripComments(df: DataFrame, contentCol: String,
      langCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "code_nocomments", org.apache.spark.sql.types.StringType))
    val ci = df.schema.fieldIndex(contentCol)
    val li = df.schema.fieldIndex(langCol)
    df.map { row =>
      val lang = if (row.isNullAt(li)) "" else row.getString(li)
      org.apache.spark.sql.Row.fromSeq(
        row.toSeq :+ stripCommentsStr(row.getString(ci), lang))
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
