package graft

import graft.dsl.TransformCompiler
import graft.llmops.TextAnalysis
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** SQL surface for the engine's scalar operators: registers `graft_*`
  * functions so `spark.sql` users get the transformation DSL and the text
  * operators without touching the Scala API.
  *
  * Usable two ways:
  *   - `SparkSession.builder.withExtensions(new GraftExtensions)` — plants
  *     the functions at session build time (the SparkSessionExtensions
  *     path, also wired via `spark.sql.extensions=graft.GraftExtensions`);
  *   - `GraftFunctions.register(spark)` — adds them to a live session.
  *
  * All functions compile to the same pure Catalyst expressions the Column
  * API produces — registration adapts Column builders to
  * `Seq[Expression] => Expression` via the Column↔Expression bridge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // custom physical operators (graft.plans) plan through this strategy
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}

object GraftFunctions {

  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expressionEager(col)

  private def litText(expr: Expression, fn: String, arg: String): String =
    expr match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal =>
        Option(l.value).map(_.toString).getOrElse("to_null")
      case other =>
        throw new IllegalArgumentException(s"$fn: $arg must be a string literal, got $other")
    }

  /** (name, usage, builder). */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_clear_string",
      "graft_clear_string(str[, default]) - trim; blank/'None'/'NULL' become default (or NULL)",
      exprs => e(TransformCompiler.clearString(c(exprs.head), exprs.lift(1).map(c)))),

    ("graft_date_magic",
      "graft_date_magic(v[, fmt[, default]]) - FoxPro day number or formatted date string to DATE",
      exprs => e(TransformCompiler.dateMagic(
        c(exprs.head),
        exprs.lift(1).map(litText(_, "graft_date_magic", "fmt")).getOrElse("yyyy-MM-dd"),
        exprs.lift(2).map(litText(_, "graft_date_magic", "default")).getOrElse("to_null")))),

    ("graft_datetime_magic",
      "graft_datetime_magic(d, t[, default]) - FoxPro date number + HHMMSS time to TIMESTAMP",
      exprs => e(TransformCompiler.datetimeMagic(
        c(exprs.head), c(exprs(1)),
        exprs.lift(2).map(litText(_, "graft_datetime_magic", "default")).getOrElse("to_null")))),

    ("graft_byte_magic",
      "graft_byte_magic(v[, default]) - byte/char/hex flag to 'T'/'F'",
      exprs => e(TransformCompiler.byteMagic(
        c(exprs.head),
        exprs.lift(1).map(c).getOrElse(org.apache.spark.sql.functions.lit("F"))))),

    ("graft_period_magic",
      "graft_period_magic(month, year) - 'YYYYMM' period; NULLs become '190001'",
      exprs => e(TransformCompiler.periodMagic(c(exprs.head), c(exprs(1))))),

    ("graft_fingerprint",
      "graft_fingerprint(text) - md5 of whitespace-normalized lower-cased text",
      exprs => e(TextAnalysis.fingerprint(c(exprs.head)))),

    ("graft_token_count",
      "graft_token_count(text) - whitespace token count",
      exprs => e(TextAnalysis.tokenCount(c(exprs.head)))),

    ("graft_lang_id",
      "graft_lang_id(text) - stopword-heuristic language id (en/es/de/fr/und)",
      exprs => e(TextAnalysis.langId(c(exprs.head)))),

    ("graft_simhash",
      "graft_simhash(text) - 64-bit SimHash of the token stream (native codegen'd kernel)",
      exprs => graft.expressions.SimHash64(exprs.head, portable = false)),

    ("graft_minhash_sig",
      "graft_minhash_sig(text[, n, numHashes]) - MinHash signature over word n-gram shingles",
      exprs => graft.expressions.MinHashSig(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_minhash_sig", "n").toInt).getOrElse(3),
        exprs.lift(2).map(litText(_, "graft_minhash_sig", "numHashes").toInt).getOrElse(16))),

    ("graft_lsh_buckets",
      "graft_lsh_buckets(vec[, numPlanes, numTables]) - sign-random-projection bucket id per table",
      exprs => graft.expressions.LshBuckets(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_lsh_buckets", "numPlanes").toInt).getOrElse(12),
        exprs.lift(2).map(litText(_, "graft_lsh_buckets", "numTables").toInt).getOrElse(4))),

    ("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two numeric arrays (native codegen'd kernel)",
      exprs => graft.expressions.CosineSim(exprs.head, exprs(1))),

    ("graft_winnow",
      "graft_winnow(text[, k, w]) - winnowing fingerprints (MOSS): array of selected k-gram hashes",
      exprs => graft.expressions.WinnowFingerprint(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_winnow", "k").toInt).getOrElse(7),
        exprs.lift(2).map(litText(_, "graft_winnow", "w").toInt).getOrElse(4))),

    ("graft_cut_spans",
      "graft_cut_spans(text, starts, spanLen) - remove the union of fixed-length char spans (exact-substring dedup kernel)",
      exprs => graft.expressions.CutSpans(
        exprs.head,
        // the kernel reads longs; a bare SQL array(2, 4) is array<int>
        // and would be reinterpreted, not converted, without the cast.
        // SortArray: the kernel's single-pass span union REQUIRES
        // ascending starts (a scaladoc-only contract internal callers
        // honor) — sorting here is cheap and idempotent, and protects
        // SQL callers from silently wrong output on unsorted input
        org.apache.spark.sql.catalyst.expressions.SortArray(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)),
          org.apache.spark.sql.catalyst.expressions.Literal(true)),
        litText(exprs(2), "graft_cut_spans", "spanLen").toInt)),

    ("graft_html_main",
      "graft_html_main(html[, maxLinkDensity, minWords]) - readability-style main-content extraction (boilerplate removal)",
      exprs => graft.expressions.HtmlMainContent(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_html_main", "maxLinkDensity").toDouble).getOrElse(0.5),
        exprs.lift(2).map(litText(_, "graft_html_main", "minWords").toInt).getOrElse(3))),

    ("graft_word_ngrams",
      "graft_word_ngrams(text[, n]) - distinct word n-grams (native kernel)",
      exprs => graft.expressions.WordNGrams(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_word_ngrams", "n").toInt).getOrElse(3),
        distinct = true)),

    ("graft_char_ngrams",
      "graft_char_ngrams(text[, k]) - distinct normalized char k-grams (native kernel)",
      exprs => graft.expressions.CharNGrams(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_char_ngrams", "k").toInt).getOrElse(5))),

    ("graft_doc_extract",
      "graft_doc_extract(content, mime) - document text extraction (plain/HTML/Markdown/OOXML/PDF), NULL for unsupported",
      exprs => graft.expressions.DocExtractText(exprs.head, exprs(1))),

    ("graft_image_dims",
      "graft_image_dims(content) - struct(format,width,height) from PNG/JPEG/GIF/BMP headers, NULL if unrecognized",
      exprs => graft.expressions.ImageDims(exprs.head)),

    ("graft_av_meta",
      "graft_av_meta(content) - struct(format,channels,sample_rate,bits,duration_ms) from WAV/MP4 headers, NULL if unrecognized",
      exprs => graft.expressions.AvMeta(exprs.head)),

    ("graft_png_pixels",
      "graft_png_pixels(content) - full PNG pixel decode (inflate + unfilter): struct(width,height,channels,pix_sum,pix_wsum,mean_r,mean_g,mean_b), NULL if not a decodable RGB/RGBA PNG",
      exprs => graft.expressions.PngPixels(exprs.head)),

    ("graft_png_dhash",
      "graft_png_dhash(content) - 64-bit perceptual difference hash (9x8 grayscale gradient grid), NULL if not a decodable RGB/RGBA PNG of at least 9x8",
      exprs => graft.expressions.PngDHash(exprs.head)),

    ("graft_jpeg_pixels",
      "graft_jpeg_pixels(content) - full baseline-JPEG pixel decode (Huffman + IDCT + YCbCr): struct(width,height,channels,pix_sum,pix_wsum,mean_r,mean_g,mean_b), NULL if not baseline sequential",
      exprs => graft.expressions.JpegPixels(exprs.head)),

    ("graft_jpeg_dhash",
      "graft_jpeg_dhash(content) - 64-bit perceptual difference hash of a baseline JPEG (same grid/bit layout as graft_png_dhash), NULL if undecodable or under 9x8",
      exprs => graft.expressions.JpegDHash(exprs.head)),

    ("graft_jpeg_exif_orientation",
      "graft_jpeg_exif_orientation(content) - EXIF orientation 1-8 from the APP1 TIFF IFD, NULL when absent or malformed",
      exprs => graft.expressions.JpegExifOrientation(exprs.head)),

    ("graft_jpeg_dhash_oriented",
      "graft_jpeg_dhash_oriented(content) - orientation-normalized 64-bit dHash (EXIF display transform applied to the grid), NULL if undecodable or display dims under 9x8",
      exprs => graft.expressions.JpegDHashOriented(exprs.head)),

    ("graft_url_normalize",
      "graft_url_normalize(url) - canonical URL: lowercase scheme/host, default ports + fragments + tracking params stripped, query params sorted; NULL if not a URL",
      exprs => graft.expressions.UrlNormalize(exprs.head)),

    ("graft_url_host",
      "graft_url_host(url) - lowercased host (userinfo/port stripped), NULL if not a URL",
      exprs => graft.expressions.UrlHost(exprs.head)),

    ("graft_url_resolve",
      "graft_url_resolve(base, ref) - RFC 3986 reference resolution (absolute/scheme-relative/root-relative/relative-with-dot-segments)",
      exprs => graft.expressions.UrlResolve(exprs.head, exprs(1))),

    ("graft_html_meta",
      "graft_html_meta(content) - HTML head metadata: struct(title,canonical,description,lang,noindex,nofollow), NULL if no markup",
      exprs => graft.expressions.HtmlMeta(exprs.head)),

    ("graft_sitemap_urls",
      "graft_sitemap_urls(content) - sitemaps.org parse: array<struct<kind,loc,lastmod>> from XML urlset/sitemapindex, text lists, gzipped variants; NULL otherwise",
      exprs => graft.expressions.SitemapUrls(exprs.head)),

    ("graft_robots_allowed",
      "graft_robots_allowed(robots_txt, url[, agent]) - RFC 9309 verdict: may agent fetch url under this robots.txt (wildcards, $ anchor, longest-match, allow tie-win)",
      exprs => graft.expressions.RobotsAllowed(exprs.head, exprs(1),
        exprs.lift(2).map(litText(_, "graft_robots_allowed", "agent")).getOrElse("*"))),

    ("graft_url_domain",
      "graft_url_domain(url) - registrable-domain approximation (eTLD+1 heuristic), NULL if not a URL",
      exprs => graft.expressions.UrlDomain(exprs.head)),

    ("graft_gif_dhash",
      "graft_gif_dhash(content) - 64-bit perceptual dHash of a GIF's first composited frame (same grid/bit layout as graft_png_dhash), NULL if undecodable or under 9x8",
      exprs => graft.expressions.GifDHash(exprs.head)),

    ("graft_gif_frames",
      "graft_gif_frames(content) - animated-GIF composited frames as array<binary> (each a complete 8-bit RGB PNG) in stream order, NULL if not a well-formed GIF",
      exprs => graft.expressions.GifFrames(exprs.head)),

    ("graft_tiff_pages",
      "graft_tiff_pages(content) - multi-page TIFF pages as array<binary> (each a complete 8-bit RGB PNG) in IFD-chain order, NULL if any page refuses",
      exprs => graft.expressions.TiffPages(exprs.head)),

    ("graft_decompress",
      "graft_decompress(content) - sniff gzip/bzip2/xz/zstd/lz4 by magic and decompress; NULL for unknown or malformed streams",
      exprs => graft.expressions.DecompressBytes(exprs.head)),

    ("graft_wiki_pages",
      "graft_wiki_pages(content) - MediaWiki dump XML (plain or compressed) as array<struct<title,ns,page_id,redirect,text,plain>>",
      exprs => graft.expressions.WikiPages(exprs.head)),

    ("graft_cdc_chunks",
      "graft_cdc_chunks(content) - content-defined chunking (FastCDC, 2K/8K/64K) as array<struct<offset,size,hash>>",
      exprs => graft.expressions.CdcChunks(exprs.head)),

    ("graft_cdx_records",
      "graft_cdx_records(content) - CDXJ crawl-index shard (plain or compressed) as array<struct<surt,ts,url,mime,status,digest,filename,offset,length>>",
      exprs => graft.expressions.CdxRecords(exprs.head)),

    ("graft_feed_entries",
      "graft_feed_entries(content) - RSS 2.0 / Atom feed (plain or compressed) as array<struct<title,link,published,summary>>",
      exprs => graft.expressions.FeedEntries(exprs.head)),

    ("graft_zip_entries",
      "graft_zip_entries(content) - zip archive of documents as array<struct<name,mime,text>> (per-entry sniff + extract)",
      exprs => graft.expressions.ZipEntries(exprs.head)),

    ("graft_eml_messages",
      "graft_eml_messages(content) - RFC 5322 message or mbox mailbox (plain or compressed) as array<struct<subject,from,date,text>>",
      exprs => graft.expressions.EmlMessages(exprs.head)),

    ("graft_webp_dhash",
      "graft_webp_dhash(content) - 64-bit perceptual dHash of a lossless WebP (same grid/bit layout as graft_png_dhash), NULL if undecodable or under 9x8",
      exprs => graft.expressions.WebpDHash(exprs.head)),

    ("graft_bmp_dhash",
      "graft_bmp_dhash(content) - 64-bit perceptual dHash of an uncompressed BMP (same grid/bit layout as graft_png_dhash), NULL if undecodable or under 9x8",
      exprs => graft.expressions.BmpDHash(exprs.head)),

    ("graft_tiff_dhash",
      "graft_tiff_dhash(content) - 64-bit perceptual dHash of a baseline TIFF (uncompressed/PackBits; same grid/bit layout as graft_png_dhash), NULL if undecodable or under 9x8",
      exprs => graft.expressions.TiffDHash(exprs.head)),

    ("graft_image_hist_stats",
      "graft_image_hist_stats(content) - grayscale histogram stats of a PNG/baseline-JPEG: struct(width,height,channels,gray_entropy,gray_min,gray_max,frac_max_bin), NULL if undecodable",
      exprs => graft.expressions.ImageHistStats(exprs.head)),

    ("graft_pdf_images",
      "graft_pdf_images(content) - embedded /DCTDecode raster images of a PDF as array<binary> (each a complete baseline JPEG), NULL if not a PDF",
      exprs => graft.expressions.PdfImages(exprs.head)),

    ("graft_avi_frames",
      "graft_avi_frames(content) - MJPEG AVI frame payloads as array<binary> in stream order, NULL if not a well-formed RIFF/AVI",
      exprs => graft.expressions.AviFrames(exprs.head)),

    ("graft_mp4_frames",
      "graft_mp4_frames(content) - motion-JPEG MP4/MOV sample payloads as array<binary> in sample order (stsd/stsz/stsc/stco walk), NULL if not a well-formed motion-JPEG ISO BMFF file",
      exprs => graft.expressions.Mp4Frames(exprs.head)),

    ("graft_video_frames",
      "graft_video_frames(content) - container-agnostic motion-JPEG frame payloads (RIFF/AVI or ISO BMFF MP4/MOV) as array<binary>, NULL if neither container parses",
      exprs => graft.expressions.VideoFrames(exprs.head)),

    ("graft_wav_samples",
      "graft_wav_samples(content) - 16-bit PCM WAV sample decode: struct(channels,sample_rate,n_frames,samp_sum,samp_wsum,peak_abs), NULL if not complete 16-bit PCM",
      exprs => graft.expressions.WavSamples(exprs.head)),

    ("graft_wav_envelope_hash",
      "graft_wav_envelope_hash(content) - 64-bit energy-envelope audio fingerprint (65-cell loudness contour), NULL if not decodable or under 65 frames",
      exprs => graft.expressions.WavEnvelopeHash(exprs.head)),

    ("graft_wav_spectral_hash",
      "graft_wav_spectral_hash(content) - 64-bit spectral audio fingerprint (8x8 time x DFT-band gradient grid), NULL if undecodable, under 128 frames, or over 2 channels",
      exprs => graft.expressions.WavSpectralHash(exprs.head)),

    ("graft_scrub_pii",
      "graft_scrub_pii(text) - emails/IPs/phones to typed tokens (RE2-portable patterns)",
      exprs => e(TextAnalysis.scrubPii(c(exprs.head)))),

    ("graft_unicode_norm",
      "graft_unicode_norm(text[, form]) - UAX #15 normalization (NFC default; NFD/NFKC/NFKD)",
      exprs => graft.expressions.UnicodeNorm(
        exprs.head,
        exprs.lift(1).map(litText(_, "graft_unicode_norm", "form")).getOrElse("NFC"))),

    // graft_url_host/_domain/_normalize are the NATIVE UrlOps kernels
    // (registered above); the regexp-composed TextAnalysis forms remain
    // the SQL-replayable twins behind the q70 gate.
    ("graft_dedup_lines",
      "graft_dedup_lines(text) - drop repeated lines, first occurrence kept",
      exprs => e(TextAnalysis.dedupLines(c(exprs.head))))
  )

  /** Register on a live session (temp functions, session-scoped).
    * Idempotent: already-registered names are left alone, so repeated calls
    * (every suite / query entry registers defensively) don't emit a
    * "replaced a previously registered function" warning per function.
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(new FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
