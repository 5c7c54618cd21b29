package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the document-text path mirroring the
  * reference's extractors (aje_libs/documents/helpers/document_processor.py:
  * 10-83 — whole-document and chunked text extraction).
  *
  * Document TEXT extraction is real for library-free formats — see
  * [[DocumentText]] (plain/HTML/Markdown, oracle-checked end-to-end by
  * q48). The image/audio/video codec step is STUBBED (no native media
  * libraries in this environment — see [[StubCodec]]); everything
  * Spark-side is real and tested: schemas, binaryFile ingestion,
  * partition-preserving mapPartitions batching, and chunk explode.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|document
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("source_path", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)
  ))

  /** S6-equivalent ingestion: a directory of files → asset rows.
    * `binaryFile` gives (path, modificationTime, length, content) with
    * partition-parallel reads; asset ids are stable hashes of the path.
    *
    * `binaryFile` is NOT splittable — one file is at most one task — so
    * a directory of a few large shards (or ONE giant tar) scans as a
    * few partitions and every downstream per-row battery (codec decode,
    * media parse, curation signals) runs on a handful of cores no
    * matter the cluster size. `minPartitions` (default: the session's
    * parallelism) repartitions after the scan whenever the scan came
    * back coarser — a round-robin shuffle of the asset rows, paid once,
    * so decode work fans out to every executor. Pass 0 to keep the
    * scan's own partitioning.
    */
  def readBinaryAssets(spark: SparkSession, dir: String, modality: String,
      minPartitions: Int = -1): DataFrame = {
    val target =
      if (minPartitions >= 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val scanned = spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).alias("asset_id"),
        lit(modality).alias("modality"),
        col("content"),
        lit(null).cast(StringType).alias("mime_type"),
        col("path").alias("source_path"),
        map(lit("length"), col("length").cast(StringType)).alias("meta"))
    if (target > 0 && scanned.rdd.getNumPartitions < target)
      scanned.repartition(target)
    else scanned
  }

  /** REAL image metadata from binary headers — PNG/JPEG/GIF/BMP dimensions
    * parsed by the native codegen'd [[graft.expressions.ImageDims]]
    * expression (no imaging library needed for header fields). NULL struct
    * for unrecognized bytes. This is the size/aspect-filter input a
    * curation pipeline actually needs at scan time; full pixel decode
    * remains behind [[StubCodec]].
    */
  def imageDims(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ImageDims(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `img` (struct&lt;format,width,height&gt;, NULL when unrecognized)
    * from the binary content column — scan-projection local, no shuffle.
    */
  def withImageDims(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("img", imageDims(col(contentCol)))

  /** REAL pixel decode for PNG — IDAT inflate (JDK zlib) + full
    * five-filter unfilter by the native [[graft.expressions.PngPixels]]
    * expression, returning per-image pixel statistics
    * (struct&lt;width,height,channels,pix_sum,pix_wsum,mean_r,mean_g,mean_b&gt;,
    * NULL for anything but a well-formed non-interlaced 8-bit RGB/RGBA
    * PNG). Scan-projection local like [[imageDims]]; decoded pixels never
    * leave the expression, only their statistics do — the shape a
    * quality/brightness/entropy filter wants at scan time. Other codecs
    * (JPEG entropy decode needs a DCT library) remain behind
    * [[StubCodec]].
    */
  def pngPixels(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PngPixels(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `px` from [[pngPixels]] — scan-projection local, no shuffle. */
  def withPngPixels(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("px", pngPixels(col(contentCol)))

  /** 64-bit perceptual difference hash of a PNG (9×8 grayscale gradient
    * grid — [[graft.expressions.PngDHash]]), NULL for undecodable bytes
    * or images smaller than the grid. Per-row scan projection like
    * [[pngPixels]]; the 8-byte hash is what leaves the scan, which is
    * the whole point at 100 TB — image near-dup becomes a join on
    * longs, never on pixels.
    */
  def pngDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PngDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `dhash` from [[pngDHash]] — scan-projection local. */
  def withPngDHash(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("dhash", pngDHash(col(contentCol)))

  /** REAL pixel decode for baseline JPEG — marker walk, Huffman entropy
    * decode, dequantization, separable IDCT, chroma upsampling and
    * YCbCr→RGB by the native [[graft.expressions.JpegPixels]] expression
    * (JDK-only, no imaging library), returning the same statistics
    * struct as [[pngPixels]]. NULL outside the baseline envelope
    * (progressive/arithmetic/12-bit refused). Scan-projection local.
    */
  def jpegPixels(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.JpegPixels(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `px` from [[jpegPixels]] — scan-projection local, no shuffle. */
  def withJpegPixels(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("px", jpegPixels(col(contentCol)))

  /** 64-bit perceptual difference hash of a baseline JPEG
    * ([[graft.expressions.JpegDHash]]) — same grid and bit layout as
    * [[pngDHash]], so PNG and JPEG hashes share one Hamming space.
    */
  def jpegDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.JpegDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** EXIF orientation (1-8) of a JPEG, NULL when absent
    * ([[graft.expressions.JpegExifOrientation]]).
    */
  def jpegExifOrientation(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.JpegExifOrientation(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Orientation-normalized JPEG dHash
    * ([[graft.expressions.JpegDHashOriented]]): the hash of the picture
    * as DISPLAYED, so a camera file and its physically-rotated re-save
    * dedup together — the hash plain [[jpegDHash]] would put
    * Hamming-far apart.
    */
  def jpegDHashOriented(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.JpegDHashOriented(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of a GIF's first composited frame
    * ([[graft.expressions.GifDHash]]) — same grid and bit layout as
    * [[pngDHash]]/[[jpegDHash]], NULL for undecodable bytes or screens
    * under the grid.
    */
  def gifDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.GifDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of a lossless WebP
    * ([[graft.expressions.WebpDHash]]) — same grid and bit layout as
    * the other three format arms.
    */
  def webpDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WebpDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of a BMP ([[graft.expressions.BmpDHash]])
    * — fifth arm of the shared grid/bit layout.
    */
  def bmpDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.BmpDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of a baseline TIFF
    * ([[graft.expressions.TiffDHash]]) — sixth arm of the shared
    * grid/bit layout.
    */
  def tiffDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TiffDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of a Netpbm image
    * ([[graft.expressions.PnmDHash]]) — seventh arm of the shared
    * grid/bit layout.
    */
  def pnmDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PnmDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit perceptual dHash of an ICO favicon's largest image
    * ([[graft.expressions.IcoDHash]]) — eighth arm of the shared
    * grid/bit layout.
    */
  def icoDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.IcoDHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Format-agnostic image dHash: the PNG, JPEG, GIF, lossless-WebP,
    * BMP, TIFF, PNM or ICO arm, whichever decodes (each refuses foreign
    * magic bytes on the first read, so a miss arm costs a header sniff,
    * not a decode). NULL when none decodes — mixed-format corpora dedup
    * in one Hamming space.
    */
  def imageDHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(pngDHash(content), jpegDHash(content), gifDHash(content),
      webpDHash(content), bmpDHash(content), tiffDHash(content),
      pnmDHash(content), icoDHash(content))

  /** [[imageDHash]] in DISPLAY space: the JPEG arm is the
    * orientation-normalized [[jpegDHashOriented]], so a camera file and
    * its rotated re-save dedup together (PNG carries no EXIF — its arm
    * is unchanged). Choose per signature store; the two JPEG hash
    * variants agree whenever orientation is 1/absent, and a store built
    * with one must be screened with the same one.
    */
  def imageDHashDisplay(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(pngDHash(content), jpegDHashOriented(content), gifDHash(content),
      webpDHash(content), bmpDHash(content), tiffDHash(content),
      pnmDHash(content), icoDHash(content))

  /** Grayscale-histogram statistics over PNG or baseline JPEG
    * ([[graft.expressions.ImageHistStats]]) — entropy / dynamic range /
    * dominant-bin fraction, the scan-time inputs of [[imageQualityScreen]].
    */
  def imageHistStats(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ImageHistStats(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** The image quality screen a curation pipeline runs before anything
    * expensive: appends `ih` (histogram stats, NULL when undecodable)
    * and `img_keep` — decodable, at least `minW`×`minH`, histogram
    * entropy ≥ `minEntropy` (near-constant fills, placeholder logos and
    * blown-up tracking pixels sit at ≈ 0), and no single gray bin
    * holding more than `maxFracMaxBin` of the pixels. Pure per-row scan
    * projection; tune thresholds per corpus.
    */
  def imageQualityScreen(df: DataFrame, contentCol: String = "content",
      minW: Int = 32, minH: Int = 32, minEntropy: Double = 1.0,
      maxFracMaxBin: Double = 0.9): DataFrame =
    df.withColumn("ih", imageHistStats(col(contentCol)))
      .withColumn("img_keep",
        col("ih").isNotNull &&
          col("ih.width") >= minW && col("ih.height") >= minH &&
          col("ih.gray_entropy") >= minEntropy &&
          col("ih.frac_max_bin") <= maxFracMaxBin)

  /** Near-duplicate image pairs by dHash Hamming distance — the image
    * twin of [[DedupOps.simhashNearDups]], same pigeonhole blocking:
    * each hash splits into 4 disjoint 16-bit chunks, candidates must
    * agree on at least one chunk (any pair within Hamming ≤ 3 provably
    * shares an untouched chunk — total recall at the default), then the
    * exact distance is verified with `bit_count(xor)`. Undecodable /
    * sub-grid images hash NULL and are dropped before the join, so a
    * corpus of mixed blobs never funnels into a NULL-key hot bucket.
    * Scale shape: the banded self-join touches only (key, 8-byte hash)
    * rows — content bytes stay in the scan — and each bucket holds the
    * corpus rows sharing a 16-bit chunk value, so the join is bucketed,
    * never all-pairs.
    *
    * @return (key_a, key_b, hamming), key_a < key_b, one row per pair
    */
  def imageNearDups(
      df: DataFrame,
      keyCol: String,
      contentCol: String,
      maxDist: Int = 3,
      /** `true` hashes JPEGs in display space ([[imageDHashDisplay]]) so
        * EXIF-rotated copies pair up; keep one choice per corpus.
        */
      oriented: Boolean = false
  ): DataFrame =
    DedupOps.hammingNearDups(
      imageSignatures(df, keyCol, contentCol, oriented)
        .select(col("key"), col("dhash").alias("hash")),
      maxDist)

  /** The image signature store: (key, dhash) for every decodable image
    * (PNG or baseline JPEG — [[imageDHash]]) — 16 bytes a row, the only
    * thing incremental image dedup ever needs to retain. Persist this
    * like any model artifact; content bytes are read once, at signature
    * time.
    */
  def imageSignatures(df: DataFrame, keyCol: String,
      contentCol: String, oriented: Boolean = false): DataFrame = {
    val hash = if (oriented) imageDHashDisplay(col(contentCol))
      else imageDHash(col(contentCol))
    df.select(col(keyCol).alias("key"), hash.alias("dhash"))
      .filter(col("dhash").isNotNull)
  }

  /** O(batch) incremental image near-dup — the image twin of
    * [[DedupOps.minhashDedupAgainstSignatures]]: drop batch images within
    * `maxDist` Hamming of ANY accumulated signature, keep the rest. The
    * corpus side is only its (key, 8-byte hash) signature rows — corpus
    * content is never touched, never rehashed — so per-batch work is
    * O(batch) against a 100 TB image store. Same 4×16-bit pigeonhole
    * blocking as [[imageNearDups]] (total recall at Hamming ≤ 3), and
    * unlike the text path no verification join is needed: the hash IS
    * the signature, `bit_count(xor)` IS exact verification.
    *
    * Undecodable batch rows (NULL hash) SURVIVE — not being an image is
    * not being a duplicate; mirror of how un-shingleable short docs pass
    * the text screen. Screen them separately if the pipeline wants
    * images only.
    *
    * @param signatures (key, dhash) rows from [[imageSignatures]]
    * @return batch rows that are NOT near-dups of the signature store
    */
  def imageDedupAgainstSignatures(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      signatures: DataFrame,
      maxDist: Int = 3,
      /** Must match the store's hash choice — see [[imageNearDups]]. */
      oriented: Boolean = false
  ): DataFrame = {
    val dupKeys = DedupOps.hammingDupKeys(
      imageSignatures(batch, keyCol, contentCol, oriented)
        .select(col("key"), col("dhash").alias("hash")),
      signatures.select(col("key"), col("dhash").alias("hash")),
      maxDist).withColumnRenamed("key", "__dupkey")
    batch.join(dupKeys, col(keyCol) === col("__dupkey"), "left_anti")
  }

  /** [[imageDedupAgainstSignatures]] with the store computed from corpus
    * content — first-run convenience; steady-state ingestion keeps the
    * signature table and never rereads corpus bytes.
    */
  def imageDedupAgainstCorpus(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      corpus: DataFrame,
      corpusKeyCol: String,
      corpusContentCol: String,
      maxDist: Int = 3
  ): DataFrame =
    imageDedupAgainstSignatures(batch, keyCol, contentCol,
      imageSignatures(corpus, corpusKeyCol, corpusContentCol), maxDist)

  /** REAL audio sample decode for 16-bit PCM WAV — RIFF walk + every
    * interleaved sample read by the native
    * [[graft.expressions.WavSamples]] expression, returning all-integer
    * per-clip statistics (struct&lt;channels,sample_rate,n_frames,
    * samp_sum,samp_wsum,peak_abs&gt;, NULL for compressed/float/other-depth
    * WAVs). The audio sibling of [[pngPixels]]: decoded samples never
    * leave the expression, only their statistics do.
    */
  def wavSamples(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WavSamples(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `au` from [[wavSamples]] — scan-projection local. */
  def withWavSamples(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("au", wavSamples(col(contentCol)))

  /** Decode-proof MP3 metadata ([[graft.expressions.Mp3Samples]]):
    * struct&lt;channels,sample_rate,n_frames,mp3_frames&gt; from a full
    * [[Mp3]] decode, NULL for refused streams — the compressed-audio
    * sibling of [[wavSamples]].
    */
  def mp3Samples(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Mp3Samples(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** One-decode fusion of [[audioEnvelopeHash]] and [[mp3Samples]]
    * ([[graft.expressions.Mp3DecodeStats]]): `eh` bit-identical to the
    * dispatching envelope hash for every input, the stat fields
    * bit-identical to the decode-proof counts on the MP3 path — one
    * huffman+synthesis decode per row instead of one per expression.
    */
  def mp3DecodeStats(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Mp3DecodeStats(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit time-domain energy-envelope fingerprint
    * ([[graft.expressions.WavEnvelopeHash]]) — gain-invariant loudness
    * contour, the audio sibling of [[pngDHash]]. NULL for undecodable
    * bytes or clips under 65 frames.
    */
  def wavEnvelopeHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WavEnvelopeHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** 64-bit spectral audio fingerprint
    * ([[graft.expressions.WavSpectralHash]]) — an 8×8 time × frequency
    * gradient grid over DFT band energies, the pitch-sensitive
    * complement of [[wavEnvelopeHash]] (two clips with one loudness
    * contour but different harmonics separate here). Gain-invariant,
    * exact-integer, NULL for undecodable clips, under 128 frames, or
    * more than 2 channels.
    */
  def wavSpectralHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WavSpectralHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Container-agnostic envelope fingerprint
    * ([[graft.expressions.AudioEnvelopeHash]]): WAV takes the exact-int
    * path (bit-identical to [[wavEnvelopeHash]]), MP3 runs the full
    * [[Mp3]] decode first — so the signature stores and near-dup joins
    * below accept compressed crawls without any caller change.
    */
  def audioEnvelopeHash(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.AudioEnvelopeHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Container-agnostic spectral fingerprint
    * ([[graft.expressions.AudioSpectralHash]]); WAV bit-identical to
    * [[wavSpectralHash]], MP3 decoded then hashed with the same
    * exact-integer DFT kernel.
    */
  def audioSpectralHashAny(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.AudioSpectralHash(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** The spectral signature store: (key, shash), contract of
    * [[audioSignatures]]. WAV or MP3 content.
    */
  def audioSpectralSignatures(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    df.select(col(keyCol).alias("key"),
        audioSpectralHashAny(col(contentCol)).alias("shash"))
      .filter(col("shash").isNotNull)

  /** Near-duplicate audio pairs by SPECTRAL fingerprint —
    * [[DedupOps.hammingNearDups]] over [[audioSpectralSignatures]];
    * same banded pigeonhole join as [[audioNearDups]], different (and
    * complementary) notion of "same audio".
    */
  def audioSpectralNearDups(
      df: DataFrame,
      keyCol: String,
      contentCol: String,
      maxDist: Int = 3
  ): DataFrame =
    DedupOps.hammingNearDups(
      audioSpectralSignatures(df, keyCol, contentCol)
        .select(col("key"), col("shash").alias("hash")),
      maxDist)

  /** O(batch) incremental audio near-dup against a SPECTRAL (key, shash)
    * signature store — [[audioDedupAgainstSignatures]] with the
    * frequency-domain fingerprint: catches re-pitched/re-synthesized
    * copies that keep a loudness contour the envelope store would pass.
    */
  def audioSpectralDedupAgainstSignatures(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      signatures: DataFrame,
      maxDist: Int = 3
  ): DataFrame = {
    val dupKeys = DedupOps.hammingDupKeys(
      audioSpectralSignatures(batch, keyCol, contentCol)
        .select(col("key"), col("shash").alias("hash")),
      signatures.select(col("key"), col("shash").alias("hash")),
      maxDist).withColumnRenamed("key", "__dupkey")
    batch.join(dupKeys, col(keyCol) === col("__dupkey"), "left_anti")
  }

  /** [[audioSpectralDedupAgainstSignatures]] with the store computed from
    * corpus content — first-run convenience.
    */
  def audioSpectralDedupAgainstCorpus(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      corpus: DataFrame,
      corpusKeyCol: String,
      corpusContentCol: String,
      maxDist: Int = 3
  ): DataFrame =
    audioSpectralDedupAgainstSignatures(batch, keyCol, contentCol,
      audioSpectralSignatures(corpus, corpusKeyCol, corpusContentCol), maxDist)

  /** The audio signature store: (key, ahash) for every decodable clip —
    * 16 bytes a row, same contract as [[imageSignatures]]. WAV or MP3
    * content ([[audioEnvelopeHash]] dispatch), so [[ingestAudioBatch]]
    * accepts compressed audio by sniff.
    */
  def audioSignatures(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    df.select(col(keyCol).alias("key"),
        audioEnvelopeHash(col(contentCol)).alias("ahash"))
      .filter(col("ahash").isNotNull)

  /** Near-duplicate audio pairs by envelope-hash Hamming distance —
    * [[DedupOps.hammingNearDups]] over [[audioSignatures]], exactly as
    * [[imageNearDups]] over image signatures. (key_a, key_b, hamming).
    */
  def audioNearDups(
      df: DataFrame,
      keyCol: String,
      contentCol: String,
      maxDist: Int = 3
  ): DataFrame =
    DedupOps.hammingNearDups(
      audioSignatures(df, keyCol, contentCol)
        .select(col("key"), col("ahash").alias("hash")),
      maxDist)

  /** O(batch) incremental audio near-dup against a (key, ahash)
    * signature store — the audio twin of [[imageDedupAgainstSignatures]],
    * same survival rule for undecodable rows.
    */
  def audioDedupAgainstSignatures(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      signatures: DataFrame,
      maxDist: Int = 3
  ): DataFrame = {
    val dupKeys = DedupOps.hammingDupKeys(
      audioSignatures(batch, keyCol, contentCol)
        .select(col("key"), col("ahash").alias("hash")),
      signatures.select(col("key"), col("ahash").alias("hash")),
      maxDist).withColumnRenamed("key", "__dupkey")
    batch.join(dupKeys, col(keyCol) === col("__dupkey"), "left_anti")
  }

  /** [[audioDedupAgainstSignatures]] with the store computed from corpus
    * content — first-run convenience, mirror of [[imageDedupAgainstCorpus]].
    */
  def audioDedupAgainstCorpus(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      corpus: DataFrame,
      corpusKeyCol: String,
      corpusContentCol: String,
      maxDist: Int = 3
  ): DataFrame =
    audioDedupAgainstSignatures(batch, keyCol, contentCol,
      audioSignatures(corpus, corpusKeyCol, corpusContentCol), maxDist)

  /** REAL video frame extraction for MJPEG AVI — RIFF chunk-tree walk by
    * the native [[graft.expressions.AviFrames]] expression, returning
    * the `00dc`/`00db` payloads as `array<binary>` in stream order
    * (each element a complete baseline JPEG that [[jpegPixels]] /
    * [[jpegDHash]] decode). NULL for non-AVI bytes or a malformed tree.
    */
  def aviFrames(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.AviFrames(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Motion-JPEG MP4/MOV frame extraction — ISO BMFF sample-table walk
    * ([[graft.expressions.Mp4Frames]]): stsd codec gate, stsz sizes,
    * stsc runs, stco/co64 offsets. Same `array<binary>`-of-JPEGs shape
    * as [[aviFrames]]; NULL for non-BMFF bytes or a track family the
    * JDK-only decoder cannot honestly serve (H.26x/AV1).
    */
  def mp4Frames(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Mp4Frames(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Container-agnostic frame extraction: RIFF magic → [[aviFrames]],
    * ISO BMFF → [[mp4Frames]] ([[graft.expressions.VideoFrames]] sniffs
    * once, runs one parser). The whole video-dedup family rides this,
    * so an AVI rip and an MP4 remux of the same footage land in the
    * same frame-hash Hamming space — the container twin of what
    * [[imageDHash]] does for PNG/JPEG.
    */
  def videoFrames(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.VideoFrames(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Uniform frame sampling — the feature-extraction step of a video
    * pipeline: at most `n` frames drawn at evenly spaced indices
    * (`floor(i·count/n)`, i = 0..n−1) from either container's frame
    * stream, so downstream per-frame work (hashing, embedding, quality
    * screens) is O(n) per video regardless of length. Videos with ≤ n
    * frames pass through whole; non-videos stay NULL.
    */
  def sampleFrames(content: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    require(n >= 1, "sample size must be positive")
    // Bind the parsed frame array ONCE as a lambda variable: Spark's
    // subexpression elimination does not reach into HOF lambdas, so naming
    // videoFrames() in the guard, the size() and the slice would re-run
    // the full container parse per sampled frame. transform over a
    // 1-element array evaluates the parse exactly once per row.
    element_at(
      transform(array(videoFrames(content)), fr =>
        when(fr.isNull, lit(null))
          .when(size(fr) <= n, fr)
          .otherwise(transform(sequence(lit(0), lit(n - 1)),
            i => element_at(fr,
              floor(i.cast("double") * size(fr) / n).cast("int") + 1)))),
      1)
  }

  /** Embedded PDF raster images as `array<binary>` in document order —
    * each element a complete baseline JPEG (`/DCTDecode` XObjects,
    * [[graft.expressions.PdfImages]]), so documents feed the image
    * pipeline exactly as AVI frames do. NULL for non-PDF bytes; a PDF
    * with no pictures yields an empty array.
    */
  def pdfImages(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.PdfImages(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Per-image perceptual signatures of a PDF corpus: one row per
    * embedded DCT image — (key, img_idx, ihash) with the cross-format
    * [[imageDHash]]. The document-corpus twin of
    * [[videoFrameSignatures]]: what shuffles is key + index + 8 bytes,
    * never raster content.
    */
  def pdfImageSignatures(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    df.select(col(keyCol).alias("key"),
        posexplode(pdfImages(col(contentCol))).as(Seq("img_idx", "__img")))
      .select(col("key"), col("img_idx"),
        // PdfImages emits /DCTDecode XObjects only — complete baseline
        // JPEGs — so this hot path takes the single arm, not the
        // six-arm general dispatch (same bit layout, stores compatible)
        jpegDHash(col("__img")).alias("ihash"))
      .filter(col("ihash").isNotNull)

  /** Multi-page TIFF pages as PNG stills
    * ([[graft.expressions.TiffPages]]) — the scanned-document sibling
    * of [[videoFrames]]'s GIF arm: `array<binary>` of complete RGB
    * PNGs, one per IFD-chain page; NULL wholesale when any page
    * refuses.
    */
  def tiffPages(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TiffPages(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Per-page perceptual signatures of a scanned-document corpus: one
    * row per TIFF page — (key, page_idx, phash) in the shared image
    * Hamming space, the document twin of [[videoFrameSignatures]].
    * Content bytes decode once in the scan projection; what shuffles
    * is (key, int, long) rows.
    */
  def tiffPageSignatures(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame =
    df.select(col(keyCol).alias("key"),
        posexplode(tiffPages(col(contentCol))).as(Seq("page_idx", "__page")))
      .select(col("key"), col("page_idx"),
        pngDHash(col("__page")).alias("phash"))
      .filter(col("phash").isNotNull)

  /** Hash for stills [[videoFrames]] itself produced: MJPEG containers
    * emit complete JPEGs (the dominant case, so the JPEG arm leads),
    * the GIF compositor emits PNGs — never the other four formats — so
    * the frame path dispatches TWO arms instead of [[imageDHash]]'s
    * six. This is the engine's highest-volume hash site (evaluated once
    * per FRAME); four arms that can never match are pure generated-code
    * bulk here. The bit layout is identical across arms — existing
    * signature stores stay compatible.
    */
  private def frameDHash(frame: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(jpegDHash(frame), pngDHash(frame))

  /** Per-frame perceptual signatures: one row per decodable frame —
    * (key, frame_idx, fhash) with `fhash` in [[imageDHash]]'s shared
    * grid/bit layout (the [[frameDHash]] two-arm dispatch).
    * The scan explodes 8-byte hashes, not pixels: content bytes are
    * touched once, in the scan projection, and what shuffles afterwards
    * is (key, long, long) rows — the only shape frame-level dedup can
    * afford at video-corpus scale. Undecodable frames drop out.
    *
    * `maxFramesPerVideo > 0` caps per-video work via [[sampleFrames]]
    * uniform sampling (`floor(i·count/n)`), bounding signature rows AND
    * per-frame hashing to O(n) per video — without it an hour-long video
    * is a straggler task no frame-df cap addresses. `frame_idx` is then
    * the sample index, not the container frame index. Default off (0):
    * exact per-frame signatures.
    */
  def videoFrameSignatures(df: DataFrame, keyCol: String,
      contentCol: String, maxFramesPerVideo: Int = 0): DataFrame = {
    val frames =
      if (maxFramesPerVideo > 0) sampleFrames(col(contentCol), maxFramesPerVideo)
      else videoFrames(col(contentCol))
    df.select(col(keyCol).alias("key"),
        posexplode(frames).as(Seq("frame_idx", "__frame")))
      .select(col("key"), col("frame_idx"),
        frameDHash(col("__frame")).alias("fhash"))
      .filter(col("fhash").isNotNull)
  }

  /** Near-duplicate videos by shared frame content: two videos pair when
    * the fraction of distinct frame hashes they share reaches
    * `minSharedFrac` of the smaller video's distinct-hash count. The
    * candidate join is an equi-join on the 8-byte frame hash — bucketed
    * by construction, never all-pairs, and re-encoded/re-muxed copies
    * still land together because the hash is perceptual, not byte-exact.
    *
    * @return (key_a, key_b, shared_frames, frac), key_a < key_b
    */
  def videoNearDups(
      df: DataFrame,
      keyCol: String,
      contentCol: String,
      minSharedFrac: Double = 0.5,
      maxFrameDf: Int = 256,
      maxFramesPerVideo: Int = 0
  ): DataFrame = {
    val sigs0 = videoFrameSignatures(df, keyCol, contentCol, maxFramesPerVideo)
      .select(col("key"), col("fhash")).distinct()
      .localCheckpoint(true) // decode once; both join sides read the 16-byte rows
    // Stop-frame screen: a frame hash present in more than `maxFrameDf`
    // distinct videos (solid black, title cards, studio logos) carries no
    // pairing signal but detonates the equi-join — its fan-out is df² pairs
    // for ONE hot key. Same move as the whitespace-paragraph handling in
    // TextAnalysis.dedupParagraphsAcrossCorpus: ubiquity disqualifies a
    // fingerprint from the comparison universe. The stop list is tiny by
    // construction (few hashes can exceed the cap), so AQE broadcasts the
    // anti-join; per-video counts are taken AFTER the screen so `frac`
    // stays a ratio over the same universe the join saw.
    val hot = sigs0.groupBy(col("fhash"))
      .agg(count(lit(1)).alias("__df"))
      .filter(col("__df") > maxFrameDf)
      .select(col("fhash"))
    val sigs = sigs0.join(hot, Seq("fhash"), "left_anti")
    val counts = sigs.groupBy(col("key")).agg(count(lit(1)).alias("n"))
    val shared = sigs.alias("a")
      .join(sigs.alias("b"), col("a.fhash") === col("b.fhash") &&
        col("a.key") < col("b.key"))
      .groupBy(col("a.key").alias("key_a"), col("b.key").alias("key_b"))
      .agg(count(lit(1)).alias("shared_frames"))
    shared
      .join(counts.select(col("key").alias("key_a"), col("n").alias("na")), "key_a")
      .join(counts.select(col("key").alias("key_b"), col("n").alias("nb")), "key_b")
      .withColumn("frac",
        col("shared_frames").cast("double") / least(col("na"), col("nb")))
      .filter(col("frac") >= minSharedFrac)
      .select(col("key_a"), col("key_b"), col("shared_frames"), col("frac"))
  }

  /** O(batch) incremental video near-dup against a (key, fhash) frame
    * signature store ([[videoFrameSignatures]] rows) — the video twin of
    * [[imageDedupAgainstSignatures]]: a batch video drops when its
    * shared distinct frame hashes reach `minSharedFrac` of the smaller
    * side (same rule as [[videoNearDups]]). Corpus video bytes are never
    * reread — the store is 16 bytes per frame — and the candidate join
    * stays an equi-join on the frame hash. Undecodable batch rows
    * SURVIVE: not being a video is not being a duplicate.
    */
  def videoDedupAgainstSignatures(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      signatures: DataFrame,
      minSharedFrac: Double = 0.5,
      maxFrameDf: Int = 256,
      maxFramesPerVideo: Int = 0
  ): DataFrame = {
    val bs0 = videoFrameSignatures(batch, keyCol, contentCol, maxFramesPerVideo)
      .select(col("key"), col("fhash")).distinct()
      .localCheckpoint(true) // decode once; counts + join both read it
    val ss0 = signatures.select(col("key").alias("__sk"), col("fhash"))
      .distinct()
    // stop-frame screen over the union universe (see videoNearDups): a
    // hash ubiquitous across corpus+batch videos is dropped from both
    // sides before the equi-join, and the per-video counts follow suit.
    // The store-side groupBy is no new asymptotic cost — sCnt below
    // already reduces the full store each batch.
    val hot = bs0.select(col("key"), col("fhash"))
      .unionByName(ss0.select(col("__sk").alias("key"), col("fhash")))
      .groupBy(col("fhash")).agg(count(lit(1)).alias("__df"))
      .filter(col("__df") > maxFrameDf)
      .select(col("fhash"))
    val bs = bs0.join(hot, Seq("fhash"), "left_anti")
    val ss = ss0.join(hot, Seq("fhash"), "left_anti")
    val bCnt = bs.groupBy(col("key")).agg(count(lit(1)).alias("bn"))
    val sCnt = ss.groupBy(col("__sk")).agg(count(lit(1)).alias("sn"))
    val dups = bs.join(ss, "fhash")
      .groupBy(col("key"), col("__sk")).agg(count(lit(1)).alias("sh"))
      .join(bCnt, "key")
      .join(sCnt, "__sk")
      .filter(col("sh").cast("double") / least(col("bn"), col("sn"))
        >= minSharedFrac)
      .select(col("key").alias("__dup")).distinct()
    batch.join(dups, col(keyCol) === col("__dup"), "left_anti")
  }

  /** [[videoDedupAgainstSignatures]] with the store computed from corpus
    * content — first-run convenience, mirror of [[imageDedupAgainstCorpus]].
    */
  def videoDedupAgainstCorpus(
      batch: DataFrame,
      keyCol: String,
      contentCol: String,
      corpus: DataFrame,
      corpusKeyCol: String,
      corpusContentCol: String,
      minSharedFrac: Double = 0.5,
      maxFramesPerVideo: Int = 0
  ): DataFrame =
    videoDedupAgainstSignatures(batch, keyCol, contentCol,
      videoFrameSignatures(corpus, corpusKeyCol, corpusContentCol,
        maxFramesPerVideo)
        .select(col("key"), col("fhash")),
      minSharedFrac, maxFramesPerVideo = maxFramesPerVideo)

  /** REAL audio/video container metadata from binary headers — WAV
    * channels/rate/bits/duration and MP4 movie duration parsed by the
    * native codegen'd [[graft.expressions.AvMeta]] expression (the
    * audio/video sibling of [[imageDims]]). NULL struct for unrecognized
    * bytes; sample/frame decode remains behind [[StubCodec]].
    */
  def avMeta(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.AvMeta(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** Appends `av` (struct&lt;format,channels,sample_rate,bits,duration_ms&gt;,
    * NULL when unrecognized) — scan-projection local, no shuffle.
    */
  def withAvMeta(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("av", avMeta(col(contentCol)))

  /** Deterministic stand-in for the native decode libraries. Each function
    * is the shape the real codec would have; the bodies compute stable fake
    * features from the bytes so tests are reproducible.
    */
  object StubCodec {
    /** STUB: would decode an image and return (width, height, channels). */
    def imageDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = if (bytes == null) 0 else java.util.Arrays.hashCode(bytes)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1, 3)
    }

    /** STUB: would resize + re-encode; returns a truncated copy. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (bytes == null) Array.emptyByteArray
      else bytes.take(math.max(16, math.min(bytes.length, w * h / 64)))

    /** STUB: would extract an embedding; returns a stable pseudo-embedding. */
    def feature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val seed = if (bytes == null) 0 else java.util.Arrays.hashCode(bytes)
      Array.tabulate(dim)(i => (((seed * 31 + i) % 1000) / 1000.0f))
    }
  }

  /** Feature extraction over binary content. Row-batched inside
    * mapPartitions — one codec context per partition, no per-row setup, the
    * shape a real (native-library) decoder needs at scale. Output keeps the
    * input partitioning (no shuffle).
    */
  def extractImageFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("feature", ArrayType(FloatType))))
    val contentIdx = df.schema.fieldIndex("content")
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
        val (w, h, c) = StubCodec.imageDims(bytes)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, StubCodec.feature(bytes, dim).toSeq))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Document chunking (document_processor.py:76-83): split extracted text
    * into fixed-size character chunks and explode — `posexplode` keeps the
    * chunk index. Pure built-ins.
    *
    * NULL-text and EMPTY-text documents emit NO chunk rows (there is
    * nothing to embed; an image-only PDF that extracted to "" vanishes
    * here by design) — audit row counts against the input table if
    * document completeness matters downstream.
    */
  def chunkText(df: DataFrame, textCol: String, chunkSize: Int): DataFrame = {
    val n = ceil(length(col(textCol)).cast("double") / chunkSize).cast("int")
    df.withColumn("__chunks",
        transform(sequence(lit(0), greatest(n, lit(1)) - 1),
          i => col(textCol).substr(i * chunkSize + 1, lit(chunkSize))))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_index", "chunk_text")))
      .drop("__chunks")
      .filter(length(col("chunk_text")) > 0)
  }

  /** Sliding-window chunking with overlap — the RAG/embedding convention
    * (each chunk shares `overlap` chars with its predecessor so no
    * semantic unit is cut at every boundary). Chunk i starts at
    * i·(size−overlap); the final chunk may be short; NON-EMPTY documents
    * shorter than `size` yield one chunk, while NULL/empty documents
    * emit no rows (same posture as [[chunkText]] — see its doc). Pure
    * HOF projection like [[chunkText]].
    */
  def chunkTextOverlap(df: DataFrame, textCol: String, chunkSize: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val stride = chunkSize - overlap
    // chunks needed so the last one reaches the end: ceil((len-overlap)/stride)
    val n = ceil((length(col(textCol)) - lit(overlap)).cast("double") / stride)
      .cast("int")
    df.withColumn("__chunks",
        transform(sequence(lit(0), greatest(n, lit(1)) - 1),
          i => col(textCol).substr(i * stride + 1, lit(chunkSize))))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_index", "chunk_text")))
      .drop("__chunks")
      .filter(length(col("chunk_text")) > 0)
  }

  /** Frame-sample plumbing for video: given frame count metadata, emit one
    * row per sampled frame index (decode stubbed).
    */
  def sampleFrames(df: DataFrame, everyN: Int, frameCountCol: String): DataFrame =
    df.withColumn("frame_index",
        // a zero-frame (or NULL-count) video emits NO rows — the
        // greatest(…, 0) clamp alone would fabricate a phantom
        // frame_index 0 that no decoder can serve
        explode(when(col(frameCountCol) > 0,
          sequence(lit(0), col(frameCountCol) - 1, lit(everyN)))))
}
