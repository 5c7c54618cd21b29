package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-level tokenizer + portable hashing for the native text-hash
  * expressions ([[SimHash64]], [[MinHashSig]]).
  *
  * Token semantics replicate `split(text, " ")` exactly (single-space
  * separator, empty tokens kept, `""` yields one empty token) so the native
  * kernels are drop-in replacements for the explode+groupBy forms.
  *
  * The portable hash is the first 60 bits of md5 read as a big-endian hex
  * number — the same value as `conv(substr(md5(x),1,15),16,10)` in Spark and
  * `('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB — so external SQL
  * engines can recompute signatures bit-for-bit for oracle checks. 60 bits
  * keeps the value inside a signed long on every engine.
  */
object TextHashKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  // digest written into a reusable thread-local buffer: winnow's portable
  // mode hashes every k-gram position, and a fresh 16-byte array per call
  // is measurable GC pressure at millions of positions per task
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 60 bits of md5(bytes[start, start+len)), big-endian. */
  def md5Prefix60(bytes: Array[Byte], start: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, start, len)
    val d = digestBuf.get()
    md.digest(d, 0, 16)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  def md5Prefix60(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    md5Prefix60(b, 0, b.length)
  }

  // ---- memoized md5 prefix -------------------------------------------------
  // Natural-language corpora are Zipfian: the same tokens / character
  // k-grams recur millions of times per task, and md5 per occurrence was
  // ~30% of benchmark wall time. The memo is a per-thread open-addressing
  // table keyed by the EXACT bytes (verbatim compare on hit — a 64-bit
  // probe-hash collision can never yield a wrong value, only a slower one),
  // so portable-mode signatures stay bit-identical to the SQL oracle.
  // Thread-locals outlive tasks in executor thread pools, which is a
  // feature: the cache stays warm across a stage's task waves.
  private final val MemoBits = 17
  private final val MemoMask = (1 << MemoBits) - 1
  private final val MemoMaxProbe = 16

  private val memoKeys = new ThreadLocal[Array[Array[Byte]]] {
    override def initialValue(): Array[Array[Byte]] =
      new Array[Array[Byte]](1 << MemoBits)
  }
  private val memoVals = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](1 << MemoBits)
  }

  private def sliceEquals(k: Array[Byte], b: Array[Byte], start: Int, len: Int): Boolean = {
    var i = 0
    while (i < len) { if (k(i) != b(start + i)) return false; i += 1 }
    true
  }

  /** [[md5Prefix60]] with a per-thread exact-key memo. Linear-probes up to
    * [[MemoMaxProbe]] slots; a fully-contended neighborhood overwrites the
    * home slot (LRU-ish — hot keys win it back on their next occurrence).
    */
  def md5Prefix60Memo(bytes: Array[Byte], start: Int, len: Int): Long = {
    val keys = memoKeys.get()
    val vals = memoVals.get()
    val home = xx64(bytes, start, len).toInt & MemoMask
    var idx = home
    var probes = 0
    while (probes < MemoMaxProbe) {
      val k = keys(idx)
      if (k == null) {
        val v = md5Prefix60(bytes, start, len)
        keys(idx) = java.util.Arrays.copyOfRange(bytes, start, start + len)
        vals(idx) = v
        return v
      }
      if (k.length == len && sliceEquals(k, bytes, start, len)) return vals(idx)
      idx = (idx + 1) & MemoMask
      probes += 1
    }
    val v = md5Prefix60(bytes, start, len)
    keys(home) = java.util.Arrays.copyOfRange(bytes, start, start + len)
    vals(home) = v
    v
  }

  def md5Prefix60Memo(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    md5Prefix60Memo(b, 0, b.length)
  }

  /** xxhash64 of the byte slice with Spark's default seed 42 — identical to
    * `functions.xxhash64(stringCol)` on the same UTF-8 bytes.
    */
  def xx64(bytes: Array[Byte], start: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, len, 42L)

  /** Token end-exclusive boundaries: positions of every 0x20 byte plus the
    * text end. 0x20 never occurs inside a multi-byte UTF-8 sequence, so the
    * byte scan is char-safe. Returns the number of tokens and fills
    * `starts`/`ends` (caller-sized to len+2).
    */
  def tokenize(bytes: Array[Byte], starts: Array[Int], ends: Array[Int]): Int = {
    var n = 0
    var tokStart = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) {
        starts(n) = tokStart; ends(n) = i; n += 1
        tokStart = i + 1
      }
      i += 1
    }
    starts(n) = tokStart; ends(n) = bytes.length; n += 1
    n
  }
}

/** Count of whitespace tokens contained in a fixed word set, as a native
  * codegen'd expression — replaces `size(filter(split(text," "), isin))`,
  * which runs interpreted per row (10-50× slower on a corpus scan).
  * Occurrences are counted (not distinct hits), byte-equality, matching
  * the HOF composition exactly.
  *
  * The word set travels INSIDE the generated code as a comma-joined string
  * literal (parsed + memoized per unique string on each executor) — a
  * driver-side static registry would not exist on executor JVMs. Words must
  * not contain commas or spaces; stopword lists satisfy this by
  * construction.
  */
case class TokenInSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.forall(w =>
      !w.contains(",") && !w.contains(" ") && w.forall(_ >= ' ')),
    "words must be comma-, space-, and control-character-free " +
      "(a raw newline would tear the generated code's string literal)")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_token_in_set_count"

  private val joined = words.mkString(",")

  override protected def nullSafeEval(input: Any): Any =
    TokenInSetCount.compute(input.asInstanceOf[UTF8String], joined)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lit = joined.replace("\\", "\\\\").replace("\"", "\\\"")
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.TokenInSetCount.compute($c, "$lit")""")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenInSetCount =
    copy(child = newChild)
}

object TokenInSetCount {
  import TextHashKernels._

  private val setCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()

  private def setFor(joined: String): java.util.HashSet[String] = {
    val cached = setCache.get(joined)
    if (cached != null) cached
    else {
      val s = new java.util.HashSet[String]()
      joined.split(",").foreach(w => s.add(w))
      setCache.putIfAbsent(joined, s)
      s
    }
  }

  def compute(text: UTF8String, joinedWords: String): Int = {
    val set = setFor(joinedWords)
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 2)
    val ends = new Array[Int](bytes.length + 2)
    val n = tokenize(bytes, starts, ends)
    var hits = 0
    var t = 0
    while (t < n) {
      val tok = new String(bytes, starts(t), ends(t) - starts(t),
        java.nio.charset.StandardCharsets.UTF_8)
      if (set.contains(tok)) hits += 1
      t += 1
    }
    hits
  }
}

/** Word n-grams of whitespace-tokenized text as a native codegen'd
  * expression — each gram is the original byte span from the first token's
  * start to the last token's end (tokens are single-space separated, so the
  * span equals the space-joined gram), replacing the interpreted
  * `transform(sequence(...), slice/concat_ws)` composition. `distinct`
  * keeps first occurrences in order, matching `array_distinct`.
  * Fewer than n tokens yield an empty array.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"n-gram length must be positive, got $n " +
    "(n <= 0 would index out of bounds per row at execution)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordNGrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  import TextHashKernels._

  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 2)
    val ends = new Array[Int](bytes.length + 2)
    val numTok = tokenize(bytes, starts, ends)
    if (numTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](numTok - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= numTok - n) {
      val s = starts(i)
      val e = ends(i + n - 1)
      val gram = UTF8String.fromBytes(bytes, s, e - s)
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Distinct character k-grams of whitespace-normalized lower-cased text as
  * a native codegen'd expression — the char-shingle twin of [[WordNGrams]],
  * replacing the interpreted `transform(sequence, substr)` composition.
  * Normalization chain matches `regexp_replace(lower(trim(text)),"\s+"," ")`
  * exactly: UTF8String trim/toLowerCase (the same kernels the built-ins
  * call) then a java.util.regex replace. Fewer than k normalized chars
  * yield an empty array. Char indexing is UTF-16-unit based (identical to
  * code points for text inside the BMP).
  */
case class CharNGrams(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"n-gram length must be positive, got $k " +
    "(k <= 0 silently returned [\"\"] — never a useful shingle set)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharNGrams.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {

  def compute(text: UTF8String, k: Int): ArrayData = {
    val norm = text.trim().toLowerCase().toString.replaceAll("\\s+", " ")
    val n = norm.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](n)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      val gram = UTF8String.fromString(norm.substring(i, i + k))
      if (seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** 64-bit SimHash of whitespace-tokenized text as a single codegen'd
  * expression: bit b of the result is set iff strictly more than half of the
  * token hashes have bit b set (equivalently the ±1 sign sum is positive —
  * the same majority rule as the explode+groupBy formulation, which this
  * replaces: SimHash is per-document-local, so computing it inside the scan
  * projection removes the aggregation exchange entirely).
  *
  * `portable = true` hashes tokens with the 60-bit md5 prefix (bits 60-63
  * then always majority-0) so a DuckDB oracle can recompute the exact
  * signature; the default xxhash64 path matches `functions.xxhash64(token)`.
  *
  * Reference semantics anchor: near-dup blocking for document ingestion
  * (cdk-datalake-ingest-upeu aje_libs/documents/helpers/document_processor.py
  * processes documents one-at-a-time; SimHash is the corpus-scale analogue).
  */
case class SimHash64(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimHash64.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import TextHashKernels._

  def compute(text: UTF8String, portable: Boolean): Long = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 2)
    val ends = new Array[Int](bytes.length + 2)
    val n = tokenize(bytes, starts, ends)
    val ones = new Array[Int](64)
    var t = 0
    while (t < n) {
      val h =
        if (portable) md5Prefix60Memo(bytes, starts(t), ends(t) - starts(t))
        else xx64(bytes, starts(t), ends(t) - starts(t))
      var b = 0
      while (b < 64) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > n) sim |= 1L << b
      b += 1
    }
    sim
  }
}

/** MinHash signature over word n-gram shingles as one codegen'd pass:
  * for each of `numHashes` seeded hash functions, the minimum over shingles
  * of `xxhash64(shingle, seed)` — bit-identical to
  * `min(xxhash64(col("s"), lit(i)))` over exploded `wordShingles` (a shingle
  * of n tokens joined by single spaces is exactly the original byte span
  * from the first token's start to the last token's end, so no string is
  * ever built; duplicate shingles cannot change a minimum, so distinctness
  * is free).
  *
  * Returns an empty array when the text has fewer than n tokens (the caller
  * filters those out, matching the `size(sh) > 0` guard of the HOF form).
  * Replaces an explode + groupBy with `numHashes` min-buffers: the signature
  * is per-document-local, so it now costs zero shuffles.
  */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be positive, got $n")
  require(numHashes >= 1, s"numHashes must be positive, got $numHashes " +
    "(0 returns an empty array, indistinguishable from the <n-tokens sentinel)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashSig.compute($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import TextHashKernels._

  def compute(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 2)
    val ends = new Array[Int](bytes.length + 2)
    val numTok = tokenize(bytes, starts, ends)
    if (numTok < n) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= numTok - n) {
      val start = starts(i)
      val end = ends(i + n - 1)
      // seed chain of functions.xxhash64(shingle, lit(seed)): string bytes
      // with seed 42, then the int seed folded in
      val hs = xx64(bytes, start, end - start)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, hs)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
