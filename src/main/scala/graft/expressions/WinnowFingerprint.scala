package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
  * the MOSS algorithm): hash every k-gram of the normalized text, slide a
  * window of `w` consecutive hashes, keep the minimum of each window
  * (rightmost wins ties), deduplicate consecutive picks. Guarantees any
  * shared substring of length ≥ k+w−1 yields at least one shared
  * fingerprint — the local property that makes fingerprint-equality a
  * sound near-dup blocking key.
  *
  * A native Catalyst expression (not a UDF): no serialization of row
  * values through Scala closures, and `doGenCode` emits a direct static
  * call so the operator stays inside whole-stage codegen. Built-in
  * higher-order functions can't express the rolling window minimum
  * without O(n·w) interpreted work; this is O(n) with a monotonic deque.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
    portable: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WinnowFingerprint.compute($c, $k, $w, $portable)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Static kernel shared by interpreted eval and generated code.
    *
    * `portable = false` (default): polynomial rolling hash base 257 mod 2^64
    * with a splitmix64 finalizer — O(n), the production path.
    * `portable = true`: each k-gram is hashed with the 60-bit md5 prefix
    * ([[TextHashKernels.md5Prefix60]]), the same value
    * `('0x' || substr(md5(kgram),1,15))::BIGINT` yields in DuckDB — slower
    * (one md5 per position) but lets an external SQL oracle recompute the
    * winnowed fingerprint set exactly. Wrapping 64-bit multiply chains are
    * not expressible in engines that error on BIGINT overflow, hence the
    * dual mode instead of replicating splitmix64 in SQL.
    */
  def compute(text: UTF8String, k: Int, w: Int, portable: Boolean): ArrayData = {
    val s = normalize(text.toString)
    val n = s.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])

    val hashes = new Array[Long](n)
    var i = 0
    if (portable) {
      // ASCII fast path: char index == byte index, so each k-gram is a
      // zero-copy byte slice; non-ASCII falls back to per-substring UTF-8
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.length == s.length) {
        while (i < n) {
          hashes(i) = TextHashKernels.md5Prefix60Memo(bytes, i, k)
          i += 1
        }
      } else {
        while (i < n) {
          hashes(i) = TextHashKernels.md5Prefix60Memo(s.substring(i, i + k))
          i += 1
        }
      }
    } else {
      // polynomial rolling hash of every k-gram, base 257 mod 2^64
      var h = 0L
      var pow = 1L
      while (i < k) { h = h * 257 + s.charAt(i); if (i > 0) pow *= 257; i += 1 }
      hashes(0) = finalize(h)
      i = 1
      while (i < n) {
        h = (h - s.charAt(i - 1) * pow) * 257 + s.charAt(i + k - 1)
        hashes(i) = finalize(h)
        i += 1
      }
    }
    i = 0

    if (n <= w) {
      // fewer k-grams than the window: a single global minimum
      var min = hashes(0); i = 1
      while (i < n) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      return new GenericArrayData(Array(min))
    }

    // O(n) sliding-window minimum via monotonic deque; rightmost-min wins
    // ties (<=), consecutive duplicate picks collapsed
    val out = Array.newBuilder[Long]
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // deque of indices, hashes increasing from head
    var lastPicked = -1
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val picked = deque(head)
        if (picked != lastPicked) { out += hashes(picked); lastPicked = picked }
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** 64-bit avalanche (splitmix64 finalizer) so the weak polynomial hash
    * distributes uniformly across blocking buckets.
    */
  private def finalize(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!prevSpace && sb.length() > 0) { sb.append(' '); prevSpace = true }
      } else {
        sb.append(Character.toLowerCase(c)); prevSpace = false
      }
      i += 1
    }
    var end = sb.length()
    if (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }
}
