package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 digest of every `len`-char gram — `Md5PositionHashes(text, len)`
  * returns `array<binary>` where element `i` is the 16-byte MD5 of the
  * UTF-8 encoding of code points `[i, i+len)`. Bit-identical to the
  * `unhex(md5(substr(text, i+1, len)))` composition (Spark `substr` is
  * code-point indexed; `md5` hashes the UTF-8 bytes), but one kernel pass
  * per document instead of a `sequence` array materialization + one
  * expression-tree eval per position: the digest object, the code-point →
  * byte-offset table and the text bytes are built once per row, so the
  * only per-position work is the MD5 update over the gram's byte slice.
  *
  * This keeps [[graft.llmops.DedupOps.exactSubstringDedup]]'s portable
  * (oracle-replayable) mode on exact md5 collision semantics while
  * sharing the fast mode's `posexplode(array)` dataflow shape.
  */
case class Md5PositionHashes(child: Expression, len: Int)
    extends UnaryExpression {

  require(len > 0, "len must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_md5_position_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Md5PositionHashes.compute(input.asInstanceOf[UTF8String], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5PositionHashes.compute($c, $len);")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PositionHashes = copy(child = newChild)
}

object Md5PositionHashes {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, len: Int): ArrayData = {
    val bytes = text.getBytes
    // byte offset of each code-point boundary (offsets(i) = start of code
    // point i; offsets(n) = total bytes) — one O(bytes) walk
    val nBytes = bytes.length
    var cpCount = 0
    var b = 0
    while (b < nBytes) {
      b += UTF8String.numBytesForFirstByte(bytes(b))
      cpCount += 1
    }
    if (cpCount < len) return new GenericArrayData(Array.empty[Array[Byte]])
    val offsets = new Array[Int](cpCount + 1)
    var cp = 0
    b = 0
    while (b < nBytes) {
      offsets(cp) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      cp += 1
    }
    offsets(cpCount) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Array[Byte]](cpCount - len + 1)
    var i = 0
    while (i + len <= cpCount) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + len) - offsets(i))
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}
