package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit perceptual difference hash (dHash) of a PNG —
  * `PngDHash(content)` decodes via [[PngPixels.decodeRaw]] (shared
  * inflate + unfilter kernel), reduces to a 9×8 grid of grayscale cell
  * averages, and emits one bit per horizontally adjacent cell pair:
  * bit `j*8+i` is set iff cell `(i+1, j)` is brighter than cell
  * `(i, j)`. Gradient direction survives uniform brightness/contrast
  * shifts and re-encoding, which is what makes dHash the standard cheap
  * screen for near-duplicate images (same family as pHash/aHash; see
  * Krawetz's "Kind of Like That" construction) — two visually identical
  * images land within a few bits of Hamming distance, so near-dup
  * detection becomes [[graft.llmops.Multimodal.imageNearDup]]'s banded
  * self-join over this value, the image twin of SimHash-over-text.
  *
  * Determinism is integer-only, so an external SQL engine replays the
  * exact hash from closed-form pixels:
  *  - grayscale `g = (r + g + b) / 3` (integer floor; alpha ignored),
  *  - cell `(i, j)` covers `x ∈ [⌊i·W/9⌋, ⌊(i+1)·W/9⌋)`,
  *    `y ∈ [⌊j·H/8⌋, ⌊(j+1)·H/8⌋)`,
  *  - the average comparison is cross-multiplied —
  *    `sumR·cntL > sumL·cntR` — no float division anywhere
  *    (bounded: sum ≤ 255·cellpx, cellpx ≤ 64 MB/3/72, product < 2^45).
  *
  * NULL for anything [[PngPixels]] refuses, and for images smaller than
  * the grid (width < 9 or height < 8) — a 9×8 downsample of fewer
  * pixels would have empty cells and pin bits to an arbitrary
  * convention; refuse rather than hash garbage.
  */
case class PngDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_dhash"

  override protected def nullSafeEval(input: Any): Any =
    PngDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("dh")
      s"""
         |java.lang.Long $v = graft.expressions.PngDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): PngDHash =
    copy(child = newChild)
}

object PngDHash {

  val GridW = 9
  val GridH = 8

  /** Static kernel shared by interpreted eval and generated code;
    * boxed so codegen and the interpreter share one null convention.
    */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = PngPixels.decodeRaw(b)
    if (d == null || d.width < GridW || d.height < GridH) return null
    val bpp = d.channels
    val stride = d.width * bpp
    // integer grayscale sums per 9×8 cell, one pass over the pixels
    val sums = new Array[Long](GridW * GridH)
    val cnts = new Array[Long](GridW * GridH)
    var y = 0
    while (y < d.height) {
      val cy = cellIndex(y, d.height, GridH)
      val rowOff = y * (1 + stride) + 1
      var x = 0
      while (x < d.width) {
        val cx = cellIndex(x, d.width, GridW)
        val p = rowOff + x * bpp
        val gray = ((d.raw(p) & 0xFF) + (d.raw(p + 1) & 0xFF) +
          (d.raw(p + 2) & 0xFF)) / 3
        val cell = cy * GridW + cx
        sums(cell) += gray
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(gradientHash(sums, cnts))
  }

  /** Bit layout shared by every dHash producer ([[PngDHash]],
    * [[JpegDHash]]): bit `j·8+i` set iff cell (i+1, j) is brighter than
    * cell (i, j), compared cross-multiplied so no float division enters
    * the hash.
    */
  private[expressions] def gradientHash(sums: Array[Long],
      cnts: Array[Long]): Long = {
    var hash = 0L
    var j = 0
    while (j < GridH) {
      var i = 0
      while (i < GridW - 1) {
        val l = j * GridW + i
        val r = l + 1
        // avgR > avgL without division: sumR/cntR > sumL/cntL
        if (sums(r) * cnts(l) > sums(l) * cnts(r))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** The cell index `i` with `⌊i·n/g⌋ <= v < ⌊(i+1)·n/g⌋`, in closed
    * form: `⌈(v+1)·g/n⌉ - 1 = ((v+1)·g - 1) / n` (integer division).
    * Exact for every floor boundary — the naive `v·g/n` misassigns
    * pixels whose cell start was rounded down — and trivially
    * replicated in SQL, which is what lets the oracle recompute the
    * hash. (Derivation: `⌊i·n/g⌋ <= v  ⟺  i·n/g < v+1`, and
    * `v < ⌊(i+1)·n/g⌋  ⟺  v+1 <= (i+1)·n/g`, which pin
    * `i = ⌈(v+1)·g/n⌉ - 1`.)
    */
  private[expressions] def cellIndex(v: Int, n: Int, g: Int): Int =
    (((v + 1).toLong * g - 1) / n).toInt
}
