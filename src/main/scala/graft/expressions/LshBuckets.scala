package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-random-projection LSH bucket ids for `numTables` independent plane
  * sets, as one native codegen'd pass over the vector: element t of the
  * result packs `numPlanes` projection signs (bit p = 1 iff
  * Σ_d v[d]·sign(t·numPlanes+p, d) > 0).
  *
  * Bucketing is per-row-local, so computing it inside the scan projection
  * replaces a posexplode → (numTables×numPlanes)-buffer groupBy → join-back
  * pipeline (three exchanges and a wide hash-aggregate) with zero shuffles.
  *
  * The plane sign is the same two-round LCG mod 2^31 used by
  * [[graft.llmops.Similarity.planeSign]] — pure integer arithmetic, so the
  * identical plane set is reproducible in any SQL engine (and verified
  * equivalent in SimilaritySpec). Accumulation runs in ascending dimension
  * order in double precision, matching both the Column form's partial
  * aggregation and a SQL list-comprehension fold.
  */
case class LshBuckets(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  // lazy: the child is unresolved at construction time; element type is
  // only inspectable once the analyzer has bound the attribute
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"graft_lsh_buckets expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], numPlanes, numTables, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshBuckets.compute($c, $numPlanes, $numTables, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** Cosine similarity of two numeric arrays as a native codegen'd binary
  * expression: dot/(‖a‖·‖b‖) with all three folds in ascending index order
  * in double precision — bit-identical to the interpreted
  * `aggregate(zip_with(...))` composition it replaces (which costs 10-50×
  * more per pair on large candidate sets). Null if either array is null,
  * lengths differ, or any element is null (matching zip_with/aggregate
  * null propagation).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private lazy val leftFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"graft_cosine expects array<float|double>, got $other")
  }
  private lazy val rightFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"graft_cosine expects array<float|double>, got $other")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: a fixed local would redeclare when the expression
    // appears twice in one generated method over non-nullable children
    val res0 = ctx.freshName("cosRes")
    val res = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $res0 = graft.expressions.CosineSim.compute(
         |  $a, $b, $leftFloat, $rightFloat);
         |if ($res0 == null) { ${ev.isNull} = true; } else { ${ev.value} = $res0; }
       """.stripMargin
    })
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Returns null (boxed) when lengths differ or any element is null. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

object LshBuckets {

  /** ±1 for (global plane p, dimension d): multiply-mod-2^31 rounds with
    * xor-shift mixing — must stay bit-identical to
    * [[graft.llmops.Similarity.planeSign]] (the xor-shifts break the
    * linearity that made a plain LCG collide ~20× more than random signs).
    */
  def planeSign(p: Int, d: Int): Double = {
    // floorMod, not %: Similarity.planeSign uses Spark pmod, and the
    // first multiply overflows Long once the global plane index passes
    // ~3475 — '%' would go negative there and silently break the
    // bit-identical/SQL-replayable contract for large plane configs
    // (identical results below the overflow point, every gate config)
    val x = p.toLong * 1000003L + d
    val h1 = java.lang.Math.floorMod(x * 2654435761L + 1013904223L, 2147483647L)
    val h1x = h1 ^ (h1 >> 13)
    val h2 = java.lang.Math.floorMod(h1x * 1103515245L + 12345L, 2147483647L)
    val h2x = h2 ^ (h2 >> 7)
    val h3 = java.lang.Math.floorMod(h2x * 48271L, 2147483647L)
    if (((h3 >> 15) & 1L) == 0L) 1.0 else -1.0
  }

  def compute(vec: ArrayData, numPlanes: Int, numTables: Int,
      isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](numTables)
    // a null element nulls the whole projection in the Column form
    // (zip_with product → aggregate → null; `when(null > 0)` → bit 0),
    // so every bucket is 0 there — match it exactly rather than unboxing
    // null to 0.0 and emitting real bucket ids the Column form never sees
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = vec.isNullAt(i); i += 1 }
    if (hasNull) return new GenericArrayData(out)
    var tb = 0
    while (tb < numTables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val gp = tb * numPlanes + p
        var proj = 0.0
        var d = 0
        while (d < n) {
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          proj += x * planeSign(gp, d)
          d += 1
        }
        if (proj > 0) bucket |= 1L << p
        p += 1
      }
      out(tb) = bucket
      tb += 1
    }
    new GenericArrayData(out)
  }
}
