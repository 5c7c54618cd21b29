package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd kernels for the PQ / IVF similarity family.
  *
  * The dataflow forms they replace (crossJoin the broadcast codebook →
  * explode the subspace index → interpreted `aggregate(zip_with(...))`
  * per (row, centroid, subspace) → one or two aggregation exchanges to
  * reassemble per-row results) multiply the corpus by numCentroids ×
  * numSubspaces rows and run every distance as an interpreted HOF tree.
  * With the codebook embedded as a driver-side constant (it is ≤ 64 K
  * rows by the [[graft.llmops.Similarity.ivfCentroidsFor]] clamp, and the
  * gate configs are 16), encode / coarse-assignment become per-row-local
  * projections: zero joins, zero exchanges, one tight loop.
  *
  * Determinism contract (the whole family is oracle-replayed): every sum
  * folds in ascending index order in double precision, argmins tie to the
  * smaller centroid id, doubles compare like Spark's
  * `SQLOrderingUtil.compareDoubles` (NaN greatest, -0.0 == 0.0), and a
  * null distance/score sorts FIRST — exactly the `min_by(id,
  * struct(metric, id))` ordering (ASC NULLS FIRST) of the dataflow form.
  * Null handling mirrors the two dataflow idioms:
  *   - zip semantics (`zipLengths = true`, the crossJoin+`zip_with` form):
  *     a length mismatch or any null element nulls the whole metric;
  *   - join semantics (`zipLengths = false`, the posexplode-join form):
  *     dimensions are matched by index (extra dimensions on either side
  *     drop) and null terms are SKIPPED like SQL `SUM`; a group with no
  *     non-null term has a null metric.
  */
object PqKernels {

  /** Spark double ordering: NaN greatest, NaN == NaN, -0.0 == 0.0. */
  @inline private def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  @inline private def get(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Squared L2 of subspace `m` between `vec` and `cent` under zip
    * semantics over the FULL vectors: the dataflow form slices both
    * arrays [m·sd, m·sd+sd) and zip_with pads a short slice with nulls —
    * so the distance is null iff either array ends before the slice does
    * or any element in the slice is null. Returns null boxed.
    */
  private def subDist(vec: ArrayData, isFloat: Boolean, cent: Array[Double],
      base: Int, sd: Int): java.lang.Double = {
    if (base + sd > vec.numElements() || base + sd > cent.length) return null
    var s = 0.0
    var i = base
    while (i < base + sd) {
      if (vec.isNullAt(i)) return null
      val d = get(vec, i, isFloat) - cent(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Dot product of `vec` and `cent` — zip semantics (null on length
    * mismatch or null element) or join semantics (index-matched,
    * null-skipping SUM; null when no non-null term). Ascending fold.
    */
  private def dot(vec: ArrayData, isFloat: Boolean, cent: Array[Double],
      zipLengths: Boolean): java.lang.Double = {
    val n = vec.numElements()
    if (zipLengths) {
      if (n != cent.length) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        s += get(vec, i, isFloat) * cent(i)
        i += 1
      }
      java.lang.Double.valueOf(s)
    } else {
      val m = math.min(n, cent.length)
      var s = 0.0
      var any = false
      var i = 0
      while (i < m) {
        if (!vec.isNullAt(i)) { s += get(vec, i, isFloat) * cent(i); any = true }
        i += 1
      }
      if (any) java.lang.Double.valueOf(s) else null
    }
  }

  /** All numSubspaces PQ codes of `vec` against `cb` in one pass —
    * code m = argmin_j subDist(m, j), null distances first (the
    * `min_by(j, struct(dd, j))` contract), ties to the smaller j.
    */
  def pqCodes(vec: ArrayData, isFloat: Boolean, cb: Array[Array[Double]],
      numSubspaces: Int): ArrayData = {
    val n = vec.numElements()
    if (n % numSubspaces != 0)
      throw new IllegalArgumentException(
        s"PQ: vector length $n is not divisible by numSubspaces=$numSubspaces")
    val sd = n / numSubspaces
    val out = new Array[Int](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      val base = m * sd
      var bestJ = -1
      var bestDd = 0.0
      var bestNull = false
      var j = 0
      while (j < cb.length) {
        val dd = subDist(vec, isFloat, cb(j), base, sd)
        if (dd == null) {
          if (!bestNull) { bestNull = true; bestJ = j }
          // null sorts first; among nulls the smaller j wins — first hit
        } else if (!bestNull &&
            (bestJ < 0 || cmp(dd.doubleValue(), bestDd) < 0)) {
          bestJ = j
          bestDd = dd.doubleValue()
        }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  /** tab[m][j] = subDist(m, j) — the per-query ADC distance table in one
    * pass, inner arrays ordered by j (nullable elements, zip semantics
    * like the dataflow `pqSubDists`).
    */
  def subDistTable(vec: ArrayData, isFloat: Boolean, cb: Array[Array[Double]],
      numSubspaces: Int): ArrayData = {
    val n = vec.numElements()
    if (n % numSubspaces != 0)
      throw new IllegalArgumentException(
        s"PQ: vector length $n is not divisible by numSubspaces=$numSubspaces")
    val sd = n / numSubspaces
    val rows = new Array[Any](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      val row = new Array[Any](cb.length)
      var j = 0
      while (j < cb.length) {
        row(j) = subDist(vec, isFloat, cb(j), m * sd, sd)
        j += 1
      }
      rows(m) = new GenericArrayData(row)
      m += 1
    }
    new GenericArrayData(rows)
  }

  /** Coarse IVF scores against every centroid: score j =
    * 0.0 when ‖c_j‖ = 0, else -dot(vec, c_j)/‖c_j‖ (null dot → null
    * score, except the zero-norm guard which fires first). `norms` are
    * precomputed ONCE per centroid with the same ascending fold the
    * dataflow form used per (row, centroid) pair.
    */
  def coarseScores(vec: ArrayData, isFloat: Boolean, cents: Array[Array[Double]],
      norms: Array[Double], zipLengths: Boolean): ArrayData = {
    val out = new Array[Any](cents.length)
    var j = 0
    while (j < cents.length) {
      out(j) =
        if (norms(j) == 0.0) java.lang.Double.valueOf(0.0)
        else {
          val d = dot(vec, isFloat, cents(j), zipLengths)
          if (d == null) null
          else java.lang.Double.valueOf(-d.doubleValue() / norms(j))
        }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** argmin over [[coarseScores]] — null scores first, ties to the
    * smaller index (the `min_by(cent_id, struct(score, cent_id))`
    * contract). Returns the 0-based centroid INDEX; callers add their id
    * offset.
    */
  def coarseAssign(vec: ArrayData, isFloat: Boolean, cents: Array[Array[Double]],
      norms: Array[Double], zipLengths: Boolean): Int = {
    var bestJ = -1
    var bestScore = 0.0
    var bestNull = false
    var j = 0
    while (j < cents.length) {
      val s: java.lang.Double =
        if (norms(j) == 0.0) java.lang.Double.valueOf(0.0)
        else {
          val d = dot(vec, isFloat, cents(j), zipLengths)
          if (d == null) null else java.lang.Double.valueOf(-d.doubleValue() / norms(j))
        }
      if (s == null) {
        if (!bestNull) { bestNull = true; bestJ = j }
      } else if (!bestNull && (bestJ < 0 || cmp(s.doubleValue(), bestScore) < 0)) {
        bestJ = j
        bestScore = s.doubleValue()
      }
      j += 1
    }
    bestJ
  }

  /** In-order ADC sum Σ_m tab[m][codes[m]] — null when the arrays'
    * lengths differ, any row or code is null, or a code indexes outside
    * its row (the `aggregate(zip_with(tab, codes, element_at))` nulls).
    */
  def adist(tab: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = tab.numElements()
    if (codes.numElements() != m) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (tab.isNullAt(i) || codes.isNullAt(i)) return null
      val row = tab.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      s += row.getDouble(c)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

private[expressions] trait VecChildFloat { self: UnaryExpression =>
  protected lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $other")
  }
}

/** `array<int>` of PQ codes for a vector against an embedded codebook. */
case class PqCodesExpr(child: Expression, cb: IndexedSeq[IndexedSeq[Double]],
    numSubspaces: Int) extends UnaryExpression with VecChildFloat {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  @transient private lazy val cbArr: Array[Array[Double]] =
    cb.map(_.toArray).toArray
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.pqCodes(input.asInstanceOf[ArrayData], childIsFloat, cbArr,
      numSubspaces)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cbArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.pqCodes($c, $childIsFloat, " +
        s"$ref, $numSubspaces);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

/** `array<array<double>>` ADC distance table tab[m][j]. */
case class PqSubDistTableExpr(child: Expression,
    cb: IndexedSeq[IndexedSeq[Double]], numSubspaces: Int)
    extends UnaryExpression with VecChildFloat {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def prettyName: String = "graft_pq_subdist_table"
  @transient private lazy val cbArr: Array[Array[Double]] =
    cb.map(_.toArray).toArray
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.subDistTable(input.asInstanceOf[ArrayData], childIsFloat, cbArr,
      numSubspaces)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cbArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.subDistTable($c, " +
        s"$childIsFloat, $ref, $numSubspaces);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): PqSubDistTableExpr = copy(child = newChild)
}

/** `array<double>` of coarse scores (index = centroid position). */
case class CoarseScoresExpr(child: Expression,
    cents: IndexedSeq[IndexedSeq[Double]], zipLengths: Boolean)
    extends UnaryExpression with VecChildFloat {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_coarse_scores"
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] =
    CoarseScoresExpr.norms(centArr)
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.coarseScores(input.asInstanceOf[ArrayData], childIsFloat,
      centArr, normArr, zipLengths)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarseCents", centArr, "double[][]")
    val nRef = ctx.addReferenceObj("coarseNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.coarseScores($c, " +
        s"$childIsFloat, $cRef, $nRef, $zipLengths);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): CoarseScoresExpr = copy(child = newChild)
}

object CoarseScoresExpr {
  /** ‖c‖ per centroid — the same ascending `Σ c_i²` fold then sqrt the
    * dataflow form computed per (row, centroid) pair; hoisting it to one
    * evaluation per centroid produces bit-identical doubles.
    */
  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
}

/** 0-based argmin of [[CoarseScoresExpr]] (callers add their id offset). */
case class CoarseAssignExpr(child: Expression,
    cents: IndexedSeq[IndexedSeq[Double]], zipLengths: Boolean)
    extends UnaryExpression with VecChildFloat {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_coarse_assign"
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] =
    CoarseScoresExpr.norms(centArr)
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.coarseAssign(input.asInstanceOf[ArrayData], childIsFloat,
      centArr, normArr, zipLengths)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarseCents", centArr, "double[][]")
    val nRef = ctx.addReferenceObj("coarseNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PqKernels.coarseAssign($c, " +
        s"$childIsFloat, $cRef, $nRef, $zipLengths);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): CoarseAssignExpr = copy(child = newChild)
}

/** Symmetric int8 quantization `struct(scale, codes)` in ONE pass — the
  * Column composition re-evaluated the interpreted max-|x| aggregate
  * inside the codes `transform` lambda, i.e. once per ELEMENT (64× per
  * row on 64-dim vectors). Semantics replicated exactly: scale =
  * (greatest fold over |x|, null elements skipped, NaN greatest) / 127;
  * scale == 0 → all-zero codes (null elements included — the lambda was
  * `_ => 0`); else floor(x/scale + 0.5) cast to int with non-ANSI
  * semantics (Scala toInt: NaN → 0), null elements → null codes; a null
  * vector → struct(null, null), NOT a null struct (struct() of null
  * fields is non-null).
  */
case class QuantizeInt8Expr(child: Expression)
    extends UnaryExpression with VecChildFloat {
  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.types.StructField
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("codes", ArrayType(IntegerType, containsNull = true),
      nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantize_int8"
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    QuantizeInt8Expr.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], childIsFloat)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val call = s"graft.expressions.QuantizeInt8Expr.compute(" +
      s"${childGen.isNull} ? null : ${childGen.value}, $childIsFloat)"
    ev.copy(
      code = childGen.code +
        code"InternalRow ${ev.value} = $call;",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8Expr = copy(child = newChild)
}

object QuantizeInt8Expr {
  def compute(v: ArrayData, isFloat: Boolean):
      org.apache.spark.sql.catalyst.InternalRow = {
    if (v == null)
      return new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](null, null))
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val a = math.abs(x)
        // greatest(): nan-safe ordering, NaN greatest
        if (!(a == acc) && java.lang.Double.compare(a, acc) > 0) acc = a
      }
      i += 1
    }
    val scale = acc / 127.0
    val codes = new Array[Any](n)
    if (scale == 0.0) {
      i = 0
      while (i < n) { codes(i) = 0; i += 1 }
    } else {
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          codes(i) = math.floor(x / scale + 0.5).toInt
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(codes)))
  }
}

/** In-order ADC sum `Σ_m tab[m][codes[m]]` as one native expression. */
case class PqAdistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adist"
  override protected def nullSafeEval(tab: Any, codes: Any): Any =
    PqKernels.adist(tab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res0 = ctx.freshName("adistRes")
    nullSafeCodeGen(ctx, ev, (t, c) => {
      s"""
         |java.lang.Double $res0 = graft.expressions.PqKernels.adist($t, $c);
         |if ($res0 == null) { ${ev.isNull} = true; } else { ${ev.value} = $res0; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdistExpr =
    copy(left = newLeft, right = newRight)
}
