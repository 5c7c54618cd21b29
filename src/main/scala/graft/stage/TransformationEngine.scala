package graft.stage

import graft.config.ColumnMetadata
import graft.dsl.TransformCompiler
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.{Column, DataFrame}

/** Applies the per-column transformation DSL to a raw DataFrame with the
  * reference's error-containment policy
  * (light_transform.py:694-737 apply_transformations, :1471-1509 triage):
  * a failing column becomes a typed NULL and is tallied; >50% failed columns
  * fails the job, 10–50% is a warning.
  *
  * All transforms land in ONE `select` so whole-stage codegen fuses them
  * into a single projection pass (light_transform.py:732-733 does the same).
  */
object TransformationEngine {

  sealed trait Outcome
  case object Ok extends Outcome
  final case class Warning(errors: Seq[String]) extends Outcome
  final case class Failed(errors: Seq[String]) extends Outcome

  final case class Result(df: DataFrame, errors: Seq[String], outcome: Outcome)

  def applyTransformations(df: DataFrame, columns: Seq[ColumnMetadata]): Result = {
    val dfCols = df.columns.toSet
    val errors = Seq.newBuilder[String]
    var errorCount = 0

    val sorted = columns.sortBy(_.columnId)
    def nullFallback(meta: ColumnMetadata): Column =
      lit(null).cast(TransformCompiler.sparkType(meta.dataType)).alias(meta.name)
    val exprs: Seq[Column] = sorted.map { meta =>
      try {
        val c = TransformCompiler.compile(
          meta.transformation, meta.dataType, dfCols).alias(meta.name)
        // analyzer dry-run: Dataset construction analyzes eagerly, so a
        // compile-clean expression can still fail ANALYSIS (e.g. a raw
        // column literally named "a.b" resolving as struct access) — that
        // failure must hit THIS column's triage, not escape from the
        // fused select below and fail the whole table
        df.select(c)
        c
      } catch {
        case e: Exception =>
          errors += s"Error en columna ${meta.name}: ${e.getMessage}"
          errorCount += 1
          nullFallback(meta)
      }
    }

    val out = if (exprs.nonEmpty) df.select(exprs: _*) else df
    val errs = errors.result()
    val rate = if (sorted.isEmpty) 0.0 else errorCount.toDouble / sorted.size
    val outcome =
      if (rate > 0.5) Failed(errs)
      else if (rate > 0.1) Warning(errs)
      else Ok
    Result(out, errs, outcome)
  }

}
