package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Backward as-of join: for each left row, the single right row with the
  * greatest ordering value ≤ the left row's (per key) — the standard
  * "latest quote at or before the trade" operator.
  *
  * Spark has no native as-of join; the preferred construction here follows
  * the composition tier (SURVEY §"custom operators"): tag both sides,
  * union, and carry the last right value forward with one
  * `last(..., ignoreNulls)` window — a single hash shuffle on the keys and
  * an in-partition sort, instead of the O(n·m) range join a naive
  * `l.ts >= r.ts` condition would plan. Skewed keys fall to AQE or
  * [[Skew]] salting like any other keyed shuffle.
  */
object AsOfJoin {

  /** @param left      probe side (each row appears exactly once in output)
    * @param right     reference side whose latest-at-or-before row is joined
    * @param keys      equi-join key columns (present in both)
    * @param ordCol    ordering column name (present in both, e.g. event time)
    * @param rightCols right columns to carry (renamed as given in the map)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      rightCols: Map[String, String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.toSeq // (rightName, outputName)

    // The carried right columns travel as ONE struct so a single
    // last(ignoreNulls) window picks the whole matched row atomically:
    // per-column carries could mix columns from different right rows and
    // resurrect a NULL in the latest row from an older non-null one —
    // diverging from ASOF semantics (DuckDB/pandas join the matched row,
    // nulls included). The struct is non-null whenever a right row exists,
    // even if every carried value in it is null.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(
        (keys.map(col) :+ col(ordCol).alias("__ord") :+ col("__side")) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => col(c).alias(s"__l_$c")) :+
          lit(null).alias("__r"): _*)

    val taggedRight = right
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col(ordCol).alias("__ord") :+ col("__side")) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => lit(null).alias(s"__l_$c")) :+
          struct(carried.map { case (in, out) => col(in).alias(out) }: _*)
            .alias("__r"): _*)

    // right rows sort before left rows at equal __ord so "at or before"
    // includes ties (matching ASOF's >= semantics)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withCarry = taggedLeft.unionByName(taggedRight)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))

    withCarry.filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ord").alias(ordCol)) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => col(s"__l_$c").alias(c)) ++
          carried.map { case (_, out) => col("__c").getField(out).alias(out) }: _*)
  }
}
