package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of joins: for each left row, the single right row nearest in the
  * ordering column (per key) — backward ("latest quote at or before the
  * trade"), forward ("next reading at or after the event"), or nearest
  * (either side, ties to backward).
  *
  * Spark has no native as-of join; the preferred construction here follows
  * the composition tier (SURVEY §"custom operators"): tag both sides,
  * union, and carry the matched right row across with ONE windowed
  * `last`/`first(..., ignoreNulls)` — a single hash shuffle on the keys and
  * in-partition sorts, instead of the O(n·m) range join a naive
  * `l.ts >= r.ts` condition would plan. Skewed keys fall to AQE or
  * [[Skew]] salting like any other keyed shuffle.
  */
object AsOfJoin {

  /** Latest right row with ordering ≤ the left row's (ties match). */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      rightCols: Map[String, String]
  ): DataFrame = asof(left, right, keys, ordCol, rightCols, "backward")

  /** Earliest right row with ordering ≥ the left row's (ties match). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      rightCols: Map[String, String]
  ): DataFrame = asof(left, right, keys, ordCol, rightCols, "forward")

  /** Right row minimizing |left.ord − right.ord|; equidistant candidates
    * resolve to the backward (earlier) row — deterministic and matching
    * the "prefer what already happened" reading of sensor alignment.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      rightCols: Map[String, String]
  ): DataFrame = asof(left, right, keys, ordCol, rightCols, "nearest")

  /** @param left      probe side (each row appears exactly once in output)
    * @param right     reference side whose matched row is joined
    * @param keys      equi-join key columns (present in both)
    * @param ordCol    ordering column name (present in both, e.g. event time)
    * @param rightCols right columns to carry (renamed as given in the map)
    */
  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ordCol: String,
      rightCols: Map[String, String],
      direction: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.toSeq // (rightName, outputName)

    // The carried right columns travel as ONE struct so a single windowed
    // pick selects the whole matched row atomically: per-column carries
    // could mix columns from different right rows and resurrect a NULL in
    // the matched row from an older non-null one — diverging from ASOF
    // semantics (DuckDB/pandas join the matched row, nulls included). The
    // struct is non-null whenever a right row exists, even if every carried
    // value in it is null. `__rord` rides along for nearest's distance
    // comparison.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(
        (keys.map(col) :+ col(ordCol).alias("__ord") :+ col("__side")) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => col(c).alias(s"__l_$c")) :+
          lit(null).alias("__r"): _*)

    // ASOF semantics: a right row with a NULL ordering value can never be
    // "at or before/after" anything — but NULLs sort FIRST under asc, so
    // an unfiltered null-ord row would land inside every backward frame
    // and its (non-null) carried struct would win the match
    val taggedRight = right.filter(col(ordCol).isNotNull)
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col(ordCol).alias("__ord") :+ col("__side")) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => lit(null).alias(s"__l_$c")) :+
          struct(col(ordCol).alias("__rord") +:
            carried.map { case (in, out) => col(in).alias(out) }: _*)
            .alias("__r"): _*)

    // Backward: right rows sort BEFORE left rows at equal __ord so "at or
    // before" includes ties. Forward: right rows sort AFTER left rows so
    // "at or after" includes ties. Both windows share the hash partitioning
    // (one exchange); nearest pays the second in-partition sort, not a
    // second shuffle.
    val wb = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val unioned = taggedLeft.unionByName(taggedRight)
    val withCarry = direction match {
      case "backward" =>
        unioned.withColumn("__c", last(col("__r"), ignoreNulls = true).over(wb))
      case "forward" =>
        unioned.withColumn("__c", first(col("__r"), ignoreNulls = true).over(wf))
      case "nearest" =>
        val b = last(col("__r"), ignoreNulls = true).over(wb)
        val f = first(col("__r"), ignoreNulls = true).over(wf)
        unioned
          .withColumn("__b", b)
          .withColumn("__f", f)
          .withColumn("__c",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              // strict <: an equidistant forward candidate loses to backward
              .when(abs(col("__f").getField("__rord") - col("__ord")) <
                abs(col("__ord") - col("__b").getField("__rord")), col("__f"))
              .otherwise(col("__b")))
    }

    withCarry.filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__ord").alias(ordCol)) ++
          leftCols.filterNot(c => keys.contains(c) || c == ordCol)
            .map(c => col(s"__l_$c").alias(c)) ++
          carried.map { case (_, out) => col("__c").getField(out).alias(out) }: _*)
  }
}
