package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-versioning operators for the stage layer. */
object Dedup {

  /** W1 keep-latest dedup (light_transform.py:1786-1797):
    * `row_number() OVER (PARTITION BY idCols ORDER BY orderCols DESC)`,
    * keep rank 1 — collapses multiple incremental versions of a row to the
    * newest.
    *
    * Scale note: one hash-partition shuffle on the id columns; keys are
    * narrow and per-key groups are tiny (few versions per id), so this
    * holds at 100 TB. Skewed null-heavy id columns should be filtered
    * upstream.
    */
  def keepLatest(df: DataFrame, idCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    if (idCols.isEmpty || orderCols.isEmpty) df
    else {
      val w = Window
        .partitionBy(idCols.map(col): _*)
        .orderBy(orderCols.map(c => col(c).desc): _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** D1 full-row distinct (extract_data_spark.py:798; light_transform.py:1387). */
  def distinctRows(df: DataFrame): DataFrame = df.dropDuplicates()
}
