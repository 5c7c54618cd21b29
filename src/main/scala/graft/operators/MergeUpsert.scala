package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Key-based upsert with Delta-MERGE semantics over plain Parquet
  * (this build has no Delta jars; the semantics mirror
  * light_transform.py:1382-1392 — `whenMatchedUpdateAll` /
  * `whenNotMatchedInsertAll` on the conjunction of IS_ID columns, with the
  * batch pre-deduped so a key never matches twice).
  *
  * merge(old, new, keys):
  *   - keys present in both → the NEW row wins (update-all)
  *   - keys only in old     → kept
  *   - keys only in new     → inserted
  *
  * Implementation: union with a precedence flag + one keep-latest window on
  * the keys. One shuffle on the id columns, no driver-side collection —
  * at 100 TB this is the same hash-partitioned join Delta MERGE performs
  * internally; AQE handles skewed keys.
  */
object MergeUpsert {

  def merge(oldDf: DataFrame, newDf: DataFrame, idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "merge requires at least one id column")
    val cols = oldDf.columns.toSeq
    val newAligned = newDf.select(cols.map(col): _*)
    val flagged = oldDf.withColumn("__prec", lit(0))
      .unionByName(newAligned.withColumn("__prec", lit(1)))
    val w = Window.partitionBy(idCols.map(col): _*).orderBy(col("__prec").desc)
    flagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__prec")
  }

  /** Upsert `batch` into the Parquet table at `path`; creates it when absent.
    * Writes to a staging dir then swaps, so readers never see a half-written
    * table (Delta gets this from its log; plain Parquet needs the rename).
    */
  def upsertParquet(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      idCols: Seq[String],
      partitionCols: Seq[String] = Nil
  ): Unit = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Maintenance.recover(spark, path) // self-heal an interrupted prior swap
    val deduped = batch.dropDuplicates()
    if (!fs.exists(hPath)) {
      write(deduped, path, partitionCols)
    } else {
      val existing = spark.read.parquet(path)
      val merged = merge(existing, deduped, idCols)
      val tmp = new Path(path + "__staging")
      write(merged, tmp.toString, partitionCols)
      val bak = new Path(path + "__old")
      if (fs.exists(bak)) fs.delete(bak, true)
      fs.rename(hPath, bak)
      fs.rename(tmp, hPath)
      fs.delete(bak, true)
    }
  }

  private def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val writer = df.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
