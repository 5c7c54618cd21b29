package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Watermark store with the reference's two-phase (PENDING → CONFIRMED)
  * semantics, keyed `project#table#column`
  * (utils/extract_data_v2/load/watermark_storage/dynamodb_watermark_storage.py:23-101,
  * transactional variant transactional_watermark_storage.py;
  * orchestration at core/orchestrator.py:588-627).
  *
  * Backed by a small Parquet table `(key, value, status, updated_at)` —
  * driver-side metadata, a few KB; read/written whole. The 90-day TTL of the
  * DynamoDB store becomes an expiry filter on read.
  */
final class WatermarkStore(spark: SparkSession, path: String, ttlDays: Int = 90) {
  import WatermarkStore._

  def key(project: String, table: String, column: String): String =
    s"$project#$table#$column"

  private def table(): Option[DataFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** Last CONFIRMED, unexpired watermark value for a key. */
  def get(wmKey: String): Option[String] = this.synchronized {
    table().flatMap { df =>
      val cutoff = System.currentTimeMillis() - ttlDays * MillisPerDay
      df.filter(col("key") === wmKey && col("status") === Confirmed &&
          col("updated_at") >= cutoff)
        .orderBy(col("updated_at").desc)
        .limit(1)
        .collect()
        .headOption
        .map(_.getAs[String]("value"))
    }
  }

  /** Phase 1: record the candidate watermark as PENDING.
    *
    * All mutations are serialized on the store instance: the backing file
    * is read-modify-write, and [[graft.runner.Runner]] calls this from
    * concurrent per-table threads (the DynamoDB original got atomicity
    * from the database; a driver-side lock is the single-JVM equivalent).
    */
  def saveProvisional(wmKey: String, value: String): Unit = this.synchronized {
    put(wmKey, value, Pending)
  }

  /** Phase 2: after a successful load, promote to CONFIRMED. */
  def confirm(wmKey: String): Unit = this.synchronized {
    val pendingValue = table().flatMap { df =>
      df.filter(col("key") === wmKey && col("status") === Pending)
        .orderBy(col("updated_at").desc)
        .limit(1).collect().headOption.map(_.getAs[String]("value"))
    }
    pendingValue.foreach(v => put(wmKey, v, Confirmed))
  }

  /** RESET load mode: drop the key entirely (models/load_mode.py:4-27). */
  def delete(wmKey: String): Unit = this.synchronized {
    rewrite(_.filter(col("key") =!= wmKey))
  }

  private def put(wmKey: String, value: String, status: String): Unit = {
    import spark.implicits._
    val row = Seq((wmKey, value, status, System.currentTimeMillis()))
      .toDF("key", "value", "status", "updated_at")
    table() match {
      case Some(df) =>
        rewrite(df.filter(!(col("key") === wmKey && col("status") === status))
          .unionByName(row))
      case None =>
        row.write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  private def rewrite(updated: DataFrame): Unit = {
    // Tiny metadata table: materialize on the driver, then swap atomically.
    val rows = updated.collect()
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), updated.schema)
    out.write.mode(SaveMode.Overwrite).parquet(path + "__tmp")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(path + "__tmp"), new Path(path))
  }

  private def rewrite(f: DataFrame => DataFrame): Unit =
    table().foreach(df => rewrite(f(df)))
}

object WatermarkStore {
  val Pending = "PENDING"
  val Confirmed = "CONFIRMED"
  private val MillisPerDay = 24L * 3600 * 1000
}
