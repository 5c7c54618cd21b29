package graft.stage

import graft.config.{ColumnMetadata, TableConfig}
import graft.operators.{Dedup, MergeUpsert}
import graft.sources.RawLayer
import graft.dsl.TransformCompiler
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The stage-layer transform job: raw parquet → typed, deduped, merged table
  * (reference: light_transform.py DataProcessor.process_table :1423-1564).
  *
  * Pipeline: read raw (or synthesize empty) → compile+apply DSL in one
  * projection → error triage → keep-latest dedup (W1) → order (W2) →
  * overwrite or key-merge (K4/K5) routed by load type + IS_ID columns.
  */
object StageJob {

  sealed trait Status
  case object Success extends Status
  final case class CompletedWithWarnings(warnings: Seq[String]) extends Status
  final case class FailedTransform(errors: Seq[String]) extends Status
  case object EmptyInput extends Status

  final case class StageResult(status: Status, rowsWritten: Long)

  /** The retention properties the reference bakes into every stage Delta
    * write (light_transform.py:1373-1374: `delta.deletedFileRetentionDuration
    * = interval 7 days`, `delta.logRetentionDuration = interval 30 days`)
    * — committed as real table properties after each write. Idempotent:
    * an unchanged configuration commits nothing.
    */
  private def pinRetentionProps(spark: SparkSession, stagePath: String): Unit = {
    graft.sources.DeltaLog.setTableProperties(spark, stagePath, Map(
      graft.sources.DeltaLog.TombstoneRetentionProp -> "interval 7 days",
      graft.sources.DeltaLog.LogRetentionProp -> "interval 30 days"))
    ()
  }

  def run(
      spark: SparkSession,
      table: TableConfig,
      columns: Seq[ColumnMetadata],
      rawPath: String,
      stagePath: String
  ): StageResult = {
    val idCols = columns.filter(_.isId).map(_.name)
    val orderCols = columns.filter(_.isOrderBy).map(_.name)
    val partitionCols = columns.filter(_.isPartition).map(_.name)

    RawLayer.readRaw(spark, rawPath) match {
      case None =>
        // K8: still materialize a typed empty table (light_transform.py:1444-1462)
        val schema = StructType(columns.sortBy(_.columnId).map(c =>
          StructField(c.name, TransformCompiler.sparkType(c.dataType), nullable = true)))
        val prior = graft.sources.DeltaLog.replay(spark, stagePath)
        // partitioned tables bootstrap WITH partitionBy: an empty
        // partitioned write lands no data files (zero rows → zero
        // partition dirs), so the schema lives in the delta log (the
        // reference's empty Delta table is exactly metadata-only) — a
        // root-level schema file would poison partition discovery once
        // the first real batch adds `col=value/` dirs. Unpartitioned
        // tables keep the schema-only root part file (plain readers
        // stay functional there).
        val ew = RawLayer.emptyTyped(spark, schema)
          .write.mode(SaveMode.Overwrite)
        (if (partitionCols.nonEmpty) ew.partitionBy(partitionCols: _*) else ew)
          .parquet(stagePath)
        graft.sources.DeltaLog.reconcile(spark, stagePath, schema,
          partitionCols, operation = "WRITE", prior = prior,
          replaceSchema = true)
        pinRetentionProps(spark, stagePath)
        StageResult(EmptyInput, 0L)

      case Some(raw) =>
        val tr = TransformationEngine.applyTransformations(raw, columns)
        tr.outcome match {
          case TransformationEngine.Failed(errors) =>
            StageResult(FailedTransform(errors), 0L)
          case other =>
            val deduped = Dedup.keepLatest(tr.df, idCols, orderCols)

            // merge for incremental AND between-date, the reference's
            // stage condition (light_transform.py:1554) — plus
            // time_range, the v2 extractor's between-date alias
            // (strategy_factory.py:88): this engine window-extracts it
            // identically, so stage-overwriting it would silently drop
            // every row outside the current window (the reference's
            // literal two-string match never sees 'time_range' because
            // v2 is the standalone path). Everything else — full,
            // days_off — overwrites
            val isIncremental =
              Set("incremental", "between-date", "time_range")
                .contains(table.effectiveLoadType) && idCols.nonEmpty
            // persisted: the write and the row count both read this — the
            // count comes from the cache instead of a second full scan of
            // the written table (the redundant-count anti-pattern SURVEY §4
            // flags in the reference)
            val cached = deduped.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val rows =
              try {
                if (isIncremental) {
                  // no W2 sort here: upsertParquet's dedup + merge window
                  // shuffle immediately, so a pre-sort would be pure cost
                  MergeUpsert.upsertParquet(spark, cached, stagePath, idCols, partitionCols)
                  pinRetentionProps(spark, stagePath)
                  // rows written by THIS run = the DEDUPED batch (what the
                  // merge actually lands). With order columns, keepLatest
                  // already left one row per id, so the plain count is
                  // exact and free; without them keepLatest was a no-op
                  // and upsert's dropDuplicates may shrink the batch —
                  // count the same way it wrote
                  if (orderCols.nonEmpty) cached.count()
                  else cached.dropDuplicates().count()
                } else {
                  // W2: the reference global-sorts before write
                  // (light_transform.py:1799-1801). A global sort is one
                  // extra range-partitioning exchange; at 100 TB
                  // sortWithinPartitions gives the same file-local
                  // ordering without it. Overwrite path only — the merge
                  // path's shuffles would destroy the order anyway.
                  val ordered =
                    if (orderCols.nonEmpty)
                      cached.sortWithinPartitions(orderCols.map(col): _*)
                    else cached
                  // Spark Overwrite destroys the table dir, `_delta_log`
                  // included — capture the log state first so reconcile
                  // restarts it with version continuity (the reference's
                  // stage overwrite keeps its Delta history the same way,
                  // light_transform.py:1356-1380)
                  val prior = graft.sources.DeltaLog.replay(spark, stagePath)
                  val w = ordered.write.mode(SaveMode.Overwrite)
                  (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
                    .parquet(stagePath)
                  graft.sources.DeltaLog.reconcile(spark, stagePath,
                    cached.schema, partitionCols, operation = "WRITE",
                    prior = prior, replaceSchema = true)
                  pinRetentionProps(spark, stagePath)
                  cached.count()
                }
              } finally cached.unpersist()
            other match {
              case TransformationEngine.Warning(errs) =>
                StageResult(CompletedWithWarnings(errs), rows)
              case _ => StageResult(Success, rows)
            }
        }
    }
  }
}
