package graft.runner

import graft.config.{ColumnMetadata, EndpointConfig, TableConfig}
import graft.extract.LoadPlanner
import graft.operators.WatermarkStore
import graft.sources.RawLayer
import graft.stage.StageJob
import org.apache.spark.sql.functions.max
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.{Executors, TimeUnit}
import scala.util.control.NonFatal

/** Driver-side orchestration replacing the reference's three Step-Functions
  * layers (SURVEY §2.10 X1–X3; instance/group/base stacks and the
  * per-table Map states at group_stack.py:288-560).
  *
  * One SparkSession, bounded table-level parallelism (the SFN Map
  * `max_concurrency` semantics — 15 extract / 60 transform in the
  * reference), per-table failure isolation, and a run report replacing the
  * DynamoDB/SNS monitoring rows (light_transform.py:2066-2193 — every
  * outcome is recorded, nothing throws past the table boundary).
  */
object Runner {

  final case class TableRun(
      table: String,
      status: String, // SUCCESS | WARNING | FAILED | EMPTY
      rowsWritten: Long,
      durationMs: Long,
      error: Option[String] = None,
      warnings: Seq[String] = Nil
  )

  final case class RunReport(runs: Seq[TableRun]) {
    def failed: Seq[TableRun] = runs.filter(_.status == "FAILED")
    def succeeded: Seq[TableRun] = runs.filterNot(_.status == "FAILED")
  }

  final case class TableSpec(
      table: TableConfig,
      columns: Seq[ColumnMetadata],
      rawPath: String,
      stagePath: String,
      /** Extraction input: Left = JDBC endpoint (+password), Right = an
        * already-loaded DataFrame (e.g. for tests / file sources).
        */
      source: Either[(EndpointConfig, String), SparkSession => DataFrame],
      /** L6 load-mode modifier (INITIAL/NORMAL/RESET/REPROCESS). */
      mode: LoadPlanner.LoadMode = LoadPlanner.LoadMode.Normal
  )

  /** PROCESS_ID group resolution (app.py:25-68): a table participates in a
    * group when its (possibly comma-separated) PROCESS_ID contains it.
    */
  def tablesForProcess(tables: Seq[TableConfig], processId: String): Seq[TableConfig] =
    tables.filter(t => t.status.trim.equalsIgnoreCase("a") &&
      t.processIds.contains(processId))

  /** Run the full extract→raw→stage pipeline for a set of tables with
    * bounded parallelism. Spark job scheduling interleaves the concurrent
    * table jobs across executor cores (X1's thread pool, but on one shared
    * session instead of one Glue job per table).
    */
  def run(
      spark: SparkSession,
      specs: Seq[TableSpec],
      maxConcurrency: Int = 15,
      watermarkStore: Option[WatermarkStore] = None,
      runExtract: Boolean = true
  ): RunReport = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxConcurrency))
    try {
      val futures = specs.map { spec =>
        pool.submit(new java.util.concurrent.Callable[TableRun] {
          def call(): TableRun = runOne(spark, spec, watermarkStore, runExtract)
        })
      }
      RunReport(futures.map(_.get()))
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      ()
    }
  }

  private def runOne(
      spark: SparkSession,
      spec: TableSpec,
      store: Option[WatermarkStore],
      runExtract: Boolean
  ): TableRun = {
    val t0 = System.currentTimeMillis()
    val name = spec.table.stageTableName
    try {
      if (runExtract) {
        val extracted: DataFrame = spec.source match {
          case Right(load) => load(spark)
          case Left((ep, password)) =>
            val wmKey = store.map(s =>
              s.key(spec.table.processId, name, spec.table.partitionColumn))
            // RESET drops the stored watermark before planning (L6)
            if (spec.mode == LoadPlanner.LoadMode.Reset)
              for { s <- store; k <- wmKey } s.delete(k)
            val watermark = for {
              s <- store; k <- wmKey; v <- s.get(k)
            } yield v
            val plan = LoadPlanner.plan(spec.table, watermark = watermark,
              mode = spec.mode)
            LoadPlanner.execute(spark, plan, ep, password)
        }
        // raw layer: all-string snappy parquet, full-row distinct (D1)
        RawLayer.writeRawStringified(extracted.dropDuplicates(), spec.rawPath)

        // A3: watermark candidate = max(partition column) of this extract
        for {
          s <- store
          pc = spec.table.partitionColumn if pc.nonEmpty
          k = s.key(spec.table.processId, name, pc)
        } {
          val m = extracted.agg(max(pc).cast("string")).collect().head
          if (!m.isNullAt(0)) { s.saveProvisional(k, m.getString(0)) }
        }
      }

      val result = StageJob.run(spark, spec.table, spec.columns, spec.rawPath, spec.stagePath)

      // two-phase watermark confirm only after a successful stage write
      result.status match {
        case StageJob.FailedTransform(errors) =>
          TableRun(name, "FAILED", 0, System.currentTimeMillis() - t0,
            error = Some(errors.mkString("; ")))
        case other =>
          for {
            s <- store
            pc = spec.table.partitionColumn if pc.nonEmpty
          } s.confirm(s.key(spec.table.processId, name, pc))
          other match {
            case StageJob.CompletedWithWarnings(w) =>
              TableRun(name, "WARNING", result.rowsWritten,
                System.currentTimeMillis() - t0, warnings = w)
            case StageJob.EmptyInput =>
              TableRun(name, "EMPTY", 0, System.currentTimeMillis() - t0)
            case _ =>
              TableRun(name, "SUCCESS", result.rowsWritten,
                System.currentTimeMillis() - t0)
          }
      }
    } catch {
      case NonFatal(e) =>
        TableRun(name, "FAILED", 0, System.currentTimeMillis() - t0,
          error = Some(e.toString))
    }
  }
}
