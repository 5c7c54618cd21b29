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
      warnings: Seq[String] = Nil,
      /** Extraction attempts actually used (≥ 2 ⇒ transient failures retried). */
      attempts: Int = 1,
      /** PROCESS_TYPE of the reference's monitoring rows
        * (extract_data_spark.py:323,345): 'D' (delta) for an effective
        * incremental load, 'F' (full) for everything else — full,
        * between-date, days_off.
        */
      processType: String = "F"
  )

  final case class RunReport(runs: Seq[TableRun]) {
    def failed: Seq[TableRun] = runs.filter(_.status == "FAILED")
    def succeeded: Seq[TableRun] = runs.filterNot(_.status == "FAILED")
  }

  /** Failure-alerting hook — the pluggable seam for the reference's SNS
    * topic publishes on table failure (light_transform.py:278-339: build
    * message, publish, never let notification failure break the job).
    * Called from the table's own worker thread the moment its outcome is
    * terminal, so alerts fire while the rest of the run is still going —
    * implementations must be thread-safe. A notifier that throws is logged
    * and ignored: monitoring must never take down the pipeline it watches.
    */
  trait RunNotifier {
    def onTableDone(run: TableRun): Unit
  }

  object RunNotifier {
    /** The reference's posture: alert on FAILED only. */
    def onFailure(f: TableRun => Unit): RunNotifier = new RunNotifier {
      override def onTableDone(run: TableRun): Unit =
        if (run.status == "FAILED") f(run)
    }
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

  /** Build a TableSpec with the raw path composed from DATE_PROCESS +
    * PARTITION_FORMAT (light_transform.py:1633-1704): the raw landing is
    * dated — `rawRoot/<table>/<formatted partition for (now − dateProcess
    * days)>` — while the stage table is the merged, undated
    * `stageRoot/<table>`. Pass a frozen `now` for reproducible runs; the
    * default is Lima-anchored like every reference date computation.
    */
  def datedSpec(
      table: TableConfig,
      columns: Seq[ColumnMetadata],
      rawRoot: String,
      stageRoot: String,
      source: Either[(EndpointConfig, String), SparkSession => DataFrame],
      mode: LoadPlanner.LoadMode = LoadPlanner.LoadMode.Normal,
      now: java.time.ZonedDateTime =
        java.time.ZonedDateTime.now(graft.partition.PartitionPathFormatter.Lima)
  ): TableSpec = {
    val fmt = new graft.partition.PartitionPathFormatter(
      table.partitionFormat.getOrElse(graft.partition.PartitionPathFormatter.DefaultFormat))
    val datedPart = fmt.formatPath(now.minusDays(table.dateProcess.toLong))
    TableSpec(table, columns,
      rawPath = s"$rawRoot/${table.stageTableName}/$datedPart",
      stagePath = s"$stageRoot/${table.stageTableName}",
      source = source, mode = mode)
  }

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
      runExtract: Boolean = true,
      retries: Int = 3,
      retryDelayMs: Long = 5000,
      reportPath: Option[String] = None,
      notifier: Option[RunNotifier] = None
  ): RunReport = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxConcurrency))
    def notifySafe(run: TableRun): TableRun = {
      notifier.foreach { n =>
        try n.onTableDone(run)
        catch {
          case NonFatal(e) =>
            System.err.println(
              s"graft.Runner: notifier failed for table ${run.table}: $e")
        }
      }
      run
    }
    val report =
      try {
        val futures = specs.map { spec =>
          pool.submit(new java.util.concurrent.Callable[TableRun] {
            def call(): TableRun =
              notifySafe(
                runOne(spark, spec, watermarkStore, runExtract, retries, retryDelayMs))
          })
        }
        RunReport(futures.map(_.get()))
      } finally {
        pool.shutdown()
        pool.awaitTermination(1, TimeUnit.MINUTES)
        ()
      }
    reportPath.foreach(p => persistReport(spark, p, report))
    report
  }

  /** Persist the run report as appended parquet rows — the durable
    * monitoring record replacing the reference's DynamoDB status items +
    * SNS notifications (light_transform.py:2066-2193): every table outcome
    * (SUCCESS/WARNING/FAILED/EMPTY) is queryable after the process exits,
    * preserving monitoring-over-exit-code semantics.
    */
  def persistReport(spark: SparkSession, path: String, report: RunReport): Unit = {
    import spark.implicits._
    val at = System.currentTimeMillis()
    report.runs
      .map(r => (at, r.table, r.status, r.rowsWritten, r.durationMs,
        r.error.orNull, r.warnings.mkString("; "), r.attempts,
        r.processType))
      .toDF("run_at_ms", "table", "status", "rows_written", "duration_ms",
        "error", "warnings", "attempts", "process_type")
      .coalesce(1)
      .write.mode("append").parquet(path)
  }

  private def runOne(
      spark: SparkSession,
      spec: TableSpec,
      store: Option[WatermarkStore],
      runExtract: Boolean,
      retries: Int,
      retryDelayMs: Long
  ): TableRun = {
    val t0 = System.currentTimeMillis()
    val name = spec.table.stageTableName
    // the reference reads the POST-inference LOAD_TYPE (it mutates
    // table_data before logging, extract_data_spark.py:189-197,323):
    // a blank-LOAD_TYPE Salesforce transactional table is days_off →
    // 'F', not the endpoint-neutral incremental → 'D'
    val endpointName = spec.source match {
      case Left((ep, _)) => ep.endpointName
      case Right(_) => ""
    }
    val pt =
      if (spec.table.effectiveLoadType(endpointName) == "incremental") "D"
      else "F"
    var attempts = 1
    try {
      if (runExtract) {
        def extractOnce(): DataFrame = {
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
              // bounds thunk: a partitioned FULL read fetches its A1
              // min/max aggregate on demand — without it every full load
              // of a partitionable table ran on ONE serial JDBC cursor
              // (the reference runs 10 strided cursors,
              // extract_data_spark.py:653-779)
              val plan = LoadPlanner.plan(spec.table, watermark = watermark,
                mode = spec.mode, bdType = ep.bdType,
                endpointName = ep.endpointName,
                bounds = Some(() =>
                  LoadPlanner.fetchMinMax(spark, spec.table, ep, password)))
              LoadPlanner.execute(spark, plan, ep, password)
          }
          // persisted: the raw write AND the watermark candidate below read
          // this — without it the JDBC extraction would re-execute and rows
          // inserted at the source between the two runs would raise the
          // watermark past data actually landed in raw (silent skip)
          val cached = extracted.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            // raw layer: all-string snappy parquet, full-row distinct (D1)
            RawLayer.writeRawStringified(cached.dropDuplicates(), spec.rawPath)
            cached
          } catch {
            case NonFatal(e) => cached.unpersist(); throw e
          }
        }
        // Retry with full re-execution: each attempt re-plans and re-opens
        // the JDBC read (Spark opens fresh connections per scan), giving the
        // reference's reconnect-and-retry semantics
        // (sql_server_extractor.py:140-193 — 3 attempts, fixed delay).
        // `attempts` tracks the count even when the final attempt fails, so
        // the run report records how hard the table was tried.
        val maxAttempts = math.max(1, retries)
        var cached: DataFrame = null
        while (cached == null) {
          try cached = extractOnce()
          catch {
            case NonFatal(_) if attempts < maxAttempts =>
              attempts += 1
              if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
          }
        }

        // A3: watermark candidate = max(partition column) of this extract —
        // computed from the persisted frame, i.e. exactly what was landed
        try {
          for {
            s <- store
            pc = spec.table.partitionColumn if pc.nonEmpty
            k = s.key(spec.table.processId, name, pc)
          } {
            val m = cached.agg(max(pc).cast("string")).collect().head
            if (!m.isNullAt(0)) {
              // decimal-typed partition columns render values as
              // "12345.5000000000"; the stored watermark must survive the
              // digits-only type detection (LoadPlanner / the reference's
              // incremental.py:368-380 both read a '.' as datetime), so
              // FLOOR any fractional numeric before saving. Floor (not
              // truncate: -5.5 must store -6, not -5) only widens the
              // next `col > watermark` window by the fraction — rows in
              // that sliver re-extract and the MERGE dedups them, never
              // a skip
              val raw = m.getString(0)
              val v =
                if (raw.matches("-?\\d+\\.\\d+"))
                  new java.math.BigDecimal(raw)
                    .setScale(0, java.math.RoundingMode.FLOOR).toPlainString
                else raw
              s.saveProvisional(k, v)
            }
          }
        } finally cached.unpersist()
      }

      // the stage step sees the POST-inference config too: a blank
      // Salesforce transactional table is days_off → stage OVERWRITE
      // (light_transform.py:1554 merges only incremental/between-date;
      // blank LOAD_TYPE never merges there either)
      val result = StageJob.run(spark, spec.table.withInferredLoadType(endpointName),
        spec.columns, spec.rawPath, spec.stagePath)

      // two-phase watermark confirm only after a successful stage write
      result.status match {
        case StageJob.FailedTransform(errors) =>
          TableRun(name, "FAILED", 0, System.currentTimeMillis() - t0,
            error = Some(errors.mkString("; ")), attempts = attempts,
            processType = pt)
        case other =>
          for {
            s <- store
            pc = spec.table.partitionColumn if pc.nonEmpty
          } s.confirm(s.key(spec.table.processId, name, pc))
          other match {
            case StageJob.CompletedWithWarnings(w) =>
              TableRun(name, "WARNING", result.rowsWritten,
                System.currentTimeMillis() - t0, warnings = w,
                attempts = attempts, processType = pt)
            case StageJob.EmptyInput =>
              TableRun(name, "EMPTY", 0, System.currentTimeMillis() - t0,
                attempts = attempts, processType = pt)
            case _ =>
              TableRun(name, "SUCCESS", result.rowsWritten,
                System.currentTimeMillis() - t0, attempts = attempts,
                processType = pt)
          }
      }
    } catch {
      case NonFatal(e) =>
        TableRun(name, "FAILED", 0, System.currentTimeMillis() - t0,
          error = Some(e.toString), attempts = attempts, processType = pt)
    }
  }
}
