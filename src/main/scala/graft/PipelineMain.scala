package graft

import graft.config.ConfigLoader
import graft.operators.WatermarkStore
import graft.runner.Runner
import org.apache.spark.sql.SparkSession

/** Config-driven pipeline entrypoint — the `app.py` of this engine
  * (reference: app.py:25-68 reads the endpoint/table/column config CSVs,
  * resolves the tables participating in a PROCESS_ID, and launches the
  * per-table extract→transform machinery; here that is one JVM invocation
  * over one shared SparkSession instead of a Step-Functions fan-out).
  *
  * Usage:
  * {{{
  * runMain graft.PipelineMain \
  *   endpoints.csv tables.csv columns.csv <processId> <rawRoot> <stageRoot> [watermarkDir]
  * }}}
  *
  * CSV formats are the reference's `;`-delimited latin-1 files
  * ([[ConfigLoader]]); the columns file carries TABLE_NAME rows for every
  * table. Every active table runs against EVERY configured endpoint
  * (app.py:164-184 creates one extract+transform job per
  * (table, endpoint) pair — the same source schema ingested from several
  * database instances); with more than one endpoint the stage table name
  * gains the reference's `_<endpoint>` suffix so landings don't collide.
  * `GRAFT_PIPELINE_ENV` filters endpoints by their ENV column
  * (app.py:139 keeps only current-environment credentials rows).
  *
  * The JDBC password comes from `GRAFT_DB_PASSWORD_<ENDPOINT_NAME>`,
  * falling back to `GRAFT_DB_PASSWORD` (never a CLI arg — argv is
  * world-readable on shared hosts; the reference holds one secret per
  * endpoint, hence the per-endpoint variable). Exit code 0 = every
  * active (table, endpoint) landed, 1 = at least one FAILED (the run
  * report persists either way, under `<stageRoot>/__run_report`).
  *
  * Run-level levers (the reference's Glue job arguments):
  *   - `GRAFT_LOAD_MODE` = INITIAL | NORMAL | RESET | REPROCESS
  *     (load_mode.py:4-27). Without it the first-ever run of an
  *     incremental table with FILTER_COLUMN would window-extract and
  *     then watermark past the unextracted history — INITIAL is how a
  *     fresh deployment loads everything once.
  *   - `GRAFT_DATE_PROCESS` = the run date for dated raw paths
  *     (light_transform.py:1633-1704; same multi-format acceptance,
  *     invalid values warn and fall back to the current date).
  */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    if (args.length < 6) {
      System.err.println(
        "usage: PipelineMain <endpoints.csv> <tables.csv> <columns.csv> " +
          "<processId> <rawRoot> <stageRoot> [watermarkDir]")
      sys.exit(2)
    }
    val spark = GraftSession.configure(
      SparkSession.builder().appName("graft-pipeline"),
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toIntOption.getOrElse(32)
    ).getOrCreate()
    val report = run(spark, args(0), args(1), args(2), args(3), args(4), args(5),
      args.lift(6), environment = sys.env.get("GRAFT_PIPELINE_ENV"),
      mode = parseLoadMode(sys.env.get("GRAFT_LOAD_MODE")),
      runDate = sys.env.get("GRAFT_DATE_PROCESS").flatMap(parseDateProcess))
    report.runs.foreach { r =>
      println(s"${r.table}\t${r.status}\trows=${r.rowsWritten}\t" +
        s"${r.durationMs}ms\tattempts=${r.attempts}${r.error.map("\t" + _).getOrElse("")}")
    }
    sys.exit(if (report.failed.nonEmpty) 1 else 0)
  }

  /** The testable core: build specs from the config files and run them. */
  def run(
      spark: SparkSession,
      endpointsCsv: String,
      tablesCsv: String,
      columnsCsv: String,
      processId: String,
      rawRoot: String,
      stageRoot: String,
      watermarkDir: Option[String] = None,
      environment: Option[String] = None,
      mode: graft.extract.LoadPlanner.LoadMode =
        graft.extract.LoadPlanner.LoadMode.Normal,
      /** Run date for the dated raw paths (DATE_PROCESS); None = now. */
      runDate: Option[java.time.ZonedDateTime] = None
  ): Runner.RunReport = {
    val allEndpoints = ConfigLoader.endpointsFrom(ConfigLoader.loadFile(endpointsCsv))
    val endpoints = environment match {
      case Some(env) => allEndpoints.filter(_.environment.equalsIgnoreCase(env))
      case None => allEndpoints
    }
    require(endpoints.nonEmpty,
      s"no endpoints in $endpointsCsv" +
        environment.map(e => s" for environment $e").getOrElse(""))
    // credential resolution through the SecretResolver SPI: the
    // documented GRAFT_DB_PASSWORD_<ENDPOINT> env contract first (bare
    // "GRAFT_" prefix), then the default chain (GRAFT_SECRET_* env refs,
    // mounted GRAFT_SECRETS_DIR files) — JSON credentials documents
    // supported by passwordOf either way
    val secrets = new graft.config.SecretResolver.ChainResolver(Seq(
      new graft.config.SecretResolver.EnvResolver(prefix = "GRAFT_"),
      graft.config.SecretResolver.default()))
    def password(ep: graft.config.EndpointConfig): String =
      graft.config.SecretResolver.endpointPassword(secrets, ep.endpointName)

    val tables = ConfigLoader.tablesFrom(ConfigLoader.loadFile(tablesCsv))
    val colRows = ConfigLoader.loadFile(columnsCsv)
    val active = Runner.tablesForProcess(tables, processId)
    val multi = endpoints.size > 1

    // one spec per (table, endpoint) pair; the `_<endpoint>` stage suffix
    // keeps multi-instance landings (and report rows) distinct, matching
    // the reference's `{table}_{endpoint}` job identity
    val specs = for {
      t <- active
      cols = ConfigLoader.columnsFrom(colRows.filter { r =>
        val tn = r.getOrElse("TABLE_NAME", "")
        tn.equalsIgnoreCase(t.stageTableName) || tn.equalsIgnoreCase(t.sourceTable)
      })
      ep <- endpoints
    } yield {
      val named =
        if (multi) t.copy(stageTableName =
          s"${t.stageTableName}_${ep.endpointName.toLowerCase}")
        else t
      Runner.datedSpec(named, cols, rawRoot, stageRoot,
        Left((ep, password(ep))), mode = mode,
        now = runDate.getOrElse(java.time.ZonedDateTime.now(
          graft.partition.PartitionPathFormatter.Lima)))
    }
    val store = watermarkDir.map(d => new WatermarkStore(spark, d))
    Runner.run(spark, specs,
      watermarkStore = store,
      reportPath = Some(s"$stageRoot/__run_report"))
  }

  private[graft] def parseLoadMode(
      v: Option[String]): graft.extract.LoadPlanner.LoadMode = {
    import graft.extract.LoadPlanner.LoadMode
    v.map(_.trim.toUpperCase) match {
      case None | Some("") | Some("NORMAL") => LoadMode.Normal
      case Some("INITIAL")                  => LoadMode.Initial
      case Some("RESET")                    => LoadMode.Reset
      case Some("REPROCESS")                => LoadMode.Reprocess
      case Some(other) => throw new IllegalArgumentException(
        s"GRAFT_LOAD_MODE '$other' is not INITIAL|NORMAL|RESET|REPROCESS")
    }
  }

  /** DATE_PROCESS acceptance, mirroring the reference's format ladder
    * (light_transform.py:1640-1652) — an unparseable value WARNS and
    * falls back to the current date (`⚠️ DATE_PROCESS inválido`), it
    * never fails the run.
    */
  private[graft] def parseDateProcess(
      s: String): Option[java.time.ZonedDateTime] = {
    val v = s.trim
    val lima = graft.partition.PartitionPathFormatter.Lima
    // the Z suffix means UTC — convert the instant to Lima wall-clock
    // (stamping 02:00Z as 02:00 Lima would shift the run date 5 hours
    // and land the extract on the wrong day's partition)
    val asUtc =
      if (v.endsWith("Z"))
        try Some(java.time.Instant.parse(v).atZone(lima))
        catch { case _: java.time.format.DateTimeParseException => None }
      else None
    val patterns = Seq(
      "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd'T'HH:mm:ss",
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "yyyyMMddHHmmss")
    val asDateTime = asUtc.orElse(patterns.view.flatMap { p =>
      try Some(java.time.LocalDateTime.parse(v,
        java.time.format.DateTimeFormatter.ofPattern(p)).atZone(lima))
      catch { case _: java.time.format.DateTimeParseException => None }
    }.headOption)
    val parsed = asDateTime.orElse {
      Seq("yyyy-MM-dd", "yyyyMMdd").view.flatMap { p =>
        try Some(java.time.LocalDate.parse(v,
          java.time.format.DateTimeFormatter.ofPattern(p))
          .atStartOfDay(lima))
        catch { case _: java.time.format.DateTimeParseException => None }
      }.headOption
    }
    if (parsed.isEmpty)
      System.err.println(s"warning: GRAFT_DATE_PROCESS '$v' unparseable " +
        "(expected yyyy-MM-dd[ HH:mm[:ss]] / ISO / compact); using current date")
    parsed
  }
}
