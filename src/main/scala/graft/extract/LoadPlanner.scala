package graft.extract

import graft.config.{EndpointConfig, TableConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.time.ZonedDateTime

/** Load-strategy planner — the reference's "query planner"
  * (SURVEY §2.8, L1–L7; strategy classes under
  * utils/extract_data_v2/strategies/implementations/ and the Glue path at
  * extract_data_spark.py:653-779).
  *
  * Strategy = f(LOAD_TYPE, SOURCE_TABLE_TYPE, PARTITION_COLUMN, LoadMode).
  * The output is a declarative [[ExtractPlan]]; execution maps it onto
  * Spark's partitioned JDBC reads — the manual OFFSET/FETCH pagination of
  * the reference is O(n²) on the source and is deliberately replaced by
  * `spark.read.jdbc(partitionColumn, lowerBound, upperBound, numPartitions)`
  * (SURVEY §4).
  */
object LoadPlanner {

  /** LoadMode modifiers (utils/extract_data_v2/models/load_mode.py:4-27). */
  sealed trait LoadMode
  object LoadMode {
    case object Initial extends LoadMode   // full read + save watermark
    case object Normal extends LoadMode    // watermark-incremental
    case object Reset extends LoadMode     // delete watermark, then full
    case object Reprocess extends LoadMode // re-extract a window, idempotent merge
  }

  sealed trait ExtractPlan { def queries: Seq[String] }

  /** L1: one pushdown query. */
  final case class SingleQuery(query: String) extends ExtractPlan {
    def queries: Seq[String] = Seq(query)
  }

  /** L2: range-partitioned parallel read over a numeric partition column.
    * Bounds come from the A1 min/max planning aggregate.
    */
  final case class PartitionedRead(
      baseQuery: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int
  ) extends ExtractPlan {
    /** The strided queries (for engines/tests that want SQL text; keeps
      * the reference's last-bucket `+1` closure semantics,
      * extract_data_spark.py:584-587). NOT row-identical to [[execute]]
      * at the extremes: Spark's JDBC first/last partition predicates are
      * open-ended catch-alls (first also collects NULLs), so rows below
      * `lowerBound` — possible because the min/max aggregate's `<> 0`
      * guard excludes zeros — or NULL partition values appear in
      * execute()'s result but not in these slices. Production runs
      * execute(); treat this text arm as the plan's shape, not its
      * exact row set.
      */
    def queries: Seq[String] = {
      val span = math.max(1L, (upperBound - lowerBound) / numPartitions)
      (0 until numPartitions).map { i =>
        val lo = lowerBound + i * span
        val hi = if (i == numPartitions - 1) upperBound + 1 else lo + span
        val range = s"$partitionColumn >= $lo AND $partitionColumn < $hi"
        // the base query may already carry a WHERE (FILTER_EXP): a second
        // WHERE keyword is invalid SQL on every RDBMS — AND the range in
        // (filter conditions render parenthesized, so precedence is safe)
        if (baseQuery.contains(" WHERE ")) s"$baseQuery AND $range"
        else s"$baseQuery WHERE $range"
      }
    }
  }

  /** L4/L5: explicit date-range slices executed in parallel. */
  final case class DateRangeQueries(slices: Seq[String]) extends ExtractPlan {
    def queries: Seq[String] = slices
  }

  val DefaultNumPartitions = 10 // extract_data_spark.py:713
  val MaxPartitions = 30        // query_generator.py:132

  /** Choose the extraction plan for a table.
    *
    * @param minMax    result of the A1 planning aggregate, when the table is
    *                  partitionable (SOURCE_TABLE_TYPE='t' + PARTITION_COLUMN)
    * @param watermark last confirmed watermark value, if any (P6)
    */
  def plan(
      table: TableConfig,
      minMax: Option[(Long, Long)] = None,
      watermark: Option[String] = None,
      mode: LoadMode = LoadMode.Normal,
      forceFullLoad: Boolean = false,
      now: ZonedDateTime = ZonedDateTime.now(DateWindows.Lima),
      bdType: String = "mssql",
      endpointName: String = "",
      /** Lazy A1 min/max fetch, consulted only when a partitioned full
        * read is planned and `minMax` was not supplied — see [[fullPlan]].
        */
      bounds: Option[() => Option[(Long, Long)]] = None,
      /** Parallel-cursor count for a partitioned full read. The Glue ETL
        * path runs 10 (extract_data_spark.py:713, the default here); the
        * layer's query generator fans out to [[MaxPartitions]]=30
        * (query_generator.py:132) — callers with source headroom pass up
        * to that ceiling.
        */
      numPartitions: Int = DefaultNumPartitions
  ): ExtractPlan = {
    require(numPartitions >= 1 && numPartitions <= MaxPartitions,
      s"numPartitions $numPartitions outside [1, $MaxPartitions] " +
        "(query_generator.py:132 caps source cursors at 30)")
    val qb = new QueryBuilder(table)
    // blank LOAD_TYPE inference needs the endpoint: a Salesforce
    // transactional table becomes days_off/NUM_DAYS=10. FORCE_FULL then
    // demotes ONLY an (effective) incremental load
    // (extract_data_spark.py:202-205) — days_off and between-date
    // survive it. (The v2 factory overrides unconditionally,
    // strategy_factory.py:65; that path is modeled by LoadMode.Reset.)
    val inferred = table.withInferredLoadType(endpointName)
    val lt0 = inferred.effectiveLoadType
    val loadType = if (forceFullLoad && lt0 == "incremental") "full" else lt0
    val partitionable =
      table.sourceTableType.equalsIgnoreCase("t") && table.partitionColumn.trim.nonEmpty

    loadType match {
      case "incremental" =>
        mode match {
          case LoadMode.Reset | LoadMode.Initial =>
            // INITIAL and RESET are FULL loads that then save a fresh
            // watermark (incremental.py:25-38 "Carga COMPLETA sin
            // filtros", load_mode.py) — the runner records
            // max(partitionColumn) of whatever was extracted, so a
            // windowed plan here would permanently lose every row older
            // than the delay window on the very first load
            fullPlan(qb, table, minMax, partitionable, bounds, numPartitions)
          case _ => watermark match {
            case Some(value) =>
              // v2-style true watermark increment (incremental.py:257-344).
              // FILTER_DATA_TYPE describes FILTER_COLUMN — it types this
              // predicate only when the watermark column IS the filter
              // column; otherwise (numeric seq_id + datetime filter col)
              // trusting it would CAST the wrong type at the source
              val declared = table.filterDataType.trim
              val sameColumn = table.filterColumn.trim
                .equalsIgnoreCase(table.partitionColumn.trim)
              val colType =
                if (declared.nonEmpty && sameColumn) declared
                // no (applicable) declared type: detect from the stored
                // value like the reference (_detect_watermark_data_type,
                // incremental.py:368-380) — integer-looking compares raw
                // (negatives included: `-5` cannot be a datetime); a
                // blind datetime CAST over a numeric sequence column
                // would fail every incremental run at the source
                else if (value.trim.matches("-?\\d+")) "bigint"
                else "datetime"
              SingleQuery(qb.standardQuery(Some(
                qb.watermarkPredicate(table.partitionColumn, value, colType, bdType))))
            case None if table.filterColumn.trim.nonEmpty =>
              // Glue-style rolling month window (query_generator.py:196-211)
              val (lo, hi) = DateWindows.dateLimits(
                table.delayIncrementalIni, table.delayIncrementalEnd,
                table.filterDataType, now)
              DateRangeQueries(Seq(
                qb.dateRangeQuery(lo, hi, table.filterColumn,
                  Option(table.filterDataType).filter(_.nonEmpty))))
            case None =>
              fullPlan(qb, table, minMax, partitionable, bounds, numPartitions)
          }
        }

      case "days_off" =>
        // Salesforce trailing-window load: re-extract the last NUM_DAYS
        // days every run (idempotent against the stage overwrite — a
        // days_off table never merges, light_transform.py:1554 matches
        // only incremental/between-date). Never partitioned: the
        // reference's partitioned_full arm requires LOAD_TYPE='full'
        // (extract_data.py:1127), so days_off plans one cursor.
        val days = inferred.numDays.trim.replace("'", "")
          .toIntOption.getOrElse(10)
        if (inferred.filterColumn.trim.nonEmpty) {
          val (lo, hi) = DateWindows.trailingDays(
            days, inferred.filterDataType, now)
          DateRangeQueries(Seq(
            qb.dateRangeQuery(lo, hi, inferred.filterColumn,
              Option(inferred.filterDataType).filter(_.nonEmpty))))
        } else SingleQuery(qb.standardQuery())

      case "between-date" | "time_range" =>
        val (lo, hi) = DateWindows.dateLimits(
          table.delayIncrementalIni, table.delayIncrementalEnd,
          table.filterDataType, now)
        DateRangeQueries(Seq(
          qb.dateRangeQuery(lo, hi,
            if (table.filterColumn.trim.nonEmpty) table.filterColumn
            else table.partitionColumn,
            Option(table.filterDataType).filter(_.nonEmpty))))

      case _ => fullPlan(qb, table, minMax, partitionable, bounds, numPartitions)
    }
  }

  private def fullPlan(
      qb: QueryBuilder,
      table: TableConfig,
      minMax: Option[(Long, Long)],
      partitionable: Boolean,
      bounds: Option[() => Option[(Long, Long)]] = None,
      numPartitions: Int = DefaultNumPartitions
  ): ExtractPlan = {
    // lazily fetch the A1 min/max aggregate exactly when a partitioned
    // full read is actually on the table — the production runner passes
    // the thunk so big full loads get their parallel cursors without
    // paying the scalar probe on incremental/window plans
    val mm = minMax.orElse(
      if (partitionable) bounds.flatMap(_.apply()) else None)
    (partitionable, mm) match {
      case (true, Some((lo, hi))) if hi > lo =>
        // clamp in Long FIRST: (hi - lo).toInt overflows for ranges past
        // 2^31 and would silently collapse the widest tables — exactly
        // the ones needing parallelism — to one cursor
        val n = math.min(numPartitions.toLong,
          math.max(1L, hi - lo)).toInt
        PartitionedRead(qb.standardQuery(), table.partitionColumn, lo, hi, n)
      case _ =>
        SingleQuery(qb.standardQuery())
    }
  }

  /** S3/A1: run the min/max planning aggregate against the source and
    * return the partition bounds (executed source-side as one scalar query,
    * like the reference's execute_simple_query — extract_data_spark.py:443-451).
    */
  def fetchMinMax(
      spark: SparkSession,
      table: TableConfig,
      ep: EndpointConfig,
      password: String
  ): Option[(Long, Long)] = {
    if (table.partitionColumn.trim.isEmpty) return None
    // the reference catches ANY min/max failure and degrades to the
    // standard single-cursor load with a warning
    // (extract_data_spark.py:735-736 "No se pudo determinar min/max.
    // Usando estrategia estándar.") — a datetime PARTITION_COLUMN makes
    // the `<> 0` aggregate fail (or return unparseable timestamps) on
    // every dialect, and a hard throw here would FAIL the table's full
    // load forever instead of running it serially
    try {
      val qb = new QueryBuilder(table)
      val row = execute(spark,
        SingleQuery(qb.minMaxQuery(table.partitionColumn)), ep, password)
        .collect().head
      if (row.isNullAt(0) || row.isNullAt(1)) None
      else Some((toLong(row.get(0)), toLong(row.get(1))))
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"min/max planning aggregate failed for " +
            s"${table.sourceSchema}.${table.sourceTable} " +
            s"(${e.getMessage}); degrading to a single-cursor load")
        None
    }
  }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other     => other.toString.trim.toLong
  }

  /** Execute a plan as Spark JDBC reads. Each partition of a
    * [[PartitionedRead]] becomes one concurrent JDBC cursor — Spark's
    * built-in equivalent of the reference's strided thread-pool fan-out (X1).
    */
  def execute(
      spark: SparkSession,
      plan: ExtractPlan,
      ep: EndpointConfig,
      password: String,
      fetchSize: Int = 10000
  ): DataFrame = {
    val target = Dialects.jdbcTarget(ep)
    val base = spark.read.format("jdbc")
      .option("url", target.url)
      .option("driver", target.driver)
      .option("user", ep.srcDbUsername)
      .option("password", password)
      .option("fetchsize", fetchSize.toString)
    plan match {
      case SingleQuery(q) => base.option("query", q).load()
      case p: PartitionedRead =>
        base
          // no AS keyword: Oracle rejects it in table aliases (ORA-00933);
          // the bare alias is valid on every supported dialect
          .option("dbtable", s"(${p.baseQuery}) graft_sub")
          .option("partitionColumn", p.partitionColumn)
          .option("lowerBound", p.lowerBound.toString)
          .option("upperBound", p.upperBound.toString)
          .option("numPartitions", p.numPartitions.toString)
          .load()
      case DateRangeQueries(slices) =>
        slices.map(q => base.option("query", q).load()).reduce(_ unionByName _)
    }
  }
}
