package graft.catalog

import org.apache.spark.sql.SparkSession

/** Thin catalog registration replacing the reference's Glue-crawler job
  * (artifacts/aws-glue/code/stage/crawler_stage.py:159-391 — database
  * creation, table registration, tag propagation): stage tables become
  * queryable via `spark.sql` by registering external tables in the
  * session metastore.
  *
  * The reference's Lake Formation LF-tags and column grants
  * (crawler_stage.py:361-391) are cloud-IAM enforcement, out of scope for
  * an engine — but the tag METADATA is not: it rides the catalog as
  * database/table properties (`Level=Stage` etc.), where governance
  * tooling on any metastore can read it back. Keys/values are passed
  * through verbatim.
  */
object CatalogSync {

  /** SQL-string-literal escape for property keys/values — backslash FIRST
    * (escaping quotes introduces backslashes; the reverse order would
    * double-escape), then single quotes. Without the backslash escape a
    * value like `C:\data` is silently unescaped by the parser and one
    * ending in `\` swallows the closing quote.
    */
  private def q(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Keys Spark's parser rejects in TBLPROPERTIES/DBPROPERTIES because the
    * catalog manages them itself (UNSUPPORTED_FEATURE.SET_TABLE_PROPERTY).
    * Tag metadata must use its own namespace — fail loudly up front rather
    * than from deep inside the parser.
    */
  private val ReservedKeys =
    Set("owner", "location", "provider", "external", "comment")

  private def propsSql(properties: Map[String, String]): String = {
    val reserved = properties.keySet.map(_.toLowerCase).intersect(ReservedKeys)
    require(reserved.isEmpty,
      s"catalog-reserved property keys: ${reserved.mkString(", ")} — " +
        "namespace tag metadata (e.g. 'tags.owner')")
    properties.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'${q(k)}'='${q(v)}'" }.mkString(", ")
  }

  def ensureDatabase(spark: SparkSession, db: String,
      properties: Map[String, String] = Map.empty): Unit = {
    val withProps =
      if (properties.isEmpty) ""
      else s" WITH DBPROPERTIES (${propsSql(properties)})"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`$withProps")
    // IF NOT EXISTS skips the props on a pre-existing database — assert
    // them explicitly so re-registration converges on the wanted state
    if (properties.nonEmpty)
      spark.sql(s"ALTER DATABASE `$db` SET DBPROPERTIES (${propsSql(properties)})")
    ()
  }

  /** Register (or refresh) an external parquet-backed stage table,
    * optionally carrying catalog properties (the LF-tag metadata
    * passthrough — e.g. `Map("Level" -> "Stage")`).
    */
  def registerTable(spark: SparkSession, db: String, table: String, path: String,
      properties: Map[String, String] = Map.empty): Unit = {
    ensureDatabase(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val withProps =
      if (properties.isEmpty) ""
      else s" TBLPROPERTIES (${propsSql(properties)})"
    spark.sql(
      s"CREATE TABLE `$db`.`$table` USING parquet LOCATION '$path'$withProps")
    ()
  }

  /** Register a DELTA-logged stage table, surfacing the log's
    * `metaData.configuration` (per-table retention et al. — the
    * properties the reference bakes in at write time,
    * light_transform.py:1373-1374) as catalog TBLPROPERTIES alongside
    * `extraProperties`, so governance tooling reads the real retention
    * contract off any metastore.
    *
    * Refuses a table currently holding RETAINED on-disk tombstones: the
    * registration points plain-parquet readers at the directory, and a
    * retained table's directory contains replaced files — SQL readers
    * would double-count rows. VACUUM first (or query through
    * [[graft.sources.DeltaLog.read]] / the symlink manifest, which
    * serve the committed file list).
    */
  def registerDeltaTable(spark: SparkSession, db: String, table: String,
      path: String, extraProperties: Map[String, String] = Map.empty): Unit = {
    val st = graft.sources.DeltaLog.replay(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _delta_log at $path — use registerTable for plain parquet"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = st.tombstones.keys
      .exists(rel => fs.exists(new org.apache.hadoop.fs.Path(s"$path/$rel")))
    require(!retained,
      s"$path holds retained tombstoned files — a plain-parquet catalog " +
        "registration would double-count rows; VACUUM first or serve " +
        "readers through the delta log / symlink manifest")
    registerTable(spark, db, table, path, st.configuration ++ extraProperties)
  }

  /** A delta table's `metaData.configuration` — the properties
    * [[registerDeltaTable]] surfaces; empty map for tables without any.
    */
  def deltaTableProperties(spark: SparkSession, path: String): Map[String, String] =
    graft.sources.DeltaLog.replay(spark, path)
      .map(_.configuration).getOrElse(Map.empty)

  /** Merge properties into an already-registered table (the re-tag pass —
    * existing keys are overwritten, others untouched).
    */
  def setTableProperties(spark: SparkSession, db: String, table: String,
      properties: Map[String, String]): Unit = {
    if (properties.nonEmpty)
      spark.sql(
        s"ALTER TABLE `$db`.`$table` SET TBLPROPERTIES (${propsSql(properties)})")
    ()
  }

  /** Read back a table's catalog properties. Spark surfaces internal
    * bookkeeping keys alongside user ones (`transient_lastDdlTime`,
    * `option.*` …); callers filter if they care.
    */
  def tableProperties(spark: SparkSession, db: String, table: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES `$db`.`$table`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  /** Read back a database's properties — straight from the catalog
    * metadata (parsing DESCRIBE DATABASE's rendered `((k,v), …)` string
    * breaks on values containing parentheses or commas).
    */
  def databaseProperties(spark: SparkSession, db: String): Map[String, String] =
    spark.sessionState.catalog.getDatabaseMetadata(db).properties

  def listTables(spark: SparkSession, db: String): Seq[String] =
    spark.catalog.listTables(db).collect()
      .filter(!_.isTemporary) // session temp views are not catalog tables
      .map(_.name).toSeq
}
