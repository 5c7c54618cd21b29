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
