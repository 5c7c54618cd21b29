package graft.catalog

import org.apache.spark.sql.SparkSession

/** Thin catalog registration replacing the reference's Glue-crawler job
  * (artifacts/aws-glue/code/stage/crawler_stage.py:159-391 — database
  * creation, table registration, tag propagation): stage tables become
  * queryable via `spark.sql` by registering external tables in the
  * session metastore.
  */
object CatalogSync {

  def ensureDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    ()
  }

  /** Register (or refresh) an external parquet-backed stage table. */
  def registerTable(spark: SparkSession, db: String, table: String, path: String): Unit = {
    ensureDatabase(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    spark.sql(
      s"CREATE TABLE `$db`.`$table` USING parquet LOCATION '$path'")
    ()
  }

  def listTables(spark: SparkSession, db: String): Seq[String] =
    spark.catalog.listTables(db).collect()
      .filter(!_.isTemporary) // session temp views are not catalog tables
      .map(_.name).toSeq
}
