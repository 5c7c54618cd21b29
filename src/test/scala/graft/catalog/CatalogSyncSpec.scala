package graft.catalog

import graft.SparkTestBase

import java.nio.file.Files

/** Catalog registration with the LF-tag-metadata passthrough: properties
  * round-trip through the metastore for tables and databases, re-tagging
  * merges, and re-registration converges.
  */
class CatalogSyncSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft-catalog").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(dir)
    dir
  }

  test("registerDeltaTable surfaces the log's configuration as " +
      "TBLPROPERTIES; retained tombstones refuse") {
    val dir = Files.createTempDirectory("graft-catalog-delta").toString + "/t"
    graft.operators.MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    graft.sources.DeltaLog.setTableProperties(spark, dir, Map(
      graft.sources.DeltaLog.TombstoneRetentionProp -> "interval 7 days",
      graft.sources.DeltaLog.LogRetentionProp -> "interval 30 days"))
    CatalogSync.registerDeltaTable(spark, "graft_cat_delta", "t_props", dir,
      Map("tags.level" -> "Stage"))
    val props = CatalogSync.tableProperties(spark, "graft_cat_delta", "t_props")
    assert(props.get(graft.sources.DeltaLog.TombstoneRetentionProp)
      .contains("interval 7 days"))
    assert(props.get(graft.sources.DeltaLog.LogRetentionProp)
      .contains("interval 30 days"))
    assert(props.get("tags.level").contains("Stage"))
    assert(CatalogSync.deltaTableProperties(spark, dir)
      .contains(graft.sources.DeltaLog.TombstoneRetentionProp))
    // a RETAINED table (on-disk tombstones) refuses: plain-parquet
    // registration would double-count rows
    graft.operators.MergeUpsert.upsertParquet(spark,
      Seq((1, "A")).toDF("id", "v"), dir, Seq("id"), retain = true)
    val e = intercept[IllegalArgumentException] {
      CatalogSync.registerDeltaTable(spark, "graft_cat_delta", "t2", dir)
    }
    assert(e.getMessage.contains("tombstoned"))
    // after VACUUM the registration proceeds
    graft.operators.Maintenance.vacuum(spark, dir, retentionHours = 0.0)
    CatalogSync.registerDeltaTable(spark, "graft_cat_delta", "t2", dir)
    assert(spark.sql("SELECT count(*) FROM graft_cat_delta.t2")
      .head().getLong(0) === 1L)
  }

  test("table properties round-trip through the metastore") {
    val path = freshTable()
    CatalogSync.registerTable(spark, "cat_db", "tagged", path,
      Map("Level" -> "Stage", "tags.owner" -> "data-platform"))
    val props = CatalogSync.tableProperties(spark, "cat_db", "tagged")
    assert(props.get("Level") === Some("Stage"))
    assert(props.get("tags.owner") === Some("data-platform"))
    // the table is a working external table, not just metadata
    assert(spark.sql("SELECT count(*) FROM cat_db.tagged").head().getLong(0) === 2)
  }

  test("setTableProperties merges: overwrites the key, keeps the rest") {
    val path = freshTable()
    CatalogSync.registerTable(spark, "cat_db", "retag", path,
      Map("Level" -> "Stage", "tags.owner" -> "data-platform"))
    CatalogSync.setTableProperties(spark, "cat_db", "retag",
      Map("Level" -> "Analytics", "pii" -> "false"))
    val props = CatalogSync.tableProperties(spark, "cat_db", "retag")
    assert(props.get("Level") === Some("Analytics"), "overwritten")
    assert(props.get("tags.owner") === Some("data-platform"), "untouched")
    assert(props.get("pii") === Some("false"), "added")
  }

  test("re-registration replaces the table and its properties") {
    val path = freshTable()
    CatalogSync.registerTable(spark, "cat_db", "rereg", path,
      Map("Level" -> "Stage"))
    CatalogSync.registerTable(spark, "cat_db", "rereg", path,
      Map("tags.owner" -> "etl"))
    val props = CatalogSync.tableProperties(spark, "cat_db", "rereg")
    assert(props.get("tags.owner") === Some("etl"))
    assert(!props.contains("Level"), "drop-and-create does not carry old tags")
  }

  test("database properties: set on create, asserted on re-ensure") {
    CatalogSync.ensureDatabase(spark, "cat_db_tagged", Map("Level" -> "Stage"))
    assert(CatalogSync.databaseProperties(spark, "cat_db_tagged")
      .get("Level") === Some("Stage"))
    // pre-existing database still converges on the wanted properties
    CatalogSync.ensureDatabase(spark, "cat_db_tagged",
      Map("Level" -> "Analytics", "region" -> "eu"))
    val props = CatalogSync.databaseProperties(spark, "cat_db_tagged")
    assert(props.get("Level") === Some("Analytics"))
    assert(props.get("region") === Some("eu"))
  }

  test("catalog-reserved keys are rejected up front with a clear message") {
    val path = freshTable()
    val ex = intercept[IllegalArgumentException] {
      CatalogSync.registerTable(spark, "cat_db", "reserved", path,
        Map("owner" -> "x"))
    }
    assert(ex.getMessage.contains("owner"))
    assert(ex.getMessage.contains("namespace"))
  }

  test("quoted, backslashed, and parenthesized values survive round trips") {
    val path = freshTable()
    CatalogSync.registerTable(spark, "cat_db", "quoted", path,
      Map("note" -> "owner's team, 'quoted'",
        "win_path" -> "C:\\data\\corpus\\",
        "desc" -> "Stage (EU region), tier-1"))
    val props = CatalogSync.tableProperties(spark, "cat_db", "quoted")
    assert(props.get("note") === Some("owner's team, 'quoted'"))
    assert(props.get("win_path") === Some("C:\\data\\corpus\\"))
    assert(props.get("desc") === Some("Stage (EU region), tier-1"))
    // database properties too (read via catalog metadata, not DESCRIBE
    // string parsing, so parens/commas in values are safe)
    CatalogSync.ensureDatabase(spark, "cat_db_parens",
      Map("Level" -> "Stage (EU region)"))
    assert(CatalogSync.databaseProperties(spark, "cat_db_parens")
      .get("Level") === Some("Stage (EU region)"))
  }
}
