package graft.operators

import graft.SparkTestBase
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** Row-level DELETE (`MergeUpsert.deleteWhere`): SQL predicate
  * semantics, partition-pruned rewrites, empty-partition swaps, the
  * crash-safe staging protocol, retention/CDF interplay.
  */
class DeleteSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-delete").toString + "/t"

  test("unpartitioned delete: matching rows go, NULL-predicate rows stay") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b"), (3, null.asInstanceOf[String]), (4, "d"))
        .toDF("id", "v"),
      dir, Seq("id"))
    // v = 'b' deletes; v IS NULL makes the predicate NULL -> row kept
    val n = MergeUpsert.deleteWhere(spark, dir, col("v") === "b")
    assert(n === 1L)
    assert(DeltaLog.read(spark, dir).select("id").collect()
      .map(_.getInt(0)).toSet === Set(1, 3, 4))
    // no matches: 0, and the log version does not advance
    val v = DeltaLog.replay(spark, dir).get.version
    assert(MergeUpsert.deleteWhere(spark, dir, col("v") === "zzz") === 0L)
    assert(DeltaLog.replay(spark, dir).get.version === v)
  }

  test("partitioned delete rewrites only matching partitions; a fully-" +
      "matched partition empties") {
    val dir = tmp()
    val df = (1 to 12).map(i => (i, s"v$i", i % 3)).toDF("id", "v", "p")
    MergeUpsert.upsertParquet(spark, df, dir, Seq("id"), Seq("p"))
    val untouchedBefore = DeltaLog.replay(spark, dir).get.files.keys
      .filter(_.startsWith("p=0")).toSet
    // delete all of p=1 and half of p=2; p=0 untouched
    val n = MergeUpsert.deleteWhere(spark, dir,
      col("p") === 1 || (col("p") === 2 && col("id") <= 5),
      partitionCols = Seq("p"))
    assert(n === 4L + 2L) // p=1: ids 1,4,7,10; p=2 & id<=5: ids 2,5
    val left = DeltaLog.read(spark, dir).select("id").collect()
      .map(_.getInt(0)).toSet
    assert(left === (1 to 12).filterNot(i =>
      i % 3 == 1 || (i % 3 == 2 && i <= 5)).toSet)
    // p=1 is EMPTY, not lingering
    assert(DeltaLog.read(spark, dir).filter(col("p") === 1).count() === 0L)
    // p=0's files never rewrote
    val untouchedAfter = DeltaLog.replay(spark, dir).get.files.keys
      .filter(_.startsWith("p=0")).toSet
    assert(untouchedAfter === untouchedBefore)
  }

  test("retention-mode delete: pre-delete version travelable, CDF shows " +
      "the deleted rows") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), dir, Seq("id"),
      retain = true)
    val v0 = DeltaLog.replay(spark, dir).get.version
    val n = MergeUpsert.deleteWhere(spark, dir, col("id") >= 2)
    assert(n === 2L)
    val v1 = DeltaLog.replay(spark, dir).get.version
    assert(DeltaLog.read(spark, dir).count() === 1L)
    // time travel serves the pre-delete data (retained tombstones)
    assert(DeltaLog.read(spark, dir, v0).count() === 3L)
    // CDF: exactly the two deleted rows, no inserts ((1,a) carries over
    // unchanged and cancels under exceptAll)
    val ch = DeltaLog.changes(spark, dir, v0, v1)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(ch === Set(("delete", 2, "b"), ("delete", 3, "c")))
  }

  test("updateWhere: assignments apply where TRUE, read the pre-update " +
      "row, cast to the column type; partition columns refuse") {
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
        .toDF("id", "v", "x"),
      dir, Seq("id"))
    // swap semantics: every assignment reads the PRE-update row
    val n = MergeUpsert.updateWhere(spark, dir, col("id") >= 2,
      Map("v" -> concat(col("v"), lit("!")), "x" -> (col("x") * 2)))
    assert(n === 2L)
    val rows = DeltaLog.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1, "a", 10.0), (2, "b!", 40.0), (3, "c!", 60.0)))
    // value casts to the EXISTING column type (no schema evolution)
    MergeUpsert.updateWhere(spark, dir, col("id") === 1,
      Map("x" -> lit("55"))) // string literal -> double column
    assert(DeltaLog.read(spark, dir).filter(col("id") === 1)
      .head().getDouble(2) === 55.0)
    // unknown and partition columns refuse loudly
    intercept[IllegalArgumentException] {
      MergeUpsert.updateWhere(spark, dir, lit(true), Map("nope" -> lit(1)))
    }
    val pdir = tmp()
    MergeUpsert.upsertParquet(spark,
      (1 to 6).map(i => (i, s"v$i", i % 2)).toDF("id", "v", "p"),
      pdir, Seq("id"), Seq("p"))
    intercept[IllegalArgumentException] {
      MergeUpsert.updateWhere(spark, pdir, lit(true),
        Map("p" -> lit(9)), partitionCols = Seq("p"))
    }
    // partitioned update rewrites only matching partitions
    val beforeP0 = DeltaLog.replay(spark, pdir).get.files.keys
      .filter(_.startsWith("p=0")).toSet
    val m = MergeUpsert.updateWhere(spark, pdir,
      col("p") === 1 && col("id") <= 3,
      Map("v" -> lit("upd")), partitionCols = Seq("p"))
    assert(m === 2L) // ids 1, 3
    assert(DeltaLog.read(spark, pdir).filter(col("v") === "upd")
      .select("id").collect().map(_.getInt(0)).toSet === Set(1, 3))
    assert(DeltaLog.replay(spark, pdir).get.files.keys
      .filter(_.startsWith("p=0")).toSet === beforeP0,
      "untouched partition's files never rewrote")
  }

  test("delete on a missing table is 0; delete everything leaves an " +
      "empty, readable table") {
    assert(MergeUpsert.deleteWhere(spark, tmp(), lit(true)) === 0L)
    val dir = tmp()
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    assert(MergeUpsert.deleteWhere(spark, dir, lit(true)) === 1L)
    assert(DeltaLog.read(spark, dir).count() === 0L)
    // and the table keeps working afterwards
    MergeUpsert.upsertParquet(spark,
      Seq((9, "z")).toDF("id", "v"), dir, Seq("id"))
    assert(DeltaLog.read(spark, dir).collect().map(_.getInt(0)).toSeq
      === Seq(9))
  }
}
