package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Co-bucketed joins and aggregations must plan WITHOUT a shuffle — the
  * storage-side contract that matters at 100 TB.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  // external-table paths under a temp root: re-runs never collide and the
  // repo's working dir stays clean of spark-warehouse leftovers
  private lazy val root = java.nio.file.Files.createTempDirectory("graft-bucket").toString

  private def save(df: org.apache.spark.sql.DataFrame, name: String,
      sort: Seq[String] = Nil): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    Bucketing.saveBucketed(df, name, Seq("k"), numBuckets = if (name == "bk_agg") 4 else 8,
      sortCols = sort, path = Some(s"$root/$name"))
  }

  test("co-bucketed equi-join plans with zero exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    save(left, "bk_left", sort = Seq("k"))
    save(right, "bk_right", sort = Seq("k"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key needs no exchange") {
    val df = (1 to 500).map(i => (i.toLong % 50, i * 1.0)).toDF("k", "v")
    save(df, "bk_agg")
    val agg = spark.table("bk_agg").groupBy("k").agg(sum("v"))
    assert(agg.count() === 50)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n$plan")
  }
}
