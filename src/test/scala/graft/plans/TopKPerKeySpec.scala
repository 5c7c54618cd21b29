package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  test("agrees with the window row_number composition") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", i.toLong, (i * 37 % 1000) * 1.0))
      .toDF("g", "id", "v")
    val viaTopK = TopK.perKey(df, Seq("g"), Seq(col("v").desc, col("id").asc), 5)
      .select("g", "id").orderBy("g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "id").orderBy("g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaTopK === viaWindow)
  }

  test("groups smaller than k emit all rows; ascending order works") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 9L)).toDF("g", "v")
    val got = TopK.perKey(df, Seq("g"), Seq(col("v").asc), 5)
      .orderBy("g", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 1L), ("a", 3L), ("b", 9L)))
  }

  test("plan uses the custom exec behind one hash exchange — no window, no sort") {
    val df = (1 to 1000).map(i => (i % 13, i.toLong)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(col("v").desc), 3)
    out.collect()
    // AQE's toString prints the Final AND Initial plans; count only the final
    val full = out.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("TopKPerKey"), s"custom exec missing from:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to a window:\n$plan")
    assert(!plan.contains("Sort "), s"bounded heaps must not sort partitions:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the one required hash exchange:\n$plan")
  }

  test("rows per key and global count are exactly bounded by k") {
    val df = (1 to 10000).map(i => (i % 3, i.toLong)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(col("v").desc), 7)
    val counts = out.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ === 7L))
  }
}
