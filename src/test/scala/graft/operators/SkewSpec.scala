package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of fact rows share key 1 — the classic hot-key shape
    val fact = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50, i.toLong, i * 1.0))
      .toDF("k", "row_id", "v")
    val dim = (0 until 50).map(i => (i, s"dim_$i")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFrom = Seq("row_id"))
      .select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedSumCount equals plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum($"v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltFrom = Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted plan spreads a hot key over multiple partitions") {
    val fact = (1 to 1000).map(i => (1, i.toLong)).toDF("k", "row_id")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64($"row_id"), lit(8)))
    val perSalt = salted.groupBy("__salt").count().collect()
    assert(perSalt.length === 8) // the single key now occupies 8 buckets
  }
}
