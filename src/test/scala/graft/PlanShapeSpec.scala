package graft

import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape assertions: the 100 TB contract is not just correct results
  * but the *right* physical plan — filters reaching the parquet scan,
  * small dims broadcast, codegen'd projections, no accidental cartesian
  * products.
  */
class PlanShapeSpec extends SparkTestBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // finalize the AQE plan so codegen stages are visible
    df.queryExecution.executedPlan.toString
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02 filter/projection pushed to parquet scan") {
    val plan = executedPlan("q02_filter_project")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("l_quantity"), s"expected pushed filters in:\n$plan")
    // pruned read schema: only the 5 referenced columns, not all 11
    assert(plan.contains("l_extendedprice") && !plan.contains("l_partkey"),
      "projection should prune unreferenced columns")
  }

  test("q03 multi-join broadcasts the small dimensions") {
    val plan = executedPlan("q03_join_agg")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q01 aggregation is whole-stage codegen'd with partial aggregation") {
    val plan = executedPlan("q01_pricing_summary")
    assert(plan.contains("*(")) // whole-stage-codegen stages print as *(n)
    // map-side combine: a partial_ aggregate before the exchange
    assert(plan.contains("partial_"), s"expected partial aggregation in:\n$plan")
  }

  test("q06 keep-latest is a single shuffle window, no extra exchange") {
    val df = SparkEntry.queries("q06_keep_latest")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    // one hash exchange for the window partitioning + one range for orderBy
    assert(exchanges <= 3, s"too many exchanges ($exchanges) in:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }

  test("q33 minhash near-dup join is not a cartesian product") {
    val df = SparkEntry.queries("q33_minhash_neardup")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate join must be an equi-join on band keys")
  }
}
