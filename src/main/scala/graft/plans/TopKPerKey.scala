package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.{Column, DataFrame}

/** Top-k rows per key as a first-class operator — the full custom-operator
  * tier (SURVEY §"custom operators" (c)): a logical node, a planner
  * strategy, and a physical exec registered on the session, used where the
  * built-in composition is asymptotically wrong.
  *
  * The built-in form (`row_number().over(partitionBy(keys).orderBy(ord))`
  * then `filter(rn <= k)`) SORTS every partition — O(n log n) per
  * partition and the whole input spills through the sorter to keep k rows
  * per key. [[TopKPerKeyExec]] keeps a bounded heap per key instead:
  * O(n log k) compares, memory bounded by keys-per-partition × k rows,
  * nothing else retained. At 100 TB with k = 10 that is the difference
  * between sorting the corpus and streaming over it.
  */
case class TopKPerKey(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec; injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies` (what [[TopK.perKey]] does,
  * idempotently, for live sessions).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-partition bounded heaps keyed by the grouping projection. Requires
  * `ClusteredDistribution(keys)` (EnsureRequirements inserts the one hash
  * exchange; AQE coalesces/skew-splits it like any other), preserves the
  * child's partitioning for downstream reuse, and emits each key's rows in
  * sort order.
  */
case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keyExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ord = new LazilyGeneratedOrdering(orderLocal, childOutput)
      // java.util.PriorityQueue's head is the LEAST under its comparator;
      // with the reversed ordering the head is the WORST kept row — the
      // one a better-ranked newcomer evicts
      val worstFirst = ord.reversed()
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap) // iterator-backed rows must be copied
          ()
        }
        if (heap.size() < kLocal) { heap.add(row.copy()); () }
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
          ()
        }
      }
      val outs = heaps.values()
      import scala.jdk.CollectionConverters._
      outs.iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size()))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing surface. */
object TopK {

  /** Top `k` rows per `keys` group, ranked by `orderBy` (e.g.
    * `Seq(col("value").desc, col("id").asc)` — add a tiebreaker for
    * deterministic results). Plain columns default to ascending.
    */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
    val sortOrders = orderBy.map(c => ColumnBridge.expressionEager(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    DatasetBridge.ofRows(spark,
      TopKPerKey(keys.map(UnresolvedAttribute(_)), sortOrders, k,
        df.queryExecution.logical))
  }
}
