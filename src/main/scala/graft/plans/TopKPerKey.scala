package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator custom Catalyst work (SURVEY.md §2.1 preference
  * (c)): TOP-K PER KEY as a first-class plan node.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY ord)` then `rank <= k` — must SORT every partition's full
  * row set before discarding all but k rows per key. This node keeps
  * a bounded k-row heap per key instead: one pass, O(rows · log k)
  * comparisons, memory O(keys-per-partition · k) — at 100 TB that is
  * the difference between spilling a full sort of the fact table and
  * streaming it once. (A production hardening would fall back to the
  * sort-based plan when keys·k approaches task memory; the exchange
  * on the key is identical either way, so only the per-partition
  * operator differs.)
  *
  * The full extension stack: logical [[TopKPerKey]] → planner
  * [[TopKStrategy]] (session-scoped via
  * `spark.experimental.extraStrategies` or injected by
  * [[graft.functions.GraftExtensions]]) → physical
  * [[TopKPerKeyExec]], constructed through the
  * [[org.apache.spark.sql.graftbridge.Bridge]] seam.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node; a no-op for every other operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One pass, one bounded heap per key. Requires clustering on the
  * keys — EnsureRequirements inserts the single hash exchange, the
  * same shuffle the window formulation pays, after which rows stream
  * through without sorting. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys = BindReferences.bindReferences(keys, childOutput)
    val boundOrder = BindReferences.bindReferences(order, childOutput)
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(boundKeys)
      // "first" under the requested SortOrder = rank 1.
      val ordering = GenerateOrdering.generate(boundOrder)
      // max-heap of each key's current k best: head = the worst kept
      // row, evicted when a better one arrives.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
      }
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](k + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      // emit each key's survivors best-first (deterministic within key)
      heaps.values.iterator.asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, new java.util.Comparator[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
        })
        arr.iterator
      }
    }
  }
}

/** Column-name API over the plan node. */
object TopK {

  /** Register the strategy on `spark` (idempotent, session-scoped). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
  }

  /** Keep each key's top `k` rows under `(orderCol desc, tieBreakers
    * asc)` — the `row_number <= k` result without the sort. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, tieBreakers: Seq[String] = Seq.empty): DataFrame = {
    install(df.sparkSession)
    val order =
      SortOrder(UnresolvedAttribute.quoted(orderCol), Descending, NullsLast, Seq.empty) +:
        tieBreakers.map(c =>
          SortOrder(UnresolvedAttribute.quoted(c), Ascending, NullsFirst, Seq.empty))
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keyCols.map(UnresolvedAttribute.quoted), order, k, Bridge.plan(df)))
  }
}
