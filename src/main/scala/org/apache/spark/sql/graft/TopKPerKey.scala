package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension: per-key top-k without sorting whole
  * partitions.
  *
  * Spark's built-in route for "top k rows per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`, whose
  * physical plan SORTS every partition by (key, ord) — O(n log n) over
  * ALL rows, with the full data spilling through the sort. For k ≪ rows
  * per key, a bounded heap per key is O(n log k) with memory O(keys · k).
  * (Spark has TakeOrderedAndProjectExec for GLOBAL top-k, but nothing
  * per-key — this is the canonical missing-operator case for a custom
  * LogicalPlan + Strategy + SparkPlan, wired via SparkSessionExtensions.)
  *
  * Memory bound: the per-partition heap map holds O(distinct keys in the
  * partition × k) UnsafeRows and does NOT spill. That is the right trade
  * while keys-per-partition × k × rowSize ≪ executor memory (the
  * ClusteredDistribution means each key lives in exactly one partition);
  * for key cardinalities approaching row counts, fall back to the window
  * plan (which sort-spills) — at that shape the heap plan's advantage is
  * gone anyway (k ≈ rows per key).
  */
case class TopKPerKeyPlan(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  // k=0 would dereference an empty heap's peek() inside the generated
  // comparator (NPE per task) instead of returning zero rows; fail at
  // plan construction with a real message.
  require(k > 0, s"topKPerKey requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Same-key rows must be co-located; Spark inserts the single shuffle.
    * No required ordering — that's the point.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = new LazilyGeneratedOrdering(sortOrder, schema)
      // Per key: a max-heap under the REVERSED order, so the head is the
      // worst row currently kept and replacement is O(log k).
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val revCmp = ord.reverse
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, revCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { h =>
        // drain in output order (ascending under ord) for determinism
        val arr = h.toArray(new Array[UnsafeRow](h.size()))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy translating the logical node to the exec node. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}
