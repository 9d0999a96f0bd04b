package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per key — as a FIRST-CLASS physical operator.
  *
  * The declarative spelling (`row_number().over(partitionBy(key).orderBy(o))
  * then filter(rank <= k)`) plans as Exchange → full per-partition SORT →
  * WindowExec that materializes every row of every key group before the
  * filter throws almost all of them away. For top-5-of-millions-per-key
  * that sort is the whole cost.
  *
  * [[TopKPerKeyExec]] instead keeps a bounded heap per key: one pass,
  * O(n log k) comparisons, memory O(keys·k) — no sort, no window buffer.
  * The exchange on the key is still required (and requested via
  * `requiredChildDistribution`, so EnsureRequirements plans it); what
  * disappears is the per-partition sort of the full data.
  *
  * Wired the standard way: logical node + strategy (registered on the
  * session's `experimental.extraStrategies` by [[TopK.perKey]], or via
  * `SparkSessionExtensions.injectPlannerStrategy`).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is MINTED here, not read from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // rows stay in their input partition → the child's hash partitioning
  // survives, and a downstream groupBy/join on the same keys skips its
  // exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ordering = GenerateOrdering.generate(sortExprs, childOutput)
      // max-heap w.r.t. sort position: head = worst retained row
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(rowProj(row).copy())
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(rowProj(row).copy())
            }
          case None =>
            val heap = scala.collection.mutable.PriorityQueue
              .empty[UnsafeRow](ordering.on((r: UnsafeRow) => r: InternalRow))
            heap.enqueue(rowProj(row).copy())
            heaps.put(key.copy(), heap)
        }
      }
      val joined = new JoinedRow
      // consumers (collect/shuffle) expect UnsafeRow — project the join
      val outProj = UnsafeProjection.create(
        (childOutput :+ rankAttr).map(_.dataType).toArray)
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeue order is worst-first; reverse → rank 1 = best
        val sorted = heap.dequeueAll.reverse
        sorted.iterator.zipWithIndex.map { case (r, i) =>
          outProj(joined(r, InternalRow(i + 1))): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rank, child) =>
      TopKPerKeyExec(keys, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** A sort key: column name + direction (best-first ordering). */
  case class Sort(column: String, ascending: Boolean = true)
  def asc(c: String): Sort = Sort(c, ascending = true)
  def desc(c: String): Sort = Sort(c, ascending = false)

  /** Top `k` rows per key by `order` (best first), with a 1-based
    * `rankName` column — semantically identical to the window+filter
    * formulation, physically heap-based. Columns are resolved by name
    * against `df` (Spark 4's Column nodes resolve only through the
    * analyzer, so a library-built plan binds attributes directly). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Sort], k: Int,
      rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { s =>
      SortOrder(attr(s.column),
        if (s.ascending) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val rankAttr =
      AttributeReference(rankName, IntegerType, nullable = false)()
    val node = TopKPerKeyNode(keys.map(attr), sortOrders, k, rankAttr, child)
    GraftShims.ofRows(spark, node)
  }
}
