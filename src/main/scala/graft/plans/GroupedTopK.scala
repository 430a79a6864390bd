package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator: for each group, the k best rows
  * under `order` (first SortOrder wins ties via the later ones), with a
  * 1-based `rank` column appended.
  *
  * Spark's stock plan for this shape — `row_number().over(Window.partitionBy
  * (...).orderBy(...))` + `filter(rank <= k)` — shuffles EVERY input row to
  * its group's partition and fully sorts each partition before discarding
  * all but k rows per group. This operator instead keeps a bounded heap of k
  * rows per group:
  *
  *  - partial phase (map side, before the exchange): each input partition
  *    retains at most k rows per group, so shuffle volume drops from N rows
  *    to at most (partitions x groups x k);
  *  - final phase (after the ClusteredDistribution-induced exchange): heaps
  *    merge per group and ranks are assigned. No full sort ever happens and
  *    per-group state is O(k).
  *
  * This is the batch multi-query ANN search shape (SURVEY §2.7-2.8) at
  * cluster scale: "top-k chunks per query" over a corpus too large to sort.
  * Registered via `spark.experimental.extraStrategies` (GroupedTopK.install).
  *
  * Memory model: per-partition state is O(groups x k) rows with no spill
  * integration — sized for the many-rows-few-groups regime (query batches,
  * segments). For group cardinality approaching row count, prefer the
  * window plan (UnsafeExternalSorter spills); wiring TaskMemoryManager
  * spilling into the partial phase is the planned extension.
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rank", IntegerType, nullable = false)())
  extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(groupExprs, order, k, child, rankAttr) =>
      val partial = GroupedTopKExec(groupExprs, order, k, assignRank = false,
        rankAttr = None, child = planLater(child))
      GroupedTopKExec(groupExprs, order, k, assignRank = true,
        rankAttr = Some(rankAttr), child = partial,
        requiresClustering = true) :: Nil
    case _ => Nil
  }
}

case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    assignRank: Boolean,
    rankAttr: Option[Attribute],
    child: SparkPlan,
    requiresClustering: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def outputPartitioning: Partitioning =
    if (requiresClustering) child.outputPartitioning
    else UnknownPartitioning(0)

  override def requiredChildDistribution: Seq[Distribution] =
    if (requiresClustering) Seq(ClusteredDistribution(groupExprs))
    else super.requiredChildDistribution

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsL = groupExprs
    val orderL = order
    val kL = k
    val doRank = assignRank
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val gp = UnsafeProjection.create(groupExprsL, childOutput)
      val ord = GenerateOrdering.generate(orderL, childOutput)
        .asInstanceOf[Ordering[InternalRow]]
      // Scala PQ dequeues the LARGEST under `ord`; ascending-`ord` "largest"
      // = worst of the kept k, which is exactly what we evict.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val u = row.asInstanceOf[UnsafeRow]
        val key = gp(u)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kL) heap.enqueue(u.copy())
            else if (ord.compare(u, heap.head) < 0) { heap.dequeue(); heap.enqueue(u.copy()) }
          case None =>
            val heap = mutable.PriorityQueue.empty[UnsafeRow](
              ord.asInstanceOf[Ordering[UnsafeRow]])
            heap.enqueue(u.copy())
            heaps.put(key.copy(), heap)
        }
      }
      if (!doRank) {
        heaps.valuesIterator.flatMap(_.iterator).map(_.asInstanceOf[InternalRow])
      } else {
        val toUnsafe = UnsafeProjection.create(outTypes)
        heaps.valuesIterator.flatMap { heap =>
          val ranked = heap.dequeueAll.reverseIterator.zipWithIndex
          ranked.map { case (row, i) =>
            val joined = new GenericInternalRow(childOutput.size + 1)
            var c = 0
            while (c < childOutput.size) {
              joined.update(c, row.get(c, childOutput(c).dataType))
              c += 1
            }
            joined.update(childOutput.size, i + 1)
            toUnsafe(joined).copy().asInstanceOf[InternalRow]
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopK {
  /** Install the planner strategy into a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies = cur :+ GroupedTopKStrategy
  }

  /** DataFrame API: the k best rows per group under `orderCols` (use
    * `desc(...)` columns for "largest first"), with a 1-based `rank`. */
  def apply(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val node = GroupedTopKNode(
      groupCols.map(GraftSqlBridge.convertedExpression),
      orderCols.map(GraftSqlBridge.convertedExpression).map {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      },
      k,
      GraftSqlBridge.logicalPlan(df))
    GraftSqlBridge.ofRows(spark, node)
  }
}
