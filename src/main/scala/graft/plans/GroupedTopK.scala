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
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator: for each group, the k best rows
  * under `order` (first SortOrder wins ties via the later ones), with a
  * 1-based `rank` column appended.
  *
  * Spark's stock plan for this shape — `row_number().over(Window.partitionBy
  * (...).orderBy(...))` + `filter(rank <= k)` — shuffles EVERY input row to
  * its group's partition and fully sorts each partition before discarding
  * all but k rows per group. This operator instead:
  *
  *  - partial phase (map side, before the exchange): each input partition
  *    retains at most k rows per group in bounded heaps, so shuffle volume
  *    drops from N rows to at most (partitions x groups x k);
  *  - final phase (after the ClusteredDistribution-induced exchange and a
  *    planner-inserted sort on group ++ order): a streaming rank-limiter —
  *    emit the first k rows of each group run with ranks 1..k. O(1) state.
  *
  * This is the batch multi-query ANN search shape (SURVEY §2.7-2.8) at
  * cluster scale: "top-k chunks per query" over a corpus too large to sort.
  * Registered via `spark.experimental.extraStrategies` (GroupedTopK.install).
  *
  * Memory model (100 TB-safe): the partial phase caps held rows at
  * `spark.graft.groupedTopK.maxPartialRows` (default 2^20); exceeding the
  * cap flushes every held heap downstream and restarts — always correct,
  * because the final phase re-selects top-k per group after the exchange,
  * so a flush only costs shuffle volume, never rows. The final phase holds
  * one group run at a time; the partition-wide sort it relies on is Spark's
  * own SortExec, which spills via UnsafeExternalSorter. No phase can OOM on
  * group cardinality.
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

object GroupedTopKExec {
  /** Partial-phase held-row cap (groups x k rows per input partition);
    * exceeding it flushes the heaps downstream and restarts. */
  val MaxPartialRowsKey = "spark.graft.groupedTopK.maxPartialRows"
  val MaxPartialRowsDefault: Long = 1L << 20
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

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "partialFlushes" -> SQLMetrics.createMetric(sparkContext,
      "partial-phase heap flushes (held-row cap hits)"))

  override def outputPartitioning: Partitioning =
    if (requiresClustering) child.outputPartitioning
    else UnknownPartitioning(0)

  override def requiredChildDistribution: Seq[Distribution] =
    if (requiresClustering) Seq(ClusteredDistribution(groupExprs))
    else super.requiredChildDistribution

  /** The rank-assigning phase streams over group runs, so it needs rows
    * clustered AND sorted by (group, order). The sort is Spark's SortExec —
    * spill-capable — inserted by EnsureRequirements. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (assignRank) Seq(groupExprs.map(SortOrder(_, Ascending)) ++ order)
    else Seq(Nil)

  override protected def doExecute(): RDD[InternalRow] =
    if (assignRank) executeFinal() else executePartial()

  /** Map-side bounded heaps with a flush-on-cap escape hatch: at most k rows
    * per group are held; if total held rows exceed the cap (group-cardinality
    * ~ row-count regime), everything held is emitted downstream and the map
    * restarts. Emitting extra rows is always safe here — the final phase
    * re-selects top-k per group — so memory stays bounded at ~2x the cap
    * (held map + the detached snapshot being drained) at a worst-case cost
    * of extra shuffle volume. */
  private def executePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsL = groupExprs
    val orderL = order
    val kL = k
    val maxHeldL = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(GroupedTopKExec.MaxPartialRowsKey,
        GroupedTopKExec.MaxPartialRowsDefault.toString).toLong
    val flushMetric = longMetric("partialFlushes")
    child.execute().mapPartitions { iter =>
      val gp = UnsafeProjection.create(groupExprsL, childOutput)
      val ord = GenerateOrdering.generate(orderL, childOutput)
        .asInstanceOf[Ordering[InternalRow]]
      new Iterator[InternalRow] {
        // Scala PQ dequeues the LARGEST under `ord`; ascending-`ord`
        // "largest" = worst of the kept k, which is exactly what we evict.
        private val heaps =
          mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        private var held = 0L
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false

        private def drain(): Unit = {
          val snapshot = heaps.values.toArray
          heaps.clear()
          held = 0
          out = snapshot.iterator.flatMap(_.iterator)
            .map(_.asInstanceOf[InternalRow])
        }

        private def advance(): Unit = {
          while (!out.hasNext && !inputDone) {
            if (!iter.hasNext) { inputDone = true; drain() }
            else {
              val u = iter.next().asInstanceOf[UnsafeRow]
              val key = gp(u)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kL) { heap.enqueue(u.copy()); held += 1 }
                  else if (ord.compare(u, heap.head) < 0) {
                    heap.dequeue(); heap.enqueue(u.copy())
                  }
                case None =>
                  val heap = mutable.PriorityQueue.empty[UnsafeRow](
                    ord.asInstanceOf[Ordering[UnsafeRow]])
                  heap.enqueue(u.copy())
                  heaps.put(key.copy(), heap)
                  held += 1
              }
              if (held > maxHeldL) { flushMetric += 1; drain() }
            }
          }
        }

        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }
  }

  /** Reduce-side streaming rank-limiter over (group, order)-sorted input:
    * emit the first k rows of each group run with ranks 1..k. Holds one
    * group key — O(1) memory regardless of group cardinality. */
  private def executeFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsL = groupExprs
    val kL = k
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val gp = UnsafeProjection.create(groupExprsL, childOutput)
      val toUnsafe = UnsafeProjection.create(outTypes)
      var currentKey: UnsafeRow = null
      var rank = 0
      iter.flatMap { row =>
        val u = row.asInstanceOf[UnsafeRow]
        val key = gp(u)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rank = 0
        }
        rank += 1
        if (rank <= kL) {
          val joined = new GenericInternalRow(childOutput.size + 1)
          var c = 0
          while (c < childOutput.size) {
            joined.update(c, u.get(c, childOutput(c).dataType))
            c += 1
          }
          joined.update(childOutput.size, rank)
          Iterator.single(toUnsafe(joined).copy().asInstanceOf[InternalRow])
        } else Iterator.empty
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
