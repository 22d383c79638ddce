package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSeq, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Exact per-group top-k as a FIRST-CLASS PLAN OPERATOR — the complete
  * Catalyst extension stack (SURVEY §2 custom-operator ladder, rung (c)):
  * a logical node ([[TopKPerGroup]]), a planner strategy
  * ([[TopKStrategy]]) that lowers it to a partial/final pair of physical
  * operators ([[TopKExec]]), and a [[SparkSessionExtensions]] hook
  * ([[GraftExtensions]]).
  *
  * Execution shape (the reason a plan operator beats a window function):
  * the PARTIAL exec keeps a bounded k-entry heap per group inside each
  * input partition — no sort, no per-row shuffle row — so only
  * k × groups × partitions candidate rows reach the exchange;
  * EnsureRequirements inserts that exchange because the FINAL exec
  * declares `ClusteredDistribution(group)`, and the final merge re-heaps
  * the survivors and emits ranked rows. This is the fourth pinned engine
  * path for top-k beside the window (e04), the typed Aggregator udaf
  * (e06), and the native TypedImperativeAggregate (e07) — all four share
  * one oracle.
  *
  * Scope: value must be DoubleType and the tie-breaker LongType
  * (rank = row_number over value DESC, tie ASC); rows with a NULL value
  * are excluded (none exist in the pinned tables — the oracle would see
  * them too).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    valueExpr: Expression,
    tieExpr: Expression,
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is minted here, not read from the child — declare it or the
  // analyzer reports it as an attribute missing from the input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Lowers [[TopKPerGroup]] to partial + final [[TopKExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, v, t, k, rank, child) =>
      val partial = TopKExec(g, v, t, k, partial = true, rank, planLater(child))
      TopKExec(g, v, t, k, partial = false, rank, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-group top-k. Partial mode runs on whatever
  * distribution the child has and emits surviving child rows; final mode
  * requires `ClusteredDistribution(group)` (EnsureRequirements plans the
  * exchange) and appends the rank column. Per-task memory is
  * O(groups-in-partition × k) — no full-group materialization anywhere.
  */
case class TopKExec(
    groupExprs: Seq[Expression],
    valueExpr: Expression,
    tieExpr: Expression,
    k: Int,
    partial: Boolean,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  // (value, tie, row); "worse ranks higher" so the heap head is the
  // weakest kept entry: smaller value first, then larger tie
  private type Entry = (Double, Long, UnsafeRow)
  private val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (groups, v, t, kk, isPartial) = (groupExprs, valueExpr, tieExpr, k, partial)
    val ord = worstFirst
    val finalOutput = output
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groups, childOutput)
      // identity projection: stored rows must be (a) owned copies — the
      // input iterator reuses row objects — and (b) UnsafeRow regardless
      // of what the child produces
      val copyProj = UnsafeProjection.create(childOutput, childOutput)
      val vBound = BindReferences.bindReference(v, AttributeSeq(childOutput))
      val tBound = BindReferences.bindReference(t, AttributeSeq(childOutput))
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      iter.foreach { row =>
        val vv = vBound.eval(row)
        if (vv != null) {
          val value = vv.asInstanceOf[Double]
          val tie = tBound.eval(row).asInstanceOf[Long]
          val heap = heaps.getOrElseUpdate(groupProj(row).copy(),
            mutable.PriorityQueue.empty[Entry](ord))
          if (heap.size < kk) {
            heap.enqueue((value, tie, copyProj(row).copy()))
          } else {
            val (wv, wt, _) = heap.head
            if (value > wv || (value == wv && tie < wt)) {
              heap.dequeue()
              heap.enqueue((value, tie, copyProj(row).copy()))
            }
          }
        }
      }
      numGroups += heaps.size
      if (isPartial) {
        heaps.valuesIterator.flatMap(_.iterator.map { e =>
          numOutputRows += 1
          e._3
        })
      } else {
        val resultProj = UnsafeProjection.create(finalOutput, finalOutput)
        val joined = new JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        heaps.valuesIterator.flatMap { heap =>
          // dequeue order is worst -> best; reverse for rank 1 = best
          val entries: Seq[Entry] = heap.dequeueAll
          entries.reverseIterator.zipWithIndex.map { case (e, i) =>
            rankRow.update(0, i + 1)
            numOutputRows += 1
            resultProj(joined(e._3, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** `spark.sql.extensions`-style injection point (config-based sessions);
  * [[TopKPlan.topKPerGroup]] also self-registers through
  * `experimental.extraStrategies` so ad-hoc sessions need no config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
  }
}

object TopKPlan {
  /** Top-k rows per group as a DataFrame: child columns + an IntegerType
    * rank column (`rankName`), rank = position under (value DESC, tie
    * ASC) within the group. Registers [[TopKStrategy]] on the session's
    * experimental strategies (idempotent).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCol: String, k: Int, rankName: String = "rn"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classicSpark.experimental.extraStrategies.contains(TopKStrategy)) {
      classicSpark.experimental.extraStrategies =
        classicSpark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column '$n' in ${analyzed.output.map(_.name)}"))
    val v = attr(valueCol)
    val t = attr(tieCol)
    require(v.dataType == DoubleType, s"value column must be double, got ${v.dataType}")
    require(t.dataType == LongType, s"tie column must be long, got ${t.dataType}")
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), v, t, k, rankAttr, analyzed))
  }
}
