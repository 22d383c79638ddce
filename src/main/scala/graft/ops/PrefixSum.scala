package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exclusive prefix sum over a long weight column in the
  * total order of a long id column — the scale-safe form of
  * `sum(w) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`,
  * which Spark executes as a SINGLE-TASK global sort.
  *
  * Two-level shape (p08_pack's plan, audited in PLANS.md):
  *   1. per-range partial sums — one aggregate over range = id/rangeWidth;
  *   2. a running offset over the tiny |ranges|-row frame (one task),
  *      broadcast back;
  *   3. within-range cumulative sums, each window partition bounded at
  *      rangeWidth ids.
  * rangeWidth is chosen so both |ranges| and the per-range row count fit
  * a task; a third level generalizes to any corpus.
  *
  * Ids need not be dense — ranges are id-value buckets, not row counts —
  * but the offset is defined by id ORDER, so ties on (id) within a range
  * fold in id order only if ids are unique (callers use unique keys).
  *
  * The input is read TWICE (per-range totals + the main pass): callers
  * whose input is an expensive derived chain should materialize it
  * first (cache / localCheckpoint), or the offsets branch re-evaluates
  * the chain — p10_pipeline's plan audit caught exactly that.
  */
object PrefixSum {

  /** Adds `offsetCol` = total weight of all rows with a smaller id. */
  def exclusiveOffsets(df: DataFrame, idCol: String, weightCol: String,
      rangeWidth: Long, offsetCol: String = "off"): DataFrame = {
    val withRange = df.withColumn("__rng", floor(col(idCol) / rangeWidth).cast(LongType))
    val wr = Window.orderBy("__rng").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withRange.groupBy("__rng").agg(sum(weightCol).as("__rt"))
      .withColumn("__roff", coalesce(sum(col("__rt")).over(wr), lit(0L)))
      .select("__rng", "__roff")
    val ww = Window.partitionBy("__rng").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    withRange.join(broadcast(offsets), "__rng")
      .withColumn(offsetCol,
        col("__roff") + coalesce(sum(col(weightCol)).over(ww), lit(0L)))
      .drop("__rng", "__roff")
  }

  /** [[exclusiveOffsets]] plus a budget shard id (offset / budget) —
    * the sequence-packing assignment.
    */
  def packedShards(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, rangeWidth: Long): DataFrame =
    exclusiveOffsets(df, idCol, weightCol, rangeWidth)
      .withColumn("shard", floor(col("off") / budget).cast(LongType))

  /** The single-window reference semantics (kept for spec equivalence —
    * NOT the scale path).
    */
  private[graft] def naiveOffsets(df: DataFrame, idCol: String,
      weightCol: String): DataFrame = {
    val w = Window.orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("off", coalesce(sum(col(weightCol)).over(w), lit(0L)))
  }

  /** Column form of the shard id for callers composing manually. */
  def shardOf(off: Column, budget: Long): Column =
    floor(off / budget).cast(LongType)

  /** Per-GROUP exclusive prefix sum in (priCol, tieCol) order — the
    * grouped generalization of [[exclusiveOffsets]] (p25's shape). A
    * plain `PARTITION BY group ORDER BY pri` window folds each group in
    * ONE task however large the group; here ranges bucket the priority
    * axis, so per-(group, range) partial sums aggregate map-side, the
    * running offset runs over the tiny |groups|·|ranges| frame, and the
    * in-range window partitions are bounded by rangeWidth whatever the
    * group skew. Ties on priCol within a range fold by tieCol (callers
    * pass a unique key); equal priorities always share a range (ranges
    * are priority-value buckets), so cross-range order is well-defined.
    */
  def groupedOffsets(df: DataFrame, groupCol: String, priCol: String,
      tieCol: String, weightCol: String, rangeWidth: Long,
      offsetCol: String = "off"): DataFrame = {
    val withRange = df.withColumn("__rng", floor(col(priCol) / rangeWidth).cast(LongType))
    val wr = Window.partitionBy(groupCol).orderBy("__rng")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withRange.groupBy(groupCol, "__rng").agg(sum(weightCol).as("__rt"))
      .withColumn("__roff", coalesce(sum(col("__rt")).over(wr), lit(0L)))
      .select(col(groupCol), col("__rng"), col("__roff"))
    val ww = Window.partitionBy(groupCol, "__rng").orderBy(priCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    withRange.join(broadcast(offsets), Seq(groupCol, "__rng"))
      .withColumn(offsetCol,
        col("__roff") + coalesce(sum(col(weightCol)).over(ww), lit(0L)))
      .drop("__rng", "__roff")
  }
}
