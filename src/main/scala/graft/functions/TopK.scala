package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed [[Aggregator]] — the
  * partial-aggregation form of the rank pattern (e04). A window
  * `row_number() <= k` must shuffle EVERY row of a group to one task
  * before discarding all but k; this aggregator keeps a bounded
  * k-element buffer per group on each map task (partial aggregation),
  * shuffles only `k * numMapTasks` survivors per group, and merges
  * buffers on the reduce side. With k << group size that's the shape
  * that survives a 5-distinct-values key over 100 TB — and unlike the
  * salted-window rewrite it needs no salt tuning.
  *
  * No reference analog (the reference's polars `top_k` runs
  * single-node); composes with groupBy like any builtin via
  * `functions.udaf`.
  */
object TopK {

  /** One candidate: ordered by value desc, id asc (deterministic
    * tie-break).
    */
  final case class Entry(value: Double, id: Long)

  private val ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)](e => (-e.value, e.id))

  final class ByValueDesc(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, "k must be positive")
    override def zero: Seq[Entry] = Vector.empty
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      // full buffer + candidate not better than the current worst: skip
      // without re-sorting — the hot path for almost every row
      if (b.length >= k && ord.gteq(a, b.last)) b
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(b: Seq[Entry]): Seq[Entry] = b
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }
}
