package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped session-conf shaping for the iterative engines' round loops.
  *
  * Each round of CC / PageRank / LPA / BFS / SSSP / k-core / HITS
  * materializes a NODE-SCALE frame through a fixed-shape plan (one
  * equi-join against the persisted edge list + one keyed aggregate).
  * Two session defaults are wrong for that loop, at any scale:
  *
  *   - AQE re-plans and re-launches every query stage of every
  *     micro-action as its own job. Measured at sf0.1 (r13,
  *     tools.JobProfile): d19's CC+PageRank rounds ran 50 jobs under
  *     AQE vs 23 without, with job wall ~2 s either way and the rest
  *     pure driver re-planning (9.2 s vs 3.6 s total). AQE buys
  *     nothing here because the per-round plan SHAPES are fixed and
  *     the join strategies are already explicit (broadcast hints on
  *     bounded sides, repartition(src) on the persisted edge list).
  *   - The static `spark.sql.shuffle.partitions` (sized for the
  *     corpus-scale queries) is far too wide for per-round exchanges:
  *     with AQE's coalescing gone, every round scheduled
  *     partitions-many near-empty tasks (measured: m05's 9 CC rounds
  *     ran ~113 tasks/round over a 3k-pair graph).
  *
  * [[scoped]] therefore disables AQE and derives the round-loop
  * partition count FROM THE INPUT SIZE (guide §2: scale-adaptive
  * partitioning, never a constant tuned for one deployment):
  * ceil(inputRows / 1M rows) partitions, clamped to the session's
  * shuffle.partitions — so a toy graph runs 1-2-task rounds, while at
  * 100 TB the clamp keeps the session's production width. Sessions
  * that want AQE inside rounds regardless (e.g. unknown edge skew
  * feeding the contribution join) set `graft.iter.keepAqe=true`.
  *
  * The toggle is a set/restore around the loop — single-session
  * assumption, same as the memo locks (documented in DedupQueries).
  */
object IterConf {

  /** ~64k pair/label rows ≈ 1-2 MB per post-shuffle partition — the
    * same floor AQE's coalescer applies
    * (spark.sql.adaptive.coalescePartitions.minPartitionSize = 1 MB).
    * Round frames are rescheduled EVERY round, so the per-task
    * scheduling overhead dominates long before the scan-advisory
    * 100 MB+ sizing does; measured at sf0.1: 1M rows/partition ran the
    * 1.1M-edge trade graph's rounds 2-wide and cost g01/g02/g07 ~+1.5 s
    * each vs this floor, while tiny pair graphs (d19/m05, ≤ 10k pairs)
    * run 1-wide either way.
    */
  val RowsPerPartition: Long = 65536L

  def scoped[T](s: SparkSession, inputRows: Long)(body: => T): T = {
    if (s.conf.getOption("graft.iter.keepAqe").contains("true")) return body
    val aqeKey = "spark.sql.adaptive.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val prevAqe = s.conf.getOption(aqeKey)
    val prevPart = s.conf.getOption(partKey)
    val sessionParts =
      prevPart.flatMap(p => scala.util.Try(p.toInt).toOption)
        .getOrElse(s.sparkContext.defaultParallelism)
    val p = math.max(1L,
      math.min(sessionParts.toLong,
        (inputRows + RowsPerPartition - 1) / RowsPerPartition)).toInt
    s.conf.set(aqeKey, "false")
    s.conf.set(partKey, p.toString)
    try body finally {
      prevAqe.fold(s.conf.unset(aqeKey))(s.conf.set(aqeKey, _))
      prevPart.fold(s.conf.unset(partKey))(s.conf.set(partKey, _))
    }
  }

  /** [[scoped]] without a size hint — AQE off, session partitions kept. */
  def withoutAqe[T](s: SparkSession)(body: => T): T = {
    if (s.conf.getOption("graft.iter.keepAqe").contains("true")) return body
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try body finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
  }
}
