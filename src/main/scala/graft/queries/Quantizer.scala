package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecFns._
import graft.ops.KMeans

/** Session-scoped trained coarse quantizer over `embeddings.embedding` —
  * the learned replacement for the synthetic `label` stand-in (measured
  * weak by s10/d15). One k-means fit per (session, dir) serves every
  * consumer: s11 (learned-IVF search), s12 (quantizer recall
  * comparison), d16 (near-dup blocking comparison).
  *
  * K=8 fits the smallest test corpus (sf0.001 has 50 vectors); 3 Lloyd's
  * rounds from the deterministic seed draw. The memoized frames are
  * k rows (centroids) and n narrow rows (assignments) — not data-scale.
  */
object Quantizer {

  val K = 8
  val Iters = 3

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), DataFrame]
  // synchronized: TrieMap.getOrElseUpdate may evaluate the builder in
  // TWO racing threads and discard one result — leaking the loser's
  // persisted frame until session end (the media-pair-memo hardening).
  // Coarse per-memo locking is deliberate for the single-session
  // bench/verify lifecycle; a multi-session server would memoize a
  // lazy per-key handle via putIfAbsent instead.
  private def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized(memo.getOrElseUpdate((System.identityHashCode(s), dir, key), {
      val df = build.persist()
      df.count()
      df
    }))

  def evict(s: SparkSession, dir: String): Unit = {
    val sid = System.identityHashCode(s)
    memo.keys.filter(k => k._1 == sid && k._2 == dir)
      .foreach(k => memo.remove(k).foreach(_.unpersist(blocking = true)))
  }

  def evictAll(s: SparkSession): Unit = {
    val sid = System.identityHashCode(s)
    memo.keys.filter(_._1 == sid)
      .foreach(k => memo.remove(k).foreach(_.unpersist(blocking = true)))
  }

  /** Normalized vectors (vec_id, e), memoized per (session, dir) and
    * WIDENED to the session's parallelism when the source scan is
    * narrower: the embeddings file at test SFs is a single parquet
    * split, which would run every downstream corpus pass (the 3 Lloyd's
    * rounds, the final assign, the exact all-pairs stream side) on ONE
    * core. At 100 TB the scan has thousands of splits and the widen
    * branch never fires; here it is one tiny one-time shuffle that buys
    * every quadratic/iterative consumer full parallelism.
    */
  def vecsNorm(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "kmVecs") {
      Tables.widenIfNarrow(s, Tables(s, dir, "embeddings"))
        .select(col("vec_id"), l2normalize(toDouble(col("embedding"))).as("e"))
    }

  /** Trained centroids (cid, c), cid ∈ 1..K. */
  def centroids(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "kmCent") {
      KMeans.fit(vecsNorm(s, dir), K, Iters, LshDim)
    }

  /** Final full-corpus assignment (vec_id, e, cid) under the trained
    * centroids — e rides along so consumers need no join back to the
    * vectors.
    */
  def assignments(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "kmAsg") {
      KMeans.assign(vecsNorm(s, dir), centroids(s, dir))
    }

  /** DuckDB WITH-list fragment: `v` (normalized vectors) + the unrolled
    * fit layers ending in `cent$Iters` and the assignment `akm`. Prepend
    * to an oracle query as `WITH $sqlCtes, ...`.
    */
  def sqlCtes: String =
    s"""v AS (SELECT vec_id, ${sqlL2Normalize("embedding::DOUBLE[]")} AS e FROM embeddings),
       |${KMeans.sqlFitCtes(K, Iters, LshDim)}""".stripMargin

  /** The name of the final centroid CTE inside [[sqlCtes]]. */
  def sqlCentFinal: String = s"cent$Iters"
}
