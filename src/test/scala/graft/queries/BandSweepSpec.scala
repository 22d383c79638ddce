package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The d12/d13 one-pass band sweep and the production d03 path build
  * the SAME r=4 banding from different shapes (slice projections of the
  * slot array vs an aggregate over the long signature rows, in-row pair
  * generation vs a bucket self-join). This pins them equal: a drift in
  * either construction (slice offset, band key, bucket cap) breaks the
  * equivalence before it can silently skew the sweep's stats.
  */
class BandSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sweep's r=4 candidates == production lshCandidates") {
    val sweep4 = DedupQueries.bandSweepCandidates(DedupQueries.minhashArr(spark, dir))
      .filter(col("r") === 4L).select("doc_a", "doc_b").distinct()
    val prod = DedupQueries.lshCandidates(spark, dir).select("doc_a", "doc_b")
    assert(sweep4.exceptAll(prod).isEmpty && prod.exceptAll(sweep4).isEmpty,
      "r=4 sweep candidates must equal the d03 candidate set")
  }
}
