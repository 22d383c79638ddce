package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ops.KCore against a hand-peeled fixture: a triangle (the 2-core)
  * with a pendant chain that unravels one node per round — the shape
  * that distinguishes k-core from plain degree filtering (chain nodes
  * 4 and 5 have degree 2 initially and still fall, because their
  * support depends on nodes that fall first).
  */
class KCoreSpec extends SparkSpec {

  // triangle 1-2-3, chain 3-4-5-6
  private def edges(): DataFrame = {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val both = und ++ und.map { case (a, b) => (b, a) }
    spark.createDataFrame(both).toDF("src", "dst")
  }

  private def profileOf(e: DataFrame): Seq[(Long, Long, Long)] = {
    val (profile, _) = KCore.run(e, 2, 5)
    profile.orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("pendant chain unravels one node per round; triangle survives") {
    // r1: 6 falls (deg 1) -> 5 survivors, 5 und. edges
    // r2: 5 falls (its support was 6) -> 4 survivors
    // r3: 4 falls -> the triangle, converged thereafter
    val want = Seq(
      (1L, 5L, 10L), (2L, 4L, 8L), (3L, 3L, 6L), (4L, 3L, 6L), (5L, 3L, 6L))
    assert(profileOf(edges()) == want)
  }

  test("profile is partition-invariant") {
    val base = profileOf(edges())
    assert(profileOf(edges().repartition(7)) == base)
    assert(profileOf(edges().repartition(1)) == base)
  }

  test("final core keeps within-core degrees") {
    val (_, core) = KCore.run(edges(), 2, 5)
    val got = core.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
