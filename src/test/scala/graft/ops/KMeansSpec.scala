package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecFns._

/** Deterministic spherical k-means (ops.KMeans): the learned coarse
  * quantizer under the s11/s12/d16 rows. Pins the properties the oracle
  * replay depends on — seed draw, argmax tie rule, partition invariance
  * of the decimal centroid update, empty-cluster carry-over — plus a
  * clusterable-fixture sanity check and the shuffle-free assignment
  * plan shape.
  */
class KMeansSpec extends SparkSpec {

  graft.expressions.GraftFunctions.register(spark)

  import spark.implicits._

  /** n unit vectors in 4-d: two well-separated groups around e1 and e3,
    * with a deterministic small wobble in the off-axis coordinates.
    */
  private def fixture(n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = ((i * 37) % 11) / 100.0
      val raw =
        if (i % 2 == 0) Array(1.0, w, 0.0, w / 2)
        else Array(0.0, w / 2, 1.0, w)
      (i.toLong, raw)
    }
    rows.toDF("vec_id", "raw")
      .select(col("vec_id"), l2normalize(col("raw")).as("e"))
  }

  test("seeds: k rows, cid 1..k, in (h60, vec_id) order") {
    val s = KMeans.seeds(fixture(20), 5).collect()
    assert(s.length == 5)
    assert(s.map(_.getInt(0)).sorted.toSeq == (1 to 5))
  }

  test("assignment matches the explode-based argmax (lowest cid on ties)") {
    val v = fixture(30)
    val cent = KMeans.fit(v, 3, 2, 4)
    val got = KMeans.assign(v, cent)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    // independent argmax: explode all (vector, centroid) dots, window
    val w = Window.partitionBy("vec_id").orderBy(desc("d"), col("cid"))
    val want = v.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"), dotSeq(col("e"), col("c")).as("d"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("centroids are partition-invariant (decimal sums)") {
    val v = fixture(40)
    def cents(df: DataFrame): Map[Int, Seq[Double]] =
      KMeans.fit(df, 4, 3, 4)
        .select("cid", "c").as[(Int, Seq[Double])].collect().toMap
    assert(cents(v.repartition(7)) == cents(v.repartition(1)))
  }

  test("an emptied cluster keeps its previous centroid (no null/NaN)") {
    // all vectors identical: every assignment tie-breaks to one cid, so
    // the other clusters win nothing in every round and must carry their
    // seed centroid forward
    val v = (0 until 12).map(i => (i.toLong, Array(0.5, 0.5, 0.5, 0.5)))
      .toDF("vec_id", "raw")
      .select(col("vec_id"), l2normalize(col("raw")).as("e"))
    val cent = KMeans.fit(v, 3, 2, 4)
      .select("cid", "c").as[(Int, Seq[Double])].collect()
    assert(cent.length == 3)
    assert(cent.forall { case (_, c) => c.length == 4 && c.forall(x => !x.isNaN) })
  }

  test("k=2 on a two-group fixture recovers the groups") {
    val v = fixture(40)
    val asg = KMeans.assign(v, KMeans.fit(v, 2, 3, 4))
      .select("vec_id", "cid").as[(Long, Int)].collect()
    val byGroup = asg.groupBy(_._1 % 2 == 0).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.toSeq
    }
    // each true group maps to exactly one cluster, and the two differ
    assert(byGroup.values.forall(_.length == 1))
    assert(byGroup(true) != byGroup(false))
  }

  test("assignment shuffles only the k-row centroid fold, never the corpus") {
    val v = fixture(30)
    val cent = KMeans.fit(v, 3, 2, 4)
    val plan = KMeans.assign(v, cent).queryExecution.executedPlan.toString
    // exactly one Exchange: the SinglePartition collect_list of the
    // k centroid rows INSIDE the broadcast subtree (k rows, not data);
    // the corpus side is a pure projection over the scan
    val n = raw"(^|[\s\-:+])Exchange ".r.findAllIn(plan).size
    assert(n == 1, s"expected only the k-row centroid-fold exchange, got $n:\n${plan.take(1500)}")
    val beforeBroadcast = plan.split("BroadcastExchange").head
    assert(!beforeBroadcast.contains("Exchange "),
      s"corpus side of the assignment must not shuffle:\n${plan.take(1500)}")
  }
}
