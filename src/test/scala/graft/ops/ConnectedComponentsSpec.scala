package graft.ops

import graft.SparkSpec

/** Both CC engines must produce identical (node → component-min) labels;
  * truth is an in-test union-find. The chain graph is the case that
  * motivates the star engine: min-label needs diameter rounds, the
  * alternating algorithm O(log) — pinned here so the scale claim is
  * measured, not asserted.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs: both engines match union-find") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (1 to 80).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val df = edges.toDF("src", "dst")
      val expected = unionFind(n, edges)
      val (ml, _) = ConnectedComponents.minLabel(df)
      val (as, _) = ConnectedComponents.alternatingStar(df)
      withClue(s"trial $trial minLabel: ") { assert(labelsOf(ml) == expected) }
      withClue(s"trial $trial alternatingStar: ") { assert(labelsOf(as) == expected) }
    }
  }

  test("deep chain: star engine converges in O(log) rounds, not diameter") {
    // a 48-node path — diameter 47; every node must label to 0
    val chain = (0L until 47L).map(i => (i, i + 1))
    val df = chain.toDF("src", "dst")
    val expected = (0L to 47L).map(_ -> 0L).toMap
    val (ml, mlRounds) = ConnectedComponents.minLabel(df)
    val (as, asRounds) = ConnectedComponents.alternatingStar(df)
    assert(labelsOf(ml) == expected)
    assert(labelsOf(as) == expected)
    assert(mlRounds >= 40, s"min-label should pay ~diameter rounds, took $mlRounds")
    assert(asRounds <= 12, s"alternating star should be log-bounded, took $asRounds")
  }

  test("two components + duplicate/reversed input pairs") {
    val df = Seq((5L, 3L), (3L, 5L), (3L, 9L), (20L, 21L), (21L, 20L))
      .toDF("src", "dst")
    val expected = Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L)
    assert(labelsOf(ConnectedComponents.minLabel(df)._1) == expected)
    assert(labelsOf(ConnectedComponents.alternatingStar(df)._1) == expected)
  }

  test("auto: shallow graphs stay on min-label, deep graphs fall back to the star engine") {
    // shallow: two triangles — converges inside any budget, cheap engine
    val shallow = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L))
      .toDF("src", "dst")
    val (sl, sRounds) = ConnectedComponents.auto(shallow, diameterBudget = 8)
    assert(labelsOf(sl) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(sRounds <= 8, s"shallow graph must not trigger the fallback; rounds $sRounds")

    // deep: a 48-node chain under a budget of 4 — min-label cannot
    // converge, auto must switch engines and still produce exact labels
    val chain = (0L until 47L).map(i => (i, i + 1)).toDF("src", "dst")
    val expected = (0L to 47L).map(_ -> 0L).toMap
    val (dl, dRounds) = ConnectedComponents.auto(chain, diameterBudget = 4)
    assert(labelsOf(dl) == expected)
    assert(dRounds > 4, s"deep graph must have paid the budget then switched; rounds $dRounds")
  }

  test("keep-list (min per component survives) is engine-invariant") {
    // the d13 consumption shape: losers = nodes whose label != self;
    // the keep-list must be identical whichever engine auto lands on
    val rnd = new scala.util.Random(7)
    val edges = ((1 to 60).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    } ++ (100L until 130L).map(i => (i, i + 1))) // deep tail appended
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    def keepers(labels: org.apache.spark.sql.DataFrame): Set[Long] =
      labels.filter(org.apache.spark.sql.functions.col("cluster_id") ===
        org.apache.spark.sql.functions.col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    val viaMin = keepers(ConnectedComponents.minLabel(df)._1)
    val viaStar = keepers(ConnectedComponents.alternatingStar(df)._1)
    val viaAutoSwitched = keepers(ConnectedComponents.auto(df, diameterBudget = 3)._1)
    assert(viaMin == viaStar)
    assert(viaAutoSwitched == viaMin)
  }
}
