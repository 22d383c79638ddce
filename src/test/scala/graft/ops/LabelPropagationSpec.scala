package graft.ops

import graft.SparkSpec

/** The deterministic synchronous LPA must (a) separate two dense
  * communities joined by a single bridge edge (the case CC by design
  * merges), (b) be bit-identical across partitionings (the vote is a
  * pure (count, min-label) argmax over a set, no order dependence),
  * (c) match a driver-side replay of the same vote on a random graph,
  * and (d) not oscillate on a bipartite graph (the self-vote breaks
  * the 2-cycle classic synchronous LPA falls into).
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], rounds: Int, parts: Int = 4): Map[Long, Long] = {
    val und = edges ++ edges.map(_.swap)
    LabelPropagation.run(und.toDF("src", "dst").repartition(parts), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  test("two cliques joined by one bridge stay separate communities") {
    // CC merges everything into one component; LPA's density vote keeps
    // the cliques apart — each clique's interior votes drown the bridge
    val edges = clique(0L to 4L) ++ clique(10L to 14L) :+ (4L -> 10L)
    val got = labelsOf(edges, 4)
    val left = (0L to 4L).map(got)
    val right = (10L to 14L).map(got)
    assert(left.toSet.size == 1, s"left clique must agree: $got")
    assert(right.toSet.size == 1, s"right clique must agree: $got")
    assert(left.head != right.head, s"cliques must differ: $got")
  }

  test("bit-identical across partitionings") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(250)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    assert(labelsOf(edges, 3, parts = 1) == labelsOf(edges, 3, parts = 9))
  }

  test("matches a driver-side replay of the (count, min-label) vote") {
    val rnd = new scala.util.Random(23)
    val dir = Seq.fill(150)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val und = dir ++ dir.map(_.swap) // parallel duplicates: extra vote weight
    val nodes = und.map(_._1).distinct
    var label = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      label = nodes.map { n =>
        val votes = und.filter(_._2 == n).map(e => label(e._1)) :+ label(n)
        val counts = votes.groupBy(identity).map { case (l, vs) => l -> vs.size }
        // max count, min label
        n -> counts.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
      }.toMap
    }
    assert(labelsOf(dir, 3) == label)
  }

  test("bipartite graph converges instead of oscillating") {
    // complete bipartite K(3,3): without the self-vote, synchronous LPA
    // swaps sides forever; with it, labels must be STABLE from round R
    // to R+1 and form one community
    val edges = for (a <- 0L to 2L; b <- 10L to 12L) yield (a, b)
    val r4 = labelsOf(edges, 4)
    val r5 = labelsOf(edges, 5)
    assert(r4 == r5, s"labels must be stable: $r4 vs $r5")
    assert(r4.values.toSet.size == 1, s"K(3,3) is one community: $r4")
  }
}
