package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed multi-source BFS over a directed edge list — the
  * DISTANCE member of the iterative-graph family: [[ConnectedComponents]]
  * answers "same group?", [[PageRank]] "how central?",
  * [[LabelPropagation]] "which community?", this answers "how far from
  * the seed set?". Corpus use: graph distance from a trusted / seed
  * subset (curated domains, verified documents) as a quality prior —
  * the "hops from a good node" feature web-scale curation pipelines
  * score by.
  *
  * Arithmetic contract: pure integer min-plus relaxation, so results
  * are bit-exact under any partitioning (min commutes) and [[sqlCtes]]
  * replays the identical rounds in DuckDB. Each round relaxes EVERY
  * labeled node (Bellman-Ford style): for unit weights this reaches the
  * same fixpoint as frontier-only BFS after the same number of rounds,
  * and keeps the oracle a plain UNION ALL + GROUP BY min per layer. (At
  * 100 TB the frontier-only delta — join only nodes improved last
  * round — is the constant-factor optimization; the result is
  * identical, so it can be swapped in without touching the contract.)
  *
  * Scale shape: the edge list is persisted src-partitioned once; each
  * round is one equi-join of the label frame against it plus one
  * node-keyed min aggregation (map-side partial min), lineage truncated
  * per round — O(1) plan size for any hop bound, state bounded by node
  * cardinality. Nodes unreachable within `maxHops` carry no row.
  */
object Bfs {

  /** @param edges   directed (src: long, dst: long); pass both
    *                orientations for an undirected graph.
    * @param sources (node: long) seed rows, distance 0.
    * @return (node, dist) for every node within `maxHops` of a seed.
    */
  def run(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    var labels = sources.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      val cand = labels.join(e, labels("node") === e("src"))
        .select(e("dst").as("node"), (col("dist") + 1L).as("dist"))
      labels = labels.unionAll(cand)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    e.unpersist()
    labels
  }

  /** DuckDB mirror of [[run]] as unrolled CTE layers — callers splice
    * `WITH $sqlCtes` in front of a SELECT over `bfs` (node, dist).
    * `edgesCte` must yield (src, dst); `sourcesCte` must yield (node).
    */
  def sqlCtes(edgesCte: String, sourcesCte: String, maxHops: Int): String = {
    val layers = (1 to maxHops).map { k =>
      s"""b$k AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM b${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, b.dist + 1 AS dist
         |    FROM edges e JOIN b${k - 1} b ON e.src = b.node)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""edges AS ($edgesCte),
       |srcs AS ($sourcesCte),
       |b0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM srcs),
       |$layers,
       |bfs AS (SELECT node, dist FROM b$maxHops)""".stripMargin
  }
}
