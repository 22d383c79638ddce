package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NumFns.round6
import graft.ops.PageRank

/** Graph-analytics rows over graphs derived from the synthetic tables —
  * the iterative-algorithm pillar beside d07's connected components
  * (clustering) : PageRank (ranking). In a corpus pipeline this is the
  * centrality score over a document-similarity or host-link graph that
  * quality/dedup stages weight by (e.g. keep the most-central member of
  * a near-dup cluster instead of min-id).
  */
object GraphQueries {

  /** Customer–supplier trade graph: an undirected edge when a customer's
    * order contains a supplier's line item. Node encoding keeps both id
    * spaces in one long key: customers even (2k), suppliers odd (2k+1).
    */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()
    pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(pairs.select(col("sp").as("src"), col("c").as("dst")))
  }

  private val Iters = 5
  private val Scale = 1000000000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank over the customer–supplier trade graph — 5 fixed-point
    // integer iterations (ops.PageRank's bit-exact contract; the DuckDB
    // oracle replays the same layers as unrolled CTEs). The bipartite
    // shape concentrates rank on high-degree suppliers: the top of this
    // list is "who is most central to trade", the graph twin of q04's
    // revenue ranking. Scale shape: the edge list is persisted
    // src-partitioned once; each iteration moves only the node-count
    // rank frame (equi-joins + one long-sum groupBy per round) — the
    // canonical iterative-shuffle pattern, O(1) plan size via per-round
    // lineage truncation.
    "g01_pagerank" -> { (s, dir) =>
      PageRank.run(tradeEdges(s, dir), Iters, Scale)
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
            .as("node_type"),
          expr("node div 2").as("node_id"),
          col("rank"),
          round6(col("rank").cast("double") / lit(Scale.toDouble)).as("rank_f"))
        .orderBy(desc("rank"), col("node_type"), col("node_id"))
        .limit(25)
    })

  private val tradeEdgesSql =
    """SELECT c AS src, sp AS dst FROM tpairs
      |  UNION ALL SELECT sp AS src, c AS dst FROM tpairs""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // tpairs materializes the distinct bipartite pairs once; the
    // PageRank layers come from ops.PageRank.sqlCtes — the same
    // constants the Spark side iterates with
    "g01_pagerank" ->
      s"""WITH tpairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |${PageRank.sqlCtes(tradeEdgesSql, Iters, Scale)}
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  node // 2 AS node_id, rank,
         |  floor((CAST(rank AS DOUBLE) / ${Scale.toDouble}) * 1000000.0 + 0.5) / 1000000.0 AS rank_f
         |FROM pr
         |ORDER BY rank DESC, node_type, node_id
         |LIMIT 25""".stripMargin)
}
