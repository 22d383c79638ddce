package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFns._

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (Array[Float], dim 64). Brute-force cosine top-k is the oracle-checkable
  * baseline; sign-LSH bucketing is the scale path (candidates share a
  * 2^8-bucket random-hyperplane signature, so the join is bucket-local
  * instead of all-pairs).
  */
object SimilarityQueries {

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: 10 query vectors × full corpus, window
    // top-3. At scale this is the per-batch scoring pattern (queries
    // broadcast, corpus scanned once).
    "s01_cosine_topk" -> { (s, dir) =>
      val v = vecs(s, dir)
      val q = v.filter(col("vec_id") < 10).as("q")
      val c = v.as("c")
      val w = Window.partitionBy("query_id").orderBy(desc("c"), col("neighbor_id"))
      q.join(broadcast(c).hint("broadcast"), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          cosine(col("q.e"), col("c.e")).as("c"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("c"), 6).as("cos"))
        .orderBy("query_id", "rank")
    },

    // Sign-LSH bucketed top-k: bucket = 8-bit signature of hyperplane dot
    // signs; candidates restricted to the query's bucket.
    "s02_lsh_topk" -> { (s, dir) =>
      val v = vecs(s, dir).withColumn("bucket", lshBucket(col("e")))
      val q = v.filter(col("vec_id") < 10).as("q")
      val c = v.as("c")
      val w = Window.partitionBy("query_id").orderBy(desc("c"), col("neighbor_id"))
      q.join(c,
          col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          cosine(col("q.e"), col("c.e")).as("c"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("c"), 6).as("cos"))
        .orderBy("query_id", "rank")
    }
  )

  val oracleSql: Map[String, String] = {
    val dqc = sqlDotSeq("q.e", "c.e")
    val dqq = sqlDotSeq("q.e", "q.e")
    val dcc = sqlDotSeq("c.e", "c.e")
    val bucketExpr = (0 until LshPlanes).map { j =>
      val hp = sqlHyperplane(j)
      s"(CASE WHEN ${sqlDotSeq(hp, "e")} > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    Map(
      "s01_cosine_topk" ->
        s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         $dqc / sqrt(($dqq) * ($dcc)) AS c
           |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id, c,
           |         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, round(c, 6) AS cos
           |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
      "s02_lsh_topk" ->
        s"""WITH v AS (
           |  SELECT vec_id, e, $bucketExpr AS bucket
           |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         $dqc / sqrt(($dqq) * ($dcc)) AS c
           |  FROM v q JOIN v c
           |    ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id, c,
           |         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, round(c, 6) AS cos
           |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    )
  }
}
