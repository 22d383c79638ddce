package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFns._

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (Array[Float], dim 64). Brute-force cosine top-k is the oracle-checkable
  * baseline; sign-LSH bucketing is the scale path (candidates share a
  * 2^8-bucket random-hyperplane signature, so the join is bucket-local
  * instead of all-pairs). Vectors are L2-normalized in a linear pre-pass
  * so every pairwise cosine is one dot product.
  */
object SimilarityQueries {

  private def vecsNorm(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), l2normalize(toDouble(col("embedding"))).as("e"))

  private def topk(q: DataFrame, c: DataFrame, joinCond: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("c"), col("neighbor_id"))
    q.join(c, joinCond)
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        dotSeq(col("q.e"), col("c.e")).as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("c"), 6).as("cos"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: 10 query vectors × full corpus. At scale
    // the (small) query side broadcasts and the corpus is scanned once.
    "s01_cosine_topk" -> { (s, dir) =>
      val v = vecsNorm(s, dir)
      val q = broadcast(v.filter(col("vec_id") < 10)).as("q")
      val c = v.as("c")
      topk(q, c, col("q.vec_id") =!= col("c.vec_id"))
    },

    // Sign-LSH bucketed top-k: bucket = 8-bit signature of hyperplane dot
    // signs; the candidate join is equi on bucket (shuffle-local) instead
    // of a cross product.
    "s02_lsh_topk" -> { (s, dir) =>
      val v = vecsNorm(s, dir).withColumn("bucket", lshBucket(col("e")))
      val q = v.filter(col("vec_id") < 10).as("q")
      val c = v.as("c")
      topk(q, c,
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
    }
  )

  val oracleSql: Map[String, String] = {
    val dqc = sqlDotSeq("q.e", "c.e")
    val norm = sqlL2Normalize("embedding::DOUBLE[]")
    val bucketExpr = (0 until LshPlanes).map { j =>
      val hp = sqlHyperplane(j)
      s"(CASE WHEN ${sqlDotSeq(hp, "e")} > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    Map(
      "s01_cosine_topk" ->
        s"""WITH v AS (SELECT vec_id, $norm AS e FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $dqc AS c
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
           |  FROM (SELECT vec_id, $norm AS e FROM embeddings)),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $dqc AS c
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
