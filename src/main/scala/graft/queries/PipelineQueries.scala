package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns._

/** Composed training-data-prep pipelines: the individual operators
  * (quality scoring t02, exact dedup d01, token counting t03) chained
  * the way a real corpus-cleaning job runs them. One oracle-checked
  * query so the COMPOSITION is pinned, not just the parts.
  *
  * Scale shape: quality scoring is pure per-row expressions fused into
  * the scan; dedup is the single content-hash shuffle; `min(struct)`
  * picks the keeper without a join-back or window. One scan, one
  * shuffle, end to end.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quality-filter -> exact-dedup(keep lowest doc_id) -> survivors
    // with their stats and duplicate multiplicity
    "p01_clean_corpus" -> { (s, dir) =>
      val toks = tokens(col("text"))
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          size(toks).cast(LongType).as("words"),
          (length(regexp_replace(col("text"), " ", "")).cast(DoubleType) /
            size(toks)).as("awl"),
          (stopwordHits(toks, StopEn).cast(DoubleType) / size(toks)).as("sr"))
        .withColumn("quality",
          round(lit(0.5) * least(col("words") / 100.0, lit(1.0)) +
            lit(0.3) * least(col("awl") / 8.0, lit(1.0)) +
            lit(0.2) * col("sr"), 6))
        .filter(col("quality") >= 0.5)
      scored
        .groupBy(sha2(col("text"), 256).as("h"))
        // duplicates share the text, hence identical stats; min(struct)
        // keeps the lowest-doc_id row in the same shuffle as the count
        .agg(min(struct(col("doc_id"), col("words"), col("quality"))).as("kept"),
          count(lit(1)).as("dups"))
        .select(col("kept.doc_id").as("doc_id"), col("kept.words").as("words"),
          col("kept.quality").as("quality"), col("dups"))
        .orderBy("doc_id")
    }
  )

  private def sqlHits(ws: Seq[String]): String =
    s"len(list_filter(t, x -> x IN (${ws.map(w => s"'$w'").mkString(", ")})))"

  val oracleSql: Map[String, String] = Map(
    "p01_clean_corpus" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |    CAST(len(t) AS BIGINT) AS words,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(t) AS awl,
         |    CAST(${sqlHits(StopEn)} AS DOUBLE) / len(t) AS sr
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
         |q AS (
         |  SELECT doc_id, text, words,
         |    round(0.5 * least(words / 100.0, 1.0) + 0.3 * least(awl / 8.0, 1.0) + 0.2 * sr, 6) AS quality
         |  FROM f)
         |SELECT min(doc_id) AS doc_id, min(words) AS words,
         |  min(quality) AS quality, count(*) AS dups
         |FROM q WHERE quality >= 0.5
         |GROUP BY sha256(text) ORDER BY doc_id""".stripMargin
  )
}
