package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Cross-RUN exact dedup: deduplicate an arriving batch against a
  * persisted content-hash index, then fold the surviving hashes back
  * into the index — the "daily increment vs corpus" shape every
  * continuously-ingesting corpus pipeline runs (d01 is the one-shot
  * twin; Streaming.dedupStream the within-watermark twin — this is the
  * tier whose memory of the past is UNBOUNDED because it lives in
  * storage, not state).
  *
  * Semantics per batch: (1) within-batch collapse — keeper = row with
  * the smallest `idCol` per sha2(content) (d01's min-struct rule, no
  * window); (2) cross-run drop — anti-join against the index, so
  * anything ever kept before is dropped now; (3) the survivors' hashes
  * append to the index atomically AFTER materialization (the survivor
  * frame is localCheckpoint'ed first — its plan reads the index, so
  * appending before materializing would let a re-run of the plan see
  * the batch's own hashes and self-exclude).
  *
  * Scale shape: one batch-sized shuffle on the content hash (the
  * groupBy), then a hash-keyed anti-join — batch-sized probe against
  * an index-sized build. At 100 TB the index side dominates; the
  * standard mitigations compose with this operator unchanged: bucket
  * the index parquet by `__h` so the anti-join co-locates, and/or
  * prefilter the probe with a Bloom bitset of the index
  * ([[graft.expressions.BloomAgg]]) so only possible-duplicates reach
  * the join (no false negatives = no lost duplicates).
  */
object IncrementalDedup {

  /** Process one batch; returns the surviving rows (batch schema
    * unchanged) and appends their hashes to `indexPath`.
    */
  def process(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String): DataFrame = {
    val ss = batch.sparkSession
    val others = batch.columns.filterNot(_ == idCol)
    val hashed = batch.withColumn("__h", sha2(col(textCol).cast(StringType), 256))
    // keeper per in-batch hash: min over (id, rest...) structs — same
    // shuffle carries the multiplicity if a caller ever wants it
    val keeper = hashed
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol) +: others.map(col): _*)).as("r"))
      .select(col("__h") +: batch.columns.map(c => col(s"r.$c").as(c)): _*)
    val fresh = readIndex(ss, indexPath) match {
      case Some(known) => keeper.join(known, Seq("__h"), "left_anti")
      case None => keeper
    }
    // materialize BEFORE the index append (see scaladoc)
    val survivors = fresh.localCheckpoint()
    survivors.select("__h").write.mode("append").parquet(indexPath)
    survivors.drop("__h")
  }

  private def readIndex(ss: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(indexPath)
    val fs = path.getFileSystem(ss.sessionState.newHadoopConf())
    if (fs.exists(path)) Some(ss.read.parquet(indexPath)) else None
  }
}
