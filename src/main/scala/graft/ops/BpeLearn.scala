package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the standard
  * subword-tokenizer trainer).
  *
  * Scale shape: ONE corpus-sized aggregate (word counts), then every
  * round iterates over the VOCABULARY — distinct words with counts —
  * never the corpus. At 100 TB the corpus pass is a single
  * shuffle-with-partial-agg; the loop's per-round work is
  * vocabulary-sized (pair stats = one small aggregate, argmax = a
  * 1-row limit, merge application = one string replace projection),
  * with a localCheckpoint per round truncating lineage (the d07/d13
  * iterative-plan discipline).
  *
  * Determinism: a word's segmentation is ONE STRING with every symbol
  * preceded by a single space (" l o w </w>"), so applying merge (L,R)
  * is literal `replace(seg, " L R", " LR")` — SQL replace scans left to
  * right over non-overlapping matches, which is EXACTLY BPE's greedy
  * application order, and both engines implement it identically; pair
  * counts are exact integers and the argmax tie-breaks (count desc,
  * left asc, right asc). The whole learner therefore replays exactly in
  * the DuckDB oracle as generated per-round CTE layers.
  */
object BpeLearn {

  /** One corpus-sized aggregate: whitespace-token counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: every char its own symbol, one leading space
    * each, end-of-word marker last.
    */
  private def segment(words: DataFrame): DataFrame =
    words.select(
      col("word"),
      concat(lit(" "),
        array_join(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))), " "),
        lit(" </w>")).as("seg"),
      col("cnt"))

  /** Learn up to `rounds` merges from (word, cnt). Returns
    * (rank, l, r, merged, pair_count) in learned order.
    */
  def learnMerges(words: DataFrame, rounds: Int): DataFrame = {
    val s: SparkSession = words.sparkSession
    import s.implicits._
    var vocab = segment(words).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    var round = 0
    while (!done && round < rounds) {
      round += 1
      val syms = filter(split(col("seg"), " "), x => x =!= "")
      val best = vocab
        .select(col("cnt"), explode(zip_with(
          slice(syms, lit(1), size(syms) - 1), slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("s"))
        .orderBy(desc("s"), col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((round.toLong, l, r, c))
        vocab = vocab.select(
          call_function("replace", col("seg"), lit(s" $l $r"), lit(s" $l$r")).as("seg"),
          col("cnt")).localCheckpoint()
      }
    }
    merges.toSeq.toDF("rank", "l", "r", "pair_count")
      .select(col("rank"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("pair_count"))
  }

  /** Tokenize words with a learned merge table: replay the merges in
    * rank order on the segmentation string (same replace semantics as
    * training), then split back into subword symbols.
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg = merges.foldLeft(col("seg")) { case (c, (l, r)) =>
      call_function("replace", c, lit(s" $l $r"), lit(s" $l$r"))
    }
    segment(words).select(col("word"), col("cnt"),
      filter(split(seg, " "), x => x =!= "").as("pieces"))
  }
}
