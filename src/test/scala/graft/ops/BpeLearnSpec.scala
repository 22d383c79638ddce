package graft.ops

import graft.SparkSpec

/** BPE training pinned on a hand-derived corpus. "aaab" × 3:
  * seg " a a a b </w>" — pair counts (a,a)=6 [two per word, greedy
  * non-overlap counts BOTH adjacencies], (a,b)=3, (b,</w>)=3.
  *   round 1: (a,a) wins at 6 → " aa a b </w>" (LEFTMOST merge — the
  *            greedy-application property the string replace encodes)
  *   round 2: all pairs tie at 3 → lexicographic tie-break picks
  *            (a,b) → " aa ab </w>"
  *   round 3: (aa,ab) beats (ab,</w>) lexicographically → " aaab </w>"
  */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("learned merges match the hand-derived sequence, ties break lexicographically") {
    val words = Seq(("aaab", 3L)).toDF("word", "cnt")
    val got = BpeLearn.learnMerges(words, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 3L),
      (4L, "aaab", "</w>", "aaab</w>", 3L)))
  }

  test("applyMerges replays training segmentation on the training words") {
    val words = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "cnt")
    val merges = Seq(("a", "a"), ("a", "b"))
    val pieces = BpeLearn.applyMerges(words, merges)
      .select("pieces").collect()
      .map(r => r.getSeq[String](0).toList).toSet
    // "aaab" -> " aa ab </w>"; "ab" -> " ab </w>"
    assert(pieces == Set(List("aa", "ab", "</w>"), List("ab", "</w>")))
  }

  test("wordCounts: whitespace tokens, empties dropped") {
    val docs = Seq("a  b a", "b").toDF("text")
    val got = BpeLearn.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 2L))
  }
}
