package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Plan-shape guards for the full query surface — the properties that
  * decide whether a plan survives a 100× scale-up, asserted so a
  * refactor can't silently regress them:
  *   - no accidental cross joins: only the documented all-pairs
  *     baselines (s01/d06 — and d02/d05 whose candidate verify joins
  *     on the broadcast candidate list) may plan nested-loop/cartesian
  *     joins;
  *   - predicate pushdown reaches the parquet scan where a filter
  *     exists (q01's isin filter);
  *   - column pruning reaches the scan: a 2-column projection query
  *     never reads the full lineitem schema.
  */
class PlanHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // All-pairs / broadcast-nested-loop by documented design:
  //   s01      - oracle-checkable brute-force baseline (scale paths
  //              are s02/s03)
  //   d06      - the EXACT near-dup spec is all-pairs by definition
  //              (restored in r05: r04's label-confinement dropped ~90%
  //              of true pairs — ADVICE r04; at 100 TB this runs on
  //              samples/partitions, and d15 measures what any blocked
  //              path trades away)
  //   d15      - blocking-quality sweep: candidate joins are EQUI on
  //              (config, band, bucket); the theta join is its exact
  //              reference side (the d06 baseline at sample scale)
  //   d17      - d15's threshold sweep: same memoized proposal/exact
  //              frames, plus a 3-ROW broadcast threshold literal
  //              cross-joined for scoring (the d12/p14 tiny-build shape)
  //   d02/d05  - exact verification over the broadcast LSH candidate
  //              list (propose-then-verify; the list is tiny)
  //   x11      - range-predicate join pieces inside the salted demo
  //   s03      - IVF probe: queries crossJoin(broadcast(centroids)),
  //              the tiny coarse-quantizer table
  //   s04      - SQ8 candidate stage: broadcast 10-query probe scanned
  //              against the quantized codes (the compression tier IS a
  //              full-scan-over-codes design; pruning tiers are s02/s03)
  //   s06      - recall evaluation composes s01 (the documented
  //              brute-force baseline) as its exact side
  //   p14      - scalar-subquery shape: the corpus cross-joins the
  //              broadcast 1-ROW bloom-bitset frame (8 KB binary) —
  //              a BNLJ with a single build row by construction
  //   d12      - same 1-row-build shape: per-config stats cross-join
  //              the broadcast 1-ROW reference-count frame
  //   s09      - composes s01/s03/s05 (their documented shapes above)
  //              as the exact probe + approximate tiers it evaluates
  //   d13      - keep-list cross-joins the broadcast 1-ROW chosen-config
  //              frame (the d12/p14 single-build-row shape)
  private val nestedLoopByDesign =
    Set("s01_cosine_topk", "d06_embed_neardup", "d15_blocking_eval",
      "d17_threshold_sweep",
      "d02_minhash_pairs",
      "d05_ngram_jaccard", "d18_containment", // d05's shape, containment scoring
      "d19_central_keeper", // composes d05's verified pairs (same shape)
      "d25_dedup_funnel", // composes d05's verified pairs (same shape)
      "d23_split_leakage", // composes d05's verified pairs (same shape)
      "d03_minhash_lsh", "x11_skew_salted_join",
      "s03_ivf_topk", "s04_sq8_topk", "s06_lsh_recall", "s07_ivf_recall",
      "s10_ivf_nprobe", // centroid probe + composed s01 exact side (s03/s06 shapes)
      "s08_pq_recall", "p14_bloom_decontam", "d12_lsh_tuning",
      "s21_range_recall", // s06's shape: brute exact radius side (s01)
      "s22_recall_curve", // s06's shape: brute exact top-10 side (s01)
                          // + the 1-row nq frame
      "t23_trigram_langid", // model totals/defaults: two 1-ROW broadcast
                            // frames cross-joined (the t18/p24 shape)
      "x35_kmv_overlap", // pairwise sketch compare: non-equi (a < b) join
                         // on the DIMENSION-sized per-source sketch frame
                         // (64 longs/row); the corpus crossed one bounded
                         // aggregate before it
      "s09_ann_mrr", "d13_auto_dedup",
      "t18_pmi_collocations", // corpus totals: two 1-ROW broadcast frames
      "p24_pps_sample", // corpus total weight: one 1-ROW broadcast frame
      "x29_gap_fill", // day-grid bounds: one 1-ROW broadcast frame
      "x33_level_shift", // composes x29 live (single consumer, no
                         // checkpoint) — inherits its 1-row bounds frame
      // s11 - learned-IVF probe: queries crossJoin(broadcast(trained
      //       centroids)) + the 1-row centroid-fold inside the k-means
      //       assignment (the s03 probe shape over ops.KMeans output)
      // s12 - composes s01 (brute exact side) + s03 + s11
      // d16 - found/proposed/exact_total are three 1-row frames
      //       cross-joined for presentation (the d12/p14 shape); the
      //       exact side is the memoized d06 baseline
      // d11 - its within-cluster join is EQUI on cid; as first toucher
      //       of the quantizer memo its plan embeds the k-means build,
      //       whose assignment folds over a 1-ROW broadcast centroid
      //       list (BNLJ with a single build row by construction)
      "s11_kmeans_topk", "s12_quantizer_recall", "d16_blocking_compare",
      "d11_semdedup",
      // x23 - the p14/d12 single-build-row shape: the events scan and
      //       the 256-row histogram each cross-join a broadcast 1-ROW
      //       min/max frame (and the 3-row quantile frame) to fix the
      //       bin width — BNLJ with a constant-size build by design
      "x23_quantile_sketch",
      // x24 - the rule table cross-joins the broadcast 1-ROW basket
      //       total (the d12/p14 single-build-row shape)
      "x24_assoc_rules",
      // s13 - the s03 probe shape: queries crossJoin(broadcast(tiny
      //       centroid table))
      "s13_filtered_ann",
      // p21 - the 5-row funnel cross-joins the broadcast 1-ROW corpus
      //       total (the d12/p14 shape)
      "p21_filter_funnel",
      // s15 - the semantic leg cross-joins the broadcast 1-ROW query
      //       vector (the p14/d12 single-build-row shape); the lexical
      //       leg and the fusion join are equi/TakeOrdered
      "s15_rrf_hybrid",
      // s17 - recall evaluation composes s01 (the documented brute
      //       baseline) as its exact side, the s06 shape; s16 itself
      //       is bucket-equi and stays OUT of this set
      "s17_mplsh_recall",
      // s18 - the s03 coarse-probe shape: queries crossJoin(broadcast(
      //       tiny centroid table)); ADC + rerank stay equi
      "s18_ivfpq_topk",
      // p25 - corpus grand total: one 1-ROW broadcast frame (the p24
      //       shape)
      "p25_mix_fill",
      // t22 - corpus token total: one 1-ROW broadcast frame (the
      //       t18/p24 shape)
      "t22_source_kl")

  // run a real streaming query inside the builder — not a static plan
  private val excluded =
    Set("e05_stream_window", "e10_stream_session", "e11_stream_topk",
      "e13_stream_kmv", "e17_stream_join", "e19_stream_transitions",
      "e21_stream_anomaly",
      "p22_stream_cdc_dedup", "p23_stream_decontam",
      "d21_stream_sig_dedup", "e24_stream_outer_join",
      "e25_stream_full_outer_join", "e26_stream_right_outer_join",
      "e27_stream_static_enrich", "e28_stream_upsert", "e29_stream_funnel",
      "e30_stream_gaps", "e31_stream_hll", "e32_stream_shift",
      "e33_stream_asof", "e34_stream_asof_full", "s27_stream_ann_serve")

  test("no undocumented cartesian/nested-loop join in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if excluded(name) || nestedLoopByDesign(name) => None
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"undocumented non-equi join shapes in: ${offenders.mkString(", ")}")
  }

  test("q01's membership filter is pushed to the parquet scan") {
    val plan = SparkEntry.queries("q01_filter_isin")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In("),
      s"expected an In pushdown in the scan; plan:\n${plan.take(2000)}")
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:") &&
      !plan.contains("l_comment"),
      s"expected pruned ReadSchema; plan:\n${plan.take(2000)}")
  }
}
