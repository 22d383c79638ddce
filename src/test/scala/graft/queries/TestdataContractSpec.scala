package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Canary for the testdata contracts the engine builds on. The r04
  * regression (events.ts silently switching parquet encodings under a
  * testdata regeneration) showed these assumptions fail as 13 cryptic
  * analysis errors scattered across the suite; this spec turns each
  * assumption into ONE named failure pointing at what to adapt.
  *
  * Guarded contracts:
  *   - events.ts normalizes to epoch-nanos BIGINT (Tables.normalizeTs —
  *     the adaptive path TsEncodingSpec exercises in depth);
  *   - embeddings.embedding is a 64-float vector (VecFns.LshDim and
  *     every hyperplane/codebook literal in the oracle SQL assume it);
  *   - documents.text is ASCII (FingerprintExpr, CdcCutsExpr, and the
  *     DuckDB ord()/byte mirrors equate bytes with code points);
  *   - lineitem.l_quantity is an integer-valued double (x20 casts it to
  *     BIGINT for the MatrixMarket junction matrix).
  */
class TestdataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events: ts reaches queries as epoch-nanos bigint") {
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == LongType,
      "Tables.normalizeTs must surface ts as nanos BIGINT — a new parquet " +
        "encoding needs a branch in graft.queries.Tables")
    for (c <- Seq("event_id", "user_id", "event_type", "value"))
      assert(ev.columns.contains(c), s"events lost column $c")
  }

  test("embeddings: 64-dim float vectors with vec_id/label") {
    val em = Tables(spark, dir, "embeddings")
    for (c <- Seq("vec_id", "label", "embedding"))
      assert(em.columns.contains(c), s"embeddings lost column $c")
    val dims = em.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(graft.functions.VecFns.LshDim),
      s"embedding dim changed to $dims — update VecFns.LshDim and every " +
        "oracle hyperplane/codebook literal derived from it")
  }

  test("documents: ASCII text contract") {
    val docs = Tables(spark, dir, "documents")
    for (c <- Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(docs.columns.contains(c), s"documents lost column $c")
    val nonAscii = docs
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text — the byte==codepoint " +
        "contract behind graft_fingerprint/graft_cdc_cuts and their DuckDB " +
        "mirrors no longer holds")
  }

  test("lineitem: l_quantity is integer-valued") {
    val bad = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") =!= floor(col("l_quantity"))).count()
    assert(bad == 0L,
      s"$bad lineitem rows have fractional l_quantity — x20's BIGINT " +
        "junction values would truncate")
  }
}
