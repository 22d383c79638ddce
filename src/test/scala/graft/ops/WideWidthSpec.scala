package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wide-presentation stress at REFERENCE widths (SURVEY §7.4.1 names
  * thousand-column plans as the known scale risk; the engine's answer is
  * long-format-internally, wide only at the presentation edge — this
  * spec pins that the edge itself stays healthy at the widths the
  * reference actually serves):
  *   - the 936-column tcga metadata surface (4-file inner join,
  *     reference: tests/test_accessor.py:33, accessor.py:491-499);
  *   - a 100-sample counts pivot (reference serves ~49 samples,
  *     test_accessor.py:192; we pin double that).
  * Pinned: result width, analysis+planning wall time, physical plan
  * size, and that the join stays broadcast (no shuffle of the wide
  * frames). Bounds are deliberately loose (the host's CPU delivery is
  * erratic) — they exist to catch the failure mode where width makes
  * planning super-linear (minutes / unbounded plan strings), not to
  * benchmark.
  */
class WideWidthSpec extends SparkSpec {

  private val Key = graft.model.Model.MetadataJoinKey // rail_id, external_id, study

  /** One per-project metadata frame: the composite key + `cols` payload
    * columns, 200 rows, all generated columnar (no driver loops).
    */
  private def metaFrame(tag: String, cols: Int): DataFrame = {
    val base = spark.range(200)
      .select(col("id").as("rail_id"),
        concat(lit("ext"), col("id")).as("external_id"),
        lit("TCGA").as("study"))
    val payload = (0 until cols).map(j => (col("rail_id") * 31 + j).as(s"${tag}_c$j"))
    base.select((Key.map(col) ++ payload): _*)
  }

  test("936-column metadata join: planning stays linear at reference width") {
    // 3 key cols + 4 x 233 payload cols + zero overlap = 935 ~ the 936-col
    // tcga metadata table
    val frames = (0 until 4).map(i => metaFrame(s"m$i", 233))
    val t0 = System.nanoTime()
    val joined = Ops.innerJoinAll(frames, Key)
    val plan = joined.queryExecution.executedPlan
    val analysisSec = (System.nanoTime() - t0) / 1e9
    assert(joined.columns.length == 3 + 4 * 233,
      s"width: ${joined.columns.length}")
    assert(analysisSec < 90.0,
      f"analysis+planning took $analysisSec%.1f s at width 935 — super-linear blowup")
    val planStr = plan.toString
    assert(planStr.length < 4_000_000,
      s"physical plan string is ${planStr.length} chars at width 935")
    assert(!planStr.contains("SortMergeJoin"),
      "small per-project metadata frames must broadcast, not shuffle-sort")
    // the wide result is real, not just plannable
    val rows = joined.count()
    assert(rows == 200L, s"inner join on aligned keys keeps all rows: $rows")
  }

  test("100-sample counts pivot: the presentation edge at 2x reference width") {
    val samples = (0 until 100).map(i => s"s$i")
    val long = spark.range(2000L * 100)
      .select((col("id") / 100).cast("long").as("feature_id"),
        concat(lit("s"), pmod(col("id"), lit(100))).as("external_id"),
        (pmod(col("id"), lit(997)) + 1).cast("double").as("value"))
    val t0 = System.nanoTime()
    val wide = Ops.pivotWide(long, "feature_id", "external_id", "value", samples)
    val plan = wide.queryExecution.executedPlan.toString
    val analysisSec = (System.nanoTime() - t0) / 1e9
    assert(wide.columns.length == 101, s"width: ${wide.columns.length}")
    assert(analysisSec < 90.0,
      f"pivot planning took $analysisSec%.1f s at 100 columns")
    assert(plan.length < 2_000_000, s"pivot plan string is ${plan.length} chars")
    assert(wide.count() == 2000L)
    // spot value: feature 0, sample s7 holds value (0*100+7) % 997 + 1 = 8
    val r = wide.filter(col("feature_id") === 0).select("s7").collect()
    assert(r.head.getDouble(0) == 8.0)
  }
}
