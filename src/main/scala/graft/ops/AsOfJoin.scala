package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed as-of join — an operator Spark lacks natively (DuckDB/kdb
  * ASOF JOIN; Flink temporal join). For each probe row, attach the
  * latest build row with the same key and `build.ts <= probe.ts`
  * (inclusive), or nulls when none exists (left semantics).
  *
  * Scale shape: NOT a per-probe range lookup (quadratic in hot keys) and
  * NOT a range-bucketed join (needs tuning + duplicate handling) — both
  * sides are tagged and unioned, then ONE window over (key, ts, side)
  * carries the last build row forward. One shuffle on the key, linear
  * in |probe| + |build|, skew-bounded by per-key cardinality exactly
  * like any keyed window. Build rows sort before probe rows at equal ts,
  * giving the inclusive `>=` the ASOF convention expects.
  *
  * The build side must be unique per (key, ts) — pre-aggregate if not —
  * so the "latest" row is well-defined.
  */
object AsOfJoin {

  /** @param probe  left side: one output row per probe row
    * @param build  right side, unique per (key, ts): columns to attach
    * @param key    equi-join key column present on both sides
    * @param ts     event-time column (any orderable numeric) on both sides
    * @param attach build columns carried onto matching probe rows
    *               (emitted as `matched_<name>`, null when no build row
    *               is at or before the probe)
    */
  def asOf(probe: DataFrame, build: DataFrame, key: String, ts: String,
      attach: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val tagged = probe
      .withColumn("__side", lit(1))
      .select((probeCols.map(col) :+ col("__side")) ++
        attach.map(a => lit(null).cast(build.schema(a).dataType).as(a)): _*)
      .unionByName(build
        .withColumn("__side", lit(0))
        .select((Seq(col(key), col(ts), col("__side")) ++ attach.map(col)): _*),
        allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest build row as ONE struct: per-column carries with
    // ignoreNulls would backfill a genuinely-NULL field of the latest
    // build row from an older row (per-column time drift); the struct is
    // non-null exactly when a build row exists, whatever its fields hold
    // — and one carried column means one window pass however many
    // columns are attached
    val carried = tagged.withColumn("__m",
      last(when(col("__side") === 0, struct(attach.map(col): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        attach.map(a => col("__m").getField(a).as(s"matched_$a")): _*)
  }
}
