package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-matrix normalization (accessor.py:122-174). Both transforms
  * derive per-sample scalar scale factors from metadata, then multiply
  * count columns. Two shapes are provided:
  *   - *Wide: per-column multiply via a collected {sample -> sf} map —
  *     the reference's shape (fine: factors are per-sample scalars);
  *   - *Long: broadcast join against the long-format counts — the
  *     100 TB shape (SURVEY §7.4.1), no N-column projection rewrite.
  */
object Scale {

  /** RPKM-style scale factors (accessor.py:127-144):
    * sf = target * L * paired / (mapped_reads * avg_mapped_len^2), with
    * paired-end detection via round(avg_mapped_len / avg_read_len) == 2
    * (accessor.py:132-134).
    */
  def mappedReadsFactors(metadata: DataFrame, targetSize: Double, L: Long): DataFrame = {
    val mappedReads = col("`star.all_mapped_reads`").cast(DoubleType)
    val avgMappedLen = col("`star.average_mapped_length`").cast(DoubleType)
    val avgReadLen = col("avg_len").cast(DoubleType)
    val pairedFactor = when(round(avgMappedLen / avgReadLen, 0) === 2.0, 2).otherwise(1)
    metadata.select(
      col("external_id"),
      (lit(targetSize) * L * pairedFactor / (mappedReads * pow(avgMappedLen, 2))).as("sf"))
  }

  /** AUC scale factors: sf = target / auc (accessor.py:158-164). */
  def aucFactors(metadata: DataFrame, targetSize: Double): DataFrame =
    metadata.select(
      col("external_id"),
      (lit(targetSize) / col("`bc_auc.all_reads_all_bases`").cast(DoubleType)).as("sf"))

  private def factorMap(factors: DataFrame): Map[String, Double] =
    factors.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Wide-format mapped-reads scaling: every numeric column multiplied by
    * its sample's factor (accessor.py:146-153).
    */
  def scaleMappedReadsWide(counts: DataFrame, factors: DataFrame): DataFrame = {
    val sf = factorMap(factors)
    val cols: Seq[Column] = counts.schema.fields.toSeq.map { f =>
      if (f.dataType.isInstanceOf[NumericType] && sf.contains(f.name))
        (col(s"`${f.name}`") * sf(f.name)).as(f.name)
      else col(s"`${f.name}`")
    }
    counts.select(cols: _*)
  }

  /** Wide-format AUC scaling: every non-feature-id column multiplied,
    * rounded, cast Int64 (accessor.py:166-174).
    */
  def scaleAucWide(counts: DataFrame, factors: DataFrame, featureCol: String = "gene_id"): DataFrame = {
    val sf = factorMap(factors)
    val cols: Seq[Column] = counts.columns.toSeq.map { c =>
      if (c == featureCol || !sf.contains(c)) col(s"`$c`")
      else round(col(s"`$c`") * sf(c), 0).cast(LongType).as(c)
    }
    counts.select(cols: _*)
  }

  /** Long-format scaling: counts(feature_id, external_id, value) ⋈
    * broadcast(factors) — the shuffle-free scale path (J4b in SURVEY §2.3).
    */
  def scaleLong(countsLong: DataFrame, factors: DataFrame,
      roundToInt: Boolean = false): DataFrame = {
    val scaled = countsLong.join(broadcast(factors), "external_id")
    val v = col("value") * col("sf")
    scaled.select(
      countsLong.columns.filterNot(_ == "value").map(col) :+
        (if (roundToInt) round(v, 0).cast(LongType) else v).as("value"): _*)
  }
}
