package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Model

/** File-format readers for the recount3 layout. All are lazy Spark scans
  * (gzip decompressed transparently; single-split per .gz file is fine —
  * files are per-project sized, and multi-file scans parallelize across
  * files, SURVEY §3.1.5).
  */
object Readers {

  /** Tab-separated scan with header, all columns Utf8 — mirrors
    * `infer_schema=None` (accessor.py:326, 441, 480). Spark's csv default
    * of inferSchema=false gives exactly all-string.
    */
  def tsvAllString(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", true)
      .csv(paths: _*)

  /** Counts TSV: `##`-comment lines skipped, header, numeric sample
    * columns inferred (accessor.py:258-266). Projects to the feature-id
    * column + the requested samples when given (accessor.py:268-278);
    * a requested sample missing from the file is an error (KeyError
    * contract, accessor.py:275-277).
    */
  def countsRead(spark: SparkSession, path: String, samples: Seq[String] = Nil): DataFrame = {
    val raw = spark.read
      .option("sep", "\t")
      .option("header", true)
      .option("comment", "#")
      .option("inferSchema", true)
      .csv(path)
    // normalize integral columns to Int64 (polars' inference; also keeps
    // schemas union-compatible when files infer different int widths)
    val df = raw.select(raw.schema.fields.map { f =>
      if (f.dataType == IntegerType || f.dataType == ShortType)
        col(s"`${f.name}`").cast(LongType).as(f.name)
      else col(s"`${f.name}`")
    }.toIndexedSeq: _*)
    if (samples.isEmpty) df
    else {
      val firstCol = df.columns.head
      val missing = samples.toSet -- df.columns.toSet
      if (missing.nonEmpty)
        throw new NoSuchElementException(
          s"Missing columns in counts file: ${missing.toSeq.sorted.mkString(", ")}")
      df.select((firstCol +: samples).map(col): _*)
    }
  }

  private val gtfSchema = StructType(Seq(
    StructField("seqname", StringType),
    StructField("source", StringType),
    StructField("feature", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("score", StringType),
    StructField("strand", StringType),
    StructField("frame", StringType),
    StructField("attribute", StringType)))

  /** GTF scan: 9 fixed columns, tab-sep, `#` comments, no header
    * (accessor.py:210-225), then the 12 attribute fields extracted with
    * native regexp_extract expressions — the reference's only per-row
    * Python UDF (accessor.py:227-256) replaced by codegen'd expressions
    * returning "" on no-match, exactly like its else-branch.
    */
  def gtfRead(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read
      .schema(gtfSchema)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)
    Model.GtfFields.foldLeft(base) { (df, field) =>
      df.withColumn(field,
        regexp_extract(col("attribute"), field + " \"([^\"]*)\"", 1))
    }
  }

  /** ID-list scan: CSV with a `rail_id` column, values as strings
    * (accessor.py:419).
    */
  def idListRead(spark: SparkSession, path: String): List[String] =
    spark.read.option("header", true).csv(path)
      .select(col("rail_id").cast(StringType))
      .collect().map(_.getString(0)).toList

  /** MatrixMarket coordinate scan → LONG format (row, col, value), 1-based
    * indices, plus the declared (rows, cols, nnz) header. The reference
    * densifies immediately via scipy (accessor.py:431-432) — its de-facto
    * scalability ceiling; long format is the 100 TB-safe representation
    * (SURVEY §7.4.1), widened only at the presentation edge.
    *
    * Data goes through the v2 source (graft.io.MatrixMarketSource), so
    * the scan is a Catalyst-planned batch read with column pruning; the
    * header is a driver-side stream peek (no job).
    */
  def matrixMarketRead(spark: SparkSession, path: String): (DataFrame, Long, Long, Long) = {
    val (nRows, nCols, nnz) = MatrixMarketSource.readHeader(path)
    val data = spark.read.format("matrixmarket").load(path)
    (data, nRows, nCols, nnz)
  }
}
