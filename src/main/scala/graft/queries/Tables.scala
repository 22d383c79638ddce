package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver's synthetic parquet tables
  * (/root/repo/TESTDATA.md). One parquet file per table under the
  * scale-factor directory passed to each query.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as a nanos
      // bigint instead — exact, and immune to ns→us truncation drift vs
      // the DuckDB oracle (which keeps ns precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
