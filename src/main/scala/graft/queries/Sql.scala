package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the synthetic tables as temp views so the whole
  * engine is reachable via `spark.sql(...)` as well as the DataFrame API.
  */
object Sql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Create or replace one temp view per table over `dir`. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Convenience: register + run. */
  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(sql)
  }
}
