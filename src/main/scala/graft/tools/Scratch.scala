package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Ad-hoc plan inspection scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    val base = Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")

    def attempt(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      try { f.collect(); println(s"[scratch] $label OK") }
      catch { case e: Throwable => println(s"[scratch] $label FAIL: ${e.getMessage.take(120)}") }

    attempt("plain rollup no sort")(base.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt")))
    attempt("alias-fresh rollup")(
      base.select(col("r_name").as("rn"), col("n_name").as("nn"))
        .rollup("rn", "nn").agg(count(lit(1)).as("cnt")))
    attempt("toDF-fresh rollup")(
      base.toDF("rn", "nn").rollup("rn", "nn").agg(count(lit(1)).as("cnt"))
        .orderBy(col("rn").asc_nulls_first, col("nn").asc_nulls_first))
    val noB = Tables(s, dir, "customer")
      .join(Tables(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
    attempt("no-broadcast rollup")(noB.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt")))
    attempt("single-table rollup")(
      Tables(s, dir, "nation").rollup("n_name", "n_regionkey").agg(count(lit(1)).as("cnt")))
    attempt("cube no-broadcast")(noB.cube("r_name", "n_name").agg(count(lit(1)).as("cnt")))
    attempt("rollup + col sort")(base.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first))
    attempt("rollup + toDF + sort")(base.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt"))
      .toDF("r_name", "n_name", "cnt")
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first))
    attempt("rollup + expr sort")(base.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt"))
      .sort(expr("r_name ASC NULLS FIRST"), expr("n_name ASC NULLS FIRST")))
    attempt("groupingsets via sql-ish: grouping_id")(
      base.rollup("r_name", "n_name").agg(count(lit(1)).as("cnt"), grouping_id().as("gid")))
    spark.stop()
  }
}
