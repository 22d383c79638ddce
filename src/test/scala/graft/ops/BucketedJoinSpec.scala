package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing demonstration — the standing answer to "is there a shuffle
  * here that becomes the bottleneck at scale?" for REPEATED joins on
  * the same key: write both sides bucketed by the join key, and the
  * sort-merge join reads co-located buckets with NO exchange on either
  * side. At 100 TB this converts every recurring fact-dim or
  * fact-fact join on the bucket key from a full-corpus shuffle into a
  * local merge per bucket.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without an exchange") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(k => spark.conf.set(k, "-1")) // force SMJ, not broadcast
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.range(10000)
        .select(col("id").as("o_key"), (col("id") % 97).as("o_val"))
        .write.bucketBy(8, "o_key").sortBy("o_key").saveAsTable("b_orders")
      spark.range(30000)
        .select((col("id") % 10000).as("o_key"), col("id").as("l_val"))
        .write.bucketBy(8, "o_key").sortBy("o_key").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_key")
        .groupBy("o_val").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the agg
      assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(o_key"),
        s"expected NO shuffle on the bucketed join key; plan:\n$plan")

      // sanity: the same join over unbucketed data DOES shuffle both sides
      val flat = spark.range(10000)
        .select(col("id").as("o_key"), (col("id") % 97).as("o_val"))
        .join(spark.range(30000).select((col("id") % 10000).as("o_key"),
          col("id").as("l_val")), "o_key")
      flat.collect()
      assert(flat.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(o_key"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
