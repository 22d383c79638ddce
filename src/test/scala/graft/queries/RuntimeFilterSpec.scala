package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Spark's runtime bloom-filter injection on the shapes this
  * library's joins take at scale: a selective predicate on one join leg
  * builds a bloom filter that is pushed into the OTHER leg's scan, so
  * the fact side drops non-matching rows before the shuffle. At 100 TB
  * this (plus AQE) is the difference between shuffling the whole fact
  * table and shuffling the ~matching slice; the spec documents the confs
  * that make it fire and guards against a refactor that breaks the
  * joins' eligibility (e.g. wrapping join keys in expressions).
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects might_contain into the fact leg") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local test tables are tiny; drop the size gates so the rewrite
      // fires on them the way it would on a 100 TB fact table
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: broadcast legs don't need runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = Tables(spark, dir, "lineitem")
      val orders = Tables(spark, dir, "orders")
        .filter(col("o_totalprice") > 400000.0) // selective creation side
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter in the optimized plan:\n${optimized.take(3000)}")
      // and the rewrite does not change the answer
      val withFilter = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val without = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      }
      assert(withFilter == without)
    }
  }
}
