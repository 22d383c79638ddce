package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** 10k-row fact, 90% on one hot key — the distribution that funnels a
    * plain shuffle join through one reducer.
    */
  private lazy val skewedFact = spark.range(10000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 97).cast("string"))).as("key"),
      (col("id") % 1000).cast("double").as("v"))

  private lazy val dim = skewedFact.select("key").distinct()
    .withColumn("weight", length(col("key")).cast("double"))

  test("salted join returns exactly the naive join's rows") {
    val naive = skewedFact.join(dim, "key")
      .select("key", "id", "v", "weight")
    val salted = SkewJoin.saltedJoin(skewedFact, dim, "key", 8, col("id"))
      .select("key", "id", "v", "weight")
    assert(salted.count() == naive.count())
    assert(salted.exceptAll(naive).isEmpty && naive.exceptAll(salted).isEmpty)
  }

  test("salted join shuffles on (key, salt), not key alone") {
    val salted = SkewJoin.saltedJoin(skewedFact, dim, "key", 8, col("id"))
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"),
      s"expected the salt column in the shuffle partitioning; plan:\n$plan")
  }

  test("AQE skew handling splits the oversized partition at runtime") {
    // mid-size x mid-size so neither side broadcasts; thresholds tiny so
    // the hot partition qualifies as skewed on local data
    val left = spark.range(50000)
      .select((col("id") % 5).as("k"), col("id").as("lv"))
    val right = spark.range(5000)
      .select((col("id") % 5).as("k"), col("id").as("rv"))
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      SkewJoin.withAqeSkewHandling(spark, thresholdBytes = 1024, skewFactor = 1.0) {
        // aggregate on a DIFFERENT key than the join: OptimizeSkewedJoin
        // declines to split when the next stage reuses the join's
        // partitioning (splitting would force an extra shuffle)
        val joined = left.join(right, "k")
          .groupBy(pmod(col("lv"), lit(97)).as("g")).agg(count(lit(1)).as("n"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"expected AQE to mark the join skewed; plan:\n$plan")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
