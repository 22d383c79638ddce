package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val q = args.headOption.getOrElse("s03_ivf_topk")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      if (q == "km") {
        graft.queries.Quantizer.evict(spark, dir)
        val c0 = System.nanoTime()
        graft.queries.Quantizer.centroids(spark, dir)
        println(f"[scratch]   km/fit: ${(System.nanoTime() - c0) / 1e9}%.2f s")
        val a0 = System.nanoTime()
        graft.queries.Quantizer.assignments(spark, dir)
        println(f"[scratch]   km/assign: ${(System.nanoTime() - a0) / 1e9}%.2f s")
      } else if (q == "d00") {
        graft.queries.DedupQueries.evict(spark, dir)
        graft.queries.Quantizer.evict(spark, dir)
        graft.queries.DedupQueries.prewarmParts(spark, dir).foreach {
          case (part, body) =>
            val p0 = System.nanoTime()
            body()
            println(f"[scratch]   d00/$part: ${(System.nanoTime() - p0) / 1e9}%.2f s")
        }
      } else SparkEntry.queries(q)(spark, dir).count()
      println(f"[scratch] $q run $i (local[$cpus]): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Console.flush()
    }
    spark.stop()
  }
}
