package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Robustness (this host's CPU delivery is erratic — measured 100+ s
  * transient stalls on randomly different queries run-to-run):
  *   - a warm-up pass (table scans + every query once at sf0.001) is
  *     excluded, so timings measure execution, not first-touch JVM/
  *     codegen/Hadoop-client initialization;
  *   - each query is timed over N=3 passes; the reported number is the
  *     min (steady-state execution), with the max-min spread published
  *     alongside so a stall is visible instead of silently inflating;
  *   - a failing query is reported in an "errors" map (name -> message)
  *     and EXCLUDED from the total — never silently timed as a success;
  *   - the shared dedup sub-results (minhash signatures, LSH candidates,
  *     shingle sets) are built once and timed as their own
  *     "d00_dedup_prelude" entry, so d02/d03/d05 measure their own joins
  *     rather than whichever ran first absorbing the shared build.
  */
object Bench {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val Passes = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table (footer + first-read paths), then run
    // every query once at the smallest scale factor — this compiles and
    // JITs each query's codegen without touching target-SF data.
    tables.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    // drop warm-up state: evict the dedup memo FIRST (clearCache alone
    // unpersists the frames but the memo would keep re-serving them,
    // re-materializing without the intended one-time count)
    graft.queries.DedupQueries.evictAll(spark)
    spark.catalog.clearCache()
    System.gc()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    def timedOnce(name: String, body: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          System.err.println(s"[bench] FAIL $name: $msg")
          errors(name) = msg
          None
      }
    }
    // N passes; min = steady state, spread = max-min (host-stall visibility).
    // Adaptive retries: when even the min is slow AND the passes disagree
    // wildly (the signature of landing in one of this host's multi-minute
    // degradation windows, not of a genuinely slow query), grant up to 2
    // extra passes — a later pass outside the window recovers the real
    // number. A consistently-slow query (small spread) gets no retries.
    def timed(name: String, body: => Unit): Option[(Double, Double)] = {
      var ts = (1 to Passes).flatMap(_ => timedOnce(name, body))
      var extra = 0
      while (ts.nonEmpty && extra < 2 && ts.min > 5.0 && (ts.max - ts.min) > ts.min) {
        System.err.println(f"[bench] retry $name: min ${ts.min}%.2fs spread ${ts.max - ts.min}%.2fs")
        ts = ts ++ timedOnce(name, body)
        extra += 1
      }
      if (ts.isEmpty) None else Some((ts.min, ts.max - ts.min))
    }

    // shared dedup prelude: timed as its own entry. Later prewarm calls
    // hit the persisted frames, so a plain min-of-N would hide the build;
    // instead the build runs twice WITH an eviction in between (two real
    // builds) and reports min + spread — a single-sample number was
    // swinging 2x run-to-run purely on host stalls. The prelude gets the
    // SAME adaptive retries as queries (observed: both initial builds
    // landing inside one multi-minute degradation window, min 22 s vs
    // the 3-4 s steady state) — each retry re-evicts so every sample is
    // a real build. The last build's frames stay persisted for the
    // d-queries.
    val prelude = {
      def build(): Option[Double] = {
        graft.queries.DedupQueries.evict(spark, sfDir)
        timedOnce("d00_dedup_prelude",
          graft.queries.DedupQueries.prewarm(spark, sfDir))
      }
      var ts = Seq(build(), build()).flatten
      var extra = 0
      while (ts.nonEmpty && extra < 2 && ts.min > 5.0 && (ts.max - ts.min) > ts.min) {
        System.err.println(f"[bench] retry d00_dedup_prelude: min ${ts.min}%.2fs spread ${ts.max - ts.min}%.2fs")
        ts = ts ++ build()
        extra += 1
      }
      if (ts.isEmpty) None else Some((ts.min, ts.max - ts.min))
    }

    val results: Seq[(String, (Double, Double))] =
      (prelude.map("d00_dedup_prelude" -> _).toSeq ++
        SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
          timed(name, fn(spark, sfDir).count()).map(name -> _)
        })

    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def f(d: Double): String = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = jmap(results.map { case (k, (mn, _)) => k -> f(mn) })
    val spread = jmap(results.map { case (k, (_, sp)) => k -> f(sp) })
    val errs = jmap(errors.toSeq.map { case (k, v) =>
      k -> ("\"" + v.replaceAll("[\\\\\"\\n\\r\\t]", " ") + "\"") })
    val total = results.map(_._2._1).sum
    val line = s"""{"metric":"total","value":${f(total)},"unit":"sec","passes":$Passes,""" +
      s""""queries":$qs,"spread":$spread,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: the driver parses stdout, but sbt may prefix it
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_local.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
