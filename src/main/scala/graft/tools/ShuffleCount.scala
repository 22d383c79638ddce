package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkEntry

/** Print the static shuffle-exchange count of every query's physical
  * plan (pre-AQE) — the numbers PlanBudgetSpec pins.
  */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // exchanges are inserted by EnsureRequirements during plan
        // preparation, so count on executedPlan (string form: AQE wraps
        // the tree and hides children from collect())
        val planStr = fn(spark, dir).queryExecution.executedPlan.toString
        val n = raw"(^|[\s\-:+])Exchange ".r.findAllIn(planStr).size
        println(s"[shuffles] $name $n")
      } catch {
        case e: Throwable => println(s"[shuffles] $name ERR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
