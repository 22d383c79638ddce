package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the measured static-exchange count for the named queries
  * under the PlanBudgetSpec environment (local[4], 4 shuffle
  * partitions, sf0.001) — the number a new row's budget pin comes
  * from. Usage: runMain graft.tools.BudgetProbe q1,q2,...
  */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq.empty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-budget-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"[budget] $n = ${ShuffleCount.count(plan)}")
    }
    spark.stop()
  }
}
