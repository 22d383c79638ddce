package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns._
import graft.queries.Tables

/** Ad-hoc profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val wholeStage = sys.env.getOrElse("SCRATCH_CODEGEN", "true")
    val aqe = sys.env.getOrElse("SCRATCH_AQE", "true")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.codegen.wholeStage", wholeStage)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Console.flush(); r
    }

    def candBuild(): DataFrame = {
      val aLit = lit(MinhashA)
      val bLit = lit(MinhashB)
      val sig = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(grams3(tokens(col("text"))))).as("g"))
        .select(col("doc_id"), (h60(col("g")) % MinhashP).as("hm"))
        .select(col("doc_id"), col("hm"), explode(sequence(lit(0), lit(MinhashK - 1))).as("k"))
        .select(col("doc_id"), col("k"),
          ((element_at(aLit, col("k") + 1) * col("hm") + element_at(bLit, col("k") + 1)) % MinhashP).as("h"))
        .groupBy("doc_id", "k")
        .agg(min(col("h")).as("v"))
      val bsig = sig.withColumn("band", (col("k") / 4).cast("int"))
        .groupBy(col("doc_id"), col("band"))
        .agg(array_join(transform(array_sort(collect_list(struct(col("k"), col("v")))),
          x => x.getField("v").cast("string")), ",").as("bs"))
      val small = bsig.groupBy("band", "bs").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= 64)
      val pruned = bsig.join(small, Seq("band", "bs"))
      pruned.as("l").join(pruned.as("r"),
          col("l.band") === col("r.band") && col("l.bs") === col("r.bs") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
    }

    for (i <- 1 to 5) time(s"cand build $i (codegen=$wholeStage aqe=$aqe)")(candBuild().count())
    spark.stop()
  }
}
