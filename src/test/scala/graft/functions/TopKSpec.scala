package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.functions.TopK.Entry

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("reduce keeps a bounded buffer ordered by (value desc, id asc)") {
    val agg = new TopK.ByValueDesc(3)
    val buf = Seq(Entry(9, 1), Entry(5, 2), Entry(5, 7), Entry(1, 3), Entry(5, 0), Entry(9, 9))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(Entry(9, 1), Entry(9, 9), Entry(5, 0)))
  }

  test("merge of partial buffers equals top-k of the union") {
    val agg = new TopK.ByValueDesc(2)
    val b1 = Seq(Entry(7, 1), Entry(3, 2))
    val b2 = Seq(Entry(8, 5), Entry(7, 0))
    assert(agg.merge(b1, b2) == Seq(Entry(8, 5), Entry(7, 0)))
    assert(agg.merge(agg.zero, b1) == b1)
  }

  test("udaf end-to-end matches the window-function top-k") {
    val df = spark.range(2000)
      .select((F.col("id") % 7).cast("string").as("g"),
        (F.col("id") * 37 % 1000).cast("double").as("v"),
        F.col("id"))
    val topk = F.udaf(new TopK.ByValueDesc(5), Encoders.product[Entry])
    val viaAgg = df.groupBy("g")
      .agg(topk(F.col("v"), F.col("id")).as("top"))
      .select(F.col("g"), F.explode(F.col("top")).as("t"))
      .select(F.col("g"), F.col("t.value"), F.col("t.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = Window.partitionBy("g").orderBy(F.desc("v"), F.col("id"))
    val viaWindow = df.withColumn("rn", F.row_number().over(w))
      .filter(F.col("rn") <= 5)
      .select("g", "v", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }
}
