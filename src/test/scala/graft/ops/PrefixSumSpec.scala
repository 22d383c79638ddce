package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-level distributed prefix sum must equal the single-window
  * reference on arbitrary inputs — range boundaries, sparse/duplicate-
  * free ids, weight zeros, and range widths that do and don't divide
  * the id span are the cases the oracle's two fixed scale factors can't
  * sweep.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("two-level offsets == naive single-window offsets (seeded fuzz)") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 5) {
      // sparse, shuffled, unique ids; weights include zeros
      val n = 200 + rnd.nextInt(300)
      val ids = rnd.shuffle((0L until 10000L).toList).take(n)
      val rows = ids.map(id => (id, rnd.nextInt(50).toLong))
      val df = rows.toDF("id", "w").repartition(7)
      val width = Seq(1L, 7L, 100L, 500L, 20000L)(trial % 5)
      val fast = PrefixSum.exclusiveOffsets(df, "id", "w", width)
        .select("id", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val slow = PrefixSum.naiveOffsets(df, "id", "w")
        .select("id", "off").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(fast == slow, s"trial $trial (width $width): offsets diverged")
    }
  }

  test("groupedOffsets == per-group single-window offsets (seeded fuzz)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(2027)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(300)
      // priorities collide across and within groups; ties break on id
      val rows = (1 to n).map { i =>
        (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(40).toLong,
          i.toLong, rnd.nextInt(50).toLong)
      }
      val df = rows.toDF("g", "pri", "id", "w").repartition(7)
      val width = Seq(1L, 3L, 8L, 100L)(trial % 4)
      val fast = PrefixSum.groupedOffsets(df, "g", "pri", "id", "w", width)
        .select("g", "id", "off").collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      val ww = Window.partitionBy("g").orderBy("pri", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val slow = df.withColumn("off", coalesce(sum(col("w")).over(ww), lit(0L)))
        .select("g", "id", "off").collect()
        .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      assert(fast == slow, s"trial $trial (width $width): grouped offsets diverged")
    }
  }

  test("packedShards: shard boundaries at exact budget multiples") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("id", "w")
    val got = PrefixSum.packedShards(df, "id", "w", budget = 20L, rangeWidth = 2L)
      .select("id", "off", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 10L, 0L), (3L, 20L, 1L), (4L, 30L, 1L)))
  }
}
