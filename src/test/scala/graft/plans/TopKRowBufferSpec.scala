package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz of the heap store both execution paths share — against a
  * brute-force sort, across caps. Pure JVM (no SparkSession): the buffer
  * is plain data-structure code and should be testable as such.
  */
class TopKRowBufferSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("g", LongType), StructField("v", LongType), StructField("t", LongType)))
  private val proj = UnsafeProjection.create(schema)
  private val keyProj = UnsafeProjection.create(StructType(schema.take(1)))

  private def row(g: Long, v: Double, t: Long): (UnsafeRow, UnsafeRow) = {
    val r = proj(InternalRow(g, java.lang.Double.doubleToLongBits(v), t)).copy()
    val k = keyProj(InternalRow(g)).copy()
    (k, r)
  }

  test("fuzz vs brute force: kept rows are exactly the per-group top-k") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(4)
      val n = 200
      val data = (0 until n).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(10).toDouble, i.toLong)
      }
      val buf = new TopKRowBuffer(k)
      data.foreach { case (g, v, t) =>
        val (key, r) = row(g, v, t)
        buf.insert(key, v, t, r)
      }
      // read back (g, v, t) from the kept rows
      val kept = buf.partialRows.map { r =>
        (r.getLong(0), java.lang.Double.longBitsToDouble(r.getLong(1)), r.getLong(2))
      }.toSet
      val expected = data.groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(r => (-r._2, r._3)).take(k)
      }.toSet
      assert(kept == expected, s"trial $trial k=$k")
      assert(buf.numGroups == data.map(_._1).distinct.size)
    }
  }

  test("fuzz with group cap: absorbed + passed-through covers the top-k superset") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(3)
      val cap = 1 + rnd.nextInt(4)
      val data = (0 until 300).map { i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(12).toDouble, i.toLong)
      }
      val buf = new TopKRowBuffer(k, cap)
      val passed = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
      data.foreach { case (g, v, t) =>
        val (key, r) = row(g, v, t)
        if (!buf.handle(key, v, t, r)) passed += ((g, v, t))
      }
      assert(buf.numGroups <= cap, "memory bound violated")
      assert(buf.numPassedThrough == passed.size)
      val emitted = buf.partialRows.map { r =>
        (r.getLong(0), java.lang.Double.longBitsToDouble(r.getLong(1)), r.getLong(2))
      }.toSet ++ passed
      // every true top-k row survives somewhere in the emitted superset —
      // the invariant the final exec relies on
      val mustKeep = data.groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(r => (-r._2, r._3)).take(k)
      }.toSet
      assert(mustKeep.subsetOf(emitted), s"trial $trial k=$k cap=$cap lost top-k rows")
    }
  }
}
