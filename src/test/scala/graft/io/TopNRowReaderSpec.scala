package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the shared bounded-heap top-N reader (the
  * reader-side half of the recount3 / matrixmarket partial
  * `SupportsPushDownTopN`): over arbitrary row multisets, sort specs,
  * and n, the emitted set must equal take-n of a full sort — the
  * contract the retained global Sort+Limit depends on. Pure JVM (a fake
  * inner PartitionReader), no Spark session.
  */
object TopNRowReaderSpec extends Properties("TopNRowReader") {

  private val schema = StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  private final class FakeReader(rows: Seq[(String, Long, Long)])
      extends PartitionReader[InternalRow] {
    private val it = rows.iterator
    private var cur: InternalRow = _
    var closed = false
    override def next(): Boolean =
      if (it.hasNext) {
        val (s, v, id) = it.next()
        // fresh row per call — the contract TopNRowReader relies on
        cur = InternalRow.fromSeq(Seq(UTF8String.fromString(s), v, id))
        true
      } else false
    override def get(): InternalRow = cur
    override def close(): Unit = closed = true
  }

  private val genRow: Gen[(String, Long, Long)] = for {
    s <- Gen.oneOf("a", "b", "c", "zz", "")
    v <- Gen.choose(-5L, 5L) // narrow domain → plenty of ties
  } yield (s, v, 0L)

  private val genCase: Gen[(List[(String, Long, Long)], List[(String, Boolean)], Int)] = for {
    rows0 <- Gen.listOf(genRow)
    // unique id as the last column makes the reference order total, so
    // take-n is unambiguous and the comparison is exact set equality
    rows = rows0.zipWithIndex.map { case ((s, v, _), i) => (s, v, i.toLong) }
    fields <- Gen.someOf("s", "v").map(_.toList)
    dirs <- Gen.listOfN(fields.length, Gen.oneOf(true, false))
    idDesc <- Gen.oneOf(true, false)
    orders = fields.zip(dirs) :+ ("id" -> idDesc)
    n <- Gen.choose(1, math.max(rows.length + 2, 1))
  } yield (rows, orders, n)

  private def rank(orders: Seq[(String, Boolean)]): Ordering[(String, Long, Long)] = {
    val base: Seq[Ordering[(String, Long, Long)]] = orders.map { case (f, desc) =>
      val o: Ordering[(String, Long, Long)] = f match {
        case "s" => Ordering.by(_._1)
        case "v" => Ordering.by(_._2)
        case "id" => Ordering.by(_._3)
      }
      if (desc) o.reverse else o
    }
    new Ordering[(String, Long, Long)] {
      override def compare(a: (String, Long, Long), b: (String, Long, Long)): Int =
        base.iterator.map(_.compare(a, b)).find(_ != 0).getOrElse(0)
    }
  }

  property("emits exactly take-n of the total-order sort") = Prop.forAll(genCase) {
    case (rows, orders, n) =>
      val inner = new FakeReader(rows)
      val reader = new TopNRowReader(inner, schema, orders, n)
      val got = Iterator.continually(reader)
        .takeWhile(_.next())
        .map { r =>
          val row = r.get()
          (row.getUTF8String(0).toString, row.getLong(1), row.getLong(2))
        }
        .toList
      val expected = rows.sorted(rank(orders)).take(n)
      // emission order is arbitrary (the global sort orders it); the
      // SET must match, and ids are unique so sets are exact
      Prop(got.toSet == expected.toSet && got.length == expected.length &&
        inner.closed) :| s"got=$got expected=$expected closed=${inner.closed}"
  }
}
