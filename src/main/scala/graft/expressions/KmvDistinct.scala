package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst aggregate: KMV (k-minimum-values) distinct sketch —
  * the bounded-state form of COUNT(DISTINCT …) for the 100 TB tier.
  *
  * State is the k smallest DISTINCT hash values seen (a sorted set
  * capped at k longs), which is a semilattice: partial sketches merge by
  * set-union-then-truncate, so the aggregate runs as a normal partial /
  * final pair with k·numMapTasks longs crossing the shuffle — versus
  * exact distinct's full value shuffle (x16_distinct_counts is the exact
  * twin). Unlike approx_count_distinct's HLL the state here is exact
  * order statistics of a deterministic hash, so the estimate is
  * bit-reproducible across engines: DuckDB mirrors it by ranking the
  * same md5-derived hashes (x17_kmv_distinct's oracle).
  *
  * SQL: `graft_kmv(hash, k)` → struct<held:int, kth:bigint> where held =
  * |sketch| (= min(k, true distinct count of non-null hashes)) and kth =
  * the largest held hash (the k-th order statistic when held = k; null
  * when the group had no non-null hashes). The caller derives the
  * standard estimator: held < k → held exactly; else (k-1)/(kth/2^60)
  * for the 60-bit [[graft.functions.TextFns.h60]] hash domain.
  */
case class KmvDistinct(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  // k must be a foldable literal (it bounds the buffer)
  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
  }

  override lazy val resolved: Boolean = childrenResolved &&
    hashExpr.dataType == LongType && kExpr.foldable

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("held", IntegerType, nullable = false),
    StructField("kth", LongType, nullable = true)))
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hashExpr.eval(input)
    if (h != null) offer(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    other.forEach(h => offer(buf, h))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    InternalRow(buf.size, if (buf.isEmpty) null else buf.last.longValue())

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.forEach(h => out.writeLong(h))
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
