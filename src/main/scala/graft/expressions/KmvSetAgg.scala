package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst aggregate: the SET form of [[KmvDistinct]] — returns
  * the k smallest DISTINCT hash values themselves (sorted ascending)
  * instead of just their count/k-th order statistic. The hash SET is
  * what sketch-based SET OPERATIONS need: for two groups A and B, the k
  * smallest of S_A ∪ S_B form a uniform sample of the union, and the
  * fraction of that sample present in both sketches is the standard KMV
  * Jaccard estimator (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07) — all from k longs
  * per group, merged in plain column expressions with no second corpus
  * pass. Same bounded semilattice state as KmvDistinct: partial sketches
  * merge by union-then-truncate, k·numMapTasks longs cross the shuffle.
  *
  * SQL: `graft_kmv_set(hash, k)` → array<bigint> sorted ascending,
  * length min(k, distinct non-null hashes). Deterministic (exact order
  * statistics of a deterministic hash), so DuckDB replays it by ranking
  * the same md5-derived hashes.
  */
case class KmvSetAgg(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  // k must be a foldable literal (it bounds the buffer)
  private lazy val k: Int = {
    val kv = kExpr.eval() match {
      case i: Int  => i
      // toIntExact: a silent .toInt would wrap a BIGINT literal past 2^31
      // (e.g. 2^32+3 -> 3) and sail under the k >= 1 guard below
      case l: Long => Math.toIntExact(l)
      case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
    }
    // offer() reads buf.last once the buffer is "full"; k <= 0 would make an
    // EMPTY buffer full and fail with an opaque NoSuchElementException
    require(kv >= 1, s"graft_kmv_set: k must be >= 1, got $kv")
    kv
  }

  override lazy val resolved: Boolean = childrenResolved &&
    hashExpr.dataType == LongType && kExpr.foldable

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_set"

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

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    buf.forEach { h => out(i) = h; i += 1 }
    new GenericArrayData(out): ArrayData
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
