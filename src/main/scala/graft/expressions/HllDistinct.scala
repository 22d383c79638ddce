package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst aggregate: HyperLogLog distinct sketch over the
  * 60-bit [[graft.functions.TextFns.h60]] hash domain — the
  * constant-state sibling of [[KmvDistinct]] (x17). Where KMV keeps the
  * k smallest hashes (state grows with k, estimate is an order
  * statistic), HLL keeps m = 2^p one-byte registers (256 B at p=8,
  * independent of k or cardinality) holding the max leading-zero rank
  * seen per bucket — the shape every production engine (Spark's own
  * approx_count_distinct, Redis PFCOUNT, BigQuery HLL_COUNT) uses for
  * 100 TB distinct counts, because registers merge element-wise-max and
  * only m bytes per map task cross the shuffle.
  *
  * Register update for a 60-bit hash h: bucket = top p bits,
  * w = low (60-p) bits, rank(w) = leading zeros of w within (60-p) bits
  * plus 1 (w = 0 → (60-p)+1). register[bucket] maxes over ranks.
  *
  * Unlike approx_count_distinct (whose HLL++ bias tables and relative-SD
  * parametrization are Spark-internal), this sketch is specified to be
  * ENGINE-MIRRORABLE, so the estimate itself sits under the DuckDB
  * oracle (x21_hll_distinct): the output is the integer pair
  *   zeros = |{j : register[j] = 0}|
  *   ssum  = Σ_j 2^(R − register[j])   with R = (60−p)+1 = max rank,
  * from which Σ 2^−register[j] = ssum / 2^R EXACTLY — summing scaled
  * integers sidesteps float summation-order nondeterminism, so both
  * engines derive bit-identical doubles from bit-identical longs. The
  * caller applies the standard Flajolet estimator with linear-counting
  * small-range correction:
  *   E_raw = α_m · m² / (ssum / 2^R),  α_m = 0.7213/(1 + 1.079/m)
  *   E     = if (zeros > 0 ∧ E_raw ≤ 2.5 m) m·ln(m/zeros) else E_raw.
  *
  * SQL: `graft_hll(hash, p)` → struct<zeros:int, ssum:bigint>, p a
  * foldable integer literal in [4, 16].
  */
case class HllDistinct(
    hashExpr: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  // p must be a foldable literal (it sizes the register array)
  private lazy val p: Int = pExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"p must be an integer literal, got $other")
  }
  private lazy val m: Int = {
    require(p >= 4 && p <= 16, s"graft_hll precision p must be in [4,16], got $p")
    1 << p
  }
  private lazy val wBits: Int = 60 - p          // bits in the rank field
  private lazy val wMask: Long = (1L << wBits) - 1

  override lazy val resolved: Boolean = childrenResolved &&
    hashExpr.dataType == LongType && pExpr.foldable

  override def children: Seq[Expression] = Seq(hashExpr, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("zeros", IntegerType, nullable = false),
    StructField("ssum", LongType, nullable = false)))
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      val bucket = (hv >>> wBits).toInt & (m - 1)
      val w = hv & wMask
      // leading zeros within the wBits-wide field, +1; w=0 → wBits+1
      val rank =
        if (w == 0L) wBits + 1
        else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val maxRank = wBits + 1
    var zeros = 0
    var ssum = 0L
    var j = 0
    while (j < m) {
      val r = buf(j).toInt
      if (r == 0) zeros += 1
      ssum += 1L << (maxRank - r) // register ∈ [0, maxRank]; terms ∈ [1, 2^maxRank]
      j += 1
    }
    InternalRow(zeros, ssum)
  }

  // registers are already a flat byte array — serialize as-is
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), pExpr = newChildren(1))
}
