package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{LongType, StructType}

/** Bounded-heap top-N over a streaming [[PartitionReader]] — the shared
  * reader-side half of partial `SupportsPushDownTopN` (recount3 and
  * matrixmarket scans): drains the inner reader keeping only the n best
  * rows by the pushed sort key, so a file hands Spark n rows instead of
  * its full parse, and the retained global Sort+Limit merges the
  * per-file winners.
  *
  * The heap is ordered worst-first: each candidate compares against the
  * current cutoff in O(1) and displaces it in O(log n); emission order
  * is arbitrary (the global sort orders it). Ties at the cutoff keep the
  * incumbent — any tie choice is a valid top-n, exactly as with a global
  * sort-limit over tied rows. Sort keys are plain columns of `required`,
  * LongType compared numerically, anything else as UTF8String; the
  * sources only accept pushTopN for columns of those types.
  *
  * Requires the inner reader's get() to return a FRESH row per call
  * (both line-parsing readers build one with InternalRow.fromSeq) — kept
  * rows are retained, not copied.
  */
private[io] final class TopNRowReader(inner: PartitionReader[InternalRow],
    required: StructType, orders: Seq[(String, Boolean)], n: Int)
    extends PartitionReader[InternalRow] {
  // (ordinal in required, descending, numeric) — bound once
  private val keys: Array[(Int, Boolean, Boolean)] = orders.map { case (f, desc) =>
    (required.fieldIndex(f), desc, required(required.fieldIndex(f)).dataType == LongType)
  }.toArray
  private val cmp = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < keys.length) {
        val (ord, desc, numeric) = keys(i)
        val c = if (numeric) java.lang.Long.compare(a.getLong(ord), b.getLong(ord))
          else a.getUTF8String(ord).compareTo(b.getUTF8String(ord))
        if (c != 0) return if (desc) -c else c
        i += 1
      }
      0
    }
  }
  private var out: java.util.Iterator[InternalRow] = _
  private var cur: InternalRow = _

  override def next(): Boolean = {
    if (out == null) {
      val heap = new java.util.PriorityQueue[InternalRow](math.max(n, 1), cmp.reversed())
      try {
        while (inner.next()) {
          val row = inner.get()
          if (heap.size < n) heap.offer(row)
          else if (cmp.compare(row, heap.peek()) < 0) { heap.poll(); heap.offer(row) }
        }
      } finally inner.close()
      out = heap.iterator()
    }
    if (out.hasNext) { cur = out.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}
