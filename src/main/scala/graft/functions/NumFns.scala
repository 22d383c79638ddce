package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * Why not `round(x, 6)`: Spark rounds doubles through the shortest
  * DECIMAL STRING of the value (`BigDecimal.valueOf(d).setScale(6,
  * HALF_UP)`), while DuckDB rounds the SCALED DOUBLE (`x * 1e6`) — on a
  * half-way value the two disagree in either direction (observed: a
  * quality score whose Spark repr is "0.2534375" rounds up to 0.253438,
  * while its `x * 1e6` double is 253437.49999999997 and rounds down).
  * Which rows sit on a boundary is data luck, so every `round(_, 6)`
  * pair was a latent hash-mismatch.
  *
  * [[round6]] / [[sqlRound6]] instead evaluate the SAME IEEE expression
  * on both engines — `floor(x * 1e6 + 0.5) / 1e6` — so the result is
  * bit-identical by construction whenever `|x| * 1e6` fits double's
  * exact-integer range (2^53; every rounded measure in this suite is
  * O(1..1e6)). Ties round toward +inf on both sides, consistently.
  */
object NumFns {

  /** Deterministic 6-decimal rounding (see object doc). */
  def round6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** DuckDB mirror of [[round6]] — same multiply/add/floor/divide. */
  def sqlRound6(e: String): String =
    s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** Z-order (Morton) interleave of the low `bits` bits of two
    * non-negative integral columns: bit i of x lands at position 2i, bit
    * i of y at 2i+1. Pure integer expressions — codegen'd, exact, and
    * mirrored verbatim by [[sqlZvalue2]]. Sorting by the z-value
    * clusters BOTH dimensions at once (locality for 2-D data skipping —
    * see io.Writers.zorderWrite); 2·bits ≤ 62 keeps the value in a
    * positive long.
    */
  def zvalue2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** DuckDB mirror of [[zvalue2]] — the same unrolled bit sum. */
  def sqlZvalue2(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
}
