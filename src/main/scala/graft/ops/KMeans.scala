package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

import graft.functions.TextFns.h60
import graft.functions.VecFns._

/** Deterministic distributed spherical k-means (Lloyd's) — a REAL learned
  * coarse quantizer for the embedding column, replacing the synthetic
  * `label` attribute the IVF/SemDeDup rows used as a stand-in (measured
  * weak: s10 recall@3 0.53 even at nprobe=4; ~90% of cosine≥0.4 pairs
  * cross labels — ADVICE r04 asked for a quantizer derived from the
  * vectors themselves).
  *
  * Every step is engine-mirrorable, so a TRAINED model can sit under the
  * DuckDB oracle (the "k-means is iteration-order-dependent and
  * unmirrorable" objection applies to resumable/online variants, not to
  * fixed-iteration batch Lloyd's with exact-order reductions):
  *   - seeds: the k vectors with the smallest (h60(vec_id), vec_id) — a
  *     deterministic pseudo-random draw, TakeOrdered(k) not a global sort;
  *   - assignment: argmax_c dot(e, c) with the sequential fold (graft_dot)
  *     both engines share; ties (never observed, rule pinned anyway) keep
  *     the lowest cid;
  *   - update: elementwise DECIMAL(28,9) sums / count (the s03 centroid
  *     trick — order-independent, bit-exact), then L2-normalized
  *     (spherical k-means: unnormalized means would bias the argmax
  *     toward long centroids); an emptied cluster keeps its previous
  *     centroid;
  *   - fixed iteration count, unrolled — the oracle replays each round as
  *     one CTE layer ([[sqlFitCtes]] generates them from the same
  *     constants).
  *
  * Scale shape per iteration: the centroid table (k×dim doubles) rides a
  * 1-ROW broadcast; assignment is a PURE PROJECTION (the argmax folds
  * over the broadcast list — no explode, no per-vector×centroid shuffle);
  * the update is ONE cid-keyed aggregate with map-side partials. At
  * 100 TB the fit runs on a sample (the d13 tune-on-sample pattern) and
  * the one extra full-corpus pass is the final [[assign]].
  */
object KMeans {

  /** Deterministic seed centroids: cid ∈ 1..k in (h60(vec_id), vec_id)
    * order. `v` must carry (vec_id, e) with e L2-normalized. The pick is
    * TakeOrderedAndProject (top-k, no global sort); the row_number window
    * then runs over k rows only.
    */
  def seeds(v: DataFrame, k: Int): DataFrame = {
    val picked = v
      .select(col("vec_id"), col("e"), h60(col("vec_id").cast(StringType)).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
    picked
      .withColumn("cid", row_number().over(Window.orderBy(col("h"), col("vec_id"))))
      .select(col("cid"), col("e").as("c"))
  }

  /** The centroid table folded into ONE row holding the cid-sorted
    * (cid, c) list — the broadcast side of the shuffle-free assignment.
    */
  private def centsRow(cent: DataFrame): DataFrame =
    cent.agg(sort_array(collect_list(struct(col("cid"), col("c")))).as("cents"))

  /** Assignment as a pure projection: each vector folds over the
    * broadcast centroid list keeping the best (dot, cid); strict `>`
    * keeps the FIRST (lowest cid) on ties — the rule the oracle mirrors
    * with `ORDER BY d DESC, cid`. Output: (vec_id, e, cid).
    */
  def assign(v: DataFrame, cent: DataFrame): DataFrame = {
    val best = aggregate(
      col("cents"),
      struct(lit(Double.NegativeInfinity).as("d"), lit(0).as("cid")),
      (acc, x) => {
        val d = dotSeq(x("c"), col("e"))
        when(d > acc("d"), struct(d.as("d"), x("cid").as("cid"))).otherwise(acc)
      })
    v.crossJoin(broadcast(centsRow(cent)))
      .select(col("vec_id"), col("e"), best("cid").as("cid"))
  }

  /** Assignment against DRIVER-HELD centroids: the same argmax fold as
    * [[assign]], but the cid-ascending centroid list rides as a plan
    * LITERAL (k×dim doubles — a few KB) instead of a broadcast built
    * from a k-row frame. Identical arithmetic: same graft_dot per
    * (vector, centroid) in the same cid order, strict `>` keeps the
    * lowest cid on ties.
    */
  def assignLit(v: DataFrame, cents: Seq[(Int, Array[Double])]): DataFrame = {
    val centsCol = array(cents.sortBy(_._1).map { case (cid, c) =>
      struct(lit(cid).as("cid"), lit(c).as("c"))
    }: _*)
    val best = aggregate(
      centsCol,
      struct(lit(Double.NegativeInfinity).as("d"), lit(0).as("cid")),
      (acc, x) => {
        val d = dotSeq(x("c"), col("e"))
        when(d > acc("d"), struct(d.as("d"), x("cid").as("cid"))).otherwise(acc)
      })
    v.select(col("vec_id"), col("e"), best("cid").as("cid"))
  }

  /** `iters` rounds of Lloyd's from the deterministic seeds. Returns the
    * trained centroids (cid, c) as a local relation.
    *
    * r13 shape: each round is ONE job — an assignment projection (the
    * [[assignLit]] fold over literal centroids) into the cid-keyed
    * decimal aggregate, whose ≤ k result rows are collected and folded
    * into the next round's centroids ON THE DRIVER (k×dim values — the
    * sanctioned bounded-collect pattern; at k=8, dim=64 that is 4 KB).
    * The former DataFrame chain spent 4+ jobs per round (centroid-list
    * fold, broadcast build, update aggregate, carry-over join,
    * localCheckpoint) moving k-row frames. Arithmetic is bit-identical:
    * the decimal sums commute (partition-invariant), the mean is the
    * same decimal→double cast divided by the same long count, and the
    * normalize mirrors L2NormalizeD's fold (Σx² left-to-right, sqrt,
    * divide) — KMeansSpec pins fit/assign equality and the oracle
    * replays the same rounds.
    */
  def fit(v: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    // seed draw: k rows in (h60(vec_id), vec_id) order — TakeOrdered,
    // collected; index order IS the former row_number (same total order)
    var cents: IndexedSeq[(Int, Array[Double])] = v
      .select(col("vec_id"), col("e"), h60(col("vec_id").cast(StringType)).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .select(col("e"))
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0).toArray) }
    val sums = (0 until dim).map(d =>
      sum(element_at(col("e"), d + 1).cast(DecimalType(28, 9))).as(s"s$d"))
    for (_ <- 0 until iters) {
      val upd = assignLit(v, cents)
        .groupBy("cid")
        .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        .collect()
        .map { r =>
          val n = r.getLong(dim + 1)
          // Decimal(38,9) -> double, / long: the same cast + division
          // Spark's `s_d.cast(double) / n` performed per element
          val mean = Array.tabulate(dim)(d => r.getDecimal(d + 1).doubleValue() / n)
          // L2NormalizeD's exact fold: Σx² left-to-right, sqrt, divide
          var ss = 0.0
          var i = 0
          while (i < dim) { ss += mean(i) * mean(i); i += 1 }
          val norm = math.sqrt(ss)
          (r.getInt(0), mean.map(_ / norm))
        }.toMap
      // an emptied cluster keeps its previous centroid
      cents = cents.map { case (cid, prev) => (cid, upd.getOrElse(cid, prev)) }
    }
    val spark = v.sparkSession
    import spark.implicits._
    cents.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "c")
  }

  // ---------------------------------------------------------------- SQL

  /** h60(vec_id) in DuckDB — the seed-draw hash. */
  private val sqlSeedHash =
    "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** DuckDB CTE layers replaying [[fit]] + [[assign]] against a CTE `v`
    * with columns (vec_id, e). Emits `cent0..cent$iters` and the final
    * full-corpus assignment `akm(vec_id, cid)` against `cent$iters`.
    * Append after an existing WITH list (leading comma included by the
    * caller).
    */
  def sqlFitCtes(k: Int, iters: Int, dim: Int): String = {
    def asgLayer(name: String, centName: String): String = {
      val dot = sqlDotSeqN("vv.e", "c.c", dim)
      s"""$name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vv.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY vv.vec_id ORDER BY $dot DESC, c.cid) AS rn
         |    FROM v vv, $centName c) WHERE rn = 1)""".stripMargin
    }
    val seedsCte =
      s"""seedr AS (
         |  SELECT vec_id, e, $sqlSeedHash AS h FROM v ORDER BY h, vec_id LIMIT $k),
         |cent0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) AS cid, e AS c
         |  FROM seedr)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val normMean = sqlL2NormalizeN("m.m", dim)
      s"""${asgLayer(s"asg$i", s"cent${i - 1}")},
         |cm$i AS (
         |  SELECT a.cid, idx.i AS pos,
         |    CAST(SUM(CAST(vv.e[idx.i] AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS cx
         |  FROM asg$i a, v vv, (SELECT unnest(range(1, $dim + 1)) AS i) idx
         |  WHERE a.vec_id = vv.vec_id
         |  GROUP BY a.cid, idx.i),
         |cl$i AS (SELECT cid, list(cx ORDER BY pos) AS m FROM cm$i GROUP BY cid),
         |cent$i AS (
         |  SELECT p.cid, COALESCE($normMean, p.c) AS c
         |  FROM cent${i - 1} p LEFT JOIN cl$i m USING (cid))""".stripMargin
    }
    (Seq(seedsCte) ++ rounds :+ asgLayer("akm", s"cent$iters")).mkString(",\n")
  }
}
