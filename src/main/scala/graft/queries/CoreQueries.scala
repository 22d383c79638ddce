package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.9 declared query inventory Q1-Q14: each projects one of the
  * reference's operator semantics (see /root/reference file:line cites in
  * SURVEY §2) onto the driver's synthetic tables, with a DuckDB oracle.
  *
  * Determinism rules (hash-parity with DuckDB):
  *   - every query ends in an ORDER BY over a unique key (or full row);
  *   - double SUMs go through DECIMAL(18,2) so aggregation order can't
  *     perturb low bits, then back to DOUBLE for a stable schema;
  *   - NULL sort position is pinned (Spark default = NULLS FIRST asc,
  *     DuckDB default = NULLS LAST — the SQL says NULLS FIRST explicitly);
  *   - aliases match the oracle column names exactly.
  *
  * Scale notes (100 TB design): all fact-side scans are single-pass with
  * pushed filters; dimension joins (nation/region/supplier/part-derived)
  * are explicitly broadcast; aggregations rely on Spark partial
  * aggregation (map-side combine) before the shuffle.
  */
object CoreQueries {

  /** Exact decimal sum of a 2-decimal double column, returned as double.
    * Aggregation-order independent => hash-stable vs the DuckDB oracle.
    */
  private def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — S5/P3 membership filter (accessor.py:483-485, examples/example.py:28-30)
    "q01_filter_isin" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // sort the full row for a deterministic order.
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    },

    // Q2 — A1/O1 group-count + sort desc (examples/example.py:21-23, the
    // reference's flagship "samples per project" query)
    "q02_group_count" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("o_custkey"))
    },

    // Q3 — A2 distinct rows (accessor.py:339, 512)
    "q03_distinct" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // Q4 — J1 n-way inner equi-join + aggregate (accessor.py:470, 491-499).
    // nation/region are tiny dims => broadcast; orders⋈customer shuffles on
    // the join key and AQE picks broadcast when customer fits.
    "q04_nway_join_agg" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sumMoney(col("o_totalprice")).as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("r_name")
    },

    // Q5 — J2 aligned full-outer join of two disjoint-column aggregates,
    // key-ordered (polars concat how="align", accessor.py:388)
    "q05_align_outer" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val a = li.filter(col("l_returnflag") === "A")
        .groupBy("l_partkey")
        .agg(sumMoney(col("l_quantity")).as("qty_a"))
      val b = li.filter(col("l_returnflag") === "R")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt_r"))
      a.join(b, Seq("l_partkey"), "full_outer").orderBy("l_partkey")
    },

    // Q6 — R2 union with schema reconciliation: null-fill missing columns,
    // lexicographic column order (accessor.py:181-207, 507-510)
    "q06_union_missing" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val a = o.select("o_orderkey", "o_custkey")
      val b = o.select("o_orderkey", "o_totalprice")
      val u = a.unionByName(b, allowMissingColumns = true)
      u.select(u.columns.sorted.map(col).toIndexedSeq: _*)
        .orderBy(
          col("o_orderkey"),
          col("o_custkey").asc_nulls_first,
          col("o_totalprice").asc_nulls_first)
    },

    // Q7 — F1 regexp field extraction, the reference's one row-wise UDF
    // rewritten as a codegen'd native expression (accessor.py:242-256)
    "q07_regexp_extract" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_val"))
        .orderBy("event_id")
    },

    // Q8 — R3 split/unnest of a composite string column (exon id split,
    // accessor.py:548-565)
    "q08_split_unnest" -> { (s, dir) =>
      val parts = split(col("p_name"), " ")
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          parts.getItem(0).as("w1"),
          parts.getItem(1).as("w2"))
        .orderBy("p_partkey")
    },

    // Q9 — F4/F5/F7/F8 conditional scale factor, multiply, round, cast
    // (scale_mapped_reads / scale_auc, accessor.py:122-174)
    "q09_cond_scale" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * when(col("s_acctbal") > 5000, 2).otherwise(1), 0)
            .cast(LongType).as("scaled"))
        .orderBy("l_orderkey", "l_linenumber", "scaled")
    },

    // Q10 — F2 value replacement with pass-through of unmatched values
    // (replace_organism, utils.py:6-9)
    "q10_value_replace" -> { (s, dir) =>
      val st = col("o_orderstatus")
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(st === "O", "open").when(st === "F", "finished").otherwise(st).as("status"))
        .orderBy("o_orderkey")
    },

    // Q11 — R4 long→wide pivot with explicit value list (MatrixMarket
    // densify, accessor.py:431-438; explicit values skip the extra
    // distinct-collect job — SURVEY §4.2)
    "q11_pivot" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sumMoney(col("value")))
        .orderBy("user_id")
    },

    // Q12 — R1/A2 vertical union then distinct (accessor.py:337-339)
    "q12_union_distinct" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      c.unionByName(c).distinct().orderBy("c_custkey")
    },

    // Q13 — J4 broadcast scale-factor join against a tiny derived table
    // (dict(zip(...)) per-column multiply, accessor.py:146-153 — rewritten
    // as the idiomatic long-format broadcast join, SURVEY §7.4)
    "q13_factor_join" -> { (s, dir) =>
      val factors = Tables(s, dir, "part")
        .select(col("p_partkey"), when(col("p_size") > 25, 2L).otherwise(3L).as("factor"))
      Tables(s, dir, "lineitem")
        .join(broadcast(factors), col("l_partkey") === col("p_partkey"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * col("factor")).as("scaled"))
        .orderBy("l_orderkey", "l_linenumber", "scaled")
    },

    // Q14 — P1/P2/O3 numeric-column selection + lexicographic column
    // reorder (pl.selectors.numeric, accessor.py:151; sorted cols 203-206)
    "q14_numeric_cols" -> { (s, dir) =>
      val p = Tables(s, dir, "part")
      val numericCols = p.schema.fields
        .filter(_.dataType.isInstanceOf[NumericType])
        .map(_.name).sorted
      p.select(numericCols.map(col).toIndexedSeq: _*).orderBy(col(numericCols.head))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q01_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem WHERE l_returnflag IN ('A','R')
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin,
    "q02_group_count" ->
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |GROUP BY o_custkey ORDER BY cnt DESC, o_custkey""".stripMargin,
    "q03_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q04_nway_join_agg" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q05_align_outer" ->
      """SELECT l_partkey, qty_a, cnt_r FROM
        |  (SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_a
        |   FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey) a
        |FULL OUTER JOIN
        |  (SELECT l_partkey, count(*) AS cnt_r
        |   FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey) b
        |USING (l_partkey)
        |ORDER BY l_partkey""".stripMargin,
    "q06_union_missing" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT) AS o_custkey, o_totalprice FROM orders
        |) ORDER BY o_orderkey, o_custkey NULLS FIRST, o_totalprice NULLS FIRST""".stripMargin,
    "q07_regexp_extract" ->
      """SELECT event_id, regexp_extract(props, '"k": (\d+)', 1) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q08_split_unnest" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS w1,
        |  split_part(p_name, ' ', 2) AS w2
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q09_cond_scale" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice * CASE WHEN s_acctbal > 5000 THEN 2 ELSE 1 END, 0) AS BIGINT) AS scaled
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, scaled""".stripMargin,
    "q10_value_replace" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN 'open'
        |       WHEN o_orderstatus = 'F' THEN 'finished'
        |       ELSE o_orderstatus END AS status
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q11_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS click,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS error,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS purchase,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS signup,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(18,2))) AS DOUBLE) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q12_union_distinct" ->
      """SELECT DISTINCT * FROM (
        |  SELECT * FROM customer UNION ALL SELECT * FROM customer
        |) ORDER BY c_custkey""".stripMargin,
    "q13_factor_join" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * CASE WHEN p_size > 25 THEN 2 ELSE 3 END AS scaled
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, scaled""".stripMargin,
    "q14_numeric_cols" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part
        |ORDER BY p_partkey""".stripMargin
  )
}
