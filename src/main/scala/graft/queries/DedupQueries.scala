package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns._
import graft.functions.VecFns._

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the LLM-data-pipeline extension surface (SURVEY §0 north star, §2.9
  * extension rows). Every query is deterministic and has a DuckDB oracle
  * built from the same constants.
  *
  * Scale design: all variants are inverted-index / signature joins — no
  * all-pairs O(n²) stage except the oracle-checkable near-dup baselines.
  *   - exact:      1 shuffle (groupBy hash)
  *   - minhash:    shuffle on (k, value) signature agreement
  *   - minhash-LSH banding: shuffle on (band, band-signature) buckets only
  *   - ngram-jaccard: shuffle on shingle (inverted index), then pair agg
  *   - simhash:    per-doc signature, 2 shuffles
  */
object DedupQueries {

  private val P = MinhashP

  /** (doc_id, gram) distinct word-3-gram shingles. */
  private def docGrams(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(grams3(tokens(col("text"))))).as("g"))

  /** Long-format minhash signatures: (doc_id, k, v), K rows per doc. */
  private def minhashSigs(s: SparkSession, dir: String): DataFrame = {
    val hm = docGrams(s, dir).select(col("doc_id"), (h60(col("g")) % P).as("hm"))
    val sigCols = (0 until MinhashK).map(k => min(minhashK(k, col("hm"))).as(s"m$k"))
    val wide = hm.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val kvs = (0 until MinhashK).flatMap(k => Seq(lit(k), col(s"m$k")))
    wide.select(col("doc_id"), explode(map(kvs: _*)).as(Seq("k", "v")))
  }

  private def sqlGrams: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 1, 1)),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
      |  FROM toks)""".stripMargin

  private def sqlSigs: String = {
    val a = MinhashA.mkString("[", ", ", "]")
    val b = MinhashB.mkString("[", ", ", "]")
    s"""$sqlGrams,
       |hm AS (SELECT doc_id, CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % $P AS hm FROM grams),
       |ks AS (SELECT unnest(range(0, $MinhashK)) AS k),
       |sig AS (
       |  SELECT doc_id, k, min(($a[k + 1] * hm + $b[k + 1]) % $P) AS v
       |  FROM hm, ks GROUP BY doc_id, k)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-hash groupBy (single shuffle; at 100 TB this is
    // the canonical sha2-bucket dedup pass).
    "d01_dedup_exact" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("cnt"))
        .orderBy("keep_id")
    },

    // MinHash signature agreement: pairs agreeing on >= K/2 of K=16
    // signature slots (est. Jaccard >= 0.5). Join on (k, v) — inverted
    // index over signature values, no all-pairs stage.
    "d02_minhash_pairs" -> { (s, dir) =>
      val sig = minhashSigs(s, dir)
      val l = sig.as("l")
      val r = sig.as("r")
      l.join(r,
          col("l.k") === col("r.k") && col("l.v") === col("r.v") &&
            col("l.doc_id") < col("r.doc_id"))
        .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("matches"))
        .filter(col("matches") >= MinhashK / 2)
        .orderBy("doc_a", "doc_b")
    },

    // MinHash + LSH banding (the 100 TB path): 4 bands × 4 rows; candidate
    // pair = full agreement on >= 1 band. Shuffle key = (band, band-sig).
    "d03_minhash_lsh" -> { (s, dir) =>
      val sig = minhashSigs(s, dir)
        .withColumn("band", (col("k") / 4).cast(IntegerType))
      // deterministic band signature: slot values joined in k order
      val bsig = sig.groupBy(col("doc_id"), col("band"))
        .agg(array_join(transform(array_sort(collect_list(struct(col("k"), col("v")))),
          x => x.getField("v").cast(StringType)), ",").as("bs"))
      val l = bsig.as("l")
      val r = bsig.as("r")
      l.join(r,
          col("l.band") === col("r.band") && col("l.bs") === col("r.bs") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // SimHash: 32-bit signature from 60-bit token hashes; bit i set when
    // the +1/-1 vote over distinct tokens is positive.
    "d04_simhash" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("tok"))
        .select(col("doc_id"), h60(col("tok")).as("h"))
        .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("i"))
        .groupBy("doc_id", "i")
        .agg(sum(expr("(CAST(shiftright(h, i) AS BIGINT) % 2) * 2 - 1")).as("vote"))
        .groupBy("doc_id")
        .agg(sum(when(col("vote") > 0, expr("CAST(shiftleft(CAST(1 AS BIGINT), i) AS BIGINT)"))
          .otherwise(0L)).as("simhash"))
        .orderBy("doc_id")
    },

    // Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    // join on shared gram -> intersection counts -> |A∪B| from per-doc
    // sizes. Threshold 0.5 keeps the 25 planted near-dup pairs.
    "d05_ngram_jaccard" -> { (s, dir) =>
      val grams = docGrams(s, dir)
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val l = grams.as("l")
      val r = grams.as("r")
      val inter = l.join(r, col("l.g") === col("r.g") && col("l.doc_id") < col("r.doc_id"))
        .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))).as("j"))
        .filter(col("j") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // Embedding-cosine near-dup pairs (oracle-checkable all-pairs baseline;
    // the LSH-bucketed scale path is s02_lsh_topk).
    "d06_embed_neardup" -> { (s, dir) =>
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      val a = v.as("a")
      val b = v.as("b")
      a.join(b, col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          cosine(col("a.e"), col("b.e")).as("c"))
        .filter(col("c") >= 0.4)
        .select(col("vec_a"), col("vec_b"), round(col("c"), 6).as("cos"))
        .orderBy("vec_a", "vec_b")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT sha256(text) AS h, min(doc_id) AS keep_id, count(*) AS cnt
        |FROM documents GROUP BY h ORDER BY keep_id""".stripMargin,
    "d02_minhash_pairs" ->
      s"""WITH $sqlSigs
         |SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS matches
         |FROM sig l JOIN sig r ON l.k = r.k AND l.v = r.v AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= ${MinhashK / 2}
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d03_minhash_lsh" ->
      s"""WITH $sqlSigs,
         |bsig AS (
         |  SELECT doc_id, CAST(k // 4 AS INT) AS band,
         |         string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) AS bs
         |  FROM sig GROUP BY doc_id, CAST(k // 4 AS INT))
         |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |FROM bsig l JOIN bsig r
         |  ON l.band = r.band AND l.bs = r.bs AND l.doc_id < r.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d04_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
         |votes AS (
         |  SELECT doc_id, i, sum(((h >> i) & 1) * 2 - 1) AS vote
         |  FROM h, (SELECT unnest(range(0, 32)) AS i) bits
         |  GROUP BY doc_id, i)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d05_ngram_jaccard" ->
      s"""WITH $sqlGrams,
         |sz AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS i
         |  FROM grams l JOIN grams r ON l.g = r.g AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
         |FROM inter
         |JOIN sz sa ON doc_a = sa.doc_id
         |JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d06_embed_neardup" -> {
      val dab = sqlDotSeq("a.e", "b.e")
      val daa = sqlDotSeq("a.e", "a.e")
      val dbb = sqlDotSeq("b.e", "b.e")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
         |SELECT vec_a, vec_b, round(c, 6) AS cos FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         $dab / sqrt(($daa) * ($dbb)) AS c
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |WHERE c >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
    }
  )
}
