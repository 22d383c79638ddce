package graft.transform

import org.apache.spark.sql.Row

import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  // metadata with numeric-as-string columns, as loaded all-string
  private lazy val md = Seq(
    // paired: 200/100 rounds to 2 → factor 2
    ("SRR001", "1000", "200", "100", "20000000"),
    // single: 120/100 rounds to 1 → factor 1
    ("SRR002", "2000", "120", "100", "40000000"))
    .toDF("external_id", "star.all_mapped_reads", "star.average_mapped_length",
      "avg_len", "bc_auc.all_reads_all_bases")

  test("mappedReadsFactors: paired-end detection + RPKM-ish formula") {
    val sf = Scale.mappedReadsFactors(md, targetSize = 4e7, L = 100)
      .orderBy("external_id").collect()
    // SRR001: 4e7 * 100 * 2 / (1000 * 200^2) = 8e9 / 4e7 = 200
    assert(sf(0) == Row("SRR001", 200.0))
    // SRR002: 4e7 * 100 * 1 / (2000 * 120^2) = 4e9 / 2.88e7 ≈ 138.888...
    assert(math.abs(sf(1).getDouble(1) - 4e9 / 2.88e7) < 1e-9)
  }

  test("aucFactors: target / auc") {
    val sf = Scale.aucFactors(md, targetSize = 4e7).orderBy("external_id").collect()
    assert(sf(0) == Row("SRR001", 2.0))
    assert(sf(1) == Row("SRR002", 1.0))
  }

  test("scaleMappedReadsWide: numeric sample columns multiplied") {
    val counts = Seq(("g1", 10L, 4L), ("g2", 3L, 8L)).toDF("gene_id", "SRR001", "SRR002")
    val sf = Seq(("SRR001", 2.0), ("SRR002", 0.5)).toDF("external_id", "sf")
    val out = Scale.scaleMappedReadsWide(counts, sf).orderBy("gene_id").collect()
    assert(out(0) == Row("g1", 20.0, 2.0))
    assert(out(1) == Row("g2", 6.0, 4.0))
  }

  test("scaleAucWide: multiply, round, cast long, skip feature col") {
    val counts = Seq(("g1", 10L, 5L)).toDF("gene_id", "SRR001", "SRR002")
    val sf = Seq(("SRR001", 1.26), ("SRR002", 2.0)).toDF("external_id", "sf")
    val out = Scale.scaleAucWide(counts, sf).collect()
    assert(out(0) == Row("g1", 13L, 10L)) // 12.6 rounds HALF_UP to 13
  }

  test("scaleLong: broadcast join multiply") {
    val long = Seq(("g1", "SRR001", 10L), ("g1", "SRR002", 4L))
      .toDF("feature_id", "external_id", "value")
    val sf = Seq(("SRR001", 2.0), ("SRR002", 0.25)).toDF("external_id", "sf")
    val out = Scale.scaleLong(long, sf).orderBy("external_id").collect()
    assert(out(0) == Row("g1", "SRR001", 20.0))
    assert(out(1) == Row("g1", "SRR002", 1.0))
  }
}
