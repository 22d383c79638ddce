package graft.io

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType}

import graft.{FixtureMirror, SparkSpec}

class ReadersSpec extends SparkSpec {

  private lazy val mirror = {
    val dir = Files.createTempDirectory("graft-readers")
    FixtureMirror.build(dir)
    dir
  }
  private def p(rel: String): String = mirror.resolve(rel).toString

  test("tsvAllString: every column Utf8, header preserved") {
    val df = Readers.tsvAllString(spark,
      Seq(p("human/data_sources/sra/metadata/sra.recount_project.MD.gz")))
    assert(df.schema.fields.forall(_.dataType == StringType))
    assert(df.columns.length == 8)
    assert(df.count() == 3)
  }

  test("countsRead: ## comments skipped, numeric inference, sample projection") {
    val path = p("human/data_sources/sra/gene_sums/01/SRP001/sra.gene_sums.SRP001.G026.gz")
    val df = Readers.countsRead(spark, path, Seq("SRR002"))
    assert(df.columns.toSeq == Seq("gene_id", "SRR002"))
    assert(df.schema("SRR002").dataType == LongType)
    assert(df.count() == 4)
  }

  test("countsRead: missing requested sample raises (KeyError contract)") {
    val path = p("human/data_sources/sra/gene_sums/01/SRP001/sra.gene_sums.SRP001.G026.gz")
    assertThrows[NoSuchElementException](
      Readers.countsRead(spark, path, Seq("SRR999")))
  }

  test("gtfRead: 9 fixed cols + 12 extracted fields, empty on absent") {
    val df = Readers.gtfRead(spark, p("human/annotations/gene_sums/human.gene_sums.G026.gtf.gz"))
    assert(df.columns.length == 21)
    val rows = df.orderBy("start", "feature").collect()
    assert(rows.length == 3) // comment line skipped
    val gene1 = rows(0)
    assert(gene1.getAs[String]("gene_id") == "g1")
    assert(gene1.getAs[String]("gene_name") == "Alpha")
    assert(gene1.getAs[String]("transcript_id") == "") // absent → ""
    val t1 = rows(1)
    assert(t1.getAs[String]("transcript_id") == "t1")
    assert(t1.getAs[String]("transcript_name") == "Alpha-1")
  }

  test("matrixMarketRead: long coo + declared dims") {
    val (df, rows, cols, nnz) = Readers.matrixMarketRead(spark,
      p("human/data_sources/sra/junctions/01/SRP001/sra.junctions.SRP001.UNIQUE.MM.gz"))
    assert((rows, cols, nnz) == (4L, 2L, 3L))
    assert(df.orderBy("row", "col").collect().toSeq ==
      Seq(Row(1L, 1L, 5L), Row(2L, 2L, 7L), Row(4L, 1L, 2L)))
  }

  test("idListRead: rail_ids as strings") {
    assert(Readers.idListRead(spark,
      p("human/data_sources/sra/junctions/01/SRP001/sra.junctions.SRP001.UNIQUE.ID.gz")) ==
      List("101", "102"))
  }
}
