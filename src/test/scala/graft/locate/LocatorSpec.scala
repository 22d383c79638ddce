package graft.locate

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Annotation, Dtype}

/** Pure locator tests — URL synthesis semantics from locator.py:83-187,
  * including seeded property-style sweeps (SURVEY §5.2.3: URLs contain
  * their project id, shard = last-2-chars, counts match
  * |tags|×|exts|×|projects|).
  */
class LocatorSpec extends AnyFunSuite {

  private val root = "http://example.org/recount3/human"
  private val sources = Map("sra" -> "data_sources/sra")

  private def locator(dtype: Dtype, pids: List[String],
      ann: Option[Annotation] = Some(Annotation.GencodeV26),
      sample: List[String] = List("SRR001"),
      jxn: Option[String] = Some("unique")) =
    ProjectLocator(root, sources, "sra", dtype, ann, pids, sample, jxn)

  test("metadata urls: dbase + 4 shared tags, sharded layout") {
    val urls = locator(Dtype.Metadata, List("SRP123")).urls
    assert(urls.length == 5)
    assert(urls.contains(
      s"$root/data_sources/sra/metadata/23/SRP123/sra.sra.SRP123.MD.gz"))
    assert(urls.contains(
      s"$root/data_sources/sra/metadata/23/SRP123/sra.recount_qc.SRP123.MD.gz"))
  }

  test("jxn urls: uppercased format infix, 3 extensions") {
    val urls = locator(Dtype.Jxn, List("SRP123")).urls
    assert(urls.length == 3)
    assert(urls.forall(_.contains(".UNIQUE.")))
    assert(urls.exists(_.endsWith("sra.junctions.SRP123.UNIQUE.MM.gz")))
  }

  test("gene urls: one annotation gtf + one counts per project") {
    val urls = locator(Dtype.Gene, List("SRP123", "SRP456")).urls
    assert(urls.head ==
      s"$root/annotations/gene_sums/human.gene_sums.G026.gtf.gz")
    assert(urls.tail == List(
      s"$root/data_sources/sra/gene_sums/23/SRP123/sra.gene_sums.SRP123.G026.gz",
      s"$root/data_sources/sra/gene_sums/56/SRP456/sra.gene_sums.SRP456.G026.gz"))
  }

  test("bw urls: project × sample nested loop with sample shard") {
    val urls = locator(Dtype.Bw, List("SRP123"), sample = List("SRR111", "SRR222")).urls
    assert(urls == List(
      s"$root/data_sources/sra/base_sums/23/SRP123/11/sra.base_sums.SRP123_SRR111.ALL.bw",
      s"$root/data_sources/sra/base_sums/23/SRP123/22/sra.base_sums.SRP123_SRR222.ALL.bw"))
  }

  test("gene/exon require annotation; bw requires sample") {
    assertThrows[IllegalArgumentException](locator(Dtype.Gene, List("P1"), ann = None))
    assertThrows[IllegalArgumentException](locator(Dtype.Bw, List("P1"), sample = Nil))
  }

  test("corpus metadata urls: one per data source") {
    val urls = Locators.metadataUrls(root, Map("sra" -> "data_sources/sra", "gtex" -> "data_sources/gtex"))
    assert(urls == List(
      s"$root/data_sources/gtex/metadata/gtex.recount_project.MD.gz",
      s"$root/data_sources/sra/metadata/sra.recount_project.MD.gz"))
  }

  private def randomPids(rng: scala.util.Random): List[String] =
    List.fill(1 + rng.nextInt(8))(
      s"SRP${rng.nextInt(1000)}${rng.alphanumeric.take(2).mkString}").distinct

  test("property: every metadata url contains its project id and shard") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val pids = randomPids(rng)
      val urls = locator(Dtype.Metadata, pids).urls
      assert(urls.length == 5 * pids.length)
      pids.foreach { pid =>
        val mine = urls.filter(_.contains(s"/$pid/"))
        assert(mine.length == 5)
        assert(mine.forall(_.contains(s"/${pid.takeRight(2)}/$pid/")))
      }
    }
  }

  test("property: jxn url count = |tags| x |extensions| x |projects|") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val pids = randomPids(rng)
      assert(locator(Dtype.Jxn, pids).urls.length == 3 * pids.length)
    }
  }
}
