package graft.locate

import org.scalacheck.{Gen, Prop, Properties}

import graft.model.{Annotation, Dtype}

/** ScalaCheck properties for the pure URL-synthesis logic (SURVEY
  * §5.2.3) — reference semantics /root/reference/src/pyrecount/
  * locator.py:66-164. These pin the invariants the reference's fiddly
  * string code relies on, over arbitrary ids rather than the examples
  * in LocatorSpec:
  *   - every project URL contains `/{shard}/{pid}/` with
  *     shard = last-2-chars of the id (locator.py:70);
  *   - URL count = |tags| x |extensions| x |projects| (plus the
  *     annotation files for gene/exon, plus the sample loop for bw);
  *   - generation order is projects-outermost, so per-project URL
  *     blocks appear in `projectIds` order.
  */
object LocatorPropSpec extends Properties("Locators") {

  private val root = "http://example.org/recount3/human"
  private val sources = Map("sra" -> "data_sources/sra")

  // ids like the corpus's accession ids: alnum, length >= 2 so the
  // 2-char shard is well-defined and non-degenerate
  private val genId: Gen[String] = for {
    prefix <- Gen.oneOf("SRP", "ERP", "DRP", "")
    n <- Gen.choose(2, 8)
    body <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield prefix + body.mkString match {
    case "sra" => "sraX" // would collide with the dbase tag in filenames
    case id    => id
  }

  private val genIds: Gen[List[String]] =
    Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, genId)).map(_.distinct)

  private val genAnn: Gen[Annotation] = Gen.oneOf(Annotation.all)

  private def locator(dtype: Dtype, pids: List[String], ann: Annotation,
      samples: List[String] = List("SRR001")) =
    ProjectLocator(root, sources, "sra", dtype, Some(ann), pids, samples, Some("unique"))

  private def perProject(d: Dtype): Int =
    Dtype.tags(d, "sra").length * Dtype.extensions(d).length

  property("shard = last 2 chars") = Prop.forAll(genId) { id =>
    id.length < 2 || Locators.shard(id) == id.substring(id.length - 2)
  }

  property("every project url contains /{shard}/{pid}/") =
    Prop.forAll(genIds, Gen.oneOf[Dtype](Dtype.Metadata, Dtype.Jxn), genAnn) {
      (pids, dtype, ann) =>
        val urls = locator(dtype, pids, ann).urls
        pids.forall { pid =>
          // own a URL via the full "/{shard}/{pid}/" path segment — both
          // delimiters make it collision-free (a ".{pid}." filename match
          // is NOT: a random 2-char pid equal to an extension token like
          // MM/RR/ID/MD matches every project's files — was a ~5%-per-run
          // flake)
          val mine = urls.filter(_.contains(s"/${Locators.shard(pid)}/$pid/"))
          mine.length == perProject(dtype) &&
            mine.forall(_.contains(s".$pid."))
        }
    }

  property("metadata/jxn count = |tags| x |exts| x |projects|") =
    Prop.forAll(genIds, Gen.oneOf[Dtype](Dtype.Metadata, Dtype.Jxn), genAnn) {
      (pids, dtype, ann) =>
        locator(dtype, pids, ann).urls.length == perProject(dtype) * pids.length
    }

  property("gene/exon count = |exts| annotation files + |tags| x |projects|") =
    Prop.forAll(genIds, Gen.oneOf[Dtype](Dtype.Gene, Dtype.Exon), genAnn) {
      (pids, dtype, ann) =>
        val urls = locator(dtype, pids, ann).urls
        val nAnn = Dtype.extensions(dtype).length
        urls.length == nAnn + Dtype.tags(dtype, "sra").length * pids.length &&
          urls.take(nAnn).forall(_.contains("/annotations/")) &&
          urls.take(nAnn).forall(_.contains(ann.code))
    }

  property("bw count = |tags x exts| x |projects| x |samples|, sample-sharded") =
    Prop.forAll(genIds, genIds, genAnn) { (pids, sids, ann) =>
      val urls = locator(Dtype.Bw, pids, ann, samples = sids).urls
      urls.length == perProject(Dtype.Bw) * pids.length * sids.length &&
        urls.forall(u => sids.exists(sid =>
          u.contains(s"/${Locators.shard(sid)}/") && u.contains(s"_$sid.")))
    }

  property("projects-outermost generation order") =
    Prop.forAll(genIds, genAnn) { (pids, ann) =>
      val urls = locator(Dtype.Metadata, pids, ann).urls
      val per = perProject(Dtype.Metadata)
      urls.grouped(per).toList.zip(pids).forall { case (block, pid) =>
        block.forall(_.contains(s"/$pid/"))
      }
    }

  property("every url starts at the organism root") =
    Prop.forAll(genIds, Gen.oneOf(Dtype.all), genAnn) { (pids, dtype, ann) =>
      locator(dtype, pids, ann).urls.forall(_.startsWith(root))
    }
}
