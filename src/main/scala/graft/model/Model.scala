package graft.model

/** Data model of the recount3 corpus client (reference:
  * /root/reference/src/pyrecount/models.py:7-41) as Scala ADTs.
  */
sealed abstract class Dtype(val tag: String)
object Dtype {
  case object Metadata extends Dtype("metadata")
  case object Gene extends Dtype("gene_sums")
  case object Exon extends Dtype("exon_sums")
  case object Jxn extends Dtype("junctions")
  case object Bw extends Dtype("base_sums")

  val all: Seq[Dtype] = Seq(Metadata, Gene, Exon, Jxn, Bw)

  /** File extensions per data type (models.py:35-41). */
  def extensions(d: Dtype): Seq[String] = d match {
    case Metadata => Seq("MD.gz")
    case Gene | Exon => Seq("gtf.gz")
    case Jxn => Seq("MM.gz", "RR.gz", "ID.gz")
    case Bw => Seq("ALL.bw")
  }

  /** File-name tags per data type (models.py:25-32, locator.py:57-64):
    * metadata expands to the dbase-specific file plus the four shared
    * metadata sources; every other dtype tags with its own name.
    */
  def tags(d: Dtype, dbase: String): Seq[String] = d match {
    case Metadata =>
      dbase +: Seq("recount_project", "recount_qc", "recount_seq_qc", "recount_pred")
    case other => Seq(other.tag)
  }
}

/** Annotation releases (models.py:8-15). */
sealed abstract class Annotation(val code: String)
object Annotation {
  case object GencodeV29 extends Annotation("G029")
  case object GencodeV26 extends Annotation("G026")
  case object Fantom6Cat extends Annotation("F006")
  case object RefSeq extends Annotation("R109")
  case object Ercc extends Annotation("ERCC")
  case object Sirv extends Annotation("SIRV")
  case object GencodeV23 extends Annotation("M023")

  val all: Seq[Annotation] =
    Seq(GencodeV29, GencodeV26, Fantom6Cat, RefSeq, Ercc, Sirv, GencodeV23)
}

object Model {
  /** Name of the remote index file listing data sources (models.py:4). */
  val HomesIndex = "homes_index"

  /** The GTF attribute fields extracted into columns (accessor.py:227-240). */
  val GtfFields: Seq[String] = Seq(
    "gene_id", "transcript_id", "exon_number", "gene_name", "gene_source",
    "gene_biotype", "transcript_name", "transcript_source",
    "transcript_biotype", "protein_id", "exon_id", "tag")

  /** Composite key joining per-project metadata files (accessor.py:470). */
  val MetadataJoinKey: Seq[String] = Seq("rail_id", "external_id", "study")

  /** Exon composite-ID fields, split from `chrom|start|end|strand`
    * (accessor.py:548-560).
    */
  val ExonIdFields: Seq[String] = Seq("chrom", "start", "end", "strand")
}
