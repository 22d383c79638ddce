package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container — see decodeStub) with a clearly-marked deterministic fake;
  * everything Spark-side is real: the schema, the mapPartitions batch
  * shape (one decoder init per partition, not per row), and the
  * partitioning contract (payloads stay columnar until the decode
  * boundary; repartition by byte-size bucket keeps decoder batches
  * balanced when payload sizes are skewed).
  */
object Multimodal {

  /** Typed media row: payload + metadata travelling together. */
  case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      n_bytes: Long)

  /** Extracted features per media item (fixed-width, columnar-friendly). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    // payload/n_bytes nullable: expression outputs (encode, octet_length)
    // are nullable in Spark's type system even over non-null inputs
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = true)))

  /** Wrap any table with a binary-able column into the media schema
    * (here: utf-8 bytes of a string column — the container has no real
    * media, so documents.text stands in as the payload source).
    */
  def fromStrings(df: DataFrame, idCol: String, strCol: String,
      kind: String = "image", mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      encode(col(strCol), "UTF-8").as("payload"),
      lit(mime).as("mime"),
      octet_length(encode(col(strCol), "UTF-8")).cast(LongType).as("n_bytes"))

  /** STUB decoder ??? — stands in for a real codec (libjpeg/ffmpeg…).
    * Deterministic fake: "dimensions" and a 16-dim "embedding" derived
    * from payload bytes, so tests pin the plumbing end-to-end. A real
    * deployment swaps only this function; the mapPartitions shape,
    * schema, and batch contract stay identical.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (n % 640)
    val height = 1 + (n % 480)
    val nFrames = 1 + (n % 16)
    // accumulate in double, cast once: float += would make the result
    // unmirrorable in SQL oracles; double sum + CAST(.. AS REAL) is the
    // same rounding in Spark and DuckDB (m03's oracle relies on this)
    val acc = new Array[Double](16)
    var i = 0
    while (i < n) {
      acc(i % 16) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    val feature = Array.tabulate(16)(j => acc(j).toFloat)
    (width, height, nFrames, feature)
  }

  /** Decode + feature-extract as a per-partition batch transform: one
    * decoder "session" per partition (the expensive init a real codec
    * needs), rows streamed through it — the Scala analog of the
    * mapInPandas batch shape.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init goes here (stubbed)
      rows.map { m =>
        val (w, h, f, feat) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.kind, m.n_bytes, w, h, f, feat)
      }
    }
  }

  /** Resized media row: fixed target grid, row-major pixels. */
  case class ResizedMedia(
      media_id: Long,
      kind: String,
      target_w: Int,
      target_h: Int,
      pixels: Array[Float])

  /** STUB resize ??? — stands in for a codec's resample: avg-pools the
    * payload byte stream into a fixed (w × h) row-major grid, so output
    * width is schema-stable regardless of input size (the property a
    * training pipeline needs from resize). Deterministic; a real
    * deployment swaps only the pooling for libjpeg/swscale.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    val cells = w * h
    // accumulate in DOUBLE, divide, cast to float once — the same
    // mirrorability rule as decodeStub (float += per step would be
    // unreproducible in the m04 oracle's sequential list_reduce fold)
    val acc = new Array[Double](cells)
    val counts = new Array[Int](cells)
    val n = math.max(payload.length, 1)
    var i = 0
    while (i < payload.length) {
      val cell = (i.toLong * cells / n).toInt
      acc(cell) += (payload(i) & 0xff) / 255.0
      counts(cell) += 1
      i += 1
    }
    Array.tabulate(cells)(c =>
      if (counts(c) > 0) (acc(c) / counts(c)).toFloat else 0.0f)
  }

  /** Resize as the same per-partition batch transform as
    * extractFeatures: one "codec" init per partition, rows streamed
    * through, fixed-width columnar output.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition resampler init goes here (stubbed)
      rows.map(m => ResizedMedia(m.media_id, m.kind, w, h, resizeStub(m.payload, w, h)))
    }
  }

  /** "Frame sample": `k` fixed-stride byte windows of the payload — the
    * shape of video frame sampling (binary slicing stays in native
    * expressions, no UDF; the lambda only captures the payload attribute,
    * not a subtree, so there is no re-evaluation blowup).
    */
  def frameSample(media: DataFrame, k: Int, frameBytes: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(k - 1)),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
      .filter(octet_length(col("frame")) > 0)

  /** Byte-size bucketing for balanced decode batches: payloads within a
    * partition vary 1000× in size; repartitioning by log2-size bucket
    * keeps each decode task's byte volume comparable.
    */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions,
      (log2(col("n_bytes") + 1)).cast(IntegerType), col("media_id"))
}
