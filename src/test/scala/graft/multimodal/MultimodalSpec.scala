package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"),
    (2L, "a" * 1000),
    (3L, "xyz")).toDF("doc_id", "text")

  test("fromStrings: media schema with binary payload + metadata") {
    val m = Multimodal.fromStrings(docs, "doc_id", "text")
    assert(m.schema == Multimodal.mediaSchema)
    val r = m.filter(col("media_id") === 2L).collect()(0)
    assert(r.getAs[Long]("n_bytes") == 1000L)
    assert(r.getAs[Array[Byte]]("payload").length == 1000)
  }

  // The codec-stub INTERFACE CONTRACT, pinned so a future real-codec
  // swap has a frozen harness to pass (VERDICT r8 item 6): the stub is
  // a labeled environmental stand-in (no media libs in this container),
  // but its properties — determinism, partitioning-invariance, dims as
  // a pure function of payload size, fixed feature width — are the
  // properties the m-rows' oracles and the downstream LSH/CC stages
  // assume of ANY decoder dropped in at Multimodal.scala's two ??? sites.
  test("codec stub contract: deterministic, partitioning-invariant, size-classed dims, fixed widths") {
    val p1 = "the quick brown fox".getBytes("UTF-8")
    val p2 = "THE QUICK BROWN FOX".getBytes("UTF-8") // same length, other bytes
    // determinism: repeated decode/resize of the same payload is bit-identical
    val d1a = Multimodal.decodeStub(p1)
    val d1b = Multimodal.decodeStub(p1)
    assert(d1a._1 == d1b._1 && d1a._2 == d1b._2 && d1a._3 == d1b._3 &&
      d1a._4.toSeq == d1b._4.toSeq)
    assert(Multimodal.resizeStub(p1, 4, 4).toSeq == Multimodal.resizeStub(p1, 4, 4).toSeq)
    // size-class stability: (width, height, n_frames) depend only on
    // payload LENGTH — the property m06's size census plans shards by
    val d2 = Multimodal.decodeStub(p2)
    assert((d1a._1, d1a._2, d1a._3) == (d2._1, d2._2, d2._3),
      "equal-length payloads must land in the same size class")
    // fixed output widths: 16-dim feature, w×h resize grid — schema
    // stability regardless of input size
    assert(d1a._4.length == 16)
    assert(Multimodal.decodeStub(Array.emptyByteArray)._4.length == 16)
    assert(Multimodal.resizeStub(p1, 4, 4).length == 16)
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4, 4).length == 16)
    // partitioning-invariance: the mapPartitions transform yields the
    // same rows under any partition carve (one decoder init per
    // partition must not leak state across rows)
    val m = Multimodal.fromStrings(docs, "doc_id", "text").as[Multimodal.MediaRow]
    def run(parts: Int) =
      Multimodal.extractFeatures(m.repartition(parts))
        .collect().sortBy(_.media_id)
        .map(f => (f.media_id, f.width, f.height, f.n_frames, f.feature.toSeq)).toSeq
    assert(run(1) == run(7))
  }

  test("extractFeatures: mapPartitions batch decode with stub codec") {
    val m = Multimodal.fromStrings(docs, "doc_id", "text").as[Multimodal.MediaRow]
    val f = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f.length == 3)
    assert(f.forall(_.feature.length == 16))
    // deterministic stub: same payload -> same features
    val (w, h, n, feat) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f(0).width == w && f(0).height == h && f(0).n_frames == n)
    assert(f(0).feature.toSeq == feat.toSeq)
  }

  test("frameSample: fixed-stride binary windows, empties dropped") {
    val m = Multimodal.fromStrings(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(m, k = 4, frameBytes = 5)
    assert(frames.schema("frame").dataType == BinaryType)
    val forDoc1 = frames.filter(col("media_id") === 1L)
      .orderBy("frame_idx").collect()
    // "hello world" = 11 bytes -> 3 non-empty windows of 5
    assert(forDoc1.length == 3)
    assert(new String(forDoc1(0).getAs[Array[Byte]]("frame"), "UTF-8") == "hello")
    assert(new String(forDoc1(2).getAs[Array[Byte]]("frame"), "UTF-8") == "d")
  }

  test("resize: schema-stable fixed grid regardless of payload size") {
    val m = Multimodal.fromStrings(docs, "doc_id", "text")
      .as[Multimodal.MediaRow]
    val out = Multimodal.resize(m, 4, 2).collect().sortBy(_.media_id)
    assert(out.length == 3)
    // every output is exactly w*h wide, whether the payload is 3 bytes
    // or 1000 - the schema-stability property a training pipeline needs
    assert(out.forall(r => r.pixels.length == 8 && r.target_w == 4 && r.target_h == 2))
    // deterministic: pooling the constant payload gives the constant pixel
    val allA = out.find(_.media_id == 2L).get
    assert(allA.pixels.forall(p => math.abs(p - ('a' & 0xff) / 255.0f) < 1e-6))
    // stub agrees with a direct call
    assert(out.find(_.media_id == 1L).get.pixels.toSeq ==
      Multimodal.resizeStub("hello world".getBytes("UTF-8"), 4, 2).toSeq)
  }

  test("multimodal -> ANN hand-off: resized features bucket duplicate payloads together") {
    import graft.functions.VecFns
    graft.expressions.GraftFunctions.register(spark) // dotSeq uses graft_dot
    // resize to 8x8 = 64 dims, the LshDim the sign-LSH hyperplanes expect:
    // the full near-dup path a media pipeline runs — decode/resize ->
    // feature vector -> LSH bucket -> in-bucket exact cosine
    val media = Multimodal.fromStrings(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "completely different content in this one, nothing shared at all"))
      .toDF("doc_id", "text"), "doc_id", "text").as[Multimodal.MediaRow]
    val v = Multimodal.resize(media, 8, 8).toDF()
      .select(col("media_id"),
        VecFns.l2normalize(VecFns.toDouble(col("pixels"))).as("e"))
      .withColumn("bucket", VecFns.lshBucket(col("e")))
    val a = v.select(col("media_id").as("ma"), col("bucket"), col("e").as("ea"))
    val b = v.select(col("media_id").as("mb"), col("bucket"), col("e").as("eb"))
    val pairs = a.join(b, Seq("bucket")).filter(col("ma") < col("mb"))
      .select(col("ma"), col("mb"), VecFns.dotSeq(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") > 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), s"only the duplicate payloads pair up; got $pairs")
  }

  test("repartitionBySize: partitioning survives with all rows intact") {
    val m = Multimodal.fromStrings(docs, "doc_id", "text")
    val rep = Multimodal.repartitionBySize(m, 4)
    assert(rep.count() == 3)
    assert(rep.rdd.getNumPartitions == 4)
  }
}
