package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition batch transforms.
  *
  * The codec step is REAL for still images — decode/resize route
  * through the JDK's bundled javax.imageio codecs (PNG/JPEG, pure JVM,
  * headless-safe; see [[Multimodal.decodeImage]]) — and REAL for WAV
  * audio through the JDK's bundled javax.sound.sampled codec (16-bit
  * PCM; see [[Multimodal.decodeAudio]]). Only VIDEO is stubbed: the
  * JDK ships no video codec and this container has no native media
  * libraries (see decodeStub: a clearly-marked deterministic fake).
  * The magic-byte gate (looksLikeImage) keeps the
  * synthetic corpus's utf-8 payloads on the stub branch, so the m-row
  * oracles replay the stub arithmetic unchanged while a real image
  * payload decodes for real through the same plumbing. Everything
  * Spark-side is real either way: the schema, the mapPartitions batch
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

  /** Magic-byte gate for the REAL image branch: PNG (`\x89PNG`) and
    * JPEG (`\xFF\xD8`) only. Both lead bytes are IMPOSSIBLE in valid
    * UTF-8 (0x89/0xFF are never an initial byte), so the synthetic
    * corpus's `encode(text, 'UTF-8')` payloads can never take the real
    * branch — the m-row oracles replay the stub arithmetic and stay
    * bit-exact by construction. GIF/BMP are deliberately excluded:
    * their magics ("GIF8", "BM") are printable and a text payload
    * could collide.
    */
  private[multimodal] def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      ((p(0) == 0x89.toByte && p(1) == 0x50.toByte &&
        p(2) == 0x4e.toByte && p(3) == 0x47.toByte) ||
       (p(0) == 0xff.toByte && p(1) == 0xd8.toByte))

  /** REAL image decode over the JDK's bundled codecs (javax.imageio —
    * pure JVM, in every Java 17 runtime, headless-safe; no native
    * libs): actual (width, height, 1 frame) plus a 16-bin normalized
    * luminance histogram as the feature vector. The luma is the
    * integer Rec.601 fold (×1000 fixed-point, no float path), so the
    * histogram is deterministic across JVMs. None when the payload is
    * not a decodable PNG/JPEG — see [[looksLikeImage]].
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    if (!looksLikeImage(payload)) None
    else Option(
      // NonFatal, not just IOException: JDK image readers throw unchecked
      // exceptions (ArrayIndexOutOfBounds, CMMException, NegativeArraySize)
      // on corrupt/crafted payloads that pass the magic-byte gate — a
      // malformed image must fall back to the stub, never fail the task
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    ).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      // row-strip getRGB: one default-RGB conversion call per ROW into a
      // reused w-length buffer — avoids both the per-pixel ColorModel
      // lookup overhead of getRGB(x, y) and the second full-image int
      // buffer a whole-raster bulk read would allocate (4·w·h bytes on
      // top of the decoded raster — an OOM risk on large real images)
      val row = new Array[Int](w)
      val acc = new Array[Double](16)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          acc(math.min(15, lum >> 4)) += 1.0
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      (w, h, 1, Array.tabulate(16)(j => (acc(j) / n).toFloat))
    }

  /** Deterministic grayscale test-card PNG: pixel (x, y) has gray level
    * g = (seed·31 + x·7 + y·13) mod 256 — a raster a SQL engine can
    * replay ARITHMETICALLY, without any image library. PNG is lossless,
    * so encode → decode must return exactly this grid; m07's oracle
    * banks on that.
    */
  def renderTestCard(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // floorMod: a negative seed must still yield a gray level in
        // [0, 256) (Scala % is sign-of-dividend); identical to % for the
        // non-negative doc_id seeds the oracle rows replay
        val g = java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13, 256L).toInt
        px(y * w + x) = (g << 16) | (g << 8) | g
        x += 1
      }
      y += 1
    }
    // bulk setRGB — one raster store, not w*h ColorModel round-trips
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Integer luma ledger of a decoded image — the oracle-mirrorable
    * form of [[decodeImage]]'s histogram: (width, height, Σ luma) with
    * the same ×1000 fixed-point Rec.601 fold per pixel, summed in a
    * Long. For a GRAYSCALE raster the per-pixel luma is exactly the
    * gray level (299 + 587 + 114 = 1000), so the ledger of a
    * [[renderTestCard]] image is Σ (seed·31 + x·7 + y·13) mod 256 — a
    * sum a SQL engine computes without ever decoding. None for
    * non-images, as in [[decodeImage]].
    */
  def decodeLumaLedger(payload: Array[Byte]): Option[(Int, Int, Long)] =
    if (!looksLikeImage(payload)) None
    else Option(
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    ).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val row = new Array[Int](w) // row-strip reads, see decodeImage
      var sum = 0L
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          x += 1
        }
        y += 1
      }
      (w, h, sum)
    }

  /** Magic-byte gate for the REAL audio branch: RIFF/WAVE only
    * ("RIFF" at 0 AND "WAVE" at 8 — the RIFF container's form tag).
    * Both tags are printable, so unlike [[looksLikeImage]] this gate is
    * only consulted for rows DECLARED `kind = "audio"` (see the
    * kind-aware [[decode]]): a text payload would need to be labeled
    * audio AND carry both 4-byte tags at their exact offsets to reach
    * the real branch — the synthetic corpus's utf-8 payloads never do.
    */
  private[multimodal] def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == 'F'.toByte &&
      p(8) == 'W'.toByte && p(9) == 'A'.toByte &&
      p(10) == 'V'.toByte && p(11) == 'E'.toByte

  /** Deterministic mono 16-bit PCM test card — [[renderTestCard]]'s
    * audio sibling: sample i has unsigned level
    * u(i) = (seed·31 + i·7) mod 65536 (stored signed as u − 32768), a
    * waveform a SQL engine replays ARITHMETICALLY, without any audio
    * library. The WAV container is written by the REAL JDK encoder
    * (javax.sound.sampled.AudioSystem.write, pure JVM, headless-safe);
    * PCM is lossless, so decode must return exactly this sequence —
    * m10's oracle banks on that.
    */
  def renderAudioCard(seed: Long, nSamples: Int,
      sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, 1, true, false) // 16-bit signed PCM, little-endian
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      // floorMod, as in renderTestCard: a negative seed must still
      // yield a level in [0, 65536)
      val u = java.lang.Math.floorMod(seed * 31 + i.toLong * 7, 65536L).toInt
      val sv = u - 32768
      pcm(2 * i) = (sv & 0xff).toByte
      pcm(2 * i + 1) = ((sv >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode over the JDK's bundled WAV codec
    * (javax.sound.sampled — in every Java 17 runtime, no native libs):
    * actual (sample_rate, channels, n_frames) plus a 16-bin normalized
    * amplitude histogram as the feature vector (unsigned 16-bit level
    * >> 12 — integer binning, deterministic across JVMs, the Rec.601
    * fold's audio analog). Restricted to the exact layout the test
    * cards use (16-bit signed little-endian PCM): other depths/
    * encodings fall back to the stub rather than guess at byte order.
    * None when the payload is not decodable WAV — see [[looksLikeWav]].
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    decodePcm(payload).map { case (rate, channels, samples) =>
      val acc = new Array[Double](16)
      var i = 0
      while (i < samples.length) {
        acc(samples(i) >> 12) += 1.0
        i += 1
      }
      val n = math.max(samples.length, 1).toDouble
      (rate, channels, samples.length / math.max(channels, 1),
        Array.tabulate(16)(j => (acc(j) / n).toFloat))
    }

  /** Integer amplitude ledger of a decoded WAV — the oracle-mirrorable
    * form of [[decodeAudio]] (the [[decodeLumaLedger]] pattern):
    * (sample_rate, n_samples, Σ unsigned-16-bit level), summed in a
    * Long. For a [[renderAudioCard]] payload the ledger is
    * Σ (seed·31 + i·7) mod 65536 — a sum a SQL engine computes without
    * ever touching a codec. None for non-WAV, as in [[decodeAudio]].
    */
  def decodeAmpLedger(payload: Array[Byte]): Option[(Int, Long, Long)] =
    decodePcm(payload).map { case (rate, _, samples) =>
      var sum = 0L
      var i = 0
      while (i < samples.length) { sum += samples(i); i += 1 }
      (rate, samples.length.toLong, sum)
    }

  /** Shared REAL-codec front of [[decodeAudio]]/[[decodeAmpLedger]]:
    * payload → (rate, channels, unsigned 16-bit levels), via the JDK's
    * AudioSystem. NonFatal-hardened like [[decodeImage]]: a corrupt
    * payload behind the RIFF/WAVE gate degrades to None (→ stub),
    * never fails the task (MultimodalSpec pins this).
    */
  private def decodePcm(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (!looksLikeWav(payload)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
        if (!pcm16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val sv = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
            out(i) = sv + 32768 // unsigned level in [0, 65536)
            i += 1
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, out))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Magic-byte gate for the video branch: RIFF/"AVI " — the same
    * 8-byte two-tag rule as [[looksLikeWav]], and like it only
    * consulted for rows DECLARED `kind = "video"`.
    */
  private[multimodal] def looksLikeAvi(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == 'F'.toByte &&
      p(8) == 'A'.toByte && p(9) == 'V'.toByte &&
      p(10) == 'I'.toByte && p(11) == ' '.toByte

  /** Deterministic uncompressed video test card — [[renderTestCard]]
    * extended by a frame axis: a RIFF/AVI container (the public
    * container layout: hdrl/avih + strl/strh+strf, then a movi LIST of
    * raw `00db` DIB frames — BI_RGB, 24-bit, bottom-up rows) whose
    * frame f has gray pixel g = (seed·31 + x·7 + y·13 + f·17) mod 256.
    * Uncompressed frames need NO codec — the format's entire decode is
    * the container walk plus a raster read — which is exactly what
    * makes an honest real-video path possible in a codec-less JVM;
    * compressed video (the production norm) remains the labeled stub.
    * Widths are restricted to multiples of 4 so DIB row padding never
    * enters the formula the oracle replays.
    */
  def renderVideoCard(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    require(w % 4 == 0, "test-card width must be a multiple of 4 (no DIB row padding)")
    val frameBytes = w * 3 * h
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val avih = fourcc("avih") ++ le32(56) ++
      le32(40000) ++ le32(frameBytes * 25) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("strh") ++ le32(56) ++
      fourcc("vids") ++ fourcc("DIB ") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++ le32(nFrames) ++
      le32(frameBytes) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = fourcc("strf") ++ le32(40) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) /* BI_RGB */ ++ le32(frameBytes) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strl = fourcc("LIST") ++ le32(4 + strh.length + strf.length) ++
      fourcc("strl") ++ strh ++ strf
    val hdrl = fourcc("LIST") ++ le32(4 + avih.length + strl.length) ++
      fourcc("hdrl") ++ avih ++ strl
    val frames = (0 until nFrames).flatMap { f =>
      val px = new Array[Byte](frameBytes)
      var i = 0
      // DIB rows are BOTTOM-UP: stored row r is image row (h-1-r)
      var r = 0
      while (r < h) {
        val y = h - 1 - r
        var x = 0
        while (x < w) {
          val g = java.lang.Math.floorMod(
            seed * 31 + x * 7 + y * 13 + f * 17, 256L).toByte
          px(i) = g; px(i + 1) = g; px(i + 2) = g // B, G, R
          i += 3
          x += 1
        }
        r += 1
      }
      fourcc("00db") ++ le32(frameBytes) ++ px
    }.toArray
    val movi = fourcc("LIST") ++ le32(4 + frames.length) ++
      fourcc("movi") ++ frames
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** REAL (codec-less) video frame decode: walks the RIFF/AVI
    * container — hdrl's BITMAPINFOHEADER for (width, height, BI_RGB,
    * 24 bpp), movi's `00db` chunks for the raw bottom-up DIB rasters —
    * and returns per-frame integer luma ledgers (Rec.601 ×1000 fold,
    * the [[decodeLumaLedger]] arithmetic per frame). This is a full
    * real parse of a real public format, not a stub: dimensions and
    * sums come from actual container bytes. None (→ stub) for anything
    * but uncompressed 24-bit BI_RGB — compressed video genuinely needs
    * a codec the JVM does not have, and falling back loudly beats
    * guessing. NonFatal-hardened like the other real branches.
    */
  def decodeVideoFrames(payload: Array[Byte]): Option[(Int, Int, Array[Long])] =
    if (!looksLikeAvi(payload)) None
    else try {
      def le32(o: Int): Int =
        (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
      def tag(o: Int): String =
        new String(payload, o, 4, "US-ASCII")
      var w = -1; var h = -1; var ok = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // chunk walk: every RIFF chunk is fourcc + le32 size (+ pad to
      // even); LIST chunks carry a 4-byte list type then sub-chunks.
      // Corrupt-size hardening (the task-survival contract): a NEGATIVE
      // le32 size would stall the stride at zero (8 + (-8) + 1&(-8) =
      // 0 — an infinite loop no exception would break), so bail on the
      // whole parse instead; and the recursion is depth-BOUNDED because
      // a crafted tower of nested 12-byte LISTs would otherwise
      // StackOverflow — a VirtualMachineError NonFatal does NOT catch.
      // Real AVI nests 3 deep (RIFF > hdrl|movi > strl); 16 is generous.
      var bad = false
      def walk(from: Int, until: Int, depth: Int): Unit = {
        var o = from
        while (!bad && o + 8 <= until) {
          val t = tag(o)
          val sz = le32(o + 4)
          if (sz < 0) bad = true
          else {
            if (t == "LIST") {
              if (depth >= 16) bad = true
              else walk(o + 12, math.min(o + 8 + sz, until), depth + 1)
            } else if (t == "strf" && sz >= 40) {
              w = le32(o + 8 + 4)
              h = le32(o + 8 + 8)
              ok = le16(o + 8 + 14) == 24 && le32(o + 8 + 16) == 0 // 24bpp BI_RGB
            } else if (t == "00db" || t == "00dc") frames += ((o + 8, sz))
            o += 8 + sz + (sz & 1) // sz >= 0, so the stride is >= 8
          }
        }
      }
      walk(12, math.min(12 + le32(4) - 4, payload.length), 0)
      if (bad) ok = false
      if (!ok || w <= 0 || h <= 0) None
      else {
        val rowBytes = ((w * 3 + 3) / 4) * 4
        if (frames.exists { case (_, sz) => sz < rowBytes * h }) None
        else Some((w, h, frames.map { case (off, _) =>
          var sum = 0L
          var r = 0
          while (r < h) {
            var x = 0
            val base = off + r * rowBytes
            while (x < w) {
              val b = payload(base + x * 3) & 0xff
              val g = payload(base + x * 3 + 1) & 0xff
              val rr = payload(base + x * 3 + 2) & 0xff
              sum += (rr * 299 + g * 587 + b * 114) / 1000
              x += 1
            }
            r += 1
          }
          sum
        }.toArray))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[decodeVideoFrames]] folded into the [[MediaFeatures]] shape for
    * the dispatch: (width, height, n_frames, feature), where the
    * fixed-width feature is each of the first 16 frames' MEAN luma
    * (zero-padded past the last frame) — the per-frame temporal
    * signature a sampling pipeline keys on, in the same 16-float
    * columnar contract as the image histogram.
    */
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    decodeVideoFrames(payload).map { case (w, h, ledgers) =>
      val n = math.max(w.toLong * h, 1L)
      val feat = Array.tabulate(16)(i =>
        if (i < ledgers.length) (ledgers(i).toDouble / n).toFloat else 0.0f)
      (w, h, ledgers.length, feat)
    }

  /** Codec dispatch — what [[extractFeatures]] actually runs: the real
    * JDK image decode when the payload IS a PNG/JPEG, the real JDK WAV
    * decode when the row is DECLARED audio and the payload IS
    * RIFF/WAVE PCM, the real container-walk frame decode when the row
    * is DECLARED video and the payload IS an uncompressed RIFF/AVI,
    * the deterministic stub otherwise. A corpus with real payloads
    * decodes for real with zero plumbing change; the synthetic corpus
    * (utf-8 text payloads) always takes the stub branch, so the oracle
    * rows are unchanged by construction. The stub's remaining honest
    * territory: COMPRESSED video/audio formats, which genuinely need
    * codecs the JVM does not ship.
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    if (kind == "audio")
      decodeAudio(payload).getOrElse(decodeStub(payload))
    else if (kind == "video")
      decodeVideo(payload).getOrElse(decodeStub(payload))
    else decodeImage(payload).getOrElse(decodeStub(payload))

  /** Payload-only dispatch (image-or-stub) — kept for callers without a
    * declared kind.
    */
  def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    decodeImage(payload).getOrElse(decodeStub(payload))

  /** STUB decoder — the deterministic fallback [[decode]] uses for
    * payloads the JDK cannot decode (here: the synthetic corpus's text
    * bytes; in production: the video/audio containers awaiting a real
    * codec). Deterministic fake: "dimensions" and a 16-dim "embedding"
    * derived from payload bytes, so tests pin the plumbing end-to-end.
    * A real deployment swaps only this function; the mapPartitions
    * shape, schema, and batch contract stay identical.
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
      // per-partition decoder init goes here (ImageIO readers are
      // looked up per call; a native codec would init its session here)
      rows.map { m =>
        val (w, h, f, feat) = decode(m.kind, m.payload)
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

  /** REAL image resample (the [[decodeImage]] family): decode via the
    * JDK codecs, raster-scale to the fixed (w × h) grid with bilinear
    * interpolation on a headless BufferedImage, emit each cell's
    * Rec.601 luminance in [0, 1] row-major — the schema-stable grid a
    * training pipeline feeds a vision tower. None for non-images.
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Float]] =
    if (!looksLikeImage(payload)) None
    else Option(
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    ).map { img =>
      val scaled = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val row = new Array[Int](w) // row-strip reads, see decodeImage
      val out = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        scaled.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          out(y * w + x) = lum / 255.0f
          x += 1
        }
        y += 1
      }
      out
    }

  /** Resample dispatch — what [[resize]] actually runs: real raster
    * scaling for PNG/JPEG payloads, the deterministic stub pool for
    * everything else (same contract as [[decode]]).
    */
  def resample(payload: Array[Byte], w: Int, h: Int): Array[Float] =
    resizeImage(payload, w, h).getOrElse(resizeStub(payload, w, h))

  /** STUB resize — the deterministic fallback [[resample]] uses for
    * non-image payloads: avg-pools the
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
      // per-partition resampler init goes here (see extractFeatures)
      rows.map(m => ResizedMedia(m.media_id, m.kind, w, h, resample(m.payload, w, h)))
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
