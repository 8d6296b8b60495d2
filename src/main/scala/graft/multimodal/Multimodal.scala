package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested: asset schema, binary
  * payloads, batched per-partition processing (`mapPartitions` over a
  * typed Dataset — the JVM twin of `mapInPandas`: one iterator per
  * partition, vectorizable, no per-row serialization round trips), and
  * partition sizing by byte budget.
  *
  * Decode is REAL for the formats the JDK decodes natively with zero
  * external dependencies: images via `javax.imageio` (PNG, JPEG, BMP,
  * GIF, WBMP) and audio via `javax.sound.sampled` (WAV/AIFF PCM).
  * Payloads those codecs reject — and all VIDEO, for which the JDK has
  * no codec — fall back to `decodeStub`, a deterministic pseudo-feature
  * over the raw bytes, so the pipeline shape is identical either way
  * and a ffmpeg-style native codec slots into the same seam.
  *
  * Scale notes: payloads never enter a shuffle — feature extraction is
  * narrow (map-only); only the small (asset_id, features, meta) rows
  * move. Repartitioning by byte budget happens on the metadata columns
  * BEFORE materializing payload-heavy work.
  */
object Multimodal {

  /** Canonical multimodal asset schema. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true), // e.g. image/png
    StructField("n_bytes", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a documents-like table into assets: the text bytes stand in
    * for an opaque media payload (deterministic test fixture).
    *
    * n_bytes is the OCTET length of the payload (UTF-8 bytes), not the
    * character count of the source text — frame math in [[sampleFrames]]
    * slices the payload in bytes, so the two must share units or any
    * non-ASCII document silently misaligns frame boundaries.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("modality"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      when(col("doc_id") % 3 === 0, (col("doc_id") % 640 + 64).cast("int")).as("width"),
      when(col("doc_id") % 3 === 0, (col("doc_id") % 480 + 48).cast("int")).as("height"),
      when(col("doc_id") % 3 =!= 0, (col("doc_id") * 40 % 90000).cast("long")).as("duration_ms"))

  /** STUB decode: a real implementation would decode the payload with a
    * codec and emit pixel/sample buffers. The stub derives an 8-dim
    * deterministic pseudo-feature from payload bytes (rolling hash per
    * stripe) so downstream stages exercise realistic shapes.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Long] = {
    val acc = Array.fill(dims)(0L)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) = (acc(i % dims) * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  /** REAL image decode via the JDK's built-in ImageIO codecs (no
    * external native libraries). Returns (width, height, `dims` mean-
    * luminance column stripes) or None when the payload is not an image
    * ImageIO can read — callers fall back to the stub. Luminance uses
    * the integer ITU-R 601 weights (299/587/114), so features are
    * deterministic across JVMs.
    */
  /** ImageIO's default stream cache spills every read through a temp
    * FILE — pure overhead (and a /tmp dependency) when the payload is
    * already an in-memory byte array in a per-row hot path.
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def decodeImage(payload: Array[Byte], dims: Int = 8): Option[(Int, Int, Array[Long])] = {
    if (payload == null || payload.length == 0) return None
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val acc = Array.fill(dims)(0L)
        val cnt = Array.fill(dims)(0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            val cell = math.min(x * dims / w, dims - 1)
            acc(cell) += lum
            cnt(cell) += 1
            x += 1
          }
          y += 1
        }
        Some((w, h, Array.tabulate(dims)(i => if (cnt(i) == 0) 0L else acc(i) / cnt(i))))
      }
    } catch { case _: Exception => None }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF PCM,
    * no external codecs). Returns (sampleRate, channels, `dims` mean-
    * absolute-amplitude stripes over the 16-bit samples) or None when
    * the payload is not a parseable audio stream. 8-bit streams fall
    * back to byte magnitudes; compressed audio (MP3 etc.) is not in the
    * JDK and lands on the stub like video.
    */
  def decodeAudio(payload: Array[Byte], dims: Int = 8): Option[(Float, Int, Array[Long])] = {
    if (payload == null || payload.length == 0) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
      val fmt = in.getFormat
      val data = in.readAllBytes()
      in.close()
      val acc = Array.fill(dims)(0L)
      val cnt = Array.fill(dims)(0L)
      if (fmt.getSampleSizeInBits == 16 && data.length >= 2) {
        val n = data.length / 2
        var i = 0
        while (i < n) {
          val (lo, hi) = if (fmt.isBigEndian) (data(2 * i + 1), data(2 * i))
            else (data(2 * i), data(2 * i + 1))
          val sample = ((hi << 8) | (lo & 0xff)).toShort.toInt
          val cell = math.min(i * dims / n, dims - 1)
          acc(cell) += math.abs(sample)
          cnt(cell) += 1
          i += 1
        }
      } else {
        val n = data.length
        var i = 0
        while (i < n) {
          val cell = math.min(i * dims / n, dims - 1)
          acc(cell) += math.abs(data(i).toInt)
          cnt(cell) += 1
          i += 1
        }
      }
      Some((fmt.getSampleRate, fmt.getChannels,
        Array.tabulate(dims)(i => if (cnt(i) == 0) 0L else acc(i) / cnt(i))))
    } catch {
      // catch-all like decodeImage: AudioFileReader providers can throw
      // runtime exceptions on adversarial headers, and one bad asset
      // must fall back to the stub, not abort a corpus-scale extraction
      case _: Exception => None
    }
  }

  /** Image resize through the JDK raster pipeline: decode, scale with
    * Graphics2D, re-encode (`format` = any ImageIO writer, e.g. "png").
    * None when the payload is not a decodable image.
    */
  def resizeImage(payload: Array[Byte], width: Int, height: Int,
      format: String = "png"): Option[Array[Byte]] = {
    imageIoNoDiskCache
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map { img =>
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, width, height, null)
          finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, format, baos)
          baos.toByteArray
        }
    } catch { case _: Exception => None }
  }

  /** Feature-extraction output row: integer stripe features — real
    * luminance/amplitude stripes when the JDK could decode the payload,
    * the deterministic stub fingerprint otherwise (`decoded` says which).
    */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
      features: Array[Long], decoded: Boolean)

  /** The video-decode seam: any decoder (an ffmpeg-JNI implementation,
    * or the built-in [[MjpegAviDecoder]]) plugs into [[extractFeatures]]
    * without touching the pipeline shape. Must be Serializable: it is
    * shipped inside the task closure and called executor-side, once per
    * asset.
    */
  trait VideoDecoder extends Serializable {
    /** `dims` stripe features for a decodable video payload, or None to
      * fall back to the stub (same contract as decodeImage/decodeAudio).
      */
    def decode(payload: Array[Byte], dims: Int): Option[Array[Long]]
  }

  /** REAL video decode for the one container family the JDK can fully
    * handle: MJPEG-in-AVI. AVI is a documented RIFF container, and in
    * the MJPEG variant every frame chunk (`##dc`/`##db` inside the
    * `movi` LIST) is a standalone JPEG — which ImageIO decodes
    * natively, no external codec. The parser walks the RIFF chunk tree
    * with pure bounds-checked byte arithmetic (malformed input → None →
    * stub fallback, never an exception), runs each frame through
    * [[decodeImage]]'s luminance stripes, and averages per-stripe
    * across frames with floor division — frame-order-fixed, so features
    * are deterministic. Inter-frame codecs (H.264, VP9, …) still have
    * no JDK decoder and keep riding the stub through the same seam.
    */
  object MjpegAviDecoder extends VideoDecoder {
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Frame chunk payloads from the RIFF tree; Nil when not an AVI.
      * The walk uses an explicit worklist, not recursion: LIST nesting
      * depth is attacker-controlled bytes, and a crafted
      * deeply-nested payload must not overflow an executor stack.
      */
    private[graft] def frames(b: Array[Byte]): Seq[Array[Byte]] = {
      if (b == null || b.length < 12 ||
        fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return Nil
      val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      // (cursor, end) regions still to scan; each iteration consumes one
      // chunk and pushes at most one nested region — O(chunks) total
      val work = scala.collection.mutable.Stack[(Int, Int)]((12, b.length))
      while (work.nonEmpty) {
        val (o, end) = work.pop()
        if (o + 8 <= end) {
          val id = fourcc(b, o)
          val sz = le32(b, o + 4).toInt
          val dataStart = o + 8
          val dataEnd = dataStart + sz
          if (sz >= 0 && dataEnd <= end) { // else malformed: drop region
            work.push((dataEnd + (sz & 1), end)) // continue after chunk
            if (id == "LIST" && sz >= 4) work.push((dataStart + 4, dataEnd))
            else if (id(0).isDigit && id(1).isDigit && id(2) == 'd' &&
              (id(3) == 'c' || id(3) == 'b') && sz > 0)
              out += java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
          }
        }
      }
      out.toSeq
    }

    def decode(payload: Array[Byte], dims: Int): Option[Array[Long]] = {
      val fs = frames(payload)
      if (fs.isEmpty) None
      else {
        val per = fs.flatMap(f => decodeImage(f, dims).map(_._3))
        // container parsed but frames are not JDK-decodable images
        // (a non-MJPEG AVI) → stub fallback
        if (per.isEmpty) None
        else Some(Array.tabulate(dims)(i => per.map(_(i)).sum / per.length))
      }
    }
  }

  /** Subprocess decoder for inter-frame codecs (H.264, VP9, …) behind
    * the same [[VideoDecoder]] seam: pipes the payload to an `ffmpeg`
    * binary on the executor image and reads raw grayscale frames back —
    * payload in on stdin, `dims`-wide scaled rows out on stdout, no
    * temp files, stderr discarded (a blocked stderr pipe would deadlock
    * the child). Absent binary, malformed payload, non-zero exit,
    * timeout → None → the deterministic stub, exactly the
    * [[MjpegAviDecoder]] fallback contract. Features are the
    * per-position floor-average of up to `maxFrames` frames, each frame
    * scaled by ffmpeg to one `dims`-byte luminance row.
    *
    * Deliberately NOT the [[extractFeatures]] default: the oracle faces
    * replay the stub/MJPEG features engine-independently, and a decoder
    * whose output depends on which ffmpeg build happens to be installed
    * would make them machine-dependent. Callers with real video corpora
    * inject it (or [[AutoVideoDecoder]]) explicitly.
    *
    * The binary path is injectable for tests; availability is probed
    * once per (binary, JVM) — executors cache the probe, so a missing
    * binary costs one failed exec per executor, not per asset.
    */
  class FfmpegDecoder(binary: String = "ffmpeg", maxFrames: Int = 16,
      timeoutMs: Long = 30000L) extends VideoDecoder {
    def decode(payload: Array[Byte], dims: Int): Option[Array[Long]] = {
      if (payload == null || payload.isEmpty ||
        !FfmpegDecoder.available(binary)) return None
      try {
        val pb = new ProcessBuilder(binary, "-v", "error", "-i", "pipe:0",
          "-f", "rawvideo", "-pix_fmt", "gray", "-vf", s"scale=$dims:1",
          "-vframes", maxFrames.toString, "pipe:1")
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val p = pb.start()
        // stdin feeds on its own daemon thread: ffmpeg may stop reading
        // once it has the frames it needs, and a single-threaded
        // write-then-read would deadlock on a full stdin pipe
        val writer = new Thread(() => {
          try { p.getOutputStream.write(payload); p.getOutputStream.close() }
          catch { case _: java.io.IOException => () }
        })
        writer.setDaemon(true)
        writer.start()
        val out = p.getInputStream.readAllBytes()
        val done = p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (!done) { p.destroyForcibly(); return None }
        writer.join(1000L)
        val nFrames = out.length / dims
        if (p.exitValue() != 0 || nFrames == 0) None
        else Some(Array.tabulate(dims) { i =>
          (0 until nFrames).map(f => out(f * dims + i) & 0xffL).sum / nFrames
        })
      } catch { case _: Exception => None }
    }
  }

  object FfmpegDecoder {
    private val probed =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    /** One `-version` exec per (binary, JVM); false on any failure. */
    def available(binary: String = "ffmpeg"): Boolean =
      probed.computeIfAbsent(binary, b => try {
        val p = new ProcessBuilder(b, "-version")
          .redirectErrorStream(true).start()
        p.getOutputStream.close()
        p.getInputStream.readAllBytes()
        p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
      } catch { case _: Exception => java.lang.Boolean.FALSE })
  }

  /** Capability-maximal composite: the in-JVM MJPEG-AVI parse first
    * (cheap, deterministic, no subprocess), then the ffmpeg subprocess
    * when the binary is present — the "real decode when the image has
    * ffmpeg, stub otherwise" production wiring, kept OUT of the oracle
    * faces' default (see [[FfmpegDecoder]]'s determinism note).
    */
  object AutoVideoDecoder extends VideoDecoder {
    private val ffmpeg = new FfmpegDecoder()
    def decode(payload: Array[Byte], dims: Int): Option[Array[Long]] =
      MjpegAviDecoder.decode(payload, dims)
        .orElse(ffmpeg.decode(payload, dims))
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * stage: one iterator in, one iterator out, constant memory per batch.
    * Dispatches to the real JDK decoder for the asset's modality and
    * falls back to the stub for undecodable payloads; video decodes for
    * real when the payload is an MJPEG AVI (the default
    * [[MjpegAviDecoder]]) — inject another [[VideoDecoder]] for
    * inter-frame codecs, or None to force the stub.
    */
  def extractFeatures(assets: DataFrame, dims: Int = 8,
      videoDecoder: Option[VideoDecoder] = Some(MjpegAviDecoder)): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          val p = if (payload == null) Array.empty[Byte] else payload
          val real = modality match {
            case "image" => decodeImage(p, dims).map(_._3)
            case "audio" => decodeAudio(p, dims).map(_._3)
            case "video" => videoDecoder.flatMap(_.decode(p, dims))
            case _ => None
          }
          AssetFeatures(id, modality, p.length.toLong,
            real.getOrElse(decodeStub(p, dims)), real.isDefined)
        }
      }
  }

  /** Average-hash perceptual fingerprint from a feature vector: bit d
    * set iff stripe d exceeds the vector MEAN — in integer
    * cross-multiplied form (f_d·dims > Σf), so no division decides a
    * bit. On decoded luminance grids (dims 64 via [[extractFeatures]])
    * this is the classic aHash: brightness/scale/format changes move
    * few bits, so Hamming distance is the media-similarity metric the
    * text pipelines get from SimHash. On stub features it still
    * buckets byte-identical payloads deterministically.
    */
  def perceptualHash(features: Column, dims: Int): Column = {
    val total = aggregate(features, lit(0L), (a, x) => a + x)
    aggregate(sequence(lit(0), lit(dims - 1)), lit(0L),
      (acc, d) => acc.bitwiseOR(
        when(element_at(features, d + 1) * dims > total,
          call_function("shiftleft", lit(1L), d)).otherwise(lit(0L))))
  }

  /** Banded Hamming near-dup pairing over 64-bit perceptual hashes —
    * the SimHash block scheme on media: candidates share one of
    * `bits/blockBits` hash blocks, verified by exact popcount. The
    * pigeonhole guarantee carries over: maxHamming < nBlocks means any
    * qualifying pair has at least one intact block — ZERO false
    * negatives. Scale shape identical to text SimHash: equi-join on
    * (block, value), never a cross product; hash columns are single
    * longs, payloads never shuffle.
    */
  def perceptualNearDups(hashes: DataFrame, maxHamming: Int = 6,
      blockBits: Int = 8, bits: Int = 64): DataFrame = {
    require(maxHamming < bits / blockBits,
      "pigeonhole guarantee needs maxHamming < number of blocks")
    val mask = (1L << blockBits) - 1L
    val blocks = hashes.select(col("asset_id"), col("phash"),
        explode(sequence(lit(0), lit(bits / blockBits - 1))).as("b"))
      .withColumn("bv",
        call_function("shiftright", col("phash"),
          (col("b") * blockBits).cast("int")).bitwiseAND(lit(mask)))
    blocks.as("x").join(blocks.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("asset_id_a"),
        col("y.asset_id").as("asset_id_b"),
        col("x.phash").as("ph_a"), col("y.phash").as("ph_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("asset_id_a", "asset_id_b", "hamming")
  }

  /** Frame sampling for video-like assets: emit every `stride`-th
    * fixed-size window of the payload as one "frame" (stub for a real
    * frame decoder; the explode/partition shape is the real thing).
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor(col("n_bytes") / lit(frameBytes.toLong * stride)).cast("int")
    assets
      .where(col("modality") === "video")
      .select(col("asset_id"), col("n_bytes"),
        posexplode(transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(col("payload"), (i * frameBytes * stride) + 1, lit(frameBytes)))))
      .select(col("asset_id"), col("pos").as("frame_idx"),
        col("col").as("frame_payload"), length(col("col")).cast("long").as("frame_bytes"))
  }

  /** REAL frame sampling for MJPEG-AVI payloads — the decoded twin of
    * [[sampleFrames]]: every `stride`-th ACTUAL video frame (a
    * standalone JPEG, directly decodable downstream) instead of a byte
    * window. Non-AVI payloads contribute no rows — the caller decides
    * whether to fall back to the byte-window face. Same scale shape:
    * per-asset flatMap inside mapPartitions, frames never shuffle
    * unless the caller moves them.
    */
  def sampleFramesMjpeg(assets: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("modality") === "video")
      .select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        MjpegAviDecoder.frames(payload).zipWithIndex
          .collect { case (f, i) if i % stride == 0 =>
            (id, i.toLong, f, f.length.toLong)
          }
      })
      .toDF("asset_id", "frame_idx", "frame_payload", "frame_bytes")
  }

  /** Byte-budget repartitioning: size partitions so that
    * sum(n_bytes)/partition ≈ budget — the knob that keeps payload
    * batches inside executor memory at 100 TB.
    */
  def repartitionByBytes(assets: DataFrame, bytesPerPartition: Long): DataFrame = {
    require(bytesPerPartition > 0,
      s"bytesPerPartition must be positive, got $bytesPerPartition")
    val total = Option(assets.agg(sum("n_bytes")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1, math.ceil(total.toDouble / bytesPerPartition).toInt)
    assets.repartition(parts, col("asset_id"))
  }
}
