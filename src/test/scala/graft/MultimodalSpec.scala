package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
  }

  test("assetsFromDocuments carries payload bytes and modality metadata") {
    val a = Multimodal.assetsFromDocuments(docs(0L -> "abc", 1L -> "defg", 2L -> "hi"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]]("payload").length, r.getLong(4))).toList.sortBy(_._1)
    assert(a === List((0L, "image", 3, 3L), (1L, "audio", 4, 4L), (2L, "video", 2, 2L)))
  }

  test("decodeStub is deterministic and stripes by position") {
    val f1 = Multimodal.decodeStub("abcdefgh".getBytes)
    val f2 = Multimodal.decodeStub("abcdefgh".getBytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.toSeq === "abcdefgh".getBytes.map(b => (b & 0xff).toLong).toSeq)
    assert(Multimodal.decodeStub(Array.empty[Byte]).toSeq === Seq.fill(8)(0L))
  }

  test("extractFeatures runs batched over partitions with stable output") {
    val a = Multimodal.assetsFromDocuments(docs(0L -> "hello world", 1L -> "hello world"))
      .repartition(2)
    val out = Multimodal.extractFeatures(a).collect().sortBy(_.asset_id)
    assert(out.length === 2)
    assert(out(0).features.toSeq === out(1).features.toSeq)
    assert(out(0).n_bytes === 11L)
  }

  test("sampleFrames emits fixed-size windows for video assets only") {
    val text = "x" * 600 // 600 bytes → floor(600/256)=2 frames
    val a = Multimodal.assetsFromDocuments(docs(2L -> text, 3L -> "short"))
    val frames = Multimodal.sampleFrames(a).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // doc 2 is video (2 % 3 == 2); doc 3 is image (3 % 3 == 0) → excluded
    assert(frames.map(_._1).toSet === Set(2L))
    assert(frames.length === 2)
    assert(frames.forall(_._3 == 64L))
  }

  test("n_bytes and frame math are BYTE-based for non-ASCII text") {
    // 'é' is 2 UTF-8 bytes: 150 chars of "é" = 300 bytes → n_bytes=300,
    // and the video frame count follows bytes (300 < 512 → 1 frame of 64)
    val text = "é" * 150
    val a = Multimodal.assetsFromDocuments(docs(2L -> text))
    val row = a.collect().head
    assert(row.getAs[Long]("n_bytes") === 300L)
    assert(row.getAs[Array[Byte]]("payload").length === 300)
    val frames = Multimodal.sampleFrames(a).collect()
      .map(r => (r.getInt(1), r.getLong(3)))
    assert(frames.toSeq === Seq((0, 64L)))
  }

  /** A real PNG via the JDK encoder: horizontal black→white gradient. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 255 / math.max(w - 1, 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** A real 16-bit PCM WAV: quiet first half, loud constant second half. */
  private def wavBytes(samples: Int, rateHz: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](samples * 2)
    for (i <- 0 until samples) {
      val s: Short = if (i < samples / 2) 100 else 20000
      data(2 * i) = (s & 0xff).toByte          // little-endian PCM
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeImage REALLY decodes a PNG: dimensions and gradient stripes") {
    val Some((w, h, stripes)) = Multimodal.decodeImage(pngBytes(64, 8), dims = 8)
    assert((w, h) === (64, 8))
    // gradient: luminance stripe means strictly increase left to right
    assert(stripes.toSeq === stripes.toSeq.sorted)
    assert(stripes.head < stripes.last)
    // non-image bytes are rejected, not mis-decoded
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("decodeAudio REALLY parses a WAV: format metadata and amplitude stripes") {
    val Some((rate, channels, stripes)) = Multimodal.decodeAudio(wavBytes(8000), dims = 8)
    assert(rate === 8000f)
    assert(channels === 1)
    // quiet half, loud half: last stripe mean amplitude dwarfs the first
    assert(stripes.head < 200L && stripes.last > 10000L)
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("resizeImage round-trips through the JDK raster pipeline") {
    val resized = Multimodal.resizeImage(pngBytes(64, 8), 16, 4)
    assert(resized.isDefined)
    val Some((w, h, _)) = Multimodal.decodeImage(resized.get)
    assert((w, h) === (16, 4))
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("extractFeatures uses the real decoder when the payload decodes") {
    import spark.implicits._
    val assets = Seq(
      (0L, "image", pngBytes(64, 8)),          // real decode
      (1L, "audio", wavBytes(4000)),           // real decode
      (2L, "video", "opaque".getBytes),        // no JDK video codec → stub
      (3L, "image", "not an image".getBytes))  // undecodable → stub
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(out.map(_.decoded).toSeq === Seq(true, true, false, false))
    assert(out(0).features.toSeq ===
      Multimodal.decodeImage(pngBytes(64, 8)).get._3.toSeq)
    assert(out(3).features.toSeq ===
      Multimodal.decodeStub("not an image".getBytes).toSeq)
  }

  test("an injected VideoDecoder is used for video and only video") {
    import spark.implicits._
    // a fake codec standing in for an ffmpeg-JNI implementation: decodes
    // payloads starting with the magic "VID0", rejects everything else
    object FakeVideoCodec extends Multimodal.VideoDecoder {
      def decode(payload: Array[Byte], dims: Int): Option[Array[Long]] =
        if (payload.length >= 4 && payload.take(4).sameElements("VID0".getBytes))
          Some(Array.tabulate(dims)(d => payload.length.toLong * 1000 + d))
        else None
    }
    val assets = Seq(
      (0L, "video", "VID0frames".getBytes),   // fake codec decodes
      (1L, "video", "opaque".getBytes),       // fake codec rejects → stub
      (2L, "image", "VID0frames".getBytes))   // image path never sees it
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractFeatures(assets, videoDecoder = Some(FakeVideoCodec))
      .collect().sortBy(_.asset_id)
    assert(out(0).decoded && out(0).features.toSeq ===
      (0 until 8).map(d => 10000L + d))
    assert(!out(1).decoded && out(1).features.toSeq ===
      Multimodal.decodeStub("opaque".getBytes).toSeq)
    assert(!out(2).decoded) // "VID0..." is not a real image → stub
    // and under the DEFAULT decoder (MjpegAviDecoder), a non-AVI video
    // payload still stubs — the fallback flows through the same seam
    val plain = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(!plain(0).decoded && plain(0).features.toSeq ===
      Multimodal.decodeStub("VID0frames".getBytes).toSeq)
  }

  /** A real JPEG via the JDK encoder: constant gray at `level`. */
  private def jpgBytes(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (level << 16) | (level << 8) | level)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** A minimal MJPEG AVI: RIFF('AVI ') holding one LIST('movi') of
    * '00dc' JPEG frame chunks, even-padded — the container shape every
    * MJPEG tool emits (the frame parser does not need hdrl).
    */
  private def mjpegAviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val chunks = frames.flatMap { f =>
      val pad: Seq[Byte] = if (f.length % 2 == 1) Seq(0.toByte) else Seq.empty
      "00dc".getBytes.toSeq ++ le32(f.length) ++ f.toSeq ++ pad
    }
    val movi = "movi".getBytes.toSeq ++ chunks
    val list = "LIST".getBytes.toSeq ++ le32(movi.length) ++ movi
    val body = "AVI ".getBytes.toSeq ++ list
    ("RIFF".getBytes.toSeq ++ le32(body.length) ++ body).toArray
  }

  test("MjpegAviDecoder REALLY decodes MJPEG-AVI frames through ImageIO") {
    val f1 = jpgBytes(32, 8, 40)
    val f2 = jpgBytes(32, 8, 200)
    val avi = mjpegAviBytes(Seq(f1, f2))
    // the RIFF walk recovers both frame payloads byte-for-byte
    assert(Multimodal.MjpegAviDecoder.frames(avi).map(_.toSeq) ===
      Seq(f1.toSeq, f2.toSeq))
    // features are the floor-averaged per-frame luminance stripes
    val e1 = Multimodal.decodeImage(f1, 8).get._3
    val e2 = Multimodal.decodeImage(f2, 8).get._3
    val want = Array.tabulate(8)(i => (e1(i) + e2(i)) / 2).toSeq
    assert(Multimodal.MjpegAviDecoder.decode(avi, 8).get.toSeq === want)
    // and it is the DEFAULT video path of extractFeatures: a real AVI
    // decodes for real, a non-AVI payload stubs
    import spark.implicits._
    val assets = Seq((0L, "video", avi), (1L, "video", "opaque".getBytes))
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(out(0).decoded && out(0).features.toSeq === want)
    assert(!out(1).decoded)
    // malformed input degrades, never throws: truncated mid-chunk, and
    // a well-formed AVI whose frames are not JPEG (an inter-frame codec)
    assert(Multimodal.MjpegAviDecoder.decode(avi.take(30), 8).isEmpty)
    assert(Multimodal.MjpegAviDecoder
      .decode(mjpegAviBytes(Seq("h264 nal units".getBytes)), 8).isEmpty)
  }

  test("RIFF walk survives 50k-deep adversarial LIST nesting (no recursion)") {
    // nesting depth is attacker-controlled bytes; a recursive walker
    // would overflow the executor stack here
    val depth = 50000
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // t(k) = bytes of k LIST wrappers around a 2-byte '00dc' chunk
    def t(k: Int): Int = 10 + 12 * k
    val baos = new java.io.ByteArrayOutputStream()
    baos.write("RIFF".getBytes); baos.write(le32(4 + t(depth))); baos.write("AVI ".getBytes)
    for (k <- depth to 1 by -1) {
      baos.write("LIST".getBytes); baos.write(le32(4 + t(k - 1))); baos.write("movi".getBytes)
    }
    baos.write("00dc".getBytes); baos.write(le32(2)); baos.write(Array[Byte](1, 2))
    val fs = Multimodal.MjpegAviDecoder.frames(baos.toByteArray)
    assert(fs.map(_.toSeq) === Seq(Seq[Byte](1, 2)))
    // and the frame is not a JPEG → decode falls back cleanly
    assert(Multimodal.MjpegAviDecoder.decode(baos.toByteArray, 8).isEmpty)
  }

  test("sampleFramesMjpeg emits every stride-th REAL frame, skips non-AVI") {
    import spark.implicits._
    val fs = (0 until 5).map(l => jpgBytes(16, 8, 30 + l * 40))
    val assets = Seq(
      (0L, "video", mjpegAviBytes(fs)),
      (1L, "video", "opaque".getBytes),       // not AVI → no rows
      (2L, "image", mjpegAviBytes(fs)))       // not video → excluded
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.sampleFramesMjpeg(assets, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq))
    assert(out.map(o => (o._1, o._2)).toSeq === Seq((0L, 0L), (0L, 2L), (0L, 4L)))
    // emitted frames are the ORIGINAL JPEGs, byte-for-byte decodable
    assert(out.map(_._3) === Seq(fs(0).toSeq, fs(2).toSeq, fs(4).toSeq))
    out.foreach { case (_, _, f) =>
      assert(Multimodal.decodeImage(f.toArray).isDefined)
    }
  }

  test("repartitionByBytes sizes partitions by byte budget") {
    val a = Multimodal.assetsFromDocuments(docs((0L to 9L).map(i => i -> ("x" * 100)): _*))
    val parts = Multimodal.repartitionByBytes(a, bytesPerPartition = 300)
      .rdd.getNumPartitions
    assert(parts === 4) // ceil(1000/300)
  }

  /** PNG with per-column brightness given by `levels` (one luminance
    * level per column band) — lets tests craft controlled aHash bit
    * patterns from REAL decoded images.
    */
  private def bandedPng(levels: Seq[Int], h: Int = 16): Array[Byte] = {
    val w = levels.length * 4
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = levels(x / 4) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("perceptual hash: near-identical REAL images pair, contrasting ones don't") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(64)(rnd.nextInt(256))
    // near-dup: two bands nudged across the mean boundary → few bits
    val near = base.updated(5, 255).updated(40, 0)
    // contrast: the complement pattern → many bits differ
    val contra = base.map(255 - _)
    val assets = Seq(
      (1L, "image", bandedPng(base)), (2L, "image", bandedPng(near)),
      (3L, "image", bandedPng(contra)))
      .toDF("asset_id", "modality", "payload")
    val feats = Multimodal.extractFeatures(assets, dims = 64).toDF()
    assert(feats.filter(col("decoded")).count() === 3L, "all PNGs must decode")
    val hashes = feats.select(col("asset_id"),
      Multimodal.perceptualHash(col("features"), 64).as("phash"))
    val hs = hashes.as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 6,
      s"near-identical images far apart: ${java.lang.Long.bitCount(hs(1L) ^ hs(2L))}")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) >= 20,
      s"complement images too close: ${java.lang.Long.bitCount(hs(1L) ^ hs(3L))}")
    val pairs = Multimodal.perceptualNearDups(hashes, maxHamming = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)),
      s"expected exactly the near-dup pair: $pairs")
  }

  test("perceptualNearDups: pigeonhole blocks give zero false negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val hs = Seq.fill(300)(rnd.nextLong())
    // plant qualifying pairs at known hamming distances 1..6
    val planted = hs.take(6).zipWithIndex.map { case (h, i) =>
      (0 until (i + 1)).foldLeft(h)((a, b) => a ^ (1L << ((b * 11 + i) % 64)))
    }
    val all = (hs ++ planted).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("asset_id", "phash")
    val got = Multimodal.perceptualNearDups(all, maxHamming = 6)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet
    for (i <- 0 until 6)
      assert(got.contains((i.toLong, (300 + i).toLong)),
        s"planted pair at hamming ${i + 1} missed")
  }

  /** A stand-in ffmpeg honoring the two invocations the decoder makes:
    * `-version` (probe, exit 0) and the decode pipeline (consume stdin,
    * emit two deterministic 8-byte gray frames on stdout). Exercises
    * the REAL subprocess plumbing — pipes, writer thread, exit-code and
    * frame-math handling — without a codec in the container.
    */
  private def fakeFfmpeg(): String = {
    val f = java.io.File.createTempFile("fake_ffmpeg", ".sh")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("#!/bin/sh\n" +
        "if [ \"$1\" = \"-version\" ]; then echo fake; exit 0; fi\n" +
        "cat > /dev/null\n" +
        "printf '\\001\\002\\003\\004\\005\\006\\007\\010'\n" +
        "printf '\\003\\004\\005\\006\\007\\010\\011\\012'\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.setExecutable(true)
    f.getAbsolutePath
  }

  test("FfmpegDecoder drives the subprocess seam end-to-end (fake binary)") {
    val dec = new Multimodal.FfmpegDecoder(binary = fakeFfmpeg())
    // two frames, floor-averaged per position: (1,3)/2=2 … (8,10)/2=9
    val got = dec.decode("anything".getBytes, dims = 8)
    assert(got.map(_.toSeq) === Some(Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)))
  }

  test("FfmpegDecoder: absent binary and empty payload fall back to None") {
    val missing = new Multimodal.FfmpegDecoder(binary = "/nonexistent/ffmpeg-x")
    assert(missing.decode("payload".getBytes, dims = 8) === None)
    assert(!Multimodal.FfmpegDecoder.available("/nonexistent/ffmpeg-x"))
    val fake = new Multimodal.FfmpegDecoder(binary = fakeFfmpeg())
    assert(fake.decode(Array.empty[Byte], dims = 8) === None)
  }

  test("FfmpegDecoder against a real ffmpeg when the image has one") {
    assume(Multimodal.FfmpegDecoder.available(), "no ffmpeg on this image")
    val dec = new Multimodal.FfmpegDecoder()
    // a real ffmpeg must decode the MJPEG-AVI fixture the in-JVM parser
    // decodes, and both must agree on frame count > 0 semantics
    val avi = mjpegAviBytes(Seq(jpgBytes(8, 8, 0), jpgBytes(8, 8, 255)))
    val got = dec.decode(avi, dims = 8)
    assert(got.isDefined, "real ffmpeg failed to decode the MJPEG fixture")
    assert(got.get.length === 8)
  }

  test("an injected FfmpegDecoder rides extractFeatures' video path") {
    import spark.implicits._
    val dec = new Multimodal.FfmpegDecoder(binary = fakeFfmpeg())
    val assets = Seq(
      (1L, "video", "vid-bytes".getBytes),
      (2L, "text", "txt-bytes".getBytes))
      .toDF("asset_id", "modality", "payload")
    val out = Multimodal.extractFeatures(assets, dims = 8,
        videoDecoder = Some(dec))
      .collect().map(f => f.asset_id -> ((f.decoded, f.features.toSeq))).toMap
    assert(out(1L) === ((true, Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))))
    assert(out(2L)._1 === false, "non-video must never hit the video decoder")
  }

  test("AutoVideoDecoder prefers the in-JVM MJPEG parse over the subprocess") {
    // MJPEG-AVI payload: Auto must return the MjpegAviDecoder result
    // (ffmpeg is absent here, but even present it must not be consulted)
    val avi = mjpegAviBytes(Seq(jpgBytes(8, 8, 128)))
    val viaAuto = Multimodal.AutoVideoDecoder.decode(avi, dims = 8)
    val viaMjpeg = Multimodal.MjpegAviDecoder.decode(avi, dims = 8)
    assert(viaAuto.map(_.toSeq) === viaMjpeg.map(_.toSeq))
    assert(viaAuto.isDefined)
  }
}
