package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Pins the REAL image path: PNG bytes out of [[Multimodal.encodePng]]
  * are a genuine PNG container, the JDK codec round-trips the exact
  * pixel grid, the decode/resize/feature kernels compute the
  * documented statistics, and corrupt payloads degrade to null rows
  * instead of failing the job.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "MultimodalSpec")
  import spark.implicits._

  test("encodePng emits a real PNG container (magic + IHDR dims)") {
    val bytes = Multimodal.encodePng(3L)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert(bytes.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    // IHDR width/height are big-endian ints at offsets 16/20
    def be32(off: Int) = (0 until 4).map(i =>
      (bytes(off + i) & 0xff) << (8 * (3 - i))).sum
    assert(be32(16) == Multimodal.imageWidth(3L))  // 11
    assert(be32(20) == Multimodal.imageHeight(3L)) // 8
  }

  test("ImageIO round-trips the exact deterministic pixel grid") {
    val id = 3L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePng(id)))
    assert(img.getWidth == Multimodal.imageWidth(id))
    assert(img.getHeight == Multimodal.imageHeight(id))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = img.getRGB(x, y)
      assert(((v >> 16) & 0xff) == Multimodal.pixelValue(id, x, y, 0))
      assert(((v >> 8) & 0xff) == Multimodal.pixelValue(id, x, y, 1))
      assert((v & 0xff) == Multimodal.pixelValue(id, x, y, 2))
    }
  }

  test("decodeImages computes channel sums from decoded pixels; " +
    "corrupt payload yields a null row, not a failure") {
    val media = Multimodal.synthesizeImages(
      Seq(0L, 3L).toDF("doc_id"), "doc_id")
      .union(Seq((99L, "not a png".getBytes("UTF-8")))
        .toDF("id", "payload"))
    val rows = Multimodal.decodeImages(media, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    // id=3: 11x8 grid; expected stats by direct arithmetic
    val (w, h) = (Multimodal.imageWidth(3L), Multimodal.imageHeight(3L))
    val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
    assert(rows(3L).getInt(1) == w && rows(3L).getInt(2) == h)
    assert(rows(3L).getLong(3) ==
      px.map { case (x, y) => Multimodal.pixelValue(3L, x, y, 0).toLong }.sum)
    assert(rows(3L).getLong(6) == px.map { case (x, y) =>
      (y.toLong * w + x + 1) * Multimodal.pixelValue(3L, x, y, 0) }.sum)
    // corrupt: id present, every metadata column null
    assert(rows(99L).isNullAt(1) && rows(99L).isNullAt(6))
  }

  test("resizeImages nearest-neighbor samples (x*w DIV tw, y*h DIV th)") {
    val media = Multimodal.synthesizeImages(Seq(7L).toDF("doc_id"), "doc_id")
    val r = Multimodal.resizeImages(media, "id", "payload", 6, 4).head()
    val (w, h) = (Multimodal.imageWidth(7L), Multimodal.imageHeight(7L))
    val rp = for (y <- 0 until 4; x <- 0 until 6)
      yield (x * w / 6, y * h / 4)
    assert(r.getInt(1) == 6 && r.getInt(2) == 4)
    assert(r.getLong(3) == rp.map { case (sx, sy) =>
      Multimodal.pixelValue(7L, sx, sy, 0).toLong }.sum)
    assert(r.getLong(5) == rp.map { case (sx, sy) =>
      Multimodal.pixelValue(7L, sx, sy, 2).toLong }.sum)
  }

  test("encodeWav emits a real RIFF/WAVE container and the JDK codec " +
    "round-trips the exact PCM series; corrupt payload yields null row") {
    val bytes = Multimodal.encodeWav(5L)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val media = Multimodal.synthesizeAudio(Seq(5L).toDF("doc_id"), "doc_id")
      .union(Seq((99L, "not a wav".getBytes("UTF-8"))).toDF("id", "payload"))
    val rows = Multimodal.decodeAudio(media, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    val n = Multimodal.audioSamples(5L)
    val samples = (0 until n).map(i => Multimodal.sampleValue(5L, i))
    assert(rows(5L).getInt(1) == n)
    assert(rows(5L).getInt(2) == 8000)
    assert(rows(5L).getLong(3) == samples.map(s => math.abs(s).toLong).sum)
    assert(rows(5L).getInt(4) == samples.min && rows(5L).getInt(5) == samples.max)
    assert(rows(5L).getLong(6) ==
      samples.zipWithIndex.map { case (s, i) => (i + 1L) * s }.sum)
    assert(rows(99L).isNullAt(1) && rows(99L).isNullAt(6))
  }

  test("decodeAudio rejects valid WAVs in unsupported layouts (8-bit, " +
    "stereo, big-endian) with a null row instead of a task failure") {
    import javax.sound.sampled._
    def wav(fmt: AudioFormat, frames: Int, bytesPerFrame: Int): Array[Byte] = {
      val data = new Array[Byte](frames * bytesPerFrame)
      var i = 0
      while (i < data.length) { data(i) = ((i * 31 + 7) & 0xff).toByte; i += 1 }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 8-bit mono (the WAV writer maps 8-bit to PCM_UNSIGNED), 16-bit
    // stereo, plus a good 16-bit mono control in the same frame.
    val eightBit = wav(new AudioFormat(8000f, 8, 1, false, false), 300, 1)
    val stereo = wav(new AudioFormat(8000f, 16, 2, true, false), 300, 4)
    val media = Seq((1L, eightBit), (2L, stereo)).toDF("id", "payload")
      .union(Multimodal.synthesizeAudio(Seq(5L).toDF("doc_id"), "doc_id"))
    val rows = Multimodal.decodeAudio(media, "id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(1) && rows(1L).isNullAt(6))
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(6))
    assert(rows(5L).getInt(1) == Multimodal.audioSamples(5L)) // control decodes
  }

  test("encodeGif emits a real multi-image GIF (magic, frame count) " +
    "and the JDK reader round-trips every frame's exact pixel grid") {
    val id = 7L
    val bytes = Multimodal.encodeGif(id)
    assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == Multimodal.gifFrames(id)) // 4
    for (f <- 0 until Multimodal.gifFrames(id)) {
      val img = reader.read(f)
      assert(img.getWidth == Multimodal.gifFrameW)
      assert(img.getHeight == Multimodal.gifFrameH)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xff) == Multimodal.gifPixel(id, f, x, y))
    }
    reader.dispose(); iis.close()
  }

  test("decodeFrames fans out one row per DECODED frame with exact " +
    "pixel stats; intro frames recur across ids sharing id % 4; " +
    "corrupt payload yields a null row") {
    val media = Multimodal.synthesizeVideos(
      Seq(2L, 6L).toDF("doc_id"), "doc_id") // 2 % 4 == 6 % 4
      .union(Seq((99L, "not a gif".getBytes("UTF-8"))).toDF("id", "payload"))
    val rows = Multimodal.decodeFrames(media, "id", "payload")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)) -> r)
      .toMap
    def expected(id: Long, f: Int): (Long, Long) = {
      val px = for (y <- 0 until Multimodal.gifFrameH;
                    x <- 0 until Multimodal.gifFrameW)
        yield (x, y, Multimodal.gifPixel(id, f, x, y))
      (px.map(_._3.toLong).sum,
        px.map { case (x, y, g) =>
          (y.toLong * Multimodal.gifFrameW + x + 1) * g }.sum)
    }
    for (id <- Seq(2L, 6L); f <- 0 until Multimodal.gifFrames(id)) {
      val (sum, ck) = expected(id, f)
      val r = rows((id, f))
      assert(r.getInt(2) == Multimodal.gifFrameW)
      assert(r.getLong(4) == sum && r.getLong(5) == ck, s"id=$id f=$f")
    }
    // shared intro card: frame 0 identical for ids congruent mod 4
    assert(rows((2L, 0)).getLong(5) == rows((6L, 0)).getLong(5))
    assert(rows((2L, 1)).getLong(5) != rows((6L, 1)).getLong(5))
    assert(rows((99L, -1)).isNullAt(1) && rows((99L, -1)).isNullAt(5))
  }

  test("extractFrameFeatures pools decoded gray by row-major index " +
    "mod dims, one vector per frame") {
    val media = Multimodal.synthesizeVideos(Seq(5L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.extractFrameFeatures(media, "id", "payload", 8)
      .collect().map(r => r.getInt(1) -> r.getSeq[Float](2)).toMap
    assert(rows.size == Multimodal.gifFrames(5L))
    for (f <- 0 until Multimodal.gifFrames(5L)) {
      val exp = new Array[Long](8)
      for (y <- 0 until Multimodal.gifFrameH; x <- 0 until Multimodal.gifFrameW)
        exp((y * Multimodal.gifFrameW + x) % 8) +=
          Multimodal.gifPixel(5L, f, x, y)
      assert(rows(f).map(_.toLong) == exp.toSeq, s"frame $f")
    }
  }

  test("extractAudioFeatures pools |s| by sample index mod dims, and " +
    "the fingerprints compose with the ANN operators: ids 65536 apart " +
    "share identical PCM and find each other at cosine 1") {
    // sampleValue(id, i) = ((id*37 + i*101) mod 65536) - 32768 and
    // audioSamples(id) = 256 + id % 128: ids 65536 apart (37 coprime
    // to 65536, 65536 % 128 == 0) encode bit-identical clips — the
    // planted exact-dup audio dedup keys on
    val ids = Seq(1L, 65537L, 2L)
    assert((0 until Multimodal.audioSamples(1L)).forall(i =>
      Multimodal.sampleValue(1L, i) == Multimodal.sampleValue(65537L, i)))
    val media = Multimodal.synthesizeAudio(ids.toDF("doc_id"), "doc_id")
    val feats = Multimodal.extractAudioFeatures(media, "id", "payload", 8)
    val byId = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // exact pooled components for id=2 by direct arithmetic
    val exp = new Array[Long](8)
    for (i <- 0 until Multimodal.audioSamples(2L))
      exp(i % 8) += math.abs(Multimodal.sampleValue(2L, i)).toLong
    assert(byId(2L).map(_.toLong) == exp.toSeq)
    assert(byId(1L) == byId(65537L)) // identical PCM -> identical vector
    // on-ramp: brute-force cosine top-k over the fingerprints puts the
    // planted dup first at exactly 1.0
    val q = typedLit(byId(1L))
    val top = Similarity.topKCosine(feats, "id", "features", q, 2).collect()
    assert(top.map(_.getLong(0)).toSet == Set(1L, 65537L))
    assert(top.forall(_.getDouble(1) == 1.0))
    // corrupt payload contributes no fingerprint row
    val bad = Seq((9L, "not a wav".getBytes("UTF-8"))).toDF("id", "payload")
    assert(Multimodal.extractAudioFeatures(bad, "id", "payload", 8)
      .collect().isEmpty)
    // dims < 1 is a driver-side argument error, not an executor-task
    // ArithmeticException
    intercept[IllegalArgumentException] {
      Multimodal.extractAudioFeatures(media, "id", "payload", 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.extractFrameFeatures(media, "id", "payload", 0)
    }
  }

  test("extractImageFeatures pools r+g+b by row-major index mod dims") {
    val media = Multimodal.synthesizeImages(Seq(4L).toDF("doc_id"), "doc_id")
    val feats = Multimodal.extractImageFeatures(media, "id", "payload", 16)
      .head().getSeq[Float](1)
    val (w, h) = (Multimodal.imageWidth(4L), Multimodal.imageHeight(4L))
    val exp = new Array[Long](16)
    for (y <- 0 until h; x <- 0 until w)
      exp((y * w + x) % 16) += (0 to 2)
        .map(c => Multimodal.pixelValue(4L, x, y, c).toLong).sum
    assert(feats.map(_.toLong) == exp.toSeq)
  }
}
