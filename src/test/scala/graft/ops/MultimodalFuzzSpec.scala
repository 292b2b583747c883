package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.GraftSession

/** Adversarial-payload fuzz over every REAL media decode path.
  *
  * The scale contract under test: on a 100 TB web-scraped corpus the
  * decoders WILL meet truncated containers, bit-flipped data, wrong
  * magic, and crafted headers — and one such payload must never kill a
  * task (the JDK codecs throw unchecked exceptions on corrupt input,
  * and an un-guarded header claiming 65535x65535 pixels would OOM the
  * executor before the data's absence is even noticed). Every decoder
  * must degrade to its documented null-row / absent-row behavior.
  *
  * The corpus is deterministic (seeded RNG): pure noise at several
  * lengths, every valid container truncated at five prefixes, 32
  * single-bit flips per container at random offsets (dimension fields
  * included — the pixel-cap guard must hold), valid magic followed by
  * garbage, plus unmutated controls that must still decode EXACTLY
  * (proving the fuzz frame is not vacuously all-null).
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "MultimodalFuzzSpec")
  import spark.implicits._

  private val pngId = 3L
  private val wavId = 5L
  private val gifId = 7L

  /** (id, payload) corpus; ids >= 1000 are the unmutated controls. */
  private lazy val corpus: Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(0xC0FFEE)
    val png = Multimodal.encodePng(pngId)
    val wav = Multimodal.encodeWav(wavId)
    val gif = Multimodal.encodeGif(gifId)
    val buf = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    buf += null
    buf += Array.emptyByteArray
    for (len <- Seq(1, 7, 64, 1024)) {
      val a = new Array[Byte](len); rnd.nextBytes(a); buf += a
    }
    for (src <- Seq(png, wav, gif); frac <- Seq(0.1, 0.3, 0.5, 0.8, 0.97))
      buf += src.take(math.max(1, (src.length * frac).toInt))
    for (src <- Seq(png, wav, gif); _ <- 0 until 32) {
      val a = src.clone()
      val i = rnd.nextInt(a.length)
      a(i) = (a(i) ^ (1 << rnd.nextInt(8))).toByte
      buf += a
    }
    for (src <- Seq(png, wav, gif)) {
      val tail = new Array[Byte](256); rnd.nextBytes(tail)
      buf += (src.take(16) ++ tail)
    }
    val fuzz = buf.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toSeq
    fuzz ++ Seq((1000L, png), (1001L, wav), (1002L, gif))
  }

  private lazy val media: DataFrame = {
    val df = corpus.toDF("id", "payload")
    df
  }

  private def nTotal = corpus.size

  test("decodeImages: one row per payload, each null-metadata or " +
    "consistent; PNG control still decodes exactly") {
    val rows = Multimodal.decodeImages(media, "id", "payload").collect()
    assert(rows.length == nTotal)
    rows.foreach { r =>
      if (r.isNullAt(1)) assert((3 to 6).forall(r.isNullAt))
      else {
        assert(r.getInt(1) > 0 && r.getInt(2) > 0)
        assert(r.getInt(1).toLong * r.getInt(2) <= Multimodal.maxDecodePixels)
      }
    }
    val ctl = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1000L).get
    val (w, h) = (Multimodal.imageWidth(pngId), Multimodal.imageHeight(pngId))
    val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
    assert(ctl.getInt(1) == w && ctl.getInt(2) == h)
    assert(ctl.getLong(6) == px.map { case (x, y) =>
      (y.toLong * w + x + 1) * Multimodal.pixelValue(pngId, x, y, 0) }.sum)
  }

  test("decodeAudio: one row per payload, null or consistent; WAV " +
    "control still round-trips the exact PCM series") {
    val rows = Multimodal.decodeAudio(media, "id", "payload").collect()
    assert(rows.length == nTotal)
    rows.foreach { r =>
      if (r.isNullAt(1)) assert((3 to 6).forall(r.isNullAt))
      else {
        assert(r.getInt(1) >= 0 && r.getInt(2) > 0)
        if (r.getInt(1) > 0) assert(r.getInt(4) <= r.getInt(5)) // min <= max
      }
    }
    val ctl = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1001L).get
    val n = Multimodal.audioSamples(wavId)
    val samples = (0 until n).map(i => Multimodal.sampleValue(wavId, i))
    assert(ctl.getInt(1) == n)
    assert(ctl.getLong(6) ==
      samples.zipWithIndex.map { case (s, i) => (i + 1L) * s }.sum)
  }

  test("decodeFrames: every payload accounted for (>= 1 row), frames " +
    "dim-capped; GIF control still yields every exact frame") {
    val rows = Multimodal.decodeFrames(media, "id", "payload").collect()
    val byId = rows.filter(r => !r.isNullAt(0))
      .groupBy(_.getLong(0))
    assert(byId.keySet == corpus.map(_._1).toSet)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(r.getInt(2) > 0 && r.getInt(3) > 0)
        assert(r.getInt(2).toLong * r.getInt(3) <= Multimodal.maxDecodePixels)
      }
    }
    val ctl = byId(1002L).sortBy(_.getInt(1))
    assert(ctl.length == Multimodal.gifFrames(gifId))
    val (w, h) = (Multimodal.gifFrameW, Multimodal.gifFrameH)
    ctl.zipWithIndex.foreach { case (r, f) =>
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (y.toLong * w + x + 1) * Multimodal.gifPixel(gifId, f, x, y)).sum
      assert(r.getLong(5) == expected)
    }
  }

  test("resizeImages and the feature extractors survive the corpus; " +
    "features have the requested arity and finite values") {
    val resized = Multimodal.resizeImages(media, "id", "payload", 4, 4).collect()
    assert(resized.length == nTotal)
    val imgFeat = Multimodal.extractImageFeatures(media, "id", "payload", 8)
      .collect()
    assert(imgFeat.nonEmpty) // controls + any flips that still decode
    imgFeat.foreach { r =>
      val fs = r.getSeq[Float](1)
      assert(fs.length == 8 && fs.forall(f => !f.isNaN && !f.isInfinite))
    }
    val frameFeat = Multimodal.extractFrameFeatures(media, "id", "payload", 8)
      .collect()
    assert(frameFeat.exists(_.getLong(0) == 1002L))
    frameFeat.foreach(r => assert(r.getSeq[Float](2).length == 8))
  }

  test("a crafted bomb header (valid container, dims edited to claim " +
    "~4G pixels) yields a null row, not an allocation") {
    // PNG IHDR width/height are big-endian ints at offsets 16/20;
    // rewrite both to 65535 and fix nothing else (the reader probes
    // dimensions from the header before the pixel cap can rely on
    // data actually being present)
    val bomb = Multimodal.encodePng(pngId).clone()
    def put16bitAt(off: Int): Unit = {
      bomb(off) = 0; bomb(off + 1) = 0
      bomb(off + 2) = 0xff.toByte; bomb(off + 3) = 0xff.toByte
    }
    put16bitAt(16); put16bitAt(20)
    val df = Seq((1L, bomb)).toDF("id", "payload")
    val r = Multimodal.decodeImages(df, "id", "payload").head()
    assert(r.isNullAt(1) && r.isNullAt(6))
    val rs = Multimodal.resizeImages(df, "id", "payload", 4, 4).head()
    assert(rs.isNullAt(1))
    assert(Multimodal.extractImageFeatures(df, "id", "payload", 8)
      .collect().isEmpty)
  }
}
