package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs batched per partition (`mapPartitions`) so
  * codec/model initialization amortizes per task — the Scala analog
  * of `mapInPandas` batch UDFs.
  *
  * IMAGES decode FOR REAL via the JDK's own codec
  * (`javax.imageio.ImageIO`, PNG/JPEG — no external dependency):
  * [[decodeImages]] / [[resizeImages]] / [[extractImageFeatures]]
  * parse the actual payload bytes into pixels and derive their
  * outputs from decoded channel values. Test images come from
  * [[synthesizeImages]] — deterministic PNGs whose pixel (x,y,c) is
  * pure modular arithmetic in (id,x,y,c), so a DuckDB oracle can
  * recompute every channel statistic WITHOUT a codec: the hashes
  * only match if the decode returns the exact encoded pixels.
  *
  * AUDIO decodes FOR REAL too (`javax.sound.sampled`, WAV/PCM —
  * also JDK-native): [[decodeAudio]] parses the RIFF container and
  * PCM frames of payloads from [[synthesizeAudio]], whose sample
  * series is again pure arithmetic in (id, i) — same
  * oracle-without-a-codec discipline as the image path.
  *
  * VIDEO-SHAPED (multi-frame) payloads decode FOR REAL as animated
  * GIF — the one genuinely multi-frame container the JDK codec
  * registry ships (`ImageReader.getNumImages(true)` / `read(i)`):
  * [[decodeFrames]] fans each payload from [[synthesizeVideos]] out
  * to one row per DECODED frame with per-frame pixel statistics,
  * under the same oracle-without-a-codec discipline (the frame grid
  * is pure arithmetic in (id, frame, x, y)). For opaque containers
  * the JDK has no codec for (MP4 et al.), [[sampleFrames]] keeps the
  * byte-level plumbing — schema, partitioning, batch iteration,
  * fan-out shape — real and oracle-checked, with the codec call
  * clearly marked as the substitution point. (The former md5-fake
  * decode/resize/feature stubs are retired: every decode path here
  * runs an actual JDK codec.)
  */
object Multimodal {

  // ---- real image path (javax.imageio) -----------------------------

  /** Deterministic synthetic-image spec shared with every oracle:
    * width `8 + id % 5`, height `8 + id % 3`, channel value
    * `(id*31 + x*7 + y*13 + c*97) mod 256` (c = 0/1/2 for R/G/B).
    */
  def imageWidth(id: Long): Int = (8 + id % 5).toInt
  def imageHeight(id: Long): Int = (8 + id % 3).toInt
  def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
    java.lang.Math.floorMod(id * 31 + x * 7 + y * 13 + c * 97, 256L).toInt

  /** Encode one synthetic image to real PNG bytes (lossless — decode
    * returns the exact [[pixelValue]] grid).
    */
  def encodePng(id: Long): Array[Byte] = {
    val w = imageWidth(id); val h = imageHeight(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pixelValue(id, x, y, 0) << 16) |
          (pixelValue(id, x, y, 1) << 8) | pixelValue(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (id, payload) frame of real PNG payloads, batched per partition
    * (encoder state amortized; in-memory stream cache — no temp-file
    * I/O per image).
    */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (r.isNullAt(0)) Iterator.empty
        else Iterator.single(Row(r.getLong(0), encodePng(r.getLong(0))))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("px_checksum", LongType)))

  /** Decode each payload's header+pixels with the REAL JDK codec and
    * emit dimensions, per-channel sums, and a position-weighted red
    * checksum (`sum (y*w + x + 1) * r` — pixel scrambling flips it).
    * Undecodable payloads yield a null-metadata row instead of
    * failing the job (one corrupt file never kills a 100 TB pass).
    */
  def decodeImages(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        it.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val img = readImage(r.getAs[Array[Byte]](1))
          if (img == null) Row(id, null, null, null, null, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                val red = (v >> 16) & 0xff
                sr += red; sg += (v >> 8) & 0xff; sb += v & 0xff
                ck += (y.toLong * w + x + 1) * red
                x += 1
              }
              y += 1
            }
            Row(id, w, h, sr, sg, sb, ck)
          }
        }
      }
    spark.createDataFrame(rdd, imageMetaSchema)
  }

  val imageIdentitySchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", IntegerType),
    StructField("px_digest", StringType)))

  /** REAL metadata + content-identity card: decode each payload with
    * the JDK codec and emit dimensions plus an md5 digest of the
    * row-major decoded RGB stream (`"r,g,b"` pixels joined by `";"`)
    * — the integrity fingerprint a media-dedup manifest keys on
    * (identical rasters collide regardless of container bytes;
    * any single-pixel decode error flips it). Undecodable payloads
    * yield a null-metadata row instead of failing the job — one
    * corrupt file never kills a 100 TB pass. Retired the former md5
    * byte-length stub (`decodeStub`): this runs the actual codec.
    */
  def extractImageMetadata(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val img = readImage(r.getAs[Array[Byte]](1))
          if (img == null) Row(id, null, null, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val sb = new java.lang.StringBuilder(w * h * 12)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                if (y > 0 || x > 0) sb.append(';')
                sb.append((v >> 16) & 0xff).append(',')
                  .append((v >> 8) & 0xff).append(',').append(v & 0xff)
                x += 1
              }
              y += 1
            }
            md.reset()
            val digest = md.digest(sb.toString.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
            Row(id, w, h, w * h, digest)
          }
        }
      }
    spark.createDataFrame(rdd, imageIdentitySchema)
  }

  /** Pixel-count ceiling for every image/frame decode: a payload whose
    * header claims more pixels than this decodes as null instead of
    * being read. Decompression-bomb defence — `ImageIO.read` allocates
    * the full `w*h` raster BEFORE seeing whether the data backs it, so
    * a 12-byte header edit claiming 65535x65535 would otherwise OOM an
    * executor (an Error, uncatchable) mid-pass. 2^24 pixels = a 64 MB
    * ARGB raster, comfortably above any real thumbnail corpus.
    */
  val maxDecodePixels: Long = 1L << 24

  /** Null-safe image decode: null/corrupt/oversized bytes -> null.
    * Probes header-only dimensions via the reader API before any
    * raster allocation (see [[maxDecodePixels]]), and catches NonFatal
    * rather than just IOException — the JDK codecs surface unchecked
    * exceptions (ArrayIndexOutOfBounds, NegativeArraySize,
    * IllegalArgument) on truncated or bit-flipped containers, and the
    * null-row contract must hold for those too (MultimodalFuzzSpec).
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null) null
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); null }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > maxDecodePixels) null
          else reader.read(0)
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  // ---- real audio path (javax.sound.sampled, WAV/PCM) --------------

  /** Deterministic synthetic-audio spec shared with every oracle:
    * `8000 Hz, 16-bit signed mono PCM`, `256 + id % 128` samples,
    * sample i = `((id*37 + i*101) mod 65536) - 32768`.
    */
  def audioSamples(id: Long): Int = (256 + id % 128).toInt
  def sampleValue(id: Long, i: Int): Int =
    (java.lang.Math.floorMod(id * 37 + i.toLong * 101, 65536L) - 32768L).toInt

  /** Encode one synthetic clip to a real RIFF/WAVE container via the
    * JDK's own audio codec (PCM is lossless — decode returns the
    * exact [[sampleValue]] series).
    */
  def encodeWav(id: Long): Array[Byte] = {
    val n = audioSamples(id)
    val data = new Array[Byte](n * 2) // 16-bit little-endian
    var i = 0
    while (i < n) {
      val s = sampleValue(id, i)
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** (id, payload) frame of real WAV payloads, batched per partition. */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(0)) Iterator.empty
        else Iterator.single(Row(r.getLong(0), encodeWav(r.getLong(0))))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("sum_abs", LongType),
    StructField("min_s", IntegerType),
    StructField("max_s", IntegerType),
    StructField("pcm_checksum", LongType)))

  /** Decode each payload's RIFF header + PCM frames with the REAL JDK
    * audio codec and emit frame count, sample rate, the absolute
    * amplitude mass, extremes, and a position-weighted checksum
    * (`sum (i+1) * sample_i` — sample reordering flips it).
    * Undecodable payloads yield a null-metadata row.
    */
  def decodeAudio(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val bytes = r.getAs[Array[Byte]](1)
          // NonFatal (not just Unsupported/IOException): malformed RIFF
          // headers can drive the JDK parser into unchecked exceptions,
          // and the null-row contract must hold for those too.
          val ais =
            if (bytes == null) null
            else try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (ais == null) Row(id, null, null, null, null, null, null)
          else {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            // The sample loop below indexes PCM as 16-bit signed
            // little-endian mono; a *valid* WAV in any other layout
            // (8-bit, stereo, big-endian, float, unknown length) must
            // take the documented null-metadata path, not corrupt the
            // stats or walk off the end of the buffer.
            val layoutOk =
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 &&
              fmt.getChannels == 1 &&
              !fmt.isBigEndian &&
              frames >= 0 && frames <= Int.MaxValue.toLong
            if (!layoutOk) Row(id, null, null, null, null, null, null)
            else {
              val n = frames.toInt
              // the codec stream can still fail mid-read on a payload
              // whose header passed validation (truncated data chunk)
              val pcm =
                try ais.readAllBytes()
                catch { case scala.util.control.NonFatal(_) => null }
              if (pcm == null || pcm.length < 2 * n)
                Row(id, null, null, null, null, null, null)
              else {
                var sumAbs = 0L; var ck = 0L
                var mn = Int.MaxValue; var mx = Int.MinValue
                var i = 0
                while (i < n) {
                  val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
                  sumAbs += math.abs(s)
                  ck += (i.toLong + 1) * s
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  i += 1
                }
                Row(id, n, fmt.getSampleRate.toInt, sumAbs,
                  if (n == 0) null else Integer.valueOf(mn),
                  if (n == 0) null else Integer.valueOf(mx), ck)
              }
            }
          }
        }
      }
    spark.createDataFrame(rdd, audioMetaSchema)
  }

  /** REAL audio fingerprints: decode the PCM series and pool absolute
    * amplitude by sample index mod `dims` — the strided-pooling
    * signature shared with [[extractImageFeatures]] /
    * [[extractFrameFeatures]], and the on-ramp from audio-shaped
    * payloads into the ANN / near-dup vector operators (clip-level
    * near-dup, cross-source audio contamination). Components are
    * integer-valued floats bounded by `384 * 32768 < 2^24`, so
    * downstream cosine math stays oracle-exact. Identical PCM ==
    * identical vector (cosine 1), which is what audio dedup keys on.
    * Undecodable or unsupported-layout payloads emit no row, mirroring
    * the image extractor; format guards are [[decodeAudio]]'s.
    */
  def extractAudioFeatures(media: DataFrame, idCol: String,
      payloadCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = if (r.isNullAt(0)) null else r.getAs[Array[Byte]](1)
          val ais =
            if (bytes == null) null
            else try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (ais == null) Iterator.empty
          else {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val layoutOk =
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 &&
              fmt.getChannels == 1 &&
              !fmt.isBigEndian &&
              frames >= 0 && frames <= Int.MaxValue.toLong
            val pcm =
              if (!layoutOk) null
              else try ais.readAllBytes()
              catch { case scala.util.control.NonFatal(_) => null }
            val n = if (frames >= 0 && frames <= Int.MaxValue.toLong) frames.toInt else 0
            if (pcm == null || pcm.length < 2 * n) Iterator.empty
            else {
              val acc = new Array[Long](dims)
              var i = 0
              while (i < n) {
                val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
                acc(i % dims) += math.abs(s)
                i += 1
              }
              Iterator.single(Row(r.getLong(0), acc.map(_.toFloat).toSeq))
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL resize: decode with ImageIO, nearest-neighbor resample to
    * (targetW, targetH) — source pixel `(x*w DIV tw, y*h DIV th)`,
    * the deterministic kernel both engines can reproduce (Graphics2D
    * interpolation would be JVM-implementation-defined) — and emit
    * the resized grid's channel sums. Batched per partition like
    * every media op.
    */
  def resizeImages(media: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val img = readImage(r.getAs[Array[Byte]](1))
          if (img == null) Row(id, null, null, null, null, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
            var y = 0
            while (y < targetH) {
              val sy = y * h / targetH
              var x = 0
              while (x < targetW) {
                val v = img.getRGB(x * w / targetW, sy)
                val red = (v >> 16) & 0xff
                sr += red; sg += (v >> 8) & 0xff; sb += v & 0xff
                ck += (y.toLong * targetW + x + 1) * red
                x += 1
              }
              y += 1
            }
            Row(id, targetW, targetH, sr, sg, sb, ck)
          }
        }
      }
    spark.createDataFrame(rdd, imageMetaSchema)
  }

  /** REAL pixel features: decode, then `dims` components where
    * component d sums (r+g+b) over pixels whose row-major index ≡ d
    * (mod dims) — a strided-pooling signature of the decoded grid.
    * Integer-valued floats (< 2^24), so downstream cosine math stays
    * oracle-exact. The on-ramp from image columns into the ANN /
    * near-dup vector operators.
    */
  def extractImageFeatures(media: DataFrame, idCol: String,
      payloadCol: String, dims: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val img = if (r.isNullAt(0)) null else readImage(r.getAs[Array[Byte]](1))
          if (img == null) Iterator.empty // undecodable: no features
          else {
            val w = img.getWidth; val h = img.getHeight
            val acc = new Array[Long](dims)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y)
                acc((y * w + x) % dims) +=
                  ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
                x += 1
              }
              y += 1
            }
            Iterator.single(Row(r.getLong(0), acc.map(_.toFloat).toSeq))
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- real multi-frame path (animated GIF via javax.imageio) ------

  /** Deterministic synthetic-animation spec shared with every oracle:
    * every frame is `11 x 7` grayscale, `3 + id % 3` frames per clip.
    * Frame 0 is the "intro card" — its pixels depend on `id` only
    * through `id % 4`, so intros recur verbatim across clips (the
    * shared intro/outro/watermark pattern frame-level dedup exists
    * for). Body frames (f >= 1) carry the per-(id, frame) offset
    * `id*31 + f*53`. All arithmetic mod 256, gray = all channels.
    */
  val gifFrameW = 11
  val gifFrameH = 7
  def gifFrames(id: Long): Int = (3 + id % 3).toInt
  def gifPixel(id: Long, f: Int, x: Int, y: Int): Int =
    if (f == 0)
      java.lang.Math.floorMod((id % 4) * 37 + x * 7 + y * 13, 256L).toInt
    else
      java.lang.Math.floorMod(id * 31 + f.toLong * 53 + x * 7 + y * 13,
        256L).toInt

  /** 256-entry identity gray palette: index i -> rgb(i, i, i). GIF is
    * palette-indexed, so encoding through this palette is LOSSLESS —
    * decode returns the exact [[gifPixel]] grid per frame.
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode one synthetic clip as a REAL multi-image GIF via the
    * JDK's own GIF writer (`prepareWriteSequence` /
    * `writeToSequence`) — every frame an indexed-gray raster through
    * [[grayPalette]], so the container round-trips exact pixels.
    */
  def encodeGif(id: Long): Array[Byte] = {
    val cm = grayPalette
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      val nf = gifFrames(id)
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(gifFrameW, gifFrameH,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < gifFrameH) {
          var x = 0
          while (x < gifFrameW) {
            raster.setSample(x, y, 0, gifPixel(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** (id, payload) frame of real animated-GIF payloads, batched per
    * partition like every media synthesizer.
    */
  def synthesizeVideos(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (r.isNullAt(0)) Iterator.empty
        else Iterator.single(Row(r.getLong(0), encodeGif(r.getLong(0))))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val gifFrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_gray", LongType),
    StructField("frame_checksum", LongType)))

  /** REAL multi-frame decode: open each payload with the JDK codec
    * registry, count frames with `getNumImages(true)`, decode every
    * frame raster, and emit one row per frame with its dimensions,
    * gray mass, and position-weighted checksum
    * (`sum (y*w + x + 1) * gray` — pixel OR frame scrambling flips
    * it downstream because the checksum rides with frame_idx).
    * Batched per partition (codec init amortized, ImageIO cache
    * off); an unreadable payload yields ONE null-metadata row, never
    * a task failure.
    */
  def decodeFrames(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val bytes = r.getAs[Array[Byte]](1)
          val nullRow = Row(id, null, null, null, null, null)
          if (bytes == null) Iterator.single(nullRow)
          else {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Iterator.single(nullRow) }
            else {
              val reader = readers.next()
              val out =
                try {
                  reader.setInput(iis)
                  val n = reader.getNumImages(true)
                  Array.tabulate(n) { f =>
                    // header-only dim probe before raster allocation:
                    // a bomb frame makes the whole payload unreadable
                    // (caught below -> the single null row)
                    val wc = reader.getWidth(f).toLong
                    val hc = reader.getHeight(f).toLong
                    if (wc <= 0 || hc <= 0 || wc * hc > maxDecodePixels)
                      throw new java.io.IOException("frame exceeds pixel cap")
                    val img = reader.read(f)
                    val w = img.getWidth; val h = img.getHeight
                    var sum = 0L; var ck = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val g = img.getRGB(x, y) & 0xff
                        sum += g
                        ck += (y.toLong * w + x + 1) * g
                        x += 1
                      }
                      y += 1
                    }
                    Row(id, f, w, h, sum, ck)
                  }
                } catch {
                  // NonFatal: the GIF reader throws unchecked exceptions
                  // (bad LZW tables, truncated palettes) on corrupt data
                  case scala.util.control.NonFatal(_) => Array(nullRow)
                } finally {
                  reader.dispose()
                  iis.close()
                }
              out.iterator
            }
          }
        }
      }
    spark.createDataFrame(rdd, gifFrameSchema)
  }

  /** REAL per-frame features: decode every GIF frame and pool gray
    * mass by row-major pixel index mod `dims` — the frame-level
    * strided-pooling signature (the multi-frame analog of
    * [[extractImageFeatures]]), the on-ramp from video-shaped
    * payloads into the ANN / near-dup vector operators at FRAME
    * granularity. Components are integer-valued floats (< 77 * 255,
    * far under 2^24), so downstream cosine math stays oracle-exact.
    */
  def extractFrameFeatures(media: DataFrame, idCol: String,
      payloadCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (r.isNullAt(0) || bytes == null) Iterator.empty
          else {
            val id = r.getLong(0)
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) { iis.close(); Iterator.empty }
            else {
              val reader = readers.next()
              val out =
                try {
                  reader.setInput(iis)
                  val n = reader.getNumImages(true)
                  Array.tabulate(n) { f =>
                    val wc = reader.getWidth(f).toLong
                    val hc = reader.getHeight(f).toLong
                    if (wc <= 0 || hc <= 0 || wc * hc > maxDecodePixels)
                      throw new java.io.IOException("frame exceeds pixel cap")
                    val img = reader.read(f)
                    val w = img.getWidth; val h = img.getHeight
                    val acc = new Array[Long](dims)
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        acc((y * w + x) % dims) += img.getRGB(x, y) & 0xff
                        x += 1
                      }
                      y += 1
                    }
                    Row(id, f, acc.map(_.toFloat).toSeq)
                  }
                } catch {
                  case scala.util.control.NonFatal(_) => Array.empty[Row]
                } finally {
                  reader.dispose()
                  iis.close()
                }
              out.iterator
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthesizes a binary media column from text (UTF-8 bytes) — the
    * test-table embodiment; production input would be real payload
    * bytes from parquet/object storage.
    */
  def synthesizePayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  val frameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("byte_offset", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("frame_digest", StringType)))

  /** BYTE-slice frame sampling for opaque containers the JDK cannot
    * decode: one input row fans out to ceil(n_bytes / frameBytes)
    * frame rows, each carrying its offset, length, and a digest of
    * ITS slice of the payload. For containers the codec registry DOES
    * decode, [[decodeFrames]] is the real thing (actual frame
    * rasters); this op keeps the identical fan-out/batching plumbing
    * available for everything else.
    */
  def sampleFrames(media: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (r.isNullAt(0) || bytes == null) Iterator.empty // skip malformed
          else {
          val id = r.getLong(0)
          val nFrames = (bytes.length + frameBytes - 1) / frameBytes
          (0 until nFrames).iterator.map { f =>
            val off = f * frameBytes
            val len = math.min(frameBytes, bytes.length - off)
            md.reset()
            val digest = md.digest(java.util.Arrays.copyOfRange(bytes, off, off + len))
              .map(b => f"$b%02x").mkString
            Row(id, f, off, len, digest)
          }
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }
}
