package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs batched per partition (`mapPartitions`) so a
  * real decoder would amortize codec/model initialization per task —
  * the Scala analog of `mapInPandas` batch UDFs.
  *
  * The decode itself is a STUB (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake metadata from
  * the raw bytes. The Spark-side plumbing — schema, partitioning,
  * batch iteration, output shape — is real and oracle-checked (byte
  * length and md5 digest are computed from the actual payload).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("digest", StringType)))

  /** STUB decoder: a real implementation would parse the media header
    * and run feature extraction here. Deterministic fake: dimensions
    * derived from the byte length, digest from the payload md5.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(bytes).map(b => f"$b%02x").mkString
    val n = bytes.length
    (n, n % 512, (n / 512) % 512, digest)
  }

  /** Batched per-partition decode of (id, payload) -> metadata rows.
    * One decoder instance per partition, streamed via iterator — no
    * per-row setup, no full-partition buffering.
    */
  def extractMetadata(media: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        // per-partition init of the (stub) decoder happens here;
        // a null payload yields null metadata instead of an NPE
        // (O10: one malformed row never fails the job)
        it.map { r =>
          val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
          val bytes = r.getAs[Array[Byte]](1)
          if (bytes == null) Row(id, null, null, null, null)
          else {
            val (n, w, h, digest) = decodeStub(bytes)
            Row(id, n, w, h, digest)
          }
        }
      }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** Synthesizes a binary media column from text (UTF-8 bytes) — the
    * test-table embodiment; production input would be real payload
    * bytes from parquet/object storage.
    */
  def synthesizePayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** STUB resize: a real implementation would decode, scale to the
    * target dimensions, and re-encode; the deterministic fake
    * truncates or zero-pads the payload to targetBytes so the
    * batched-transform plumbing (binary in -> binary out, per-
    * partition init) is real and testable.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    java.util.Arrays.copyOf(bytes, targetBytes)

  /** Batched payload resize: (id, payload) -> (id, payload resized). */
  def resizePayloads(media: DataFrame, idCol: String, payloadCol: String,
      targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", org.apache.spark.sql.types.BinaryType)))
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (r.isNullAt(0) || bytes == null) Iterator.empty
          else Iterator.single(Row(r.getLong(0), resizeStub(bytes, targetBytes)))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB feature extractor: a real implementation would decode the
    * payload and run a vision/audio model per partition batch; the
    * deterministic fake derives a dims-length vector from md5 of the
    * payload bytes + dimension index. Components are INTEGER-valued
    * floats ((hash32 % 1001) - 500) — exactly representable in both
    * engines, so the downstream cosine math is oracle-checkable with
    * no float-rounding hazard (cosine is scale-invariant, a magnitude
    * normalization would add nothing).
    */
  def featureStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val text = new String(bytes, "UTF-8") // stub: real decoders read the codec, not UTF-8
    Array.tabulate(dims) { d =>
      val h = graft.ops.SketchKernels.hash32(md, text + "_" + d)
      (h % 1001L - 500L).toFloat
    }
  }

  /** Batched per-partition feature extraction: (id, payload) ->
    * (id, features array<float>) — the multimodal on-ramp to the
    * similarity/dedup operators (ANN top-k, near-dup pairs, kNN join).
    */
  def extractFeatures(media: DataFrame, idCol: String, payloadCol: String,
      dims: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rdd = media.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        // per-partition init of the (stub) model happens here
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (r.isNullAt(0) || bytes == null) Iterator.empty
          else Iterator.single(Row(r.getLong(0), featureStub(bytes, dims).toSeq))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("byte_offset", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("frame_digest", StringType)))

  /** Frame sampling for video-shaped payloads: one input row fans out
    * to ceil(n_bytes / frameBytes) frame rows, each carrying its
    * offset, length, and a digest of ITS slice of the payload. A real
    * implementation would seek to keyframes in the container; the
    * slicing/fan-out/batching plumbing here is the part Spark owns.
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
