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
        // per-partition init of the (stub) decoder happens here
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (n, w, h, digest) = decodeStub(bytes)
          Row(id, n, w, h, digest)
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
}
