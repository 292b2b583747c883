package graft.topology

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's `find_pk_nodes.py`: primary-key CSV in,
  * owning-node endpoints out.
  *
  * The reference shells out `nodetool getendpoints` once per row,
  * sequentially (find_pk_nodes.py:79-84). Here the lookup is a
  * batched per-partition external call (`mapPartitions`) — the
  * canonical Spark shape for per-row RPC: one resolver per task,
  * rows streamed through it, failures isolated per key. The resolver
  * is injectable (subprocess in production, fixture map in tests).
  */
object Topology {

  /** S10 — read the slow-PK CSV (header, 3+ columns) with the
    * reference's validity filter: drop rows whose PK contains
    * 'truncated output' (find_pk_nodes.py:41-49).
    */
  def readPkCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("Keyspace").as("keyspace"),
        col("Column Family").as("column_family"),
        col("Primary Key").as("primary_key"))
      .filter(col("keyspace").isNotNull && col("column_family").isNotNull &&
        col("primary_key").isNotNull &&
        !col("primary_key").contains("truncated output"))

  /** Endpoint resolver contract: (keyspace, columnFamily, primaryKey)
    * -> owning nodes, or None on lookup failure (logged + null column,
    * matching find_pk_nodes.py:85-87).
    */
  trait EndpointResolver extends Serializable {
    def resolve(ks: String, cf: String, pk: String): Option[Seq[String]]
  }

  /** Production resolver: `nodetool getendpoints -- ks cf pk` per key
    * (find_pk_nodes.py:79-84), one subprocess per key but one task
    * per PARTITION of keys — batching amortizes JVM startup vs the
    * reference's sequential loop.
    */
  class NodetoolResolver(nodetoolCmd: String = "nodetool") extends EndpointResolver {
    def resolve(ks: String, cf: String, pk: String): Option[Seq[String]] =
      try {
        val out = new ProcessBuilder(nodetoolCmd, "getendpoints", "--", ks, cf, pk)
          .redirectErrorStream(true).start()
        val text = scala.io.Source.fromInputStream(out.getInputStream).mkString
        if (out.waitFor() == 0) Some(text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty))
        else None
      } catch { case _: Exception => None }
  }

  private val outSchema = StructType(Seq(
    StructField("keyspace", StringType),
    StructField("column_family", StringType),
    StructField("primary_key", StringType),
    StructField("endpoints", ArrayType(StringType))))

  /** J3 — batched endpoint enrichment. */
  def resolveEndpoints(pks: DataFrame, resolver: EndpointResolver): DataFrame = {
    val spark = pks.sparkSession
    val rdd = pks.select("keyspace", "column_family", "primary_key").rdd
      .mapPartitions { it =>
        it.map { r =>
          val (ks, cf, pk) = (r.getString(0), r.getString(1), r.getString(2))
          Row(ks, cf, pk, resolver.resolve(ks, cf, pk).orNull)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** S11 wide form — the reference's stdout CSV pre-allocates six
    * Endpoint columns (find_pk_nodes.py:96-106).
    */
  def wide(resolved: DataFrame, slots: Int = 6): DataFrame =
    resolved.select(
      col("keyspace") +: col("column_family") +: col("primary_key") +:
        (0 until slots).map(i =>
          col("endpoints").getItem(i).as(s"endpoint_$i")): _*)

  /** Normalized long form: one row per (pk, endpoint). */
  def long(resolved: DataFrame): DataFrame =
    resolved.select(col("keyspace"), col("column_family"), col("primary_key"),
      explode_outer(col("endpoints")).as("endpoint"))
}
