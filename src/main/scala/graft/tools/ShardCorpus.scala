package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TextOps

/** CLI: deterministic corpus resharding end-to-end — parquet in,
  * shard-partitioned parquet out (the training-data "global shuffle"
  * write side). Every doc gets a salted-hash shard and a reproducible
  * intra-shard position, and the output is laid out one directory per
  * shard (`shard=K/`), so a training job reads shard files
  * sequentially in a stable order without any runtime shuffle.
  *
  * Usage:
  *   sbt "runMain graft.tools.ShardCorpus <in.parquet> <outDir>
  *     [--id doc_id] [--shards 16] [--salt epoch1]"
  *
  * Changing --salt re-deals the whole corpus (a new epoch order);
  * appending rows with the same salt moves only the new rows.
  */
object ShardCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-shard")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic body (tests pass their own session). Returns
    * (total rows written, shard count).
    */
  def run(spark: SparkSession, args: Array[String]): (Long, Long) = {
    require(args.length >= 2, "usage: ShardCorpus <in.parquet> <outDir> [flags]")
    val in = args(0)
    val out = args(1)
    val flags = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val idCol = flags.getOrElse("id", "doc_id")
    val nShards = flags.getOrElse("shards", "16").toInt
    val salt = flags.getOrElse("salt", "epoch1")
    GraftSession.tune(spark)

    val docs = spark.read.parquet(in)
    val sharded = TextOps.reshard(docs, idCol, nShards, salt)
    // partitionBy(shard) gives one directory per shard; sortWithinPartitions
    // lands rows in position order inside each shard file, so a reader
    // streaming a shard sees the deterministic epoch order directly.
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)

    val written = spark.read.parquet(out)
    val total = written.count()
    val shards = written.select(col("shard")).distinct().count()
    println(s"[graft-shard] $total docs -> $shards shards at $out (salt=$salt)")
    (total, shards)
  }
}
