package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** End-to-end drive of the reshard CLI: corpus in, shard-partitioned
  * parquet out; the write is a lossless deterministic permutation.
  */
class ShardCorpusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "ShardCorpusSpec")

  test("sharded output is a partitioned, reproducible permutation") {
    val out = Files.createTempDirectory("graft_shard_cli").toString
    val (total, shards) = ShardCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", out,
      "--shards", "8", "--salt", "e1"))
    assert(total == 500 && shards == 8)
    // physical layout: one directory per shard
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(dirs == (0 until 8).map(i => s"shard=$i").toSet)
    val written = spark.read.parquet(out)
    // lossless: every doc exactly once
    assert(written.select(col("doc_id")).distinct().count() == 500)
    // per shard positions are 1..n(shard)
    val bad = written.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
    // reproducible: a second run with the same salt writes the same assignment
    val out2 = Files.createTempDirectory("graft_shard_cli2").toString
    ShardCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", out2,
      "--shards", "8", "--salt", "e1"))
    val again = spark.read.parquet(out2)
      .select(col("doc_id"), col("shard"), col("pos"))
    assert(written.select(col("doc_id"), col("shard"), col("pos"))
      .exceptAll(again).count() == 0)
  }

  test("changing the salt re-deals the corpus") {
    val outA = Files.createTempDirectory("graft_shard_a").toString
    val outB = Files.createTempDirectory("graft_shard_b").toString
    ShardCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", outA, "--salt", "e1"))
    ShardCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", outB, "--salt", "e2"))
    val a = spark.read.parquet(outA).select(col("doc_id"), col("shard"), col("pos"))
    val b = spark.read.parquet(outB).select(col("doc_id"), col("shard"), col("pos"))
    assert(a.exceptAll(b).count() > 0) // different epoch order
  }
}
