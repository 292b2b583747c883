package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** End-to-end drive of the dedup CLI: corpus in, labels out, every
  * doc labeled, canonical = min id per cluster, dup rows point at an
  * existing canonical.
  */
class DedupCorpusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "DedupCorpusSpec")

  test("minhash method labels every doc and canonicals are cluster minima") {
    val out = Files.createTempDirectory("graft_dedup_cli").toString
    val (total, canonical) = DedupCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", out, "--method", "minhash"))
    assert(total == 500 && canonical > 0 && canonical <= total)
    val labels = spark.read.parquet(out)
    assert(labels.columns.toSet == Set("doc_id", "cluster", "is_canonical"))
    assert(labels.count() == 500) // every doc labeled
    // canonical rows are exactly the per-cluster minima
    val badCanon = labels.groupBy(col("cluster"))
      .agg(min(col("doc_id")).as("mn"),
        sum(when(col("is_canonical"), 1).otherwise(0)).as("nc"))
      .filter(col("nc") =!= 1 || col("mn") =!= col("cluster"))
    assert(badCanon.count() == 0)
  }

  test("exact method finds the planted whitespace-normalized dup") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_dedup_cli").toString
    val in = Files.createTempDirectory("graft_dedup_in").toString + "/docs.parquet"
    Seq((1L, "a b c"), (2L, "a  b  c"), (3L, "x y z"))
      .toDF("doc_id", "text").write.parquet(in)
    val (total, canonical) = DedupCorpus.run(spark, Array(
      in, out, "--method", "exact"))
    assert(total == 3 && canonical == 2) // doc 2 collapses into doc 1
    val byId = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(byId(1L) == ((1L, true)) && byId(2L) == ((1L, false)))
    assert(byId(3L) == ((3L, true)))
  }
}
