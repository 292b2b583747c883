package graft.tools

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class AuditCorpusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "AuditCorpusSpec")

  test("audit battery e2e: all reports written, counts coherent") {
    val out = Files.createTempDirectory("graft_audit_out").toString
    val res = AuditCorpus.run(spark, Array(
      "/root/testdata/sf0.001/documents.parquet", out,
      "--embeddings", "/root/testdata/sf0.001/embeddings.parquet")).toMap
    // vector reports present and probe-shaped
    assert(res("truncation_recall") == 10L)
    assert(res("centroid_distances") == 45L) // C(10,2) label pairs
    // round-10 vector reports: one row per non-empty Lloyd cluster /
    // per ingestion batch (vec_id % 8)
    assert(res("cluster_quality") >= 1L && res("cluster_quality") <= 8L)
    assert(res("embedding_drift") >= 1L && res("embedding_drift") <= 8L)

    val nSources = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("source").distinct().count()
    // per-source reports carry one row per source
    assert(res("encoding") == nSources)
    assert(res("vocab_richness") == nSources)
    assert(res("length_trend") == nSources)
    assert(res("key_skew") == 1L)
    assert(res("novelty_curve") >= 1L && res("novelty_curve") <= 10L)
    // lang column exists in the fixture -> lang reports present
    assert(res.contains("chi2_source_lang") && res.contains("lang_confusion"))
    // privacy + calibration reports: one row per threshold / <= nbins
    assert(res("k_anonymity") == 3L)
    assert(res("calibration_bins") >= 1L && res("calibration_bins") <= 10L)
    // round-6 reports: repetition histogram covers every doc; the
    // leakage matrix is label-pair bounded; fertility is per-lang
    val nLangs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("lang").distinct().count()
    val repTotal = spark.read.parquet(s"$out/repeat_runs")
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(repTotal == spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count())
    assert(res("cross_label_leakage") <= nLangs * (nLangs - 1) / 2)
    assert(res("tokenizer_fertility") == nLangs)
    assert(res.contains("surprisal_hist"))
    // release scorecard: one row, internally coherent (span tokens
    // bounded by total tokens, contamination bounded by train split)
    assert(res("release_scorecard") == 1L)
    val card = spark.read.parquet(s"$out/release_scorecard").head()
    assert(card.getAs[Long]("n_docs") == spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count())
    assert(card.getAs[Long]("dup_span_tokens") >= 0L &&
      card.getAs[Long]("dup_span_tokens") <= card.getAs[Long]("n_tokens"))
    assert(card.getAs[Long]("span_savings_permille") <= 1000L)
    assert(card.getAs[Long]("contam_docs") >= 0L &&
      card.getAs[Long]("contam_permille") <= 1000L)
    // summary json lists every report
    val summary = spark.read.json(s"$out/summary")
    assert(summary.count() == res.size)
    // encoding audit totals must equal the corpus doc count
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where("text IS NOT NULL").count()
    val audited = spark.read.parquet(s"$out/encoding")
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(audited == nDocs)
  }
}
