package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Eval, Quantize, Scrub, SemDedup, Similarity, Skew, TextOps}

/** CLI: the pre-release audit battery as ONE job — parquet in, a
  * directory of audit reports out, one parquet dataset per report plus
  * a summary JSON. Runs the SAME operators the registry oracle-checks
  * individually (q134 winsorized lengths, q138 KS drift, q140 Chao1,
  * q142 encoding hygiene, q144 chi-square, q145 key skew, q147 OLS
  * trend, q148 lang confusion, q151 novelty curve) — this tool is the
  * composition a release review actually runs before shipping a
  * corpus.
  *
  * Every report collapses the corpus to a catalog-, domain-, or
  * histogram-sized frame in one pass (the ops document their scale
  * posture); the input is read ONCE and cached across reports, and
  * nothing data-sized reaches the driver.
  *
  * Usage:
  *   sbt "runMain graft.tools.AuditCorpus <in.parquet> <outDir>
  *     [--id doc_id] [--text text] [--source source] [--lang lang]
  *     [--embeddings e.parquet] [--vec embedding] [--vec-id vec_id]
  *     [--vec-label label] [--dims 64]"
  *
  * The lang-dependent reports (chi2, confusion) are skipped when the
  * corpus has no lang column; the vector reports (per-vector audit,
  * centroid distances, truncation recall) run only when --embeddings
  * is given.
  */
object AuditCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-audit")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic body (tests pass their own session). Returns
    * (report name, row count) per written report.
    */
  def run(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: AuditCorpus <in.parquet> <outDir> [flags]")
    val in = args(0)
    val out = args(1)
    val flags = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    val srcCol = flags.getOrElse("source", "source")
    val langCol = flags.getOrElse("lang", "lang")
    GraftSession.tune(spark)

    val docs = graft.Scratch.cache(spark.read.parquet(in)
      .withColumn("_len", length(col(textCol)).cast("long")))
    val written = Seq.newBuilder[(String, Long)]
    def report(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      val n = spark.read.parquet(s"$out/$name").count()
      written += (name -> n)
      System.err.println(
        f"[graft-audit] $name%-18s $n%6d rows ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    report("encoding", Scrub.encodingAudit(docs, col(textCol), col(srcCol)))
    report("length_winsorized", TextOps.winsorizedStats(
      docs, col(srcCol), col("_len"), 50, 950))
    report("length_ks", Eval.ksDrift(docs, col(srcCol), col("_len")))
    report("vocab_richness", TextOps.vocabRichness(
      docs, col(srcCol), col(textCol)))
    report("key_skew", Skew.keySkewProfile(docs, col(srcCol)))
    report("length_trend", Eval.olsTrend(
      docs, col(srcCol), col(idCol), col("_len")))
    report("novelty_curve", TextOps.noveltyCurve(docs, idCol, textCol))
    if (docs.columns.contains(langCol)) {
      report("chi2_source_lang", Eval.chi2Independence(
        docs, col(srcCol), col(langCol)))
      report("lang_confusion", Eval.confusionMatrix(
        docs, col(langCol), TextOps.langPredict(col(textCol))))
      // q158's re-identification triage on the metadata QI tuple
      report("k_anonymity", Scrub.kAnonymity(docs,
        Seq(col(srcCol), col(langCol), expr("_len DIV 100")),
        Seq(2, 5, 10)))
    }
    // q159's reliability diagram of the cheap quality score against
    // the repetition verdict
    report("calibration_bins", {
      val sig = docs.select(
        TextOps.qualitySignals(col(textCol)).as("q"),
        TextOps.repetitionStats(col(textCol)).as("r"))
      Eval.calibrationBins(
        sig.select(
          (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
            when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"),
          when(col("r.n_dup_bigrams") * 5 <= col("r.n_bigrams") &&
            col("r.top_tok_cnt") * 5 <= col("r.n_tokens"), 1L)
            .otherwise(0L).as("label")),
        col("score"), col("label"), nbins = 10)
    })

    // q200's one-row release card (size, near-dup involvement,
    // span-dedup ROI, self-contamination). The contamination split is
    // the registry's doc_id%10 convention — for a non-integral id the
    // split key falls back to a deterministic hash so the card stays
    // emittable on any corpus.
    report("release_scorecard", {
      val idIsIntegral = docs.schema(idCol).dataType.typeName match {
        case "long" | "integer" | "short" | "byte" => true
        case _ => false
      }
      val splitId = if (idIsIntegral) col(idCol).cast("long")
        else abs(xxhash64(col(idCol)))
      graft.queries.CurationQueries.releaseScorecard(docs.select(
        splitId.as("doc_id"), col(textCol).as("text"),
        col(srcCol).as("source"),
        (if (docs.columns.contains(langCol)) col(langCol)
         else lit("und")).as("lang")))
    })

    // q179's degenerate-repetition verdicts, collapsed to the
    // (token-run, bigram-loop) histogram — value-domain-sized
    report("repeat_runs", TextOps.repeatRuns(docs, idCol, textCol)
      .groupBy(col("max_token_run"), col("max_bigram_loop"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("max_token_run"), col("max_bigram_loop")))
    // q174's perplexity-proxy score as a per-source histogram of
    // whole-bit buckets (catalog x bits-domain rows)
    report("surprisal_hist", TextOps.lmSurprisal(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(srcCol)), Seq(idCol))
      .groupBy(col(srcCol), expr("bits_x100 DIV 100").as("bits"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col(srcCol), col("bits")))
    if (docs.columns.contains(langCol)) {
      // q177's split-hygiene matrix and q180's token-budget table
      report("cross_label_leakage", TextOps.crossLabelLeakage(
        docs, idCol, col(langCol), textCol, n = 8))
      report("tokenizer_fertility", graft.ops.Bpe.fertility(
        spark, docs, langCol, textCol, rounds = 8))
    }

    flags.get("embeddings").foreach { embPath =>
      val vecCol = flags.getOrElse("vec", "embedding")
      val vecId = flags.getOrElse("vec-id", "vec_id")
      val labelCol = flags.getOrElse("vec-label", "label")
      val dims = flags.getOrElse("dims", "64").toInt
      val emb = graft.Scratch.cache(spark.read.parquet(embPath))
      report("embedding_audit", Quantize.embeddingAudit(emb, vecCol))
      if (emb.columns.contains(labelCol))
        report("centroid_distances", Quantize.centroidDistances(
          emb, vecCol, col(labelCol), dims))
      report("truncation_recall", Similarity.truncationRecall(
        emb, vecId, vecCol, nProbes = 10, k = 10, prefixDims = dims / 4))
      report("cluster_quality", SemDedup.clusterQuality(
        emb, vecId, vecCol, k = 8, dims = dims, iters = 2))
      report("embedding_drift", Similarity.batchCentroidDrift(
        emb, vecId, vecCol, pmod(col(vecId), lit(8)), dims))
      emb.unpersist()
    }

    val res = written.result()
    val summary = spark.createDataFrame(res.zipWithIndex.map {
      case ((name, n), i) => (i, name, n)
    }).toDF("ord", "report", "rows")
    summary.coalesce(1).write.mode("overwrite").json(s"$out/summary")
    docs.unpersist()
    res
  }
}
