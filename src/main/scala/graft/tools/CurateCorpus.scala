package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{BloomExpressions, Dedup, TextOps}

/** CLI: the full pretraining-corpus curation funnel as ONE composed
  * job — parquet in, curated shard-partitioned parquet out, with the
  * per-stage survivor funnel printed and written alongside. Chains the
  * library's individual operators in the order a production pipeline
  * runs them:
  *
  *   1. language filter        (n-gram marker scorer, langPredict)
  *   2. quality + repetition   (token-count bounds, Gopher 20% rule)
  *   3. exact dedup            (normalized fingerprint, min-id wins)
  *   4. near-dup clusters      (MinHash+LSH -> connected components,
  *                              keep best-quality doc per cluster)
  *   5. decontamination        (8-gram overlap vs a holdout table,
  *                              broadcast-bloom prune + exact semi-join)
  *   5b. DSIR selection        (hashed-bigram likelihood ratios vs a
  *                              target corpus, P(keep) ~ min(1, p/q))
  *   6. mixture flattening     (temperature sampling, alpha = 1/2)
  *   7. reshard + write        (deterministic epoch shuffle, shard=K/)
  *
  * Every stage is the SAME operator the registry oracle-checks
  * individually (q20/q21/q22/q24/q60/q74/q82/q87/q75); this tool is
  * the composition a reference user actually runs. Each stage is one
  * shuffle or less; nothing here collects data to the driver — the
  * funnel counts are scalar aggregates.
  *
  * Usage:
  *   sbt "runMain graft.tools.CurateCorpus <in.parquet> <outDir>
  *     [--id doc_id] [--text text] [--lang en|any]
  *     [--min-tokens 5] [--max-tokens 100000]
  *     [--holdout h.parquet] [--dsir-target t.parquet]
  *     [--dsir-buckets 4096]
  *     [--temperature none|0.5] [--source source]
  *     [--target-shares src0:300,src1:40] [--curriculum 3]
  *     [--shards 16] [--salt epoch1]"
  */
object CurateCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic body (tests pass their own session). Returns the
    * funnel: (stage name, surviving doc count) in pipeline order.
    */
  def run(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: CurateCorpus <in.parquet> <outDir> [flags]")
    val in = args(0)
    val out = args(1)
    val flags = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    val srcCol = flags.getOrElse("source", "source")
    val lang = flags.getOrElse("lang", "any")
    val minToks = flags.getOrElse("min-tokens", "5").toInt
    val maxToks = flags.getOrElse("max-tokens", "100000").toInt
    GraftSession.tune(spark)

    val funnel = Seq.newBuilder[(String, Long)]
    // each stage caches (several later stages read it), and the
    // previous stage's cache is released once the current one has
    // materialized through it — at corpus scale holding the whole
    // funnel pinned would evict the stages still in use
    var lastCached: DataFrame = null
    def stage(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val c = graft.Scratch.cache(df)
      funnel += (name -> c.count())
      System.err.println(f"[graft-curate] stage $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      if (lastCached != null && !(lastCached eq c)) lastCached.unpersist()
      lastCached = c
      c
    }

    val docs = stage("input", spark.read.parquet(in))

    // 1. language: trust an existing label column when the corpus has
    // one, fall back to the n-gram marker predictor when it doesn't —
    // the usual split between labeled curated sources and raw crawl
    val afterLang =
      if (lang == "any") docs
      else {
        val langExpr =
          if (docs.columns.contains("lang")) col("lang")
          else TextOps.langPredict(col(textCol))
        stage("lang", docs.filter(langExpr === lang))
      }

    // 2. quality + repetition (token bounds, Gopher most-common-token
    // <= 20% of the doc)
    val afterQuality = stage("quality", afterLang
      .withColumn("_nt", TextOps.tokenCount(col(textCol)))
      .withColumn("_rep", TextOps.repetitionStats(col(textCol)))
      .filter(col("_nt") >= minToks && col("_nt") <= maxToks &&
        col("_rep.top_tok_cnt") * 5 <= col("_nt"))
      .drop("_nt", "_rep"))

    // 3. exact dedup on the normalized content fingerprint
    val afterExact = stage("exact_dedup", Dedup.exactDedup(
      afterQuality, TextOps.fingerprint(col(textCol)), idCol)
      .filter(!col("is_duplicate")).drop("dup_rank", "is_duplicate"))

    // 4. near-dup clusters, keep the best-quality doc per cluster.
    // localCheckpoint CUTS THE LINEAGE under the (id, cluster) table:
    // caching alone short-circuits execution but NOT analysis — every
    // later stage's action would re-optimize a logical plan embedding
    // the whole minhash band fold + CC-loop join tree, and measured on
    // the sf0.1 funnel that planning tax made each downstream stage
    // seconds slower on hundreds of rows (mixture 5.8 s -> sub-second
    // after the cut; the checkpoint itself is 2 tiny columns).
    val tCl = System.nanoTime()
    val clusters = graft.Scratch.localCheckpoint(
      Dedup.dedupClusters(afterExact, idCol, textCol,
        n = 3, bands = 4, rows = 4, num = 1, den = 2)
        .select(col(idCol), col("cluster")))
    System.err.println(f"[graft-curate] clusters(eager CC) ${(System.nanoTime() - tCl) / 1e9}%6.2f s")
    val scored = afterExact.withColumn("_q",
      TextOps.qualitySignals(col(textCol)))
      .withColumn("_score",
        col("_q.n_distinct") * 2 + col("_q.n_stop") * 3 -
          when(col("_q.max_tok_len") > 12, 5).otherwise(0))
      .drop("_q")
    val keepW = Window.partitionBy(col("cluster"))
      .orderBy(col("_score").desc, col(idCol).asc)
    val afterNear = stage("near_dedup", scored
      .join(clusters, Seq(idCol))
      .withColumn("_rn", row_number().over(keepW))
      .filter(col("_rn") === 1)
      .drop("_rn", "_score", "cluster"))

    // 5. decontamination against a holdout (optional): any shared
    // distinct 8-gram disqualifies the doc. Bloom prunes the gram
    // stream before the exact semi-join decides.
    val afterDecon = flags.get("holdout") match {
      case None => afterNear
      case Some(h) =>
        val holdGrams = graft.Scratch.cache(spark.read.parquet(h)
          .select(explode(TextOps.ngramsDistinct(col(textCol), 8)).as("gram"))
          .distinct())
        val nHold = holdGrams.count()
        val bloom = BloomExpressions.buildLongBloom(holdGrams,
          xxhash64(col("gram")), expectedItems = nHold)
        val contaminated = afterNear
          .select(col(idCol), explode(TextOps.ngramsDistinct(col(textCol), 8))
            .as("gram"))
          .filter(BloomExpressions.mightContain(xxhash64(col("gram")), bloom))
          // the holdout is user-supplied and usually benchmark-sized,
          // but nothing bounds it — broadcast only under the gate
          .join(graft.ops.Hints.broadcastIfSmall(holdGrams, nHold),
            Seq("gram"), "left_semi")
          .select(col(idCol)).distinct()
        stage("decontam", afterNear
          .join(contaminated, Seq(idCol), "left_anti"))
    }

    // 5b. DSIR importance selection (optional): fit the hashed-bigram
    // target/source likelihood-ratio table against a TARGET corpus
    // (q205's statistic, ops/TextOps.dsirRatios) and keep each doc
    // with P ~ min(1, p/q) under the deterministic salted-hash rule
    // (q214's resampling step). The ratio table is 64 rows broadcast;
    // the corpus pays one gram explode + one doc-keyed aggregate.
    val afterDsir = flags.get("dsir-target") match {
      case None => afterDecon
      case Some(tPath) =>
        // 4096 buckets (q157's feature-space sizing): still a
        // broadcast-trivial table, sharp enough that a distinctive
        // target vocabulary separates from the body
        val nB = flags.getOrElse("dsir-buckets", "4096").toInt
        val combined = spark.read.parquet(tPath)
          .select(col(textCol), lit(true).as("_ist"))
          .unionByName(afterDecon
            .select(col(textCol), lit(false).as("_ist")))
        val ratios = TextOps.dsirRatios(
          combined, textCol, col("_ist"), nBuckets = nB)
        val scores = TextOps.dsirScoresAgainst(
            afterDecon, idCol, textCol, ratios, nB)
          .select(col("id").as(idCol), col("score").as("_score"))
        stage("dsir_select", afterDecon
          .join(scores, Seq(idCol), "left")
          // docs with no bigrams carry no evidence: keep them (the
          // quality stage owns length policy, not the selector)
          .filter(col("_score").isNull ||
            pmod(TextOps.hash32(concat(col(idCol).cast("string"),
              lit("_dsir"))), lit(1000000L)) <
              least(col("_score"), lit(1000000L)))
          .drop("_score"))
    }

    // 6. mixture control (optional): explicit target shares
    // (mixtureReweight's permille plan realized by a salted-hash keep
    // rule, q175's arithmetic) wins over temperature flattening when
    // both are given
    val afterMix = flags.get("target-shares") match {
      case Some(spec) =>
        val targets = spec.split(",").toSeq.map { kv =>
          val Array(src, pm) = kv.split(":")
          src -> pm.toInt
        }
        val plan = broadcast(TextOps.mixtureReweight(
          afterDsir, col(srcCol), targets)
          .select(col("source").as(srcCol), col("keep_permille")))
        stage("reweight", afterDsir.join(plan, Seq(srcCol))
          .filter(pmod(TextOps.hash32(concat(col(idCol).cast("string"),
            lit("_mixkeep"))), lit(1000L)) < col("keep_permille"))
          .drop("keep_permille"))
      case None => flags.getOrElse("temperature", "none") match {
        case "none" => afterDsir
        case _ => stage("mixture", TextOps.temperatureSample(
          afterDsir, col(idCol), col(srcCol))
          .drop("src", "n_docs", "samp_den"))
      }
    }

    // 6b. curriculum sidecar (optional): per-doc phase assignments
    // (token-balanced, easiest-first by character length) written
    // next to the corpus for the trainer's data loader, plus the
    // per-phase stats in the funnel log
    flags.get("curriculum").map(_.toInt).foreach { phases =>
      val assign = TextOps.curriculumAssign(afterMix, idCol,
        length(col(textCol)).cast("long"), TextOps.tokenCount(col(textCol)),
        phases)
      assign.withColumnRenamed("id", idCol)
        .write.mode("overwrite").parquet(s"$out/curriculum")
      funnel += ("curriculum_phases" ->
        spark.read.parquet(s"$out/curriculum")
          .select(col("phase")).distinct().count())
    }

    // 7. deterministic reshard + partitioned write
    val nShards = flags.getOrElse("shards", "16").toInt
    val salt = flags.getOrElse("salt", "epoch1")
    val tW = System.nanoTime()
    TextOps.reshard(afterMix, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/corpus")
    System.err.println(f"[graft-curate] reshard write      ${(System.nanoTime() - tW) / 1e9}%6.2f s")

    val f = funnel.result()
    val funnelDf = spark.createDataFrame(f.zipWithIndex.map {
      case ((n, c), i) => (i.toLong, n, c)
    }).toDF("stage_idx", "stage", "n_docs")
    funnelDf.coalesce(1).write.mode("overwrite")
      .json(s"$out/funnel")
    f.foreach { case (n, c) => println(s"[graft-curate] $n: $c") }
    f
  }
}
