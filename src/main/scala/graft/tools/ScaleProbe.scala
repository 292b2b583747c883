package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Dedup, TextOps}

/** Empirical scaling evidence for the linear-output curation
  * operators: replicate the sf0.1 documents corpus x1/x2/x4 (fresh
  * doc_ids per replica) and time each operator end-to-end. An
  * operator whose plan is scale-correct shows ~linear wall time here;
  * a quadratic candidate generator or a driver-side bottleneck shows
  * super-linear immediately. Pair emitters (q23-q26 family) are
  * deliberately EXCLUDED: replicating the corpus duplicates every
  * document, so their OUTPUT grows quadratically by construction and
  * wall time follows the output, not the plan.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {

  private def time(label: String, k: Int)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreach(_ => ())
    if (k > 1) // k=1 is the untimed warm-up round
      println(f"[scale] $label%-18s x$k%-2d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    // k=1 is an untimed warm-up (JIT + codegen); the timed points must
    // be large enough that per-job overhead stops dominating
    for (k <- Seq(1, 2, 8, 32)) {
      val docs = (0 until k).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
        .cache()
      docs.count() // materialize input outside the timed region
      time("exact_dedup", k)(Dedup.exactDedup(
        docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp")),
        col("fp"), "doc_id"))
      time("repetition", k)(docs.select(col("doc_id"),
        TextOps.repetitionStats(col("text")).as("r")))
      time("top_ngrams", k)(docs
        .select(explode(TextOps.ngrams(col("text"), 3)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g")).limit(100))
      time("token_budget", k)(TextOps.tokenBudgetSample(
        docs, "doc_id", "text", budget = 10000L, salt = "sp"))
      time("reshard", k)(TextOps.reshard(
        docs.select(col("doc_id")), "doc_id", 16, "sp"))
      time("passage_dedup", k)(TextOps.passageDedup(
        docs, "doc_id", "text", chunk = 16))
      time("mixture_sample", k)(TextOps.temperatureSample(
        docs, col("doc_id"), col("source")))
      if (k > 1) { // learn() drives its own actions; time it wall-clock
        val t0 = System.nanoTime()
        graft.ops.Bpe.learn(spark, docs, "text", rounds = 4).collect()
        println(f"[scale] ${"bpe_learn(4)"}%-18s x$k%-2d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      time("decontam_bloom", k) {
        val grams = docs.select(col("doc_id"),
          explode(TextOps.ngramsDistinct(col("text"), 8)).as("gram"))
        val test = grams.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(col("gram")).distinct().cache()
        val bloom = graft.ops.BloomExpressions.buildLongBloom(test,
          xxhash64(col("gram")), expectedItems = test.count())
        grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .filter(graft.ops.BloomExpressions.mightContain(
            xxhash64(col("gram")), bloom))
          .join(broadcast(test), Seq("gram"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
