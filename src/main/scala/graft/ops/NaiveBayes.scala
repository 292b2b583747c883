package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes — the classic learned
  * classifier of large-scale curation pipelines (fasttext-style
  * language ID, quality triage), trained and applied wholly as
  * DataFrame aggregations, with BIT-EXACT integer arithmetic so an
  * independent engine reproduces every prediction.
  *
  * Determinism contract: NB needs log-likelihoods, and floating logs
  * diverge across engines in the last ulp. We use the integer log2
  * floor instead: bitlen(x) = number of binary digits of x
  * (= floor(log2 x) + 1), computed as the LENGTH of the base-2
  * string — `length(conv(x, 10, 2))` in Spark, `length(printf('%b',
  * x))` in DuckDB — both exact for any positive int64. Laplace-
  * smoothed token likelihoods are scaled to fixed point first:
  *   w(c,t) = bitlen( ((cnt(c,t) + 1) * 2^40) DIV (tot(c) + V) )
  * so one bitlen unit ~= one factor of 2 in probability — a coarse
  * (log2-floor) but fully deterministic quantization of the NB
  * score. Ties in the argmax break to the lexicographically smallest
  * class. The 2^40 scale bounds cnt+1 <= 2^23 before the product can
  * overflow int64; corpora past ~8M occurrences of one token in one
  * class drop the scale to 2^30 (and the quantization coarsens by
  * nothing — bitlen subtracts the same shift everywhere).
  *
  * 100 TB posture: the model IS a DataFrame — cnt(c,t) lives
  * vocabulary x classes-sized, partitioned by (class, token); no
  * driver-side model materialization anywhere. Train = one
  * (class, token) shuffle with map-side partial counts; apply = the
  * test corpus's token counts fanned out |C| ways (|C| = #classes,
  * single digits), joined to the model on (class, token) — a plain
  * shuffle join that scales with corpus size, then one doc-key
  * aggregation and a 1-row-per-doc argmax window. Class totals,
  * vocabulary size, and priors ride as 1-row / |C|-row broadcast
  * frames, never collected.
  */
object NaiveBayes {

  private val Scale = 1099511627776L // 2^40

  /** bitlen(x) for positive x: digits in the base-2 representation. */
  private def bitlen(x: org.apache.spark.sql.Column) =
    length(conv(x, 10, 2)).cast("long")

  /** A fitted model, entirely as DataFrames (nothing is collected):
    * `classes` (cls, denom) and `prior` (cls, prior_w) are |C|-row
    * broadcast sides; `counts` (c2, token2, n) is the vocabulary x
    * classes count frame, partitioned by (class, token). Batch
    * scoring ([[scores]]) and stream-static scoring (q170) share it.
    */
  case class Model(classes: DataFrame, counts: DataFrame, prior: DataFrame)

  /** Train the multinomial model on `train`. */
  def fit(train: DataFrame, classCol: String,
      textCol: String): Model = {
    val trainToks = graft.Scratch.cache(
      train.select(col(classCol).as("cls"),
        explode(TextOps.tokens(col(textCol))).as("token")))
    // the model: Laplace-ready occurrence counts per (class, token)
    val cnt = trainToks.groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("n"))
    // per-class occurrence totals and doc priors (|C| rows)
    val tot = trainToks.groupBy(col("cls"))
      .agg(count(lit(1)).as("tot"))
    val prior = train.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ndt"))))
      .select(col("cls"),
        bitlen(expr(s"nd * $Scale DIV ndt")).as("prior_w"))
    // vocabulary size (1 row, broadcast — never collected)
    val vocab = trainToks.select(col("token")).distinct()
      .agg(count(lit(1)).as("v"))
    val classes = tot.crossJoin(broadcast(vocab))
      .select(col("cls"), (col("tot") + col("v")).as("denom"))
    Model(classes,
      cnt.select(col("cls").as("c2"), col("token").as("token2"), col("n")),
      prior)
  }

  /** Per-token-occurrence likelihood weights against every class:
    * input rows (doc_id, actual, token) — one row PER OCCURRENCE —
    * fanned out |C| ways with the bitlen weight attached. Works on a
    * batch frame or a stream (all joins are (stream-)static with the
    * model on the static side; no aggregation happens here).
    */
  def tokenWeights(toks: DataFrame, model: Model): DataFrame =
    toks.withColumn("_one", lit(1))
      // |C|-row fan-out as a constant-key broadcast equi-join: the
      // same plan batch-side, and legal in a stream (stream-static
      // cross joins are not; constant-key hash joins are)
      .join(broadcast(model.classes.withColumn("_one", lit(1))), Seq("_one"))
      .join(model.counts,
        col("cls") === col("c2") && col("token") === col("token2"), "left")
      .withColumn("num", (coalesce(col("n"), lit(0L)) + 1) * lit(Scale))
      .select(col("doc_id"), col("actual"), col("cls"),
        bitlen(expr("num DIV denom")).as("w"))

  /** Train on `train`, score every `test` doc against every class:
    * (doc_id, actual, cls, score). Both inputs need (docId, classCol,
    * textCol) columns; tokenization is the engine-wide whitespace
    * contract (TextOps.tokens). The downstream argmax ([[confusion]])
    * and margin ([[labelErrorCandidates]]) views share this pass.
    */
  def scores(train: DataFrame, test: DataFrame, docId: String,
      classCol: String, textCol: String): DataFrame = {
    val model = fit(train, classCol, textCol)
    val testToks = test.select(col(docId).as("doc_id"),
      col(classCol).as("actual"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    tokenWeights(testToks, model)
      .groupBy(col("doc_id"), col("actual"), col("cls"))
      .agg(sum(col("w")).as("like_sum"))
      .join(broadcast(model.prior), Seq("cls"))
      .select(col("doc_id"), col("actual"), col("cls"),
        (col("like_sum") + col("prior_w")).as("score"))
  }

  private def argmaxWindow = Window.partitionBy(col("doc_id"))
    .orderBy(col("score").desc, col("cls"))

  /** Confusion matrix (actual, predicted, n_docs) over [[scores]]'s
    * argmax (ties to the smallest class name).
    */
  def confusion(train: DataFrame, test: DataFrame, docId: String,
      classCol: String, textCol: String): DataFrame =
    scores(train, test, docId, classCol, textCol)
      .withColumn("rk", row_number().over(argmaxWindow))
      .filter(col("rk") === 1)
      .groupBy(col("actual"), col("cls").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))

  /** Label-error candidates: the misclassified test docs ranked by
    * the model's CONFIDENCE against the recorded label — margin =
    * score(predicted) - score(actual). The confident-learning recipe
    * for surfacing mislabeled training data: a large positive margin
    * means the model is sure the label is wrong; humans (or a
    * stronger model) review the top of this list. Output:
    * (doc_id, actual, predicted, margin), margin desc / doc_id asc,
    * top `k` — TakeOrderedAndProject, never a full sort.
    */
  def labelErrorCandidates(train: DataFrame, test: DataFrame,
      docId: String, classCol: String, textCol: String,
      k: Int): DataFrame = {
    val sc = graft.Scratch.cache(
      scores(train, test, docId, classCol, textCol))
    val best = sc.withColumn("rk", row_number().over(argmaxWindow))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("actual"),
        col("cls").as("predicted"), col("score").as("best_score"))
    val own = sc.filter(col("cls") === col("actual"))
      .select(col("doc_id"), col("score").as("actual_score"))
    best.join(own, Seq("doc_id"))
      .filter(col("predicted") =!= col("actual"))
      .select(col("doc_id"), col("actual"), col("predicted"),
        (col("best_score") - col("actual_score")).as("margin"))
      .orderBy(col("margin").desc, col("doc_id"))
      .limit(k)
  }
}
