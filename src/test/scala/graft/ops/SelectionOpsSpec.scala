package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the round-7 selection/retrieval operators
  * (q205 dsirScores, q206 retrievalMetrics).
  */
class SelectionOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder
    .master("local[4]").appName("selection-ops")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dsirScores: identical texts collapse to one bucket with the " +
    "exact smoothed ratio; target docs are excluded") {
    import spark.implicits._
    // 10 docs of "a b c" (2 bigram occurrences each), ids 0-1 target:
    // both bigrams of every doc hash identically per-gram, and with a
    // single shared text ALL occurrences of each gram land in that
    // gram's bucket. nt/ns per touched bucket aggregate to the
    // add-one ratio; with every source doc seeing the same grams the
    // mean score is the same for all — and when both grams share a
    // bucket (or not), the mean of equal per-gram weights is exact.
    val docs = (0L to 9L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TextOps.dsirScores(docs, "doc_id", "text",
      col("doc_id") < 2, nBuckets = 64).collect()
    assert(out.length == 8) // targets excluded
    assert(out.forall(_.getAs[Long]("n_grams") == 2L))
    // per-gram bucket ratio: nt = 2 (2 target docs x 1 occurrence),
    // ns = 8 -> w = 3*1e6 // 9 = 333333 regardless of which buckets
    // the two grams hash to (they never share occurrences with other
    // grams since the corpus has only these two grams... unless the
    // two grams collide into ONE bucket: then nt=4, ns=16 ->
    // w = 5*1e6 // 17 = 294117). Either way all docs agree.
    val scores = out.map(_.getAs[Long]("score")).distinct
    assert(scores.length == 1)
    assert(scores.head == 333333L || scores.head == 294117L)
  }

  test("retrievalMetrics: hand-computed MRR/AP on a 4-vector corpus") {
    import spark.implicits._
    // anchor 0 = [1,0] label 1; candidates ranked by cosine:
    //   id1 [1,0]  label 1 -> cos 1.0     rank 1, relevant
    //   id2 [1,1]  label 0 -> cos 0.7071  rank 2, irrelevant
    //   id3 [0,1]  label 1 -> cos 0.0     rank 3, relevant
    val emb = Seq(
      (0L, Seq(1f, 0f), 1),
      (1L, Seq(1f, 0f), 1),
      (2L, Seq(1f, 1f), 0),
      (3L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalMetrics(emb, "vec_id", "embedding",
      "label", nAnchors = 1, k = 2).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_rel") == 2L)
    assert(row.getAs[Long]("hits_at_k") == 1L)
    assert(row.getAs[Long]("first_rank") == 1L)
    assert(row.getAs[Long]("mrr_x1e6") == 1000000L)
    // AP@2: only the rank-1 hit contributes (relcum 1): 1e6 // 1 =
    // 1e6, divided by min(n_rel, k) = 2 -> 500000
    assert(row.getAs[Long]("ap_x1e6") == 500000L)
  }

  test("retrievalMetrics: anchor with no relevant candidates reports " +
    "all-zero metrics, not nulls") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1f, 0f), 7),
      (1L, Seq(1f, 0f), 1),
      (2L, Seq(0f, 1f), 2)).toDF("vec_id", "embedding", "label")
    val row = Similarity.retrievalMetrics(emb, "vec_id", "embedding",
      "label", nAnchors = 1, k = 2).collect().head
    assert(row.getAs[Long]("n_rel") == 0L)
    assert(row.getAs[Long]("hits_at_k") == 0L)
    assert(row.getAs[Long]("first_rank") == 0L)
    assert(row.getAs[Long]("mrr_x1e6") == 0L)
    assert(row.getAs[Long]("ap_x1e6") == 0L)
  }

  test("centroidDriftFrom: micro-batch (sum, count) partials re-sum to " +
    "the exact batch drift card, whatever the trigger split") {
    import spark.implicits._
    // 12 vectors, 4 dims, 3 waves (id % 3). Values chosen so the
    // truncating mean actually truncates (odd sums / even counts).
    val emb = (0L to 11L).map { i =>
      (i, Seq(i * 0.013f, 1.7f - i * 0.031f, (i % 5) * 0.4f, 0.001f * i))
    }.toDF("id", "v")
    val whole = Similarity.batchCentroidDrift(
      emb, "id", "v", pmod(col("id"), lit(3)), dims = 4)
    // two "triggers" split by arrival id — each cuts ACROSS waves,
    // exactly like parquet micro-batches would
    def partials(half: org.apache.spark.sql.DataFrame) =
      half.select(pmod(col("id"), lit(3)).cast("long").as("batch"),
          posexplode(SemDedup.microsVec(col("v"))).as(Seq("i", "m")))
        .groupBy(col("batch"), col("i"))
        .agg(sum(col("m")).as("s"), count(lit(1)).as("cnt"))
    val resummed = partials(emb.filter(col("id") < 7))
      .unionAll(partials(emb.filter(col("id") >= 7)))
      .groupBy(col("batch"), col("i"))
      .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
      .select(col("batch"), col("i"), expr("s DIV cnt").as("c"), col("cnt"))
    val a = whole.collect().map(_.toSeq).toSeq
    val b = Similarity.centroidDriftFrom(resummed).collect()
      .map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 3) // one card row per wave
    // the mean must be taken once: a per-half mean-of-means would
    // diverge on wave 0 (ids 0,3,6 | 9 split 3-vs-1) — pin that the
    // shared path did NOT do that, via a hand-check of dim 1 wave 0:
    // micros(1.7 - 0.031*i) for i in {0,3,6,9} sum / 4, truncating
    val m = (x: Float) => math.floor(x.toDouble * 1e6).toLong
    val exp = Seq(0L, 3L, 6L, 9L).map(i => m(1.7f - i * 0.031f)).sum / 4
    val c10 = resummed.filter(col("batch") === 0 && col("i") === 1)
      .collect().head.getAs[Long]("c")
    assert(c10 == exp)
  }

  test("centroidDriftFrom: GAPPED batch keys (yyyymmdd across a month " +
    "end) drift against the actual prior wave, not batch-1") {
    import spark.implicits._
    // three waves with non-consecutive keys: 20260130, 20260131,
    // 20260201 — under the old (batch+1) join the 20260201 wave had
    // no 'previous' and reported NULL shift_sq
    val emb = (0L to 11L).map { i =>
      val day = (i % 3) match {
        case 0 => 20260130L; case 1 => 20260131L; case _ => 20260201L
      }
      (i, day, Seq(i * 0.013f, 1.7f - i * 0.031f, (i % 5) * 0.4f))
    }.toDF("id", "day", "v")
    val gapped = Similarity.batchCentroidDrift(
      emb, "id", "v", col("day"), dims = 3)
      .collect().map(r => (r.getAs[Long]("batch"),
        Option(r.getAs[java.lang.Long]("shift_sq")).map(_.toLong),
        r.getAs[Long]("centroid_norm_sq"))).toSeq
    // same data with DENSE keys 0,1,2 — drift values must agree
    val dense = Similarity.batchCentroidDrift(
      emb, "id", "v", pmod(col("id"), lit(3)), dims = 3)
      .collect().map(r => (r.getAs[Long]("batch"),
        Option(r.getAs[java.lang.Long]("shift_sq")).map(_.toLong),
        r.getAs[Long]("centroid_norm_sq"))).toSeq
    assert(gapped.map(_._1) == Seq(20260130L, 20260131L, 20260201L))
    assert(gapped.map(t => (t._2, t._3)) == dense.map(t => (t._2, t._3)))
    // the first wave has no prior (NULL shift); every later one does
    assert(gapped.head._2.isEmpty)
    assert(gapped.tail.forall(_._2.nonEmpty))
  }
}
