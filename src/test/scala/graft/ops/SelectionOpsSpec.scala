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
}
