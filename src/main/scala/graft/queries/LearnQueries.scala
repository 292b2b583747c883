package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.NaiveBayes

/** Learned-model pipeline operators (q163+): classifiers trained AND
  * applied as distributed DataFrame programs, with integer-exact
  * scoring so the DuckDB oracle reproduces every prediction.
  */
object LearnQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** Shared CTE chain ending in scp(doc_id, actual, cls, score): the
    * SQL twin of [[graft.ops.NaiveBayes.scores]] on the documents
    * table with the doc_id % 5 holdout split and lang classes.
    */
  private val nbScoreSql: String =
    s"""tk AS (
       | SELECT doc_id, lang, unnest(${OpsQueries.toksSql}) AS token
       | FROM documents),
       |tr AS MATERIALIZED (SELECT * FROM tk WHERE doc_id % 5 <> 0),
       |te AS MATERIALIZED (
       | SELECT doc_id, lang AS actual, token, count(*) AS m
       | FROM tk WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
       |cnt AS (
       | SELECT lang AS c2, token AS token2, count(*) AS n
       | FROM tr GROUP BY 1, 2),
       |tot AS (SELECT lang AS cls, count(*) AS tot FROM tr GROUP BY 1),
       |v AS (SELECT count(DISTINCT token) AS v FROM tr),
       |prior AS (
       | SELECT d.lang AS cls,
       |  length(printf('%b', count(DISTINCT d.doc_id) * 1099511627776
       |    // (SELECT count(DISTINCT doc_id)
       |        FROM documents WHERE doc_id % 5 <> 0))) AS prior_w
       | FROM documents d WHERE d.doc_id % 5 <> 0 GROUP BY 1),
       |cl AS (SELECT cls, tot + v.v AS denom FROM tot CROSS JOIN v),
       |sc AS (
       | SELECT te.doc_id, te.actual, cl.cls,
       |  sum(te.m * length(printf('%b',
       |    ((coalesce(cnt.n, 0) + 1) * 1099511627776) // cl.denom)))
       |   AS like_sum
       | FROM te CROSS JOIN cl
       | LEFT JOIN cnt ON cnt.c2 = cl.cls AND cnt.token2 = te.token
       | GROUP BY 1, 2, 3),
       |scp AS MATERIALIZED (
       | SELECT sc.doc_id, sc.actual, sc.cls,
       |  sc.like_sum + prior.prior_w AS score
       | FROM sc JOIN prior ON prior.cls = sc.cls)""".stripMargin

  def all: Map[String, Q] = Map(

    // Multinomial Naive Bayes language classifier: train on
    // doc_id % 5 != 0, predict the held-out fifth, emit the
    // (actual, predicted) confusion matrix. The LEARNED counterpart
    // of q148's fixed-marker heuristic lang-ID. Likelihoods are
    // Laplace-smoothed fixed-point integers quantized by bitlen
    // (= floor(log2)+1, exact in both engines via base-2 string
    // length), so the argmax — ties to the smallest class name — is
    // bit-reproducible. See ops/NaiveBayes.scala for the 100 TB
    // layout (the model stays a (class, token)-partitioned frame).
    // On THIS corpus the matrix is off-diagonal-heavy: the synthetic
    // text draws from one shared vocabulary regardless of lang, so
    // the registry row checks the mechanism cross-engine; separable-
    // corpus accuracy (perfect diagonal) is pinned in NaiveBayesSpec.
    "q163_nb_confusion" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        NaiveBayes.confusion(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "lang", "text")
      },
      Some(
        s"""WITH $nbScoreSql,
           |pr AS (
           | SELECT doc_id, actual, cls,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, cls) AS rk
           | FROM scp)
           |SELECT actual, cls AS predicted, count(*) AS n_docs
           |FROM pr WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Confident-learning label audit: the misclassified held-out docs
    // ranked by the NB model's margin AGAINST the recorded label
    // (score of the winning class minus score of the labeled class) —
    // the review queue a labeling pipeline drains to find mislabeled
    // data. Integer margins ride the same bitlen quantization as
    // q163, so the ranking is engine-reproducible; top-25 with
    // doc_id tie-break plans as TakeOrderedAndProject.
    "q165_label_errors" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        NaiveBayes.labelErrorCandidates(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "lang", "text", k = 25)
      },
      Some(
        s"""WITH $nbScoreSql,
           |best AS (
           | SELECT doc_id, actual, cls AS predicted, score,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, cls) AS rk
           | FROM scp),
           |own AS (
           | SELECT doc_id, score AS actual_score FROM scp
           | WHERE cls = actual)
           |SELECT b.doc_id, b.actual, b.predicted,
           | CAST(b.score - o.actual_score AS BIGINT) AS margin
           |FROM best b JOIN own o USING (doc_id)
           |WHERE b.rk = 1 AND b.predicted <> b.actual
           |ORDER BY margin DESC, b.doc_id LIMIT 25""".stripMargin)),

    // §2.10 x q163: ONLINE classification — the holdout docs arrive
    // as a file STREAM and are scored against the batch-trained model
    // via stream-static joins (constant-key broadcast fan-out + left
    // join onto the (class, token) count frame), with the per-(doc,
    // class) likelihood sum as the single streaming aggregation
    // (Complete mode). foreachBatch snapshot-ranks the argmax and
    // overwrites the sink (the q85 leaderboard shape) — end-of-input
    // equals the batch confusion matrix EXACTLY, so q163's oracle
    // checks the streaming path too.
    "q170_streaming_classify" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.ops.NaiveBayes.fit(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "lang", "text")
        val ev = SlowLogQueries.nbtestSrc(s, dir)
        val src = SlowLogQueries.stableStreamSrc(dir, "nbtest", ev)
        val out = "/tmp/graft_stream_nb_out_" +
          Integer.toHexString(dir.hashCode)
        SlowLogQueries.withShufflePartitions(s, 8) {
          val stream = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 8).parquet(src)
          val toks = stream.select(col("doc_id"),
            col("lang").as("actual"),
            explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
          val likeSums = graft.ops.NaiveBayes.tokenWeights(toks, model)
            .groupBy(col("doc_id"), col("actual"), col("cls"))
            .agg(sum(col("w")).as("like_sum"))
          val query = likeSums.writeStream
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col("doc_id"))
                .orderBy(col("score").desc, col("cls"))
              batch.join(broadcast(model.prior), Seq("cls"))
                .select(col("doc_id"), col("actual"), col("cls"),
                  (col("like_sum") + col("prior_w")).as("score"))
                .withColumn("rk", row_number().over(w))
                .filter(col("rk") === 1)
                .groupBy(col("actual"), col("cls").as("predicted"))
                .agg(count(lit(1)).as("n_docs"))
                .write.mode("overwrite").parquet(out)
            }
            .start()
          try query.processAllAvailable() finally query.stop()
        }
        s.read.parquet(out).orderBy(col("actual"), col("predicted"))
      },
      Some(
        s"""WITH $nbScoreSql,
           |pr AS (
           | SELECT doc_id, actual, cls,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, cls) AS rk
           | FROM scp)
           |SELECT actual, cls AS predicted, count(*) AS n_docs
           |FROM pr WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Nearest-centroid (Rocchio) classifier on the embedding corpus —
    // the vector-space sibling of q163: label centroids fit on the
    // vec_id % 5 train split (fixed-point micros, truncating
    // division — q141's arithmetic), held-out vectors assigned to the
    // nearest centroid by exact integer squared distance, ties to the
    // smallest label. Centroid frame is catalog-sized and broadcasts;
    // the corpus is touched once per split.
    "q171_rocchio_confusion" -> Q(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.ops.Quantize.nearestCentroidConfusion(
          emb.filter(pmod(col("vec_id"), lit(5)) =!= 0),
          emb.filter(pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", col("label"), dims = 64)
      },
      Some(
        """WITH tr AS (
          | SELECT label AS grp, unnest(range(len(embedding))) AS i,
          |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
          |   AS BIGINT) AS m
          | FROM embeddings WHERE len(embedding) = 64 AND vec_id % 5 <> 0),
          |cent AS MATERIALIZED (
          | SELECT grp, i, CAST(sum(m) AS BIGINT) // count(*) AS c
          | FROM tr GROUP BY 1, 2),
          |te AS (
          | SELECT vec_id, label AS actual,
          |  unnest(range(len(embedding))) AS i,
          |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
          |   AS BIGINT) AS m
          | FROM embeddings WHERE len(embedding) = 64 AND vec_id % 5 = 0),
          |d AS (
          | SELECT te.vec_id, te.actual, cent.grp,
          |  sum((te.m - cent.c) * (te.m - cent.c)) AS d2
          | FROM te JOIN cent ON cent.i = te.i GROUP BY 1, 2, 3),
          |p AS (
          | SELECT vec_id, actual, grp,
          |  row_number() OVER (PARTITION BY vec_id
          |    ORDER BY d2, grp) AS rk
          | FROM d)
          |SELECT actual, grp AS predicted, count(*) AS n_vecs
          |FROM p WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Reliability calibration of the NB classifier: confidence =
    // integer margin between the winning and runner-up class scores,
    // binned by q159's equal-width integer rule, with the observed
    // correctness rate per bin — "does a 2x-likelihood margin
    // actually mean it's right more often". The histogram collapses
    // the holdout to margin-domain rows before any window; bounds
    // ride as a 1-row broadcast.
    "q172_nb_calibration" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sc = graft.Scratch.cache(graft.ops.NaiveBayes.scores(
          docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "lang", "text"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("score").desc, col("cls"))
        val ranked = graft.Scratch.cache(
          sc.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2))
        // margin per doc via ONE conditional aggregation over the
        // cached rk<=2 frame: the former rk=1 x rk=2 self-join paid
        // two hash exchanges + sorts + a SortMergeJoin (twice — the
        // bounds branch replays the margin subtree) for rows that
        // already share the window's doc_id partitioning. Inner-join
        // semantics kept: docs with no runner-up row (s2 null) drop.
        val m = ranked.groupBy(col("doc_id"))
          .agg(
            max(when(col("rk") === 1, col("score"))).as("s1"),
            max(when(col("rk") === 2, col("score"))).as("s2"),
            max(when(col("rk") === 1, col("cls"))).as("predicted"),
            max(when(col("rk") === 1, col("actual"))).as("actual"))
          .filter(col("s2").isNotNull)
          .select((col("s1") - col("s2")).as("margin"),
            (col("predicted") === col("actual")).cast("long").as("correct"))
        graft.ops.Eval.calibrationBins(m, col("margin"), col("correct"),
          nbins = 10)
          .orderBy(col("bin"))
      },
      Some(
        s"""WITH $nbScoreSql,
           |rk AS MATERIALIZED (
           | SELECT doc_id, actual, cls, score,
           |  row_number() OVER (PARTITION BY doc_id
           |    ORDER BY score DESC, cls) AS rk
           | FROM scp),
           |mg AS (
           | SELECT CAST(a.score - b.score AS BIGINT) AS v,
           |  CASE WHEN a.cls = a.actual THEN 1 ELSE 0 END AS pos
           | FROM rk a JOIN rk b ON b.doc_id = a.doc_id AND b.rk = 2
           | WHERE a.rk = 1),
           |hist AS MATERIALIZED (
           | SELECT v, count(*) AS cnt, sum(pos) AS pos FROM mg GROUP BY 1),
           |bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM hist),
           |bb AS (
           | SELECT h.v, h.cnt, h.pos,
           |  ((h.v - bounds.lo) * 10) // (bounds.hi - bounds.lo + 1) AS bin
           | FROM hist h CROSS JOIN bounds)
           |SELECT bin, CAST(sum(cnt) AS BIGINT) AS n,
           | CAST(sum(pos) AS BIGINT) AS n_pos,
           | CAST((sum(pos) * 1000) // sum(cnt) AS BIGINT) AS pos_permille,
           | CAST(sum(v * cnt) // sum(cnt) AS BIGINT) AS mean_score
           |FROM bb GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
