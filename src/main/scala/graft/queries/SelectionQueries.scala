package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Prefix, Similarity, TextOps}

/** Round-7 additions: data-selection and retrieval-quality analytics
  * (q204+) — concat-and-chunk packing stats, DSIR-style importance
  * reweighting, exact retrieval metrics (MRR/AP), clipped n-gram
  * precision over near-dup pairs, and reciprocal-rank fusion of a
  * lexical and an embedding ranking. Same oracle discipline as the
  * rest of the registry: truncating-integer formulas, DuckDB
  * reproduces every hash bit-for-bit.
  */
object SelectionQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  private val toksSql = OpsQueries.toksSql

  /** Training-sequence length for q204's concat-and-chunk model. */
  private val SeqLen = 512L

  def all: Map[String, Q] = Map(

    // Concat-and-chunk packing audit: LM training concatenates the
    // corpus in id order and slices it into SeqLen-token sequences;
    // a document whose token interval straddles a sequence boundary
    // gets split across training examples. Per source: how many docs
    // are split (boundary_permille is the attention-fragmentation
    // price of packing). The cumulative position comes from the
    // guarded distributed prefix sum (ops/Prefix.scala) — no
    // single-reducer window at scale.
    "q204_pack_chunks" -> Q(
      (s, dir) => {
        val tk = t(s, dir, "documents").select(col("doc_id"),
          col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("toks"))
        Prefix.cumSum(tk, "doc_id", col("toks"), "cum")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("n_tokens"),
            sum(when(col("toks") > 0 &&
              expr(s"(cum - 1) DIV $SeqLen") >
                expr(s"(cum - toks) DIV $SeqLen"), 1L)
              .otherwise(0L)).as("n_boundary_docs"))
          .withColumn("boundary_permille",
            expr("n_boundary_docs * 1000 DIV n_docs"))
          .orderBy(col("source"))
      },
      Some(
        s"""WITH tk AS (
           | SELECT doc_id, source,
           |  CAST(len($toksSql) AS BIGINT) AS toks FROM documents),
           |c AS (
           | SELECT *, sum(toks) OVER (ORDER BY doc_id
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           | FROM tk)
           |SELECT source, count(*) AS n_docs,
           | CAST(sum(toks) AS BIGINT) AS n_tokens,
           | CAST(sum(CASE WHEN toks > 0
           |   AND (cum - 1) // $SeqLen > (cum - toks) // $SeqLen
           |  THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
           | CAST(sum(CASE WHEN toks > 0
           |   AND (cum - 1) // $SeqLen > (cum - toks) // $SeqLen
           |  THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
           |  AS boundary_permille
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSIR importance scores (hashed-bigram likelihood ratios,
    // ops/TextOps.dsirScores): the registry's synthetic split
    // (doc_id % 10 <= 2) plays the target distribution; the top 50
    // source docs by mean bucket ratio are the ones importance
    // resampling would upweight. Ratio table is 64 rows (broadcast);
    // top-k plans as TakeOrderedAndProject.
    "q205_dsir_weights" -> Q(
      (s, dir) => TextOps.dsirScores(t(s, dir, "documents"),
          "doc_id", "text", pmod(col("doc_id"), lit(10)) <= 2,
          nBuckets = 64)
        .orderBy(col("score").desc, col("id"))
        .limit(50),
      Some(
        s"""WITH tk AS (
           | SELECT doc_id, doc_id % 10 <= 2 AS is_t, $toksSql AS t
           | FROM documents),
           |g AS (
           | SELECT doc_id, is_t,
           |  ('0x' || substr(md5(gram), 1, 8))::BIGINT % 64 AS bucket
           | FROM (SELECT doc_id, is_t,
           |   unnest(list_transform(generate_series(1, len(t) - 1),
           |    i -> t[i] || ' ' || t[i+1])) AS gram FROM tk)),
           |rt AS (
           | SELECT bucket,
           |  (sum(CASE WHEN is_t THEN 1 ELSE 0 END) + 1) * 1000000
           |   // (sum(CASE WHEN is_t THEN 0 ELSE 1 END) + 1) AS w
           | FROM g GROUP BY 1)
           |SELECT g.doc_id AS id, count(*) AS n_grams,
           | CAST(sum(rt.w) AS BIGINT) AS w_sum,
           | CAST(sum(rt.w) // count(*) AS BIGINT) AS score
           |FROM g JOIN rt USING (bucket) WHERE NOT g.is_t
           |GROUP BY 1 ORDER BY score DESC, id LIMIT 50""".stripMargin)),

    // Exact retrieval metrics over the bounded anchor sample
    // (ops/Similarity.retrievalMetrics): per anchor — relevant
    // corpus size (label equality), hits@10, first-relevant rank,
    // truncated MRR and AP, all integer-exact. The audit that grades
    // whether the ANN serving family (q38/q50/q58) is retrieving the
    // right neighborhoods at all.
    "q206_retrieval_metrics" -> Q(
      (s, dir) => Similarity.retrievalMetrics(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", nAnchors = 8, k = 10)
        .orderBy(col("anchor_id")),
      Some(
        s"""WITH a AS (
           | SELECT vec_id AS anchor_id, embedding AS av, label AS al
           | FROM embeddings WHERE vec_id < 8),
           |sc AS (
           | SELECT a.anchor_id, e.vec_id AS cand_id,
           |  round(${OpsQueries.cosSql("e.embedding", "a.av")}, 6) AS cos,
           |  CAST(e.label = a.al AS BIGINT) AS rel
           | FROM embeddings e, a WHERE e.vec_id <> a.anchor_id),
           |r AS (
           | SELECT *, row_number() OVER w AS rnk,
           |  sum(rel) OVER (PARTITION BY anchor_id
           |   ORDER BY cos DESC, cand_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS relcum
           | FROM sc
           | WINDOW w AS (PARTITION BY anchor_id ORDER BY cos DESC, cand_id)),
           |ag AS (
           | SELECT anchor_id, sum(rel) AS n_rel,
           |  sum(CASE WHEN rnk <= 10 THEN rel ELSE 0 END) AS hits_at_k,
           |  COALESCE(min(CASE WHEN rel = 1 THEN rnk END), 0) AS first_rank,
           |  sum(CASE WHEN rnk <= 10 AND rel = 1
           |   THEN relcum * 1000000 // rnk ELSE 0 END) AS ap_num
           | FROM r GROUP BY 1)
           |SELECT anchor_id, CAST(n_rel AS BIGINT) AS n_rel,
           | CAST(hits_at_k AS BIGINT) AS hits_at_k,
           | CAST(first_rank AS BIGINT) AS first_rank,
           | CAST(CASE WHEN first_rank = 0 THEN 0
           |  ELSE 1000000 // first_rank END AS BIGINT) AS mrr_x1e6,
           | CAST(CASE WHEN n_rel = 0 THEN 0
           |  ELSE ap_num // least(n_rel, 10) END AS BIGINT) AS ap_x1e6
           |FROM ag ORDER BY anchor_id""".stripMargin)),

    // Clipped bigram precision (the BLEU-1-style modified-precision
    // core) for every q24 near-dup pair: multiset bigram
    // intersection (sum of per-gram min counts) in both directions —
    // the MT-eval statistic re-used as a dedup-pair diagnostic
    // (direction asymmetry separates containment from mutual
    // overlap). Pairs are band-blocked (never all-pairs); the
    // gram-level joins shuffle on (doc, gram). Docs in a minhash
    // pair carry >= 3 tokens, so bigram totals are never zero.
    "q207_pair_bleu" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("id_a"), col("id_b"))
        val bg = docs.select(col("doc_id"),
            explode(TextOps.ngrams(col("text"), 2)).as("gram"))
          .groupBy(col("doc_id"), col("gram"))
          .agg(count(lit(1)).as("cnt"))
        val tot = bg.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
        val clip = pairs
          .join(bg.select(col("doc_id").as("id_a"), col("gram"),
            col("cnt").as("cnt_a")), Seq("id_a"))
          .join(bg.select(col("doc_id").as("id_b"), col("gram"),
            col("cnt").as("cnt_b")), Seq("id_b", "gram"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("clip"))
        pairs
          .join(clip, Seq("id_a", "id_b"), "left")
          .withColumn("clip", coalesce(col("clip"), lit(0L)))
          .join(tot.select(col("doc_id").as("id_a"), col("n").as("n_a")),
            Seq("id_a"))
          .join(tot.select(col("doc_id").as("id_b"), col("n").as("n_b")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
            col("clip"),
            expr("clip * 1000 DIV n_a").as("p_ab"),
            expr("clip * 1000 DIV n_b").as("p_ba"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |pr AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |bgr AS (
           | SELECT id, unnest(list_transform(generate_series(1, len(t) - 1),
           |  i -> t[i] || ' ' || t[i+1])) AS gram FROM toks),
           |bg AS (SELECT id, gram, count(*) AS cnt FROM bgr GROUP BY 1, 2),
           |tot AS (SELECT id, sum(cnt) AS n FROM bg GROUP BY 1),
           |cl AS (
           | SELECT pr.id_a, pr.id_b, sum(least(a.cnt, b.cnt)) AS clip
           | FROM pr
           | JOIN bg a ON a.id = pr.id_a
           | JOIN bg b ON b.id = pr.id_b AND b.gram = a.gram
           | GROUP BY 1, 2)
           |SELECT pr.id_a, pr.id_b,
           | CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
           | CAST(COALESCE(cl.clip, 0) AS BIGINT) AS clip,
           | CAST(COALESCE(cl.clip, 0) * 1000 // ta.n AS BIGINT) AS p_ab,
           | CAST(COALESCE(cl.clip, 0) * 1000 // tb.n AS BIGINT) AS p_ba
           |FROM pr
           |LEFT JOIN cl ON cl.id_a = pr.id_a AND cl.id_b = pr.id_b
           |JOIN tot ta ON ta.id = pr.id_a
           |JOIN tot tb ON tb.id = pr.id_b
           |ORDER BY pr.id_a, pr.id_b""".stripMargin)),

    // Reciprocal-rank fusion of an embedding ranking and a lexical
    // ranking for the anchor sample: per anchor, rank every
    // embedding candidate by cosine AND every document candidate by
    // distinct-3-gram Jaccard (integer x1e6), fuse on the common id
    // domain with RRF (1e6 DIV (60 + rank) per list, the standard
    // k=60 constant), and keep the fused top 10. The hybrid-search
    // shape (lexical + dense) as an exact, oracle-checkable audit.
    // Anchor gram sets and the 8-row anchor frames broadcast; each
    // ranking is a window over its own modality's candidate frame.
    "q208_rrf_fusion" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
        val emb = t(s, dir, "embeddings")
        val docs = t(s, dir, "documents")
        val anchorsE = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("anchor_id"), col("embedding").as("av"))
        val cosR = emb.select(col("vec_id").as("cand_id"),
            col("embedding").as("cv"))
          .crossJoin(broadcast(anchorsE))
          .filter(col("cand_id") =!= col("anchor_id"))
          .select(col("anchor_id"), col("cand_id"),
            round(Similarity.cosine(col("cv"), col("av")), 6).as("cos"))
          .withColumn("rnk_cos", row_number().over(w
            .partitionBy(col("anchor_id"))
            .orderBy(col("cos").desc, col("cand_id"))).cast("long"))
          .select(col("anchor_id"), col("cand_id"), col("rnk_cos"))
        val g3 = docs.select(col("doc_id"),
          explode(TextOps.ngramsDistinct(col("text"), 3)).as("gram"))
        val sizes = g3.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = g3
          .join(broadcast(g3.filter(col("doc_id") < 8)
            .select(col("doc_id").as("anchor_id"), col("gram"))),
            Seq("gram"))
          .filter(col("doc_id") =!= col("anchor_id"))
          .groupBy(col("anchor_id"), col("doc_id").as("cand_id"))
          .agg(count(lit(1)).as("inter"))
        val jacR = docs.select(col("doc_id").as("cand_id"))
          .crossJoin(broadcast(docs.filter(col("doc_id") < 8)
            .select(col("doc_id").as("anchor_id"))))
          .filter(col("cand_id") =!= col("anchor_id"))
          .join(inter, Seq("anchor_id", "cand_id"), "left")
          .withColumn("inter", coalesce(col("inter"), lit(0L)))
          .join(sizes.select(col("doc_id").as("cand_id"),
            col("sz").as("sz_c")), Seq("cand_id"), "left")
          .join(broadcast(sizes.filter(col("doc_id") < 8)
            .select(col("doc_id").as("anchor_id"), col("sz").as("sz_a"))),
            Seq("anchor_id"), "left")
          .withColumn("jac", expr(
            "CASE WHEN coalesce(sz_a, 0) + coalesce(sz_c, 0) - inter = 0" +
              " THEN 0 ELSE inter * 1000000" +
              " DIV (coalesce(sz_a, 0) + coalesce(sz_c, 0) - inter) END"))
          .withColumn("rnk_jac", row_number().over(w
            .partitionBy(col("anchor_id"))
            .orderBy(col("jac").desc, col("cand_id"))).cast("long"))
          .select(col("anchor_id"), col("cand_id"), col("rnk_jac"))
        cosR.join(jacR, Seq("anchor_id", "cand_id"))
          .withColumn("rrf_x1e6", expr(
            "1000000 DIV (60 + rnk_cos) + 1000000 DIV (60 + rnk_jac)"))
          .withColumn("rnk", row_number().over(w
            .partitionBy(col("anchor_id"))
            .orderBy(col("rrf_x1e6").desc, col("cand_id"))).cast("long"))
          .filter(col("rnk") <= 10)
          .select(col("anchor_id"), col("cand_id"), col("rnk_cos"),
            col("rnk_jac"), col("rrf_x1e6"), col("rnk"))
          .orderBy(col("anchor_id"), col("rnk"))
      },
      Some(
        s"""WITH a AS (
           | SELECT vec_id AS anchor_id, embedding AS av
           | FROM embeddings WHERE vec_id < 8),
           |cosr AS (
           | SELECT anchor_id, cand_id, row_number() OVER
           |   (PARTITION BY anchor_id ORDER BY cos DESC, cand_id)
           |   AS rnk_cos
           | FROM (
           |  SELECT a.anchor_id, e.vec_id AS cand_id,
           |   round(${OpsQueries.cosSql("e.embedding", "a.av")}, 6) AS cos
           |  FROM embeddings e, a WHERE e.vec_id <> a.anchor_id)),
           |tk AS (SELECT doc_id, $toksSql AS t FROM documents),
           |g3 AS (
           | SELECT doc_id, unnest(list_distinct(
           |  list_transform(generate_series(1, len(t) - 2),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
           | FROM tk),
           |sz AS (SELECT doc_id, count(*) AS sz FROM g3 GROUP BY 1),
           |itr AS (
           | SELECT ag.doc_id AS anchor_id, g3.doc_id AS cand_id,
           |  count(*) AS inter
           | FROM g3 JOIN g3 ag USING (gram)
           | WHERE ag.doc_id < 8 AND g3.doc_id <> ag.doc_id
           | GROUP BY 1, 2),
           |jacr AS (
           | SELECT anchor_id, cand_id, row_number() OVER
           |   (PARTITION BY anchor_id ORDER BY jac DESC, cand_id)
           |   AS rnk_jac
           | FROM (
           |  SELECT an.doc_id AS anchor_id, c.doc_id AS cand_id,
           |   CASE WHEN COALESCE(sa.sz, 0) + COALESCE(sc.sz, 0)
           |     - COALESCE(itr.inter, 0) = 0 THEN 0
           |    ELSE COALESCE(itr.inter, 0) * 1000000
           |     // (COALESCE(sa.sz, 0) + COALESCE(sc.sz, 0)
           |        - COALESCE(itr.inter, 0)) END AS jac
           |  FROM documents c
           |  CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id < 8) an
           |  LEFT JOIN itr ON itr.anchor_id = an.doc_id
           |   AND itr.cand_id = c.doc_id
           |  LEFT JOIN sz sc ON sc.doc_id = c.doc_id
           |  LEFT JOIN sz sa ON sa.doc_id = an.doc_id
           |  WHERE c.doc_id <> an.doc_id)),
           |fused AS (
           | SELECT anchor_id, cand_id, rnk_cos, rnk_jac,
           |  1000000 // (60 + rnk_cos) + 1000000 // (60 + rnk_jac)
           |   AS rrf_x1e6
           | FROM cosr JOIN jacr USING (anchor_id, cand_id))
           |SELECT anchor_id, cand_id,
           | CAST(rnk_cos AS BIGINT) AS rnk_cos,
           | CAST(rnk_jac AS BIGINT) AS rnk_jac,
           | CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6,
           | CAST(rnk AS BIGINT) AS rnk
           |FROM (
           | SELECT *, row_number() OVER
           |  (PARTITION BY anchor_id ORDER BY rrf_x1e6 DESC, cand_id)
           |  AS rnk FROM fused)
           |WHERE rnk <= 10 ORDER BY anchor_id, rnk""".stripMargin))
  )
}
