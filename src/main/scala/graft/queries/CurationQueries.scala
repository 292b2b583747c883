package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-6 curation-pipeline additions: LM-surprisal quality scoring,
  * mixture reweighting, token-balanced curriculum phases, and the
  * cross-label leakage audit. Each operator lives in
  * [[graft.ops.TextOps]] with its scale posture documented there;
  * every query here is DuckDB-oracle-checked (integer-exact — the
  * bitlen trick for logs, permille arithmetic for rates, truncating
  * division both sides).
  */
object CurationQueries {

  import Registry.Q

  private def t = Registry.table _

  private val toksSql = OpsQueries.toksSql

  def all: Map[String, Q] = Map(

    // Perplexity-proxy quality filter: per-doc mean bigram surprisal
    // in integer bits under the corpus's own bigram LM. Complements
    // q123 (occurrence-rank surprise): this one scores probability
    // RATIOS, so a rare continuation of a common prefix (the fluency
    // break) costs bits even when the bigram itself is mid-table.
    "q174_lm_surprisal" -> Q(
      (s, dir) => TextOps.lmSurprisal(t(s, dir, "documents"),
        "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tok AS (
           | SELECT doc_id AS id, $toksSql AS t FROM documents),
           |bgt AS (
           | SELECT id, unnest(list_transform(generate_series(1, len(t) - 1),
           |   i -> t[i] || ' ' || t[i+1])) AS bg FROM tok),
           |c2 AS (SELECT bg, count(*) AS c2,
           |  string_split(bg, ' ')[1] AS w1 FROM bgt GROUP BY 1),
           |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
           |bits AS (SELECT bg,
           |  CAST(length(printf('%b', c1)) - length(printf('%b', c2)) AS BIGINT)
           |   AS bits FROM c2 JOIN c1 USING (w1))
           |SELECT id AS doc_id, count(*) AS n_bigrams,
           | CAST(sum(bits) AS BIGINT) AS bits_sum,
           | CAST(sum(bits) * 100 // count(*) AS BIGINT) AS bits_x100
           |FROM bgt JOIN bits USING (bg)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Mixture reweighting plan against target permille shares —
    // covers all three branches on this corpus (20 uniform sources):
    // src0 wants 30% (starved -> keep-all + deficit), src1 wants 4%
    // (downsample to 800 permille), src2 wants 1% (deep downsample),
    // the other 17 sources are unlisted (target 0 -> dropped).
    "q175_mixture_reweight" -> Q(
      (s, dir) => TextOps.mixtureReweight(t(s, dir, "documents"),
        col("source"), Seq("src0" -> 300, "src1" -> 40, "src2" -> 10))
        .orderBy(col("source")),
      Some(
        """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
          |tp AS (SELECT c.source, c.n_docs,
          |  CASE c.source WHEN 'src0' THEN 300 WHEN 'src1' THEN 40
          |   WHEN 'src2' THEN 10 ELSE 0 END AS target_permille,
          |  tot.n_total FROM c, tot),
          |k AS (SELECT *, least(1000,
          |   (target_permille * n_total) // n_docs) AS keep_permille FROM tp),
          |e AS (SELECT *, (n_docs * keep_permille) // 1000 AS expected_docs FROM k)
          |SELECT source, n_docs, target_permille,
          | CAST(keep_permille AS BIGINT) AS keep_permille,
          | CAST(expected_docs AS BIGINT) AS expected_docs,
          | CAST(greatest(0, (target_permille * n_total) // 1000 - expected_docs)
          |  AS BIGINT) AS deficit_docs
          |FROM e ORDER BY source""".stripMargin)),

    // Token-balanced curriculum: easiest-first by n_chars, cut into 3
    // contiguous phases of ~equal token mass via the distributed
    // prefix sum (score-domain buckets -> driver offsets -> windowed
    // cumsum per bucket; no global sort).
    "q176_curriculum_phases" -> Q(
      (s, dir) => TextOps.curriculumPhases(t(s, dir, "documents"),
        "doc_id", col("n_chars"), TextOps.tokenCount(col("text")),
        phases = 3),
      Some(
        s"""WITH tok AS (
           | SELECT doc_id, n_chars,
           |  CAST(coalesce(len($toksSql), 0) AS BIGINT) AS toks
           | FROM documents),
           |cum AS (SELECT doc_id, n_chars, toks,
           |  sum(toks) OVER (ORDER BY n_chars, doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           | FROM tok),
           |tot AS (SELECT CAST(greatest(sum(toks), 1) AS BIGINT) AS total FROM tok)
           |SELECT CAST(((cum - 1) * 3) // total AS BIGINT) AS phase,
           | count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
           | CAST(min(n_chars) AS BIGINT) AS min_score,
           | CAST(max(n_chars) AS BIGINT) AS max_score
           |FROM cum, tot GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Split-hygiene audit: distinct 8-grams shared across language
    // labels — catches identical boilerplate (or whole docs) filed
    // under two splits. Oracle is the brute self-join on the
    // (label, gram) table; the Spark plan never joins docs pairwise
    // (grams collapse to label SETS, pairs explode from those).
    "q177_cross_label_leakage" -> Q(
      (s, dir) => TextOps.crossLabelLeakage(t(s, dir, "documents"),
        "doc_id", col("lang"), "text", n = 8),
      Some(
        s"""WITH tk AS (SELECT lang, $toksSql AS t FROM documents),
           |g AS (SELECT DISTINCT lang, unnest(list_distinct(
           |  list_transform(generate_series(1, len(t) - 7),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           |    || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
           |    || ' ' || t[i+7]))) AS gram FROM tk)
           |SELECT a.lang AS lab_a, b.lang AS lab_b,
           | count(*) AS n_shared_grams
           |FROM g a JOIN g b ON a.gram = b.gram AND a.lang < b.lang
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
