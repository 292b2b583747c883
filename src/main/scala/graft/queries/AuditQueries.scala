package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Dedup, Eval, Quantize, Scrub, SemDedup, Similarity, Skew, TextOps}

/** Release-audit additions (q132+): the reports a data-release review
  * asks for right before shipping — what would the scrub stage mask,
  * how much do the crawls REALLY overlap (exact, not estimated), and
  * where do the robust length cutoffs sit. Same oracle discipline as
  * the rest of the registry: integer-exact formulas, Java∩RE2 regex
  * subset, multi-referenced CTEs MATERIALIZED.
  */
object AuditQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)


  /** The per-group KS-vs-global oracle (exact integer
    * cross-multiplied ECDF gap) — shared by the batch (q138) and
    * streaming (q178) embodiments, which must both equal it.
    */
  private[queries] val ksDriftOracle: String =
    """WITH rows_f AS (
          | SELECT source AS grp, n_chars AS v FROM documents
          | WHERE n_chars IS NOT NULL),
          |gh AS MATERIALIZED (
          | SELECT grp, v, count(*) AS cnt FROM rows_f GROUP BY 1, 2),
          |ah AS MATERIALIZED (
          | SELECT v, sum(cnt) AS cnt_all FROM gh GROUP BY 1),
          |ac AS (
          | SELECT v, cnt_all,
          |  sum(cnt_all) OVER (ORDER BY v
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
          | FROM ah),
          |gc AS (
          | SELECT grp, v, cnt,
          |  sum(cnt) OVER (PARTITION BY grp ORDER BY v
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
          | FROM gh),
          |tot AS MATERIALIZED (
          | SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g
          | FROM gh GROUP BY 1),
          |tot2 AS (
          | SELECT grp, n_g, CAST(sum(n_g) OVER () AS BIGINT) AS n_all
          | FROM tot),
          |j AS (
          | SELECT g.grp, t.n_g, t.n_all,
          |  greatest(
          |   abs(CAST(g.cum_g AS HUGEINT) * t.n_all -
          |       CAST(a.cum_all AS HUGEINT) * t.n_g),
          |   abs(CAST(g.cum_g - g.cnt AS HUGEINT) * t.n_all -
          |       CAST(a.cum_all - a.cnt_all AS HUGEINT) * t.n_g)) AS gap
          | FROM gc g JOIN ac a USING (v) JOIN tot2 t ON g.grp = t.grp)
          |SELECT grp AS source, CAST(any_value(n_g) AS BIGINT) AS n,
          | CAST((max(gap) * 1000) //
          |  (CAST(any_value(n_g) AS HUGEINT) * any_value(n_all))
          |  AS BIGINT) AS ks_permille
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Map[String, Q] = Map(

    // scrub-stage audit over the entity-name surfaces: per
    // (entity, rule) rows scanned/hit, match counts, and the exact
    // character delta masking would cause. Patterns sit in the
    // Java∩RE2 common subset so both engines count identically
    // (ops/Scrub.scala documents the contract).
    "q132_redaction_audit" -> Q(
      (s, dir) => {
        val rules = Seq(
          Scrub.Rule("digit_run", "[0-9]{6,}", "<ID>"),
          Scrub.Rule("entity_tag", "(Customer|Supplier)#", "<ENT>#"))
        val u = t(s, dir, "customer")
          .select(lit("customer").as("entity"), col("c_name").as("nm"))
          .unionByName(t(s, dir, "supplier")
            .select(lit("supplier").as("entity"), col("s_name").as("nm")))
        Scrub.redactionAudit(u, col("nm"), col("entity"), rules)
          .withColumnRenamed("grp", "entity")
          .orderBy(col("entity"), col("category"))
      },
      Some(
        """WITH u AS (
          | SELECT 'customer' AS entity, c_name AS nm FROM customer
          | UNION ALL SELECT 'supplier', s_name FROM supplier),
          |r(category, pat, repl) AS (
          | VALUES ('digit_run', '[0-9]{6,}', '<ID>'),
          |        ('entity_tag', '(Customer|Supplier)#', '<ENT>#')),
          |m AS (
          | SELECT entity, category,
          |  len(regexp_extract_all(nm, pat)) AS cnt,
          |  length(nm) - length(regexp_replace(nm, pat, repl, 'g')) AS delta
          | FROM u CROSS JOIN r)
          |SELECT entity, category, count(*) AS n_rows,
          | CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_hit,
          | CAST(sum(cnt) AS BIGINT) AS n_matches,
          | CAST(sum(delta) AS BIGINT) AS chars_delta
          |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // EXACT source-overlap matrix — the calibration differential for
    // q120's MinHash estimate: same pair key and the SAME 3-gram
    // shingle-set statistic the signatures estimate (a different set
    // definition would attribute vocabulary-vs-shingle divergence to
    // estimator error), exact in permille, zero-overlap pairs kept.
    // The corpus collapses once to the distinct (source, gram) table;
    // every later frame is vocab- or catalog-sized.
    "q133_source_jaccard_exact" -> Q(
      (s, dir) => Dedup.sourceOverlapExact(
        t(s, dir, "documents"), "source", "text", n = 3)
        .orderBy(col("src_a"), col("src_b")),
      Some(
        """WITH tk AS (
          | SELECT source AS src,
          |  list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents),
          |tok AS MATERIALIZED (
          | SELECT DISTINCT src, token FROM (
          |  SELECT src,
          |   unnest(list_transform(generate_series(1, len(t) - 2),
          |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS token
          |  FROM tk)),
          |sz AS MATERIALIZED (
          | SELECT src, count(*) AS n FROM tok GROUP BY 1),
          |pr AS (
          | SELECT a.src AS src_a, b.src AS src_b, a.n AS n_a, b.n AS n_b
          | FROM sz a JOIN sz b ON a.src < b.src),
          |iv AS (
          | SELECT a.src AS src_a, b.src AS src_b, count(*) AS i
          | FROM tok a JOIN tok b ON a.token = b.token AND a.src < b.src
          | GROUP BY 1, 2)
          |SELECT src_a, src_b,
          | CAST(coalesce(i, 0) AS BIGINT) AS inter,
          | CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          | CAST(coalesce(i, 0) * 1000 // (n_a + n_b - coalesce(i, 0))
          |  AS BIGINT) AS jaccard_permille
          |FROM pr LEFT JOIN iv USING (src_a, src_b)
          |ORDER BY src_a, src_b""".stripMargin)),

    // winsorized length stats per language: exact p05/p95 cutoffs
    // located on the value-domain histogram (no corpus-scale sort),
    // clipped sum/mean and per-side clip counts derived from the
    // same histogram — the truncation-policy report.
    "q134_winsorized_stats" -> Q(
      (s, dir) => TextOps.winsorizedStats(t(s, dir, "documents"),
        col("lang"), col("n_chars"), loPermille = 50, hiPermille = 950)
        .withColumnRenamed("grp", "lang")
        .orderBy(col("lang")),
      Some(
        """WITH hist AS MATERIALIZED (
          | SELECT lang, n_chars AS v, count(*) AS cnt
          | FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
          |h AS (
          | SELECT lang, v, cnt,
          |  sum(cnt) OVER (PARTITION BY lang ORDER BY v
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |  sum(cnt) OVER (PARTITION BY lang) AS n
          | FROM hist),
          |cuts AS MATERIALIZED (
          | SELECT lang, max(n) AS n,
          |  min(CASE WHEN cum * 1000 >= n * 50 THEN v END) AS lo_cut,
          |  min(CASE WHEN cum * 1000 >= n * 950 THEN v END) AS hi_cut
          | FROM h GROUP BY 1)
          |SELECT lang, CAST(max(n) AS BIGINT) AS n,
          | CAST(max(lo_cut) AS BIGINT) AS lo_cut,
          | CAST(max(hi_cut) AS BIGINT) AS hi_cut,
          | CAST(sum(greatest(least(v, hi_cut), lo_cut) * cnt) AS BIGINT)
          |  AS winsor_sum,
          | CAST(sum(CASE WHEN v < lo_cut THEN cnt ELSE 0 END) AS BIGINT)
          |  AS clipped_lo,
          | CAST(sum(CASE WHEN v > hi_cut THEN cnt ELSE 0 END) AS BIGINT)
          |  AS clipped_hi,
          | CAST(sum(greatest(least(v, hi_cut), lo_cut) * cnt) * 1000
          |  // max(n) AS BIGINT) AS winsor_mean_permille
          |FROM hist JOIN cuts USING (lang) GROUP BY lang
          |ORDER BY lang""".stripMargin)),

    // filter-cascade calibration: the cheap quality score (q21's
    // integer formula) audited against the expensive repetition
    // verdict (q71's signals) at every threshold — precision/recall/
    // F1 in exact integer permille, computed entirely on the
    // score-domain histogram (ops/Eval.scala).
    "q135_cascade_calibration" -> Q(
      (s, dir) => {
        val sig = t(s, dir, "documents").select(
          TextOps.qualitySignals(col("text")).as("q"),
          TextOps.repetitionStats(col("text")).as("r"))
        val scored = sig.select(
          (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
            when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"),
          when(col("r.n_dup_bigrams") * 5 <= col("r.n_bigrams") &&
            col("r.top_tok_cnt") * 5 <= col("r.n_tokens"), 1L)
            .otherwise(0L).as("label"))
        Eval.thresholdSweep(scored, col("score"), col("label"))
          .orderBy(col("threshold"))
      },
      Some(
        """WITH tk AS (
          | SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents),
          |sig AS MATERIALIZED (
          | SELECT
          |  CAST(len(list_distinct(t)) AS INTEGER) * 2 +
          |  CAST(len(list_intersect(list_distinct(t),
          |    ['the','a','of','and','to','in','is'])) AS INTEGER) * 3 -
          |  CASE WHEN CAST(list_aggregate(list_transform(t,
          |    x -> length(x)), 'max') AS INTEGER) > 12
          |   THEN 5 ELSE 0 END AS score,
          |  CASE WHEN
          |   (CAST(greatest(len(t) - 1, 0) AS INTEGER) -
          |    CAST(len(list_distinct(list_transform(
          |     generate_series(1, len(t) - 1),
          |     i -> t[i] || ' ' || t[i+1]))) AS INTEGER)) * 5
          |     <= CAST(greatest(len(t) - 1, 0) AS INTEGER)
          |   AND CAST(list_aggregate(list_transform(list_distinct(t),
          |     x -> len(list_filter(t, y -> y = x))), 'max')
          |     AS INTEGER) * 5 <= CAST(len(t) AS INTEGER)
          |   THEN 1 ELSE 0 END AS label
          | FROM tk),
          |h AS MATERIALIZED (
          | SELECT score AS threshold, count(*) AS cnt, sum(label) AS pos
          | FROM sig GROUP BY 1),
          |c AS (
          | SELECT threshold,
          |  sum(cnt) OVER (ORDER BY threshold DESC
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
          |  sum(pos) OVER (ORDER BY threshold DESC
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
          |  sum(pos) OVER () AS total_pos
          | FROM h)
          |SELECT threshold,
          | CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
          | CAST(tp * 1000 // n_pred AS BIGINT) AS precision_permille,
          | CAST(CASE WHEN total_pos = 0 THEN 0
          |  ELSE tp * 1000 // total_pos END AS BIGINT) AS recall_permille,
          | CAST(tp * 2000 // (n_pred + total_pos) AS BIGINT) AS f1_permille
          |FROM c ORDER BY threshold""".stripMargin)),

    // per-vector embedding release audit grouped by dimensionality:
    // ragged arrays, zero vectors, exact fixed-point norm extremes
    // and means — the check an index build runs first. Complements
    // q100's per-DIMENSION quantize audit.
    "q136_embedding_audit" -> Q(
      (s, dir) => Quantize.embeddingAudit(t(s, dir, "embeddings"),
        "embedding").orderBy(col("dims")),
      Some(
        // per-ROW list folds, never unnest+group-by-id: unnest would
        // DROP empty/NULL vectors (the degenerate rows the audit
        // exists to catch) and merge duplicated ids into one
        // meaningless summed norm
        """WITH ex AS (
          | SELECT len(embedding) AS dims,
          |  list_aggregate(list_transform(embedding,
          |   v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT) *
          |        CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)),
          |   'sum') AS s
          | FROM embeddings),
          |nv AS (
          | SELECT dims,
          |  CASE WHEN dims IS NOT NULL THEN COALESCE(s, 0) END AS norm2
          | FROM ex),
          |u AS (SELECT dims, norm2, norm2 // 1000000 AS n2u FROM nv)
          |SELECT CAST(dims AS INTEGER) AS dims, count(*) AS n,
          | CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |  AS n_zero,
          | CAST(min(n2u) AS BIGINT) AS min_norm2u,
          | CAST(max(n2u) AS BIGINT) AS max_norm2u,
          | CAST(sum(n2u) AS BIGINT) AS sum_norm2u,
          | CAST(sum(n2u) // count(*) AS BIGINT) AS avg_norm2u
          |FROM u GROUP BY dims ORDER BY dims""".stripMargin)),

    // per-LANGUAGE AUC of the cheap cascade score against the
    // expensive repetition verdict — the generalization check on
    // q135's global calibration: a language whose AUC collapses needs
    // its own threshold (or its own filter). Exact Mann-Whitney with
    // tie handling on the per-lang score histogram (ops/Eval.scala);
    // rank sums accumulate in DECIMAL(38,0)/HUGEINT.
    "q137_score_auc" -> Q(
      (s, dir) => {
        val sig = t(s, dir, "documents").select(
          col("lang"),
          TextOps.qualitySignals(col("text")).as("q"),
          TextOps.repetitionStats(col("text")).as("r"))
        val scored = sig.select(
          col("lang"),
          (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
            when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"),
          when(col("r.n_dup_bigrams") * 5 <= col("r.n_bigrams") &&
            col("r.top_tok_cnt") * 5 <= col("r.n_tokens"), 1L)
            .otherwise(0L).as("label"))
        Eval.groupAuc(scored, col("lang"), col("score"), col("label"))
          .withColumnRenamed("grp", "lang")
          .orderBy(col("lang"))
      },
      Some(
        """WITH tk AS (
          | SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents),
          |sig AS MATERIALIZED (
          | SELECT lang,
          |  CAST(len(list_distinct(t)) AS INTEGER) * 2 +
          |  CAST(len(list_intersect(list_distinct(t),
          |    ['the','a','of','and','to','in','is'])) AS INTEGER) * 3 -
          |  CASE WHEN CAST(list_aggregate(list_transform(t,
          |    x -> length(x)), 'max') AS INTEGER) > 12
          |   THEN 5 ELSE 0 END AS score,
          |  CASE WHEN
          |   (CAST(greatest(len(t) - 1, 0) AS INTEGER) -
          |    CAST(len(list_distinct(list_transform(
          |     generate_series(1, len(t) - 1),
          |     i -> t[i] || ' ' || t[i+1]))) AS INTEGER)) * 5
          |     <= CAST(greatest(len(t) - 1, 0) AS INTEGER)
          |   AND CAST(list_aggregate(list_transform(list_distinct(t),
          |     x -> len(list_filter(t, y -> y = x))), 'max')
          |     AS INTEGER) * 5 <= CAST(len(t) AS INTEGER)
          |   THEN 1 ELSE 0 END AS label
          | FROM tk),
          |h AS MATERIALIZED (
          | SELECT lang, score, count(*) AS cnt, sum(label) AS pos
          | FROM sig GROUP BY 1, 2),
          |c AS (
          | SELECT lang, cnt, pos,
          |  sum(cnt) OVER (PARTITION BY lang ORDER BY score
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          | FROM h),
          |g AS (
          | SELECT lang, CAST(sum(cnt) AS BIGINT) AS n,
          |  CAST(sum(pos) AS BIGINT) AS n_pos,
          |  sum(CAST(pos AS HUGEINT) * (2 * cum - cnt + 1)) AS r2
          | FROM c GROUP BY 1),
          |u AS (
          | SELECT lang, n, n_pos, n - n_pos AS n_neg,
          |  r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS u2
          | FROM g)
          |SELECT lang, n, n_pos,
          | CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          |  ELSE (u2 * 1000) // (CAST(n_pos AS HUGEINT) * 2 * n_neg)
          |  END AS BIGINT) AS auc_permille
          |FROM u ORDER BY lang""".stripMargin)),

    // per-source Kolmogorov-Smirnov drift of the length distribution
    // against the whole corpus — the release check that catches a
    // crawl whose length profile quietly diverged. Exact integer
    // cross-multiplied ECDF gap (ops/Eval.scala), permille output.
    "q138_length_ks" -> Q(
      (s, dir) => Eval.ksDrift(t(s, dir, "documents"),
        col("source"), col("n_chars"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source")),
      Some(AuditQueries.ksDriftOracle)),

    // deterministic hash-split audit: every doc lands in train/val/
    // test by md5(doc_id) bucket (the portable hash32 — stable across
    // engines, re-runs, and cluster sizes), and the report shows the
    // realized per-language composition. What shuffles is only the
    // (lang, split) partials; the permille share comes from a
    // lang-partitioned window on the 15-row aggregate.
    "q139_split_audit" -> Q(
      (s, dir) => {
        val b = TextOps.hash32(col("doc_id").cast("string")) % 100
        t(s, dir, "documents")
          .select(col("lang"),
            when(b < 80, "train").when(b < 90, "val").otherwise("test")
              .as("split"),
            col("n_chars"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .withColumn("n_lang",
            sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
          .select(col("lang"), col("split"), col("n_docs"),
            col("sum_chars"),
            expr("(n_docs * 1000) DIV n_lang").as("lang_permille"))
          .orderBy(col("lang"), col("split"))
      },
      Some(
        """WITH d AS (
          | SELECT lang,
          |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
          |    ::BIGINT % 100 < 80 THEN 'train'
          |   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
          |    ::BIGINT % 100 < 90 THEN 'val'
          |   ELSE 'test' END AS split,
          |  n_chars
          | FROM documents),
          |g AS MATERIALIZED (
          | SELECT lang, split, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
          | FROM d GROUP BY 1, 2)
          |SELECT lang, split, n_docs, sum_chars,
          | CAST(n_docs * 1000 //
          |  (sum(n_docs) OVER (PARTITION BY lang)) AS BIGINT)
          |  AS lang_permille
          |FROM g ORDER BY lang, split""".stripMargin)),

    // per-source vocabulary richness with the bias-corrected Chao1
    // estimate of total (unseen-included) vocabulary — the data-card
    // number that says how much NEW vocabulary another crawl of the
    // same source would add (high f1 share = undersampled source).
    "q140_vocab_richness" -> Q(
      (s, dir) => TextOps.vocabRichness(t(s, dir, "documents"),
        col("source"), col("text"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source")),
      Some(
        """WITH tok AS (
          | SELECT source AS grp,
          |  unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          |   AS token
          | FROM documents),
          |tc AS MATERIALIZED (
          | SELECT grp, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
          |g AS (
          | SELECT grp, CAST(count(*) AS BIGINT) AS d_observed,
          |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          |  CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          |  CAST(sum(cnt) AS BIGINT) AS n_tokens
          | FROM tc GROUP BY 1)
          |SELECT grp AS source, n_tokens, d_observed, f1, f2,
          | d_observed + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS chao1
          |FROM g ORDER BY source""".stripMargin)),

    // pairwise label-centroid distance matrix in exact fixed-point —
    // the class-separation audit: labels whose centroids collapse
    // predict retrieval confusion. One corpus pass to (label, dim)
    // partials; the pair matrix is a broadcast self-join of the
    // catalog-sized centroid frame.
    "q141_centroid_distances" -> Q(
      (s, dir) => Quantize.centroidDistances(t(s, dir, "embeddings"),
        "embedding", col("label"), dims = 64)
        .orderBy(col("grp_a"), col("grp_b")),
      Some(
        """WITH ex AS (
          | SELECT label AS grp, unnest(range(len(embedding))) AS i,
          |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
          |   AS BIGINT) AS m
          | FROM embeddings WHERE len(embedding) = 64),
          |cent AS MATERIALIZED (
          | SELECT grp, i, CAST(sum(m) AS BIGINT) // count(*) AS c,
          |  count(*) AS cnt
          | FROM ex GROUP BY 1, 2)
          |SELECT a.grp AS grp_a, b.grp AS grp_b,
          | CAST(max(a.cnt) AS BIGINT) AS n_a,
          | CAST(max(b.cnt) AS BIGINT) AS n_b,
          | CAST(sum((a.c - b.c) * (a.c - b.c)) // 1000000 AS BIGINT)
          |  AS dist2u
          |FROM cent a JOIN cent b ON a.i = b.i AND a.grp < b.grp
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // encoding-hygiene audit per source: U+FFFD replacement chars,
    // bare control chars, non-ASCII density, longest space run — the
    // mojibake check before tokenization. Both engines count
    // CODEPOINTS (Spark length == DuckDB len) and match the same
    // RE2∩Java classes, so the strip-subtraction counts are exact.
    "q142_encoding_audit" -> Q(
      (s, dir) => Scrub.encodingAudit(t(s, dir, "documents"),
        col("text"), col("source"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source")),
      Some(
        """WITH d AS (
          | SELECT source AS grp,
          |  len(text) AS n_chars,
          |  len(text) - len(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))
          |   AS n_nonascii,
          |  CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END
          |   AS has_repl,
          |  CASE WHEN regexp_matches(text,
          |   '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS has_ctl,
          |  COALESCE(list_max(list_transform(
          |   regexp_extract_all(text, ' +'), m -> len(m))), 0) AS ws_run
          | FROM documents WHERE text IS NOT NULL)
          |SELECT grp AS source, count(*) AS n_docs,
          | CAST(sum(has_repl) AS BIGINT) AS docs_replacement,
          | CAST(sum(has_ctl) AS BIGINT) AS docs_control,
          | CAST(sum(n_chars) AS BIGINT) AS n_chars,
          | CAST(sum(n_nonascii) AS BIGINT) AS n_nonascii,
          | CAST(CASE WHEN sum(n_chars) = 0 THEN 0
          |  ELSE (sum(n_nonascii) * 1000) // sum(n_chars) END AS BIGINT)
          |  AS nonascii_permille,
          | CAST(max(ws_run) AS BIGINT) AS max_ws_run
          |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // matryoshka-truncation retrieval audit: per probe, how much of
    // the full-64-dim top-10 neighborhood survives at 16 dims — the
    // go/no-go number for shipping a truncated index. Probes
    // broadcast; the corpus is scored in one pass; both rankings are
    // windows over the same scored frame.
    "q143_truncation_recall" -> Q(
      (s, dir) => Similarity.truncationRecall(t(s, dir, "embeddings"),
        "vec_id", "embedding", nProbes = 10, k = 10, prefixDims = 16)
        .withColumnRenamed("pid", "vec_id")
        .orderBy(col("vec_id")),
      Some(
        s"""WITH p AS (
           | SELECT vec_id AS pid, embedding AS pv FROM embeddings
           | WHERE vec_id < 10),
           |sc AS MATERIALIZED (
           | SELECT p.pid, e.vec_id AS cid,
           |  round(${OpsQueries.cosSql("e.embedding", "p.pv")}, 6)
           |   AS cos_full,
           |  round(${OpsQueries.cosSql("e.embedding", "p.pv", 16)}, 6)
           |   AS cos_trunc
           | FROM embeddings e, p WHERE e.vec_id <> p.pid),
           |r AS (
           | SELECT pid, cid,
           |  row_number() OVER (PARTITION BY pid
           |   ORDER BY cos_full DESC, cid) AS rf,
           |  row_number() OVER (PARTITION BY pid
           |   ORDER BY cos_trunc DESC, cid) AS rt
           | FROM sc)
           |SELECT pid AS vec_id,
           | CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END)
           |  AS BIGINT) AS overlap_at_k,
           | CAST((sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END)
           |  * 1000) // 10 AS BIGINT) AS overlap_permille
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // exact chi-square independence audit of source x language: full
    // contingency table (zero cells included) with integer expected
    // counts and chi-square contributions — "is language mix
    // independent of source" as a number, not a feeling. Cleared
    // denominators + split-division keep it bit-exact in
    // DECIMAL(38)/HUGEINT (ops/Eval.scala documents the ~3e9-row
    // bound).
    "q144_chi2_independence" -> Q(
      (s, dir) => Eval.chi2Independence(t(s, dir, "documents"),
        col("source"), col("lang"))
        .withColumnRenamed("r", "source")
        .withColumnRenamed("c", "lang")
        .orderBy(col("source"), col("lang")),
      Some(
        """WITH cells AS MATERIALIZED (
          | SELECT source AS r, lang AS c, count(*) AS obs
          | FROM documents GROUP BY 1, 2),
          |rm AS MATERIALIZED (SELECT r, sum(obs) AS rn FROM cells GROUP BY 1),
          |cm AS MATERIALIZED (SELECT c, sum(obs) AS cn FROM cells GROUP BY 1),
          |full_t AS (
          | SELECT rm.r, cm.c, rm.rn, cm.cn, COALESCE(cells.obs, 0) AS obs
          | FROM rm CROSS JOIN cm
          | LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
          |w AS (
          | SELECT r, c, rn, cn, obs, sum(obs) OVER () AS n FROM full_t),
          |d1 AS (
          | SELECT r, c, obs, rn, cn, n,
          |  CAST(obs AS HUGEINT) * n - CAST(rn AS HUGEINT) * cn AS dev,
          |  CAST(n AS HUGEINT) * rn * cn AS den
          | FROM w),
          |sc AS MATERIALIZED (
          | SELECT r, c, CAST(obs AS BIGINT) AS obs,
          |  CAST((CAST(rn AS HUGEINT) * cn * 1000) // n AS BIGINT)
          |   AS exp_milli,
          |  CAST((dev * dev // den) * 1000000 +
          |   ((dev * dev % den) * 1000000) // den AS BIGINT)
          |   AS contrib_micros
          | FROM d1)
          |SELECT r AS source, c AS lang, obs, exp_milli, contrib_micros,
          | CAST(sum(contrib_micros) OVER () AS BIGINT)
          |  AS chi2_total_micros
          |FROM sc ORDER BY 1, 2""".stripMargin)),

    // key-skew profile of events.user_id — exact size percentiles,
    // hottest-key share, and the Gini coefficient of the key-size
    // distribution, all from the count-of-counts histogram: the
    // report that decides whether a shuffle needs salting before the
    // job runs at scale (ops/Skew.scala mitigations).
    "q145_key_skew" -> Q(
      (s, dir) => Skew.keySkewProfile(t(s, dir, "events"),
        col("user_id")),
      Some(
        """WITH kc AS MATERIALIZED (
          | SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
          |coc AS MATERIALIZED (
          | SELECT cnt, count(*) AS k FROM kc GROUP BY 1),
          |w AS (
          | SELECT cnt, k,
          |  sum(k) OVER (ORDER BY cnt
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kcum,
          |  sum(k) OVER () AS n_keys,
          |  sum(cnt * k) OVER () AS n_rows
          | FROM coc),
          |a AS (
          | SELECT CAST(any_value(n_keys) AS BIGINT) AS n_keys,
          |  CAST(any_value(n_rows) AS BIGINT) AS n_rows,
          |  CAST(max(cnt) AS BIGINT) AS top1_cnt,
          |  CAST(min(CASE WHEN kcum * 1000 >= n_keys * 500 THEN cnt END)
          |   AS BIGINT) AS p50_cnt,
          |  CAST(min(CASE WHEN kcum * 1000 >= n_keys * 990 THEN cnt END)
          |   AS BIGINT) AS p99_cnt,
          |  sum(CAST(cnt AS HUGEINT) * k * (kcum * 2 - k - n_keys))
          |   AS gnum
          | FROM w)
          |SELECT n_keys, n_rows, top1_cnt,
          | CAST((top1_cnt * 1000) // n_rows AS BIGINT) AS top1_permille,
          | p50_cnt, p99_cnt,
          | CAST((gnum * 1000) // (CAST(n_keys AS HUGEINT) * n_rows)
          |  AS BIGINT) AS gini_permille
          |FROM a""".stripMargin)),

    // per-source OLS drift trend: exact rational least-squares slope
    // of n_chars over doc_id (ingestion order proxy) in integer
    // micros — "is this source's document length sliding". x rebased
    // per group to keep the moment sums in DECIMAL(38)/HUGEINT
    // (slope is shift-invariant); split-division floors identically
    // cross-engine, negatives included (ops/Eval.scala).
    "q147_source_trend" -> Q(
      (s, dir) => Eval.olsTrend(t(s, dir, "documents"),
        col("source"), col("doc_id"), col("n_chars"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source")),
      Some(
        """WITH b AS (
          | SELECT source AS grp, doc_id AS x0, n_chars AS y
          | FROM documents
          | WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
          |mn AS MATERIALIZED (
          | SELECT grp, min(x0) AS xmin FROM b GROUP BY 1),
          |m AS MATERIALIZED (
          | SELECT b.grp, count(*) AS n, max(b.x0 - mn.xmin) AS x_span,
          |  sum(CAST(b.x0 - mn.xmin AS HUGEINT)) AS sx,
          |  sum(CAST(b.y AS HUGEINT)) AS sy,
          |  sum(CAST(b.x0 - mn.xmin AS HUGEINT) * b.y) AS sxy,
          |  sum(CAST(b.x0 - mn.xmin AS HUGEINT) * (b.x0 - mn.xmin))
          |   AS sxx
          | FROM b JOIN mn ON b.grp = mn.grp GROUP BY 1),
          |d AS (
          | SELECT grp, n, x_span, sy,
          |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
          | FROM m)
          |SELECT grp AS source, CAST(n AS BIGINT) AS n,
          | CAST(x_span AS BIGINT) AS x_span,
          | CAST((sy * 1000) // n AS BIGINT) AS mean_y_milli,
          | CAST(CASE WHEN den = 0 THEN NULL
          |  ELSE (num // den) * 1000000 + ((num % den) * 1000000) // den
          |  END AS BIGINT) AS slope_micro
          |FROM d ORDER BY source""".stripMargin)),

    // language-ID confusion matrix: the labeled lang column against
    // the fused lang_predict kernel's verdict — per-class recall on
    // the diagonal, in permille. The oracle re-derives the marker
    // argmax (q20's fragment) and the same share window.
    "q148_lang_confusion" -> Q(
      (s, dir) => Eval.confusionMatrix(t(s, dir, "documents"),
        col("lang"), TextOps.langPredict(col("text")))
        .withColumnRenamed("label", "lang")
        .withColumnRenamed("pred", "lang_pred")
        .orderBy(col("lang"), col("lang_pred")),
      Some {
        val toks = OpsQueries.toksSql
        val scores = TextOps.langMarkers.map { case (l, m) =>
          l -> (s"len(list_intersect(list_distinct($toks), " +
            s"[${m.map("'" + _ + "'").mkString(",")}]))")
        }
        val best = s"greatest(${scores.map(_._2).mkString(", ")})"
        val langCase = scores.map { case (l, sc) =>
          s"WHEN $best > 0 AND $sc = $best THEN '$l'"
        }.mkString(" ")
        s"""WITH p AS (
           | SELECT lang, CASE $langCase ELSE 'und' END AS lang_pred
           | FROM documents),
           |g AS MATERIALIZED (
           | SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY 1, 2)
           |SELECT lang, lang_pred, n,
           | CAST((n * 1000) // (sum(n) OVER (PARTITION BY lang))
           |  AS BIGINT) AS label_permille
           |FROM g ORDER BY 1, 2""".stripMargin
      }),

    // cross-validation fold-leakage audit: assign 5 folds by the
    // portable hash, then count near-dup pairs (q24's MinHash graph)
    // whose members land in DIFFERENT folds — each such pair leaks
    // training text into evaluation. The pair scan dominates; the
    // fold arithmetic rides on the pair frame map-side.
    "q149_fold_leakage" -> Q(
      (s, dir) => {
        val pairs = Dedup.minhashPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("id_a"), col("id_b"))
        def fold(c: Column) = TextOps.hash32(c.cast("string")) % 5
        pairs.select(
          least(fold(col("id_a")), fold(col("id_b"))).as("fold_lo"),
          greatest(fold(col("id_a")), fold(col("id_b"))).as("fold_hi"))
          .groupBy(col("fold_lo"), col("fold_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("leaked",
            (col("fold_lo") =!= col("fold_hi")).cast("long"))
          .orderBy(col("fold_lo"), col("fold_hi"))
      },
      Some {
        def h(e: String) =
          s"(('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT % 5)"
        s"""WITH ${OpsQueries.minhashCtes},
           |pr AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |f AS (
           | SELECT least(${h("id_a")}, ${h("id_b")}) AS fold_lo,
           |  greatest(${h("id_a")}, ${h("id_b")}) AS fold_hi
           | FROM pr)
           |SELECT fold_lo, fold_hi, count(*) AS n_pairs,
           | CAST(CASE WHEN fold_lo <> fold_hi THEN 1 ELSE 0 END AS BIGINT)
           |  AS leaked
           |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // exact rank-biased overlap (p = 9/10) between the full-64-dim
    // and 16-dim-prefix rankings per probe — q143's overlap@10
    // weighted toward the TOP of the ranking, where retrieval
    // actually serves. Integer throughout: shared scaled weights
    // (Similarity.rboWeights) on both engines, one ppm division at
    // the end in DECIMAL(38)/HUGEINT.
    "q150_truncation_rbo" -> Q(
      (s, dir) => Similarity.truncationRbo(t(s, dir, "embeddings"),
        "vec_id", "embedding", nProbes = 10, k = 10, prefixDims = 16)
        .withColumnRenamed("pid", "vec_id")
        .orderBy(col("vec_id")),
      Some {
        val (coef, denom) = Similarity.rboWeights(10)
        val wt = coef.zipWithIndex
          .map { case (c, i) => s"(${i + 1}, ${c}::BIGINT)" }.mkString(", ")
        s"""WITH p AS (
           | SELECT vec_id AS pid, embedding AS pv FROM embeddings
           | WHERE vec_id < 10),
           |sc AS MATERIALIZED (
           | SELECT p.pid, e.vec_id AS cid,
           |  round(${OpsQueries.cosSql("e.embedding", "p.pv")}, 6)
           |   AS cos_full,
           |  round(${OpsQueries.cosSql("e.embedding", "p.pv", 16)}, 6)
           |   AS cos_trunc
           | FROM embeddings e, p WHERE e.vec_id <> p.pid),
           |r AS (
           | SELECT pid, cid,
           |  row_number() OVER (PARTITION BY pid
           |   ORDER BY cos_full DESC, cid) AS rf,
           |  row_number() OVER (PARTITION BY pid
           |   ORDER BY cos_trunc DESC, cid) AS rt
           | FROM sc),
           |mh AS (
           | SELECT pid, unnest(generate_series(greatest(rf, rt), 10)) AS d
           | FROM r WHERE rf <= 10 AND rt <= 10),
           |wt(d, c) AS (VALUES $wt),
           |ad AS (
           | SELECT pid, d, count(*) AS a_d FROM mh GROUP BY 1, 2),
           |a AS (
           | SELECT pid, sum(CAST(a_d AS HUGEINT) * wt.c) AS s
           | FROM ad JOIN wt ON ad.d = wt.d GROUP BY 1)
           |SELECT pr.pid AS vec_id,
           | CAST(COALESCE((a.s * 1000000) // ${denom}::HUGEINT, 0)
           |  AS BIGINT) AS rbo_ppm
           |FROM (SELECT DISTINCT pid FROM p) pr LEFT JOIN a USING (pid)
           |ORDER BY 1""".stripMargin
      }),

    // morphological collapse ratio: vocabulary size before/after a
    // crude deterministic suffix strip ((ing|ed|es|s)$ on tokens
    // longer than 4 chars) per language — the signal for whether a
    // stemmed index is worth building. Two distinct-aggregations on
    // DIFFERENT columns stay SEPARATE passes over the cached distinct
    // (lang, token) table (q42's Expand lesson), meeting in a
    // catalog-sized join.
    "q155_stem_collapse" -> Q(
      (s, dir) => {
        val base = graft.Scratch.cache(t(s, dir, "documents")
          .select(col("lang"),
            explode(TextOps.tokens(col("text"))).as("token"))
          .distinct())
        val stem = when(length(col("token")) > 4,
          regexp_replace(col("token"), "(ing|ed|es|s)$", ""))
          .otherwise(col("token"))
        val vocab = base.groupBy(col("lang"))
          .agg(count(lit(1)).as("vocab"))
        val stems = base.select(col("lang"), stem.as("s")).distinct()
          .groupBy(col("lang")).agg(count(lit(1)).as("stems"))
        vocab.join(broadcast(stems), Seq("lang"))
          .select(col("lang"), col("vocab").cast("long").as("vocab"),
            col("stems").cast("long").as("stems"),
            expr("((vocab - stems) * 1000) DIV vocab")
              .as("collapse_permille"))
          .orderBy(col("lang"))
      },
      Some(
        """WITH base AS MATERIALIZED (
          | SELECT DISTINCT lang,
          |  unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          |   AS token
          | FROM documents),
          |v AS (SELECT lang, count(*) AS vocab FROM base GROUP BY 1),
          |st AS (
          | SELECT lang, count(DISTINCT CASE WHEN length(token) > 4
          |  THEN regexp_replace(token, '(ing|ed|es|s)$', '')
          |  ELSE token END) AS stems
          | FROM base GROUP BY 1)
          |SELECT lang, CAST(vocab AS BIGINT) AS vocab,
          | CAST(stems AS BIGINT) AS stems,
          | CAST(((vocab - stems) * 1000) // vocab AS BIGINT)
          |  AS collapse_permille
          |FROM v JOIN st USING (lang) ORDER BY lang""".stripMargin)),

    // Count-Min-Sketch accuracy verdict — the q42/q104 pattern for
    // Spark's built-in count_min_sketch: exact per-key counts plus an
    // integer flag that the sketch estimate sits in [exact,
    // exact + eps*N] (one-sided error by construction; deterministic
    // at a fixed seed). The sketch is a mergeable binary aggregate —
    // the cluster-scale path for frequency estimates without a
    // key-space shuffle; the estimate probe reads the ONE sketch row
    // driver-side against the catalog-sized key list.
    "q154_cms_verdict" -> Q(
      (s, dir) => {
        import org.apache.spark.util.sketch.CountMinSketch
        val ev = t(s, dir, "events")
        val eps = 0.001
        val bytes = ev.select(
          expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)")
            .as("sk")).head().getAs[Array[Byte]]("sk")
        val cms = CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        val exact = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("exact_cnt"))
        val n = ev.count()
        val bound = udf((k: String, ex: Long) => {
          val est = cms.estimateCount(k)
          if (est >= ex && est <= ex + (eps * n).toLong + 1) 1L else 0L
        })
        exact.select(col("event_type"),
          col("exact_cnt").cast("long").as("exact_cnt"),
          bound(col("event_type"), col("exact_cnt")).as("within_bound"))
          .orderBy(col("event_type"))
      },
      Some(
        """SELECT event_type, count(*) AS exact_cnt,
          | CAST(1 AS BIGINT) AS within_bound
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // per-event-type inter-arrival gap profile: per-user lag gaps in
    // whole seconds ((ts, event_id)-tie-broken, q129's ordering),
    // winsorized [5%, 95%] on the gap-domain histogram — the
    // operational "how bursty is this event stream" report. The lag
    // window shuffles once on user_id; the percentile machinery runs
    // on the domain-sized histogram (q134's operator).
    "q153_interarrival" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        val gaps = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts DIV 1000").as("tsu"))
          .withColumn("prev", lag(col("tsu"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("event_type"),
            expr("(tsu - prev) DIV 1000000").as("gap_s"))
        TextOps.winsorizedStats(gaps, col("event_type"), col("gap_s"),
          loPermille = 50, hiPermille = 950)
          .withColumnRenamed("grp", "event_type")
          .orderBy(col("event_type"))
      },
      Some(
        """WITH e AS (
          | SELECT user_id, event_id, event_type,
          |  epoch_ns(ts) // 1000 AS tsu
          | FROM events),
          |g AS (
          | SELECT event_type,
          |  (tsu - lag(tsu) OVER (PARTITION BY user_id
          |    ORDER BY tsu, event_id)) // 1000000 AS v
          | FROM e),
          |hist AS MATERIALIZED (
          | SELECT event_type, v, count(*) AS cnt
          | FROM g WHERE v IS NOT NULL GROUP BY 1, 2),
          |h AS (
          | SELECT event_type, v, cnt,
          |  sum(cnt) OVER (PARTITION BY event_type ORDER BY v
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |  sum(cnt) OVER (PARTITION BY event_type) AS n
          | FROM hist),
          |cuts AS MATERIALIZED (
          | SELECT event_type, max(n) AS n,
          |  min(CASE WHEN cum * 1000 >= n * 50 THEN v END) AS lo_cut,
          |  min(CASE WHEN cum * 1000 >= n * 950 THEN v END) AS hi_cut
          | FROM h GROUP BY 1)
          |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
          | CAST(max(lo_cut) AS BIGINT) AS lo_cut,
          | CAST(max(hi_cut) AS BIGINT) AS hi_cut,
          | CAST(sum(greatest(least(v, hi_cut), lo_cut) * cnt) AS BIGINT)
          |  AS winsor_sum,
          | CAST(sum(CASE WHEN v < lo_cut THEN cnt ELSE 0 END) AS BIGINT)
          |  AS clipped_lo,
          | CAST(sum(CASE WHEN v > hi_cut THEN cnt ELSE 0 END) AS BIGINT)
          |  AS clipped_hi,
          | CAST(sum(greatest(least(v, hi_cut), lo_cut) * cnt) * 1000
          |  // max(n) AS BIGINT) AS winsor_mean_permille
          |FROM hist JOIN cuts USING (event_type) GROUP BY event_type
          |ORDER BY event_type""".stripMargin)),

    // per-source Pearson correlation between document length and the
    // q21 quality score — "does this source's quality ride on length"
    // (a filter tuned on one collapses on the other if |corr| is
    // high). Moments exact in DECIMAL(38)/HUGEINT; the single final
    // double division/sqrt rounds to 6 like the cosine family.
    "q152_length_quality_corr" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"),
          col("n_chars"),
          TextOps.qualitySignals(col("text")).as("q"))
          .select(col("source"), col("n_chars"),
            (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
              when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"))
        Eval.pearson(d, col("source"), col("n_chars"), col("score"))
          .withColumnRenamed("grp", "source")
          .orderBy(col("source"))
      },
      Some(
        """WITH tk AS (
          | SELECT source, n_chars,
          |  list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents WHERE text IS NOT NULL),
          |sc AS (
          | SELECT source, CAST(n_chars AS BIGINT) AS x,
          |  CAST(CAST(len(list_distinct(t)) AS INTEGER) * 2 +
          |   CAST(len(list_intersect(list_distinct(t),
          |    ['the','a','of','and','to','in','is'])) AS INTEGER) * 3 -
          |   CASE WHEN CAST(list_aggregate(list_transform(t,
          |     x -> length(x)), 'max') AS INTEGER) > 12
          |    THEN 5 ELSE 0 END AS BIGINT) AS y
          | FROM tk
          | WHERE n_chars IS NOT NULL),
          |m AS (
          | SELECT source, count(*) AS n,
          |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          |  sum(CAST(x AS HUGEINT) * y) AS sxy,
          |  sum(CAST(x AS HUGEINT) * x) AS sxx,
          |  sum(CAST(y AS HUGEINT) * y) AS syy
          | FROM sc GROUP BY 1),
          |d AS (
          | SELECT source, n, n * sxy - sx * sy AS num,
          |  n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
          | FROM m)
          |SELECT source, CAST(n AS BIGINT) AS n,
          | CASE WHEN denx = 0 OR deny = 0 THEN NULL
          |  ELSE round(CAST(num AS DOUBLE) /
          |   sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6)
          | END AS corr
          |FROM d ORDER BY source""".stripMargin)),

    // corpus novelty growth curve: how many NEW distinct 8-grams each
    // ingestion decile introduces (first-occurrence decile per gram) —
    // the diminishing-returns chart that decides whether crawling
    // MORE of a source is worth it. One gram-keyed shuffle (min is
    // map-side combinable); the decile frame is 10 rows.
    "q151_novelty_curve" -> Q(
      (s, dir) => TextOps.noveltyCurve(t(s, dir, "documents"),
        "doc_id", "text", n = 8, buckets = 10)
        .orderBy(col("decile")),
      Some {
        val toks = OpsQueries.toksSql
        s"""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
           |tk AS (SELECT doc_id, $toks AS t FROM documents),
           |g AS (
           | SELECT (tk.doc_id * 10) // (mx.m + 1) AS dec,
           |  unnest(list_distinct(
           |   list_transform(generate_series(1, len(t) - 7),
           |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           |     || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
           |     || ' ' || t[i+7]))) AS gram
           | FROM tk, mx),
           |f AS MATERIALIZED (
           | SELECT gram, min(dec) AS decile FROM g GROUP BY 1),
           |c AS (SELECT decile, count(*) AS new_grams FROM f GROUP BY 1)
           |SELECT decile, new_grams,
           | CAST(sum(new_grams) OVER (ORDER BY decile
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |  AS cum_grams,
           | CAST((new_grams * 1000) // (sum(new_grams) OVER ()) AS BIGINT)
           |  AS share_permille
           |FROM c ORDER BY decile""".stripMargin
      }),

    // SemDeDup: fixed-point k-means coarse clustering (2 Lloyd rounds
    // unrolled in the oracle as CTE chains, the BPE pattern) + within-
    // cluster cosine pruning against lower-id members. Every cluster
    // decision is integer-exact; the prune reuses the round(cos, 6)
    // contract. The oracle replays the ENTIRE Lloyd trajectory — a
    // hash match proves assignment, update, empty-cluster, and
    // tie-break semantics all agree bit-for-bit.
    "q156_semantic_dedup" -> Q(
      (s, dir) => SemDedup.semanticDedup(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, dims = 64, iters = 2, tau = 0.25)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id")),
      Some {
        def d(cent: String) =
          s"""SELECT ex.id, c.j, sum((ex.m - c.c) * (ex.m - c.c)) AS d
             |  FROM ex JOIN $cent c USING (i) GROUP BY 1, 2""".stripMargin
        def a(dist: String) =
          s"""SELECT id, j FROM (
             |  SELECT id, j, row_number() OVER (
             |   PARTITION BY id ORDER BY d, j) AS rn FROM $dist)
             |  WHERE rn = 1""".stripMargin
        def u(assign: String) =
          s"""SELECT $assign.j, ex.i,
             |  CAST(sum(ex.m) AS BIGINT) // count(*) AS c
             |  FROM $assign JOIN ex USING (id) GROUP BY 1, 2""".stripMargin
        def c(upd: String, prev: String) =
          s"""SELECT * FROM $upd UNION ALL
             |  SELECT j, i, c FROM $prev
             |  WHERE j NOT IN (SELECT j FROM $upd)""".stripMargin
        s"""WITH ex AS MATERIALIZED (
           | SELECT vec_id AS id, unnest(range(len(embedding))) AS i,
           |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
           |   AS BIGINT) AS m
           | FROM embeddings WHERE len(embedding) = 64),
           |seed AS (
           | SELECT id, row_number() OVER (ORDER BY id) - 1 AS j
           | FROM (SELECT DISTINCT id FROM ex ORDER BY id LIMIT 8)),
           |c0 AS MATERIALIZED (
           | SELECT seed.j, ex.i, ex.m AS c FROM ex JOIN seed USING (id)),
           |d1 AS (${d("c0")}),
           |a1 AS MATERIALIZED (${a("d1")}),
           |u1 AS MATERIALIZED (${u("a1")}),
           |c1 AS MATERIALIZED (${c("u1", "c0")}),
           |d2 AS (${d("c1")}),
           |a2 AS MATERIALIZED (${a("d2")}),
           |u2 AS MATERIALIZED (${u("a2")}),
           |c2 AS MATERIALIZED (${c("u2", "c1")}),
           |d3 AS (${d("c2")}),
           |a3 AS MATERIALIZED (${a("d3")}),
           |emb AS MATERIALIZED (
           | SELECT vec_id AS id, embedding FROM embeddings
           | WHERE len(embedding) = 64),
           |dup AS (
           | SELECT DISTINCT a.id FROM a3 a JOIN a3 b
           |  ON a.j = b.j AND b.id < a.id
           | JOIN emb ea ON ea.id = a.id
           | JOIN emb eb ON eb.id = b.id
           | WHERE round(${OpsQueries.cosSql("ea.embedding", "eb.embedding")},
           |   6) >= 0.25)
           |SELECT a3.id AS vec_id, CAST(a3.j AS BIGINT) AS cluster,
           | CAST(CASE WHEN dup.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           |  AS dropped
           |FROM a3 LEFT JOIN dup ON dup.id = a3.id
           |ORDER BY vec_id""".stripMargin
      }),

    // DSIR importance weights: hashed-bigram bucket scores (smoothed
    // target share in ppm) summed per doc — target = English docs.
    // The bucket stats table is feature-space-sized and broadcast;
    // the oracle replays the identical md5-bucket hash and integer
    // smoothing.
    "q157_importance_weights" -> Q(
      (s, dir) => TextOps.importanceWeights(t(s, dir, "documents"),
        "doc_id", "text", col("lang") === "en",
        buckets = 4096, selectThreshold = 440000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tk AS (
           | SELECT doc_id, lang, ${OpsQueries.toksSql} AS t FROM documents),
           |f AS MATERIALIZED (
           | SELECT doc_id AS id,
           |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
           |  ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS b
           | FROM (SELECT doc_id, lang,
           |   unnest(list_transform(generate_series(1, len(t) - 1),
           |    i -> t[i] || ' ' || t[i+1])) AS g FROM tk)),
           |sc AS MATERIALIZED (
           | SELECT b, (sum(tgt) + 1) * 1000000 // (count(*) + 2) AS score
           | FROM f GROUP BY 1),
           |d AS (
           | SELECT id, count(*) AS n_grams, sum(score) AS w_sum
           | FROM f JOIN sc USING (b) GROUP BY 1)
           |SELECT id AS doc_id, n_grams,
           | CAST(w_sum AS BIGINT) AS w_sum,
           | CAST(w_sum // n_grams AS BIGINT) AS w_avg,
           | CAST(CASE WHEN w_sum // n_grams >= 440000 THEN 1 ELSE 0 END
           |  AS BIGINT) AS selected
           |FROM d ORDER BY doc_id""".stripMargin)),

    // k-anonymity audit over the (source, lang, length-bucket)
    // quasi-identifier: classes below each k, rows at risk, permille
    // share — the metadata re-identification triage.
    "q158_k_anonymity" -> Q(
      (s, dir) => Scrub.kAnonymity(t(s, dir, "documents"),
        Seq(col("source"), col("lang"), expr("n_chars DIV 100")),
        Seq(2, 5, 10))
        .select(col("k").cast("long").as("k"), col("classes_below"),
          col("docs_below"), col("total_docs"), col("risk_permille"))
        .orderBy(col("k")),
      Some(
        """WITH cls AS (
          | SELECT source, lang, n_chars // 100 AS lb, count(*) AS csize
          | FROM documents GROUP BY 1, 2, 3),
          |h AS MATERIALIZED (
          | SELECT csize, count(*) AS n_classes FROM cls GROUP BY 1),
          |tot AS (SELECT sum(csize * n_classes) AS total FROM h),
          |kk(k) AS (VALUES (2), (5), (10))
          |SELECT CAST(kk.k AS BIGINT) AS k,
          | CAST(COALESCE(sum(h.n_classes), 0) AS BIGINT) AS classes_below,
          | CAST(COALESCE(sum(h.csize * h.n_classes), 0) AS BIGINT)
          |  AS docs_below,
          | CAST(tot.total AS BIGINT) AS total_docs,
          | CAST(COALESCE(sum(h.csize * h.n_classes), 0) * 1000
          |  // tot.total AS BIGINT) AS risk_permille
          |FROM kk CROSS JOIN tot LEFT JOIN h ON h.csize < kk.k
          |GROUP BY kk.k, tot.total ORDER BY k""".stripMargin)),

    // reliability-diagram calibration of the cheap quality score
    // against the repetition verdict (q135's pair, binned instead of
    // swept): per equal-width score bin, size, positives, positive
    // rate — "does score X mean probability X".
    "q159_calibration_bins" -> Q(
      (s, dir) => {
        val sig = t(s, dir, "documents").select(
          TextOps.qualitySignals(col("text")).as("q"),
          TextOps.repetitionStats(col("text")).as("r"))
        val scored = sig.select(
          (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
            when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"),
          when(col("r.n_dup_bigrams") * 5 <= col("r.n_bigrams") &&
            col("r.top_tok_cnt") * 5 <= col("r.n_tokens"), 1L)
            .otherwise(0L).as("label"))
        Eval.calibrationBins(scored, col("score"), col("label"), nbins = 10)
          .orderBy(col("bin"))
      },
      Some(
        """WITH tk AS (
          | SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents),
          |sig AS MATERIALIZED (
          | SELECT
          |  CAST(len(list_distinct(t)) AS INTEGER) * 2 +
          |  CAST(len(list_intersect(list_distinct(t),
          |    ['the','a','of','and','to','in','is'])) AS INTEGER) * 3 -
          |  CASE WHEN CAST(list_aggregate(list_transform(t,
          |    x -> length(x)), 'max') AS INTEGER) > 12
          |   THEN 5 ELSE 0 END AS score,
          |  CASE WHEN
          |   (CAST(greatest(len(t) - 1, 0) AS INTEGER) -
          |    CAST(len(list_distinct(list_transform(
          |     generate_series(1, len(t) - 1),
          |     i -> t[i] || ' ' || t[i+1]))) AS INTEGER)) * 5
          |     <= CAST(greatest(len(t) - 1, 0) AS INTEGER)
          |   AND CAST(list_aggregate(list_transform(list_distinct(t),
          |     x -> len(list_filter(t, y -> y = x))), 'max')
          |     AS INTEGER) * 5 <= CAST(len(t) AS INTEGER)
          |   THEN 1 ELSE 0 END AS label
          | FROM tk),
          |h AS MATERIALIZED (
          | SELECT CAST(score AS BIGINT) AS v, count(*) AS cnt,
          |  sum(label) AS pos
          | FROM sig GROUP BY 1),
          |b AS (SELECT min(v) AS lo, max(v) AS hi FROM h),
          |g AS (
          | SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, cnt, pos, v
          | FROM h, b)
          |SELECT bin, CAST(sum(cnt) AS BIGINT) AS n,
          | CAST(sum(pos) AS BIGINT) AS n_pos,
          | CAST(sum(pos) * 1000 // sum(cnt) AS BIGINT) AS pos_permille,
          | CAST(sum(v * cnt) // sum(cnt) AS BIGINT) AS mean_score
          |FROM g GROUP BY 1 ORDER BY bin""".stripMargin)),

    // leakage-free fold split — the CONSTRUCTIVE counterpart to
    // q149's audit: folds are assigned by hashing the near-dup
    // CLUSTER label (q60's components), so every near-dup pair lands
    // whole in one fold and the cross-fold leaked-pair count is
    // provably zero. Per fold: docs, clusters, doc share, and the
    // leaked count (all-zero column, oracle-checked) — q44's
    // doc-hash split cannot make this guarantee.
    "q160_cluster_safe_split" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val lab = Dedup.dedupClusters(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("doc_id"), col("cluster"))
        def fold(c: Column) = TextOps.hash32(c.cast("string")) % 5
        val labF = graft.Scratch.cache(
          lab.withColumn("fold", fold(col("cluster"))))
        val perFold = labF.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster")).as("n_clusters"))
        val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("id_a"), col("id_b"))
        val leaked = pairs
          .join(labF.select(col("doc_id").as("id_a"), col("fold").as("fa")),
            Seq("id_a"))
          .join(labF.select(col("doc_id").as("id_b"), col("fold").as("fb")),
            Seq("id_b"))
          .filter(col("fa") =!= col("fb"))
          .groupBy(least(col("fa"), col("fb")).as("fold"))
          .agg(count(lit(1)).as("leaked_pairs"))
        graft.ops.Prefix.withGlobal(
          perFold.join(leaked, Seq("fold"), "left"),
          "total" -> sum(col("n_docs")))
          .select(col("fold"), col("n_docs"), col("n_clusters"),
            expr("(n_docs * 1000) DIV total").as("share_permille"),
            coalesce(col("leaked_pairs"), lit(0L)).as("leaked_pairs"))
          .orderBy(col("fold"))
      },
      Some {
        def h(e: String) =
          s"(('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT % 5)"
        s"""WITH RECURSIVE ${OpsQueries.minhashCtes},
           |pairs AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM documents
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |comp AS MATERIALIZED (
           | SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
           |lf AS MATERIALIZED (
           | SELECT doc_id, cluster, ${h("cluster")} AS fold FROM comp),
           |pf AS (
           | SELECT fold, count(*) AS n_docs,
           |  count(DISTINCT cluster) AS n_clusters
           | FROM lf GROUP BY 1),
           |lk AS (
           | SELECT least(fa.fold, fb.fold) AS fold,
           |  count(*) AS leaked_pairs
           | FROM pairs p
           | JOIN lf fa ON fa.doc_id = p.id_a
           | JOIN lf fb ON fb.doc_id = p.id_b
           | WHERE fa.fold <> fb.fold GROUP BY 1)
           |SELECT pf.fold, CAST(pf.n_docs AS BIGINT) AS n_docs,
           | CAST(pf.n_clusters AS BIGINT) AS n_clusters,
           | CAST(pf.n_docs * 1000 // (SELECT sum(n_docs) FROM pf)
           |  AS BIGINT) AS share_permille,
           | CAST(COALESCE(lk.leaked_pairs, 0) AS BIGINT) AS leaked_pairs
           |FROM pf LEFT JOIN lk USING (fold) ORDER BY fold""".stripMargin
      }),

    // per-source Spearman rank statistics between document length and
    // distinct-token count — the rank-based complement of q152's
    // Pearson (scale-free, outlier-robust; what to trust when a
    // score's order means more than its magnitude). Doubled average
    // ranks keep ties integer; the emitted (n, sum_d2_x4, tie_x,
    // tie_y) determine tie-corrected rho exactly, so no float leaves
    // either engine. See ops/Eval.scala for the rank-shuffle scale
    // note (histogram route at unbounded group sizes).
    "q167_spearman" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"),
          col("n_chars"),
          TextOps.qualitySignals(col("text")).getField("n_distinct")
            .as("nd"))
        Eval.spearman(d, col("source"), col("n_chars"), col("nd"))
          .withColumnRenamed("grp", "source")
          .orderBy(col("source"))
      },
      Some(
        """WITH tk AS (
          | SELECT source, CAST(n_chars AS BIGINT) AS x,
          |  CAST(len(list_distinct(list_filter(string_split(text, ' '),
          |   t -> t <> ''))) AS BIGINT) AS y
          | FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
          |rk AS (
          | SELECT source, x, y,
          |  2 * rank() OVER (PARTITION BY source ORDER BY x)
          |   + count(*) OVER (PARTITION BY source, x) - 1 AS r2x,
          |  2 * rank() OVER (PARTITION BY source ORDER BY y)
          |   + count(*) OVER (PARTITION BY source, y) - 1 AS r2y
          | FROM tk),
          |d2 AS (
          | SELECT source, count(*) AS n,
          |  sum((r2x - r2y) * (r2x - r2y)) AS sum_d2_x4
          | FROM rk GROUP BY 1),
          |tx AS (
          | SELECT source, sum(t * t * t - t) AS tie_x FROM (
          |  SELECT source, x, count(*) AS t FROM tk GROUP BY 1, 2) s
          | GROUP BY 1),
          |ty AS (
          | SELECT source, sum(t * t * t - t) AS tie_y FROM (
          |  SELECT source, y, count(*) AS t FROM tk GROUP BY 1, 2) s
          | GROUP BY 1)
          |SELECT d2.source, CAST(n AS BIGINT) AS n,
          | CAST(sum_d2_x4 AS BIGINT) AS sum_d2_x4,
          | CAST(tie_x AS BIGINT) AS tie_x, CAST(tie_y AS BIGINT) AS tie_y
          |FROM d2 JOIN tx USING (source) JOIN ty USING (source)
          |ORDER BY source""".stripMargin)),

    // shard-balance audit: q75's epoch reshard run through q144's
    // chi-square machinery on (shard, source) — "did the shuffle
    // actually MIX, or did a source clump into a shard". Each cell
    // carries its observed count, expected permille mass, and exact
    // micro-scaled chi2 contribution; a clumped source shows up as a
    // dominant contrib cell before the epoch ever trains. Audits the
    // REAL operator (same salted-hash shard assignment), not a
    // re-derivation.
    "q168_shard_balance" -> Q(
      (s, dir) => Eval.chi2Independence(
        TextOps.reshard(t(s, dir, "documents")
          .select(col("doc_id"), col("source")), "doc_id",
          nShards = 16, salt = "epoch1"),
        col("shard"), col("source"))
        .withColumnRenamed("r", "shard")
        .withColumnRenamed("c", "source")
        .orderBy(col("shard"), col("source")),
      Some {
        val h32 = (e: String) => s"('0x' || substr(md5($e), 1, 8))::BIGINT"
        s"""WITH sh AS (
           | SELECT ${h32("CAST(doc_id AS VARCHAR) || '_epoch1_shard'")} % 16
           |   AS shard, source
           | FROM documents),
           |cells AS MATERIALIZED (
           | SELECT shard AS r, source AS c, count(*) AS obs
           | FROM sh GROUP BY 1, 2),
           |rm AS MATERIALIZED (SELECT r, sum(obs) AS rn FROM cells GROUP BY 1),
           |cm AS MATERIALIZED (SELECT c, sum(obs) AS cn FROM cells GROUP BY 1),
           |full_t AS (
           | SELECT rm.r, cm.c, rm.rn, cm.cn, COALESCE(cells.obs, 0) AS obs
           | FROM rm CROSS JOIN cm
           | LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
           |w AS (
           | SELECT r, c, rn, cn, obs, sum(obs) OVER () AS n FROM full_t),
           |d1 AS (
           | SELECT r, c, obs, rn, cn, n,
           |  CAST(obs AS HUGEINT) * n - CAST(rn AS HUGEINT) * cn AS dev,
           |  CAST(n AS HUGEINT) * rn * cn AS den
           | FROM w),
           |sc AS MATERIALIZED (
           | SELECT r, c, CAST(obs AS BIGINT) AS obs,
           |  CAST((CAST(rn AS HUGEINT) * cn * 1000) // n AS BIGINT)
           |   AS exp_milli,
           |  CAST((dev * dev // den) * 1000000 +
           |   ((dev * dev % den) * 1000000) // den AS BIGINT)
           |   AS contrib_micros
           | FROM d1)
           |SELECT r AS shard, c AS source, obs, exp_milli, contrib_micros,
           | CAST(sum(contrib_micros) OVER () AS BIGINT)
           |  AS chi2_total_micros
           |FROM sc ORDER BY 1, 2""".stripMargin
      }),
  )
}
