package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Spans, TextOps}

/** Span-level dedup/decontamination analytics (q161+): WHERE the
  * duplicated or contaminated text lives inside each document, as
  * merged token intervals — the remediation layer (cut the span, keep
  * the document) over the detection layers (q22-q26, q74).
  * Same oracle discipline as the rest of the registry: integer-exact
  * formulas, DuckDB reproduces every hash bit-for-bit.
  */
object SpanQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** 0-based positional 8-grams of every document: (doc_id, pos, gram). */
  private[queries] def posGrams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextOps.ngrams(col("text"), n)).as(Seq("pos", "gram")))

  private[queries] val n = 8

  /** DuckDB positional-gram CTEs shared by the two oracles: tk
    * tokenizes, pg emits ({'pos','gram'}) structs unnested to rows.
    */
  private[queries] val posGramSql: String =
    s"""tk AS (
       | SELECT doc_id, ${OpsQueries.toksSql} AS t FROM documents),
       |pgs AS (
       | SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
       |   i -> {'pos': i - 1, 'gram':
       |     t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
       |     t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]}))
       |   AS pg FROM tk),
       |pgr AS MATERIALIZED (
       | SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM pgs)""".stripMargin

  /** Islands merge + per-span CTEs over a `hits(doc_id, pos)` CTE —
    * the SQL twin of [[graft.ops.Spans.mergeSpans]].
    */
  private[queries] val spanSql: String =
    s"""lg AS (
       | SELECT doc_id, pos,
       |  CASE WHEN lag(pos) OVER w IS NULL
       |        OR pos - lag(pos) OVER w > $n THEN 1 ELSE 0 END AS nw
       | FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |isl AS (
       | SELECT doc_id, pos,
       |  sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       | FROM lg),
       |sp AS (
       | SELECT doc_id, span_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) - min(pos) + $n AS BIGINT) AS span_len,
       |  count(*) AS n_hits
       | FROM isl GROUP BY 1, 2)""".stripMargin

  def all: Map[String, Q] = Map(

    // Duplicated-span coverage: for every document, the maximal token
    // intervals covered by 8-grams that occur in >= 2 distinct
    // documents — the n-gram-granularity substring-dedup signal
    // (Lee et al.-style "dedup the span, not the doc"). Per doc:
    // span count, covered tokens, longest span, duplicated-gram hits.
    // Scale: gram-key shuffle (partial counts map-side) + doc-key
    // window/agg; no all-pairs anywhere.
    "q161_dup_spans" -> Q(
      (s, dir) => {
        val grams = graft.Scratch.cache(posGrams(t(s, dir, "documents"), n))
        val dup = grams.groupBy(col("gram"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("gram"))
        val hits = grams.join(dup, Seq("gram"), "left_semi")
          .select(col("doc_id"), col("pos"))
        Spans.mergeSpans(hits, "doc_id", "pos", n)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("span_len")).as("covered_tokens"),
            max(col("span_len")).as("longest_span"),
            sum(col("n_hits")).as("n_dup_grams"))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH $posGramSql,
           |d AS (
           | SELECT gram FROM pgr GROUP BY gram
           | HAVING count(DISTINCT doc_id) >= 2),
           |hits AS (
           | SELECT doc_id, pos FROM pgr
           | WHERE gram IN (SELECT gram FROM d)),
           |$spanSql
           |SELECT doc_id, count(*) AS n_spans,
           | CAST(sum(span_len) AS BIGINT) AS covered_tokens,
           | CAST(max(span_len) AS BIGINT) AS longest_span,
           | CAST(sum(n_hits) AS BIGINT) AS n_dup_grams
           |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Contamination-span localization: q74 counts benchmark 8-gram
    // hits per training doc; this emits WHERE they sit — one row per
    // maximal contaminated token interval (merge-within-8) per
    // training doc, the table a surgical decontamination job
    // subtracts from the text. Benchmark = doc_id % 10 == 0 (q74's
    // split), training = the rest.
    "q162_contam_spans" -> Q(
      (s, dir) => {
        val grams = posGrams(t(s, dir, "documents"), n)
        val bench = grams.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(col("gram")).distinct()
        val hits = grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .join(bench, Seq("gram"), "left_semi")
          .select(col("doc_id"), col("pos"))
        Spans.mergeSpans(hits, "doc_id", "pos", n)
          .select(col("doc_id"), col("span_start"), col("span_len"),
            col("n_hits"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some(
        s"""WITH $posGramSql,
           |te AS (SELECT DISTINCT gram FROM pgr WHERE doc_id % 10 = 0),
           |hits AS (
           | SELECT doc_id, pos FROM pgr
           | WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM te)),
           |$spanSql
           |SELECT doc_id, span_start, span_len, n_hits
           |FROM sp ORDER BY doc_id, span_start""".stripMargin)),

    // PMI collocation mining: top-50 adjacent token pairs by
    // pointwise mutual information (rank-equivalent integer form —
    // n_xy * 1e6 DIV (n_x * n_y); PMI's log and corpus constants are
    // monotone), min corpus count 5. The phrase-detection statistic
    // run before tokenizer/embedding training. Unigram counts are
    // vocabulary-sized and broadcast onto the distinct-bigram frame;
    // top-k plans as TakeOrderedAndProject.
    "q164_collocations" -> Q(
      (s, dir) => TextOps.collocations(t(s, dir, "documents"), "text",
        k = 50, minCount = 5),
      Some(
        s"""WITH tk AS (
           | SELECT ${OpsQueries.toksSql} AS t FROM documents),
           |un AS (
           | SELECT t2.token, count(*) AS n
           | FROM (SELECT unnest(t) AS token FROM tk) t2 GROUP BY 1),
           |bn AS (
           | SELECT bigram, count(*) AS n_xy
           | FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
           |   i -> t[i] || ' ' || t[i+1])) AS bigram FROM tk) b2
           | GROUP BY 1 HAVING count(*) >= 5)
           |SELECT b.bigram, b.n_xy, ux.n AS n_x, uy.n AS n_y,
           | (b.n_xy * 1000000) // (ux.n * uy.n) AS score
           |FROM bn b
           |JOIN un ux ON ux.token = string_split(b.bigram, ' ')[1]
           |JOIN un uy ON uy.token = string_split(b.bigram, ' ')[2]
           |ORDER BY score DESC, bigram LIMIT 50""".stripMargin)),

    // span-dedup ROI: what surgical (span-level) dedup saves, per
    // source — q124 prices DROPPING whole duplicate docs; this prices
    // CUTTING just the duplicated intervals: total tokens, tokens
    // inside cross-document dup spans, docs the cut would fully
    // consume, and the savings rate in permille. The number that
    // decides doc-level vs span-level dedup for a source.
    "q169_span_savings" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val grams = graft.Scratch.cache(posGrams(docs, n))
        val dup = grams.groupBy(col("gram"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("gram"))
        val covered = Spans.mergeSpans(
          grams.join(dup, Seq("gram"), "left_semi")
            .select(col("doc_id"), col("pos")), "doc_id", "pos", n)
          .groupBy(col("doc_id"))
          .agg(sum(col("span_len")).as("covered"))
        docs.select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("toks"))
          .join(covered, Seq("doc_id"), "left")
          .withColumn("cov", coalesce(col("covered"), lit(0L)))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("total_tokens"),
            sum(col("cov")).as("dup_span_tokens"),
            sum((col("cov") === col("toks")).cast("long"))
              .as("fully_covered_docs"))
          .withColumn("savings_permille",
            expr("dup_span_tokens * 1000 DIV total_tokens"))
          .orderBy(col("source"))
      },
      Some(
        s"""WITH $posGramSql,
           |d AS (
           | SELECT gram FROM pgr GROUP BY gram
           | HAVING count(DISTINCT doc_id) >= 2),
           |hits AS (
           | SELECT doc_id, pos FROM pgr
           | WHERE gram IN (SELECT gram FROM d)),
           |$spanSql,
           |cov AS (
           | SELECT doc_id, sum(span_len) AS covered FROM sp GROUP BY 1),
           |dt AS (
           | SELECT d2.doc_id, d2.source, CAST(len(tk.t) AS BIGINT) AS toks,
           |  COALESCE(cov.covered, 0) AS cov
           | FROM documents d2
           | JOIN tk ON tk.doc_id = d2.doc_id
           | LEFT JOIN cov ON cov.doc_id = d2.doc_id),
           |agg AS (
           | SELECT source, count(*) AS n_docs,
           |  sum(toks) AS total_tokens, sum(cov) AS dup_span_tokens,
           |  sum(CASE WHEN cov = toks THEN 1 ELSE 0 END)
           |   AS fully_covered_docs
           | FROM dt GROUP BY 1)
           |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           | CAST(total_tokens AS BIGINT) AS total_tokens,
           | CAST(dup_span_tokens AS BIGINT) AS dup_span_tokens,
           | CAST(fully_covered_docs AS BIGINT) AS fully_covered_docs,
           | CAST(dup_span_tokens * 1000 // total_tokens AS BIGINT)
           |  AS savings_permille
           |FROM agg ORDER BY source""".stripMargin)),
  )
}
