package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Dedup, Scrub, TextOps}

/** Release-audit additions (q132+): the reports a data-release review
  * asks for right before shipping — what would the scrub stage mask,
  * how much do the crawls REALLY overlap (exact, not estimated), and
  * where do the robust length cutoffs sit. Same oracle discipline as
  * the rest of the registry: integer-exact formulas, Java∩RE2 regex
  * subset, multi-referenced CTEs MATERIALIZED.
  */
object AuditQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

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
    // q120's MinHash estimate: same pair key, exact token-set
    // Jaccard in permille, zero-overlap pairs kept. The corpus
    // collapses once to the distinct (source, token) table; every
    // later frame is vocab- or catalog-sized.
    "q133_source_jaccard_exact" -> Q(
      (s, dir) => Dedup.sourceOverlapExact(
        t(s, dir, "documents"), "source", "text")
        .orderBy(col("src_a"), col("src_b")),
      Some(
        """WITH tok AS MATERIALIZED (
          | SELECT DISTINCT src, token FROM (
          |  SELECT source AS src,
          |   unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          |    AS token
          |  FROM documents)),
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
          | FROM documents GROUP BY 1, 2),
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
          |ORDER BY lang""".stripMargin))
  )
}
