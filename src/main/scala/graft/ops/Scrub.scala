package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / sensitive-pattern redaction audit — the scrub stage every
  * training-data pipeline runs before release (C4 removed lines by
  * pattern; most production pipelines mask ids, emails, phone
  * numbers). This operator measures the stage rather than just
  * applying it: per (group, rule) it reports rows scanned, rows hit,
  * total matches, and the character delta the masking would cause —
  * the numbers a release review actually asks for.
  *
  * Cross-engine contract: patterns must stay in the Java-regex ∩ RE2
  * common subset (character classes, bounded/unbounded repetition,
  * alternation, anchors, \b; NO lookaround, NO backreferences) and
  * replacements must not contain `$` — then Spark's regexp_count /
  * regexp_replace and DuckDB's regexp_extract_all /
  * regexp_replace(..., 'g') agree match-for-match, which is what the
  * q132 oracle pins.
  *
  * Scale posture: one narrow projection pass over the corpus, one
  * map-side-combinable aggregation on (group, rule) — rule count is
  * a literal array crossed per row (rules × rows stays map-local,
  * never shuffles more than the grouped partials). No UDF: the
  * regexes run inside codegen'd string expressions.
  */
object Scrub {

  /** One redaction rule: a reporting category, a pattern (Java ∩ RE2
    * subset), and the mask text (no `$`).
    */
  final case class Rule(category: String, pattern: String, mask: String)

  /** Per (group, rule) audit counts. Output columns:
    * groupCol, category, n_rows, rows_hit, n_matches, chars_delta
    * (positive when masking shrinks the text).
    */
  def redactionAudit(df: DataFrame, textCol: Column, groupCol: Column,
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one redaction rule required")
    require(rules.forall(r => !r.mask.contains("$") && !r.mask.contains("\\")),
      "mask must not contain '$' or '\\' (Java replacement strings " +
        "treat both as escapes; RE2 does not — the engines would diverge)")
    // one struct per rule, crossed with every row map-side: the
    // per-rule counts are computed on the spot, so what shuffles is
    // only the (group, category) partial aggregates
    val perRule = rules.map { r =>
      struct(
        lit(r.category).as("category"),
        regexp_count(textCol, lit(r.pattern)).as("cnt"),
        (length(textCol) -
          length(regexp_replace(textCol, r.pattern, r.mask))).as("delta"))
    }
    df.select(groupCol.as("grp"), explode(array(perRule: _*)).as("r"))
      .select(col("grp"), col("r.category").as("category"),
        col("r.cnt").as("cnt"), col("r.delta").as("delta"))
      .groupBy(col("grp"), col("category"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("rows_hit"),
        sum(col("cnt")).cast("long").as("n_matches"),
        sum(col("delta")).cast("long").as("chars_delta"))
  }

  /** The apply side: the text with all rules masked, applied in rule
    * order (later rules see earlier rules' masks — document rule
    * order as part of the pipeline config).
    */
  def redact(textCol: Column, rules: Seq[Rule]): Column = {
    require(rules.forall(r => !r.mask.contains("$") && !r.mask.contains("\\")),
      "mask must not contain '$' or '\\' (Java replacement escapes)")
    rules.foldLeft(textCol) { (c, r) =>
      regexp_replace(c, r.pattern, r.mask)
    }
  }

  /** Per-group encoding-hygiene audit — the mojibake check a crawl
    * release runs before tokenization: U+FFFD replacement characters
    * (a decoder already gave up once), bare control characters
    * (anything below U+0020 except tab/newline/CR), non-ASCII density,
    * and the longest space run (boilerplate/layout artifacts). NULL
    * texts are excluded by contract.
    *
    * Cross-engine exactness: Spark's `length` and DuckDB's `len` both
    * count CODEPOINTS (not UTF-16 units), and both regex engines match
    * `[^\x00-\x7F]` per codepoint — so the subtraction trick
    * (len(text) - len(strip(text))) counts identically, astral chars
    * included. Output columns: grp, n_docs, docs_replacement,
    * docs_control, n_chars, n_nonascii, nonascii_permille, max_ws_run.
    *
    * Scale posture: one narrow projection pass (all regexes inside
    * codegen'd string expressions, no UDF), one map-side-combinable
    * aggregation on the group key. Nothing corpus-sized shuffles.
    */
  def encodingAudit(df: DataFrame, textCol: Column,
      groupCol: Column): DataFrame = {
    val ctl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    df.filter(textCol.isNotNull)
      .select(groupCol.as("grp"),
        length(textCol).as("n_chars"),
        (length(textCol) -
          length(regexp_replace(textCol, "[^\\x00-\\x7F]", "")))
          .as("n_nonascii"),
        textCol.contains("�").cast("long").as("has_repl"),
        textCol.rlike(ctl).cast("long").as("has_ctl"),
        coalesce(array_max(transform(
          regexp_extract_all(textCol, lit(" +"), lit(0)),
          m => length(m))), lit(0)).as("ws_run"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("has_repl")).cast("long").as("docs_replacement"),
        sum(col("has_ctl")).cast("long").as("docs_control"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        sum(col("n_nonascii")).cast("long").as("n_nonascii"),
        max(col("ws_run")).cast("long").as("max_ws_run"))
      .withColumn("nonascii_permille",
        when(col("n_chars") === 0, 0L)
          .otherwise(expr("(n_nonascii * 1000) DIV n_chars")))
      .select(col("grp"), col("n_docs"), col("docs_replacement"),
        col("docs_control"), col("n_chars"), col("n_nonascii"),
        col("nonascii_permille"), col("max_ws_run"))
  }

  /** k-anonymity audit over a quasi-identifier tuple: for each
    * threshold in `ks`, how many equivalence classes (distinct QI
    * combinations) hold FEWER than k rows, how many rows sit in
    * them, and the at-risk share in permille — the re-identification
    * triage a release review runs on metadata columns before
    * shipping (a row alone in its (source, lang, length-bucket)
    * class is linkable even with the text scrubbed).
    *
    * Scale posture: one corpus pass collapses to the per-class size
    * table (QI-cardinality-sized), which collapses again to the
    * class-SIZE histogram (value-domain-sized); thresholds join that
    * histogram broadcast. The only driver scalar is the total row
    * count off the histogram. All arithmetic integer-exact.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column],
      ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ks.nonEmpty, "need QI columns and thresholds")
    val spark = df.sparkSession
    import spark.implicits._
    val classes = df.groupBy(qiCols: _*).agg(count(lit(1)).as("csize"))
    val hist = graft.Scratch.cache(classes.groupBy(col("csize"))
      .agg(count(lit(1)).as("n_classes")))
    val total = hist.agg(
      coalesce(sum(col("csize") * col("n_classes")), lit(0L)))
      .head().getLong(0)
    ks.toDF("k")
      .join(broadcast(hist), col("csize") < col("k"), "left")
      .groupBy(col("k"))
      .agg(coalesce(sum(col("n_classes")), lit(0L)).cast("long")
          .as("classes_below"),
        coalesce(sum(col("csize") * col("n_classes")), lit(0L)).cast("long")
          .as("docs_below"))
      .withColumn("total_docs", lit(total))
      .withColumn("risk_permille", // empty corpus: 0, not a DIV-by-0 null
        if (total == 0L) lit(0L)
        else expr("(docs_below * 1000) DIV total_docs"))
  }
}
