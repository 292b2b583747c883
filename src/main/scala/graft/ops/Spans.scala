package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional n-gram span analytics — the token-interval layer under
  * substring-level dedup and contamination LOCALIZATION.
  *
  * The sketch family (MinHash/SimHash) and the set-semijoin family
  * (q74 decontamination) answer "is this document affected?"; a
  * curation pipeline that wants to CUT the offending text instead of
  * dropping the document needs "WHERE, and how much" — the merged
  * token intervals covered by duplicated (or benchmark-matching)
  * n-grams, per document. This is the n-gram-granularity form of the
  * suffix-array substring dedup from the dedup literature (exact
  * duplicated spans >= n tokens are exactly the runs of matching
  * n-grams this layer merges; a suffix array adds only sub-n
  * precision, at the cost of a non-distributable build).
  *
  * 100 TB posture: everything is key-partitioned — one shuffle on
  * `gram` to find cross-document duplicates (map-side partial
  * counts), one shuffle on the document id for the interval merge
  * (window + groupBy share the single Exchange). No all-pairs joins,
  * no driver state; the merge is a linear scan per document ordered
  * by position.
  */
object Spans {

  /** Merge n-gram hit POSITIONS into maximal covered token spans.
    *
    * Input: one row per hit, `grpCol` the document key, `posCol` the
    * 0-based token index of the n-gram's first token (unique per
    * document by construction — one gram per position). A hit covers
    * tokens [pos, pos+n-1]; hits whose intervals overlap or touch
    * (next.pos - prev.pos <= n) merge into one span — the classic
    * gaps-and-islands formulation, computed with one ranking window
    * and one aggregation over the same partitioning.
    *
    * Output: (grpCol, span_start, span_len, n_hits) — span_len in
    * TOKENS (last covered token - first + 1), one row per maximal
    * span.
    */
  def mergeSpans(hits: DataFrame, grpCol: String, posCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col(posCol))
    hits
      .withColumn("_prev", lag(col(posCol), 1).over(w))
      .withColumn("_new_span",
        when(col("_prev").isNull || col(posCol) - col("_prev") > n, 1L)
          .otherwise(0L))
      .withColumn("_span_id", sum(col("_new_span")).over(w))
      .groupBy(col(grpCol), col("_span_id"))
      .agg(
        min(col(posCol)).cast("long").as("span_start"),
        (max(col(posCol)) - min(col(posCol)) + n).cast("long").as("span_len"),
        count(lit(1)).as("n_hits"))
      .drop("_span_id")
  }
}
