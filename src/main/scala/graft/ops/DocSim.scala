package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse document-similarity join over TF-IDF term vectors — the
  * inverted-index (document-at-a-time) formulation: documents meet
  * ONLY through terms they share, so no doc-x-doc candidate space is
  * ever enumerated. The classic IR pruning makes it scale-safe: terms
  * with df > maxDf are dropped before the join, which (a) removes
  * exactly the non-discriminative terms that contribute least to
  * similarity ranking and (b) bounds every posting list to maxDf
  * entries, so per-term pair fan-out is <= maxDf^2 regardless of
  * corpus size — the hot-key story is closed by construction, not by
  * salting.
  *
  * Weights are integer-exact and corpus-size-free:
  *   w = tf * (SCALE DIV df),   SCALE = 1e6, df in [2, maxDf]
  * (df = 1 terms cannot pair; an N-dependent idf would multiply every
  * weight by the same rational and only risk overflow). Pair score is
  * the dot product sum(w_a * w_b) over shared terms. Bound: with
  * df >= 2, w <= tf * 5e5, so a term's product is < 2^63 while
  * tf_a * tf_b < 3.6e7 — far beyond any real document's repetition of
  * a RARE (df-capped) term; the sum adds at most vocabulary-sized
  * headroom. Exact for any corpus size N.
  *
  * 100 TB posture: tf is one corpus pass; df is vocabulary-sized after
  * the [2, maxDf] filter and broadcasts; the self-join shuffles only
  * (token, id, w) postings, each list <= maxDf; the final top-N is a
  * TakeOrderedAndProject (per-partition heads, no global sort).
  */
object DocSim {

  val Scale = 1000000L

  /** Top-N most similar document pairs by integer TF-IDF dot product.
    * Output: (id_a, id_b, dot, shared) — shared = co-occurring
    * distinct term count, id_a < id_b.
    */
  def tfidfPairs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int, topN: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    // postings are read by BOTH sides of the self-join: cache the
    // (token, id, w) table or the tokenize+tf pipeline runs twice
    val w = graft.Scratch.cache(
      tf.join(broadcast(dfreq), Seq("token"))
        .withColumn("w", expr(s"tf * ($Scale DIV df)"))
        .select(col("token"), col("id"), col("w")))
    w.select(col("token"), col("id").as("id_a"), col("w").as("w_a"))
      .join(w.select(col("token"), col("id").as("id_b"), col("w").as("w_b")),
        Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w_a") * col("w_b")).as("dot"), count(lit(1)).as("shared"))
      .orderBy(col("dot").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }
}
