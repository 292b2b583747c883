package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension affine int8) embedding quantization with a
  * self-auditing reconstruction-error report — the storage-side
  * operator of an embedding pipeline: 64-dim float32 vectors compress
  * 4x to uint8 codes, and the audit proves per-dimension that the
  * worst-case reconstruction error is within the quantization-step
  * bound, in exact integer arithmetic both engines reproduce.
  *
  * Float values are first mapped to exact fixed-point micros:
  * floor(double(v) * 1e6). A float32 mantissa carries <= 24
  * significant bits and 1e6 < 2^20, so the double product is exact
  * (44 < 53 bits) and the floor is the same integer in any engine —
  * no binary-float stringification ever reaches the result.
  *
  * Everything downstream is nonneg-integer math (truncating and floor
  * division agree on nonnegatives, so Spark `DIV` == DuckDB `//`):
  *   code  = ((v - lo) * 255) DIV (hi - lo)    in [0, 255]
  *   recon = lo + (code * (hi - lo)) DIV 255   <= v
  *   err   = v - recon                          >= 0
  * and the audit flag asserts err <= step + 1 where
  * step = (hi - lo) DIV 255.
  *
  * 100 TB posture: two narrow passes over the exploded corpus — a
  * dimension-keyed min/max aggregate (64 rows, broadcast back) and a
  * dimension-keyed error aggregate. No corpus-sized shuffle: the
  * explode is pipelined into partial aggregation on both passes, and
  * only 64-row statistics cross the wire.
  */
object Quantize {

  /** Exact fixed-point micros of a float column (see object doc). */
  def micros(v: Column): Column = floor(v.cast("double") * lit(1000000d))

  /** Per-dimension quantization audit over (id, Array[Float]) rows:
    * one row per dimension with the quantization range, code range,
    * and reconstruction-error certificate.
    */
  def quantizeAudit(df: DataFrame, vecCol: String): DataFrame = {
    val ex = df.select(
      posexplode(transform(col(vecCol), v => micros(v))).as(Seq("dim", "v")))
    val stats = ex.groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    ex.join(broadcast(stats), Seq("dim"))
      .withColumn("code", when(col("hi") > col("lo"),
        expr("((v - lo) * 255) DIV (hi - lo)")).otherwise(lit(0L)))
      .withColumn("err", col("v") - (col("lo") + expr("(code * (hi - lo)) DIV 255")))
      .groupBy(col("dim"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        min(col("code")).as("min_code"), max(col("code")).as("max_code"),
        max(col("err")).as("max_err"), sum(col("err")).as("sum_err"))
      .withColumn("ok",
        (col("max_err") <= expr("((hi - lo) DIV 255) + 1")).cast("long"))
  }

  /** Per-VECTOR quality audit, grouped by dimensionality — the
    * release check that catches ragged arrays, zero/degenerate
    * vectors, and norm drift before an index build. Norms are exact
    * fixed-point: norm2 = sum(micros(v)^2) per vector (<= 2^46 for
    * 64 dims of unit-scale floats), reported in DIV-1e6 units so the
    * corpus-wide sum stays far from long range (bound: corpus rows
    * < ~1e11 at 64 dims — document-scale safe).
    *
    * One narrow pass: the per-vector fold happens map-side inside the
    * projection; only (dims)-keyed partials shuffle.
    */
  def embeddingAudit(df: DataFrame, vecCol: String): DataFrame = {
    // contract: every PHYSICAL ROW is audited independently (duplicate
    // ids are two vectors — merging them would sum unrelated norms);
    // an empty array is a dims=0, norm2=0 row (a zero vector), and a
    // NULL array is a dims=NULL group with NULL norms. The oracle
    // mirrors this with per-row list folds, never unnest+group.
    val m = df.select(size(col(vecCol)).as("dims"),
      aggregate(transform(col(vecCol), v => micros(v)),
        lit(0L), (acc, x) => acc + x * x).as("norm2"))
      .withColumn("n2u", expr("norm2 DIV 1000000"))
    m.groupBy(col("dims"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("norm2") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("n2u")).as("min_norm2u"),
        max(col("n2u")).as("max_norm2u"),
        sum(col("n2u")).cast("long").as("sum_norm2u"))
      // integer DIV, not double `/`: sum*1 stays exact past 2^53
      .withColumn("avg_norm2u", expr("sum_norm2u DIV n"))
  }
}
