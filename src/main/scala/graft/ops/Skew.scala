package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are
  * for the plans AQE can't fix: a grouped aggregation where one key
  * owns a large share of all rows (the classic "one hot query string"
  * in slow-query logs, or one near-empty-document fingerprint in
  * dedup), and broadcast-infeasible joins against a skewed key.
  */
object Skew {

  private def requireNoReserved(df: DataFrame, reserved: Seq[String],
      side: String): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$side input uses reserved internal column name(s) " +
        s"${clash.mkString(", ")}; rename them first (withColumn would " +
        "silently overwrite them and drop them from the output)")
  }

  /** Two-phase salted count/sum — the A1-report shape for a hot key:
    * rows spread over `salts` deterministic sub-keys, partially
    * aggregated per (key, salt), merged per key. Deterministic salt
    * (hash of existing columns, not rand()) keeps re-runs identical.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[Column], valueCol: Column,
      saltSource: Column, salts: Int): DataFrame = {
    requireNoReserved(df, Seq("_v", "_salt"), "input")
    val salted = df
      .withColumn("_v", valueCol)
      .withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col("_v")).as("_sum"))
      .groupBy(keys: _*)
      .agg(sum(col("_cnt")).as("count"), sum(col("_sum")).as("sum"))
  }

  /** Replicated-broadcast salted join for a skewed LEFT side against a
    * small-but-not-tiny right side: the left gets a random-ish
    * deterministic salt in [0, salts), the right is replicated `salts`
    * times, and the join key becomes (key, salt) — splitting each hot
    * key's rows across `salts` tasks.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    requireNoReserved(left, Seq("_salt"), "left")
    requireNoReserved(right, Seq("_salt"), "right")
    val l = left.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-skew profile — the report that decides whether a shuffle on
    * `keyCol` needs [[saltedCountSum]]/[[saltedJoin]] at all: exact
    * key-size percentiles, the hottest key's share, and the Gini
    * coefficient of the key-size distribution, all integer-exact.
    * One row: n_keys, n_rows, top1_cnt, top1_permille, p50_cnt,
    * p99_cnt, gini_permille.
    *
    * Gini over ascending key sizes without sorting keys: on the
    * count-of-counts histogram (k keys of size v, cumulative keys K
    * through the bucket), the sorted-index identity collapses to
    * sum(v * k * (2K - k - n_keys)) — bucket-local terms over a
    * SIZE-DOMAIN-sized frame. Numerator terms reach n_rows * n_keys,
    * so they accumulate in DECIMAL(38,0) (oracle: HUGEINT).
    *
    * Scale posture: one shuffle to key counts (map-side combinable),
    * then everything runs on the count-of-counts histogram — domain-
    * sized, like the percentile operators. Nothing else moves.
    */
  def keySkewProfile(df: DataFrame, keyCol: Column): DataFrame = {
    val coc = graft.Scratch.cache(df.groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("k")))
    // count-of-counts is size-DOMAIN-sized, and now guarded: the
    // cumulative rank routes through Prefix's capped window, the
    // global totals through a broadcast 1-row aggregate
    Prefix.cumSum(
      Prefix.withGlobal(coc,
        "n_keys" -> sum(col("k")),
        "n_rows" -> sum(col("cnt") * col("k"))),
      "cnt", col("k"), "kcum")
      .groupBy(col("n_keys"), col("n_rows"))
      .agg(
        max(col("cnt")).as("top1_cnt"),
        min(when(col("kcum") * 1000 >= col("n_keys") * 500, col("cnt")))
          .as("p50_cnt"),
        min(when(col("kcum") * 1000 >= col("n_keys") * 990, col("cnt")))
          .as("p99_cnt"),
        sum(col("cnt").cast("decimal(38,0)") * col("k") *
          (col("kcum") * 2 - col("k") - col("n_keys"))).as("gnum"))
      .select(
        col("n_keys").cast("long").as("n_keys"),
        col("n_rows").cast("long").as("n_rows"),
        col("top1_cnt").cast("long").as("top1_cnt"),
        expr("(top1_cnt * 1000) DIV n_rows").as("top1_permille"),
        col("p50_cnt").cast("long").as("p50_cnt"),
        col("p99_cnt").cast("long").as("p99_cnt"),
        expr("""CAST((gnum * 1000) DIV
               |  (CAST(n_keys AS DECIMAL(38,0)) * n_rows) AS BIGINT)"""
          .stripMargin).as("gini_permille"))
  }
}
