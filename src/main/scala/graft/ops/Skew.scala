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
}
