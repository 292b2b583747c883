package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-calibration operators for filter cascades: a cheap
  * per-doc score (e.g. the integer quality signals) is audited
  * against an expensive reference verdict (e.g. the repetition
  * filter) at EVERY decision threshold — the report that decides
  * where to put the cheap filter in a cascade and what it costs in
  * recall.
  */
object Eval {

  /** Precision/recall/F1 sweep over every distinct score value, where
    * "predict positive" means score >= threshold. Output one row per
    * distinct score: threshold, n_pred, tp, precision_permille,
    * recall_permille, f1_permille (integer permille; F1 via the exact
    * identity 2*TP / (n_pred + total_pos)).
    *
    * Scale posture: the corpus collapses ONCE to the (score, label)
    * histogram — score-DOMAIN sized, not corpus-sized; the sweep's
    * descending-cumulative windows run on that histogram. The global
    * (unpartitioned) windows are deliberate and safe ONLY because the
    * frame is domain-sized — never hand this a corpus-sized frame.
    */
  def thresholdSweep(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val hist = df.groupBy(scoreCol.as("threshold"))
      .agg(count(lit(1)).as("cnt"),
        sum(labelCol.cast("long")).as("pos"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("n_pred", sum(col("cnt")).over(wDesc))
      .withColumn("tp", sum(col("pos")).over(wDesc))
      .withColumn("total_pos", sum(col("pos")).over(wAll))
      // integer DIV throughout: double `/` would round above 2^53,
      // silently breaking the bit-for-bit oracle claim at corpus scale
      .select(col("threshold"),
        col("n_pred").cast("long").as("n_pred"),
        col("tp").cast("long").as("tp"),
        expr("(tp * 1000) DIV n_pred").as("precision_permille"),
        when(col("total_pos") === 0, 0L)
          .otherwise(expr("(tp * 1000) DIV total_pos"))
          .as("recall_permille"),
        expr("(tp * 2000) DIV (n_pred + total_pos)").as("f1_permille"))
  }
}
