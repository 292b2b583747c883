package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * The as-of join ("latest right row at or before each left row's
  * time") is composed from built-ins — preference (a) of the custom-
  * operator ladder: tag both sides, union, and carry the most recent
  * right payload forward with an ignore-nulls last_value window. One
  * hash shuffle on the join key, linear scan within each key
  * partition — no range-condition row explosion, no broadcast
  * requirement, skew bounded by the hottest key's row count. This is
  * the plan a dedicated AsOfJoinExec would produce anyway, so the
  * custom-physical-operator escape hatch stays unused.
  */
object Temporal {

  private def requireNoReserved(df: DataFrame, reserved: Seq[String], side: String): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$side side uses reserved internal column name(s) ${clash.mkString(", ")}; rename them first")
  }

  /** Interval (range) join: left rows at a point in time against right
    * rows holding [start, end] intervals, point within interval
    * (inclusive both ends), optionally also matching on equi-`keys`
    * present on BOTH sides. Implemented by BUCKETING time into
    * `bucketWidth`-sized chunks: each interval explodes into the
    * buckets it spans, points join on (bucket, keys), and the exact
    * containment predicate filters within the bucket — an equi-join +
    * filter instead of the O(n*m) broadcast-nested-loop a raw
    * inequality join plans. Pass the join keys here rather than
    * post-filtering: keyed candidates shrink by the key cardinality.
    * Choose bucketWidth near the typical interval length: wider means
    * fewer replicas per interval, narrower means fewer false
    * candidates per bucket.
    *
    * Times are long epoch values (any consistent unit).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointTime: Column, startCol: Column, endCol: Column,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0,
      s"bucketWidth must be positive, got $bucketWidth (DIV by zero would " +
        "null every bucket key and silently return an empty join)")
    val reserved = Seq("_pt", "_bucket", "_s", "_e")
    requireNoReserved(points, reserved, "points")
    requireNoReserved(intervals, reserved, "intervals")
    val p = points.withColumn("_pt", pointTime)
      .withColumn("_bucket", expr(s"_pt DIV $bucketWidth"))
    val iv = intervals.withColumn("_s", startCol).withColumn("_e", endCol)
      .withColumn("_bucket",
        explode(sequence(expr(s"_s DIV $bucketWidth"), expr(s"_e DIV $bucketWidth"))))
    p.join(iv, "_bucket" +: keys)
      .filter(col("_pt") >= col("_s") && col("_pt") <= col("_e"))
      .drop("_bucket", "_pt", "_s", "_e")
  }

  /** Left as-of join: every left row, enriched with the payload of the
    * latest right row whose `rightTime` <= the left row's `leftTime`
    * (equal times match; right rows with a NULL time never match,
    * same as SQL ASOF). NULL join keys follow equi-join semantics:
    * a NULL-key left row matches nothing (the window partition would
    * otherwise group all NULL keys together and enrich them from each
    * other — NOT what `ON l.key = r.key` means). The right side must
    * be unique per (key, time) — pre-aggregate if it isn't, or the
    * carried payload among ties is unspecified.
    *
    * @param payload right-side columns to carry (by name; must not
    *                collide with left column names)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: Column, rightTime: Column,
      payload: Seq[String]): DataFrame = {
    val reserved = Seq("_t", "_side", "_p", "_match")
    requireNoReserved(left, reserved, "left")
    requireNoReserved(right, reserved, "right")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"payload column(s) ${payload.filter(leftCols.contains)} collide with left columns")
    val pStruct = struct(payload.map(col): _*)
    val l = left
      .withColumn("_t", leftTime)
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(right.select(pStruct).schema.head.dataType))
    val r = right
      .withColumn("_t", rightTime)
      // NULL right time can never satisfy rightTime <= leftTime; an
      // ascending sort would otherwise place it first and carry its
      // payload into every pre-history left row. NULL right keys can
      // never equi-match a left key, but partitionBy groups NULLs
      // into one partition — drop them or NULL-key left rows would
      // be enriched from NULL-key right rows
      .filter(col("_t").isNotNull && col(key).isNotNull)
      .withColumn("_side", lit(0))
      .withColumn("_p", pStruct)
      .select((col(key) +: (Seq(col("_t"), col("_side"), col("_p")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)))): _*)

    // right rows sort before left rows at equal times (<= semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((col(key) +: (Seq(col("_t"), col("_side"), col("_p")) ++
        leftCols.filterNot(_ == key).map(col))): _*)
      .unionByName(r)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_match").getField(p).as(p)): _*)
  }
}
