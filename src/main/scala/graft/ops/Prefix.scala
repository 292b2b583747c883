package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale guard for cumulative windows over "domain-sized" frames.
  *
  * Several operators run an UNPARTITIONED cumulative window over a
  * frame whose cardinality is bounded by a value DOMAIN, not the
  * corpus (a score histogram, a count-of-counts frame, decile
  * buckets). The single-partition window is the right plan there —
  * but the bounded-domain claim was only ever a comment: a
  * heavy-tailed domain at 100x (distinct durations x minutes, say)
  * would funnel the whole frame through one reducer with nothing
  * guarding it.
  *
  * [[cumSums]] makes the claim OPERATIONAL, in the same spirit as
  * [[Dedup.DriverReplayCapKey]]: it measures the frame (one scalar
  * aggregate — count plus the order column's min/max) and
  *
  *  - at or below the cap runs the ordinary one-partition cumulative
  *    window, partitioned by a constant marker column so the plan
  *    records the choice as deliberate (and the log stops warning
  *    "No Partition Defined" for a frame that was audited);
  *  - above the cap switches to the two-level distributed prefix sum
  *    already proven in [[TextOps.tokenBudgetSample]]: contiguous
  *    RANGE buckets on the order column (so bucket order == value
  *    order), per-bucket totals to the driver (nBuckets rows — never
  *    data-sized), prefix offsets broadcast back, and a
  *    bucket-partitioned window adds the local cumsum to its
  *    bucket's offset.
  *
  * Both paths produce identical rows (PrefixSpec pins it); callers
  * require DISTINCT order values (every call site is a post-groupBy
  * histogram keyed by the order column, so ties cannot occur).
  */
object Prefix {
  /** Session cap on rows a cumulative window may run single-partition.
    * Like Spark's `autoBroadcastJoinThreshold`: a size-adaptive
    * strategy cutoff, configurable per session; tests force the
    * distributed path with 0.
    */
  val MaxWindowRowsKey = "spark.graft.maxSinglePartitionWindowRows"
  val DefaultMaxWindowRows = 65536L

  /** Always-zero marker that Catalyst cannot constant-fold away.
    *
    * `partitionBy(lit(0))` does NOT survive optimization: on
    * file-backed plans FoldablePropagation inlines the literal and
    * EliminateWindowPartitions then strips the now-foldable partition
    * expression, leaving an empty partitionSpec — exactly the
    * "No Partition Defined" WindowExec this marker exists to audit
    * away (observed on Spark 4.1: the marker held on a
    * LocalTableScan plan but folded on the parquet plan). Deriving
    * the zero from a real column (`x % 1`, null-guarded) keeps the
    * expression non-foldable, so the deliberate one-partition choice
    * stays visible in the executed plan.
    */
  def markerZero(c: Column): Column =
    coalesce(pmod(c.cast("long"), lit(1L)), lit(0L))

  /** Append one output column per `(valueCol, outCol)` pair: the
    * running total of `valueCol` (cast to long) in `orderCol` order
    * (ascending, or descending when `desc`) — the guarded prefix sum
    * described in the object doc, all sums sharing ONE pass/window.
    * `orderCol` must be numeric with distinct values per row (at
    * most one NULL — the post-groupBy null group — which sorts where
    * the window default puts it: first ascending, last descending).
    */
  def cumSums(df: DataFrame, orderCol: String, desc: Boolean,
      vals: Seq[(Column, String)], nBuckets: Int = 64): DataFrame = {
    require(vals.nonEmpty)
    val spark = df.sparkSession
    val cap = spark.conf
      .get(MaxWindowRowsKey, DefaultMaxWindowRows.toString).toLong
    val vNames = vals.indices.map(i => s"_pfx_v$i")
    val base = vals.zip(vNames).foldLeft(df) { case (d, ((c, _), nm)) =>
      d.withColumn(nm, c.cast("long"))
    }
    val ordD = col(orderCol).cast("double")
    val st = base.agg(count(lit(1)), min(ordD), max(ordD)).head()
    val n = st.getLong(0)
    if (n == 0L) {
      return vals.zip(vNames).foldLeft(base) { case (d, ((_, out), nm)) =>
        d.withColumn(out, col(nm))
      }.drop(vNames: _*)
    }
    def ordered(w: org.apache.spark.sql.expressions.WindowSpec) =
      (if (desc) w.orderBy(col(orderCol).desc) else w.orderBy(col(orderCol)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if (n <= cap) {
      // audited one-partition path: the constant marker column keeps
      // the partitionSpec non-empty (plan-visible, warning-free)
      val w = ordered(Window.partitionBy(col("_pfx_p")))
      vals.zip(vNames).foldLeft(
        base.withColumn("_pfx_p", markerZero(col(orderCol)))) {
        case (d, ((_, out), nm)) => d.withColumn(out, sum(col(nm)).over(w))
      }.drop("_pfx_p" +: vNames: _*)
    } else {
      // Bucketing runs on the DOUBLE view of the order column: the
      // long->double cast is monotone (non-strict), so bucket order
      // always matches value order — immune both to span overflow
      // (`hi - lo` over hash-range long domains wrapped negative
      // under the old integer math, scrambling bucket ids) and to
      // sub-integer domains (a fractional score range used to
      // collapse to ONE bucket via CAST AS BIGINT, silently
      // re-funneling the whole frame through a single reducer).
      // Rows that collapse to one double (> 2^53 longs) share a
      // bucket; the intra-bucket window still orders them by the raw
      // column. A NULL order key (at most one per call site — every
      // caller passes a post-groupBy frame keyed by the order
      // column) gets a sentinel bucket that sorts FIRST ascending
      // and LAST descending, exactly where the capped path's window
      // default puts nulls. NaN order keys are unsupported (cast
      // long/double histogram keys never produce them).
      val lo = if (st.isNullAt(1)) 0.0 else st.getDouble(1)
      val hi = if (st.isNullAt(2)) 0.0 else st.getDouble(2)
      val width = math.max((hi - lo) / nBuckets, 1e-300)
      val nullBucket = Long.MinValue
      val b = base.withColumn("_pfx_b",
        coalesce(floor((ordD - lit(lo)) / lit(width)).cast("long"),
          lit(nullBucket)))
      val totals = b.groupBy(col("_pfx_b"))
        .agg(sum(col(vNames.head)).as("t0"),
          vNames.tail.zipWithIndex.map { case (nm, i) =>
            sum(col(nm)).as(s"t${i + 1}")
          }: _*)
        .collect()
        .map(r => r.getLong(0) -> vNames.indices.map(i =>
          if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      // Ordering.Long.reverse, not sortBy(-id): negating the null
      // sentinel (Long.MinValue) would overflow back onto itself
      val inOrder =
        if (desc) totals.sortBy(_._1)(Ordering.Long.reverse)
        else totals.sortBy(_._1)
      val offsets = inOrder.map(_._1).zipWithIndex.map { case (bk, pos) =>
        org.apache.spark.sql.Row.fromSeq(bk +: vNames.indices.map { i =>
          inOrder.take(pos).map(_._2(i)).sum
        })
      }
      val offSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_pfx_b",
          org.apache.spark.sql.types.LongType) +:
          vNames.indices.map(i => org.apache.spark.sql.types.StructField(
            s"_pfx_off$i", org.apache.spark.sql.types.LongType)))
      val offDf = spark.createDataFrame(
        spark.sparkContext.parallelize(offsets.toSeq, 1), offSchema)
      val w = ordered(Window.partitionBy(col("_pfx_b")))
      vals.zip(vNames).zipWithIndex
        .foldLeft(b.join(broadcast(offDf), Seq("_pfx_b"))) {
          case (d, (((_, out), nm), i)) =>
            d.withColumn(out, sum(col(nm)).over(w) + col(s"_pfx_off$i"))
        }
        .drop("_pfx_b" +: vNames.indices.map(i => s"_pfx_off$i")
          ++: vNames: _*)
    }
  }

  /** Single-sum convenience over [[cumSums]]. */
  def cumSum(df: DataFrame, orderCol: String, valueCol: Column,
      outCol: String, desc: Boolean = false,
      nBuckets: Int = 64): DataFrame =
    cumSums(df, orderCol, desc, Seq(valueCol -> outCol), nBuckets)

  /** Attach 1-row global aggregates to every row of `df` via a
    * broadcast cross join — the scale-safe replacement for
    * `X.over(Window.partitionBy())`, which plans an unpartitioned
    * WindowExec that moves the whole frame to one reducer to compute
    * a scalar. The aggregate runs as a map-side-combinable two-stage
    * agg instead, and the frame keeps its partitioning.
    */
  def withGlobal(df: DataFrame, aggs: (String, Column)*): DataFrame = {
    val one = df.agg(aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (nm, c) => c.as(nm) }: _*)
    df.crossJoin(broadcast(one))
  }
}
