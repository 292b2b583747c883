package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.AnalysisConfig

/** The five grouped aggregates over parsed slow-query events
  * (reference: analyze(), analyze_slow_queries.py:986-1124).
  *
  * Each report is a composable DataFrame -> DataFrame function.
  * Spark-first deviations from the reference, all documented in
  * SURVEY.md §2.6-2.8:
  *
  *  - the reference's single-pass accumulator dicts become five
  *    hash aggregations over a cached parse (optimization O4: caller
  *    should `.cache()` the events DF before fanning out);
  *  - "first-seen" group payloads (whichever row created the dict
  *    entry carried keyspace/column_family) are nondeterministic in
  *    both Python-dict and distributed form, so we pin them with a
  *    min() over the sep-joined (keyspace, column_family) pair — a
  *    deterministic total order that keeps the pair atomic;
  *  - top-N is `orderBy(desc).limit(n)`, which Catalyst plans as
  *    TakeOrderedAndProject (bounded per-partition heaps, no global
  *    sort — strictly better than the reference's full sort at :1107);
  *  - ties are broken by ascending group keys (the reference relies on
  *    Python dict iteration order, T3) and the volume report is sorted
  *    by minute (fixing the reference's acknowledged bug, TODO :55);
  *  - avg_duration uses floor division like Python 2 int math
  *    (analyze_slow_queries.py:1093-1104).
  */
object Analyzer {

  case class Reports(
      query: DataFrame,
      queryPk: DataFrame,
      primaryKey: DataFrame,
      volume: DataFrame,
      volumeTop: DataFrame)

  /** Null coercion applied before grouping: analyze() treats missing
    * pk/ks/cf as '' (analyze_slow_queries.py:1007-1009).
    */
  def coerced(events: DataFrame): DataFrame = events.select(
    col("query"),
    coalesce(col("primary_key"), lit("")).as("primary_key"),
    coalesce(col("keyspace"), lit("")).as("keyspace"),
    coalesce(col("column_family"), lit("")).as("column_family"),
    date_format(date_trunc("minute", col("timestamp")), "yyyy-MM-dd HH:mm")
      .as("minute"),
    col("duration"))

  private def orderCol(config: AnalysisConfig): Column = {
    require(Set("count", "duration", "avg_duration").contains(config.orderBy),
      s"order_by must be count|duration|avg_duration, got ${config.orderBy}")
    col(config.orderBy)
  }

  /** HAVING + floor-division average, shared by all five reports
    * (analyze_slow_queries.py:1077-1104).
    */
  private def finishAgg(df: DataFrame, config: AnalysisConfig): DataFrame =
    df.filter(col("count") >= config.minCount)
      .withColumn("avg_duration",
        floor(col("duration") / col("count")).cast("long"))

  private def topN(df: DataFrame, config: AnalysisConfig, tieBreak: Seq[String]): DataFrame =
    df.orderBy(orderCol(config).desc +: tieBreak.map(col(_).asc): _*)
      .limit(config.topN)

  /** Separator for the atomic (keyspace, column_family) payload pair;
    * a control char that can't occur in CQL identifiers.
    */
  private val PairSep = "\u0001"

  private def pairMin: Column =
    min(concat_ws(PairSep, col("keyspace"), col("column_family"))).as("_kscf")

  private def splitPair(df: DataFrame): DataFrame =
    df.select(
      df.columns.filterNot(_ == "_kscf").map(col).toSeq :+
        split(col("_kscf"), PairSep).getItem(0).as("keyspace") :+
        split(col("_kscf"), PairSep).getItem(1).as("column_family"): _*)

  /** A1 — per normalized query (analyze_slow_queries.py:1014-1024).
    *
    * The reference carries whichever keyspace/column_family created
    * the dict entry (first-seen, nondeterministic); we pin the payload
    * with min() over the sep-joined pair — deterministic AND atomic
    * (per-column mins could fabricate a pair that never co-occurred).
    * Aggregation is TWO-stage: the event-volume stage groups by
    * (query, ks, cf) — all hash aggregable with map-side partial
    * combine — and only the tiny distinct-key intermediate pays the
    * SortAggregate that string min() forces. A single-stage string min
    * would sort-aggregate the full event stream — a per-partition
    * sort the 100 TB plan can't afford.
    */
  def queryReport(events: DataFrame, config: AnalysisConfig): DataFrame = {
    val pre = coerced(events)
      .groupBy(col("query"), col("keyspace"), col("column_family"))
      .agg(count(lit(1)).as("_cnt"), sum(col("duration")).as("_dur"))
    val agg = splitPair(
      pre.groupBy(col("query"))
        .agg(sum(col("_cnt")).as("count"), sum(col("_dur")).as("duration"), pairMin))
    topN(finishAgg(agg, config), config, Seq("query"))
  }

  /** A2 — per (query, primary_key), pk non-empty
    * (analyze_slow_queries.py:1026-1038).
    */
  def queryPkReport(events: DataFrame, config: AnalysisConfig): DataFrame = {
    val pre = coerced(events)
      .filter(col("primary_key") =!= "")
      .groupBy(col("query"), col("primary_key"), col("keyspace"), col("column_family"))
      .agg(count(lit(1)).as("_cnt"), sum(col("duration")).as("_dur"))
    val agg = splitPair(
      pre.groupBy(col("query"), col("primary_key"))
        .agg(sum(col("_cnt")).as("count"), sum(col("_dur")).as("duration"), pairMin))
    topN(finishAgg(agg, config), config, Seq("query", "primary_key"))
  }

  /** A3 — per (keyspace, column_family, primary_key), all non-empty
    * (analyze_slow_queries.py:1040-1051).
    */
  def primaryKeyReport(events: DataFrame, config: AnalysisConfig): DataFrame = {
    val agg = coerced(events)
      .filter(col("primary_key") =!= "" && col("keyspace") =!= "" &&
        col("column_family") =!= "")
      .groupBy(col("keyspace"), col("column_family"), col("primary_key"))
      .agg(count(lit(1)).as("count"), sum(col("duration")).as("duration"))
    topN(finishAgg(agg, config), config,
      Seq("keyspace", "column_family", "primary_key"))
  }

  /** A4 — per-minute volume, a 1-minute tumbling window in batch form
    * (analyze_slow_queries.py:1053-1061); sorted by minute (deliberate
    * fix of the reference's unsorted output, TODO :55).
    */
  def volumeReport(events: DataFrame, config: AnalysisConfig): DataFrame = {
    val agg = coerced(events)
      .groupBy(col("minute"))
      .agg(count(lit(1)).as("count"), sum(col("duration")).as("duration"))
    finishAgg(agg, config).orderBy(col("minute"))
  }

  /** A5 + W1 — per-minute top rows_per_minute (query, pk) groups via a
    * ranking window (analyze_slow_queries.py:1063-1075, 1116-1121).
    */
  def volumeTopReport(events: DataFrame, config: AnalysisConfig): DataFrame = {
    val agg = coerced(events)
      .groupBy(col("minute"), col("query"), col("primary_key"))
      .agg(count(lit(1)).as("count"), sum(col("duration")).as("duration"))
    val w = Window.partitionBy(col("minute"))
      .orderBy(orderCol(config).desc, col("query").asc, col("primary_key").asc)
    finishAgg(agg, config)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= config.rowsPerMinute)
      .drop("rn")
      .orderBy(col("minute"), orderCol(config).desc, col("query"), col("primary_key"))
  }

  def analyze(events: DataFrame, config: AnalysisConfig): Reports = {
    // O4: one parse, five aggregate scans — cache the narrow projection
    val cached = events.cache()
    Reports(
      query = queryReport(cached, config),
      queryPk = queryPkReport(cached, config),
      primaryKey = primaryKeyReport(cached, config),
      volume = volumeReport(cached, config),
      volumeTop = volumeTopReport(cached, config))
  }
}
