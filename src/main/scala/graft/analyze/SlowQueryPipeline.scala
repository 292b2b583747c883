package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.CqlCatalog
import graft.model.AnalysisConfig
import graft.parse.LogColumns

/** The parse + enrich pipeline: raw hit rows -> typed slow-query
  * events (reference: process_message + the five processors,
  * analyze_slow_queries.py:892-936, 570-839).
  *
  * Every reference "raise -> skip row with warning" becomes a
  * null-producing expression plus an explicit filter, so one malformed
  * row costs O(1) and never fails the job (optimization O10). The
  * whole thing is a single narrow select over the scan — no shuffle
  * until aggregation.
  */
object SlowQueryPipeline {

  /** strptime('%Y-%m-%dT%H:%M:%S.%fZ') (analyze_slow_queries.py:913). */
  val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  private val emptyStrMap: Column = typedLit(Map.empty[String, String])

  /** Parse raw hit rows (timestamp_str, message, tags) into the event
    * schema (type, timestamp, duration, query, bound_values,
    * primary_key, keyspace, column_family, tags).
    */
  def parseEvents(raw: DataFrame, config: AnalysisConfig): DataFrame = {
    val cfKs = CqlCatalog.cfKeyspaces(config.schema)
    val pkIdx = CqlCatalog.partitionKeyIndex(config.schema)

    // Staged flat selects: each stage references the previous stage's
    // materialized attributes, keeping optimizer alias substitution
    // linear in plan size (the lexer itself is one expression node).
    val lexed = raw
      .select(
        LogColumns.lex(col("message")).as("lex"),
        to_timestamp(col("timestamp_str"), TsFmt).as("timestamp"),
        col("tags"))
      // get_log raise / strptime raise / int() raise / no processor
      // -> row skipped (analyze_slow_queries.py:1299-1300)
      .filter(col("lex").isNotNull && col("timestamp").isNotNull &&
        col("lex.duration").isNotNull)
      .select(
        col("timestamp"),
        col("lex.duration").as("duration"),
        col("lex.query").as("raw_query"),
        col("lex.bound_values").as("bv_str"),
        LogColumns.classify(col("lex.query")).as("qtype"),
        col("tags"))
      .filter(col("qtype").isNotNull)

    // F8 pattern normalization — SELECT only (analyze_slow_queries.py:641-646)
    val withNorm =
      if (config.patterns.nonEmpty) {
        val normalize = LogColumns.normalizePatterns(config.patterns)
        lexed.withColumn("norm",
          when(col("qtype") === "SELECT", normalize(col("raw_query"))))
      } else {
        lexed.withColumn("norm",
          lit(null).cast("struct<_1:string,_2:map<string,string>>"))
      }

    val stage1 = withNorm.select(
      col("timestamp"), col("duration"), col("qtype"), col("tags"),
      col("raw_query"),
      coalesce(col("norm._1"), col("raw_query")).as("query"),
      {
        val rawBv = when(col("bv_str").isNotNull,
            LogColumns.boundValuesMap(col("bv_str")))
          .otherwise(emptyStrMap)
        val patBv = coalesce(col("norm._2"), emptyStrMap)
        // dict.update: pattern-derived values win (LAST_WIN map_concat)
        when(col("qtype") === "SELECT", map_concat(rawBv, patBv))
          .when(col("qtype") === "INSERT", rawBv)
          .otherwise(emptyStrMap)
      }.as("bound_values"))

    // Table segment: SELECT extracts from the (normalized) query, INSERT
    // from the raw query (analyze_slow_queries.py:648, 729)
    val stage2 = stage1.select(
      col("*"),
      when(col("qtype") === "SELECT", LogColumns.selectTable(col("query")))
        .when(col("qtype") === "INSERT", LogColumns.insertTable(col("raw_query")))
        .as("table_segment"))

    val stage3 = stage2
      .select(
        col("timestamp"), col("duration"), col("qtype"), col("tags"),
        col("query"), col("bound_values"),
        LogColumns.keyspaceCf(col("table_segment"), col("tags"), cfKs, config.tags)
          .as("kc"))
      // >1 dot in the table segment: the reference's 2-tuple unpack
      // raises and the row is skipped (analyze_slow_queries.py:521)
      .filter(!coalesce(col("kc.invalid"), lit(false)))
      .select(col("*"), col("kc.keyspace").as("keyspace"),
        col("kc.column_family").as("column_family"))

    // PK only when bound values AND keyspace AND column_family are all
    // truthy (analyze_slow_queries.py:659-662); '' is falsy like Python
    val pkGuard = size(col("bound_values")) > 0 &&
      col("keyspace").isNotNull && col("keyspace") =!= "" &&
      col("column_family").isNotNull && col("column_family") =!= ""
    stage3
      .select(
        col("qtype").as("type"),
        col("timestamp"),
        col("duration"),
        col("query"),
        col("bound_values"),
        when(pkGuard,
          LogColumns.primaryKey(col("bound_values"), col("keyspace"),
            col("column_family"), pkIdx)).as("primary_key"),
        col("keyspace"),
        col("column_family"),
        col("tags"))
  }
}
