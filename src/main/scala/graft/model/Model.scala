package graft.model

import org.apache.spark.sql.types._

/** Core data shapes of the slow-query analytics engine.
  *
  * Mirrors the reference data model (see SURVEY.md §1; reference:
  * analyze_slow_queries.py:917-926 for the parsed event row,
  * analyze_slow_queries.py:334-364 for the schema catalog).
  */

/** Partition/clustering key metadata for one Cassandra table
  * (reference: analyze_slow_queries.py:391-418).
  */
case class TableMeta(partitionKey: Seq[String], clusteringKey: Seq[String])

/** A query-normalization pattern for CQL without bound markers
  * (reference: analyze_slow_queries.py:27-36, 842-889).
  */
case class QueryPattern(start: String, parameters: Seq[String])

/** Analysis configuration (reference: analyze_slow_queries.py:90-109,
  * CLI defaults :1315-1319).
  *
  * @param orderBy   one of "count" | "duration" | "avg_duration"
  * @param tags      map tag -> keyspace used as keyspace-guess fallback
  * @param enrichDml opt-in DOCUMENTED DEVIATION: the reference leaves
  *                  DELETE/UPDATE rows unenriched (passthrough
  *                  processors, analyze_slow_queries.py:770-837) and
  *                  carries the gap as a TODO (:57 "Parse primary key
  *                  out of DELETE and UPDATE statements"). With this
  *                  flag the C5/C6 processors run the same bound-values
  *                  -> table -> PK path as SELECT/INSERT (F3/F6/F7
  *                  reuse), so DML rows land in the primary-key
  *                  reports. Default false = byte-exact reference
  *                  parity.
  */
case class AnalysisConfig(
    topN: Int = 100,
    rowsPerMinute: Int = 5,
    orderBy: String = "duration",
    minCount: Int = 5,
    schema: Map[(String, String), TableMeta] = Map.empty,
    patterns: Seq[QueryPattern] = Nil,
    tags: Map[String, String] = Map.empty,
    enrichDml: Boolean = false)

object Schemas {

  /** Read schema for Kibana/Elasticsearch `_msearch` result JSON
    * (reference: analyze_slow_queries.py:1283-1294 field access,
    * download_slow_queries.py:99-128 totals and shard failures).
    * Explicit so Catalyst prunes nested fields at the scan.
    */
  val kibanaHits: StructType = StructType(Seq(
    StructField("responses", ArrayType(StructType(Seq(
      StructField("hits", StructType(Seq(
        StructField("total", LongType),
        StructField("hits", ArrayType(StructType(Seq(
          StructField("_source", StructType(Seq(
            StructField("@timestamp", StringType),
            StructField("message", StringType),
            StructField("@message", StringType),
            StructField("tags", ArrayType(StringType))
          )))
        ))))
      ))),
      StructField("_shards", StructType(Seq(
        StructField("failures", ArrayType(StructType(Seq(
          StructField("reason", StructType(Seq(
            StructField("reason", StringType)
          )))
        ))))
      )))
    ))))
  ))

  /** Schema of a parsed slow-query event (reference row shape:
    * analyze_slow_queries.py:917-926).
    */
  val slowQueryEvent: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("timestamp", TimestampType),
    StructField("duration", LongType),
    StructField("query", StringType),
    StructField("bound_values", MapType(StringType, StringType)),
    StructField("primary_key", StringType),
    StructField("keyspace", StringType),
    StructField("column_family", StringType),
    StructField("tags", ArrayType(StringType))
  ))
}
