package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.Schemas

/** S6/S7 — scan of Kibana/Elasticsearch `_msearch` result JSON files
  * (reference: analyze_slow_queries.py:1264-1306).
  *
  * The explicit nested read schema lets Catalyst prune every `_source`
  * field except the three the pipeline uses (the reference's manual
  * projection, :1286-1294). Corrupt documents land in a side channel
  * instead of killing the scan (the reference's per-hit try/except,
  * :1296-1304) via PERMISSIVE mode.
  */
object KibanaReader {

  val CorruptCol = "_corrupt_record"

  private def readRaw(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val schema = StructType(
      Schemas.kibanaHits.fields :+ StructField(CorruptCol, StringType))
    // multiLine: each downloaded page is ONE JSON document spanning
    // the whole file (reference does json.load per file,
    // analyze_slow_queries.py:1277). Parallelism comes from the file
    // count (one ES page per file), not intra-file splits.
    spark.read
      .schema(schema)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)
  }

  /** One row per hit with columns (timestamp_str, message, tags).
    * Field coalesce `message` -> `@message` and the `tags -> []`
    * default match analyze_slow_queries.py:1287-1294; the cheap
    * substring prefilter gates the expensive lexer
    * (analyze_slow_queries.py:1295, optimization O1).
    */
  def hits(spark: SparkSession, paths: Seq[String]): DataFrame =
    readRaw(spark, paths)
      .select(explode(col("responses")).as("r"))
      .select(explode(col("r.hits.hits")).as("h"))
      .select(
        col("h._source.@timestamp").as("timestamp_str"),
        coalesce(col("h._source.message"), col("h._source.@message")).as("message"),
        coalesce(col("h._source.tags"), array().cast("array<string>")).as("tags"))
      .filter(col("message").contains("Query too slow"))

  /** Streaming variant of [[hits]]: watch a directory of page files.
    * The downstream parse pipeline is stateless narrow operators, so
    * it composes on this unchanged
    * (SlowQueryPipeline.parseEvents(hitsStream(...), config)).
    */
  def hitsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.kibanaHits)
      .option("multiLine", "true")
      .json(dir)
      .select(explode(col("responses")).as("r"))
      .select(explode(col("r.hits.hits")).as("h"))
      .select(
        col("h._source.@timestamp").as("timestamp_str"),
        coalesce(col("h._source.message"), col("h._source.@message")).as("message"),
        coalesce(col("h._source.tags"), array().cast("array<string>")).as("tags"))
      .filter(col("message").contains("Query too slow"))

  /** S5 — shard-failure side output
    * (download_slow_queries.py:110-128): one row per failure reason.
    */
  def shardFailures(spark: SparkSession, paths: Seq[String]): DataFrame =
    readRaw(spark, paths)
      .select(explode(col("responses")).as("r"))
      .select(explode(col("r._shards.failures")).as("f"))
      .select(col("f.reason.reason").as("reason"))

  /** Documents that failed to parse at all (data-quality channel).
    * The intermediate is cached: Spark disallows querying ONLY the
    * internal corrupt-record column of a raw JSON scan
    * ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]).
    */
  def corruptRecords(spark: SparkSession, paths: Seq[String]): DataFrame =
    graft.Scratch.cache(readRaw(spark, paths))
      .filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol))
}
