package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry of driver-contract queries: name -> (Spark
  * implementation, optional DuckDB oracle SQL). SparkEntry projects
  * this into the two maps the driver consumes.
  */
object Registry {

  case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  /** Shared table loader. The library's internal contract for
    * `events.ts` is LONG NANOSECONDS since epoch (every consumer does
    * `ts DIV 1000` -> micros; integer arithmetic because ns-since-
    * epoch exceeds double's 2^53 mantissa). The driver's generated
    * parquet has shipped ts as BOTH physical types across rounds:
    * INT64/timestamp[ns] (read as long via
    * `legacy.parquet.nanosAsLong`) and timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize HERE, once, schema-driven — under the
    * session's forced-UTC zone `unix_micros(cast) * 1000` is the
    * exact instant in ns, so every downstream operator and every
    * oracle (DuckDB reads the same file natively as TIMESTAMP) sees
    * identical values regardless of which physical type this round's
    * data carries.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType.typeName) match {
      case Some(t) if t.startsWith("timestamp") =>
        df.withColumn("ts",
          unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case _ => df
    }
  }

  def all: Map[String, Q] =
    CoreQueries.all ++ SlowLogQueries.all ++ OpsQueries.all ++
      ExtendedQueries.all ++ PipelineQueries.all ++ ScaleQueries.all ++
      AuditQueries.all ++ SpanQueries.all ++ LearnQueries.all ++
      CurationQueries.all ++ SelectionQueries.all ++ WarehouseQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
