package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of driver-contract queries: name -> (Spark
  * implementation, optional DuckDB oracle SQL). SparkEntry projects
  * this into the two maps the driver consumes.
  */
object Registry {

  case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  def all: Map[String, Q] =
    CoreQueries.all ++ SlowLogQueries.all ++ OpsQueries.all ++
      ExtendedQueries.all ++ PipelineQueries.all ++ ScaleQueries.all ++
      AuditQueries.all ++ SpanQueries.all ++ LearnQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
