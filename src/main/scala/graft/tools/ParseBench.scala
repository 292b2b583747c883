package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.analyze.SlowQueryPipeline
import graft.model.AnalysisConfig

/** Parse-path throughput: N synthetic slow-query lines through the
  * full lex + enrich pipeline (the two fused expressions), reported
  * as rows/sec. Usage: runMain graft.tools.ParseBench [rows]
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "parse-bench")
    import spark.implicits._

    val cql = (for { k <- 0 until 3; t <- 0 until 5 } yield
      s"CREATE TABLE ks$k.t$t (\n    id text,\n    PRIMARY KEY (id)\n);").mkString("\n")
    val config = AnalysisConfig(schema = graft.catalog.CqlCatalog.parse(cql))

    // timestamp VARIES per row — a constant literal would let Catalyst
    // constant-fold the to_timestamp away and overstate throughput
    val raw = spark.range(n).select(
      concat(lit("2026-08-12T15:45:"),
        lpad((col("id") % 60).cast("string"), 2, "0"),
        lit("."), lpad((col("id") % 1000000).cast("string"), 6, "0"),
        lit("Z")).as("timestamp_str"),
      concat(
        lit("WARN Query too slow, took "), (col("id") % 5000).cast("string"),
        lit(" ms: [1 bound values] SELECT * FROM ks"), (col("id") % 3).cast("string"),
        lit(".t"), (col("id") % 5).cast("string"),
        lit(" WHERE id=?; [id:'u"), (col("id") % 100000).cast("string"), lit("']"))
        .as("message"),
      array(lit("prod")).as("tags"))

    // warm
    SlowQueryPipeline.parseEvents(raw.limit(10000), config).count()
    val t0 = System.nanoTime()
    val cnt = SlowQueryPipeline.parseEvents(raw, config).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[parse-bench] $cnt rows in $sec%.2f s = ${cnt / sec / 1e6}%.2f M rows/s")
    spark.stop()
  }
}
