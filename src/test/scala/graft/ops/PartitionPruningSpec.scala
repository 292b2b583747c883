package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Partition-pruned layouts: the other half of the 100 TB scan story
  * (BucketedJoinSpec covers the join half). A date-partitioned write
  * plus a date predicate must prune at PLANNING time — the scan's
  * PartitionFilters carry the predicate and only matching directories
  * are listed, so a day query over a year of data reads 1/365th of
  * the files no matter the corpus size.
  */
class PartitionPruningSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "PartitionPruningSpec")

  test("date-partitioned scan prunes to the predicate's partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = graft.queries.Registry.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", date_format(
        timestamp_micros(expr("ts DIV 1000")), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(tmp)
    val days = ev.select(col("day")).distinct().count()
    assert(days > 3, s"need several partitions, got $days")

    val q = spark.read.parquet(tmp).filter(col("day") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("day"),
      s"predicate must reach PartitionFilters:\n$plan")
    // data filters must NOT carry the partition predicate — pruning
    // happened at listing time, not per-row
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"))

    // proof by I/O: the pruned scan reads exactly the one day's rows,
    // and its file count is that partition's, not the table's
    val expected = ev.filter(col("day") === "2024-01-02").count()
    assert(q.count() == expected && expected > 0)
    val allFiles = q.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!allFiles.contains(s"$days paths"))
  }
}
