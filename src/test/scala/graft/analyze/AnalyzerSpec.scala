package graft.analyze

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.model.AnalysisConfig

/** Config-variant behavior of the five reports: order_by resolution,
  * min_count HAVING, top-N limits, rows_per_minute.
  */
class AnalyzerSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "AnalyzerSpec")

  private def events = {
    import spark.implicits._
    // (type, ts, duration, query, pk, ks, cf)
    Seq(
      ("SELECT", "2026-08-12 10:00:01", 100L, "Q1", "p1", "k", "c"),
      ("SELECT", "2026-08-12 10:00:02", 100L, "Q1", "p1", "k", "c"),
      ("SELECT", "2026-08-12 10:00:03", 100L, "Q1", "p2", "k", "c"),
      ("SELECT", "2026-08-12 10:01:01", 500L, "Q2", "p1", "k", "c"),
      ("SELECT", "2026-08-12 10:01:02", 9L, "Q3", null, null, null))
      .toDF("type", "ts_s", "duration", "query", "primary_key", "keyspace", "column_family")
      .selectExpr("type", "CAST(ts_s AS TIMESTAMP) AS timestamp", "duration",
        "query", "primary_key", "keyspace", "column_family")
  }

  private def base = AnalysisConfig(minCount = 1)

  test("order_by=count ranks by frequency; duration by total time") {
    val byCount = Analyzer.queryReport(events, base.copy(orderBy = "count"))
      .collect().map(_.getAs[String]("query")).toSeq
    assert(byCount.head == "Q1") // 3 occurrences
    val byDur = Analyzer.queryReport(events, base.copy(orderBy = "duration"))
      .collect().map(_.getAs[String]("query")).toSeq
    assert(byDur.head == "Q2") // 500 total
    val byAvg = Analyzer.queryReport(events, base.copy(orderBy = "avg_duration"))
      .collect().map(_.getAs[String]("query")).toSeq
    assert(byAvg.head == "Q2") // 500 avg
  }

  test("invalid order_by is rejected") {
    intercept[IllegalArgumentException] {
      Analyzer.queryReport(events, base.copy(orderBy = "nope")).collect()
    }
  }

  test("min_count filters small groups everywhere") {
    val r = Analyzer.queryReport(events, base.copy(minCount = 2))
    assert(r.collect().map(_.getAs[String]("query")).toSeq == Seq("Q1"))
    val v = Analyzer.volumeReport(events, base.copy(minCount = 3))
    assert(v.collect().map(_.getAs[String]("minute")).toSeq == Seq("2026-08-12 10:00"))
  }

  test("top_n truncates after the deterministic sort") {
    val r = Analyzer.queryReport(events, base.copy(topN = 1, orderBy = "count"))
    assert(r.count() == 1)
  }

  test("rows_per_minute caps each minute's ranking") {
    val vt = Analyzer.volumeTopReport(events, base.copy(rowsPerMinute = 1, orderBy = "count"))
      .collect()
    assert(vt.length == 2) // one per minute
    assert(vt.map(_.getAs[String]("minute")).toSet ==
      Set("2026-08-12 10:00", "2026-08-12 10:01"))
  }

  test("pk report excludes empty-pk rows; Q3 never appears") {
    val pk = Analyzer.primaryKeyReport(events, base)
    val rows = pk.collect()
    assert(rows.forall(_.getAs[String]("primary_key").nonEmpty))
    assert(rows.map(_.getAs[Long]("count")).sum == 4) // Q3 row excluded
  }
}
