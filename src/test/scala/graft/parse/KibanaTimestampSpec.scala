package graft.parse

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.analyze.SlowQueryPipeline

/** The fast fixed-format parser vs Spark's to_timestamp on the
  * canonical 6-digit layout, plus the strptime('%f') 1-6 digit
  * acceptance and calendar validation.
  */
class KibanaTimestampSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "KibanaTimestampSpec")
  import spark.implicits._

  test("agrees with to_timestamp on canonical 6-digit inputs") {
    val inputs = Seq(
      "2026-08-12T15:45:01.123456Z",
      "2024-02-29T23:59:59.999999Z", // leap day
      "1970-01-01T00:00:00.000000Z",
      "1969-12-31T23:59:59.000001Z") // pre-epoch
    val rows = inputs.toDF("s").select(
      LogColumns.kibanaTimestamp(col("s")).as("fast"),
      to_timestamp(col("s"), SlowQueryPipeline.TsFmt).as("ref")).collect()
    rows.foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("1-6 fraction digits right-pad to micros (strptime %f)") {
    val got = Seq("2026-08-12T10:00:00.5Z", "2026-08-12T10:00:00.12345Z")
      .toDF("s")
      .select(LogColumns.kibanaTimestamp(col("s")).cast("string"))
      .collect().map(_.getString(0))
    assert(got(0) == "2026-08-12 10:00:00.5")
    assert(got(1) == "2026-08-12 10:00:00.12345")
  }

  test("rejects malformed layouts and invalid calendar fields") {
    val bad = Seq(
      "2026-08-12 15:45:01.123456Z", // space not T
      "2026-13-12T15:45:01.123456Z", // month 13
      "2023-02-29T00:00:00.000000Z", // not a leap year
      "2026-08-12T24:00:01.123456Z", // hour 24
      "2026-08-12T15:45:01Z",        // no fraction
      "2026-08-12T15:45:01.1234567Z", // 7 digits
      "2026-08-12T15:45:01.123456",  // no Z
      "not-a-timestamp", "", "2026-08-12T15:45:0a.123456Z")
    val got = bad.toDF("s")
      .select(LogColumns.kibanaTimestamp(col("s"))).collect()
    got.foreach(r => assert(r.get(0) == null, r.toString))
  }
}
