package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class TemporalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "TemporalSpec")
  import spark.implicits._

  test("asof join: latest at-or-before match, equal-time matches, no-match nulls") {
    val left = Seq(
      (1L, "k1", 5L), // after two updates -> t=3 wins
      (2L, "k1", 3L), // equal time -> matches the t=3 update
      (3L, "k1", 2L), // between updates -> t=1
      (4L, "k1", 0L), // before any update -> null
      (5L, "k2", 9L), // other key -> its own history
      (6L, "k3", 9L)  // key with no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", 1L, "v1"), ("k1", 3L, "v3"),
      ("k2", 4L, "w4")
    ).toDF("k", "rt", "v")

    val got = Temporal.asofJoin(left, right, "k", col("t"), col("rt"), Seq("v"))
      .orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("v"))
    assert(got.toSeq == Seq(
      1L -> "v3", 2L -> "v3", 3L -> "v1", 4L -> null, 5L -> "w4", 6L -> null))
  }

  test("range join: inclusive bounds, bucket-boundary spans, no false hits") {
    val points = Seq((1L, 0L), (2L, 13L), (3L, 14L), (4L, 27L), (5L, 100L))
      .toDF("pid", "t")
    val intervals = Seq((10L, 0L, 13L), (11L, 13L, 27L)).toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(points, intervals,
      col("t"), col("s"), col("e"), bucketWidth = 14)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 10L), // t=0 in [0,13]
      (2L, 10L), (2L, 11L), // t=13 inclusive in both
      (3L, 11L), // t=14 crosses the bucket boundary into [13,27]
      (4L, 11L))) // t=27 inclusive end
    // t=100 matches nothing
  }

  test("asof join: NULL right times never match (ASOF parity)") {
    val left = Seq((1L, "k1", 5L)).toDF("id", "k", "t")
    val right = Seq(("k1", Option.empty[Long], "vNULL"), ("k1", Some(7L), "v7"))
      .toDF("k", "rt", "v")
    val got = Temporal.asofJoin(left, right, "k", col("t"), col("rt"), Seq("v"))
      .head()
    assert(got.getAs[String]("v") == null) // not vNULL, not v7
  }

  test("asof join: NULL keys match nothing (equi-join parity)") {
    // a NULL-key left row must NOT be enriched from NULL-key right
    // rows — `ON l.key = r.key` never matches NULL to NULL; the
    // window partition would otherwise group them together
    val left = Seq((1L, Option.empty[String], 5L), (2L, Some("k1"), 5L))
      .toDF("id", "k", "t")
    val right = Seq((Option.empty[String], 1L, "vN"), (Some("k1"), 1L, "v1"))
      .toDF("k", "rt", "v")
    val got = Temporal.asofJoin(left, right, "k", col("t"), col("rt"), Seq("v"))
      .orderBy(col("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("v"))
    assert(got.toSeq == Seq(1L -> null, 2L -> "v1"))
  }

  test("range join rejects non-positive bucketWidth loudly") {
    val points = Seq((1L, 0L)).toDF("pid", "t")
    val intervals = Seq((10L, 0L, 13L)).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(points, intervals, col("t"), col("s"), col("e"), 0L)
    }
  }

  test("reserved internal names are rejected loudly") {
    val bad = Seq((1L, "k", 2L)).toDF("id", "k", "_t")
    val right = Seq(("k", 1L, "v")).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(bad, right, "k", col("id"), col("rt"), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(bad.withColumnRenamed("_t", "_bucket"), right,
        col("id"), col("rt"), col("rt"), 10)
    }
  }

  test("range join with equi-keys restricts candidates per key") {
    val points = Seq((1L, "A", 5L), (2L, "B", 5L)).toDF("pid", "k", "t")
    val intervals = Seq(("A", 0L, 10L, 100L), ("B", 0L, 10L, 200L))
      .toDF("k", "s", "e", "iv")
    val got = Temporal.rangeJoin(points, intervals,
      col("t"), col("s"), col("e"), bucketWidth = 14, keys = Seq("k"))
      .select(col("pid"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 200L))) // no cross-key matches
  }

  test("asof join preserves all left columns and row count") {
    val left = Seq((1L, "k1", 10L, "payload")).toDF("id", "k", "t", "extra")
    val right = Seq(("k1", 1L, 42L)).toDF("k", "rt", "rv")
    val out = Temporal.asofJoin(left, right, "k", col("t"), col("rt"), Seq("rv"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "extra", "rv"))
    val r = out.head()
    assert(r.getString(3) == "payload" && r.getLong(4) == 42L)
  }
}
