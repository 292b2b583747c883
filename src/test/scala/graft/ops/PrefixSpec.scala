package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-domain window guard: Prefix.cumSums must produce
  * row-identical results on its one-partition path (under the cap)
  * and its bucketed distributed path (over the cap), and the
  * converted operators must survive being forced down the
  * distributed path — the cap-and-fallback discipline of
  * Dedup.DriverReplayCapKey applied to cumulative windows.
  */
class PrefixSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder
    .master("local[4]").appName("prefix")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withCap[A](cap: Long)(body: => A): A = {
    spark.conf.set(Prefix.MaxWindowRowsKey, cap.toString)
    try body
    finally spark.conf.unset(Prefix.MaxWindowRowsKey)
  }

  test("cumSums: distributed path row-identical to window path, asc and desc") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // sparse, unordered, negative-spanning distinct keys
    val rows = rnd.shuffle((-400 until 500).toList)
      .map(v => (v.toLong, rnd.nextInt(50).toLong, rnd.nextInt(9).toLong))
    val df = rows.toDF("v", "a", "b")
    for (desc <- Seq(false, true)) {
      val viaWindow = Prefix.cumSums(df, "v", desc,
        Seq(col("a") -> "ca", col("b") -> "cb"))
        .collect().map(_.toSeq).toSet
      val viaBuckets = withCap(0L) {
        Prefix.cumSums(df, "v", desc,
          Seq(col("a") -> "ca", col("b") -> "cb"))
          .collect().map(_.toSeq).toSet
      }
      assert(viaWindow == viaBuckets, s"desc=$desc paths diverge")
      // and both equal the naive reference
      val ord = if (desc) rows.sortBy(-_._1) else rows.sortBy(_._1)
      val want = ord.zipWithIndex.map { case ((v, a, b), i) =>
        Seq[Any](v, a, b,
          ord.take(i + 1).map(_._2).sum, ord.take(i + 1).map(_._3).sum)
      }.toSet
      assert(viaWindow == want, s"desc=$desc wrong values")
    }
  }

  test("cumSums: null order key handled identically on both paths " +
    "(asc: first, desc: last)") {
    import spark.implicits._
    // a post-groupBy histogram with a null group key — the shape
    // every call site feeds; the old distributed path NPE'd on the
    // null bucket key while the capped path succeeded
    val df = Seq((Some(3L), 10L), (None, 1L), (Some(1L), 5L),
      (Some(7L), 2L)).toDF("v", "a")
    for (desc <- Seq(false, true)) {
      val viaWindow = Prefix.cumSum(df, "v", col("a"), "c", desc = desc)
        .collect().map(_.toSeq).toSet
      val viaBuckets = withCap(0L) {
        Prefix.cumSum(df, "v", col("a"), "c", desc = desc)
          .collect().map(_.toSeq).toSet
      }
      assert(viaWindow == viaBuckets, s"desc=$desc null paths diverge")
    }
    // pin the null position explicitly: asc -> null row carries only
    // its own value (sorts first); desc -> null row carries the total
    val asc = withCap(0L) {
      Prefix.cumSum(df, "v", col("a"), "c").collect()
        .find(_.isNullAt(0)).get.getLong(2)
    }
    assert(asc == 1L)
    val descC = withCap(0L) {
      Prefix.cumSum(df, "v", col("a"), "c", desc = true).collect()
        .find(_.isNullAt(0)).get.getLong(2)
    }
    assert(descC == 18L)
  }

  test("cumSums: fractional score domain does not collapse the " +
    "distributed path (old CAST-AS-BIGINT bucketing did)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (i / 500.0, rnd.nextInt(5).toLong))
    val df = rows.toDF("v", "a")
    val got = withCap(0L) {
      val out = Prefix.cumSum(df, "v", col("a"), "c")
      // more than one real bucket must appear in the plan's exchange
      // (indirect check: result correctness is the contract; the
      // collapse bug produced correct-but-single-reducer plans, so
      // also assert multiple buckets materialize)
      out.collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    }
    val want = rows.sortBy(_._1).scanLeft(0.0 -> 0L) {
      case ((_, acc), (v, a)) => v -> (acc + a)
    }.drop(1).toMap
    assert(got == want)
  }

  test("cumSums: hash-range long domain (span overflow) stays " +
    "order-correct on the distributed path") {
    import spark.implicits._
    // keys spanning nearly the whole long range: hi - lo overflows;
    // the old integer width math scrambled bucket order here
    val rnd = new scala.util.Random(13)
    val keys = (Seq(Long.MinValue + 5, Long.MaxValue - 5, -1L, 0L, 1L) ++
      (0 until 300).map(_ => rnd.nextLong())).distinct
    val rows = keys.map(k => (k, (k % 7 + 7) % 7 + 1))
    val df = rows.toDF("v", "a")
    val got = withCap(0L) {
      Prefix.cumSum(df, "v", col("a"), "c").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val want = rows.sortBy(_._1).scanLeft(0L -> 0L) {
      case ((_, acc), (v, a)) => v -> (acc + a)
    }.drop(1).toMap
    assert(got == want)
  }

  test("cumSums: empty frame and single row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("v", "a")
    assert(Prefix.cumSum(empty, "v", col("a"), "c").count() == 0L)
    assert(withCap(0L) {
      Prefix.cumSum(empty, "v", col("a"), "c").count()
    } == 0L)
    val one = Seq((7L, 3L)).toDF("v", "a")
    assert(Prefix.cumSum(one, "v", col("a"), "c")
      .select(col("c")).head().getLong(0) == 3L)
  }

  test("cumSums window path plans a PARTITIONED window (no empty partitionSpec)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("v", "a")
    val p = Prefix.cumSum(df, "v", col("a"), "c")
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"))
    assert(!p.contains("windowspecdefinition(v"), // no bare orderBy-only spec
      "unpartitioned window slipped through:\n" + p)
    // ... and the marker must survive on a FILE-backED plan too: a
    // lit(0) marker held on LocalTableScan but FoldablePropagation +
    // EliminateWindowPartitions stripped it from the parquet plan
    // (empty partitionSpec, "No Partition Defined" at runtime) — the
    // exact regression this pin originally missed
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prefix_pin").toString
    df.write.mode("overwrite").parquet(dir)
    val pf = Prefix.cumSum(spark.read.parquet(dir), "v", col("a"), "c")
      .queryExecution.executedPlan.toString
    assert(pf.contains("windowspecdefinition(_pfx_p"),
      "marker partition folded away on the file-backed plan:\n" + pf)
  }

  test("converted operators are row-identical when forced distributed") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val scored = (1 to 3000)
      .map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(2)))
      .toDF("id", "score", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet

    val sweepA = rows(Eval.thresholdSweep(scored, col("score"), col("label")))
    graft.Scratch.release()
    val sweepB = withCap(0L) {
      rows(Eval.thresholdSweep(scored, col("score"), col("label")))
    }
    graft.Scratch.release()
    assert(sweepA == sweepB, "thresholdSweep paths diverge")

    val skewA = rows(Skew.keySkewProfile(scored, pmod(col("id"), lit(37))))
    graft.Scratch.release()
    val skewB = withCap(0L) {
      rows(Skew.keySkewProfile(scored, pmod(col("id"), lit(37))))
    }
    graft.Scratch.release()
    assert(skewA == skewB, "keySkewProfile paths diverge")

    val hist = scored.groupBy((col("label") + 1).as("grp"),
      col("score").as("v")).agg(count(lit(1)).as("cnt"))
    val ksA = rows(Eval.ksDriftFromHist(hist))
    val ksB = withCap(0L) { rows(Eval.ksDriftFromHist(hist)) }
    assert(ksA == ksB, "ksDriftFromHist paths diverge")
  }
}
