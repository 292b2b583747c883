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
