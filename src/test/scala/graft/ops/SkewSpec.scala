package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class SkewSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "SkewSpec")
  import spark.implicits._

  private def skewed = {
    // key "hot" owns 90% of rows
    val hot = (1 to 900).map(i => ("hot", i.toLong))
    val cold = (1 to 100).map(i => (s"k${i % 10}", i.toLong))
    (hot ++ cold).toDF("key", "v")
  }

  test("salted count/sum equals the direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(count(lit(1)).as("count"), sum($"v").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(skewed, Seq($"key"), $"v", $"v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  // the q26 -> q56 rescope evidence. Genuine near-dups share band
  // values in BOTH layouts (that's recall), so the scale hazard is
  // the RANDOM background: unrelated docs colliding because the
  // band-value space is small. On uniform signatures the 60-bit
  // layout's 6-7-bit bands put ~N/2^6 docs in the hot bucket
  // (quadratic candidates as N grows) while the 120-bit layout's
  // 12-15-bit bands keep it ~N/2^12 — the measured gap below.
  test("120-bit band layout shrinks random-background hot buckets vs 60-bit") {
    val n = 4000L
    val mask60 = (1L << 60) - 1
    // uniform pseudo-random signatures from independent id hashes
    val sigs = spark.range(n).select(
      xxhash64(col("id"), lit("w0")).bitwiseAND(lit(mask60)).as("sig"),
      array(xxhash64(col("id"), lit("w0")).bitwiseAND(lit(mask60)),
        xxhash64(col("id"), lit("w1")).bitwiseAND(lit(mask60))).as("wide"))
    def maxBucket(bandCols: Seq[org.apache.spark.sql.Column]): Long =
      sigs.select(explode(array(bandCols: _*)).as("bk"))
        .groupBy(col("bk")).count()
        .agg(max(col("count"))).head().getLong(0)
    val bands = 9 // maxDist = 8, both layouts
    // 60-bit: simhashPairsFromSigs' band arithmetic
    val base = 60 / bands; val extra = 60 % bands
    val widths = Seq.tabulate(bands)(i => if (i < extra) base + 1 else base)
    val los = widths.scanLeft(0)(_ + _).init
    val hot60 = maxBucket((0 until bands).map(b => struct(lit(b).as("bi"),
      shiftright(col("sig"), los(b))
        .bitwiseAND(lit((1L << widths(b)) - 1)).as("bv"))))
    // 120-bit: the shared wideBandLayout
    val hot120 = maxBucket(Dedup.wideBandLayout(2, 60, bands).zipWithIndex.map {
      case ((w, lo, wd), b) => struct(lit(b).as("bi"),
        shiftright(element_at(col("wide"), w + 1), lo)
          .bitwiseAND(lit((1L << wd) - 1)).as("bv"))
    })
    assert(hot60 >= n / 64 / 2, // ~N/2^6 modulo variance
      s"60-bit hot bucket $hot60 implausibly small for n=$n")
    assert(hot120 * 8 <= hot60,
      s"120-bit hot bucket $hot120 not clearly below 60-bit $hot60")
  }

  test("salted join equals the direct join") {
    val dims = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val direct = skewed.join(dims, "key")
      .groupBy($"label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dims, "key", $"v", salts = 8)
      .groupBy($"label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }
}
