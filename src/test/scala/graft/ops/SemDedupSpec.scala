package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class SemDedupSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "SemDedupSpec")
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("fixed-point centroids: two separated groups converge to integer means") {
    // group A ~ (1, 0), group B ~ (0, 1); seeds = two lowest ids (one
    // from each group), so one Lloyd round lands on the exact
    // truncating integer means of each side.
    val df = vecs(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f),
      3L -> Seq(0.9f, 0.1f), 4L -> Seq(0.1f, 0.9f))
    val cents = SemDedup.fixedPointCentroids(df, "vec_id", "embedding",
      k = 2, dims = 2, iters = 1)
    // micros are the float32 value, not the decimal literal:
    // 0.9f -> 0.8999999761... -> floor 899999; 0.1f -> 0.1000000014...
    // -> floor 100000. Means truncate: (1000000 + 899999) / 2 = 949999.
    assert(cents(0).toSeq == Seq(949999L, 50000L))
    assert(cents(1).toSeq == Seq(50000L, 949999L))
  }

  test("assignment ties break to the lowest centroid id; empty cluster keeps its seed") {
    // ids 1 and 2 are identical vectors -> both seed centroids 0 and 1
    // coincide; every point is equidistant from both, so everything
    // lands in cluster 0 and cluster 1 goes empty (keeping its seed).
    val df = vecs(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.0f), 3L -> Seq(0.0f, 1.0f))
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 3, dims = 2, iters = 2, tau = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == out(2L)._1)      // identical vectors co-cluster
    assert(out(1L)._1 != out(3L)._1)      // orthogonal vector separate
    assert(out(1L)._2 == 0L)              // lowest id kept
    assert(out(2L)._2 == 1L)              // identical higher id dropped
    assert(out(3L)._2 == 0L)              // no lower-id near-dup
  }

  test("fused nearest-centroid kernel == brute-force argmin over a " +
    "seeded random corpus (index, distance, and tie rule)") {
    val rnd = new scala.util.Random(42)
    val rows = (0L until 200L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val df = vecs(rows: _*)
    val cents = SemDedup.fixedPointCentroids(df, "vec_id", "embedding",
      k = 5, dims = 8, iters = 2)
    val base = df.select(col("vec_id").cast("long").as("id"),
      SemDedup.microsVec(col("embedding")).as("mv"))
    val got = SemDedup.assignDist(base, cents).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // driver-side reference: same integer micros, strict < tie rule
    val micros = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    for ((id, mv) <- micros) {
      val ds = cents.map(c =>
        mv.zip(c).map { case (m, v) => (m - v) * (m - v) }.sum)
      val bestJ = ds.zipWithIndex.minBy { case (d, j) => (d, j) }._2
      assert(got(id) == (bestJ, ds(bestJ)), s"id=$id")
    }
  }

  test("fused second-centroid kernel == brute-force runner-up distance " +
    "(duplicates count: a tied nearest makes runner-up == winner)") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 150L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val df = vecs(rows: _*)
    val cents = SemDedup.fixedPointCentroids(df, "vec_id", "embedding",
      k = 5, dims = 8, iters = 2)
    val base = df.select(col("vec_id").cast("long").as("id"),
      SemDedup.microsVec(col("embedding")).as("mv"))
    val got = base.select(col("id"),
      graft.ops.VectorExpressions.secondCentroidDist(col("mv"), cents)
        .as("d2")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val micros = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    for ((id, mv) <- micros) {
      val ds = cents.map(c =>
        mv.zip(c).map { case (m, v) => (m - v) * (m - v) }.sum).sorted
      assert(got(id) == ds(1), s"id=$id")
    }
    // and the tied-nearest contract: two coincident centroids that
    // are unambiguously nearest (micros of [-1,1] floats are <= 1e6,
    // so the third row at 1e7 per dim is always the far one)
    val tied = Array(Array(0L, 0L), Array(0L, 0L),
      Array(10000000L, 10000000L))
    val one = base.limit(1).select(
      graft.ops.VectorExpressions.nearestCentroidDist(col("mv"), tied)
        .as("d1"),
      graft.ops.VectorExpressions.secondCentroidDist(col("mv"), tied)
        .as("d2")).collect().head
    assert(one.getLong(0) == one.getLong(1))
  }

  test("fused top_centroids kernel == brute-force (d, j) rank order " +
    "over a seeded random corpus") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 120L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    val df = vecs(rows: _*)
    val cents = SemDedup.fixedPointCentroids(df, "vec_id", "embedding",
      k = 6, dims = 8, iters = 2)
    val base = df.select(col("vec_id").cast("long").as("id"),
      SemDedup.microsVec(col("embedding")).as("mv"))
    val got = base.select(col("id"),
      graft.ops.VectorExpressions.topCentroids(col("mv"), cents, 3)
        .as("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val micros = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    for ((id, mv) <- micros) {
      val ds = cents.map(c =>
        mv.zip(c).map { case (m, v) => (m - v) * (m - v) }.sum)
      val want = ds.zipWithIndex.sortBy { case (d, j) => (d, j) }
        .take(3).map(_._2.toLong).toSeq
      assert(got(id) == want, s"id=$id")
    }
    // n > k returns all k indices, still rank-ordered
    val all = base.limit(1).select(
      graft.ops.VectorExpressions.topCentroids(col("mv"), cents, 99))
      .collect().head.getSeq[Long](0)
    assert(all.length == 6 && all.toSet == (0L until 6L).toSet)
  }

  test("cluster quality card: silhouette/scatter/DB match a driver " +
    "reference on a seeded two-blob corpus") {
    val rnd = new scala.util.Random(11)
    // two well-separated blobs -> silhouette near 1000, DB small
    val rows = (0L until 60L).map { i =>
      val b = if (i % 2 == 0) 0.9f else -0.9f
      i -> Seq.fill(4)(b + rnd.nextFloat() * 0.05f)
    }
    val df = vecs(rows: _*)
    val out = SemDedup.clusterQuality(df, "vec_id", "embedding",
      k = 2, dims = 4, iters = 2).collect()
    assert(out.length == 2)
    // driver reference replaying the same integer contract
    val cents = SemDedup.fixedPointCentroids(df, "vec_id", "embedding",
      k = 2, dims = 4, iters = 2)
    val micros = df.select(col("vec_id").cast("long").as("id"),
      SemDedup.microsVec(col("embedding")).as("mv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val scored = micros.map { case (_, mv) =>
      val ds = cents.map(c =>
        mv.zip(c).map { case (m, v) => (m - v) * (m - v) }.sum)
      val j = ds.zipWithIndex.minBy { case (d, k) => (d, k) }._2
      val da = ds(j)
      val db = ds.sorted.apply(1)
      (j, da, if (db == 0) 0L else (db - da) * 1000L / db)
    }
    for (r <- out) {
      val j = r.getLong(0).toInt
      val mine = scored.filter(_._1 == j)
      assert(r.getLong(1) == mine.length)                   // n
      assert(r.getLong(2) == mine.map(_._3).sum / mine.length) // sil
      assert(r.getLong(3) == mine.map(_._2).sum / mine.length) // s_mean
      // DB for k=2: (s0 + s1) * 1000 / m01, same for both clusters
      val sM = (0 to 1).map(c => {
        val m = scored.filter(_._1 == c); m.map(_._2).sum / m.length
      })
      val m01 = cents(0).zip(cents(1))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getLong(4) == (sM(0) + sM(1)) * 1000L / m01)
      // separated blobs: tight clusters, near-max silhouette
      assert(r.getLong(2) > 900L && r.getLong(4) < 100L)
    }
  }

  test("fused micros_vec == the HOF formulation it replaced " +
    "(floor(double(v) * 1e6) :: long), element for element") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i =>
      i -> Seq.fill(12)((rnd.nextFloat() * 4 - 2) *
        math.pow(10, rnd.nextInt(5) - 2).toFloat))
    val df = vecs(rows: _*)
    val got = df.select(col("vec_id"),
        SemDedup.microsVec(col("embedding")).as("mv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = df.select(col("vec_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * lit(1000000d)).cast("long")).as("mv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == ref)
  }

  test("prune only fires within a cluster and above tau") {
    // near-dup pair split across clusters must NOT drop (the SemDeDup
    // contract: comparisons are per-cell)
    val a = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = vecs(1L -> a, 2L -> b, 3L -> b, 4L -> a)
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 2, dims = 4, iters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L)._2 == 0L)              // first of its cluster: kept
    assert(out(3L)._1 == out(2L)._1 && out(3L)._2 == 1L)
    assert(out(4L)._1 == out(1L)._1 && out(4L)._2 == 1L)
  }

  test("importance weights: smoothed bucket shares, integer-exact") {
    // two distinct bigrams: "a a" seen once in target + once in raw,
    // "b b" only in raw. score(aa) = (1+1)*1e6 // (2+2) = 500000;
    // score(bb) = (0+1)*1e6 // (1+2) = 333333. One-token doc absent.
    val docs = Seq(
      (1L, "a a", "en"), (2L, "b b", "fr"), (3L, "a a", "fr"),
      (4L, "x", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 4096, selectThreshold = 450000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == (1L, 500000L, 500000L, 1L))
    assert(out(2L) == (1L, 333333L, 333333L, 0L))
    assert(out(3L) == (1L, 500000L, 500000L, 1L))
    assert(!out.contains(4L))             // sub-2-token doc: no evidence
  }
}
