package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession

/** The x8192 semdedup_fit decade, run in BOTH storage modes, to pin
  * down SCALING.md round 8's residual-super-linearity attribution
  * (a = 1.18 at x512->x2048 "living in single-JVM storage effects:
  * the float replica cache plus execution share one heap").
  *
  * - mode `cache` (ScaleProbe's methodology): the replicated float
  *   corpus is `.repartition(32).cache()`d on-heap, then the Lloyd
  *   fit's iters+1 narrow passes read the columnar cache. Storage
  *   and execution compete for the unified memory pool.
  * - mode `recompute`: NO cache anywhere — each pass re-reads the
  *   2000-row parquet base and re-replicates via the broadcast
  *   range crossJoin (the replication is a zero-shuffle projection,
  *   so recompute costs one narrow scan per pass, nothing more).
  *   Storage pressure is zero by construction; if the super-linear
  *   residual is a single-JVM memory tax, this mode's x2048->x8192
  *   exponent collapses toward 1.
  *
  * Usage: `SPARK_GRAFT_KS=2048,8192 SPARK_GRAFT_MODES=cache,recompute
  * sbt "runMain graft.tools.SemDecadeProbe"` — prints one line per
  * (mode, k) with wall seconds and GC delta.
  */
object SemDecadeProbe {
  def main(args: Array[String]): Unit = {
    val ks = sys.env.getOrElse("SPARK_GRAFT_KS", "2048,8192")
      .split(',').map(_.trim.toInt).toSeq
    val modes = sys.env.getOrElse("SPARK_GRAFT_MODES", "cache,recompute")
      .split(',').map(_.trim).toSeq
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embN = embBase.count()
    // cache-mode replication keeps ScaleProbe's exact shape (base on
    // the left, repartition(32) before caching) so the x2048 point is
    // directly comparable with SCALING.md round 8's
    def replicatedForCache(k: Int) = embBase.crossJoin(
        broadcast(spark.range(k.toLong).select(col("id").as("_rep"))))
      .withColumn("vec_id", col("vec_id") + col("_rep") * lit(embN))
      .drop("_rep")
    // recompute-mode replication must be partition-parallel WITHOUT a
    // shuffle or a cache: the 32-slice range is the STREAMED side and
    // the 2000-row parquet base broadcasts, so every recomputing pass
    // runs 32-wide from the start (base-on-the-left leaves the whole
    // replicated frame in the parquet scan's single partition — a
    // 32x parallelism artifact that would masquerade as storage tax)
    def replicatedRecompute(k: Int) = spark.range(k.toLong)
      .select(col("id").as("_rep"))
      .crossJoin(broadcast(embBase))
      .withColumn("vec_id", col("vec_id") + col("_rep") * lit(embN))
      .drop("_rep")
    // JIT warm-up (untimed): one small fit through every kernel
    graft.ops.SemDedup.fixedPointCentroids(
      replicatedRecompute(8), "vec_id", "embedding",
      k = 8, dims = 64, iters = 1)
    graft.Scratch.release()
    for (mode <- modes; k <- ks) {
      val emb =
        if (mode == "cache") {
          val e = replicatedForCache(k).repartition(32).cache()
          e.count()
          e
        } else replicatedRecompute(k)
      val g0 = gcMs
      val t0 = System.nanoTime()
      graft.ops.SemDedup.fixedPointCentroids(
        emb, "vec_id", "embedding", k = 8, dims = 64, iters = 2)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[semdecade] mode=$mode%-9s x$k%-5d n=${embN * k}%9d " +
        f"semdedup_fit ${sec}%7.2f s  gc=${gcMs - g0} ms")
      if (mode == "cache") emb.unpersist(blocking = true)
      graft.Scratch.release()
      System.gc()
    }
    spark.stop()
  }
}
