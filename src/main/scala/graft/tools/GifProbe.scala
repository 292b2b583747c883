package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Multimodal

/** Stage isolation for the GIF encode/decode chain at replication
  * factor k: encode-only, encode+decode — with GC deltas — under
  * several replication shapes (ScaleProbe's k-way cached union, a
  * pruned range, a partition-parallel broadcast crossJoin). The
  * bisection knobs exist because this probe root-caused two
  * measurement traps recorded in SCALING.md round 10:
  * wide-union repeated plan-analysis tax, and the first-big-run
  * GC/allocator ergonomics ramp (SPARK_GRAFT_NOUNION toggles the
  * allocation-heavy union build that accidentally absorbed the
  * ramp; SPARK_GRAFT_WARM/SPARK_GRAFT_SETTLE/SPARK_DRIVER_XMS test
  * the JIT-pollution, compile-queue, and heap-commit hypotheses
  * that the data REFUTED).
  * Usage: SPARK_GRAFT_K=32 sbt "runMain graft.tools.GifProbe"
  */
object GifProbe {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "32").toInt
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
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    println(s"[gifprobe] base docs n=$n, k=$k")
    def t(label: String)(body: => Unit): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime()
      body
      println(f"[gifprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s gc=${gcMs - g0} ms")
    }
    // shape A: ScaleProbe's k-way cached union (SPARK_GRAFT_NOUNION=1
    // skips the build AND the union variants, isolating whether the
    // cache build perturbs later timings)
    val noUnion = sys.env.get("SPARK_GRAFT_NOUNION").contains("1")
    lazy val union = {
      val u = (0 until k).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _).cache()
      u.count()
      u
    }
    // shape B: partition-parallel broadcast crossJoin, no cache
    val cross = spark.range(k.toLong).select(col("id").as("_rep"))
      .crossJoin(broadcast(base.select(col("doc_id"))))
      .withColumn("doc_id", col("doc_id") + col("_rep") * lit(n))
      .drop("_rep")
    // JIT warm-up — size configurable to probe profile-pollution
    // effects (SPARK_GRAFT_WARM=full mimics ScaleProbe's x1 pass)
    val warm =
      if (sys.env.get("SPARK_GRAFT_WARM").contains("full"))
        spark.range(n).select(col("id").as("doc_id"))
      else base.limit(64).select(col("doc_id"))
    Multimodal.decodeFrames(Multimodal.synthesizeVideos(
      warm, "doc_id"), "id", "payload")
      .groupBy(col("sum_gray"), col("frame_checksum"))
      .agg(count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= 2)
      .queryExecution.toRdd.foreach(_ => ())
    // optional post-warm-up settle (SPARK_GRAFT_SETTLE=30 seconds):
    // lets the C2 compile queue drain before timing starts, to test
    // whether "slow first big run" is JIT-queue competition
    sys.env.get("SPARK_GRAFT_SETTLE").map(_.toInt).foreach { s =>
      println(s"[gifprobe] settling ${s}s for the JIT queue")
      Thread.sleep(s * 1000L)
    }
    if (!noUnion) t("union_encode_only") {
      Multimodal.synthesizeVideos(union, "doc_id")
        .select(sum(length(col("payload"))))
        .queryExecution.toRdd.foreach(_ => ())
    }
    if (!noUnion) t("union_encode_decode") {
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        union, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ())
    }
    if (!noUnion) t("union_uncached_decode") {
      val u = (0 until k).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ unionByName _)
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        u, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ())
    }
    if (!noUnion) t("union_pruned_cached_decode") {
      val u = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * n)).as("doc_id")))
        .reduce(_ unionByName _).cache()
      u.count()
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        u, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ())
      u.unpersist()
    }
    if (!noUnion) t("union_preselect_decode") {
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        union.select(col("doc_id")), "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ())
    }
    if (!noUnion) println("[gifprobe] PLAN of wide-union decode chain:\n" +
      Multimodal.synthesizeVideos(union, "doc_id")
        .queryExecution.executedPlan.toString.take(3000))
    t("range_encode_decode") {
      val ids = spark.range(n * k).select(col("id").as("doc_id"))
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        ids, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= 2)
        .queryExecution.toRdd.foreach(_ => ())
    }
    t("range_encode_decode_again") {
      val ids = spark.range(n * k).select(col("id").as("doc_id"))
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        ids, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1)).as("n_frames"))
        .filter(col("n_frames") >= 2)
        .queryExecution.toRdd.foreach(_ => ())
    }
    t("cross_encode_only") {
      Multimodal.synthesizeVideos(cross, "doc_id")
        .select(sum(length(col("payload"))))
        .queryExecution.toRdd.foreach(_ => ())
    }
    t("cross_encode_decode") {
      Multimodal.decodeFrames(Multimodal.synthesizeVideos(
        cross, "doc_id"), "id", "payload")
        .groupBy(col("sum_gray"), col("frame_checksum"))
        .agg(count(lit(1))).queryExecution.toRdd.foreach(_ => ())
    }
    if (!noUnion) union.unpersist()
    spark.stop()
  }
}
