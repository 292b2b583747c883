package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.SemDedup

/** Stage-level timing of one Lloyd fit at a replication factor k:
  * cache build / seed collect / per-round assignment+update. Usage:
  *   SPARK_GRAFT_K=1024 sbt "runMain graft.tools.SemProbe"
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "512").toInt
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    sys.env.get("SPARK_GRAFT_BATCH").foreach(b =>
      spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", b))
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embN = embBase.count()
    val emb = embBase.crossJoin(
        broadcast(spark.range(k).select(col("id").as("_rep"))))
      .withColumn("vec_id", col("vec_id") + col("_rep") * lit(embN))
      .drop("_rep")
      .repartition(32).cache()
    emb.count()
    def t[A](label: String)(body: => A): A = {
      val g0 = gcMs; val t0 = System.nanoTime()
      val r = body
      println(f"[semprobe] $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s  gc=${gcMs - g0} ms")
      r
    }
    // warm-up round at k-slice 1/8 of corpus to JIT everything
    SemDedup.fixedPointCentroids(
      emb.filter(pmod(col("vec_id"), lit(8L)) === 0), "vec_id", "embedding",
      k = 8, dims = 64, iters = 1)
    graft.Scratch.release()
    if (sys.env.get("SPARK_GRAFT_SKIP").isEmpty) t("scan_only") { // HOF transform scan, no cache write
      emb.filter(size(col("embedding")) === 64)
        .select(col("vec_id").cast("long").as("id"),
          SemDedup.microsVec(col("embedding")).as("mv"))
        .queryExecution.toRdd.foreach(_ => ())
    }
    if (sys.env.get("SPARK_GRAFT_SKIP").isEmpty) t("cache_raw") { // cache the float arrays untransformed
      val c = emb.filter(size(col("embedding")) === 64)
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").as("mv")).cache()
      c.count()
      c.unpersist()
    }
    val base = t("cache_build") {
      val b = graft.Scratch.cache(emb.filter(size(col("embedding")) === 64)
        .select(col("vec_id").cast("long").as("id"),
          SemDedup.microsVec(col("embedding")).as("mv")))
      b.count()
      b
    }
    val cents0 = t("seed_collect") {
      base.orderBy(col("id")).limit(8).select(col("mv")).collect()
        .map(_.getSeq[Long](0).toArray)
    }
    var cents = cents0
    for (r <- 1 to 2) {
      val sums = t(s"round_$r") {
        base.select(graft.ops.VectorExpressions
            .nearestCentroid(col("mv"), cents).cast("int").as("cluster"),
            posexplode(col("mv")).as(Seq("i", "m")))
          .groupBy(col("cluster"), col("i"))
          .agg(sum(col("m")).as("s"), count(lit(1)).as("n"))
          .collect()
      }
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j).map { rows =>
          val v = new Array[Long](64)
          rows.foreach(x => v(x.getInt(1)) = x.getLong(2) / x.getLong(3))
          v
        }.getOrElse(old)
      }
      // assignment-only timing (no explode) to split the two costs
      t(s"assign_only_$r") {
        base.select(graft.ops.VectorExpressions
            .nearestCentroid(col("mv"), cents).cast("int").as("cluster"))
          .groupBy(col("cluster")).count().collect()
      }
    }
    spark.stop()
  }
}
