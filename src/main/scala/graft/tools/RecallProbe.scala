package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Diagnostic: IVF recall@10 vs nprobe at each scale factor; informs
  * the q58 parameter choice and the OpsSpec floor. Also compares the
  * three centroid seedings ("lowest-id" oracle mode, "kmpp" D^2
  * sampling on a driver-capped hash-sample, "kpar" full-corpus
  * k-means‖): on the UNSTRUCTURED synthetic embeddings they are a
  * statistical wash (no cluster structure for a seeding to find), so
  * the probe adds a CLUSTERED corpus — 16 direction-clusters whose
  * ids are sorted by cluster, the adversarial case where lowest-id
  * spends all its seeds inside one cluster — to measure the regime
  * seeding exists for.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]").appName("recall").getOrCreate()
    runClustered(spark)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val n = emb.count()
      // both seedings at the same Lloyd budget: "lowest-id" is the
      // oracle-pinned mode, "kmpp" the production farthest-first init
      for (init <- Seq("lowest-id", "kmpp", "kpar")) {
        val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding",
          k = 16, iters = 2, sampleMod = 4, init = init)
        for (nprobe <- Seq(4, 6, 8, 10)) {
          val probes = (0 until 20).map(i => (i * 17L + 3L) % 400L)
          val recalls = probes.map { probe =>
            val q = emb.filter(col("vec_id") === probe).select(col("embedding"))
              .head().getSeq[Float](0).toArray.map(_.toDouble)
            val ivf = Similarity.topKCosineIvf(emb, "vec_id", "embedding", q, 10,
              centroids, nprobe).collect().map(_.getLong(0)).toSet
            val bf = Similarity.topKCosine(emb, "vec_id", "embedding",
              typedLit(q.toSeq), 10).collect().map(_.getLong(0)).toSet
            (bf intersect ivf).size
          }
          println(s"RECALL $sf n=$n init=$init nprobe=$nprobe" +
            s" sum=${recalls.sum}/${recalls.size * 10}")
        }
      }
    }
    spark.stop()
  }

  private def runClustered(spark: SparkSession): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dims = 32
    // 16 clusters x 200 vectors, ids ordered BY CLUSTER: lowest-id
    // seeding puts all 16 seeds in cluster 0
    val vecs = (0 until 3200).map { i =>
      val c = i / 200
      val v = Array.tabulate(dims)(_ => (rnd.nextGaussian() * 0.15).toFloat)
      v(c % dims) = (1.0 + rnd.nextGaussian() * 0.05).toFloat
      v((c + 7) % dims) += (if (c < 16) 0.5f else 0f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding").cache()
    vecs.count()
    for (init <- Seq("lowest-id", "kmpp", "kpar"); iters <- Seq(0, 1, 2)) {
      val centroids = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
        k = 16, iters = iters, init = init)
      for (nprobe <- Seq(2, 4)) {
        val probes = (0 until 20).map(i => (i * 161L + 13L) % 3200L)
        val recalls = probes.map { probe =>
          val q = vecs.filter(col("vec_id") === probe).select(col("embedding"))
            .head().getSeq[Float](0).toArray.map(_.toDouble)
          val ivf = Similarity.topKCosineIvf(vecs, "vec_id", "embedding", q, 10,
            centroids, nprobe).collect().map(_.getLong(0)).toSet
          val bf = Similarity.topKCosine(vecs, "vec_id", "embedding",
            typedLit(q.toSeq), 10).collect().map(_.getLong(0)).toSet
          (bf intersect ivf).size
        }
        println(s"RECALL clustered n=3200 init=$init iters=$iters nprobe=$nprobe" +
          s" sum=${recalls.sum}/${recalls.size * 10}")
      }
      // recall alone can hide a bad seeding: if all seeds land in one
      // cluster, one cell holds most of the corpus and probing it is
      // a near-full scan. Report the balance (largest-cell share) and
      // the mean rows scanned at nprobe=2 — the cost axis of the
      // recall/cost trade that seeding actually controls.
      val cellSizes = Similarity.assignClusters(vecs, "embedding", centroids)
        .groupBy(col("_cluster")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val probes = (0 until 20).map(i => (i * 161L + 13L) % 3200L)
      val scanned = probes.map { probe =>
        val q = vecs.filter(col("vec_id") === probe).select(col("embedding"))
          .head().getSeq[Float](0).toArray.map(_.toDouble)
        centroids.map { case (c, w) => c -> cos(q, w) }
          .sortBy { case (c, s) => (-s, c) }.take(2)
          .map { case (c, _) => cellSizes.getOrElse(c, 0L) }.sum
      }
      println(s"BALANCE clustered init=$init iters=$iters" +
        s" largest_cell=${cellSizes.values.max} of 3200" +
        s" mean_scanned_at_nprobe2=${scanned.sum / scanned.size}")
    }
    vecs.unpersist()
  }
}
