package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Diagnostic: IVF recall@10 vs nprobe at each scale factor; informs
  * the q58 parameter choice and the OpsSpec floor.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]").appName("recall").getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val n = emb.count()
      val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        k = 16, iters = 2, sampleMod = 4)
      for (nprobe <- Seq(4, 6, 8, 10)) {
        val recalls = Seq(0L, 7L, 13L, 29L, 42L).map { probe =>
          val q = emb.filter(col("vec_id") === probe).select(col("embedding"))
            .head().getSeq[Float](0).toArray.map(_.toDouble)
          val ivf = Similarity.topKCosineIvf(emb, "vec_id", "embedding", q, 10,
            centroids, nprobe).collect().map(_.getLong(0)).toSet
          val bf = Similarity.topKCosine(emb, "vec_id", "embedding",
            typedLit(q.toSeq), 10).collect().map(_.getLong(0)).toSet
          (bf intersect ivf).size
        }
        println(s"RECALL $sf n=$n nprobe=$nprobe recalls=$recalls")
      }
    }
    spark.stop()
  }
}
