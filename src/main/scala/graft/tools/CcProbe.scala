package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Dedup

/** Diagnostic: times the dedup-clusters pipeline at sf0.1, to
  * separate machine-load noise from real regressions in the
  * component loop. History: round 3 measured ~2.2 s/round of pure AQE
  * stage-replanning latency on a 255-edge pair graph (vs 0.5-0.9
  * s/round static) — hence the AQE save/restore guard inside
  * [[Dedup.connectedComponents]].
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 3, 4, 4, 1, 2)
      .select(col("id_a"), col("id_b")).cache()
    val np = pairs.count()
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs)
      val nc = comps.select(col("comp")).distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"CC run=$run pairs=$np clusters=$nc time=$dt%.2f s")
    }
    val t0 = System.nanoTime()
    Dedup.dedupClusters(docs, "doc_id", "text", 3, 4, 4, 1, 2)
      .queryExecution.toRdd.foreach(_ => ())
    println(f"CC full dedupClusters ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
