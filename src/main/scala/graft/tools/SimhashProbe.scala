package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Dedup

/** Diagnostic: is the simhash pair scan parallel or straggler-bound?
  * Times the q26 band self-join at different thread counts and prints
  * bucket-population stats for the hottest (band, value) buckets.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    for (threads <- Seq(4, 32)) {
      val spark = SparkSession.builder.master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      GraftSession.tune(spark)
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      // warm
      Dedup.simhashPairs(docs.limit(200), "doc_id", "text", 8)
        .queryExecution.toRdd.foreach(_ => ())
      val t0 = System.nanoTime()
      val n = Dedup.simhashPairs(docs, "doc_id", "text", 8)
        .queryExecution.toRdd.count()
      println(f"[simhash] threads=$threads pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      // x4 corpus (fresh ids, salted text so replicas are near- not
      // exact dups of each other): hot buckets 4x larger -> the
      // triangle split's parallelism should now dominate
      val nd = docs.count()
      val big = (0 until 4).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * nd))
        .withColumn("text", concat(col("text"), lit(" pad" + i))))
        .reduce(_ unionByName _)
      val t1 = System.nanoTime()
      val n4 = Dedup.simhashPairs(big, "doc_id", "text", 8)
        .queryExecution.toRdd.count()
      println(f"[simhash] threads=$threads x4pairs=$n4 time=${(System.nanoTime() - t1) / 1e9}%.2f s")
      // presentation sort cost: orderBy range-samples its child, so an
      // un-checkpointed sort computes the join twice
      val t2 = System.nanoTime()
      Dedup.simhashPairs(docs, "doc_id", "text", 8)
        .orderBy(col("id_a"), col("id_b"))
        .queryExecution.toRdd.foreach(_ => ())
      println(f"[simhash] threads=$threads sort-plain  ${(System.nanoTime() - t2) / 1e9}%.2f s")
      val t3 = System.nanoTime()
      Dedup.simhashPairs(docs, "doc_id", "text", 8)
        .localCheckpoint(false)
        .orderBy(col("id_a"), col("id_b"))
        .queryExecution.toRdd.foreach(_ => ())
      println(f"[simhash] threads=$threads sort-ckpt   ${(System.nanoTime() - t3) / 1e9}%.2f s")
      if (threads == 32) {
        val sigs = docs.select(col("doc_id").as("id"),
          graft.ops.SketchExpressions.simhash60(col("text")).as("sig"))
        val bands = 9
        val widths = Seq.fill(3)(7) ++ Seq.fill(6)(6) // 60 bits, 9 bands, 3 wide
        val los = widths.scanLeft(0)(_ + _).init
        val e = sigs.select((0 until bands).map(b =>
          shiftright(col("sig"), los(b))
            .bitwiseAND(lit((1L << widths(b)) - 1)).as(s"b$b")): _*)
        val hot = (0 until bands).map { b =>
          e.groupBy(col(s"b$b")).count().agg(max("count")).head().getLong(0)
        }
        println(s"[simhash] hottest bucket per band: ${hot.mkString(", ")}")
      }
      spark.stop()
    }
  }
}
