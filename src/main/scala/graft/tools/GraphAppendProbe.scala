package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TopKAgg

/** Isolation probe for the `graph --append` candidate-generation
  * stage (round 17): times `Similarity.knnGraphAppendPairs(...).count()`
  * — pair generation + exact verify, WITHOUT the merge-rank that
  * follows it in the CLI — in the shuffle-join shape vs the
  * broadcast-wave shape, at a replicated corpus scale. Used to
  * attribute where the x2048 append wall-clock actually goes before
  * claiming either shape in SCALING.md.
  *
  * Usage:
  *   SPARK_GRAFT_SCALES=512,2048 SPARK_GRAFT_GAPP_MODES=shuffle,bcast \
  *     sbt "runMain graft.tools.GraphAppendProbe"
  */
object GraphAppendProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "512")
      .split(',').map(_.trim.toInt).toSeq
    val modes = sys.env.getOrElse("SPARK_GRAFT_GAPP_MODES", "shuffle,bcast")
      .split(',').map(_.trim).toSeq
    val chunk = sys.env.getOrElse("SPARK_GRAFT_SERVE_CHUNK", "2048").toInt
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    for (scale <- scales) {
      val tmp = Files.createTempDirectory(s"gappprobe_x$scale").toString
      val e0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val embN = e0.count()
      val reps = broadcast(spark.range(scale).select(col("id").as("_r")))
      e0.crossJoin(reps)
        .select((col("vec_id") + col("_r") * lit(embN)).as("vec_id"),
          col("embedding"))
        .write.parquet(s"$tmp/emb.parquet")
      // 1/8 wave re-keyed past the corpus ids, corpus = base + wave
      spark.read.parquet(s"$tmp/emb.parquet")
        .filter(pmod(col("vec_id"), lit(8L)) === 5)
        .select((col("vec_id") + lit(embN * scale * 10L)).as("vec_id"),
          col("embedding"))
        .write.parquet(s"$tmp/wave.parquet")
      spark.read.parquet(s"$tmp/emb.parquet")
        .unionByName(spark.read.parquet(s"$tmp/wave.parquet"))
        .write.parquet(s"$tmp/all.parquet")
      val all = spark.read.parquet(s"$tmp/all.parquet")
      val n = all.count()
      val newIds = spark.read.parquet(s"$tmp/wave.parquet")
        .select(col("vec_id").as("id"))
      val nNew = newIds.count()
      val planes = IndexCorpus.autoPlanes(n, 2)
      val dims = 64
      val allPlanes = graft.ops.Similarity.hyperplanes(planes, dims)
      val per = planes / 2
      val tables = (0 until 2).map(b => allPlanes.slice(b * per, (b + 1) * per))

      for (mode <- modes) {
        var pairs = -1L
        val sec = time {
          pairs = graft.ops.Similarity.knnGraphAppendPairs(
            all, newIds, "vec_id", "embedding", tables, -1.0,
            chunkRows = if (mode == "bcast") Int.MaxValue else chunk,
            broadcastWave = mode == "bcast").count()
        }
        graft.Scratch.release()
        println(f"""[gappprobe] {"scale":$scale,"n":$n,"wave":$nNew,"planes":$planes,"mode":"$mode","pairs":$pairs,"sec":$sec%.3f}""")
      }

      // SPARK_GRAFT_GAPP_STAGES=1: time the append's merge-rank
      // stages in isolation over the real pair volume — the window
      // form (row_number over (cos desc, nbr asc)) vs the k-bounded
      // heap aggregate (topk_by with the sign-flipped fixed-width hex
      // payload, the Quantize ranking idiom) — to attribute the
      // append wall-clock before restructuring the CLI path
      if (sys.env.get("SPARK_GRAFT_GAPP_STAGES").contains("1")) {
        // NO materialization of the pair frame: generation is a ~35 s
        // map-side pass, so re-running it per consumer beats pinning
        // 376M rows in block storage (the materialized form EVICTED
        // under memory pressure in this very probe — a scale hazard,
        // not an optimization)
        def pairsDf = graft.ops.Similarity.knnGraphAppendPairs(
          all, newIds, "vec_id", "embedding", tables, -1.0,
          chunkRows = chunk)
        def mirrored = {
          val p = pairsDf
          p.select(col("id_a").as("id"), col("id_b").as("nbr"), col("cos"))
            .unionByName(p
              .select(col("id_b").as("id"), col("id_a").as("nbr"),
                col("cos")))
            .select(col("id"), col("nbr"),
              round(col("cos") * lit(1000000d)).cast("long").as("cos_x1e6"))
        }
        val tAff = time {
          mirrored.select(col("id")).distinct().count()
        }
        graft.Scratch.release()
        val wDeg = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("cos_x1e6").desc, col("nbr"))
        var nWin = -1L
        val tWin = time {
          nWin = mirrored
            .withColumn("rn", row_number().over(wDeg).cast("long"))
            .filter(col("rn") <= 3).count()
        }
        graft.Scratch.release()
        var nAgg = -1L
        val tAgg = time {
          nAgg = mirrored.groupBy(col("id"))
            .agg(TopKAgg.topKBy(col("cos_x1e6"),
              lpad(hex(col("nbr").bitwiseXOR(lit(Long.MinValue))), 16, "0"),
              3).as("t"))
            .select(col("id"), posexplode(col("t")))
            .count()
        }
        graft.Scratch.release()
        println(f"""[gappprobe] {"scale":$scale,"stages":true,"affected_sec":$tAff%.3f,"window_sec":$tWin%.3f,"window_rows":$nWin,"topk_sec":$tAgg%.3f,"topk_rows":$nAgg}""")
      }

      // SPARK_GRAFT_GAPP_CLI=1: the full CLI chain at this scale —
      // router build (small k: graph cost is independent of router
      // size), graph build (auto planes, grid), wave ingest, then
      // `graph --append` on the configured wave-cap (pass
      // SPARK_GRAFT_GAPP_WAVECAP to force a shape) — the rung numbers
      // SCALING.md's append-vs-build table carries
      if (sys.env.get("SPARK_GRAFT_GAPP_CLI").contains("1")) {
        val idx = s"$tmp/idx"
        IndexCorpus.build(spark, Array(s"$tmp/emb.parquet", idx,
          "--ivf-k", "8", "--pq-m", "2", "--pq-k", "4", "--iters", "1"))
        val tB = time {
          IndexCorpus.graph(spark, Array(idx, s"$tmp/emb.parquet",
            "--deg", "3", "--bands", "2", "--chunk-rows", chunk.toString))
        }
        graft.Scratch.release()
        IndexCorpus.update(spark, Array(idx, s"$tmp/wave.parquet"))
        val cap = sys.env.getOrElse("SPARK_GRAFT_GAPP_WAVECAP", "65536")
        val tA = time {
          IndexCorpus.graph(spark, Array(idx, s"$tmp/all.parquet",
            "--append", "true", "--chunk-rows", chunk.toString,
            "--max-broadcast-wave", cap))
        }
        graft.Scratch.release()
        val gPlanes = Artifacts.read(spark, idx, "graph_meta")
          .filter(col("key") === "planes").head().getLong(1)
        println(f"""[gappprobe] {"scale":$scale,"n":$n,"wave":$nNew,"cli":true,"planes":$gPlanes,"wave_cap":$cap,"build_sec":$tB%.3f,"append_sec":$tA%.3f}""")
      }
    }
    spark.stop()
  }
}
