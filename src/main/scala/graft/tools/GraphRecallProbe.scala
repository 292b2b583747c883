package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Measure the GRAPH serving tier's recall@10 against the `--tier
  * exact` ground truth (q279's contract: exact == brute force by
  * construction), per probe, across beam/hops/nprobe settings — the
  * ladder row RECALL.md's round-13 section records. Uses the same
  * graph parameters as q284 (deg 3, 12 planes x 2 bands) over the
  * sf0.01 embeddings.
  *
  * Output: one `[graphrecall] {json}` line per (config, summary).
  *
  * Usage: sbt "runMain graft.tools.GraphRecallProbe"
  */
object GraphRecallProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val emb = s"$base/embeddings.parquet"
    val tmp = Files.createTempDirectory("graphrecall").toString
    val idx = s"$tmp/idx"
    // SPARK_GRAFT_GRAPH_DEG/_PLANES measure how the CONNECTIVITY
    // ceiling moves with graph density (RECALL.md's claim that the
    // walk's recall is bounded by the graph, not the walk)
    val deg = sys.env.getOrElse("SPARK_GRAFT_GRAPH_DEG", "3")
    val planes = sys.env.getOrElse("SPARK_GRAFT_GRAPH_PLANES", "12")

    // STALENESS mode (round 14): price the graph's model-class
    // contract — vectors ingested AFTER the last graph build reach
    // the walk only as probed-cell seeds, never through hops, until
    // a rebuild or `--append`. Measures recall@10 vs exact as 1/8,
    // 1/4, 1/2 of the corpus arrives post-build, then proves
    // `graph --append` restores the full-build recall at
    // wave-proportional cost (append == rebuild, q294's identity).
    if (sys.env.get("SPARK_GRAFT_GRAPH_STALENESS").contains("1")) {
      import org.apache.spark.sql.functions._
      IndexCorpus.build(spark, Array(emb, idx, "--ivf-k", "8"))
      def ids2(args: Array[String]): Set[Long] =
        IndexCorpus.search(spark, args).collect().map(_.getLong(0)).toSet
      val probes2 = (0L until 20L).toSeq
      val exact2 = probes2.map { p =>
        p -> ids2(Array(idx, emb, p.toString, "--k", "10", "--nprobe", "2",
          "--tier", "exact"))
      }.toMap
      def recall(): Double = probes2.map { p =>
        (ids2(Array(idx, emb, p.toString, "--k", "10", "--nprobe", "1",
          "--tier", "graph", "--beam", "32", "--hops", "3"))
          intersect exact2(p)).size
      }.sum / 20.0
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tFull) = timed {
        IndexCorpus.graph(spark, Array(idx, emb, "--deg", deg,
          "--planes", planes, "--bands", "2"))
      }
      graft.Scratch.release()
      println(s"""[graphstale] {"deg":$deg,"planes":$planes,""" +
        s""""post_build_share":0.0,"mean_recall_at_10":${recall()},""" +
        f""""build_sec":$tFull%.2f}""")
      for (frac <- Seq(8, 4, 2)) {
        spark.read.parquet(emb)
          .filter(pmod(col("vec_id"), lit(frac.toLong)) =!= 0)
          .write.mode("overwrite").parquet(s"$tmp/sub$frac.parquet")
        IndexCorpus.graph(spark, Array(idx, s"$tmp/sub$frac.parquet",
          "--deg", deg, "--planes", planes, "--bands", "2"))
        graft.Scratch.release()
        println(s"""[graphstale] {"deg":$deg,"planes":$planes,""" +
          s""""post_build_share":${1.0 / frac},""" +
          s""""mean_recall_at_10":${recall()}}""")
      }
      // append from the most-stale state (1/2 post-build): recall
      // must return to the full-build row, at wave cost
      val (_, tApp) = timed {
        IndexCorpus.graph(spark, Array(idx, emb, "--append", "true"))
      }
      graft.Scratch.release()
      println(s"""[graphstale] {"deg":$deg,"planes":$planes,""" +
        s""""post_build_share":0.5,"appended":true,""" +
        s""""mean_recall_at_10":${recall()},""" +
        f""""append_sec":$tApp%.2f,"full_rebuild_sec":$tFull%.2f}""")
      spark.stop()
      return
    }

    // FILTERED-walk recall (round 14): the stratum predicate confines
    // the traversal to the stratum SUBGRAPH (q289's admission
    // contract), so recall vs a stratum brute force is bounded by the
    // subgraph's connectivity — which thins as selectivity rises.
    // This card prices that, per selectivity, against exact stratum
    // ground truth (brute-force cosine among members).
    if (sys.env.get("SPARK_GRAFT_GRAPH_FILTERED").contains("1")) {
      import org.apache.spark.sql.functions._
      IndexCorpus.build(spark, Array(emb, idx, "--ivf-k", "8"))
      IndexCorpus.graph(spark, Array(idx, emb, "--deg", deg,
        "--planes", planes, "--bands", "2"))
      val probesF = (0L until 20L).toSeq
      val vecs = spark.read.parquet(emb)
        .filter(size(col("embedding")) === 64)
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      def bruteTop10(p: Long, sel: Long): Set[Long] = {
        val a = vecs(p)
        vecs.toSeq.collect { case (id, b) if id != p && id % sel == 0 =>
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          (id, d / (math.sqrt(na) * math.sqrt(nb)))
        }.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      }
      for (sel <- Seq(1L, 2L, 4L, 8L)) {
        val hits = probesF.map { p =>
          val got = IndexCorpus.search(spark, Array(idx, emb,
            p.toString, "--k", "10", "--nprobe", "1", "--tier", "graph",
            "--beam", "32", "--hops", "3",
            "--filter", s"id % $sel = 0"))
            .collect().map(_.getLong(0)).toSet
          (got intersect bruteTop10(p, sel)).size
        }
        graft.Scratch.release()
        println(s"""[graphfilter] {"deg":$deg,"planes":$planes,""" +
          s""""selectivity":"1/$sel",""" +
          s""""mean_recall_at_10":${hits.sum / 20.0},""" +
          s""""min":${hits.min},"max":${hits.max}}""")
      }
      spark.stop()
      return
    }

    IndexCorpus.build(spark, Array(emb, idx, "--ivf-k", "8"))
    // "auto" (round 16) omits --planes so the ladder measures the
    // CLI's auto-sized resolution — the matched-occupancy recall
    // spot-check for the deployment rule
    val planeArgs =
      if (planes == "auto") Array.empty[String]
      else Array("--planes", planes)
    IndexCorpus.graph(spark, Array(idx, emb, "--deg", deg,
      "--bands", "2") ++ planeArgs)
    val probes = (0L until 20L).toSeq

    def ids(args: Array[String]): Set[Long] =
      IndexCorpus.search(spark, args).collect().map(_.getLong(0)).toSet
    val exact = probes.map { p =>
      p -> ids(Array(idx, emb, p.toString, "--k", "10", "--nprobe", "2",
        "--tier", "exact"))
    }.toMap

    // report the resolution actually built with (auto persists it)
    val planesUsed = Artifacts.read(spark, idx, "graph_meta")
      .filter(org.apache.spark.sql.functions.col("key") === "planes")
      .head().getLong(1)
    val planesLabel =
      if (planes == "auto") s"""$planesUsed,"planes_mode":"auto""""
      else planes
    for ((beam, hops, nprobe) <- Seq((10, 0, 1), (10, 2, 1), (16, 3, 1),
      (32, 3, 1), (16, 3, 2))) {
      val hits = probes.map { p =>
        val got = ids(Array(idx, emb, p.toString, "--k", "10",
          "--nprobe", nprobe.toString, "--tier", "graph",
          "--beam", beam.toString, "--hops", hops.toString))
        (got intersect exact(p)).size
      }
      graft.Scratch.release()
      println(s"""[graphrecall] {"deg":$deg,"planes":$planesLabel,""" +
        s""""beam":$beam,"hops":$hops,""" +
        s""""nprobe":$nprobe,"mean_recall_at_10":${hits.sum / 20.0},""" +
        s""""min":${hits.min},"max":${hits.max}}""")
    }
    // context row: the IVF-cell-only baseline (what the seeds alone
    // see — the graph's value is everything above this)
    val cellOnly = probes.map { p =>
      val got = ids(Array(idx, emb, p.toString, "--k", "10",
        "--nprobe", "1", "--tier", "graph", "--beam", "10", "--hops", "0"))
      (got intersect exact(p)).size
    }
    println(s"""[graphrecall] {"baseline":"nprobe1-seeds-only",""" +
      s""""mean_recall_at_10":${cellOnly.sum / 20.0}}""")
    spark.stop()
  }
}
