package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TextOps

/** Serve-path scale decade (SCALING.md round 12): replicate the
  * sf0.01 corpus x8/x32/x128 and measure what a QUERY costs against
  * the persisted index artifacts as the corpus grows. Build cost is
  * priced elsewhere (SCALING.md rounds 6-10); this probe prices the
  * READ path, including after `delete` (tombstone anti-join live)
  * and after `compact` (tombstones folded into the files).
  *
  * Lexical replication gives replicas SUFFIXED tokens, so the
  * vocabulary grows with the corpus while each searched term's
  * posting list stays constant-size — exactly the regime where
  * "search touches only the searched lists" must show a FLAT curve
  * (the literal `t IN (...)` scan predicate prunes row groups by
  * min/max + dictionary), and a full-scan plan shows a linear one.
  *
  * Vector replication keeps the geometry (duplicate vectors, fresh
  * ids) and probes TWO router configurations per scale: FIXED cell
  * count (probed-cell size grows linearly — the anti-pattern) vs
  * router SCALED with the corpus (constant cell size — the
  * production setting). The gap between those two curves is the
  * probed-cell-volume attribution; what remains in the scaled curve
  * is the corpus-linear artifact scan (assignments filter is pushed;
  * sq8_codes pays a semi-join pass).
  *
  * Output: one `[serveprobe] {json}` line per measurement; searches
  * report the MIN of three runs (serve latency, not warm-up).
  *
  * Usage:
  *   sbt "runMain graft.tools.ServeProbe"            # x8,x32,x128
  *   SPARK_GRAFT_SCALES=8,32 sbt "runMain ..."       # custom decade
  */
object ServeProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "8,32,128")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def emit(probe: String, scale: Int, sec: Double, extra: String = ""): Unit =
      println(f"""[serveprobe] {"probe":"$probe","scale":$scale,"sec":$sec%.3f$extra}""")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ => val (_, s) = time(body); graft.Scratch.release(); s }.min

    val skips = sys.env.getOrElse("SPARK_GRAFT_SERVE_SKIP", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    for (scale <- scales) {
      val tmp = Files.createTempDirectory(s"serveprobe_x$scale").toString
      val reps = broadcast(spark.range(scale).select(col("id").as("_r")))

      if (skips.contains("lex")) {
        println(s"[serveprobe] skipping lexical probes at x$scale")
      } else {
      // ---------- lexical: replica-suffixed tokens ----------
      spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id"), col("text"))
        .crossJoin(reps)
        .select(
          (col("doc_id") + col("_r") * lit(1000000L)).as("doc_id"),
          array_join(transform(TextOps.tokens(col("text")),
            t => concat(t, lit("_"), col("_r"))), " ").as("text"))
        .write.parquet(s"$tmp/docs.parquet")
      val (_, tBuild) = time {
        LexIndex.build(spark, Array(s"$tmp/docs.parquet", s"$tmp/lex",
          "--gram", "2"))
      }
      emit("lex_build", scale, tBuild)
      // the query: replica-0 doc 0's first five (suffixed) tokens —
      // its posting lists are the SAME SIZE at every scale
      val q0 = spark.read.parquet(s"$base/documents.parquet")
        .filter(col("doc_id") === 0)
        .select(concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 5)))
        .head().getString(0)
        .split(' ').map(_ + "_0").mkString(" ")
      emit("lex_search", scale, minOf3 {
        LexIndex.search(spark, Array(s"$tmp/lex", q0, "--k", "10")).collect()
      })
      // DIVERGENCE CONTROL (round 13): the same query scored through
      // a JOIN-form scan — the terms meet a FULL postings scan as a
      // broadcast join instead of inlining as literal predicates, so
      // neither PartitionFilters nor PushedFilters restrict the scan.
      // The gap between this row and lex_search is what the pushdown
      // saves, measured; it must GROW with the corpus while
      // lex_search stays flat.
      emit("lex_search_fullscan", scale, minOf3 {
        import spark.implicits._
        val stats = Artifacts.read(spark, s"$tmp/lex", "stats").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val (n, avgdl, gram) = (stats("n"), stats("avgdl"),
          stats("gram").toInt)
        val terms = Seq(q0).toDF("text")
          .select(explode(array_distinct(TextOps.ngrams(col("text"), gram)))
            .as("t"))
        val qPost = Artifacts.read(spark, s"$tmp/lex", "postings")
          .join(broadcast(terms), Seq("t"))
        val dfq = broadcast(qPost.groupBy(col("t"))
          .agg(count(lit(1)).as("df"))
          .withColumn("idf",
            (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
          .filter(col("idf") > 0).select(col("t"), col("idf")))
        qPost.join(dfq, Seq("t"))
          .withColumn("term", expr(
            s"idf * 22000 * tf * $avgdl DIV " +
              s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
          .groupBy(col("id")).agg(sum(col("term")).as("score"))
          .orderBy(col("score").desc, col("id")).limit(10).collect()
      })
      // BATCH amortization (round 13): 256 queries in ONE
      // searchBatch pass vs 256 single-probe jobs — the marginal
      // per-query cost is the row to read (the single-probe path
      // pays the ~second per-job floor each time)
      val nBatchQ = 256
      spark.read.parquet(s"$base/documents.parquet")
        .crossJoin(reps)
        .filter(col("doc_id") * scale + col("_r") < nBatchQ)
        .select((col("doc_id") + col("_r") * lit(1000000L)).as("query_id"),
          array_join(transform(
            slice(TextOps.tokens(col("text")), 1, 5),
            t => concat(t, lit("_"), col("_r"))), " ").as("text"))
        .write.mode("overwrite").parquet(s"$tmp/queries.parquet")
      val nq = spark.read.parquet(s"$tmp/queries.parquet").count()
      emit("lex_search_batch", scale, minOf3 {
        LexIndex.searchBatch(spark, Array(s"$tmp/lex",
          s"$tmp/queries.parquet", "--k", "10")).collect()
      }, s""","n_queries":$nq""")
      // retract 1/8 of every replica, then price the read path with
      // live tombstones and again after compaction
      spark.read.parquet(s"$tmp/docs.parquet")
        .filter(pmod(col("doc_id"), lit(8L)) === 3)
        .select(col("doc_id"))
        .write.parquet(s"$tmp/del.parquet")
      val (_, tDel) = time {
        LexIndex.delete(spark, Array(s"$tmp/lex", s"$tmp/del.parquet"))
      }
      emit("lex_delete", scale, tDel)
      emit("lex_search_post_delete", scale, minOf3 {
        LexIndex.search(spark, Array(s"$tmp/lex", q0, "--k", "10")).collect()
      })
      val (_, tCmp) = time { LexIndex.compact(spark, Array(s"$tmp/lex")) }
      emit("lex_compact", scale, tCmp)
      emit("lex_search_post_compact", scale, minOf3 {
        LexIndex.search(spark, Array(s"$tmp/lex", q0, "--k", "10")).collect()
      })
      // INCREMENTAL compact (round 13): ingest a SMALL batch (its
      // postings land in their own segment), delete half of it, and
      // compact with a threshold — only the dirty segment rewrites,
      // so the cost must track the batch size, not the index size
      // (compare with the full-rewrite lex_compact row above).
      spark.read.parquet(s"$tmp/docs.parquet")
        .select((col("doc_id") + lit(500000L)).as("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(64L)) === 0)
        .write.mode("overwrite").parquet(s"$tmp/extra.parquet")
      LexIndex.update(spark, Array(s"$tmp/lex", s"$tmp/extra.parquet"))
      spark.read.parquet(s"$tmp/extra.parquet")
        .filter(pmod(col("doc_id"), lit(128L)) === 0)
        .select(col("doc_id"))
        .write.mode("overwrite").parquet(s"$tmp/del2.parquet")
      LexIndex.delete(spark, Array(s"$tmp/lex", s"$tmp/del2.parquet"))
      val (_, tIncCmp) = time {
        LexIndex.compact(spark, Array(s"$tmp/lex", "--threshold", "250"))
      }
      emit("lex_compact_incremental", scale, tIncCmp)
      }

      if (skips.contains("vec")) {
        graft.Scratch.release()
        // the scaled-router build is k*n Lloyd work — x512+ lexical
        // rungs skip the vector half (SPARK_GRAFT_SERVE_SKIP=vec)
        println(s"[serveprobe] skipping vector probes at x$scale")
      } else {

      // ---------- vector: fixed vs scaled router ----------
      val embN = spark.read.parquet(s"$base/embeddings.parquet").count()
      spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .crossJoin(reps)
        .select((col("vec_id") + col("_r") * lit(embN)).as("vec_id"),
          col("embedding"))
        .write.parquet(s"$tmp/emb.parquet")
      // SPARK_GRAFT_SERVE_IVFK overrides the scaled router size (the
      // x512/x2048 rungs want k ~ sqrt(n): k*n Lloyd work at k = 8*x
      // is quadratic in the replica count and unpayable at 8M rows);
      // SPARK_GRAFT_SERVE_SKIP=fixed drops the fixed-router control
      // arm at those rungs
      val scaledK = sys.env.get("SPARK_GRAFT_SERVE_IVFK")
        .map(_.toInt).getOrElse(8 * scale)
      val routerArms =
        if (skips.contains("fixed")) Seq(("scaled", scaledK))
        else Seq(("fixed", 8), ("scaled", scaledK))
      for ((mode, ivfK) <- routerArms) {
        val idx = s"$tmp/vec_$mode"
        val (_, tB) = time {
          IndexCorpus.build(spark, Array(s"$tmp/emb.parquet", idx,
            "--ivf-k", ivfK.toString, "--pq-m", "2", "--pq-k", "4",
            "--iters", "1", "--sq8", "true"))
        }
        emit(s"vec_build_$mode", scale, tB, s""","ivf_k":$ivfK""")
        emit(s"vec_search_$mode", scale, minOf3 {
          IndexCorpus.search(spark, Array(idx, s"$tmp/emb.parquet", "7",
            "--k", "10", "--nprobe", "2", "--tier", "sq8")).collect()
        }, s""","ivf_k":$ivfK""")
      }
      // DIVERGENCE CONTROL (round 14): the same probe ADC-scored over
      // EVERY sq8 code row — no cb PartitionFilter, no cell row-group
      // pruning. The gap vs vec_search_scaled is what the pushed
      // probed-cell restriction saves; it must GROW with the corpus
      // while the pushed row stays governed by cell size.
      emit("vec_search_fullscan", scale, minOf3 {
        val idx = s"$tmp/vec_scaled"
        val dims = 64
        val rng = Artifacts.read(spark, idx, "sq8_ranges").collect()
        val lo = new Array[Long](dims); val wd = new Array[Long](dims)
        rng.foreach { r =>
          val i = r.getAs[Long]("i").toInt
          lo(i) = r.getAs[Long]("lo"); wd(i) = r.getAs[Long]("wd")
        }
        val pv = spark.read.parquet(s"$tmp/emb.parquet")
          .filter(col("vec_id") === 7 && size(col("embedding")) === dims)
          .select(graft.ops.SemDedup.microsVec(col("embedding")))
          .head().getSeq[Long](0)
        Artifacts.read(spark, idx, "sq8_codes")
          .filter(col("id") =!= 7L)
          .select(col("id"), graft.ops.VectorExpressions.sqDist(
            graft.ops.VectorExpressions.sq8UnpackDequant(
              col("codes"), lo, wd),
            typedLit(pv)).as("adc"))
          .orderBy(col("adc"), col("id")).limit(10).collect()
      })
      // post-delete / post-compact vector search on the scaled router
      spark.read.parquet(s"$tmp/emb.parquet")
        .filter(pmod(col("vec_id"), lit(8L)) === 3)
        .select(col("vec_id"))
        .write.parquet(s"$tmp/vdel.parquet")
      val (_, tVDel) = time {
        IndexCorpus.delete(spark, Array(s"$tmp/vec_scaled", s"$tmp/vdel.parquet"))
      }
      emit("vec_delete", scale, tVDel)
      emit("vec_search_post_delete", scale, minOf3 {
        IndexCorpus.search(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", "7", "--k", "10", "--nprobe", "2",
          "--tier", "sq8")).collect()
      })
      val (_, tVCmp) = time {
        IndexCorpus.compact(spark, Array(s"$tmp/vec_scaled"))
      }
      emit("vec_compact", scale, tVCmp)
      emit("vec_search_post_compact", scale, minOf3 {
        IndexCorpus.search(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", "7", "--k", "10", "--nprobe", "2",
          "--tier", "sq8")).collect()
      })
      // BATCH amortization, vector arm (round 13): 64 probes through
      // ONE searchBatch routing+scoring pass vs 64 per-probe jobs
      spark.read.parquet(s"$tmp/emb.parquet")
        .filter(col("vec_id") < 64).select(col("vec_id"))
        .write.mode("overwrite").parquet(s"$tmp/probes.parquet")
      emit("vec_search_batch", scale, minOf3 {
        IndexCorpus.searchBatch(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", s"$tmp/probes.parquet",
          "--k", "10", "--nprobe", "2", "--tier", "sq8")).collect()
      }, s""","n_probes":64""")
      // GRAPH tier (round 13): construction is offline like the
      // router; the walks price the read path — per-hop pushed
      // lookups (single) vs per-hop joins amortized over the frame
      // (batch)
      if (skips.contains("graph")) {
        println(s"[serveprobe] skipping graph probes at x$scale")
        graft.Scratch.release()
      } else {
      // SPARK_GRAFT_SERVE_CHUNK > 0 turns on the skew-parallel grid
      // split of the LSH self-joins (--chunk-rows): same edge set
      // (q299's oracle equivalence), but the replica construction's
      // hot buckets stop single-threading the build tail.
      // SPARK_GRAFT_SERVE_PLANES overrides the LSH resolution — the
      // knob that actually bounds the build at scale: candidate
      // volume is ~n^2 / 2^(planes/bands) per table, so planes must
      // grow with log2(n) to keep per-bucket occupancy (and with it
      // the exact-verify volume) constant as the corpus scales —
      // measured round 15: at x512 the chunk split moved only the
      // ~80 s tail (the volume dominated); +6 planes cut the volume
      // ~8x
      val chunk = sys.env.getOrElse("SPARK_GRAFT_SERVE_CHUNK", "0")
      // "auto" (round 16) omits --planes entirely so the rung measures
      // the CLI's AUTO-SIZED resolution (IndexCorpus.autoPlanes) — the
      // deployment-rule-in-code evidence run; any other value pins it
      val gPlanesEnv = sys.env.getOrElse("SPARK_GRAFT_SERVE_PLANES", "14")
      val planeArgs =
        if (gPlanesEnv == "auto") Array.empty[String]
        else Array("--planes", gPlanesEnv)
      val (_, tG) = time {
        IndexCorpus.graph(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", "--deg", "3",
          "--bands", "2", "--chunk-rows", chunk) ++ planeArgs)
      }
      // report the resolution actually used (auto persists it too)
      val gPlanes = Artifacts.read(spark, s"$tmp/vec_scaled", "graph_meta")
        .filter(col("key") === "planes").head().getLong(1)
      emit("vec_graph_build", scale, tG,
        s""","planes":$gPlanes,"planes_mode":"$gPlanesEnv"""")
      emit("vec_search_graph", scale, minOf3 {
        IndexCorpus.search(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", "7", "--k", "10", "--nprobe", "1",
          "--tier", "graph", "--beam", "16", "--hops", "2")).collect()
      })
      emit("vec_search_graph_batch", scale, minOf3 {
        IndexCorpus.searchBatch(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb.parquet", s"$tmp/probes.parquet",
          "--k", "10", "--nprobe", "1", "--tier", "graph",
          "--beam", "16", "--hops", "2")).collect()
      }, s""","n_probes":64""")
      // GRAPH APPEND (round 14): ingest a 1/8 wave of fresh vectors,
      // fold them into the graph with --append — cost must track the
      // WAVE (new-vs-all blocking), not the graph (compare with the
      // full vec_graph_build row above)
      val waveN = spark.read.parquet(s"$tmp/emb.parquet")
        .filter(pmod(col("vec_id"), lit(8L)) === 5).count()
      spark.read.parquet(s"$tmp/emb.parquet")
        .filter(pmod(col("vec_id"), lit(8L)) === 5)
        .select((col("vec_id") + lit(embN * scale * 10L)).as("vec_id"),
          col("embedding"))
        .write.mode("overwrite").parquet(s"$tmp/wave.parquet")
      IndexCorpus.update(spark,
        Array(s"$tmp/vec_scaled", s"$tmp/wave.parquet"))
      spark.read.parquet(s"$tmp/emb.parquet")
        .unionByName(spark.read.parquet(s"$tmp/wave.parquet"))
        .write.mode("overwrite").parquet(s"$tmp/emb_plus.parquet")
      val (_, tGA) = time {
        IndexCorpus.graph(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb_plus.parquet", "--append", "true",
          "--chunk-rows", chunk))
      }
      emit("vec_graph_append", scale, tGA,
        s""","wave":$waveN,"full_build_sec":$tG""")
      emit("vec_search_graph_post_append", scale, minOf3 {
        IndexCorpus.search(spark, Array(s"$tmp/vec_scaled",
          s"$tmp/emb_plus.parquet", "7", "--k", "10", "--nprobe", "1",
          "--tier", "graph", "--beam", "16", "--hops", "2")).collect()
      })
      graft.Scratch.release()
      }
      }
    }
    spark.stop()
  }
}
