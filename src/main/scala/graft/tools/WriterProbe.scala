package graft.tools

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TextOps

/** Concurrent-writer ingest decade (SCALING.md round 14; round 15
  * adds the VECTOR arm): price what the CAS/rebase commit path BUYS,
  * not just that it is safe. W disjoint ingest waves land in ONE
  * index (lexical BM25, and frozen-model IVF-PQ via
  * IndexCorpus.ingestFrame — different per-command stage structure:
  * centroid/codebook broadcast + assign/encode vs tokenize/aggregate),
  * sequentially vs from W concurrent threads, at growing replication.
  * `SPARK_GRAFT_WPROBE=lex,vec` selects the arms.
  *
  * The mechanism being priced: an ingest command is a CHAIN of
  * driver-coordinated steps (dedup scan, tokenize/aggregate jobs,
  * three segment writes, a stats recount, manifest IO) — at small
  * per-wave volumes most of the wall-clock is the fixed per-command
  * latency between jobs, which concurrent writers OVERLAP; as the
  * per-wave data grows the executor pool saturates and the win must
  * shrink toward 1x. Both ends are measured. Safety is asserted
  * inline: the manifest version chain counts exactly one commit per
  * wave (no lost updates under the live race) and the concurrent
  * index's collection statistics equal the sequential reference's.
  *
  * Output: one `[writerprobe] {json}` line per (scale, writers) cell.
  *
  * Usage:
  *   sbt "runMain graft.tools.WriterProbe"              # x1,x8 / W=2,4
  *   SPARK_GRAFT_SCALES=1,8,32 SPARK_GRAFT_WRITERS=2,4,8 sbt "..."
  *   SPARK_GRAFT_WPROBE=cput sbt "Test/runMain graft.tools.WriterProbe"
  *     # the cput arm needs the TEST classpath: it races commits on
  *     # conditional-mode MockS3FileSystem (a test-sources class,
  *     # referenced here only by name)
  */
object WriterProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,8")
      .split(',').map(_.trim.toInt).toSeq
    val writerCounts = sys.env.getOrElse("SPARK_GRAFT_WRITERS", "2,4")
      .split(',').map(_.trim.toInt).toSeq
    val arms = sys.env.getOrElse("SPARK_GRAFT_WPROBE", "lex,vec")
      .split(',').map(_.trim).toSet
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    import spark.implicits._

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: one throwaway build+ingest so the first measured cell
    // doesn't charge codegen/JIT to the sequential arm (which runs
    // first in every cell)
    locally {
      val wtmp = Files.createTempDirectory("writerprobe_warm").toString
      val d0 = spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id"), col("text"))
      d0.limit(0).write.parquet(s"$wtmp/seed.parquet")
      LexIndex.build(spark, Array(s"$wtmp/seed.parquet", s"$wtmp/lex",
        "--gram", "2"))
      LexIndex.ingestFrame(spark, s"$wtmp/lex", d0.limit(100),
        "doc_id", "text")
      graft.Scratch.release()
    }

    if (arms("lex")) for (scale <- scales) {
      val tmp = Files.createTempDirectory(s"writerprobe_x$scale").toString
      // replica-suffixed corpus (the ServeProbe convention: vocabulary
      // grows with the corpus, every wave is real novel text)
      val reps = broadcast(spark.range(scale).select(col("id").as("_r")))
      spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id"), col("text"))
        .crossJoin(reps)
        .select(
          (col("doc_id") + col("_r") * lit(1000000L)).as("doc_id"),
          array_join(transform(TextOps.tokens(col("text")),
            t => concat(t, lit("_"), col("_r"))), " ").as("text"))
        .write.parquet(s"$tmp/docs.parquet")
      val docs = spark.read.parquet(s"$tmp/docs.parquet")
      val nDocs = docs.count()

      for (w <- writerCounts) {
        val waves = (0 until w).map(i =>
          docs.filter(pmod(col("doc_id"), lit(w.toLong)) === i.toLong))

        def freshIdx(tag: String): String = {
          val idx = s"$tmp/lex_${tag}_$w"
          docs.limit(0).write.parquet(s"$tmp/seed_${tag}_$w.parquet")
          LexIndex.build(spark,
            Array(s"$tmp/seed_${tag}_$w.parquet", idx, "--gram", "2"))
          idx
        }

        val seqIdx = freshIdx("seq")
        val tSeq = time {
          waves.foreach(wv =>
            LexIndex.ingestFrame(spark, seqIdx, wv, "doc_id", "text"))
        }
        graft.Scratch.release()

        val concIdx = freshIdx("conc")
        val pool = Executors.newFixedThreadPool(w)
        val gate = new CountDownLatch(1)
        val futs = waves.map { wv =>
          pool.submit(new Callable[Long] {
            def call(): Long = {
              gate.await()
              LexIndex.ingestFrame(spark, concIdx, wv, "doc_id", "text")
            }
          })
        }
        val tConc = time { gate.countDown(); futs.foreach(_.get()) }
        pool.shutdown()
        graft.Scratch.release()

        // safety, asserted in the measurement itself: one commit per
        // wave landed (empty-build v0 + w ingests), and the concurrent
        // index's collection statistics equal the sequential ones
        val vers = Artifacts.manifestVersions(spark, concIdx).max
        require(vers == w.toLong,
          s"expected v$w after $w concurrent ingests, got v$vers")
        def stats(idx: String) = Artifacts.read(spark, idx, "stats")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val (sSeq, sConc) = (stats(seqIdx), stats(concIdx))
        require(sSeq == sConc,
          s"concurrent stats $sConc diverged from sequential $sSeq")
        require(sSeq("n") == nDocs, s"lost docs: ${sSeq("n")} of $nDocs")

        println(f"""[writerprobe] {"probe":"lex_ingest","scale":$scale,"writers":$w,"docs":$nDocs,"seq_sec":$tSeq%.3f,"conc_sec":$tConc%.3f,"speedup":${tSeq / tConc}%.2f}""")
      }
    }

    // VECTOR arm: the model (router + codebooks) trains ONCE on the
    // base embeddings; the waves are replica-id vectors ingested
    // through the frozen-model path. The ingest chain here is
    // centroid-broadcast assignment + per-subspace PQ encode + three
    // cb-bucketed segment writes — heavier per-row compute and fewer
    // jobs than the lexical tokenize/aggregate chain, so the
    // overlap win profiles differently (that difference is the point
    // of measuring both).
    if (arms("vec")) for (scale <- scales) {
      val tmp = Files.createTempDirectory(s"writerprobe_vec_x$scale").toString
      val base0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      base0.write.parquet(s"$tmp/train.parquet")
      val reps = broadcast(spark.range(scale).select(col("id").as("_r")))
      // replica ids offset past the training ids; vectors reused
      // verbatim (the frozen-model ingest keys novelty on the id)
      spark.read.parquet(s"$tmp/train.parquet")
        .crossJoin(reps)
        .select(
          (col("vec_id") + (col("_r") + 1) * lit(10000000L)).as("vec_id"),
          col("embedding"))
        .write.parquet(s"$tmp/waves.parquet")
      val wavesAll = spark.read.parquet(s"$tmp/waves.parquet")
      val nVecs = wavesAll.count()
      val nTrain = base0.count()

      for (w <- writerCounts) {
        val waves = (0 until w).map(i =>
          wavesAll.filter(pmod(col("vec_id"), lit(w.toLong)) === i.toLong))

        def freshIdx(tag: String): String = {
          val idx = s"$tmp/vec_${tag}_$w"
          IndexCorpus.build(spark, Array(s"$tmp/train.parquet", idx,
            "--ivf-k", "8", "--pq-m", "4", "--pq-k", "16", "--iters", "2"))
          idx
        }

        val seqIdx = freshIdx("seq")
        val tSeq = time {
          waves.foreach(wv =>
            IndexCorpus.ingestFrame(spark, seqIdx, wv, "vec_id", "embedding"))
        }
        graft.Scratch.release()

        val concIdx = freshIdx("conc")
        val pool = Executors.newFixedThreadPool(w)
        val gate = new CountDownLatch(1)
        val futs = waves.map { wv =>
          pool.submit(new Callable[Long] {
            def call(): Long = {
              gate.await()
              IndexCorpus.ingestFrame(spark, concIdx, wv, "vec_id", "embedding")
            }
          })
        }
        val tConc = time { gate.countDown(); futs.foreach(_.get()) }
        pool.shutdown()
        graft.Scratch.release()

        // safety asserted inside the measurement: one commit per wave
        // (build v0 + w ingests), and the concurrent index's
        // membership equals the sequential one's (count + an
        // order-independent (id, cell) checksum — the frozen model
        // makes assignment deterministic)
        val vers = Artifacts.manifestVersions(spark, concIdx).max
        require(vers == w.toLong,
          s"expected v$w after $w concurrent vec ingests, got v$vers")
        def sig(idx: String): (Long, Long) = {
          val r = Artifacts.read(spark, idx, "assignments")
            .agg(count(lit(1)),
              sum(col("id") * lit(31L) + col("cell"))).head()
          (r.getLong(0), r.getLong(1))
        }
        val (sSeq, sConc) = (sig(seqIdx), sig(concIdx))
        require(sSeq == sConc,
          s"concurrent vec membership $sConc diverged from sequential $sSeq")
        require(sSeq._1 == nTrain + nVecs,
          s"lost vectors: ${sSeq._1} of ${nTrain + nVecs}")

        println(f"""[writerprobe] {"probe":"vec_ingest","scale":$scale,"writers":$w,"vecs":$nVecs,"seq_sec":$tSeq%.3f,"conc_sec":$tConc%.3f,"speedup":${tSeq / tConc}%.2f}""")
      }
    }

    // GRAPH arm (round 16): price the q312 regime — the full `graph`
    // build racing live ingest waves on one index. With the
    // metadata-only replace-retry the raced build derives its kNN
    // edges exactly once (asserted via the invocation counter), so
    // running it CONCURRENTLY with the waves should cost about the
    // SLOWER of the two command chains, not their sum — the overlap
    // a re-deriving retry loop would forfeit (each lost race used to
    // re-run the whole derivation). Safety asserted inline: one
    // derivation, all waves present, edges equal the sequential
    // reference's.
    if (arms("graph")) for (scale <- scales) {
      val tmp = Files.createTempDirectory(s"writerprobe_g$scale").toString
      val reps = broadcast(spark.range(scale).select(col("id").as("_r")))
      val e0 = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val embN = e0.count()
      e0.crossJoin(reps)
        .select((col("vec_id") + col("_r") * lit(embN)).as("vec_id"),
          col("embedding"))
        .write.parquet(s"$tmp/emb.parquet")
      val embAll = spark.read.parquet(s"$tmp/emb.parquet")
      val nBase = embAll.count()
      // two ingest waves of re-keyed extras race the build
      val waves = Seq(0L, 1L).map(i => embAll
        .filter(pmod(col("vec_id"), lit(2L)) === i)
        .select((col("vec_id") + lit(100000000L)).as("vec_id"),
          col("embedding")))
      val nWaves = waves.map(_.count()).sum

      def freshIdx(tag: String): String = {
        val idx = s"$tmp/vec_$tag"
        IndexCorpus.build(spark, Array(s"$tmp/emb.parquet", idx,
          "--ivf-k", "8", "--pq-m", "2", "--pq-k", "4", "--iters", "1"))
        idx
      }
      val prevKeep = spark.conf.getOption("spark.graft.keepManifests")
      spark.conf.set("spark.graft.keepManifests", "3") // writers + 1
      try {
        // sequential reference: build the graph, then land the waves
        val seqIdx = freshIdx("gseq")
        val gArgs = Array(s"$tmp/emb.parquet",
          "--deg", "3", "--planes", "12", "--bands", "2")
        val tSeqG = time {
          IndexCorpus.graph(spark, seqIdx +: gArgs)
        }
        val tSeqW = time {
          waves.foreach(wv =>
            IndexCorpus.ingestFrame(spark, seqIdx, wv, "vec_id", "embedding"))
        }
        graft.Scratch.release()

        // raced: the build in one thread, the waves in another
        val rIdx = freshIdx("grace")
        val callsBefore = graft.ops.Similarity.knnGraphCalls.get()
        val pool = Executors.newFixedThreadPool(2)
        val gate = new CountDownLatch(1)
        val ing = pool.submit(new Callable[Long] {
          def call(): Long = {
            gate.await()
            waves.map(wv => IndexCorpus.ingestFrame(spark, rIdx, wv,
              "vec_id", "embedding")).sum
          }
        })
        val gr = pool.submit(new Callable[Unit] {
          def call(): Unit = {
            gate.await()
            IndexCorpus.graph(spark, rIdx +: gArgs)
            ()
          }
        })
        val tRaced = time {
          gate.countDown()
          val ingRes = scala.util.Try(ing.get())
          gr.get()
          require(ingRes.get == nWaves, s"lost wave rows: $ingRes")
        }
        pool.shutdown()
        graft.Scratch.release()
        require(graft.ops.Similarity.knnGraphCalls.get() - callsBefore == 1L,
          "the raced build re-derived its kNN edges")
        def edges(idx: String) = Artifacts.read(spark, idx, "knn_graph")
          .agg(count(lit(1)), sum(col("id") * lit(31L) + col("nbr")))
          .head() match { case r => (r.getLong(0), r.getLong(1)) }
        require(edges(rIdx) == edges(seqIdx),
          s"raced edges ${edges(rIdx)} diverged from ${edges(seqIdx)}")
        require(Artifacts.read(spark, rIdx, "assignments").count()
          == nBase + nWaves, "lost membership under the race")
        println(f"""[writerprobe] {"probe":"graph_build_under_ingest","scale":$scale,"base_vecs":$nBase,"wave_vecs":$nWaves,"seq_graph_sec":$tSeqG%.3f,"seq_waves_sec":$tSeqW%.3f,"seq_total_sec":${tSeqG + tSeqW}%.3f,"raced_sec":$tRaced%.3f,"overlap":${(tSeqG + tSeqW) / tRaced}%.2f}""")
      } finally {
        prevKeep match {
          case Some(k) => spark.conf.set("spark.graft.keepManifests", k)
          case None    => spark.conf.unset("spark.graft.keepManifests")
        }
      }
    }
    // CPUT arm (round 17): on object stores the scarce commit
    // resource is CONDITIONAL-PUT ATTEMPTS (request cost +
    // rate-limit budget), not wall-clock — each lost CAS race burns
    // one conditional PUT plus a manifest read + re-derive. This arm
    // prices attempts-per-landed-commit on conditional-mode mocks3 at
    // W writers x K appends each, with the retry backoff OFF (the
    // round-16 lockstep behavior) vs ON (the round-17 default seeded
    // jitter) — the differential the backoff buys, in the store's own
    // currency. Segments are pre-written so the raced loop body is
    // pure manifest-CAS traffic (the worst case).
    if (arms("cput")) {
      val hconf = spark.sparkContext.hadoopConfiguration
      hconf.set("fs.mocks3.impl",
        "graft.tools.MockS3FileSystem")
      hconf.setBoolean("fs.mocks3.impl.disable.cache", true)
      hconf.setBoolean("fs.mocks3.conditional.enabled", true)
      val kPer = 4 // appends per writer
      for (w <- writerCounts; backoffBase <- Seq(0L, 25L)) {
        val tmp = Files.createTempDirectory(s"writerprobe_cput_$w").toString
        val idx = s"mocks3://$tmp/idx"
        val prevKeep = spark.conf.getOption("spark.graft.keepManifests")
        try {
          spark.conf.set("spark.graft.conditionalCreate", "true")
          spark.conf.set("spark.graft.keepManifests", (w + 1).toString)
          spark.conf.set("spark.graft.retryBackoffMs", backoffBase.toString)
          val seg0 = Artifacts.writeSegment(spark, idx, "rows",
            Seq((0L, "base")).toDF("id", "v"))
          Artifacts.commit(spark, idx, Map("rows" -> Seq(seg0)))
          val segs = (0 until w * kPer).map(i =>
            Artifacts.writeSegment(spark, idx, "rows",
              Seq((100L + i, s"s$i")).toDF("id", "v")))
          val pool = Executors.newFixedThreadPool(w)
          val gate = new CountDownLatch(1)
          val futs = (0 until w).map { t =>
            pool.submit(new Callable[Unit] {
              def call(): Unit = {
                gate.await()
                for (i <- 0 until kPer)
                  Artifacts.commitAppendsWithRetry(spark, idx,
                    Map("rows" -> Seq(segs(t * kPer + i))))
              }
            })
          }
          val sec = time { gate.countDown(); futs.foreach(_.get()) }
          pool.shutdown()
          val landed = w.toLong * kPer
          require(Artifacts.currentVersion(spark, idx) == landed,
            "lost commits in the cput storm")
          val rep = Artifacts.contentionReport(spark, idx)
            .agg(coalesce(sum(col("lost_attempts")), lit(0L)),
              coalesce(sum(col("backoff_ms")), lit(0L))).head()
          val (lost, slept) = (rep.getLong(0), rep.getLong(1))
          println(f"""[writerprobe] {"probe":"cput_contention","writers":$w,"commits":$landed,"backoff_base_ms":$backoffBase,"lost_attempts":$lost,"attempts_per_landed":${1.0 + lost.toDouble / landed}%.2f,"backoff_slept_ms":$slept,"sec":$sec%.3f}""")
        } finally {
          spark.conf.unset("spark.graft.conditionalCreate")
          spark.conf.unset("spark.graft.retryBackoffMs")
          prevKeep match {
            case Some(k) => spark.conf.set("spark.graft.keepManifests", k)
            case None    => spark.conf.unset("spark.graft.keepManifests")
          }
        }
      }
    }
    spark.stop()
  }
}
