package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the round-6 curation operators (q174-q177). */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder
    .master("local[4]").appName("curation-ops")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("lmSurprisal: rare continuation of a common prefix costs more bits") {
    import spark.implicits._
    // prefix 'the' continues to 'cat' 7x and to 'quark' once:
    // C1(the)=8 -> bitlen 4; C2(the cat)=7 -> bitlen 3 (1 bit);
    // C2(the quark)=1 -> bitlen 1 (3 bits)
    val docs = ((1 to 7).map(i => (i.toLong, "the cat")) :+
      (8L, "the quark")).toDF("doc_id", "text")
    val out = TextOps.lmSurprisal(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L && out(8L) == 3L)
  }

  test("mixtureReweight: starved source keeps all + deficit; unlisted drops") {
    import spark.implicits._
    // 10 docs: a=5, b=4, c=1
    val docs = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    val out = TextOps.mixtureReweight(docs, col("source"),
      Seq("a" -> 200, "c" -> 400)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // a: target 2 docs of 5 -> keep 400 permille, expected 2, deficit 0
    assert(out("a") == (5L, 400L, 2L, 0L))
    // c: target 4 docs of 1 -> capped at keep-all, expected 1, deficit 3
    assert(out("c") == (1L, 1000L, 1L, 3L))
    // b unlisted: target 0 -> keep 0, expected 0, no deficit
    assert(out("b") == (4L, 0L, 0L, 0L))
  }

  test("mixtureReweight: corpus-absent target surfaces as all-deficit, not silence") {
    import spark.implicits._
    val docs = (Seq.fill(5)("a") ++ Seq.fill(5)("b"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    // 'x' (a typo'd --target-shares name) has zero corpus docs: it
    // must still emit a row — n_docs 0, keep 0, expected 0, and the
    // FULL target mass (300 permille of 10 docs = 3) as deficit
    val out = TextOps.mixtureReweight(docs, col("source"),
      Seq("a" -> 300, "x" -> 300)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.contains("x"), "absent target disappeared from the plan")
    assert(out("x") == (0L, 0L, 0L, 3L))
    assert(out("a") == (5L, 600L, 3L, 0L))
  }

  test("curriculumAssign: empty input returns an empty frame, not NPE") {
    import spark.implicits._
    val docs = Seq.empty[(Long, Long, String)].toDF("doc_id", "sc", "text")
    val out = TextOps.curriculumAssign(docs, "doc_id", col("sc"),
      TextOps.tokenCount(col("text")), phases = 3)
    assert(out.columns.toSeq == Seq("id", "score", "toks", "phase"))
    assert(out.count() == 0L)
    // and the aggregate view built on it is empty too
    assert(TextOps.curriculumPhases(docs, "doc_id", col("sc"),
      TextOps.tokenCount(col("text")), phases = 3).count() == 0L)
    // a NON-empty frame with an all-null score column is a caller
    // bug (wrong column): fail loudly, never silently emit zero rows
    val badScores = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.curriculumAssign(badScores, "doc_id",
        lit(null).cast("long"), TextOps.tokenCount(col("text")),
        phases = 3).count()
    }
    assert(e.getMessage.contains("score column is null"))
  }

  test("curriculumPhases: contiguous score ranges with ~equal token mass") {
    import spark.implicits._
    // 12 docs, 10 tokens each, scores 1..12 -> 3 phases of exactly 4
    val docs = (1 to 12).map(i =>
      (i.toLong, i.toLong, ("w " * 10).trim)).toDF("doc_id", "sc", "text")
    val out = TextOps.curriculumPhases(docs, "doc_id", col("sc"),
      TextOps.tokenCount(col("text")), phases = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 4L, 40L, 1L, 4L),
      (1L, 4L, 40L, 5L, 8L), (2L, 4L, 40L, 9L, 12L)))
  }

  test("curriculumPhases: token-weighted cuts, not doc-count cuts") {
    import spark.implicits._
    // one heavy doc (60 tokens) + six light (10 each): the heavy one
    // fills phase 0 alone (60 of 120 total = phases 0 and 1 range)
    val docs = ((1L, 1L, ("w " * 60).trim) +:
      (2 to 7).map(i => (i.toLong, i.toLong, ("w " * 10).trim)))
      .toDF("doc_id", "sc", "text")
    val out = TextOps.curriculumPhases(docs, "doc_id", col("sc"),
      TextOps.tokenCount(col("text")), phases = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // heavy doc spans the phase-0 token range by itself: cum=60 ->
    // phase ((60-1)*3) DIV 120 = 1, so it lands in phase 1 and no doc
    // is in phase 0 (cut semantics: phase of a doc = phase of its
    // LAST token; a doc straddling a boundary counts once, later).
    // phase 1 = heavy + light at cum 70, 80; phase 2 = cum 90..120.
    assert(!out.contains(0L))
    assert(out(1L) == 3L && out(2L) == 4L)
  }

  test("repeatRuns: stutters, period-2 loops, and degenerate inputs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "go go go go stop"),          // token run 4, loop: "go go" x? s1=s3 -> 2
      (2L, "a b a b a b"),               // loop 3 ("a b" at stride 2)
      (3L, "x y z"),                     // no repeats: run 1, loop 1
      (4L, ""),                          // empty -> all zeros
      (5L, "w"),                         // single token: run 1, loop 0
      (6L, "c d c e c d c d")            // s5=(c,d),s7=(c,d): loop 2
    ).toDF("doc_id", "text")
    val out = TextOps.repeatRuns(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (5L, 4L, 2L))
    assert(out(2L) == (6L, 1L, 3L))
    assert(out(3L) == (3L, 1L, 1L))
    assert(out(4L) == (0L, 0L, 0L))
    assert(out(5L) == (1L, 1L, 0L))
    assert(out(6L) == (8L, 1L, 2L))
  }

  test("repeatRuns: differential vs a naive reference on 200 seeded random docs") {
    import spark.implicits._
    def naive(toks: IndexedSeq[String]): (Long, Long) = {
      var best1 = 0L; var run = 0L; var prev: String = null
      toks.foreach { t =>
        run = if (t == prev) run + 1 else 1
        prev = t; best1 = math.max(best1, run)
      }
      val bgs = if (toks.length < 2) IndexedSeq.empty
        else toks.sliding(2).map(w => (w(0), w(1))).toIndexedSeq
      val runs = Array.fill(bgs.length)(1L)
      var best2 = 0L
      bgs.indices.foreach { i =>
        if (i >= 2 && bgs(i) == bgs(i - 2)) runs(i) = runs(i - 2) + 1
        best2 = math.max(best2, runs(i))
      }
      (best1, best2)
    }
    val rnd = new scala.util.Random(1234)
    val alpha = Vector("a", "b", "c")
    val docs = (0 until 200).map { i =>
      val len = rnd.nextInt(26)
      val toks = Vector.fill(len) {
        // bias towards repeats/loops so the interesting branches fire
        if (rnd.nextInt(3) == 0 && len > 2) alpha(i % 3)
        else alpha(rnd.nextInt(3))
      }
      (i.toLong, toks.mkString(" "), toks)
    }
    val got = TextOps.repeatRuns(
      docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, _, toks) =>
      assert(got(id) == naive(toks), s"doc $id: ${toks.mkString(" ")}")
    }
  }

  test("ksDriftFromHist on a pre-aggregated histogram equals ksDrift on rows") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 5L), ("b", 2L), ("b", 9L),
      ("b", 9L), ("b", 9L), ("c", 4L)).toDF("g", "v")
    val direct = Eval.ksDrift(rows, col("g"), col("v"))
      .orderBy(col("grp")).collect().toSeq.map(_.toSeq)
    val hist = rows.groupBy(col("g").as("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val fromHist = Eval.ksDriftFromHist(hist)
      .orderBy(col("grp")).collect().toSeq.map(_.toSeq)
    assert(direct == fromHist)
  }

  test("pqCodes: self-seeded corpus gets zero reconstruction error, codes per subspace") {
    import spark.implicits._
    // 4 vectors, each its own seed: after one truncating-mean round
    // every centroid equals its seed, so err_q = 0 and each vector
    // codes to itself in BOTH subspaces
    val vecs = (0 until 4).map { i =>
      val v = Array.fill(8)(0.0f); v(i) = 1.0f; v(4 + i) = 1.0f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = Quantize.pqCodes(vecs, "vec_id", "embedding",
      dims = 8, m = 2, k = 4, iters = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (0L until 4L).foreach { i =>
      assert(out(i) == (i, i, 0L), s"vec $i: ${out(i)}")
    }
  }

  test("pqCodesAllocated: contiguous allocation reproduces pqCodes " +
    "bit-for-bit; a variance-skewed corpus rewards balancing") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // identity: alloc = the contiguous slices -> identical frame
    val contig = Quantize.pqCodes(emb, "vec_id", "embedding",
      dims = 64, m = 2, k = 4, iters = 1).orderBy(col("id")).collect()
    graft.Scratch.release()
    val viaAlloc = Quantize.pqCodesAllocated(emb, "vec_id", "embedding",
      dims = 64, k = 4, iters = 1,
      Array((0 until 32).toArray, (32 until 64).toArray))
      .orderBy(col("id")).collect()
    assert(contig.toSeq == viaAlloc.toSeq)
    graft.Scratch.release()
    // value: put ALL the energy in dims 0..7 — contiguous slicing
    // gives subspace 1 nothing to do while subspace 0 drowns;
    // variance-balanced snake allocation splits the hot dims 4/4
    // and must cut reconstruction error
    val rnd = new scala.util.Random(29)
    val skew = (0L until 200L).map { i =>
      val v = Array.tabulate(16)(d =>
        if (d < 8) rnd.nextFloat() * 2 - 1 else rnd.nextFloat() * 0.01f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val alloc = Quantize.varianceBalancedAllocation(
      skew, "embedding", dims = 16, m = 2)
    // every subspace got exactly half of the hot dims
    assert(alloc.forall(_.count(_ < 8) == 4), alloc.map(_.toSeq).toSeq)
    val eC = Quantize.pqCodes(skew, "vec_id", "embedding",
      dims = 16, m = 2, k = 4, iters = 2)
      .agg(sum(col("err_q"))).head().getLong(0)
    graft.Scratch.release()
    val eB = Quantize.pqCodesAllocated(skew, "vec_id", "embedding",
      dims = 16, k = 4, iters = 2, alloc)
      .agg(sum(col("err_q"))).head().getLong(0)
    assert(eB < eC, s"balanced $eB >= contiguous $eC")
    graft.Scratch.release()
  }

  test("residualPqCodes: residual encoding beats global PQ at equal bits") {
    // the headline claim of the IVF-PQ second rung, measured on the
    // driver's own corpus: total squared reconstruction error of the
    // residual codes <= the global codes' (same m, k, iters). Not a
    // mathematical identity — a measured property of clustered data —
    // so it is pinned here rather than inside the q201 oracle hash.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val g = Quantize.pqCodes(emb, "vec_id", "embedding",
      dims = 64, m = 2, k = 4, iters = 1)
      .agg(sum(col("err_q"))).head().getLong(0)
    graft.Scratch.release()
    val res = Quantize.residualPqCodes(emb, "vec_id", "embedding",
      dims = 64, ivfK = 4, m = 2, k = 4, iters = 1)
    val r = res.agg(sum(col("err_q"))).head().getLong(0)
    assert(r <= g, s"residual $r > global $g")
    // and the schema contract q201 hashes
    assert(res.columns.toSeq == Seq("id", "cell", "code0", "code1", "err_q"))
    graft.Scratch.release()
  }

  test("ivfResidualSearchRecall: exact re-rank never loses an " +
    "ADC-recovered true neighbor, candidates stay cell-bounded") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.filter(size(col("embedding")) === 64).count()
    val rows = Quantize.ivfResidualSearchRecall(emb, "vec_id", "embedding",
      dims = 64, ivfK = 4, m = 2, k = 4, iters = 1,
      nprobe = 2, nProbes = 5, rerank = 50, topK = 10).collect()
    graft.Scratch.release()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nCand, adc, rr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // an exact-top-10 member with ADC rank <= 10 <= 50 survives the
      // exact re-rank by construction — re-rank is monotone
      assert(rr >= adc, s"re-rank lost neighbors: $r")
      assert(rr <= 10 && adc <= 10)
      // the probe scanned code tuples from 2 of 4 cells, never the
      // whole corpus
      assert(nCand > 0 && nCand < n, s"candidates not cell-bounded: $r")
    }
  }

  test("pqAdcRecall: probes are the lowest ids PRESENT, not id < nProbes") {
    import spark.implicits._
    // offset id space (1000..): the old `id < nProbes` rule would
    // select ZERO probes here and report recall over an empty set
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 12).map { i =>
      (1000L + i, Array.fill(8)(rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val out = Quantize.pqAdcRecall(vecs, "vec_id", "embedding",
      dims = 8, m = 2, k = 2, iters = 1, nProbes = 3, topK = 2)
      .collect().map(r => r.getLong(0)).sorted
    assert(out.toSeq == Seq(1000L, 1001L, 1002L), out.mkString(","))
    graft.Scratch.release()
  }

  test("curriculumAssign: differential vs naive global sort on 300 seeded docs with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // heavy ties in both score and token count to stress bucket
    // boundaries and the (score, id) tie-break
    val docs = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(5).toLong)
    }
    val got = TextOps.curriculumAssign(
      docs.toDF("doc_id", "sc", "tk"), "doc_id", col("sc"), col("tk"),
      phases = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val total = math.max(docs.map(_._3).sum, 1L)
    var cum = 0L
    val want = docs.sortBy(d => (d._2, d._1)).map { case (id, _, tk) =>
      cum += tk
      id -> ((cum - 1) * 4) / total
    }.toMap
    assert(got == want)
  }

  test("crossLabelLeakage counts each shared gram once per label pair") {
    import spark.implicits._
    val g = "a b c d e f g h" // one 8-gram
    val docs = Seq(
      (1L, "en", g), (2L, "en", g),        // same gram twice under en
      (3L, "de", g),                        // shared en<->de
      (4L, "fr", g),                        // shared with both
      (5L, "de", "z z z z z z z z")         // de-only gram
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.crossLabelLeakage(docs, "doc_id", col("lang"), "text", 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(("de", "en", 1L), ("de", "fr", 1L), ("en", "fr", 1L)))
  }

  test("bm25TopK: hand-computed integer Okapi scores, idf-0 pruning, " +
    "rank order") {
    import spark.implicits._
    // N=4, tokens=12 -> avgdl = 3; df(apple)=2 -> idf 1,
    // df(banana)=1 -> idf 2, df(cherry)=2 -> idf 1 but cherry is not
    // a query term; query doc 0 = {apple, banana}
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple cherry"),
      (2L, "cherry durian"),
      (3L, "durian elderberry fig grape")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text",
      nQueries = 1, qTerms = 4, topK = 10)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc0: apple 1*22000*1*3 DIV 57 = 1157, banana 2*22000*1*3 DIV
    // 57 = 2315 -> 3472; doc1: apple 1*22000*3*3 DIV 135 = 1466;
    // docs 2/3 match no positive-idf query term -> absent
    assert(out.toSeq == Seq((0L, 1L, 0L, 3472L), (0L, 2L, 1L, 1466L)))
  }

  test("bm25PrfTopK: hand-computed expansion; no-new-terms feedback " +
    "degenerates to plain BM25") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple cherry"),
      (2L, "cherry durian"),
      (3L, "durian elderberry fig grape")).toDF("doc_id", "text")
    // fbDocs=2 -> feedback {doc0, doc1}; candidate terms by fbw*idf:
    // apple 4*1 / banana 1*2 are ORIGINAL -> excluded; cherry fbw=1,
    // idf=bitlen(4//2)-1=1 -> expansion = {cherry}. Round 2: doc1
    // gains cherry 66000 DIV (10*1*3 + 9 + 9*4 = 75) = 880 -> 2346;
    // doc2 enters at 66000 DIV (30 + 9 + 18 = 57) = 1157
    val out = TextOps.bm25PrfTopK(docs, "doc_id", "text",
      nQueries = 1, qTerms = 4, topK = 10, gram = 1,
      fbDocs = 2, fbTerms = 1)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq ==
      Seq((1L, 0L, 3472L), (2L, 1L, 2346L), (3L, 2L, 1157L)))
    // fbDocs=1 -> feedback {doc0} only donates the ORIGINAL terms ->
    // empty expansion -> identical to plain bm25TopK
    val prf1 = TextOps.bm25PrfTopK(docs, "doc_id", "text",
      nQueries = 1, qTerms = 4, topK = 10, gram = 1,
      fbDocs = 1, fbTerms = 1).orderBy(col("rnk")).collect()
      .map(_.toSeq).toSeq
    val plain = TextOps.bm25TopK(docs, "doc_id", "text",
      nQueries = 1, qTerms = 4, topK = 10, gram = 1)
      .orderBy(col("rnk")).collect().map(_.toSeq).toSeq
    assert(prf1 == plain)
  }

  test("sq8Dequant/sqDist kernels: hand formulas + HOF differential") {
    import spark.implicits._
    // lo/wd tables: dim0 [0, 1000] wd=1000, dim1 degenerate wd=0 at 77
    val lo = Array(0L, 77L)
    val wd = Array(1000L, 0L)
    // m=333 -> code = 333*255 DIV 1000 = 84 -> dv = (84*1000) DIV 255
    // = 329; degenerate dim always reconstructs to lo; m=1000 hits
    // code 255 (byte -1 when packed — the unsigned round trip)
    val df = Seq(
      (Seq(333L, 77L), Seq(329L, 77L)),
      (Seq(1000L, 77L), Seq(1000L, 77L)))
      .toDF("mv", "expected")
    val got = df.select(
      VectorExpressions.sq8Dequant(col("mv"), lo, wd).as("dv"),
      VectorExpressions.sq8UnpackDequant(
        VectorExpressions.sq8PackBytes(col("mv"), lo, wd), lo, wd)
        .as("dv2"),
      col("expected")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2))
      // packed-byte round trip == the in-memory round trip, code 255
      // included (two's-complement byte restored via & 0xFF)
      assert(r.getSeq[Long](1) == r.getSeq[Long](0))
    }
    // sqDist == the aggregate(zip_with(...)) HOF on arbitrary longs,
    // negatives included
    val pairs = Seq(
      (Seq(1L, -5L, 7L), Seq(4L, 0L, -7L)),
      (Seq(0L, 0L), Seq(0L, 0L)),
      (Seq(2000000L, -2000000L), Seq(-2000000L, 2000000L)))
      .toDF("a", "b")
    val diff = pairs.select(
      VectorExpressions.sqDist(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("h")).collect()
    assert(diff.forall(r => r.getLong(0) == r.getLong(1)))
    assert(diff.last.getLong(0) == 2L * 4000000L * 4000000L)
  }

  test("Sq8Expr: a mode/child-type mismatch fails at ANALYSIS time " +
    "(checkInputDataTypes), not as a runtime ClassCastException") {
    import spark.implicits._
    val lo = Array(0L); val wd = Array(1000L)
    val df = Seq((Seq(333L), Array[Byte](84))).toDF("mv", "bin")
    // binary child under an array<long> mode, and vice versa
    val badDequant = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.sq8Dequant(col("bin"), lo, wd)).collect()
    }
    assert(badDequant.getMessage.contains("array<long>"))
    val badUnpack = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.sq8UnpackDequant(col("mv"), lo, wd))
        .collect()
    }
    assert(badUnpack.getMessage.contains("binary"))
    // the well-typed forms still analyze and run
    assert(df.select(VectorExpressions.sq8Dequant(col("mv"), lo, wd))
      .collect().head.getSeq[Long](0) == Seq(329L))
  }

  test("sq8AdcRecall: zero quantization error (values on the int8 " +
    "grid) ranks exactly like full precision") {
    import spark.implicits._
    // 2-dim corpus on an exact int8 grid: values k/64 (dyadic, so
    // micros = 15625k exactly), k in {0..51} -> lo = 0, wd =
    // 15625*51 = 255*3125, and every m = 3125*(5k) sits on a code
    // boundary -> dequantization is the identity -> every rank pair
    // agrees, overlap = k
    val vals = Seq(0, 5, 13, 26, 38, 51).map(k => k / 64f)
    val emb = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Seq(v, vals((i + 1) % vals.size)))
    }.toDF("vec_id", "embedding")
    val out = Quantize.sq8AdcRecall(emb, "vec_id", "embedding",
      dims = 2, nProbes = 2, k = 3).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("overlap_at_k") == 3L))
    assert(out.forall(_.getAs[Long]("overlap_permille") == 1000L))
  }
}
