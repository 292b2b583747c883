package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Invariant tests for the round-5 scale ops (quantization audit,
  * sparse TF-IDF similarity join, integer PageRank); exact DuckDB
  * parity is the oracle gate's job (q100-q102) — these pin the
  * semantics the oracle can't see: certificates hold by construction,
  * known-answer graphs, pruning behavior.
  */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "ScaleOpsSpec")
  import spark.implicits._

  test("quantize audit: codes span [0,255] and errors sit within one step") {
    val vecs = Seq(
      (0L, Array(0.0f, -1.0f, 0.5f)),
      (1L, Array(1.0f, 1.0f, 0.5f)),
      (2L, Array(0.25f, 0.0f, 0.5f)),
      (3L, Array(0.75f, -0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val audit = Quantize.quantizeAudit(vecs, "embedding")
      .orderBy(col("dim")).collect()
    assert(audit.length == 3)
    audit.foreach { r =>
      assert(r.getAs[Long]("ok") == 1L, s"certificate failed: $r")
      assert(r.getAs[Long]("min_code") == 0L)
    }
    // dims with spread hit the full code range; the constant dim
    // (hi == lo) degenerates to code 0 with zero error
    assert(audit(0).getAs[Long]("max_code") == 255L)
    assert(audit(2).getAs[Long]("max_code") == 0L)
    assert(audit(2).getAs[Long]("max_err") == 0L)
  }

  test("quantize audit: recon error bounded by construction on random-ish floats") {
    val vecs = spark.range(200).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), d -> " +
        "CAST(sin(CAST(id * 8 + d AS DOUBLE)) AS FLOAT))").as("embedding"))
    val bad = Quantize.quantizeAudit(vecs, "embedding")
      .filter(col("ok") =!= 1L).count()
    assert(bad == 0)
  }

  test("tfidf pairs: near-identical docs outrank unrelated ones; hot terms pruned") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta zeta"),   // shares 4 rare terms with 0
      (2L, "eta theta iota kappa lambda"),
      (3L, "eta theta iota kappa mu"),        // shares 4 rare terms with 2
      (4L, "common common common common nu"), // 'common' df=1 -> can't pair
      (5L, "xi omicron pi rho sigma")
    ).toDF("doc_id", "text")
    val pairs = DocSim.tfidfPairs(docs, "doc_id", "text", maxDf = 3, topN = 10)
      .collect()
    val ranked = pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ranked.take(2).toSet == Set((0L, 1L), (2L, 3L)))
    // no pair involves doc 4 or 5: their terms are df=1
    assert(!ranked.exists { case (a, b) => Set(a, b).exists(Set(4L, 5L)) })
  }

  test("tfidf pairs: df cap prunes the stopword-shared pair") {
    // every doc shares 'the' (df=4) — with maxDf=3 the only pairing
    // evidence left is the rare bigram-ish overlap of docs 0/1
    val docs = Seq(
      (0L, "the unique1 unique2"),
      (1L, "the unique1 unique2"),
      (2L, "the solo1 solo2"),
      (3L, "the solo3 solo4")
    ).toDF("doc_id", "text")
    val pairs = DocSim.tfidfPairs(docs, "doc_id", "text", maxDf = 3, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 1L)))
  }

  test("pagerank: path graph ranks the center above the leaves, mass conserved-ish") {
    // 0 - 1 - 2 path: node 1 has deg 2, leaves deg 1
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val r = GraphOps.pagerank(pairs, iters = 3).orderBy(col("node")).collect()
    graft.Scratch.release()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val ranks = r.map(_.getAs[Long]("pr_rank"))
    assert(ranks(1) > ranks(0) && ranks(1) > ranks(2), ranks.mkString(","))
    assert(ranks(0) == ranks(2)) // symmetric leaves
    // fixed-point mass stays near 3 * scale (integer truncation only loses)
    val total = ranks.sum
    assert(total <= 3000000L && total > 2990000L, s"total=$total")
  }

  test("kcore and label propagation: driver replay == distributed loop") {
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    def kcRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(kcRows(GraphOps.kCore(pairs, k = 3, rounds = 3)) ==
      kcRows(GraphOps.kCore(pairs, k = 3, rounds = 3, driverMaxEdges = 0L)))
    graft.Scratch.release()
    def lpRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lpRows(GraphOps.labelPropagation(pairs, rounds = 3)) ==
      lpRows(GraphOps.labelPropagation(pairs, rounds = 3, driverMaxEdges = 0L)))
    graft.Scratch.release()
  }

  test("pagerank: driver replay == distributed loop on a random graph") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDriver = rows(GraphOps.pagerank(pairs, iters = 3))
    graft.Scratch.release()
    val viaLoop = rows(GraphOps.pagerank(pairs, iters = 3, driverMaxEdges = 0L))
    graft.Scratch.release()
    assert(viaDriver == viaLoop)
  }

  test("morton key: bucket bits are exactly the interleaved tile coordinates") {
    // morton(x,y,10) >> 10 must equal morton(x>>5, y>>5, 5): the top
    // bucket bits ARE the 32x32 tile id, which is the whole locality
    // guarantee the z-order layout audit (q106) relies on
    val pts = spark.range(2000).select(
      pmod(xxhash64(col("id"), lit("x")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit("y")), lit(1024L)).as("y"))
    val bad = pts.filter(
      shiftright(Layout.morton(col("x"), col("y"), 10), 10) =!=
        Layout.morton(shiftright(col("x"), 5), shiftright(col("y"), 5), 5))
      .count()
    assert(bad == 0)
  }

  test("z-order buckets bound BOTH dimensions; row-major only the leading one") {
    val pts = spark.range(4000).select(
      pmod(xxhash64(col("id"), lit("x")), lit(1024L)).as("x"),
      pmod(xxhash64(col("id"), lit("y")), lit(1024L)).as("y"))
    val spans = pts
      .groupBy(shiftright(Layout.morton(col("x"), col("y"), 10), 10).as("b"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .agg(max(col("dx")), max(col("dy"))).head()
    assert(spans.getLong(0) <= 31 && spans.getLong(1) <= 31, spans.toString)
    val rowMajor = pts
      .groupBy(shiftright(col("x") * 1024 + col("y"), 10).as("b"))
      .agg((max(col("y")) - min(col("y"))).as("dy"))
      .agg(max(col("dy"))).head()
    assert(rowMajor.getLong(0) > 31 * 4, rowMajor.toString)
  }

  test("fuzzy linkage: planted typos within k found, beyond k not, exactly once") {
    val docs = Seq(
      (0L, "The Quick Brown Fox!!"),      // normalizes like 1 and 2
      (1L, "the quick brown fox"),        // hd 0 vs 0
      (2L, "the quick crown fox"),        // 1 substitution
      (3L, "the quick crown box today"),  // 2 subs vs 2 (within 24 chars)
      (4L, "a totally different string"),
      (5L, "the quick VROWN G0X")         // 3 subs vs 1 -> beyond k=2
    ).toDF("doc_id", "text")
    val out = Fuzzy.fuzzyKeyPairs(docs, "doc_id", "text", width = 24, k = 2)
      .orderBy(col("id_a"), col("id_b")).collect()
    graft.Scratch.release()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly-once: no duplicate pair rows even when multiple segments agree
    assert(pairs.distinct == pairs)
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L))
      && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(5L) })
    val hd01 = out.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(hd01.getAs[Long]("hd") == 0L && hd01.getAs[Long]("ld") == 0L)
  }

  test("fuzzy linkage matches the brute-force Hamming join") {
    // 60 keys over a tiny alphabet force plenty of near-collisions
    val docs = spark.range(60).select(col("id").as("doc_id"),
      concat(lit("k"), pmod(col("id"), lit(3)).cast("string"),
        lit(" v"), pmod(xxhash64(col("id")), lit(9)).cast("string"),
        lit(" t"), pmod(xxhash64(col("id"), lit(2)), lit(4)).cast("string"))
        .as("text"))
    val fast = Fuzzy.fuzzyKeyPairs(docs, "doc_id", "text", width = 12, k = 2)
      .select(col("id_a"), col("id_b"), col("hd")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Scratch.release()
    val keyed = docs.select(col("doc_id"), Fuzzy.linkKey(col("text"), 12).as("key"))
    val a = keyed.select(col("doc_id").as("id_a"), col("key").as("ka"))
    val b = keyed.select(col("doc_id").as("id_b"), col("key").as("kb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hd", Fuzzy.hammingDistUnrolled(col("ka"), col("kb"), 12))
      .filter(col("hd") <= 2)
      .select(col("id_a"), col("id_b"), col("hd")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == brute)
    assert(brute.nonEmpty) // the corpus actually exercises the path
  }

  test("hard negatives: near-dups excluded, ranked by cosine, k-bounded") {
    // 4 vectors: anchor 0; 1 is its text near-dup (must be excluded
    // even though it's the nearest vector); 2 close; 3 far
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val nearDups = Seq((0L, 1L)).toDF("id_a", "id_b")
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding",
      nearDups, nAnchors = 1, k = 2)
      .orderBy(col("rnk")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L)) // 1 excluded
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("horizon near-dup: adjacent weeks pair exactly once, distant weeks never") {
    val txt = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (0L, txt), (1L, txt),   // weeks 0,0 -> pair, exactly once
      (10L, txt),             // week 1: pairs with 0 and 1 (delta 1)
      (25L, txt)              // week 2: pairs with 10 only (0/1 are delta 2)
    ).toDF("doc_id", "text")
    val out = Dedup.minhashPairsHorizon(docs, "doc_id", "text",
      week = expr("doc_id DIV 10"), n = 3, bands = 4, rows = 4,
      num = 1, den = 2).collect()
    graft.Scratch.release()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct == pairs, s"double emission: $pairs")
    assert(pairs.toSet == Set((0L, 1L), (0L, 10L), (1L, 10L), (10L, 25L)))
  }

  test("triangle counts: known graphs, exactly-once per triangle") {
    // triangle 0-1-2 plus pendant 3: nodes 0,1,2 have 1 triangle, 3 none
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = GraphOps.triangleCounts(tri).orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    graft.Scratch.release()
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L)))
    // K4: every node sits in C(3,2) = 3 triangles; 4 triangles total
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("id_a", "id_b")
    val o4 = GraphOps.triangleCounts(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.Scratch.release()
    assert(o4 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("boilerplate: segment shared by >maxDocs docs is flagged in every doc") {
    val docs = Seq(
      (0L, "a b x y"), (1L, "a b z w"), (2L, "a b q r"), (3L, "u v s t")
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateStats(docs, "doc_id", "text",
      segLen = 2, maxDocs = 2).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // "a b" appears in 3 docs (> 2) -> boilerplate; each of docs 0-2
    // has 2 segments, 1 flagged (50%); doc 3 is clean
    assert(out.toSeq == Seq((0L, 2L, 1L, 50L), (1L, 2L, 1L, 50L),
      (2L, 2L, 1L, 50L), (3L, 2L, 0L, 0L)))
  }

  test("winnowing: shared run of n+w-1 tokens guarantees a shared fingerprint") {
    // docs 0 and 1 share the 8-token run p1..p8 (n=4, w=5 -> n+w-1=8);
    // doc 2 is disjoint vocabulary
    val docs = Seq(
      (0L, "x1 x2 x3 p1 p2 p3 p4 p5 p6 p7 p8 y1 y2 y3"),
      (1L, "z1 z2 p1 p2 p3 p4 p5 p6 p7 p8 w1 w2 w3 w4"),
      (2L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12 m13 m14")
    ).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs, "doc_id", "text",
      n = 4, w = 5, maxDf = 20, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Scratch.release()
    assert(pairs == Set((0L, 1L)))
  }

  test("containment: small doc inside big doc found despite low Jaccard") {
    // doc 1 (8 tokens) is verbatim inside doc 0 (28 tokens): Jaccard
    // of shingle sets ~ 6/26 = 0.23 (far below any near-dup bar) but
    // containment of 1 in 0 is 1000 permille; doc 2 is disjoint
    val big = "q w e r t y u i o p a s d f g h j k l z x c v b n m aa bb"
    val small = "a s d f g h j k"
    val docs = Seq((0L, big), (1L, small), (2L, "m1 m2 m3 m4 m5 m6 m7 m8"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, thrPermille = 800).collect()
    graft.Scratch.release()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (0L, 1L))
    assert(r.getAs[Long]("cont_b") == 1000L) // all of B's shingles in A
    assert(r.getAs[Long]("cont_a") < 300L)   // asymmetry: A mostly not in B
  }

  test("incremental clustering equals from-scratch clustering across the split") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with nothing shared at all here now"
    val docs = Seq(
      (0L, dup), (1L, dup), (2L, "unique old text that matches nothing else ok"),
      (300L, dup), (301L, other), (302L, other)
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalClusters(docs, "doc_id", "text", splitId = 250L,
      n = 3, bands = 4, rows = 4, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Scratch.release()
    val full = Dedup.dedupClusters(docs, "doc_id", "text",
      n = 3, bands = 4, rows = 4, num = 1, den = 2)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Scratch.release()
    assert(inc == full)
    // the new doc 300 joined the OLD cluster {0,1}; 301/302 formed a
    // purely-new cluster; 2 stayed a singleton
    assert(inc == Set((0L, 0L), (1L, 0L), (2L, 2L), (300L, 0L),
      (301L, 301L), (302L, 301L)))
  }

  test("match distribution: scale pinned by scarcest class, no upsampling") {
    val docs = ((0L until 8L).map(i => (i, "a")) ++
      (8L until 10L).map(i => (i, "b"))).toDF("doc_id", "cls")
    val out = TextOps.matchDistribution(docs, "doc_id", "cls",
      Seq("a" -> 50, "b" -> 50), salt = "t")
      .orderBy(col("cls")).collect()
    // scale = min(8/0.5, 2/0.5) = 4 docs total -> 2 per class:
    // class a keeps 2/8 = 250 permille, class b keeps all 1000
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      == Seq(("a", 8L, 250L), ("b", 2L, 1000L)))
    val kept = out.map(r => (r.getString(0), r.getLong(4))).toMap
    assert(kept("b") == 2L)      // rate 1000 keeps everything
    assert(kept("a") <= 8L)      // bucket rule; exact count is hash-defined
  }

  test("misra-gries: heavy keys survive any partitioning; exact verify is stable") {
    // 2 hot keys (1/4 of mass each) among 2000 cold singletons; k=8
    // counters guarantee catching freq > n/9
    val rows = (0L until 4000L).map { i =>
      if (i % 4 == 0) "hotA" else if (i % 4 == 1) "hotB" else s"cold_$i"
    }
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.createDataset(rows)(org.apache.spark.sql.Encoders.STRING)
        .toDF("key").repartition(parts)
      val out = HeavyHitters.heavyHitters(df, "key", k = 8)
        .orderBy(col("key")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out == Seq(("hotA", 1000L), ("hotB", 1000L)), s"parts=$parts")
    }
  }

  test("weighted reservoir: exact k per stratum, heavy row always wins a slot") {
    val docs = (0L until 30L).map(i =>
      (i, "a", if (i == 17L) 1000000L else 1L)).toDF("doc_id", "cls", "w")
    val out = TextOps.weightedReservoir(docs, "doc_id", "cls",
      col("w"), k = 5, salt = "t").orderBy(col("rn")).collect()
    assert(out.length == 5)
    // pri(17) = hash * 1e6 / 1e6 = hash < any hash * 1e6 -> rank 1
    assert(out.head.getLong(2) == 17L)
    // priorities ascend with rank
    val pris = out.map(_.getLong(3))
    assert(pris.sameElements(pris.sorted))
  }

  test("match distribution: a target class with zero docs pins scale to zero") {
    val docs = ((0L until 8L).map(i => (i, "a"))).toDF("doc_id", "cls")
    val out = TextOps.matchDistribution(docs, "doc_id", "cls",
      Seq("a" -> 50, "b" -> 50), salt = "t")
      .orderBy(col("cls")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // class b is unobserved: the mix is unreachable, so EVERY class
    // keeps zero (scale = 0) and b still appears on the scoreboard
    assert(out.toSeq == Seq(("a", 8L, 0L, 0L), ("b", 0L, 0L, 0L)))
  }

  test("weighted reservoir: non-positive weights are excluded, not promoted") {
    val docs = Seq((0L, "a", 5L), (1L, "a", 0L), (2L, "a", -3L), (3L, "a", 7L))
      .toDF("doc_id", "cls", "w")
    val out = TextOps.weightedReservoir(docs, "doc_id", "cls",
      col("w"), k = 10, salt = "t").collect().map(_.getLong(2)).toSet
    assert(out == Set(0L, 3L)) // zero/negative weight never wins a slot
  }

  test("token rarity: mean dense frequency rank per occurrence") {
    val docs = Seq((0L, "x x x y"), (1L, "z")).toDF("doc_id", "text")
    val out = TextOps.tokenRarity(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ranks: x(cnt 3) -> 1, y -> 2, z -> 3 (cnt ties broken by token)
    assert(out.toSeq == Seq((0L, 4L, 5L, 1L), (1L, 1L, 3L, 3L)))
  }

  test("token rarity: decomposed rank equals a global dense_rank, " +
    "also when forced down the distributed prefix-sum path") {
    // random LCG corpus: repeated small-vocab tokens so count tiers
    // hold many tokens and ties exercise the within-tier window
    var seed = 41L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 33) }
    val docs = (0L until 200L).map { i =>
      // "tok" + 2 digits: many tokens share a 4-char prefix ("tok1"
      // covers tok10..tok19), so the two-level (tier, prefix)
      // decomposition's multi-token cells and multi-prefix tiers are
      // both exercised
      val words = (0 until (next() % 12 + 1).toInt)
        .map(_ => s"tok${next() % 40}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def naive = {
      val tok = docs.select(col("doc_id").as("id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      val ranked = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        .select(col("token"), dense_rank().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("token"))).as("rank"))
      tok.join(ranked, Seq("token"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("rank")).cast("long").as("rank_sum"))
    }
    val expect = naive.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got = TextOps.tokenRarity(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    val was = spark.conf.getOption(Prefix.MaxWindowRowsKey)
    spark.conf.set(Prefix.MaxWindowRowsKey, "0")
    try assert(got == expect, "distributed path diverges")
    finally was match {
      case Some(v) => spark.conf.set(Prefix.MaxWindowRowsKey, v)
      case None => spark.conf.unset(Prefix.MaxWindowRowsKey)
    }
  }

  test("source overlap: identical sources estimate 1000 permille") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine ten"
    val docs = Seq(("sA", t1), ("sB", t1), ("sC", t2))
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text", n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(3))).toMap
    assert(out.size == 3)
    assert(out(("sA", "sB")) == 1000L)
    assert(out(("sA", "sC")) < 1000L)
  }

  test("winnow kernel matches the HOF differential") {
    // deterministic synthetic corpus: LCG token stream over a small
    // vocab, varying lengths (incl. sub-window docs -> empty sets)
    val vocab = Vector("agg", "scan", "join", "sort", "key", "row",
      "table", "value", "batch", "merge")
    var seed = 12345L
    def nextTok(): String = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      vocab(((seed >>> 33) % vocab.size).toInt)
    }
    val docs = (0L until 60L).map { id =>
      val len = 3 + (id % 37).toInt
      (id, (0 until len).map(_ => nextTok()).mkString(" "))
    }.toDF("doc_id", "text")
    val kernel = TextOps.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hof = TextOps.winnowFingerprintsHof(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel == hof)
    assert(kernel.nonEmpty)
  }

  test("kcore: triangle survives k=2 peel, pendant is removed") {
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = GraphOps.kCore(g, k = 2, rounds = 3).orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.Scratch.release()
    // node 2: initial deg 3, post-peel deg 2 (edge to pendant 3 gone)
    assert(out.toSeq == Seq((0L, 2L, 2L, 1L), (1L, 2L, 2L, 1L),
      (2L, 3L, 2L, 1L), (3L, 1L, 0L, 0L)))
  }

  test("label propagation: bridged cliques keep separate communities (CC cannot)") {
    // K4 {0..3} and K4 {10..13} joined by one bridge 3-10: CC merges
    // them into one component; LP keeps two density communities
    val k4a = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val k4b = k4a.map { case (a, b) => (a + 10L, b + 10L) }
    val g = (k4a ++ k4b :+ (3L, 10L)).toDF("id_a", "id_b")
    val lp = GraphOps.labelPropagation(g, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.Scratch.release()
    val commA = (0L to 3L).map(lp).toSet
    val commB = (10L to 13L).map(lp).toSet
    assert(commA.size == 1 && commB.size == 1 && commA != commB)
    val cc = Dedup.connectedComponents(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.Scratch.release()
    assert((0L to 3L).map(cc).toSet == (10L to 13L).map(cc).toSet) // one comp
  }

  test("pagerank: regular graph is uniform and stationary") {
    // triangle: every node deg 2 — PR is exactly uniform each iteration
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("id_a", "id_b")
    val r = GraphOps.pagerank(pairs, iters = 3).collect()
    graft.Scratch.release()
    val ranks = r.map(_.getAs[Long]("pr_rank")).distinct
    assert(ranks.length == 1, ranks.mkString(","))
  }

  test("modularity: two cliques + bridge, hand-computed contributions") {
    // K3 {0,1,2} + K3 {3,4,5} + bridge (2,3): m = 7 edges.
    // degrees: 0,1->2  2->3  3->3  4,5->2; communities = the cliques.
    // e_in = 3 each; deg_sum = 7 each; contrib = 4*7*3 - 49 = 35.
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L),
      (3L, 5L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L),
      (5L, 3L)).toDF("node", "community")
    val got = GraphOps.modularity(pairs, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDecimal(5).longValueExact())).toSeq
    graft.Scratch.release()
    // cut_edges = 7 - 2*3 = 1 each (the bridge, once per side)
    assert(got == Seq((0L, 3L, 3L, 7L, 1L, 35L), (3L, 3L, 3L, 7L, 1L, 35L)))
    // Q = (35 + 35) / (4 * 49) = 0.357... > 0 — partition is real
  }

  test("modularity: everything in one community gives Q exactly 0") {
    // one community: e_in = m, deg_sum = 2m -> contrib = 4m^2 - 4m^2
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val labels = Seq((0L, 9L), (1L, 9L), (2L, 9L)).toDF("node", "community")
    val got = GraphOps.modularity(pairs, labels).collect()
    graft.Scratch.release()
    assert(got.length == 1 && got.head.getDecimal(5).longValueExact() == 0L)
    assert(got.head.getLong(4) == 0L) // no cut edges either
  }

  test("spearman: perfect monotone agreement means sum_d2 = 0; reversal maxes it") {
    val agree = Seq(("s", 1L, 10L), ("s", 2L, 20L), ("s", 3L, 30L))
      .toDF("g", "x", "y")
    val a = Eval.spearman(agree, col("g"), col("x"), col("y")).collect()
    assert(a.head.getLong(2) == 0L && a.head.getLong(3) == 0L)
    // exact reversal on n=3 distinct values: d2 (doubled ranks) =
    // (2-6)^2 + 0 + (6-2)^2 = 32 = 4 * textbook 8
    val rev = Seq(("s", 1L, 30L), ("s", 2L, 20L), ("s", 3L, 10L))
      .toDF("g", "x", "y")
    val r = Eval.spearman(rev, col("g"), col("x"), col("y")).collect()
    assert(r.head.getLong(2) == 32L)
  }

  test("spearman: ties produce integer doubled ranks and tie masses") {
    // x = (1,1,2): doubled avg ranks (3,3,6) — never fractional;
    // tie_x = 2^3 - 2 = 6, tie_y = 0
    val df = Seq(("s", 1L, 5L), ("s", 1L, 6L), ("s", 2L, 7L))
      .toDF("g", "x", "y")
    val r = Eval.spearman(df, col("g"), col("x"), col("y")).collect()
    assert(r.head.getLong(3) == 6L && r.head.getLong(4) == 0L)
  }
}
