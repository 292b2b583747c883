package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Invariants for the round-4 curation operators (domain cap,
  * repetition stats, bloom decontamination, reshard); value parity
  * with DuckDB is covered by the oracle gate (q70-q76).
  */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "PipelineOpsSpec")
  import spark.implicits._

  private def docs = Seq(
    (0L, "a a a a a a a a b c"), // 8/10 same token, repeated bigrams
    (1L, "one two three four five six seven eight nine ten"),
    (2L, "x y x y x y x y x y"), // alternating: dup bigrams, top 5/10
    (3L, ""),
    (4L, "solo")
  ).toDF("doc_id", "text")

  test("repetition kernel matches the HOF differential form") {
    val k = docs.select(col("doc_id"),
      TextOps.repetitionStats(col("text")).as("r")).orderBy("doc_id").collect()
    val h = docs.select(col("doc_id"),
      TextOps.repetitionStatsHof(col("text")).as("r")).orderBy("doc_id").collect()
    k.zip(h).foreach { case (a, b) =>
      assert(a.getStruct(1) == b.getStruct(1), s"doc ${a.getLong(0)}")
    }
  }

  test("repetition stats values on planted docs") {
    val m = docs.select(col("doc_id"), TextOps.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens"), col("r.top_tok_cnt"),
        col("r.n_bigrams"), col("r.n_dup_bigrams"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(m(0L) == ((10, 8, 9, 6)))  // bigrams: 'a a'x7,'a b','b c' -> 9 total, 3 distinct
    assert(m(2L) == ((10, 5, 9, 7)))  // 'x y'x5 + 'y x'x4 -> 2 distinct of 9
    assert(m(3L) == ((0, -1, 0, 0)))  // empty text: null top count
    assert(m(4L) == ((1, 1, 0, 0)))
  }

  test("bloom prune never drops a true member (superset of exact)") {
    val keys = (0L until 2000L).map(i => (i, s"key_$i")).toDF("id", "k")
    val small = keys.filter(col("id") % 7 === 0).select(col("k"))
    val bloom = BloomExpressions.buildLongBloom(small,
      TextOps.hash32(col("k")), expectedItems = 300)
    val pruned = keys.filter(BloomExpressions.mightContain(
      TextOps.hash32(col("k")), bloom))
    // every true member survives the prune...
    assert(pruned.join(small, Seq("k"), "left_semi").count() == small.count())
    // ...and the prune + exact verify equals the exact semi-join
    val verified = pruned.join(small, Seq("k"), "left_semi")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(verified == (0L until 2000L).filter(_ % 7 == 0).toSet)
  }

  test("bloom might_contain stays codegen'd (appears in plan, no UDF)") {
    val keys = spark.range(100).select(col("id"),
      concat(lit("k"), col("id")).as("k"))
    val bloom = BloomExpressions.buildLongBloom(keys.limit(10),
      TextOps.hash32(col("k")), expectedItems = 10)
    val plan = keys.filter(BloomExpressions.mightContain(
      TextOps.hash32(col("k")), bloom))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("capPerKey keeps at most n per key, best-first, deterministic ties") {
    val rows = Seq(("s1", 1L, 10L), ("s1", 2L, 10L), ("s1", 3L, 5L),
      ("s1", 4L, 20L), ("s2", 5L, 1L)).toDF("src", "id", "sz")
    val out = TextOps.capPerKey(rows, col("src"),
      Seq(col("sz").desc, col("id").asc), n = 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(4L, 1L, 5L)) // s1: 20 then the id-1 of the tied 10s
  }

  test("reshard is a permutation: every doc exactly once, positions contiguous") {
    val ids = (0L until 500L).toDF("doc_id")
    val out = TextOps.reshard(ids, "doc_id", nShards = 8, salt = "t").cache()
    assert(out.count() == 500)
    assert(out.select(col("doc_id")).distinct().count() == 500)
    // per shard: positions are 1..count(shard)
    val bad = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
    // deterministic: a second run gives the identical assignment
    val again = TextOps.reshard(ids, "doc_id", nShards = 8, salt = "t")
    assert(out.exceptAll(again).count() == 0)
    out.unpersist()
  }

  test("ngrams keeps duplicates; shingles is its distinct set") {
    val d = Seq((0L, "x y x y")).toDF("doc_id", "text")
    val g = d.select(TextOps.ngrams(col("text"), 2).as("g"))
      .head().getSeq[String](0)
    assert(g == Seq("x y", "y x", "x y"))
    val s = d.select(Dedup.shingles(col("text"), 2).as("s"))
      .head().getSeq[String](0)
    assert(s.toSet == Set("x y", "y x") && s.length == 2)
  }

  test("token-budget sample: distributed prefix sum equals the global window") {
    val ids = (0L until 400L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = TextOps.tokenBudgetSample(ids, "doc_id", "text",
      budget = 300L, salt = "t", nBuckets = 8).cache()
    // naive single-window reference
    val h = TextOps.hash32(concat(col("doc_id").cast("string"), lit("_t")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = ids.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("toks"))
      .withColumn("h", h)
      .withColumn("cum_tokens", sum(col("toks")).over(w))
      .filter(col("cum_tokens") <= 300)
      .select(col("doc_id"), col("toks"), col("cum_tokens"))
    assert(out.exceptAll(naive).count() == 0 && naive.exceptAll(out).count() == 0)
    // the kept set fills the budget: max cum <= budget, and the next
    // doc in hash order would overflow it (or nothing was left)
    val mx = out.agg(max(col("cum_tokens"))).head().getLong(0)
    assert(mx <= 300)
    out.unpersist()
  }

  test("round-4 ops are null- and empty-safe") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType, nullable = true),
      StructField("text", StringType, nullable = true)))
    val weird = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "s1", "plain text here"),
        org.apache.spark.sql.Row(2L, "s1", ""),
        org.apache.spark.sql.Row(3L, null, "   "),
        org.apache.spark.sql.Row(4L, "s2", null))), schema)
    // ngrams: null -> null, token-less -> empty array
    val g = weird.select(col("doc_id"), TextOps.ngrams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(g(4L).isEmpty)
    assert(g(2L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty))
    assert(g(3L).exists(_.asInstanceOf[scala.collection.Seq[_]].isEmpty))
    // repetition stats: null -> null struct; empty -> zero counts with
    // null top_tok_cnt
    val r = weird.select(col("doc_id"),
      TextOps.repetitionStats(col("text")).as("r"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(4L).isEmpty)
    assert(r(2L).isDefined && r(3L).isDefined)
    // capPerKey: null keys form their own group (SQL GROUP BY-style)
    val capped = TextOps.capPerKey(weird, col("source"),
      Seq(col("doc_id").asc), n = 1)
    assert(capped.count() == 3) // s1, s2, null each keep one
    // token budget: null/empty docs count 0 tokens but stay sampleable
    val tb = TextOps.tokenBudgetSample(weird, "doc_id", "text",
      budget = 100L, salt = "t", nBuckets = 4)
    assert(tb.count() == 4)
  }

  test("late round-4 ops are null- and empty-safe") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType, nullable = true),
      StructField("text", StringType, nullable = true)))
    val weird = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "s1", "one two three four"),
        org.apache.spark.sql.Row(2L, "s1", ""),
        org.apache.spark.sql.Row(3L, "s1", null),
        org.apache.spark.sql.Row(4L, "s2", "one two three four"))), schema)

    // passage dedup: token-less docs are absent (no passages), dup
    // passages keep only the first (doc_id, pos) occurrence
    val pd = TextOps.passageDedup(weird, "doc_id", "text", chunk = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(!pd.contains(2L) && !pd.contains(3L))
    assert(pd(1L) == ((2L, 2L, "one two three four")))
    assert(pd(4L) == ((2L, 0L, ""))) // every passage seen at doc 1

    // temperature sampling: a 1-doc source has isqrt(1)=1 -> always
    // kept; verdicts don't change when other sources grow
    val ts = TextOps.temperatureSample(weird.filter(col("doc_id") === 4L)
      .unionByName(weird.filter(col("doc_id") < 4L)),
      col("doc_id"), col("source"))
    assert(ts.filter(col("doc_id") === 4L).count() == 1L)

    // BPE: a corpus of null/empty text learns nothing, no crash
    val m = Bpe.learn(spark, weird.filter(col("doc_id").isin(2L, 3L)),
      "text", rounds = 3)
    assert(m.count() == 0L)
  }

  test("passage dedup matches a naive reference on random corpora") {
    // naive: chunk every doc, keep a passage only the first time its
    // text is seen scanning docs in (doc_id, position) order
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c", "d", "e")
    val docs = (0L until 60L).map { i =>
      val n = rnd.nextInt(12)
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val chunk = 3
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val passages = toks.grouped(chunk).map(_.mkString(" ")).toSeq
        val kept = passages.filter(p => seen.add(p))
        Some(id -> ((passages.size.toLong, kept.size.toLong,
          kept.mkString(" "))))
      }
    }.toMap
    val got = TextOps.passageDedup(docs.toDF("doc_id", "text"),
      "doc_id", "text", chunk)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
  }

  test("triangle split emits exactly the monolithic join's pair set") {
    // 200 docs drawn from a tiny vocab -> dense sig collisions, so the
    // decomposition is exercised across hot buckets and both group
    // orderings (the round-4 bug: id_a<id_b at a cross-group key drops
    // pairs whose smaller id lands in the larger group)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val dense = (0L until 200L).map { i =>
      val toks = (0 until 12).map(j => vocab(((i * 7 + j * j + 3) % 6).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = dense.select(col("doc_id").as("id"),
      SketchExpressions.simhash60(col("text")).as("sig")).cache()
    def pairSet(g: Int) =
      Dedup.simhashPairsFromSigs(sigs, maxDist = 8, splitG = g)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mono = pairSet(1)
    val split = pairSet(8)
    assert(mono == split)
    assert(mono.nonEmpty) // the corpus must actually produce pairs
    assert(mono.forall { case (a, b, _) => a < b }) // normalized ordering
    sigs.unpersist()
  }

  test("fused ngrams kernel matches the HOF differential form") {
    val d = docs.union(Seq((9L, "a b  c   d e")).toDF("doc_id", "text"))
    for (n <- Seq(2, 3, 8)) {
      val fused = d.select(col("doc_id"), TextOps.ngrams(col("text"), n).as("g"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      val hof = d.select(col("doc_id"), TextOps.ngramsHof(col("text"), n).as("g"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1))
      assert(fused.toSeq == hof.toSeq, s"n=$n")
      val fusedD = d.select(TextOps.ngramsDistinct(col("text"), n).as("g"))
        .collect().map(_.getSeq[String](0))
      val hofD = d.select(array_distinct(TextOps.ngramsHof(col("text"), n)).as("g"))
        .collect().map(_.getSeq[String](0))
      assert(fusedD.toSeq == hofD.toSeq, s"distinct n=$n")
    }
  }
}
