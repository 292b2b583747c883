package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class AuditOpsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "AuditOpsSpec")
  import spark.implicits._

  test("redactionAudit: per-rule counts, hits, and exact char deltas") {
    val df = Seq(
      ("a", "id 123456 and 9876543 end"), // 2 digit-run matches
      ("a", "no digits here"),            // 0 matches
      ("b", "777777")                     // 1 match, whole string
    ).toDF("g", "txt")
    val rules = Seq(Scrub.Rule("digit_run", "[0-9]{6,}", "<ID>"))
    val got = Scrub.redactionAudit(df, col("txt"), col("g"), rules)
      .orderBy(col("grp"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // deltas: "123456"(6)+"9876543"(7) -> "<ID>"(4) twice = 13-8 = 5;
    // "777777"(6) -> 4 chars = delta 2
    assert(got.toSeq == Seq(
      ("a", "digit_run", 2L, 1L, 2L, 5L),
      ("b", "digit_run", 1L, 1L, 1L, 2L)))
  }

  test("redactionAudit: multiple rules audited independently per row") {
    val df = Seq(("g", "Customer#000001 met Supplier#000002")).toDF("g", "txt")
    val rules = Seq(
      Scrub.Rule("digit_run", "[0-9]{6,}", "<ID>"),
      Scrub.Rule("entity_tag", "(Customer|Supplier)#", "<ENT>#"))
    val got = Scrub.redactionAudit(df, col("txt"), col("g"), rules)
      .orderBy(col("category"))
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(5)))
    // digit_run: two 6-char runs -> <ID> = (6-4)*2 = 4
    // entity_tag: Customer#(9) and Supplier#(9) -> <ENT>#(6) = 3+3 = 6
    assert(got.toSeq == Seq(("digit_run", 2L, 4L), ("entity_tag", 2L, 6L)))
  }

  test("redact applies rules in order and rejects $ masks") {
    val out = Seq(("x123456y"))
      .toDF("t")
      .select(Scrub.redact(col("t"),
        Seq(Scrub.Rule("d", "[0-9]{6,}", "<ID>"),
          Scrub.Rule("tag", "x<ID>", "<X>"))).as("r"))
      .head().getString(0)
    assert(out == "<X>y") // second rule sees the first rule's mask
    intercept[IllegalArgumentException] {
      Scrub.redactionAudit(Seq(("g", "t")).toDF("g", "t"), col("t"),
        col("g"), Seq(Scrub.Rule("bad", "a", "$1")))
    }
  }

  test("sourceOverlapExact: exact unigram jaccard, zero-overlap pairs kept") {
    val df = Seq(
      ("s1", "a b c"), ("s1", "c d"),   // s1 tokens {a,b,c,d}
      ("s2", "c d e"),                  // s2 tokens {c,d,e}
      ("s3", "zz")                      // s3 tokens {zz} — disjoint
    ).toDF("source", "text")
    val got = Dedup.sourceOverlapExact(df, "source", "text", n = 1)
      .orderBy(col("src_a"), col("src_b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("s1", "s2", 2L, 4L, 3L, 400L), // {c,d} / {a,b,c,d,e} = 2/5
      ("s1", "s3", 0L, 4L, 1L, 0L),
      ("s2", "s3", 0L, 3L, 1L, 0L)))
  }

  test("sourceOverlapExact: default n=3 measures shingle sets, not vocab") {
    // same vocabulary, shifted word order: unigram jaccard is 1000,
    // trigram jaccard is 0 — the statistic q120's minhash estimates
    val df = Seq(
      ("s1", "a b c d"), // 3-grams {a b c, b c d}
      ("s2", "d c b a")  // 3-grams {d c b, c b a}
    ).toDF("source", "text")
    val tri = Dedup.sourceOverlapExact(df, "source", "text").head()
    assert(tri.getAs[Long]("inter") == 0L &&
      tri.getAs[Long]("jaccard_permille") == 0L)
    val uni = Dedup.sourceOverlapExact(df, "source", "text", n = 1).head()
    assert(uni.getAs[Long]("jaccard_permille") == 1000L)
  }

  test("winsorizedStats: exact cutoffs, clipped sum and counts") {
    // group g: values 1..10 once each; p[200,800] -> lo_cut = smallest
    // v with cum*1000 >= 10*200 (cum >= 2) = 2; hi_cut: cum >= 8 -> 8
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("grp0", "v0")
    val got = TextOps.winsorizedStats(df, col("grp0"), col("v0"), 200, 800)
      .head()
    assert(got.getAs[Long]("lo_cut") == 2L)
    assert(got.getAs[Long]("hi_cut") == 8L)
    // winsor sum: 2 + (2..8 as-is) + 8 = 2+35+8 ... values 1->2,
    // 2..8 sum 35, 9->8, 10->8 => 2+35+8+8 = 53
    assert(got.getAs[Long]("winsor_sum") == 53L)
    assert(got.getAs[Long]("clipped_lo") == 1L)
    assert(got.getAs[Long]("clipped_hi") == 2L)
    assert(got.getAs[Long]("winsor_mean_permille") == 5300L)
  }

  test("thresholdSweep: exact precision/recall/f1 at every threshold") {
    // scores/labels: (3,1) (3,0) (2,1) (1,0) — total_pos = 2
    val df = Seq((3, 1L), (3, 0L), (2, 1L), (1, 0L)).toDF("s", "l")
    val got = Eval.thresholdSweep(df, col("s"), col("l"))
      .orderBy(col("threshold"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      // t=1: pred all 4, tp=2 -> p=500, r=1000, f1=2*2*1000/(4+2)=666
      (1, 4L, 2L, 500L, 1000L, 666L),
      // t=2: pred 3, tp=2 -> p=666, r=1000, f1=4000/5=800
      (2, 3L, 2L, 666L, 1000L, 800L),
      // t=3: pred 2, tp=1 -> p=500, r=500, f1=2000/4=500
      (3, 2L, 1L, 500L, 500L, 500L)))
  }

  test("thresholdSweep: zero positives yields zero recall, no crash") {
    val df = Seq((5, 0L), (7, 0L)).toDF("s", "l")
    val got = Eval.thresholdSweep(df, col("s"), col("l"))
      .orderBy(col("threshold"))
      .collect().map(r => (r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0L), (0L, 0L)))
  }

  test("embeddingAudit: zero vectors, ragged dims, exact norm units") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),       // norm2 = 1e12 -> n2u = 1e6
      (2L, Array(0.0f, 0.0f)),       // zero vector, dims 2
      (3L, Array(2.0f))              // ragged: dims 1, norm2u = 4e6
    ).toDF("vec_id", "embedding")
    val got = Quantize.embeddingAudit(df, "embedding")
      .orderBy(col("dims"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1, 1L, 0L, 4000000L, 4000000L),
      (2, 2L, 1L, 1000000L, 500000L)))
  }

  test("replication invariance: cutoffs and sweep ratios survive k-fold copies") {
    // the scaling argument the ScaleProbe comment makes: replicating
    // every row k-fold multiplies histogram counts by k but leaves
    // ranks-in-permille (and hence cutoffs, precision, recall) fixed
    val base = Seq((1, 1L), (5, 0L), (9, 1L), (13, 0L), (21, 1L))
      .toDF("s", "l")
    val rep = base.union(base).union(base)
    val w1 = TextOps.winsorizedStats(base, lit("g"), col("s"), 200, 800)
      .select("lo_cut", "hi_cut", "winsor_mean_permille").head()
    val w3 = TextOps.winsorizedStats(rep, lit("g"), col("s"), 200, 800)
      .select("lo_cut", "hi_cut", "winsor_mean_permille").head()
    assert(w1 == w3)
    val s1 = Eval.thresholdSweep(base, col("s"), col("l"))
      .select("threshold", "precision_permille", "recall_permille")
      .orderBy(col("threshold")).collect().toSeq
    val s3 = Eval.thresholdSweep(rep, col("s"), col("l"))
      .select("threshold", "precision_permille", "recall_permille")
      .orderBy(col("threshold")).collect().toSeq
    assert(s1 == s3)
    // KS and Gini are distribution statistics: k-fold replication
    // (every count x3) must leave them bit-identical
    val kdf = Seq(("g1", 1L), ("g1", 2L), ("g2", 2L), ("g2", 4L))
      .toDF("g", "v")
    val krep = kdf.union(kdf).union(kdf)
    def ks(df: org.apache.spark.sql.DataFrame) =
      Eval.ksDrift(df, col("g"), col("v"))
        .select("grp", "ks_permille").orderBy("grp").collect().toSeq
    assert(ks(kdf) == ks(krep))
    val sk1 = Skew.keySkewProfile(kdf, col("g")).head()
    val sk3 = Skew.keySkewProfile(krep, col("g")).head()
    assert(sk1.getAs[Long]("gini_permille") == sk3.getAs[Long]("gini_permille"))
    assert(sk1.getAs[Long]("top1_permille") == sk3.getAs[Long]("top1_permille"))
  }

  test("winsorizedStats: [0, 1000] clips nothing") {
    val df = Seq(("g", 5L), ("g", 100L), ("h", 7L)).toDF("g", "v")
    val got = TextOps.winsorizedStats(df, col("g"), col("v"), 0, 1000)
      .orderBy(col("grp"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("winsor_sum"),
        r.getAs[Long]("clipped_lo") + r.getAs[Long]("clipped_hi")))
    assert(got.toSeq == Seq(("g", 105L, 0L), ("h", 7L, 0L)))
  }

  test("groupAuc: perfect / inverted / all-ties / degenerate groups") {
    val df = Seq(
      // perfect separation: positives strictly above negatives
      ("sep", 1, 0L), ("sep", 2, 0L), ("sep", 3, 1L), ("sep", 4, 1L),
      // inverted: the single positive sits below the negative
      ("inv", 1, 1L), ("inv", 2, 0L),
      // all scores tied: AUC is exactly 1/2
      ("tie", 5, 0L), ("tie", 5, 1L),
      // no negatives: AUC undefined -> NULL
      ("deg", 7, 1L), ("deg", 8, 1L)
    ).toDF("g", "s", "l")
    val got = Eval.groupAuc(df, col("g"), col("s"), col("l"))
      .orderBy(col("grp"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"),
        Option(r.getAs[java.lang.Long]("auc_permille"))))
    assert(got.toSeq == Seq(
      ("deg", 2L, 2L, None),
      ("inv", 2L, 1L, Some(0L)),
      ("sep", 4L, 2L, Some(1000L)),
      ("tie", 2L, 1L, Some(500L))))
  }

  test("groupAuc: tie-broken mid case and replication invariance") {
    // scores: neg{1, 3, 3}, pos{3, 5}: pairs won = (3>1) + (5>all 3) = 4,
    // half-credit for the two (3,3) ties = 1 -> U = 5 of 6 -> 833
    val base = Seq(("g", 1, 0L), ("g", 3, 0L), ("g", 3, 0L),
      ("g", 3, 1L), ("g", 5, 1L)).toDF("g", "s", "l")
    def auc(df: org.apache.spark.sql.DataFrame): Long =
      Eval.groupAuc(df, col("g"), col("s"), col("l"))
        .head().getAs[Long]("auc_permille")
    assert(auc(base) == 833L)
    assert(auc(base.union(base).union(base)) == 833L)
  }

  test("ksDrift: disjoint halves, identical group, and a gap between steps") {
    val df = Seq(
      ("lo", 1L), ("lo", 2L),  // ECDF jumps to 1 by v=2
      ("hi", 3L), ("hi", 4L)   // ECDF still 0 at v=2
    ).toDF("g", "v")
    val got = Eval.ksDrift(df, col("g"), col("v"))
      .orderBy(col("grp"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n"),
        r.getAs[Long]("ks_permille")))
    // at v=2: |ECDF_lo - ECDF_all| = |1 - 1/2| = 1/2; symmetric for hi
    assert(got.toSeq == Seq(("hi", 2L, 500L), ("lo", 2L, 500L)))
    // a group that IS the corpus drifts zero
    val solo = Seq(("g", 1L), ("g", 9L)).toDF("g", "v")
    assert(Eval.ksDrift(solo, col("g"), col("v"))
      .head().getAs[Long]("ks_permille") == 0L)
  }

  test("ksDrift: supremum between group steps is caught") {
    // g1 = {1, 10}, g2 = {2,...,9}: between g1's steps the global
    // ECDF keeps climbing — the max gap sits just BEFORE v=10,
    // where cum_g1 = 1/2 and cum_all = 9/10: D = 2/5
    val df = (Seq(("g1", 1L), ("g1", 10L)) ++
      (2L to 9L).map(("g2", _))).toDF("g", "v")
    val d = Eval.ksDrift(df, col("g"), col("v"))
      .orderBy(col("grp")).collect()
    assert(d(0).getAs[Long]("ks_permille") == 400L)
  }

  test("vocabRichness: chao1 from singleton/doubleton counts") {
    val df = Seq(
      // s1: a a b c d -> D=4, f1=3 (b c d), f2=1 (a)
      //     chao1 = 4 + 3*2 DIV (2*2) = 5
      ("s1", "a a b c d"),
      // s2: x x -> D=1, f1=0, f2=1, chao1 = 1
      ("s2", "x x")
    ).toDF("src", "txt")
    val got = TextOps.vocabRichness(df, col("src"), col("txt"))
      .orderBy(col("grp"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("d_observed"), r.getAs[Long]("f1"),
        r.getAs[Long]("f2"), r.getAs[Long]("chao1")))
    assert(got.toSeq == Seq(
      ("s1", 5L, 4L, 3L, 1L, 5L),
      ("s2", 2L, 1L, 0L, 1L, 1L)))
  }

  test("centroidDistances: exact micros centroids, ragged rows excluded") {
    val df = Seq(
      (0, Array(0f, 0f)), (0, Array(2f, 2f)), // centroid (1e6, 1e6)
      (1, Array(-1f, 3f)),                    // centroid (-1e6, 3e6)
      (1, Array(7f))                          // ragged -> excluded
    ).toDF("label", "embedding")
    val got = Quantize.centroidDistances(df, "embedding", col("label"), 2)
      .head()
    // diff (2e6, -2e6): d2 = 8e12 -> dist2u = 8e6; n counts post-filter
    assert((got.getAs[Int]("grp_a"), got.getAs[Int]("grp_b"),
      got.getAs[Long]("n_a"), got.getAs[Long]("n_b"),
      got.getAs[Long]("dist2u")) == (0, 1, 2L, 1L, 8000000L))
  }

  test("centroidDistances: negative sums divide by truncation (DuckDB parity)") {
    // label 0 sums to -1000001 micros over 2 rows: trunc -> -500000
    // (floor would give -500001 and a dist2u of 250001)
    val df = Seq(
      (0, Array(-1f, 0f)), (0, Array(-0.000001f, 0f)),
      (1, Array(0f, 0f))
    ).toDF("label", "embedding")
    val got = Quantize.centroidDistances(df, "embedding", col("label"), 2)
      .head()
    assert(got.getAs[Long]("dist2u") == 250000L)
  }

  test("encodingAudit: U+FFFD, control chars, non-ASCII density, space runs") {
    val df = Seq(
      ("a", "héllo"),    // 5 chars, 1 non-ascii
      ("a", "a\u0001b"),      // bare control char
      ("a", "a�b"),      // replacement char (also non-ascii)
      ("a", "x  y"),          // space run of 2
      ("a", "t\tn\n"),        // tab/newline are NOT control by contract
      ("b", null)             // NULL text excluded
    ).toDF("src", "txt")
    val got = Scrub.encodingAudit(df, col("txt"), col("src")).head()
    assert((got.getAs[String]("grp"), got.getAs[Long]("n_docs"),
      got.getAs[Long]("docs_replacement"), got.getAs[Long]("docs_control"),
      got.getAs[Long]("n_chars"), got.getAs[Long]("n_nonascii"),
      got.getAs[Long]("nonascii_permille"), got.getAs[Long]("max_ws_run"))
      == ("a", 5L, 1L, 1L, 19L, 2L, 105L, 2L))
  }

  test("chi2Independence: exact cell contributions, zero cells included") {
    // symmetric 2x2: every cell E=15, dev^2 = 300^2, den = 54000
    // -> contrib = floor(9e4 * 1e6 / 5.4e4) = 1666666 each
    val sym = (Seq.fill(10)(("r1", "a")) ++ Seq.fill(20)(("r1", "b")) ++
      Seq.fill(20)(("r2", "a")) ++ Seq.fill(10)(("r2", "b")))
      .toDF("src", "lng")
    val gotSym = Eval.chi2Independence(sym, col("src"), col("lng"))
      .collect()
    assert(gotSym.forall(_.getAs[Long]("contrib_micros") == 1666666L))
    assert(gotSym.forall(_.getAs[Long]("chi2_total_micros") == 6666664L))
    assert(gotSym.forall(_.getAs[Long]("exp_milli") == 15000L))
    // zero cell (r1, b) must appear with its expected count
    val z = (Seq.fill(2)(("r1", "a")) ++ Seq(("r2", "a"), ("r2", "b")))
      .toDF("src", "lng")
    val zero = Eval.chi2Independence(z, col("src"), col("lng"))
      .filter(col("r") === "r1" && col("c") === "b").head()
    assert((zero.getAs[Long]("obs"), zero.getAs[Long]("exp_milli"),
      zero.getAs[Long]("contrib_micros")) == (0L, 500L, 500000L))
  }

  test("pearson: perfect / inverted / uncorrelated / degenerate groups") {
    val df = Seq(
      ("pos", 1L, 10L), ("pos", 2L, 20L), ("pos", 3L, 30L), // corr 1
      ("neg", 1L, 3L), ("neg", 2L, 2L), ("neg", 3L, 1L),    // corr -1
      // symmetric V shape: num = 0 -> corr 0
      ("zero", 1L, 1L), ("zero", 2L, 0L), ("zero", 3L, 1L),
      ("flat", 1L, 5L), ("flat", 2L, 5L)                    // deny 0 -> NULL
    ).toDF("g", "x", "y")
    val got = Eval.pearson(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(got == Map("pos" -> Some(1.0), "neg" -> Some(-1.0),
      "zero" -> Some(0.0), "flat" -> None))
  }

  test("olsTrend: exact slopes, truncation on negative fractions, flat-x NULL") {
    val df = Seq(
      ("up", 0L, 0L), ("up", 1L, 2L), ("up", 2L, 4L),       // slope 2
      ("frac", 0L, 0L), ("frac", 1L, 1L), ("frac", 2L, 1L), // slope 1/2
      // x in {0,1,3}, num=-5, den=14: -5e6/14 = -357142.857 -> TRUNC
      // -357142 (floor would give -357143 — this pins the semantics)
      ("neg", 0L, 1L), ("neg", 1L, 1L), ("neg", 3L, 0L),
      ("flat", 7L, 1L), ("flat", 7L, 5L)                    // den 0 -> NULL
    ).toDF("g", "x", "y")
    val got = Eval.olsTrend(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("grp") ->
        Option(r.getAs[java.lang.Long]("slope_micro"))).toMap
    assert(got == Map("up" -> Some(2000000L), "frac" -> Some(500000L),
      "neg" -> Some(-357142L), "flat" -> None))
  }

  test("keySkewProfile: exact gini, percentiles, hottest-key share") {
    // key sizes ascending: 1, 1, 2, 4 -> n_keys 4, n_rows 8
    // gini = sum((2i-n-1)*x_i)/(n*sum) = (-3-1+2+12)/32 = 312 permille
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val got = Skew.keySkewProfile(df, col("k")).head()
    assert((got.getAs[Long]("n_keys"), got.getAs[Long]("n_rows"),
      got.getAs[Long]("top1_cnt"), got.getAs[Long]("top1_permille"),
      got.getAs[Long]("p50_cnt"), got.getAs[Long]("p99_cnt"),
      got.getAs[Long]("gini_permille"))
      == (4L, 8L, 4L, 500L, 1L, 4L, 312L))
    // uniform keys: gini exactly 0
    val uni = (1 to 6).map(i => s"k$i").toDF("k")
    assert(Skew.keySkewProfile(uni, col("k")).head()
      .getAs[Long]("gini_permille") == 0L)
  }

  test("truncationRecall: prefix ranking diverges from full ranking") {
    // probe v0 = [1, 0]; full-cosine top-2 is {v3, v1} (v3's tiny
    // negative tail beats v1's), but the 1-dim prefix ranks all of
    // v1/v2/v3 at cos=1 and tie-breaks by id -> {v1, v2}: overlap 1
    val df = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0.01f)),
      (2L, Array(1f, 1f)),
      (3L, Array(1f, -0.005f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.truncationRecall(df, "vec_id", "embedding",
      nProbes = 1, k = 2, prefixDims = 1).head()
    assert((got.getAs[Long]("pid"), got.getAs[Long]("overlap_at_k"),
      got.getAs[Long]("overlap_permille")) == (0L, 1L, 500L))
    // same fixture, RBO@2 p=9/10: A_1 = 0 (tops disagree), A_2 = 1
    // -> (1/10)(0 + 0.9 * 1/2) = 0.045 -> 45000 ppm
    val rbo = Similarity.truncationRbo(df, "vec_id", "embedding",
      nProbes = 1, k = 2, prefixDims = 1).head()
    assert(rbo.getAs[Long]("rbo_ppm") == 45000L)
    // identical rankings (prefix == full dims): truncated RBO@k is
    // exactly 1 - p^k = 0.19 for k=2
    val same = Similarity.truncationRbo(df, "vec_id", "embedding",
      nProbes = 1, k = 2, prefixDims = 2).head()
    assert(same.getAs[Long]("rbo_ppm") == 190000L)
  }

  test("kAnonymity: class-size thresholds, risk shares, empty-below case") {
    // classes: (s1,a)x3, (s1,b)x1, (s2,a)x2 -> sizes {3,1,2}, total 6
    val df = Seq(("s1", "a"), ("s1", "a"), ("s1", "a"), ("s1", "b"),
      ("s2", "a"), ("s2", "a")).toDF("src", "lg")
    val got = Scrub.kAnonymity(df, Seq(col("src"), col("lg")), Seq(1, 2, 4))
      .orderBy(col("k")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // k=1: nothing below; k=2: one singleton class (1 doc, 166pm);
    // k=4: all three classes below (6 docs, 1000pm)
    assert(got.toSeq == Seq(
      (1, 0L, 0L, 6L, 0L),
      (2, 1L, 1L, 6L, 166L),
      (4, 3L, 6L, 6L, 1000L)))
  }

  test("calibrationBins: equal-width bins, inclusive upper edge, exact rates") {
    // scores 0..9 with label = score >= 5: 10 values, 5 bins of
    // width 2; bins 0-1 all negative, 3-4 all positive, bin 2 mixed
    val df = (0 to 9).map(s => (s.toLong, if (s >= 5) 1L else 0L))
      .toDF("score", "label")
    val got = Eval.calibrationBins(df, col("score"), col("label"), nbins = 5)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 0L, 0L), (1L, 2L, 0L, 0L, 2L), (2L, 2L, 1L, 500L, 4L),
      (3L, 2L, 2L, 1000L, 6L), (4L, 2L, 2L, 1000L, 8L)))
  }
}
