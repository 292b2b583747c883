package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** BPE vocabulary learning against hand-computed merges on the classic
  * Sennrich corpus, plus the a==b run-merge edge case that the
  * separator-string replace encoding must get right.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "BpeSpec")
  import spark.implicits._

  test("learn reproduces hand-computed merges on the classic corpus") {
    // low:3 lower:2 newest:5 widest:3 — the worked example from the
    // original BPE paper. Hand-derived merge sequence with the
    // (count desc, lhs, rhs) tie-break:
    //  1: (e,s)  8   2: (es,t) 8   3: (e,w) 5   4: (ew,est) 5
    val docs = Seq(
      "low low low lower lower",
      "newest newest newest newest newest",
      "widest widest widest").toDF("text")
    val m = Bpe.learn(spark, docs, "text", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1L, "e", "s", "es", 8L),
      (2L, "es", "t", "est", 8L),
      (3L, "e", "w", "ew", 5L),
      (4L, "ew", "est", "ewest", 5L)))
  }

  test("encode applies the learned merges: Sennrich corpus token counts") {
    // after 4 merges (es, est, ew, ewest): newest -> [n,ewest] = 2,
    // widest -> [w,i,d,est] = 4, low -> [l,o,w] = 3,
    // lower -> [l,o,w,e,r] = 5
    val docs = Seq(
      (0L, "low low low lower lower"),
      (1L, "newest newest newest newest newest"),
      (2L, "widest widest widest")).toDF("doc_id", "text")
    val enc = Bpe.encode(spark, docs, "doc_id", "text", rounds = 4)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.Scratch.release()
    assert(enc.toSeq == Seq(
      (0L, 5L, 3L * 3 + 2L * 5), // 3 low + 2 lower = 19
      (1L, 5L, 5L * 2),          // 5 newest = 10
      (2L, 3L, 3L * 4)))         // 3 widest = 12
  }

  test("a==b runs merge left-to-right non-overlapping") {
    // "aaaa" x2: round 1 counts 3 adjacent (a,a) positions per word
    // (6 total) and segments to [aa, aa]; round 2 merges (aa,aa) = 2.
    val docs = Seq("aaaa aaaa").toDF("text")
    val m = Bpe.learn(spark, docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L)))
  }

  test("learn stops early when no pairs remain") {
    val docs = Seq("x y z").toDF("text") // all 1-char words after r1? no pairs at all
    val m = Bpe.learn(spark, docs, "text", rounds = 5).collect()
    assert(m.isEmpty)
  }

  test("tokens containing line terminators segment fully (dotall)") {
    // tokens() splits on single spaces, so a token CAN contain \n.
    // Without (?s), Java's '.' skips \n and the bare newline corrupts
    // the separator encoding (and RE2's '.' skips a DIFFERENT set, so
    // the two engines would corrupt differently — invisible to any
    // hash compare). Pairs here: (x,\n):3, (\n,y):3, (z,z):2 — the
    // (cnt desc, lhs, rhs) tie-break picks lhs '\n' < 'x'.
    val docs = Seq("x\ny x\ny x\ny", "zz zz").toDF("text")
    val m = Bpe.learn(spark, docs, "text", rounds = 1).collect()
    assert(m.length == 1)
    assert(m(0).getString(1) == "\n" && m(0).getString(2) == "y"
      && m(0).getLong(4) == 3L)
  }

  test("literal separator chars are stripped from tokens before segmenting") {
    // U+001F inside a token would corrupt the boundary encoding
    // IDENTICALLY in both engines — stripped up front instead
    val docs = Seq("ab ab").toDF("text")
    val m = Bpe.learn(spark, docs, "text", rounds = 1).collect()
    assert(m.length == 1)
    assert(m(0).getString(1) == "a" && m(0).getString(2) == "b"
      && m(0).getLong(4) == 2L)
  }

  test("corpus text never contains the separator char") {
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").contains(Bpe.Sep)).count()
    assert(n == 0L)
  }
}
