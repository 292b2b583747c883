package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class NaiveBayesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "NaiveBayesSpec")
  import spark.implicits._

  private def confusion(train: Seq[(Long, String, String)],
      test: Seq[(Long, String, String)]) =
    NaiveBayes.confusion(train.toDF("doc_id", "cls", "text"),
      test.toDF("doc_id", "cls", "text"), "doc_id", "cls", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("separable vocabularies classify perfectly (pure diagonal)") {
    val train = Seq(
      (1L, "a", "apple apple banana apple"),
      (2L, "a", "banana apple apple"),
      (3L, "b", "zebra yak zebra zebra"),
      (4L, "b", "yak yak zebra"))
    val test = Seq(
      (10L, "a", "apple banana apple"),
      (11L, "b", "zebra zebra yak"),
      (12L, "a", "banana banana"))
    assert(confusion(train, test) == Seq(("a", "a", 2L), ("b", "b", 1L)))
  }

  test("unseen tokens fall back to smoothing, not a crash or skew") {
    val train = Seq(
      (1L, "a", "apple apple apple apple apple apple"),
      (2L, "b", "zebra"))
    // doc of only-unseen tokens: likelihoods differ only through the
    // class denominators (tot(c) + V); class b has the smaller
    // denominator (1+3 < 6+3) so the smoothed mass is LARGER -> b
    val test = Seq((10L, "a", "quux corge"))
    assert(confusion(train, test) == Seq(("a", "b", 1L)))
  }

  test("argmax tie breaks to the lexicographically smallest class") {
    // classes 'x' and 'y' are exact mirrors of each other, so every
    // score ties; prediction must be 'x' for both test docs
    val train = Seq(
      (1L, "x", "foo bar"),
      (2L, "y", "foo bar"))
    val test = Seq((10L, "x", "foo"), (11L, "y", "bar"))
    assert(confusion(train, test) == Seq(("x", "x", 1L), ("y", "x", 1L)))
  }

  test("multiplicity matters: repeated tokens weigh the score") {
    val train = Seq(
      (1L, "a", "red red red blue"),
      (2L, "b", "blue blue blue red"))
    val test = Seq((10L, "a", "red red blue"), (11L, "b", "blue blue red"))
    assert(confusion(train, test) == Seq(("a", "a", 1L), ("b", "b", 1L)))
  }

  test("label-error candidates surface the mislabeled doc, ranked by margin") {
    val train = Seq(
      (1L, "a", "apple apple banana apple apple"),
      (2L, "a", "banana apple apple apple"),
      (3L, "b", "zebra yak zebra zebra yak"),
      (4L, "b", "yak yak zebra zebra"))
    val test = Seq(
      (10L, "b", "apple apple banana apple apple apple"), // wrong label, strong
      (11L, "a", "apple banana"),                         // correct label
      (12L, "a", "zebra yak"))                            // wrong label, weaker
    val got = NaiveBayes.labelErrorCandidates(
      train.toDF("doc_id", "cls", "text"),
      test.toDF("doc_id", "cls", "text"), "doc_id", "cls", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    // both mislabeled docs appear (correct one filtered), 10 first:
    // six misfit tokens beat two
    assert(got == Seq((10L, "b", "a"), (12L, "a", "b")))
  }

  test("collocations rank exclusive pairs above promiscuous ones") {
    val docs = Seq(
      // "new york" is exclusive (3/(3*3)); "the ..." pairs dilute
      // through the promiscuous "the" (2/(6*2))
      (1L, "new york new york new york"),
      (2L, "the cat the cat the dog the dog the bird the fish"))
      .toDF("doc_id", "text")
    val got = TextOps.collocations(docs, "text", k = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .toSeq
    assert(got.head == ("new york", 3L, 333333L))
    // scores non-increasing, and the exclusive pair dominates
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }
}
