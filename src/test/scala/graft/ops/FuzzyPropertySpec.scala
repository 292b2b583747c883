package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based parity for the fuzzy-linkage kernel against a naive
  * model, driven directly (no Spark job per case).
  */
object FuzzyPropertySpec extends Properties("graft.ops.fuzzy") {

  private val asciiStr: Gen[String] =
    Gen.listOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' ' :+ '#'))
      .map(_.mkString)

  private def naiveHamming(a: String, b: String): Long = {
    val n = math.min(a.length, b.length)
    math.abs(a.length - b.length).toLong +
      (0 until n).count(i => a(i) != b(i))
  }

  property("hammingEval == char model on ASCII") =
    forAll(asciiStr, asciiStr) { (a, b) =>
      FuzzyKernels.hammingEval(
        UTF8String.fromString(a), UTF8String.fromString(b)) == naiveHamming(a, b)
    }

  property("hamming is a metric: symmetry, identity, triangle") =
    forAll(asciiStr, asciiStr, asciiStr) { (a, b, c) =>
      def h(x: String, y: String) = FuzzyKernels.hammingEval(
        UTF8String.fromString(x), UTF8String.fromString(y))
      (h(a, b) == h(b, a)) :| "symmetry" &&
        (h(a, a) == 0L) :| "identity" &&
        (h(a, c) <= h(a, b) + h(b, c)) :| "triangle"
    }

  // the pigeonhole blocking premise, stated as a property: if two
  // equal-width keys are within hamming k, at least one of the k+1
  // contiguous segments is identical (this is what makes q107's
  // candidate generation recall-complete)
  private val fixedKey: Gen[String] =
    Gen.listOfN(24, Gen.oneOf(('a' to 'z') :+ '#')).map(_.mkString)

  property("hd <= k implies a shared segment (k=2, 3 segments of 8)") =
    forAll(fixedKey, Gen.listOfN(2, Gen.zip(Gen.choose(0, 23),
      Gen.oneOf('a' to 'z')))) { (key, edits) =>
      val edited = edits.foldLeft(key) { case (s, (i, ch)) =>
        s.updated(i, ch) }
      val hd = naiveHamming(key, edited)
      val shared = (0 until 3).exists(s =>
        key.substring(s * 8, s * 8 + 8) == edited.substring(s * 8, s * 8 + 8))
      (hd > 2) || shared
    }
}
