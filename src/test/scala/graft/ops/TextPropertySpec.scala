package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.unsafe.types.UTF8String

/** Property-based parity for the round-4 text kernels against naive
  * Scala references — kernel code paths driven directly (no Spark job
  * per case), generated inputs including empty strings, runs of
  * spaces, and repeated tokens.
  */
object TextPropertySpec extends Properties("graft.ops.text") {

  private val tokGen = Gen.oneOf("a", "b", "cc", "d1", "the", "x")
  private val textGen: Gen[String] = for {
    toks <- Gen.listOf(tokGen)
    seps <- Gen.listOfN(math.max(toks.length - 1, 0), Gen.oneOf(" ", "  ", "   "))
  } yield toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString

  private def naiveToks(text: String): List[String] =
    text.split(" ", -1).filter(_.nonEmpty).toList

  private def naiveNgrams(text: String, n: Int): List[String] = {
    val t = naiveToks(text)
    if (t.length < n) Nil else t.sliding(n).map(_.mkString(" ")).toList
  }

  property("ngrams kernel == naive sliding join (dup and distinct)") =
    Prop.forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val fused = TextKernels.ngrams(text, n, distinct = false)
        .map(_.asInstanceOf[UTF8String].toString).toList
      val fusedD = TextKernels.ngrams(text, n, distinct = true)
        .map(_.asInstanceOf[UTF8String].toString).toList
      fused == naiveNgrams(text, n) && fusedD == naiveNgrams(text, n).distinct
    }

  property("repetition kernel == naive frequency counting") =
    Prop.forAll(textGen) { text =>
      val r = TextKernels.repetitionStats(text)
      val t = naiveToks(text)
      val topNaive =
        if (t.isEmpty) null else t.groupBy(identity).values.map(_.size).max
      val bigrams = naiveNgrams(text, 2)
      r.getInt(0) == t.length &&
        (if (t.isEmpty) r.isNullAt(1) else r.getInt(1) == topNaive) &&
        r.getInt(2) == bigrams.length &&
        r.getInt(3) == bigrams.length - bigrams.distinct.length
    }

  private def naiveWinnow(text: String, n: Int, w: Int): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = naiveToks(text).sliding(n).filter(_.length == n)
      .map(g => SketchKernels.hash60(md, g.mkString(" "))).toVector
    if (hs.length < w) Set.empty
    else hs.sliding(w).map(_.min).toSet
  }

  property("winnow kernel == naive window minima over ngram hashes") =
    Prop.forAll(textGen, Gen.choose(1, 4), Gen.choose(2, 6)) { (text, n, w) =>
      TextKernels.winnow(text, n, w).map(_.asInstanceOf[Long]).toSet ==
        naiveWinnow(text, n, w)
    }

  property("winnowing guarantee: a shared n+w-1 run shares a fingerprint") =
    Prop.forAll(Gen.listOfN(8, tokGen), Gen.listOf(tokGen),
      Gen.listOf(tokGen), Gen.listOf(tokGen), Gen.listOf(tokGen)) {
      (run, p1, s1, p2, s2) =>
        // n=4, w=5 -> any shared contiguous run of 8 tokens guarantees
        // at least one common fingerprint, whatever surrounds it
        val a = (p1 ++ run ++ s1).mkString(" ")
        val b = (p2 ++ run ++ s2).mkString(" ")
        val fa = TextKernels.winnow(a, 4, 5).map(_.asInstanceOf[Long]).toSet
        val fb = TextKernels.winnow(b, 4, 5).map(_.asInstanceOf[Long]).toSet
        fa.intersect(fb).nonEmpty
    }

  property("sorted intersect count == distinct set intersection size") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 30L)), Gen.listOf(Gen.choose(0L, 30L))) {
      (a, b) =>
        val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          a.sorted.toArray)
        val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          b.sorted.toArray)
        SketchKernels.sortedIntersectCount(ad, bd) ==
          a.toSet.intersect(b.toSet).size
    }
}
