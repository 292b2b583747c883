package graft.parse

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.unsafe.types.UTF8String

import graft.model.QueryPattern

/** Property-based round-trips over the pure parse kernels (SURVEY.md
  * §5.2). These drive SlowQueryLexer/SlowQueryCatalog directly — the
  * same code the Catalyst expressions execute per row — so hundreds of
  * generated cases run without Spark job overhead.
  */
object LexPropertySpec extends Properties("graft.parse") {

  private val prefixGen = Gen.oneOf("WARN ", "node1 ERROR ", "", "x Query slow ")
  private val durGen = Gen.chooseNum(0L, 999999L)
  private val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val queryGen = for {
    kw <- Gen.oneOf("SELECT", "select", "INSERT INTO", "DELETE FROM", "UPDATE")
    tbl <- wordGen
    colName <- wordGen
  } yield s"$kw x FROM $tbl WHERE $colName=?"

  private val bvGen: Gen[List[(String, String)]] =
    Gen.listOfN(3, for { k <- wordGen; v <- wordGen } yield (k, v))

  property("round-trip: constructed message lexes back to its parts") =
    Prop.forAll(prefixGen, durGen, queryGen, bvGen) { (prefix, dur, query, bvs) =>
      val bvStr = bvs.map { case (k, v) => s"$k:'$v'" }.mkString("[", ", ", "]")
      val msg = s"${prefix}Query too slow, took $dur ms: " +
        s"[${bvs.length} bound values] $query; $bvStr"
      val row = SlowQueryLexer.evalRow(UTF8String.fromString(msg))
      row != null &&
        row.getUTF8String(0).toString == dur.toString &&
        row.getLong(1) == dur &&
        row.getUTF8String(2).toString == s"[${bvs.length} bound values]" &&
        row.getUTF8String(4).toString == s"$query;" &&
        SlowQueryCatalog.parseBoundValues(row.getUTF8String(3).toString) == bvs.toMap
    }

  property("bound-values parser never throws; keys trimmed, bracket-free") =
    Prop.forAll { (s: String) =>
      val out = SlowQueryCatalog.parseBoundValues(s)
      out.keys.forall(k => !k.startsWith(" ") && !k.endsWith(" ") &&
        !k.contains("[") && !k.contains("]"))
    }

  property("lexer never throws on arbitrary strings") =
    Prop.forAll { (s: String) =>
      SlowQueryLexer.evalRow(UTF8String.fromString(s))
      true
    }

  property("strSlice agrees with an independent model") =
    Prop.forAll(wordGen, wordGen, wordGen) { (a, b, c) =>
      val s = s"$a FROM $b END $c"
      val model = {
        val i = s.indexOf(" FROM ")
        if (i < 0) null
        else {
          val rest = s.substring(i + 6)
          val j = rest.indexOf(" END ")
          if (j < 0) null else rest.substring(0, j)
        }
      }
      SlowQueryCatalog.strSlice(s, " FROM ", " END ") == model
    }

  property("pattern normalization replaces quoted space-delimited values") =
    Prop.forAll(wordGen, wordGen) { (p, v) =>
      val boilerplate = "SELECT z FROM t WHERE "
      (p != v && !p.contains(v) && !boilerplate.contains(v) && !v.contains(p)) ==> {
        val q = s"$boilerplate$p='$v' AND other=1;"
        val cat = SlowQueryCatalog(Map.empty, Map.empty, Map.empty,
          Seq(QueryPattern("SELECT z", Seq(p))))
        val row = cat.enrichInternal(UTF8String.fromString(q), null, null)
        val norm = row.getUTF8String(1).toString
        !norm.contains(s"'$v'") && norm.contains(s"$p=?")
      }
    }
}
