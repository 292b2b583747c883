package graft.parse

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential parity: 1,200 seeded-random log lines (600 structured,
  * 600 adversarial fragment concatenations) whose expected parses were
  * produced by executing the reference semantics
  * (analyze_slow_queries.py:939-983 get_log, :454-476
  * _get_bound_values) — every field byte-compared against the Scala
  * kernels. Regenerate the corpus with the script noted in
  * src/test/resources/lexer_golden.jsonl's git history.
  */
class LexDifferentialSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def cases: Seq[java.util.Map[String, Object]] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/lexer_golden.jsonl"), "UTF-8")
    try src.getLines().map { line =>
      mapper.readValue(line, classOf[java.util.Map[String, Object]])
    }.toSeq
    finally src.close()
  }

  test("1200-case differential corpus matches the reference parse exactly") {
    var checked = 0
    cases.foreach { c =>
      val msg = c.get("msg").asInstanceOf[String]
      val row = SlowQueryLexer.evalRow(UTF8String.fromString(msg))
      val skip = c.get("skip").asInstanceOf[Boolean]
      if (skip) {
        assert(row == null, s"expected skip for: $msg")
      } else {
        assert(row != null, s"expected parse for: $msg")
        def s(i: Int): String = {
          val u = row.getUTF8String(i); if (u == null) null else u.toString
        }
        assert(s(0) == c.get("duration"), s"duration of: $msg")
        // field 1: Python int() semantics (null = raise -> row skip)
        val expInt = c.get("duration_int")
        if (expInt == null) assert(row.isNullAt(1), s"duration_int of: $msg")
        else assert(row.getLong(1) == expInt.asInstanceOf[Number].longValue(),
          s"duration_int of: $msg")
        assert(s(2) == c.get("counts"), s"counts of: $msg")
        assert(s(3) == c.get("bound_values"), s"bound_values of: $msg")
        assert(s(4) == c.get("query"), s"query of: $msg")
        val expBv = c.get("bv_map")
        if (expBv != null) {
          val got = SlowQueryCatalog.parseBoundValues(s(3))
          val exp = expBv.asInstanceOf[java.util.Map[String, String]].asScala
          assert(got == exp, s"bv map of: $msg")
        }
      }
      checked += 1
    }
    assert(checked == 1200)
  }
}
