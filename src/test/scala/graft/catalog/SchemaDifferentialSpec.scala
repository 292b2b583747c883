package graft.catalog

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableMeta

/** Differential parity for the CQL schema parser: 156 generated dumps
  * (all three PK grammars, indented-composite degradation, junk
  * CREATE TABLE mentions, dangling-PK error cases) with expected
  * output produced by executing the reference semantics
  * (analyze_slow_queries.py:334-418).
  */
class SchemaDifferentialSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("schema corpus matches the reference parse, errors included") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/schema_golden.jsonl"), "UTF-8")
    var checked = 0
    try src.getLines().foreach { line =>
      val c = mapper.readValue(line, classOf[java.util.Map[String, Object]])
      val cql = c.get("cql").asInstanceOf[String]
      val expectError = c.get("error").asInstanceOf[Boolean]
      if (expectError) {
        intercept[IllegalArgumentException] { CqlCatalog.parse(cql) }
      } else {
        val got = CqlCatalog.parse(cql)
        val exp = c.get("tables").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.map { t =>
            (t.get("ks").asInstanceOf[String], t.get("cf").asInstanceOf[String]) ->
              TableMeta(
                t.get("pk").asInstanceOf[java.util.List[String]].asScala.toSeq,
                t.get("ck").asInstanceOf[java.util.List[String]].asScala.toSeq)
          }.toMap
        assert(got == exp, s"for:\n$cql")
      }
      checked += 1
    }
    finally src.close()
    assert(checked == 156)
  }
}
