package graft.parse

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.model.QueryPattern

/** Direct tests of the fused enrichment kernel against the pinned
  * reference quirks (FIXTURES.md §2 edge cases; reference behaviors at
  * analyze_slow_queries.py:454-567,605-936).
  */
class EnrichSpec extends AnyFunSuite {

  private val catalog = SlowQueryCatalog(
    cfKs = Map("users" -> "unknown", "metrics" -> "ks2", "solo" -> "ks9"),
    tagKs = Map("appA" -> "ks3"),
    pkIdx = Map(
      ("ks1", "users") -> Seq("user_id"),
      ("ks3", "users") -> Seq("other"),
      ("ks2", "metrics") -> Seq("tenant", "day")),
    patterns = Seq(QueryPattern("SELECT name FROM users", Seq("id"))))

  private def enrich(q: String, bv: String = null, tags: Seq[String] = Nil) = {
    val t = if (tags.isEmpty) null
      else ArrayData.toArrayData(tags.map(UTF8String.fromString).toArray)
    catalog.enrichInternal(UTF8String.fromString(q),
      if (bv == null) null else UTF8String.fromString(bv), t)
  }

  private def f(r: org.apache.spark.sql.catalyst.InternalRow, i: Int): String = {
    val u = r.getUTF8String(i); if (u == null) null else u.toString
  }

  test("dotted table resolves directly; pk from schema") {
    val r = enrich("SELECT * FROM ks1.users WHERE user_id=?;", "[user_id:'u1']")
    assert(f(r, 0) == "SELECT" && f(r, 3) == "ks1" && f(r, 4) == "users")
    assert(f(r, 5) == "u1")
  }

  test("ambiguous CF without tags yields the 'unknown' sentinel keyspace") {
    val r = enrich("SELECT * FROM users WHERE user_id=?;", "[user_id:'u1']")
    assert(f(r, 3) == "unknown")
    // 'unknown' is truthy -> PK lookup attempted -> no schema -> null
    assert(f(r, 5) == null)
  }

  test("tag fallback overrides ambiguous CF; pk components skip missing") {
    val r = enrich("SELECT * FROM users WHERE user_id=?;", "[user_id:'u1']",
      tags = Seq("zzz", "appA"))
    assert(f(r, 3) == "ks3")
    // ks3.users pk = [other], not in bound values -> '' (empty, not null)
    assert(f(r, 5) == "")
  }

  test("unknown CF with no tag match yields null keyspace") {
    val r = enrich("SELECT * FROM nowhere WHERE x=?;", "[x:'1']", Seq("notag"))
    assert(f(r, 3) == null && f(r, 4) == "nowhere")
    assert(f(r, 5) == null) // keyspace falsy -> pk never attempted
  }

  test("multi-dot table segment skips the row (tuple-unpack parity)") {
    assert(enrich("SELECT * FROM a.b.c WHERE x=?;", "[x:'1']") == null)
  }

  test("'=?' with no bound values: warning path, no pk") {
    val r = enrich("SELECT * FROM ks1.users WHERE user_id=?;")
    assert(f(r, 0) == "SELECT" && f(r, 3) == "ks1")
    assert(r.getMap(2).numElements() == 0)
    assert(f(r, 5) == null)
  }

  test("bound value containing in( is silently tolerated") {
    val r = enrich("SELECT * FROM ks1.users WHERE user_id=?;",
      "[user_id:'u1', junk in(1,2)]")
    // fragment ' junk in(1' has no colon -> dropped; '2)]' no colon -> dropped
    assert(f(r, 5) == "u1")
  }

  test("truncated output marker flows through as a value") {
    val r = enrich("SELECT * FROM ks1.users WHERE user_id=?;",
      "[user_id:'<truncated output>']")
    assert(f(r, 5) == "<truncated output>")
  }

  test("composite pk joins present components with '-'") {
    val r = enrich("SELECT a FROM ks2.metrics WHERE tenant=? AND day=?;",
      "[tenant:'t1', day:'2026-08-12']")
    assert(f(r, 5) == "t1-2026-08-12")
  }

  test("pattern normalization applies to SELECT only, before table extract") {
    val r = enrich("SELECT name FROM users WHERE id='z9' LIMIT 1;",
      tags = Seq("appA"))
    assert(f(r, 1) == "SELECT name FROM users WHERE id=? LIMIT 1;")
    assert(f(r, 3) == "ks3") // cf 'users' ambiguous -> tag fallback
    val m = r.getMap(2)
    assert(m.numElements() == 1)
    assert(m.keyArray().getUTF8String(0).toString == "id")
    assert(m.valueArray().getUTF8String(0).toString == "z9")
  }

  test("BATCH/DELETE/UPDATE pass through without enrichment") {
    for ((q, tp) <- Seq(("BEGIN BATCH x", "BATCH"), ("DELETE FROM ks1.users", "DELETE"),
        ("update t set x=1", "UPDATE"))) {
      val r = enrich(q)
      assert(f(r, 0) == tp && f(r, 1) == q)
      assert(f(r, 3) == null && f(r, 4) == null && f(r, 5) == null)
    }
  }

  test("unmatched statement type skips the row") {
    assert(enrich("TRUNCATE ks1.users") == null)
    assert(enrich("Select mixed case") == null)
  }

  // --- enrichDml (documented deviation; reference TODO
  // analyze_slow_queries.py:57) ---

  private val dmlCatalog = catalog.copy(enrichDml = true)

  private def enrichDml(q: String, bv: String = null, tags: Seq[String] = Nil) = {
    val t = if (tags.isEmpty) null
      else ArrayData.toArrayData(tags.map(UTF8String.fromString).toArray)
    dmlCatalog.enrichInternal(UTF8String.fromString(q),
      if (bv == null) null else UTF8String.fromString(bv), t)
  }

  test("DML parity: bound values alone never enrich DELETE/UPDATE by default") {
    val r = enrich("DELETE FROM ks1.users WHERE user_id=?;", "[user_id:'u1']")
    assert(f(r, 3) == null && f(r, 4) == null && f(r, 5) == null)
  }

  test("enrichDml: DELETE gets ks/cf and pk from bound values") {
    val r = enrichDml("DELETE FROM ks1.users WHERE user_id=?;", "[user_id:'u1']")
    assert(f(r, 0) == "DELETE" && f(r, 3) == "ks1" && f(r, 4) == "users")
    assert(f(r, 5) == "u1")
  }

  test("enrichDml: UPDATE composite pk assembles in schema order") {
    val r = enrichDml("UPDATE ks2.metrics SET v=? WHERE day=? AND tenant=?;",
      "[v:'9', day:'0107', tenant:'acme']")
    assert(f(r, 0) == "UPDATE" && f(r, 3) == "ks2" && f(r, 4) == "metrics")
    assert(f(r, 5) == "acme-0107") // pkIdx order, not WHERE order
  }

  test("enrichDml: undotted UPDATE guesses keyspace like SELECT; counter bump stays dark") {
    val r = enrichDml("UPDATE users SET v=? WHERE other=?;", "[v:'1', other:'o1']",
      tags = Seq("appA"))
    assert(f(r, 3) == "ks3" && f(r, 4) == "users" && f(r, 5) == "o1")
    val c = enrichDml("UPDATE counters SET c = c + 1")
    assert(f(c, 0) == "UPDATE" && f(c, 3) == null && f(c, 4) == "counters")
    assert(f(c, 5) == null) // no bound values -> pk never attempted
  }

  test("enrichDml: multi-dot DELETE table keeps tuple-unpack parity (row skip)") {
    assert(enrichDml("DELETE FROM a.b.c WHERE x=?;", "[x:'1']") == null)
  }
}
