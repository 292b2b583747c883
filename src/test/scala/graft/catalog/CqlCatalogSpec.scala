package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableMeta

/** The three PK grammars (analyze_slow_queries.py:391-418) plus the
  * CF->keyspace ambiguity sentinel (:553-567).
  */
class CqlCatalogSpec extends AnyFunSuite {

  val cql =
    """CREATE TABLE ks1.users (
      |    user_id uuid,
      |    name text,
      |    PRIMARY KEY (user_id, name)
      |);
      |CREATE TABLE ks1.events (
      |    tenant text, day text, seq int, payload text,
      |PRIMARY KEY ((tenant, day), seq)
      |);
      |CREATE TABLE ks2.simple (
      |    my_id uuid PRIMARY KEY,
      |    val text
      |);
      |CREATE TABLE ks2.users (
      |    uid uuid,
      |    PRIMARY KEY (uid)
      |);
      |CREATE TABLE ks3.wideonly (
      |    a text, b text, c int, d int,
      |PRIMARY KEY ((a, b))
      |);""".stripMargin

  lazy val schema = CqlCatalog.parse(cql)

  test("simple compound key: first column partitions, rest cluster") {
    assert(schema(("ks1", "users")) == TableMeta(Seq("user_id"), Seq("name")))
  }

  test("composite partition key (unindented line, reference's '((' branch)") {
    assert(schema(("ks1", "events")) == TableMeta(Seq("tenant", "day"), Seq("seq")))
  }

  test("indented composite PK degrades to simple-branch parse (reference bug parity)") {
    // The reference checks startswith('((') AFTER only removing the
    // literal "PRIMARY KEY " substring, so an indented composite line
    // falls into the simple branch (analyze_slow_queries.py:380-404).
    val s = CqlCatalog.parse(
      "CREATE TABLE k.t (\n    a text,\n    PRIMARY KEY ((a, b), c)\n);")
    assert(s(("k", "t")) == TableMeta(Seq("a"), Seq("b", "c")))
  }

  test("composite partition key without clustering columns") {
    assert(schema(("ks3", "wideonly")) == TableMeta(Seq("a", "b"), Nil))
  }

  test("inline single-column primary key") {
    assert(schema(("ks2", "simple")) == TableMeta(Seq("my_id"), Nil))
  }

  test("single-column compound form") {
    assert(schema(("ks2", "users")) == TableMeta(Seq("uid"), Nil))
  }

  test("cf->keyspace index marks ambiguous CFs 'unknown'") {
    val idx = CqlCatalog.cfKeyspaces(schema)
    assert(idx("users") == CqlCatalog.UnknownKeyspace) // ks1 and ks2
    assert(idx("events") == "ks1")
    assert(idx("simple") == "ks2")
  }

  test("strSlice slices between first markers") {
    assert(CqlCatalog.strSlice("CREATE TABLE ks1.users (", "CREATE TABLE ", ".") == Some("ks1"))
    assert(CqlCatalog.strSlice("CREATE TABLE ks1.users (", ".", " ") == Some("users"))
    assert(CqlCatalog.strSlice("abc", "x", "y").isEmpty)
  }

  test("partitionKeyIndex keeps original case keys") {
    val s = CqlCatalog.parse("CREATE TABLE KS.Tbl (\n a int,\n PRIMARY KEY (a)\n);")
    val idx = CqlCatalog.partitionKeyIndex(s)
    assert(idx.keySet == Set("KS" + CqlCatalog.KeySep + "Tbl"))
  }
}
