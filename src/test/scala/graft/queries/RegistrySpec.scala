package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: the driver contract is a Map, so a duplicated
  * query name across the six source maps would silently SHADOW an
  * entire query (last-merged wins) — the board would shrink by one
  * with no error anywhere. Also pins naming and oracle hygiene.
  */
class RegistrySpec extends AnyFunSuite {

  test("no query name is silently shadowed by a later map") {
    val maps = Seq(
      "CoreQueries" -> CoreQueries.all, "SlowLogQueries" -> SlowLogQueries.all,
      "OpsQueries" -> OpsQueries.all, "ExtendedQueries" -> ExtendedQueries.all,
      "PipelineQueries" -> PipelineQueries.all, "ScaleQueries" -> ScaleQueries.all,
      "AuditQueries" -> AuditQueries.all, "SpanQueries" -> SpanQueries.all,
      "LearnQueries" -> LearnQueries.all,
      "CurationQueries" -> CurationQueries.all,
      "SelectionQueries" -> SelectionQueries.all,
      "WarehouseQueries" -> WarehouseQueries.all)
    val perMap = maps.map(_._2.size).sum
    assert(Registry.all.size == perMap,
      s"merged=${Registry.all.size} != sum=$perMap — a name collides")
    val names = maps.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = names.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated names: $dups")
  }

  test("every query name is qNN_snake and every oracle is non-empty") {
    Registry.all.foreach { case (name, q) =>
      assert(name.matches("q\\d+_[a-z0-9_]+"), name)
      q.oracle.foreach(sql => assert(sql.trim.nonEmpty, name))
    }
  }

  test("all registered queries currently carry an oracle") {
    // the two historical rows-only queries (q38/q42) were closed in
    // round 5; a new oracle-less registration should be a deliberate,
    // visible decision — update this pin if one is ever added
    val missing = Registry.all.collect { case (n, q) if q.oracle.isEmpty => n }
    assert(missing.isEmpty, s"oracle-less: $missing")
  }
}
