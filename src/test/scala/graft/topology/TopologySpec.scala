package graft.topology

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class TopologySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "TopologySpec")

  private val fixtureResolver = new Topology.EndpointResolver {
    def resolve(ks: String, cf: String, pk: String): Option[Seq[String]] =
      (ks, pk) match {
        case ("ks1", "u1") => Some(Seq("10.0.0.1", "10.0.0.2"))
        case ("ks1", "u2") => Some(Seq("10.0.0.3"))
        case _             => None
      }
  }

  private def writeCsv(): String = {
    val f = Files.createTempFile("pks", ".csv")
    Files.writeString(f,
      """Count,Duration,Avg. Duration,Keyspace,Column Family,Primary Key
        |3,4050,1350,ks1,users,u1
        |1,900,900,ks1,users,u2
        |1,1,1,ks1,users,[truncated output]
        |2,2,2,ks9,unknowncf,zz
        |""".stripMargin)
    f.toString
  }

  test("CSV read applies the validity filter") {
    val df = Topology.readPkCsv(spark, writeCsv())
    assert(df.count() == 3) // truncated-output row dropped
  }

  test("mapPartitions endpoint resolution with injectable resolver") {
    val resolved = Topology.resolveEndpoints(
      Topology.readPkCsv(spark, writeCsv()), fixtureResolver)
    val byPk = resolved.collect().map(r =>
      r.getString(2) -> Option(r.getSeq[String](3))).toMap
    assert(byPk("u1").contains(Seq("10.0.0.1", "10.0.0.2")))
    assert(byPk("u2").contains(Seq("10.0.0.3")))
    assert(byPk("zz").isEmpty) // failed lookup -> null, row kept
  }

  test("wide form pre-allocates endpoint slots; long form explodes") {
    val resolved = Topology.resolveEndpoints(
      Topology.readPkCsv(spark, writeCsv()), fixtureResolver)
    val wide = Topology.wide(resolved, slots = 3)
    assert(wide.columns.toSeq ==
      Seq("keyspace", "column_family", "primary_key",
        "endpoint_0", "endpoint_1", "endpoint_2"))
    val u1 = wide.filter(wide("primary_key") === "u1").head()
    assert(u1.getString(3) == "10.0.0.1" && u1.getString(4) == "10.0.0.2"
      && u1.get(5) == null)

    val long = Topology.long(resolved)
    assert(long.count() == 4) // 2 + 1 + 1 null-row (explode_outer)
  }
}
