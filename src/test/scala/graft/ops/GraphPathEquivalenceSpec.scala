package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The graph family (connected components, k-core, label propagation,
  * PageRank) is size-adaptive: under the driver-replay cap it runs a
  * collected driver algorithm, above it a distributed loop. The two
  * paths must be row-identical — this spec forces BOTH paths on the
  * same random graphs via the session config
  * `spark.graft.driverReplayMaxEdges` (cap=0 forces the distributed
  * loop; the default cap takes the driver replay at test sizes) and
  * asserts set equality, plus pins the config plumbing itself: conf
  * overrides the default cap, an explicit argument overrides the conf.
  *
  * Also pins the modularity contribution's DECIMAL(38,0) arithmetic in
  * the overflow regime (m*e_in > 2^61) that no test-sized graph can
  * reach through real rows — synthetic magnitudes vs BigInt.
  */
class GraphPathEquivalenceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "GraphPathEquivalenceSpec")
  import spark.implicits._

  private def randomPairs(seed: Int, n: Int, nodes: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
  }

  /** Run `body` with the driver-replay cap conf set to `cap`. */
  private def withCap[A](cap: Long)(body: => A): A = {
    spark.conf.set(Dedup.DriverReplayCapKey, cap.toString)
    try body
    finally spark.conf.unset(Dedup.DriverReplayCapKey)
  }

  test("conf cap=0 forces the distributed path for all four ops, rows identical") {
    val pairs = randomPairs(seed = 42, n = 400, nodes = 70)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    // driver replay (default cap covers 400 edges) vs conf-forced loop
    val ccDriver = rows(Dedup.connectedComponents(pairs))
    graft.Scratch.release()
    val ccLoop = withCap(0L) { rows(Dedup.connectedComponents(pairs)) }
    graft.Scratch.release()
    assert(ccDriver == ccLoop, "connectedComponents paths diverge")

    val kcDriver = rows(GraphOps.kCore(pairs, k = 3, rounds = 3))
    graft.Scratch.release()
    val kcLoop = withCap(0L) { rows(GraphOps.kCore(pairs, k = 3, rounds = 3)) }
    graft.Scratch.release()
    assert(kcDriver == kcLoop, "kCore paths diverge")

    val lpDriver = rows(GraphOps.labelPropagation(pairs, rounds = 3))
    graft.Scratch.release()
    val lpLoop = withCap(0L) { rows(GraphOps.labelPropagation(pairs, rounds = 3)) }
    graft.Scratch.release()
    assert(lpDriver == lpLoop, "labelPropagation paths diverge")

    val prDriver = rows(GraphOps.pagerank(pairs, iters = 3))
    graft.Scratch.release()
    val prLoop = withCap(0L) { rows(GraphOps.pagerank(pairs, iters = 3)) }
    graft.Scratch.release()
    assert(prDriver == prLoop, "pagerank paths diverge")
  }

  test("explicit driverMaxEdges argument overrides the session conf") {
    val pairs = randomPairs(seed = 7, n = 60, nodes = 20)
    // conf says "always driver-replay" (huge cap); the explicit arg 0
    // must still force the loop. Equivalence already proven above —
    // here we only need both calls to RUN and agree, proving the arg
    // wasn't silently swallowed by the conf resolution.
    val viaArg = withCap(Long.MaxValue) {
      Dedup.connectedComponents(pairs, driverMaxEdges = 0L).collect()
        .map(_.toSeq).toSet
    }
    graft.Scratch.release()
    val viaDefault = Dedup.connectedComponents(pairs).collect()
      .map(_.toSeq).toSet
    graft.Scratch.release()
    assert(viaArg == viaDefault)
  }

  test("explicitly passing the default cap VALUE still wins over the conf") {
    // the sentinel-vs-value-equality trap: driverMaxEdges =
    // DriverCcMaxEdges passed EXPLICITLY must resolve to exactly that
    // cap, not be mistaken for "not passed" and overridden by a
    // conf that says "never driver-replay". 60 edges < 1M cap, so a
    // correctly-resolved explicit arg takes the driver-replay path
    // even while the conf demands the loop.
    val pairs = randomPairs(seed = 11, n = 60, nodes = 20)
    assert(Dedup.driverReplayCap(pairs, Dedup.DriverCcMaxEdges) ==
      Dedup.DriverCcMaxEdges)
    val viaExplicitDefault = withCap(0L) {
      assert(Dedup.driverReplayCap(pairs, Dedup.DriverCcMaxEdges) ==
        Dedup.DriverCcMaxEdges, "explicit default value lost to conf")
      Dedup.connectedComponents(pairs,
        driverMaxEdges = Dedup.DriverCcMaxEdges).collect().map(_.toSeq).toSet
    }
    graft.Scratch.release()
    // and the unpassed sentinel DOES defer to the conf
    val viaConf = withCap(0L) {
      assert(Dedup.driverReplayCap(pairs, Dedup.UseSessionReplayCap) == 0L)
      Dedup.connectedComponents(pairs).collect().map(_.toSeq).toSet
    }
    graft.Scratch.release()
    assert(viaExplicitDefault == viaConf) // paths differ, rows identical
  }

  test("modularity contribution is exact past int64 (DECIMAL(38,0) regime)") {
    // m*e_in > 2^61: these magnitudes overflow 4*m*e_in in int64 by
    // ~6 orders of magnitude; DECIMAL(38,0) must match BigInt exactly.
    val cases = Seq(
      (3000000000L, 1500000000L, 2000000000L), // ~1e9-edge graph
      (9000000000000000000L, 1L, 3000000000L), // m near Long.MaxValue
      (1234567890123L, 987654321098L, 1111111111111L)
    ).toDF("m", "e_in", "deg_sum")
    val got = cases.select(col("m"), col("e_in"), col("deg_sum"),
        GraphOps.modularityContrib(col("m"), col("e_in"), col("deg_sum"))
          .as("contrib"))
      .collect()
    got.foreach { r =>
      val m = BigInt(r.getLong(0)); val e = BigInt(r.getLong(1))
      val d = BigInt(r.getLong(2))
      val want = 4 * m * e - d * d
      val gotV = r.getDecimal(3)
      assert(gotV != null, s"decimal overflowed to null for $r")
      assert(BigInt(gotV.toBigInteger) == want,
        s"m=$m e_in=$e deg_sum=$d: got $gotV want $want")
    }
    // and the operator's output schema carries the decimal type
    val pairs = randomPairs(seed = 3, n = 80, nodes = 25)
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as("node"), col("comp").as("community"))
    val rep = GraphOps.modularity(pairs, labels)
    assert(rep.schema("contrib_4m2").dataType.simpleString == "decimal(38,0)")
    // Newman identity on the real report: sum over communities of
    // e_in == m when labels are exact components (no cut edges)
    val rows = rep.collect()
    val mTot = pairs.count()
    assert(rows.map(_.getLong(2)).sum == mTot)
    rows.foreach(r => assert(r.getLong(4) == 0L, s"component has cut edge: $r"))
    graft.Scratch.release()
  }
}
