package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a pair table — PageRank in exact
  * integer arithmetic, so a SQL oracle can unroll the same iterations
  * as CTEs and hash-match bit-for-bit (the same discipline as the BPE
  * learner's unrolled-round oracle).
  *
  * Rank is carried in fixed-point units of `scale` (1e6 = one unit of
  * mass). With damping 85/100:
  *   r_0(v)   = scale
  *   r_{t+1}(v) = (15 * scale) DIV 100
  *              + (85 * sum_{u in N(v)} (r_t(u) DIV deg(u))) DIV 100
  * All divisions are on nonnegative longs, where Spark's truncating
  * `DIV` and DuckDB's `//` floor division agree. The pair graph is
  * symmetrized, so every node has deg >= 1 and an in-edge — no
  * dangling-mass term. Overflow: inflow <= deg_max * scale and
  * 85 * inflow stays below 2^63 for any deg_max < 1e11.
  *
  * 100 TB posture: the driver never sees the graph — each iteration
  * is one hash join (edges x ranks on src) plus one edge-keyed
  * partial-aggregated groupBy(dst); edges and degrees are computed
  * once and cached; the loop builds ONE plan with no interior actions
  * (3 iterations is shallow enough that lineage re-analysis is
  * negligible — an open-ended loop would localCheckpoint per the
  * connected-components discipline, ops/Dedup.scala).
  */
object GraphOps {

  /** Degree-oriented triangle counting over an undirected pair table
    * (id_a, id_b) — per-node triangle participation, the density
    * diagnostic of a near-dup graph (a high-triangle node sits inside
    * a dup CLIQUE; a zero-triangle node with high degree is a hub of
    * unrelated collisions).
    *
    * The scale-correct wedge algorithm: edges are oriented low-to-high
    * by the total order (degree, id), making the orientation acyclic;
    * every triangle then has exactly one source node with both
    * out-edges (the order-smallest), so wedges (u→v, u→w) with v
    * before w, closed by the oriented edge v→w, count each triangle
    * EXACTLY once. Degree orientation bounds wedge fan-out by
    * out-degree <= O(sqrt(2m)) — the textbook id-ordering variant
    * explodes on hubs; this one provably cannot.
    */
  def triangleCounts(rawPairs: DataFrame): DataFrame = {
    // the pair graph is orders of magnitude smaller than the corpus
    // that produced it; truncating its lineage here (lazy checkpoint)
    // keeps the wedge plan — which references the edge table three
    // times — from re-ANALYZING the full upstream pair pipeline 3x
    // (caching bounds execution, not analysis; measured 3.9 s -> sub-s
    // on the winnow graph)
    val pairs = graft.Scratch.localCheckpoint(
      rawPairs.select(col("id_a"), col("id_b")))
    val sym = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val wd = pairs
      .join(deg.select(col("node").as("id_a"), col("deg").as("da")), Seq("id_a"))
      .join(deg.select(col("node").as("id_b"), col("deg").as("db")), Seq("id_b"))
    val before = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val o = graft.Scratch.cache(wd.select(
      when(before, col("id_a")).otherwise(col("id_b")).as("u"),
      when(before, col("id_b")).otherwise(col("id_a")).as("v"),
      when(before, col("db")).otherwise(col("da")).as("dv")))
    val wedges = o.select(col("u"), col("v"), col("dv"))
      .join(o.select(col("u"), col("v").as("w"), col("dv").as("dw")), Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tris = wedges
      .join(o.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-round k-core peel over an undirected pair table
    * (id_a, id_b): each round drops nodes whose CURRENT degree is
    * below `k` and the edges touching them; `rounds` rounds of
    * peeling approximate the k-core from above (exact once a round
    * changes nothing). Output is one row per node of the INPUT
    * graph: initial degree, post-peel degree, and the in-core flag —
    * the dup-graph triage signal (in-core nodes sit in dense dup
    * cliques worth a human look; peeled pendants are ordinary
    * pairwise near-dups).
    *
    * Scale posture: each round is one degree aggregation plus two
    * semi-join-shaped filters, all keyed on node id — no all-pairs,
    * no driver state. The edge set shrinks monotonically, and each
    * round's survivor set is Scratch-cached so the unrolled plan
    * stays linear in `rounds` (uncached, every round re-references
    * the previous edge set twice and the plan doubles per round).
    */
  def kCore(pairs: DataFrame, k: Int = 2, rounds: Int = 3,
      driverMaxEdges: Long = Dedup.UseSessionReplayCap): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("id_a").as("node"))
        .union(e.select(col("id_b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    // lineage cut, not just a cache: every peel round references the
    // previous edge set three times (degree + two filters), so an
    // uncut plan re-analyzes the upstream pair pipeline 3^rounds
    // times (measured 10.3 s -> ~1 s for 3 rounds on the winnow graph)
    var e = graft.Scratch.localCheckpoint(
      pairs.select(col("id_a"), col("id_b")))
    // size-adaptive (the connectedComponents pattern): replay the
    // peel driver-side under the bounded cap — identical rows.
    // Cap resolves through spark.graft.driverReplayMaxEdges unless
    // the caller passed an explicit value (Dedup.driverReplayCap).
    if (e.count() <= Dedup.driverReplayCap(e, driverMaxEdges))
      return driverKCore(e, k, rounds)
    val deg0 = degrees(e)
    for (_ <- 1 to rounds) {
      val s = degrees(e).filter(col("deg") >= k).select("node")
      e = graft.Scratch.cache(e
        .join(s.select(col("node").as("id_a")), Seq("id_a"))
        .join(s.select(col("node").as("id_b")), Seq("id_b")))
    }
    deg0.select(col("node"), col("deg").as("deg0"))
      .join(degrees(e).select(col("node"), col("deg")), Seq("node"), "left")
      .select(col("node"), col("deg0"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        (coalesce(col("deg"), lit(0L)) >= k).cast("long").as("in_core"))
  }

  /** Driver-side replay of [[kCore]]'s peel rounds over a
    * size-bounded collected edge list — identical row-for-row
    * (duplicate pair rows, if any, count in degrees exactly as the
    * distributed aggregation counts them).
    */
  private def driverKCore(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    var es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    def degrees(xs: Array[(Long, Long)]): Map[Long, Long] =
      (xs.map(_._1) ++ xs.map(_._2)).groupBy(identity)
        .map { case (n, occ) => n -> occ.length.toLong }
    val deg0 = degrees(es)
    (1 to rounds).foreach { _ =>
      val keep = degrees(es).filter(_._2 >= k).keySet
      es = es.filter { case (a, b) => keep(a) && keep(b) }
    }
    val degF = degrees(es)
    deg0.iterator.map { case (n, d0) =>
      val d = degF.getOrElse(n, 0L)
      (n, d0, d, if (d >= k) 1L else 0L)
    }.toSeq.toDF("node", "deg0", "deg", "in_core")
  }

  /** Synchronous label propagation over an undirected pair table —
    * `rounds` fixed rounds, each node adopting the MOST FREQUENT
    * label among its neighbors (ties -> smallest label; isolated
    * nodes cannot occur since every node comes from an edge). Unlike
    * connected components (pure reachability), LP respects edge
    * DENSITY: two cliques joined by one bridge edge keep separate
    * communities — the distinction that matters when a near-dup
    * "cluster" is really two templates glued by a chance collision.
    *
    * Deterministic by construction: synchronous updates + total
    * tie-break order, so the oracle unrolls the same rounds as CTEs.
    * Scale posture: each round is one neighbor-label count (shuffle
    * on node) and one per-node argmax window (WindowGroupLimit
    * shape); the edge table is lineage-cut once up front.
    */
  def labelPropagation(rawPairs: DataFrame, rounds: Int = 3,
      driverMaxEdges: Long = Dedup.UseSessionReplayCap): DataFrame = {
    val pairs = graft.Scratch.localCheckpoint(
      rawPairs.select(col("id_a"), col("id_b")))
    val sym = graft.Scratch.cache(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    // size-adaptive (the connectedComponents pattern): synchronous
    // rounds replay driver-side under the bounded cap
    val edgeCnt = sym.count()
    if (edgeCnt <= Dedup.driverReplayCap(sym, driverMaxEdges)) {
      val out = driverLabelProp(sym, rounds)
      sym.unpersist()
      return out
    }
    var lab = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      val cnt = sym
        .join(lab.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("c").desc, col("lbl"))
      lab = graft.Scratch.cache(cnt
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("lbl")))
    }
    lab.select(col("node"), col("lbl").as("community"))
  }

  /** Driver-side replay of [[labelPropagation]]'s synchronous rounds
    * over a size-bounded collected symmetric edge list — same
    * most-frequent-neighbor-label updates with the same
    * (count desc, label asc) tie-break.
    */
  private def driverLabelProp(sym: DataFrame, rounds: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val es = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
    var lab: Map[Long, Long] = es.map(_._1).distinct.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      lab = es.groupBy(_._1).map { case (src, nbrs) =>
        val counts = nbrs.map(e => lab(e._2))
          .groupBy(identity).map { case (l, occ) => l -> occ.length }
        src -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab.toSeq.toDF("node", "community")
  }

  /** Integer PageRank over an undirected pair table (id_a, id_b).
    * Output: (node, deg, pr_rank) per node, rank after `iters`
    * iterations in fixed-point `scale` units.
    */
  /** Integer-exact modularity report of a node labeling over an
    * undirected pair graph: per community, the internal edge count
    * e_in, the degree mass deg_sum, and the Newman contribution
    * 4m*e_in - deg_sum^2 (m = total edges). Modularity
    * Q = sum(contrib) / (4m^2) is a ratio of the emitted integers —
    * no division happens in-engine, so the report is bit-exact.
    *
    * Scale: both label joins are node-keyed shuffles against a
    * node-sized frame; degrees are one map-combinable shuffle on the
    * edge list; the 1-row edge total broadcasts (never collected).
    * Bounds: the products 4*m*e_in and deg_sum^2 leave int64 once
    * m*e_in exceeds 2^61 (~1e9 edges of a balanced partition), so the
    * contribution is computed in DECIMAL(38,0) UNCONDITIONALLY —
    * exact to m*e_in < 1e37, i.e. any graph a 100 TB corpus can
    * produce — rather than switching representation at a size
    * threshold (a conditional type would make the report's schema
    * depend on the data, breaking every downstream consumer the day
    * the graph grows past the bound). Community-count rows make the
    * decimal arithmetic cost unmeasurable.
    */

  /** Newman contribution 4m*e_in - deg_sum^2 in DECIMAL(38,0) —
    * factored out so the overflow regime (m*e_in > 2^61) is unit-
    * testable with synthetic magnitudes no test-sized graph can reach.
    */
  private[ops] def modularityContrib(m: org.apache.spark.sql.Column,
      eIn: org.apache.spark.sql.Column,
      degSum: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(4).cast("decimal(38,0)") * m.cast("decimal(38,0)") * eIn
      - degSum.cast("decimal(38,0)") * degSum).cast("decimal(38,0)")

  def modularity(rawPairs: DataFrame, labels: DataFrame): DataFrame = {
    val pairs = graft.Scratch.cache(
      rawPairs.select(col("id_a"), col("id_b")))
    val lab = labels.select(col("node"), col("community"))
    val m = pairs.agg(count(lit(1)).as("m"))
    val eIn = pairs
      .join(lab.select(col("node").as("id_a"), col("community").as("ca")),
        Seq("id_a"))
      .join(lab.select(col("node").as("id_b"), col("community").as("cb")),
        Seq("id_b"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
    val deg = pairs.select(col("id_a").as("node"))
      .union(pairs.select(col("id_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    lab.join(deg, Seq("node"))
      .groupBy(col("community"))
      .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
      .join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
        // boundary edges (the conductance numerator): every degree
        // end not consumed by an internal edge crosses the cut
        expr("deg_sum - 2 * coalesce(e_in, 0)").as("cut_edges"),
        modularityContrib(col("m"), coalesce(col("e_in"), lit(0L)),
          col("deg_sum")).as("contrib_4m2"))
      .orderBy(col("community"))
  }

  def pagerank(pairs: DataFrame, iters: Int, scale: Long = 1000000L,
      driverMaxEdges: Long = Dedup.UseSessionReplayCap): DataFrame = {
    // The loop builds one ~3*iters-shuffle-stage plan over a graph
    // orders of magnitude smaller than the corpus that produced it —
    // the q60 regime, where AQE's per-stage re-planning costs more
    // than the stages. AQE conf only matters at EXECUTION, so the
    // result is materialized (node-sized cache + count) INSIDE the
    // guarded region; callers then read the cache.
    val spark = pairs.sparkSession
    // Materialize the pair generator FIRST, under whatever adaptive
    // settings it was planned for (its skew handling must not be
    // sacrificed to the loop's regime) — then run the loop stages
    // with AQE off.
    val p = graft.Scratch.cache(pairs)
    val edgeCnt = p.count()
    // Size-adaptive (the connectedComponents pattern): under the
    // bounded cap the whole iteration runs driver-side on collected
    // edges — identical integer arithmetic, zero shuffle stages.
    if (edgeCnt * 2 <= Dedup.driverReplayCap(p, driverMaxEdges))
      return driverPagerank(p, iters, scale)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = graft.Scratch.cache(pagerankLoop(p, iters, scale))
      out.count()
      out
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  /** Driver-side replay of [[pagerankLoop]]'s exact integer updates
    * over a size-bounded collected edge list: same truncating
    * divisions in the same order, so the (node, deg, pr_rank) rows
    * are bit-identical to the distributed loop's. Returns a
    * LocalRelation (broadcastable downstream).
    */
  private def driverPagerank(p: DataFrame, iters: Int,
      scale: Long): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val es = p.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
    val deg = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (src, _) => deg(src) = deg.getOrElse(src, 0L) + 1L }
    val base = (15L * scale) / 100L
    var r = deg.map { case (k, _) => k -> scale }
    (1 to iters).foreach { _ =>
      val inflow = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (src, dst) =>
        inflow(dst) = inflow.getOrElse(dst, 0L) + r(src) / deg(src)
      }
      r = deg.map { case (k, _) =>
        k -> (base + (85L * inflow.getOrElse(k, 0L)) / 100L)
      }
    }
    deg.iterator.map { case (k, d) => (k, d, r(k)) }.toSeq
      .toDF("node", "deg", "pr_rank")
  }

  private def pagerankLoop(pairs: DataFrame, iters: Int,
      scale: Long): DataFrame = {
    val edges = graft.Scratch.cache(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    val deg = graft.Scratch.cache(
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val base = (15L * scale) / 100L
    var r = deg.select(col("node"), col("deg"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(r.select(col("node").as("src"), expr("r DIV deg").as("c")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("inflow"))
      // symmetric graph: every node has an in-edge, but keep the
      // left join + coalesce so a node set mismatch can never silently
      // drop rows
      r = deg.join(inflow, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + expr("(85 * coalesce(inflow, 0)) DIV 100")).as("r"))
    }
    r.select(col("node"), col("deg"), col("r").as("pr_rank"))
  }
}
