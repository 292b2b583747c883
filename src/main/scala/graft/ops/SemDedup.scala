package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
  * coarse-cluster the embedding space with k-means, then prune
  * within each cluster the vectors whose cosine to an earlier-kept
  * member exceeds a threshold. Surface-level dedup (MinHash over
  * shingles, [[Dedup]]) cannot see paraphrases; this operator works
  * purely in the embedding modality, and the cluster structure keeps
  * the comparison budget at ~N/k per cell instead of all-pairs.
  *
  * Everything the CLUSTERING decides is computed in exact fixed-point
  * integer arithmetic so an independent engine reproduces it
  * bit-for-bit (the [[Quantize]] discipline): vectors map to micros
  * (floor(double(v) * 1e6) — exact for float32 inputs), assignment
  * minimizes the integer squared L2 distance with ties to the lowest
  * centroid id, and centroid updates are truncating integer means
  * (Spark DIV == DuckDB // , negatives included). Lloyd iterations
  * are deterministic and UNROLLED in the oracle as CTE chains — the
  * same pattern as the BPE-learning oracle. The final prune re-reads
  * the original float vectors and uses the session's proven
  * round(cosine, 6) cross-engine contract.
  *
  * Determinism choices (documented contract, mirrored by the oracle):
  *   - init: the k lowest-id vectors are the seed centroids;
  *   - an empty cluster keeps its previous centroid;
  *   - "earlier-kept" is simply lower id — doc a is dropped iff SOME
  *     lower-id doc in the same cluster has round(cos, 6) >= tau.
  *     (The greedy chain variant — only kept docs can drop others —
  *     needs a sequential scan per cluster; the lower-id rule is the
  *     standard order-free simplification and errs on dropping more.)
  *
  * 100 TB posture: assignment is a FUSED codegen'd scan
  * ([[VectorExpressions.nearestCentroid]]) — the (k x dims) codebook
  * rides inside the expression as a reference object (not a literal
  * formula: a per-centroid literal stacks k x dims constants into
  * one codegen stage and re-analyzes them every iteration; measured
  * 17 s -> ~2 s at 2000 x 64 with k = 8), costing k x dims long
  * multiply-adds per row with ZERO shuffle. Each Lloyd round is ONE
  * corpus pass: the assignment projection feeds the (cluster, dim)
  * sum/count aggregate directly (map-side combine leaves k x dims
  * rows per partition), so the round's shuffle is centroid-domain-
  * sized and only (k x dims) longs reach the driver (same posture as
  * [[Similarity.ivfCentroids]]). Wall-clock per round = corpus scan,
  * not job-chain overhead — the fix that moved the semdedup_fit /
  * pq_adc scaling exponents out of the overhead-bound regime
  * (SCALING.md round-8 decade). The prune
  * self-joins WITHIN cluster cells only: pick k ~ N/target_cell so
  * cells stay bounded, and the join shuffles (cluster, id, vec) once
  * on the cluster key. Cell skew at extreme scale: sub-block hot
  * cells with sign-LSH ([[Similarity.nearDupPairs]]) — composition,
  * not a new operator. Overflow: |micros| <= ~2^21 for unit-scale
  * floats, so a per-dim squared difference is < 2^44 and a 4096-dim
  * distance < 2^56; per-(cluster, dim) sums hold to ~2^41 rows per
  * cluster.
  */
object SemDedup {

  /** Exact fixed-point micros vector of a float-array column — the
    * fused codegen kernel ([[VectorExpressions.microsVec]]): same
    * values as `transform(v, x -> floor(x*1e6)::long)` but writes a
    * primitive long array directly (the HOF boxed every element;
    * the GC churn dominated million-vector cache builds).
    */
  def microsVec(vecCol: Column): Column =
    graft.ops.VectorExpressions.microsVec(vecCol)

  /** Nearest-centroid assignment (min integer squared L2, ties to
    * the lowest centroid id) over `base` = (id, mv), as ONE fused
    * codegen'd expression ([[VectorExpressions.nearestCentroid]]):
    * k*dims long multiply-adds per row, zero shuffle — the codebook
    * rides inside the expression. Replaces the former
    * explode + dimension-join + double-aggregation plan, which
    * shuffled corpus x dims x k intermediate rows per call;
    * SemDedupSpec pins row-identity between the two formulations.
    * Returns (id, cluster).
    */
  private[graft] def assign(base: DataFrame,
      cents: Array[Array[Long]]): DataFrame =
    base.select(col("id"),
      graft.ops.VectorExpressions.nearestCentroid(col("mv"), cents)
        .cast("int").as("cluster"))

  /** [[assign]] keeping the winning squared distance: (id, cluster,
    * d) — the PQ audit needs the per-vector quantization error, not
    * just the code. Same fused kernel, evaluated for index and
    * distance in one projection (2 x k x dims flops per row beats
    * any shuffle by orders of magnitude).
    */
  private[graft] def assignDist(base: DataFrame,
      cents: Array[Array[Long]]): DataFrame =
    base.select(col("id"),
      graft.ops.VectorExpressions.nearestCentroid(col("mv"), cents)
        .cast("int").as("cluster"),
      graft.ops.VectorExpressions.nearestCentroidDist(col("mv"), cents)
        .as("d"))

  /** Lloyd rounds over a cached (id, mv) frame; see object doc for
    * the exact-arithmetic contract. Each round is ONE fused
    * assignment+update pass: the codegen'd nearest-centroid
    * projection feeds the per-(cluster, dim) sum/count aggregate
    * directly (map-side combine leaves k x dims rows per partition),
    * so a round costs a single corpus scan plus one
    * centroid-domain-sized shuffle — no join, no corpus x dims x k
    * intermediate. Only (k x dims) longs reach the driver per round.
    */
  private[graft] def lloyd(base: DataFrame, k: Int, dims: Int,
      iters: Int): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = base.orderBy(col("id")).limit(k)
      .select(col("mv")).collect()
      .map(_.getSeq[Long](0).toArray)
    (0 until iters).foreach { _ =>
      val sums = base
        .select(graft.ops.VectorExpressions
            .nearestCentroid(col("mv"), cents).cast("int").as("cluster"),
          posexplode(col("mv")).as(Seq("i", "m")))
        .groupBy(col("cluster"), col("i"))
        .agg(sum(col("m")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCluster.get(j) match {
          case None => old // empty cluster keeps its centroid
          case Some(rows) =>
            val v = new Array[Long](dims)
            // Long / truncates toward zero == Spark DIV == DuckDB //
            rows.foreach(r => v(r.getInt(1)) = r.getLong(2) / r.getLong(3))
            v
        }
      }
    }
    cents
  }

  /** Deterministic fixed-point Lloyd: k seed centroids (the k
    * lowest-id vectors, in id order), `iters` rounds of
    * assign + truncating-integer-mean update. Returns the final
    * centroids indexed 0..k-1. Only (k x dims) longs ever reach the
    * driver.
    */
  def fixedPointCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int, iters: Int): Array[Array[Long]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got $k, $iters")
    // Deliberately UNCACHED: the fit makes iters+1 passes, and with
    // the fused micros/nearest-centroid kernels each pass is a narrow
    // scan (~0.6 s over 4M x 64 vectors, measured) — while
    // materializing the derived long-array column into the columnar
    // cache measured 26-80 s at the same size (array-column batch
    // build + GC churn, SCALING.md round 8). Recompute beats
    // materialize for cheap derived views; callers that already hold
    // the FLOAT source cached (the usual case) keep that benefit.
    val base = df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"),
        microsVec(col(vecCol)).as("mv"))
    lloyd(base, k, dims, iters)
  }

  /** Clustering-quality card for the fixed-point Lloyd fit: one row
    * per non-empty cluster with
    *   - `n` members,
    *   - `sil_avg_permille` — mean SIMPLIFIED silhouette (centroid
    *     form: a = squared distance to own centroid, b = runner-up
    *     centroid's squared distance; s = (b - a) * 1000 DIV b,
    *     which is >= 0 because assignment is argmin). The classic
    *     silhouette needs all-pairs distances; the centroid
    *     simplification is the standard O(n·k) surrogate and the only
    *     one that survives 100 TB,
    *   - `s_mean` — mean squared distance to own centroid (cluster
    *     scatter, micros² domain),
    *   - `db_permille` — Davies-Bouldin in the SQUARED-distance
    *     variant: max over other clusters of
    *     (s_mean_j + s_mean_k) * 1000 DIV m_jk with m_jk the squared
    *     centroid-centroid distance (lower = better separated;
    *     coincident centroids are excluded from the max and a cluster
    *     with no positive-distance peer reports NULL).
    *
    * Everything is exact integer arithmetic on the micros view, so a
    * DuckDB replay of the Lloyd trajectory reproduces each metric
    * bit-for-bit. 100 TB posture: the corpus is touched by pure fused
    * projections (3 × k × dims long ops per row, zero shuffle) plus
    * ONE k-sized aggregate; the k² centroid-pair matrix is computed
    * on the driver from the codebook it already holds and broadcast.
    * Scatter sums accumulate in DECIMAL(38,0) (HUGEINT twin) — a
    * 64-dim micros distance is < 2^48, so int64 would overflow past
    * ~2^15 rows per cluster.
    */
  def clusterQuality(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int, iters: Int): DataFrame = {
    require(k >= 2 && iters >= 0, s"need k >= 2, iters >= 0; got $k, $iters")
    val spark = df.sparkSession
    val base = df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"),
        microsVec(col(vecCol)).as("mv"))
    val cents = lloyd(base, k, dims, iters)
    val scored = base.select(
      graft.ops.VectorExpressions.nearestCentroid(col("mv"), cents)
        .as("cluster"),
      graft.ops.VectorExpressions.nearestCentroidDist(col("mv"), cents)
        .as("da"),
      graft.ops.VectorExpressions.secondCentroidDist(col("mv"), cents)
        .as("db"))
      .withColumn("sil",
        expr("CASE WHEN db = 0 THEN 0 ELSE (db - da) * 1000 DIV db END"))
    // k-row aggregate read three times below (card, peer side, DB
    // join) — cache it so the corpus is scanned once, not thrice
    val perCluster = graft.Scratch.cache(scored.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        expr("sum(sil) DIV count(1)").as("sil_avg_permille"),
        expr("CAST(sum(CAST(da AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("s_mean")))
    val pairRows = for {
      a <- cents.indices; b <- cents.indices if a != b
    } yield {
      var m = 0L
      var i = 0
      while (i < dims) {
        val x = cents(a)(i) - cents(b)(i); m += x * x; i += 1
      }
      (a.toLong, b.toLong, m)
    }
    import spark.implicits._
    val mdf = broadcast(pairRows.toDF("cluster", "j2", "m"))
    val peers = perCluster
      .select(col("cluster").as("j2"), col("s_mean").as("s_peer"))
    val dbp = perCluster.select(col("cluster"), col("s_mean"))
      .join(mdf, Seq("cluster"))
      .join(broadcast(peers), Seq("j2"))
      .filter(col("m") > 0)
      .groupBy(col("cluster"))
      .agg(max(expr("(s_mean + s_peer) * 1000 DIV m")).as("db_permille"))
    // dbp is k-row: hint it so the final stitch never plans a
    // sort-merge join on a frame statistics can't size
    perCluster.join(broadcast(dbp), Seq("cluster"), "left")
      .select(col("cluster").cast("long").as("cluster"), col("n"),
        col("sil_avg_permille"), col("s_mean"), col("db_permille"))
      .orderBy(col("cluster"))
  }

  /** Per-vector SemDeDup verdict: (id, cluster, dropped) for every
    * `dims`-dimensional vector, where dropped = 1 iff a lower-id
    * vector in the same k-means cluster has round(cosine, 6) >= tau.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dims: Int, iters: Int, tau: Double): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got $k, $iters")
    // ONE cache of the FLOAT source serves every pass; the derived
    // micros view is recomputed per pass by the fused kernel (see
    // fixedPointCentroids — caching long-array columns measured
    // 30-100x the kernel's recompute cost at millions of rows)
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val withMv = base.select(col("id"), microsVec(col("v")).as("mv"))
    val cents = lloyd(withMv, k, dims, iters)
    // assignment is a pure projection of the cached base — and since
    // the fused assign is zero-shuffle, the cluster column derives
    // inline; cached because the in-cluster join reads it twice
    val assigned = graft.Scratch.cache(base
      .select(col("id"), col("v"),
        graft.ops.VectorExpressions
          .nearestCentroid(microsVec(col("v")), cents)
          .cast("int").as("cluster")))
    val a = assigned.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_b") < col("id_a"))
      .filter(round(Similarity.cosine(col("v_a"), col("v_b")), 6) >= tau)
      .select(col("id_a").as("id")).distinct()
      .withColumn("dropped", lit(1L))
    assigned.join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster").cast("long").as("cluster"),
        coalesce(col("dropped"), lit(0L)).as("dropped"))
  }
}
