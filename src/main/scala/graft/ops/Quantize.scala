package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension affine int8) embedding quantization with a
  * self-auditing reconstruction-error report — the storage-side
  * operator of an embedding pipeline: 64-dim float32 vectors compress
  * 4x to uint8 codes, and the audit proves per-dimension that the
  * worst-case reconstruction error is within the quantization-step
  * bound, in exact integer arithmetic both engines reproduce.
  *
  * Float values are first mapped to exact fixed-point micros:
  * floor(double(v) * 1e6). A float32 mantissa carries <= 24
  * significant bits and 1e6 < 2^20, so the double product is exact
  * (44 < 53 bits) and the floor is the same integer in any engine —
  * no binary-float stringification ever reaches the result.
  *
  * Everything downstream is nonneg-integer math (truncating and floor
  * division agree on nonnegatives, so Spark `DIV` == DuckDB `//`):
  *   code  = ((v - lo) * 255) DIV (hi - lo)    in [0, 255]
  *   recon = lo + (code * (hi - lo)) DIV 255   <= v
  *   err   = v - recon                          >= 0
  * and the audit flag asserts err <= step + 1 where
  * step = (hi - lo) DIV 255.
  *
  * 100 TB posture: two narrow passes over the exploded corpus — a
  * dimension-keyed min/max aggregate (64 rows, broadcast back) and a
  * dimension-keyed error aggregate. No corpus-sized shuffle: the
  * explode is pipelined into partial aggregation on both passes, and
  * only 64-row statistics cross the wire.
  */
object Quantize {

  /** Exact fixed-point micros of a float column (see object doc). */
  def micros(v: Column): Column = floor(v.cast("double") * lit(1000000d))

  /** Product-quantization codes + per-vector quantization error: the
    * `dims` dimensions split into `m` contiguous subspaces, each
    * coarse-quantized by an independent fixed-point Lloyd codebook
    * ([[SemDedup]]'s exact-integer k-means contract: micros vectors,
    * lowest-id seeds, truncating-mean updates, ties to the lowest
    * code). Output per vector: the m codes and the exact integer
    * squared reconstruction error (sum of the winning per-subspace
    * distances).
    *
    * This is the memory half of the at-scale ANN story (IVF routes,
    * PQ compresses): m codebooks of k x (dims/m) longs — catalog-
    * sized, broadcast — replace the vectors with m log2(k)-bit codes.
    * Every per-subspace pass is the [[SemDedup.assignDist]] shape:
    * explode + broadcast codebook join + id-keyed aggregate; the
    * corpus never self-joins and only codebooks reach the driver.
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"need m | dims; got $m, $dims")
    val sub = dims / m
    // cache the FLOAT source once; micros + slice views recompute per
    // pass via the fused kernel (long-array columnar caching measured
    // 30-100x the recompute cost at millions of rows — SCALING.md r8)
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val mv = base.select(col("id"), SemDedup.microsVec(col("v")).as("mv"))
    val parts = (0 until m).map { s =>
      val sl = mv.select(col("id"),
        slice(col("mv"), s * sub + 1, sub).as("mv"))
      val cents = SemDedup.lloyd(sl, k, sub, iters)
      SemDedup.assignDist(sl, cents).select(col("id"),
        col("cluster").cast("long").as(s"code$s"), col("d").as(s"err$s"))
    }
    val joined = parts.reduce(_.join(_, Seq("id")))
    joined.select(col("id") +:
      (0 until m).map(s => col(s"code$s")) :+
      (0 until m).map(s => col(s"err$s")).reduce(_ + _).as("err_q"): _*)
  }

  /** [[pqCodes]] with an EXPLICIT dim→subspace allocation instead of
    * contiguous slices — the permutation half of OPQ (Ge et al.,
    * CVPR 2013): re-group dimensions so each subspace carries
    * comparable variance before fitting its codebook (the full OPQ
    * also learns a rotation; the allocation step alone is
    * permutation-exact in integer arithmetic, so it keeps the
    * engine's bit-reproducibility contract where a learned rotation
    * could not). `alloc(s)` lists the 0-based dims of subspace `s`,
    * in order; per-subspace gathers are literal `element_at` maps —
    * plan-sized, codegen'd, zero shuffle. Same output contract and
    * scale posture as [[pqCodes]].
    */
  def pqCodesAllocated(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, k: Int, iters: Int,
      alloc: Array[Array[Int]]): DataFrame = {
    val m = alloc.length
    require(m >= 1 && alloc.map(_.length).sum == dims &&
      alloc.flatten.sorted.sameElements(0 until dims),
      s"alloc must partition 0..${dims - 1}")
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val mv = base.select(col("id"), SemDedup.microsVec(col("v")).as("mv"))
    val parts = (0 until m).map { s =>
      val gathered = mv.select(col("id"),
        array(alloc(s).map(i => element_at(col("mv"), i + 1)): _*)
          .as("mv"))
      val cents = SemDedup.lloyd(gathered, k, alloc(s).length, iters)
      SemDedup.assignDist(gathered, cents).select(col("id"),
        col("cluster").cast("long").as(s"code$s"), col("d").as(s"err$s"))
    }
    val joined = parts.reduce(_.join(_, Seq("id")))
    joined.select(col("id") +:
      (0 until m).map(s => col(s"code$s")) :+
      (0 until m).map(s => col(s"err$s")).reduce(_ + _).as("err_q"): _*)
  }

  /** Variance-balanced dim→subspace allocation for
    * [[pqCodesAllocated]]: rank dimensions by exact integer corpus
    * variance numerator (n·Σm² − (Σm)², accumulated in
    * DECIMAL(38,0) — the HUGEINT twin; m² alone passes 2^63 once a
    * dim sees ~2^23 rows) and snake-assign ranks to the m subspaces
    * (round r gives rank r·m..r·m+m−1 to subspaces 0..m−1 on even
    * rounds and m−1..0 on odd ones), so every subspace receives one
    * dim per variance decile. One corpus pass to a dims-sized
    * aggregate; only `dims` rows reach the driver.
    */
  def varianceBalancedAllocation(df: DataFrame, vecCol: String,
      dims: Int, m: Int): Array[Array[Int]] = {
    require(m >= 1 && dims % m == 0, s"need m | dims; got $m, $dims")
    val rows = df.filter(size(col(vecCol)) === dims)
      .select(posexplode(SemDedup.microsVec(col(vecCol)))
        .as(Seq("i", "mm")))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("mm")).cast("decimal(38,0)").as("sm"),
        sum(col("mm").cast("decimal(38,0)") * col("mm")).as("sq"))
      .select(col("i"),
        (col("n") * col("sq") - col("sm") * col("sm")).as("vnum"))
      .collect()
    val ranked = rows
      .map(r => (r.getInt(0), BigDecimal(r.getDecimal(1))))
      .sortBy { case (i, v) => (-v, i) }
      .map(_._1)
    val alloc = Array.fill(m)(Vector.newBuilder[Int])
    ranked.zipWithIndex.foreach { case (dim, r) =>
      val round = r / m
      val pos = r % m
      val s = if (round % 2 == 0) pos else m - 1 - pos
      alloc(s) += dim
    }
    alloc.map(_.result().toArray)
  }

  /** Residual product quantization — the second rung of the IVF-PQ
    * ladder: a coarse IVF router (fixed-point Lloyd over the FULL
    * vectors) absorbs the corpus's cluster structure, and the PQ
    * codebooks then quantize each vector's RESIDUAL against its cell
    * centroid, spending their bits on what the router couldn't
    * explain. Output per vector: the cell, the m codes, and the exact
    * integer squared reconstruction error of the residual encoding
    * (sum of winning per-subspace distances) — directly comparable to
    * [[pqCodes]]'s `err_q` on the same corpus, which is the standard
    * "residual beats global at equal bits" audit.
    *
    * Scale: identical posture to [[pqCodes]] plus one extra
    * assign/update pass (the router) and one broadcast centroid join
    * + `zip_with` to form residuals — still zero corpus self-joins,
    * only (ivfK + m*k) centroid rows on the driver. Residual values
    * are signed; every downstream quantity is a squared distance or a
    * truncating mean, both of which Spark and DuckDB compute
    * identically on negatives (DIV == // by truncation).
    */
  def residualPqCodes(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, ivfK: Int, m: Int, k: Int, iters: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"need m | dims; got $m, $dims")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dims / m
    // float source cached once; the router cell derives inline from
    // the fused kernel (no join), and only the RESIDUAL frame — the
    // one view every subspace pass re-reads and which cannot be
    // recomputed without the centroid join — stays materialized
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val mvDf = base.select(col("id"), SemDedup.microsVec(col("v")).as("mv"))
    val cells = SemDedup.lloyd(mvDf, ivfK, dims, iters)
    val centsDf = cells.zipWithIndex
      .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cell", "cv")
    val res = graft.Scratch.cache(mvDf
      .withColumn("cell", graft.ops.VectorExpressions
        .nearestCentroid(col("mv"), cells).cast("long"))
      .join(broadcast(centsDf), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("mv"), col("cv"), (a, b) => a - b).as("mv")))
    val parts = (0 until m).map { s =>
      val sl = graft.Scratch.cache(res.select(col("id"),
        slice(col("mv"), s * sub + 1, sub).as("mv")))
      val books = SemDedup.lloyd(sl, k, sub, iters)
      SemDedup.assignDist(sl, books).select(col("id"),
        col("cluster").cast("long").as(s"code$s"), col("d").as(s"err$s"))
    }
    val joined = parts.foldLeft(res.select(col("id"), col("cell")))(
      _.join(_, Seq("id")))
    joined.select(col("id") +: col("cell") +:
      (0 until m).map(s => col(s"code$s")) :+
      (0 until m).map(s => col(s"err$s")).reduce(_ + _).as("err_q"): _*)
  }

  /** Asymmetric-distance (ADC) recall gate for the PQ index: rank
    * the corpus for each probe by the PQ-approximated distance — the
    * probe's exact subspace slices against each vector's CODEBOOK
    * ENTRY, the standard ADC trick — and report top-k overlap vs the
    * exact cosine ranking, per probe (the q143 shape). The probe
    * distance table is (nProbes x m x k) — catalog-sized, computed
    * driver-side from the collected probe vectors and broadcast —
    * so scoring the corpus is one broadcast join against the
    * (id, subspace, code) frame plus an id-keyed sum: the corpus
    * never ships vectors to compare, only its log2(k)-bit codes.
    */
  def pqAdcRecall(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int,
      nProbes: Int, topK: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"need m | dims; got $m, $dims")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dims / m
    // float source cached once; micros slices recompute per pass via
    // the fused kernel (see pqCodes)
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val mvDf = base.select(col("id"), col("v"),
      SemDedup.microsVec(col("v")).as("mv"))
    val slices = (0 until m).map { s =>
      mvDf.select(col("id"),
        slice(col("mv"), s * sub + 1, sub).as("mv"))
    }
    val books = slices.map(sl => SemDedup.lloyd(sl, k, sub, iters))
    // ALL m subspace codes in ONE fused projection over the corpus —
    // m nearest-centroid kernel calls per row, no per-subspace join
    val codesWide = mvDf.select(col("id") +: (0 until m).map { s =>
      graft.ops.VectorExpressions.nearestCentroid(
        slice(col("mv"), s * sub + 1, sub), books(s))
        .cast("int").as(s"code$s")
    }: _*)
    // Per-subspace (pid, code) -> distance tables, driver-computed
    // from the nProbes collected probe vectors (bounded like the
    // codebooks). Probes are the nProbes LOWEST ids actually present
    // — not `id < nProbes`, which silently evaluates fewer (or zero)
    // probes on a sparse or offset id space. orderBy+limit plans as
    // a bounded-heap TakeOrderedAndProject, never a global sort.
    val probeSel = graft.Scratch.cache(mvDf.orderBy(col("id")).limit(nProbes))
    val probeVecs = probeSel
      .select(col("id"), col("mv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    def probeTable(s: Int) = probeVecs.flatMap { case (pid, pv) =>
      books(s).zipWithIndex.map { case (c, j) =>
        var d = 0L; var i = 0
        while (i < sub) {
          val diff = pv(s * sub + i) - c(i); d += diff * diff; i += 1
        }
        (pid, j, d)
      }
    }.toSeq
    // The ADC score assembles through m BROADCAST lookups against the
    // (nProbes x k)-row tables — the codes frame never shuffles and
    // nothing re-aggregates: the former (id, s, code)-exploded union
    // + (pid, id) sum funneled corpus x m x nProbes rows through a
    // shuffle, the scale ceiling of this operator at large corpora.
    val adc = (0 until m).foldLeft(codesWide) { (acc, s) =>
      val t = probeTable(s).toDF(s"_p$s", s"_c$s", s"d$s")
      val cond =
        if (s == 0) col("code0") === col("_c0")
        else col("pid") === col(s"_p$s") && col(s"code$s") === col(s"_c$s")
      acc.join(broadcast(t), cond)
        .withColumn("pid", col(s"_p$s"))
        .drop(s"_p$s", s"_c$s")
    }
      .filter(col("id") =!= col("pid"))
      .select(col("pid"), col("id"),
        (0 until m).map(s => col(s"d$s")).reduce(_ + _).as("adc"))
    val probes = probeSel.select(col("id").as("pid"), col("v").as("pv"))
    val exact = base.select(col("id"), col("v"))
      .crossJoin(broadcast(probes))
      .filter(col("id") =!= col("pid"))
      .select(col("pid"), col("id"),
        round(Similarity.cosine(col("v"), col("pv")), 6).as("cos"))
    // Both top-k rankings via the k-bounded heap aggregate (topk_by),
    // NOT rank windows: `row_number() OVER (PARTITION BY pid ...)`
    // funnels the ENTIRE corpus x probes frame through nProbes
    // reducers and sorts it — the scale ceiling of this operator.
    // topk_by combines map-side (<= k rows per mapper per pid reach
    // the shuffle) and never materializes an ordering. Selection is
    // IDENTICAL: cos is pre-rounded to 6 dp, so round(cos * 1e6) is
    // a monotone integer image, and the payload is the 16-digit hex
    // of the sign-flipped id bits (`id XOR Long.MinValue`) — a
    // fixed-width string whose lexicographic order equals signed
    // numeric order for EVERY long, negatives included (decimal
    // lpad diverged there). The encoding is injective, and the id
    // arrays only ever feed array_intersect, so they stay encoded.
    def topIds(df: DataFrame, ord: Column, out: String) =
      df.groupBy(col("pid"))
        .agg(TopKAgg.topKBy(ord,
          lpad(hex(col("id").bitwiseXOR(lit(Long.MinValue))), 16, "0"),
          topK).as("t"))
        .select(col("pid"),
          transform(col("t"), e => e.getField("payload")).as(out))
    val exactTop = topIds(exact,
      round(col("cos") * lit(1000000d)).cast("long"), "e_ids")
    val adcTop = topIds(adc, -col("adc"), "a_ids")
    exactTop.join(adcTop, Seq("pid"))
      .select(col("pid"),
        size(array_intersect(col("e_ids"), col("a_ids")))
          .cast("long").as("overlap_at_k"))
      .select(col("pid"), col("overlap_at_k"),
        expr(s"(overlap_at_k * 1000) DIV $topK").as("overlap_permille"))
  }

  /** End-to-end IVF + residual-PQ ANN search — the full serving
    * ladder in one operator (unifying the q38 coarse probe, the q201
    * residual index, and the q186 ADC scoring): coarse-probe the
    * `nprobe` nearest IVF cells, score ONLY code tuples via
    * per-probed-cell residual ADC tables, take the `rerank` best
    * candidates, and re-rank exactly on the float vectors. Reports,
    * per probe: the candidate count, pure-ADC recall@k, and
    * post-re-rank recall@k vs the exact cosine ranking.
    *
    * Scale posture: the corpus ships ONLY its (cell, m codes) tuples
    * into the candidate join — vectors never move. The ADC tables
    * (nProbes x nprobe x k^m rows) and every codebook are driver-
    * computed catalog-sized broadcasts; candidate ranking is the
    * k-bounded-heap `topk_by` (<= rerank rows per mapper per probe
    * reach the shuffle, no per-probe corpus sort); only the
    * rerank x nProbes winning ids rejoin the float source for the
    * exact pass. Re-rank can only help: an exact-top-k member
    * surviving the ADC cut has at most k-1 exact-betters anywhere,
    * so it always survives the exact re-rank too (pinned in spec).
    */
  def ivfResidualSearchRecall(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, ivfK: Int, m: Int, k: Int, iters: Int,
      nprobe: Int, nProbes: Int, rerank: Int, topK: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"need m | dims; got $m, $dims")
    require(m == 2, "ivfResidualSearchRecall materializes (code0, " +
      "code1) ADC rows for m = 2 (the registry contract); generalize " +
      "the row shape before calling with other m")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dims / m
    // ---- index build: identical contract to residualPqCodes ----
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val mvDf = base.select(col("id"), SemDedup.microsVec(col("v")).as("mv"))
    val cells = SemDedup.lloyd(mvDf, ivfK, dims, iters)
    val centsDf = cells.zipWithIndex
      .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cell", "cv")
    val res = graft.Scratch.cache(mvDf
      .withColumn("cell", graft.ops.VectorExpressions
        .nearestCentroid(col("mv"), cells).cast("long"))
      .join(broadcast(centsDf), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("mv"), col("cv"), (a, b) => a - b).as("mv")))
    val books = (0 until m).map { s =>
      SemDedup.lloyd(res.select(col("id"),
        slice(col("mv"), s * sub + 1, sub).as("mv")), k, sub, iters)
    }
    // the only corpus-wide frame the search reads: (cell, codes)
    val codes = res.select(col("id") +: col("cell") +: (0 until m).map { s =>
      graft.ops.VectorExpressions.nearestCentroid(
        slice(col("mv"), s * sub + 1, sub), books(s))
        .cast("long").as(s"code$s")
    }: _*)
    // ---- probes: the nProbes lowest ids, floats collected ----
    val probeSel = graft.Scratch.cache(base.orderBy(col("id")).limit(nProbes))
    val probeVecs: Array[(Long, Array[Long], Seq[Float])] = probeSel
      .select(col("id"), col("v")).collect()
      .map { r =>
        val fv = r.getSeq[Float](1)
        (r.getLong(0),
          fv.map(x => math.floor(x.toDouble * 1e6).toLong).toArray, fv)
      }
    // ---- driver-side coarse probe + residual ADC tables ----
    def sqDist(a: Array[Long], b: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    val adcRows = probeVecs.flatMap { case (pid, qmv, _) =>
      val probed = cells.zipWithIndex
        .map { case (c, j) => (j, sqDist(qmv, c)) }
        .sortBy { case (j, d) => (d, j) }.take(nprobe).map(_._1)
      probed.flatMap { j =>
        val qres = qmv.zip(cells(j)).map { case (a, b) => a - b }
        val tabs = (0 until m).map { s =>
          val sl = qres.slice(s * sub, (s + 1) * sub)
          books(s).map(entry => sqDist(sl, entry))
        }
        // enumerate every code tuple's ADC score for this (pid, cell)
        def tuples(s: Int): Seq[(Seq[Long], Long)] =
          if (s == m) Seq(Seq.empty -> 0L)
          else for {
            (rest, d) <- tuples(s + 1)
            c <- 0 until k
          } yield (c.toLong +: rest) -> (tabs(s)(c) + d)
        tuples(0).map { case (cs, d) => (pid, j.toLong, cs, d) }
      }
    }
    val adcTab = adcRows.map { case (pid, cell, cs, d) =>
        (pid, cell, cs.head, cs(1), d)
      }.toSeq.toDF("pid", "cell", "code0", "code1", "adc")
    // ---- candidate scoring: codes frame x broadcast ADC tables ----
    val cand = codes.join(broadcast(adcTab),
        Seq("cell", "code0", "code1"))
      .filter(col("id") =!= col("pid"))
      .select(col("pid"), col("id"), col("adc"))
    val hexId = lpad(hex(col("id").bitwiseXOR(lit(Long.MinValue))), 16, "0")
    def topPayloads(df: DataFrame, ord: Column, n: Int, out: String) =
      df.groupBy(col("pid"))
        .agg(TopKAgg.topKBy(ord, hexId, n).as("t"))
        .select(col("pid"),
          transform(col("t"), e => e.getField("payload")).as(out))
    val nCand = cand.groupBy(col("pid")).agg(count(lit(1)).as("n_cand"))
    val adcTop = topPayloads(cand, -col("adc"), topK, "a_ids")
    val shortlist = topPayloads(cand, -col("adc"), rerank, "r_ids")
      .select(col("pid"), explode(col("r_ids")).as("hexid"))
      .withColumn("id", (conv(col("hexid"), 16, 10)
        .cast(org.apache.spark.sql.types.DecimalType(20, 0))
        - lit(BigDecimal("9223372036854775808"))).cast("long"))
    // ---- exact re-rank of the shortlist (rerank x nProbes rows) ----
    val probeFloats = probeVecs.map { case (pid, _, fv) => (pid, fv) }
      .toSeq.toDF("pid", "pv")
    val rr = shortlist
      .join(base, Seq("id"))
      .join(broadcast(probeFloats), Seq("pid"))
      .select(col("pid"), col("id"),
        round(round(Similarity.cosine(col("v"), col("pv")), 6)
          * lit(1000000d)).cast("long").as("ci"))
    val rrTop = topPayloads(rr, col("ci"), topK, "rr_ids")
    // ---- exact reference ranking over the full corpus ----
    val exact = base.crossJoin(broadcast(probeFloats))
      .filter(col("id") =!= col("pid"))
      .select(col("pid"), col("id"),
        round(round(Similarity.cosine(col("v"), col("pv")), 6)
          * lit(1000000d)).cast("long").as("ci"))
    val exTop = topPayloads(exact, col("ci"), topK, "e_ids")
    exTop.join(adcTop, Seq("pid")).join(rrTop, Seq("pid"))
      .join(nCand, Seq("pid"))
      .select(col("pid"), col("n_cand"),
        size(array_intersect(col("e_ids"), col("a_ids")))
          .cast("long").as("recall_adc_at_10"),
        size(array_intersect(col("e_ids"), col("rr_ids")))
          .cast("long").as("recall_at_10"))
  }

  /** Per-dimension quantization audit over (id, Array[Float]) rows:
    * one row per dimension with the quantization range, code range,
    * and reconstruction-error certificate.
    */
  def quantizeAudit(df: DataFrame, vecCol: String): DataFrame = {
    val ex = df.select(
      posexplode(transform(col(vecCol), v => micros(v))).as(Seq("dim", "v")))
    val stats = ex.groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    ex.join(broadcast(stats), Seq("dim"))
      .withColumn("code", when(col("hi") > col("lo"),
        expr("((v - lo) * 255) DIV (hi - lo)")).otherwise(lit(0L)))
      .withColumn("err", col("v") - (col("lo") + expr("(code * (hi - lo)) DIV 255")))
      .groupBy(col("dim"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        min(col("code")).as("min_code"), max(col("code")).as("max_code"),
        max(col("err")).as("max_err"), sum(col("err")).as("sum_err"))
      .withColumn("ok",
        (col("max_err") <= expr("((hi - lo) DIV 255) + 1")).cast("long"))
  }

  /** Scalar-quantization retrieval cost, measured: asymmetric-distance
    * recall@k of int8 storage — queries stay full precision (micros),
    * the corpus is replaced by its [[quantizeAudit]]-formula round
    * trip (code = ((m-lo)*255) DIV wd, dv = lo + (code*wd) DIV 255) —
    * versus the exact integer-L2 ranking. This is the 4x-compression
    * counterpart of q186's PQ ADC recall: SQ8 keeps per-dimension
    * resolution (256 steps each) where PQ shares one codebook per
    * subspace, so its recall floor is usually far higher; this query
    * prices that trade in the same overlap@k units.
    *
    * All integer: per-dim micros diffs <= ~4e6, squared 1.6e13, x64
    * dims ~1e15 << 2^63. Ranks break ties by candidate id — both
    * rankings and the DuckDB oracle replay bit-for-bit.
    *
    * 100 TB posture: ONE corpus pass builds the dimension-keyed
    * min/max table (map-side-combined; dims rows reach the driver —
    * same bounded-collect class as Lloyd codebooks), the range
    * tables ride inside fused expressions (reference objects, never
    * shuffled), and scoring is probes x corpus with two fused long
    * kernels per pair — no explode, no self-join, no HOF boxing.
    */
  def sq8AdcRecall(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, nProbes: Int, k: Int): DataFrame = {
    require(nProbes >= 1 && k >= 1, s"need positive nProbes/k")
    val base = graft.Scratch.cache(df.filter(size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("cid"),
        VectorExpressions.microsVec(col(vecCol)).as("mv")))
    val stats = base.select(posexplode(col("mv")).as(Seq("i", "m")))
      .groupBy(col("i"))
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .collect() // dims rows — bounded, like a codebook
    val lo = new Array[Long](dims)
    val wd = new Array[Long](dims)
    stats.foreach { r =>
      val i = r.getAs[Int]("i")
      lo(i) = r.getAs[Long]("lo")
      wd(i) = r.getAs[Long]("hi") - lo(i)
    }
    val probes = base.filter(col("cid") < nProbes)
      .select(col("cid").as("pid"), col("mv").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
    val wE = w.partitionBy(col("pid")).orderBy(col("d_exact"), col("cid"))
    val wQ = w.partitionBy(col("pid")).orderBy(col("d_sq8"), col("cid"))
    base
      .select(col("cid"), col("mv"),
        VectorExpressions.sq8Dequant(col("mv"), lo, wd).as("dv"))
      .crossJoin(broadcast(probes))
      .filter(col("cid") =!= col("pid"))
      .select(col("pid"), col("cid"),
        VectorExpressions.sqDist(col("mv"), col("qv")).as("d_exact"),
        VectorExpressions.sqDist(col("dv"), col("qv")).as("d_sq8"))
      .withColumn("re", row_number().over(wE))
      .withColumn("rq", row_number().over(wQ))
      .groupBy(col("pid"))
      .agg(sum(when(col("re") <= k && col("rq") <= k, 1L).otherwise(0L))
        .cast("long").as("overlap_at_k"))
      .select(col("pid"), col("overlap_at_k"),
        expr(s"(overlap_at_k * 1000) DIV $k").as("overlap_permille"))
  }

  /** Per-VECTOR quality audit, grouped by dimensionality — the
    * release check that catches ragged arrays, zero/degenerate
    * vectors, and norm drift before an index build. Norms are exact
    * fixed-point: norm2 = sum(micros(v)^2) per vector (<= 2^46 for
    * 64 dims of unit-scale floats), reported in DIV-1e6 units so the
    * corpus-wide sum stays far from long range (bound: corpus rows
    * < ~1e11 at 64 dims — document-scale safe).
    *
    * One narrow pass: the per-vector fold happens map-side inside the
    * projection; only (dims)-keyed partials shuffle.
    */
  def embeddingAudit(df: DataFrame, vecCol: String): DataFrame = {
    // contract: every PHYSICAL ROW is audited independently (duplicate
    // ids are two vectors — merging them would sum unrelated norms);
    // an empty array is a dims=0, norm2=0 row (a zero vector), and a
    // NULL array is a dims=NULL group with NULL norms. The oracle
    // mirrors this with per-row list folds, never unnest+group.
    val m = df.select(size(col(vecCol)).as("dims"),
      aggregate(transform(col(vecCol), v => micros(v)),
        lit(0L), (acc, x) => acc + x * x).as("norm2"))
      .withColumn("n2u", expr("norm2 DIV 1000000"))
    m.groupBy(col("dims"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("norm2") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("n2u")).as("min_norm2u"),
        max(col("n2u")).as("max_norm2u"),
        sum(col("n2u")).cast("long").as("sum_norm2u"))
      // integer DIV, not double `/`: sum*1 stays exact past 2^53
      .withColumn("avg_norm2u", expr("sum_norm2u DIV n"))
  }

  /** Pairwise squared L2 distances between per-group embedding
    * centroids, in exact fixed-point — the class-separation audit an
    * embedding release runs after training: labels whose centroids
    * collapse together predict retrieval confusion. Only rows with
    * exactly `dims` components participate (ragged rows are
    * [[embeddingAudit]]'s findings, not this report's input).
    *
    * Centroid components are integer micros (sum DIV n — truncating
    * division, which Spark DIV and DuckDB // both apply, negatives
    * included); dist2u = sum((c_a - c_b)^2) DIV 1e6 per pair.
    *
    * 100 TB posture: one corpus pass collapses to (group, dim)
    * partial sums — the explode pipelines into map-side partial
    * aggregation, so what shuffles is group-catalog × dims partials.
    * The pair matrix is a self-join of the CATALOG-sized centroid
    * frame on dim (broadcast), never touching the corpus again.
    * Overflow: |micros| <= ~2^21 for unit-scale floats, so a 2^41
    * per-pair-dim square times 4096 dims stays < 2^53 — and the
    * per-(grp,dim) sum holds to ~4*10^12 corpus rows per group.
    */
  def centroidDistances(df: DataFrame, vecCol: String, groupCol: Column,
      dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val ex = df.filter(size(col(vecCol)) === dims)
      .select(groupCol.as("grp"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("grp"), col("i"), micros(col("v")).cast("long").as("m"))
    val cent = graft.Scratch.cache(ex.groupBy(col("grp"), col("i"))
      .agg(sum(col("m")).as("s"), count(lit(1)).as("cnt"))
      .select(col("grp"), col("i"), expr("s DIV cnt").as("c"), col("cnt")))
    val a = cent.select(col("grp").as("grp_a"), col("i"),
      col("c").as("c_a"), col("cnt").as("n_a"))
    val b = cent.select(col("grp").as("grp_b"), col("i"),
      col("c").as("c_b"), col("cnt").as("n_b"))
    a.join(broadcast(b), Seq("i")).filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(max(col("n_a")).cast("long").as("n_a"),
        max(col("n_b")).cast("long").as("n_b"),
        sum((col("c_a") - col("c_b")) * (col("c_a") - col("c_b")))
          .as("d2"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        expr("d2 DIV 1000000").cast("long").as("dist2u"))
  }

  /** Nearest-centroid (Rocchio) classification of held-out vectors
    * against label centroids fit on the train split — the embedding-
    * space sibling of the token-space Naive Bayes (q163): train =
    * one (label, dim) partial-sum pass; apply = test vectors exploded
    * per dim, joined to the CATALOG-sized centroid frame (broadcast),
    * one (vec, label) aggregation, argmin window (ties to the
    * smallest label). All arithmetic in fixed-point micros with
    * truncating centroid division — bit-identical cross-engine.
    * Output: (actual, predicted, n_vecs) confusion matrix.
    */
  def nearestCentroidConfusion(train: DataFrame, test: DataFrame,
      idCol: String, vecCol: String, labelCol: Column,
      dims: Int): DataFrame = {
    val cent = train.filter(size(col(vecCol)) === dims)
      .select(labelCol.as("grp"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("grp"), col("i"), micros(col("v")).cast("long").as("m"))
      .groupBy(col("grp"), col("i"))
      .agg(sum(col("m")).as("s"), count(lit(1)).as("cnt"))
      .select(col("grp"), col("i"), expr("s DIV cnt").as("c"))
    val exTest = test.filter(size(col(vecCol)) === dims)
      .select(col(idCol).as("vec_id"), labelCol.as("actual"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("vec_id"), col("actual"), col("i"),
        micros(col("v")).cast("long").as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("d2"), col("grp"))
    exTest.join(broadcast(cent), Seq("i"))
      .groupBy(col("vec_id"), col("actual"), col("grp"))
      .agg(sum((col("m") - col("c")) * (col("m") - col("c"))).as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("actual"), col("grp").as("predicted"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("actual"), col("predicted"))
  }
}
