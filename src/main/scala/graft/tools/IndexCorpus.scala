package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.SemDedup

/** CLI: ANN index BUILD / SEARCH split with persisted artifacts — the
  * production retrieval shape (index once, probe many) composed from
  * the library's exact-integer primitives:
  *
  *   - IVF coarse router: fixed-point Lloyd cells over the full
  *     vectors ([[SemDedup]]'s integer k-means contract), persisted
  *     as a (cell, i, c) centroid frame + (id, cell) assignments;
  *   - PQ payload: m per-subspace codebooks + per-vector codes
  *     ([[graft.ops.Quantize.pqCodes]]'s layout in long form), so the
  *     search set ships log2(k)-bit codes, not vectors.
  *
  * Search routes a probe to its `nprobe` nearest cells (driver math
  * on the catalog-sized centroid frame), scores ONLY those cells'
  * members by ADC (probe slices vs codebook entries, one broadcast
  * join), and returns the top-k (id, adc). Global-PQ simplification:
  * codes quantize the raw vectors, not per-cell residuals — the
  * standard first rung of the IVF-PQ ladder; residual encoding slots
  * into the same artifact layout.
  *
  * Every artifact is integer-exact parquet, so a rebuilt index is
  * byte-identical and IndexCorpusSpec can re-derive a search answer
  * from the persisted files alone.
  *
  * An optional SECOND storage tier, `--sq8 true`, persists int8
  * scalar-quantization artifacts alongside PQ: `sq8_ranges` (per-dim
  * lo/width, the [[graft.ops.Quantize.quantizeAudit]] formulas) and
  * `sq8_codes` (per-vector codes packed ONE BYTE per dimension into
  * a binary column — 64 B/vector at dims = 64, the real 4x vs
  * fp32). `search --tier sq8` then ADC-scores the
  * probed cells against SQ8 reconstructions instead of PQ tables —
  * the measured ladder (RECALL.md round 10: SQ8 9.9/10 vs PQ 0.8/10
  * recall@10) made concrete as a serving choice per query.
  *
  * Usage:
  *   runMain graft.tools.IndexCorpus build <emb.parquet> <indexDir>
  *     [--id vec_id] [--vec embedding] [--dims 64] [--ivf-k 8]
  *     [--pq-m 2] [--pq-k 4] [--iters 1] [--residual true]
  *     [--sq8 true]
  *   runMain graft.tools.IndexCorpus delete <indexDir> <ids.parquet>
  *     [--id vec_id]
  *   runMain graft.tools.IndexCorpus compact <indexDir>
  *   runMain graft.tools.IndexCorpus search <indexDir> <emb.parquet>
  *     <probeId> [--id vec_id] [--vec embedding] [--k 10] [--nprobe 2]
  *     [--filter "<sqlExpr over id, cell>"] [--rerank N] [--tier sq8|exact]
  */
object IndexCorpus {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-index")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.headOption match {
        case Some("build")   => build(spark, args.drop(1))
        case Some("update")  => update(spark, args.drop(1))
        case Some("delete")  => delete(spark, args.drop(1))
        case Some("compact") => compact(spark, args.drop(1))
        case Some("search") =>
          search(spark, args.drop(1)).show(100, truncate = false)
        case _ =>
          sys.error("usage: IndexCorpus build|update|delete|compact|search ...")
      }
    } finally spark.stop()
  }

  private def flagsOf(args: Array[String], from: Int): Map[String, String] =
    args.drop(from).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Invalidate any cached plan over the index files after a mutating
    * command — a not-yet-released query-scoped cached scan of the old
    * file set would otherwise serve stale listings to a same-shaped
    * later plan (the [[LexIndex]] lifecycle discipline).
    */
  private def refresh(spark: SparkSession, idx: String): Unit =
    spark.catalog.refreshByPath(idx)

  /** Retract vectors from the index. Same contract as
    * [[LexIndex.delete]]: a TOMBSTONE append (O(deleted) — a delete
    * wave must never repay the build), honored by [[search]] via an
    * anti-join on the cell-restricted candidates, so post-delete
    * answers equal a fresh build over the survivors fed the SAME
    * frozen model (the router and codebooks never retrain on delete)
    * — the q273 driver row proves it. Ids not present (or already
    * deleted) are ignored; re-ingesting a tombstoned id via
    * [[update]] is rejected permanently (IndexCorpusSpec exercises
    * the resurrection rule before and after compact).
    */
  def delete(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: delete <indexDir> <ids.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "vec_id")
    GraftSession.tune(spark)

    val live0 = spark.read.parquet(s"$idx/assignments").select(col("id"))
    val live =
      if (exists(spark, s"$idx/tombstones"))
        live0.join(spark.read.parquet(s"$idx/tombstones"),
          Seq("id"), "left_anti")
      else live0
    val doomed = graft.Scratch.localCheckpoint(
      spark.read.parquet(in).select(col(idCol).cast("long").as("id"))
        .distinct()
        .join(live, Seq("id"), "left_semi"))
    val nDel = doomed.count()
    doomed.write.mode("append").parquet(s"$idx/tombstones")
    refresh(spark, idx)
    Seq("deleted" -> nDel)
  }

  /** Fold the tombstones into the membership artifacts: rewrite
    * assignments / pq_codes / sq8_codes without the deleted ids (an
    * anti-join against the SMALL tombstone set), each re-coalesced
    * (repeated [[update]] appends accumulate a parquet fragment per
    * ingest). The model artifacts (centroids, codebooks, sq8 ranges,
    * summary) are untouched — compaction is a membership rewrite,
    * never a retrain. The tombstone set SURVIVES (distinct,
    * coalesced) as the permanent retraction artifact, so a
    * post-compact update still rejects retracted ids. Answers are
    * unchanged by construction (search already honored the
    * tombstones) — q273 searches after delete + compact against the
    * survivor-restricted oracle; the physical claims are
    * IndexCorpusSpec's.
    */
  def compact(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 1, "usage: compact <indexDir>")
    val idx = args(0)
    GraftSession.tune(spark)
    refresh(spark, idx)
    val hasTomb = exists(spark, s"$idx/tombstones")
    val written = Seq.newBuilder[(String, Long)]
    Seq("assignments", "pq_codes", "sq8_codes").foreach { name =>
      val path = s"$idx/$name"
      if (exists(spark, path)) {
        val src = spark.read.parquet(path)
        val out =
          if (hasTomb)
            src.join(spark.read.parquet(s"$idx/tombstones").select(col("id")),
              Seq("id"), "left_anti")
          else src
        // the checkpoint is LAZY — count() forces every partition
        // into block storage BEFORE the overwrite truncates the very
        // files the plan reads
        val snap = graft.Scratch.localCheckpoint(out)
        snap.count()
        snap.coalesce(1).write.mode("overwrite").parquet(path)
        refresh(spark, path)
        written += (name -> spark.read.parquet(path).count())
      }
    }
    // radii are CELL-keyed, so the tombstone anti-join does not apply
    // — fold the appended per-ingest maxes to one row per cell. Post-
    // delete radii may overestimate (max over fewer members), which
    // only weakens the exact tier's pruning, never its answers.
    if (exists(spark, s"$idx/ivf_radii")) {
      val path = s"$idx/ivf_radii"
      val snap = graft.Scratch.localCheckpoint(
        spark.read.parquet(path)
          .groupBy(col("cell")).agg(max(col("r2")).as("r2")))
      snap.count()
      snap.coalesce(1).write.mode("overwrite").parquet(path)
      refresh(spark, path)
      written += ("ivf_radii" -> spark.read.parquet(path).count())
    }
    if (hasTomb) {
      val tomb = graft.Scratch.localCheckpoint(
        spark.read.parquet(s"$idx/tombstones").select(col("id")).distinct())
      tomb.count()
      tomb.coalesce(1).write.mode("overwrite").parquet(s"$idx/tombstones")
      refresh(spark, s"$idx/tombstones")
      written += ("tombstones" -> spark.read
        .parquet(s"$idx/tombstones").count())
    }
    written.result()
  }

  /** Build the index artifacts; returns (artifact, rows) per write.
    * `--residual true` quantizes each vector's RESIDUAL against its
    * IVF cell centroid instead of the raw vector (the second rung of
    * the IVF-PQ ladder: the router absorbs the coarse structure, so
    * the codebooks spend their bits on what remains). Artifact layout
    * is identical; the flag is recorded in `summary` and honored by
    * [[search]].
    */
  def build(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: build <emb.parquet> <indexDir> [flags]")
    val (in, out) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "vec_id")
    val vecCol = flags.getOrElse("vec", "embedding")
    val dims = flags.getOrElse("dims", "64").toInt
    val ivfK = flags.getOrElse("ivf-k", "8").toInt
    val pqM = flags.getOrElse("pq-m", "2").toInt
    val pqK = flags.getOrElse("pq-k", "4").toInt
    val iters = flags.getOrElse("iters", "1").toInt
    val residual = flags.getOrElse("residual", "false").toBoolean
    require(dims % pqM == 0, s"pq-m must divide dims; got $pqM, $dims")
    val sub = dims / pqM
    GraftSession.tune(spark)
    import spark.implicits._

    // float source cached; the micros view recomputes per pass via
    // the fused kernel (caching derived long-array columns measured
    // 30-100x the recompute cost at millions of rows — SCALING.md r8)
    val srcF = graft.Scratch.cache(
      spark.read.parquet(in).filter(size(col(vecCol)) === dims)
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("v")))
    val base = srcF.select(col("id"),
      SemDedup.microsVec(col("v")).as("mv"))
    val written = Seq.newBuilder[(String, Long)]
    def write(name: String, df: DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      written += (name -> spark.read.parquet(s"$out/$name").count())
    }

    // IVF router: full-dim fixed-point cells + assignments + per-cell
    // RADII (max member squared distance — the triangle-inequality
    // bound `--tier exact` prunes with; one cached assignment pass
    // feeds both artifacts)
    val cells = SemDedup.lloyd(base, ivfK, dims, iters)
    write("ivf_centroids", cells.zipWithIndex.flatMap { case (c, j) =>
      c.zipWithIndex.map { case (v, i) => (j.toLong, i.toLong, v) }
    }.toSeq.toDF("cell", "i", "c"))
    val asgnAll = graft.Scratch.cache(SemDedup.assignDist(base, cells))
    write("assignments", asgnAll
      .select(col("id"), col("cluster").cast("long").as("cell")))
    write("ivf_radii", asgnAll
      .groupBy(col("cluster").cast("long").as("cell"))
      .agg(max(col("d")).as("r2")))

    // Encoding input: raw vectors, or residuals against the cell
    // centroid (one broadcast join + a zip_with — still one narrow
    // pass over the corpus)
    val encBase =
      if (!residual) base
      else {
        val centsDf = cells.zipWithIndex
          .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cell", "cv")
        graft.Scratch.cache(base
          .join(spark.read.parquet(s"$out/assignments"), Seq("id"))
          .join(broadcast(centsDf), Seq("cell"))
          .select(col("id"),
            zip_with(col("mv"), col("cv"), (a, b) => a - b).as("mv")))
      }

    // PQ payload: per-subspace codebooks + long-form codes. Slices
    // derive per pass (narrow kernel + slice over the cached float
    // source / materialized residual) — no derived-array caches.
    // Codes carry the CELL key (appended last — readers index the
    // first columns positionally): search can then meet the code
    // artifact with a pushed literal `cell IN (...)` instead of a
    // corpus-linear semi join (the round-12 serve-path lever).
    val cellOf = spark.read.parquet(s"$out/assignments")
    val slices = (0 until pqM).map { s =>
      encBase.select(col("id"),
        slice(col("mv"), s * sub + 1, sub).as("mv"))
    }
    val books = slices.map(sl => SemDedup.lloyd(sl, pqK, sub, iters))
    write("pq_codebooks", books.zipWithIndex.flatMap { case (b, s) =>
      b.toSeq.zipWithIndex.flatMap { case (c, j) =>
        c.toSeq.zipWithIndex.map { case (v, i) =>
          (s.toLong, j.toLong, i.toLong, v)
        }
      }
    }.toDF("s", "j", "i", "c"))
    write("pq_codes", (0 until pqM).map { s =>
      SemDedup.assignDist(slices(s), books(s))
        .select(col("id"), lit(s.toLong).as("s"),
          col("cluster").cast("long").as("code"))
    }.reduce(_ unionByName _)
      .join(cellOf, Seq("id"))
      .select(col("id"), col("s"), col("code"), col("cell")))

    // optional SQ8 tier: per-dim range table + per-vector code arrays
    val sq8 = flags.getOrElse("sq8", "false").toBoolean
    if (sq8) {
      write("sq8_ranges", base
        .select(posexplode(col("mv")).as(Seq("i", "m")))
        .groupBy(col("i"))
        .agg(min(col("m")).as("lo"), (max(col("m")) - min(col("m"))).as("wd"))
        .select(col("i").cast("long").as("i"), col("lo"), col("wd")))
      val rows = spark.read.parquet(s"$out/sq8_ranges").collect()
      val lo = new Array[Long](dims)
      val wd = new Array[Long](dims)
      rows.foreach { r =>
        val i = r.getAs[Long]("i").toInt
        lo(i) = r.getAs[Long]("lo")
        wd(i) = r.getAs[Long]("wd")
      }
      // ONE BYTE per dimension on disk (64 B/vector at dims = 64 —
      // the real 4x-vs-fp32 artifact, not longs a parquet encoder
      // merely dictionary-packs); cell key appended for the pushed
      // probed-cell restriction at search time
      write("sq8_codes", base.select(col("id"),
        graft.ops.VectorExpressions.sq8PackBytes(col("mv"), lo, wd)
          .as("codes"))
        .join(cellOf, Seq("id"))
        .select(col("id"), col("codes"), col("cell")))
    }

    val res = written.result()
    (Seq(("dims", dims), ("ivf_k", ivfK), ("pq_m", pqM), ("pq_k", pqK),
      ("iters", iters), ("residual", if (residual) 1 else 0),
      ("sq8", if (sq8) 1 else 0))
      .map { case (k, v) => (k, v.toLong) } ++ res)
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").json(s"$out/summary")
    res
  }

  /** Incremental maintenance: ingest NEW vectors into an existing
    * index without touching the codebooks — assign each to its
    * nearest IVF cell and PQ-encode with the FROZEN codebooks (the
    * production ingest path: centroids retrain offline on a cadence,
    * appends land continuously). Appends to `assignments` and
    * `pq_codes`; ids already present are rejected (callers dedup
    * upstream — see q78's incremental contract).
    */
  def update(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: update <indexDir> <newEmb.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "vec_id")
    val vecCol = flags.getOrElse("vec", "embedding")
    Seq("ingested" ->
      ingestFrame(spark, idx, spark.read.parquet(in), idCol, vecCol))
  }

  /** The frozen-model ingest core shared by the [[update]] CLI and
    * the STREAMING maintenance path (q278's foreachBatch calls this
    * once per micro-batch): assign against the frozen router, encode
    * with the frozen codebooks (and frozen SQ8 ranges), append. The
    * index is searchable between batches; the end-of-stream state is
    * identical to one batch update over everything that arrived —
    * q278 shares q202's closed-form oracle.
    */
  def ingestFrame(spark: SparkSession, idx: String,
      raw: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String): Long = {
    GraftSession.tune(spark)
    import spark.implicits._

    val cents = spark.read.parquet(s"$idx/ivf_centroids").collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rows) =>
        rows.sortBy(_.getLong(1)).map(_.getLong(2))
      }.toArray
    val books = spark.read.parquet(s"$idx/pq_codebooks").collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (_, rows) =>
        rows.groupBy(_.getLong(1)).toSeq.sortBy(_._1).map { case (_, rs) =>
          rs.sortBy(_.getLong(2)).map(_.getLong(3))
        }.toArray
      }.toArray
    val residual = spark.read.json(s"$idx/summary")
      .filter(col("key") === "residual")
      .collect().headOption.exists(_.getLong(1) == 1L)
    val dims = cents(0).length
    val pqM = books.length
    val sub = dims / pqM

    // localCheckpoint cuts the lineage back to the assignments path:
    // the appends below must not carry a plan that re-reads the very
    // files they are adding to. Dedup is against assignments PLUS the
    // tombstones: a retracted id must never re-enter, even after a
    // compact rewrote it out of assignments (permanent retraction —
    // see delete()).
    val existing0 = spark.read.parquet(s"$idx/assignments").select(col("id"))
    val existing =
      if (exists(spark, s"$idx/tombstones"))
        existing0.unionByName(
          spark.read.parquet(s"$idx/tombstones").select(col("id")))
      else existing0
    val base = graft.Scratch.localCheckpoint(
      raw.filter(size(col(vecCol)) === dims)
        .select(col(idCol).cast("long").as("id"),
          SemDedup.microsVec(col(vecCol)).as("mv"))
        .join(existing, Seq("id"), "left_anti"))

    val asgnD = graft.Scratch.cache(SemDedup.assignDist(base, cents)
      .select(col("id"), col("cluster").cast("long").as("cell"),
        col("d")))
    val asgn = asgnD.select(col("id"), col("cell"))
    asgn.write.mode("append").parquet(s"$idx/assignments")
    // an ingested vector may sit FARTHER from its cell centroid than
    // any built one — append the per-cell max so the exact tier's
    // pruning bound stays an overestimate (search maxes per cell at
    // read time; appends never race a rewrite)
    if (exists(spark, s"$idx/ivf_radii"))
      asgnD.groupBy(col("cell")).agg(max(col("d")).as("r2"))
        .write.mode("append").parquet(s"$idx/ivf_radii")

    val encBase =
      if (!residual) base
      else {
        val centsDf = cents.zipWithIndex
          .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cell", "cv")
        base.join(asgn, Seq("id")).join(broadcast(centsDf), Seq("cell"))
          .select(col("id"),
            zip_with(col("mv"), col("cv"), (a, b) => a - b).as("mv"))
      }
    val hasCellKey = spark.read.parquet(s"$idx/pq_codes")
      .schema.fieldNames.contains("cell")
    val newCodes0 = (0 until pqM).map { s =>
      SemDedup.assignDist(
        encBase.select(col("id"), slice(col("mv"), s * sub + 1, sub).as("mv")),
        books(s))
        .select(col("id"), lit(s.toLong).as("s"),
          col("cluster").cast("long").as("code"))
    }.reduce(_ unionByName _)
    // legacy (pre-cell-key) indexes append in the old shape; current
    // ones carry the cell so the search-time pushdown keeps working
    // over the appended rows too
    val newCodes =
      if (hasCellKey) newCodes0.join(asgn, Seq("id"))
        .select(col("id"), col("s"), col("code"), col("cell"))
      else newCodes0
    newCodes.write.mode("append").parquet(s"$idx/pq_codes")
    // the SQ8 tier ingests too (frozen per-dim ranges, like the
    // frozen codebooks) — without this append an updated vector
    // would be silently unsearchable under `--tier sq8`
    val hasSq8 = spark.read.json(s"$idx/summary")
      .filter(col("key") === "sq8")
      .collect().headOption.exists(_.getLong(1) == 1L)
    if (hasSq8) {
      val rows = spark.read.parquet(s"$idx/sq8_ranges").collect()
      val lo = new Array[Long](dims)
      val wd = new Array[Long](dims)
      rows.foreach { r =>
        val i = r.getAs[Long]("i").toInt
        lo(i) = r.getAs[Long]("lo")
        wd(i) = r.getAs[Long]("wd")
      }
      val sq8HasCell = spark.read.parquet(s"$idx/sq8_codes")
        .schema.fieldNames.contains("cell")
      val newSq80 = base.select(col("id"),
        graft.ops.VectorExpressions.sq8PackBytes(col("mv"), lo, wd)
          .as("codes"))
      val newSq8 =
        if (sq8HasCell) newSq80.join(asgn, Seq("id"))
          .select(col("id"), col("codes"), col("cell"))
        else newSq80
      newSq8.write.mode("append").parquet(s"$idx/sq8_codes")
    }
    refresh(spark, idx)
    asgn.count()
  }

  /** Search the persisted index: route, ADC-score the probed cells,
    * top-k. The probe vector is read from `emb` by id (the serving
    * path would pass the vector directly — same math).
    *
    * `--filter <sqlExpr>` constrains the search to a stratum by
    * PRE-filtering candidates INSIDE the probed cells (the dominant
    * strategy of the q245 sweep — a probed-cell stratum member is
    * never lost to the predicate; the expression sees the
    * assignment columns `id`, `cell`). `--rerank <N>` re-ranks the
    * N ADC-best candidates EXACTLY on the float source (the q246
    * ladder): only N ids rejoin the vectors, and the output gains
    * the exact `cos_x1e6` next to the ADC score.
    */
  def search(spark: SparkSession, args: Array[String]): DataFrame = {
    require(args.length >= 3, "usage: search <indexDir> <emb.parquet> <probeId> [flags]")
    val (idx, in, probeId) = (args(0), args(1), args(2).toLong)
    val flags = flagsOf(args, 3)
    val idCol = flags.getOrElse("id", "vec_id")
    val vecCol = flags.getOrElse("vec", "embedding")
    val k = flags.getOrElse("k", "10").toInt
    val nprobe = flags.getOrElse("nprobe", "2").toInt
    val filterSql = flags.get("filter")
    val rerankN = flags.get("rerank").map(_.toInt)
    GraftSession.tune(spark)
    import spark.implicits._

    val cents = spark.read.parquet(s"$idx/ivf_centroids").collect()
      .groupBy(_.getLong(0)).map { case (j, rows) =>
        j -> rows.sortBy(_.getLong(1)).map(_.getLong(2))
      }
    val books = spark.read.parquet(s"$idx/pq_codebooks").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1))).map { case (sj, rows) =>
        sj -> rows.sortBy(_.getLong(2)).map(_.getLong(3))
      }
    val residual = spark.read.json(s"$idx/summary")
      .filter(col("key") === "residual")
      .collect().headOption.exists(_.getLong(1) == 1L)
    val dims = cents.head._2.length
    val pqM = books.keys.map(_._1).max.toInt + 1
    val sub = dims / pqM

    val pv = spark.read.parquet(in)
      .filter(col(idCol).cast("long") === probeId && size(col(vecCol)) === dims)
      .select(SemDedup.microsVec(col(vecCol))).head().getSeq[Long](0).toArray
    def l2(a: Array[Long], off: Int, c: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < c.length) { val x = a(off + i) - c(i); d += x * x; i += 1 }
      d
    }
    // route: nprobe nearest cells (ties to the lowest cell id)
    val probedCells = cents.toSeq
      .map { case (j, c) => (l2(pv, 0, c), j) }.sorted.take(nprobe)
      .map(_._2)

    // EXACT tier: recall 10/10 by construction through the artifacts.
    // Triangle inequality in true (square-rooted) distance space: any
    // member x of cell j satisfies d(q, x) >= d(q, c_j) - r_j, so a
    // cell whose lower bound exceeds the current kth-best distance
    // cannot contribute — prune it WITHOUT reading it. Two phases:
    // score the nprobe nearest cells exactly on the float source
    // (that top-k's kth distance is a valid upper bound on the final
    // kth), then score every unpruned remaining cell and re-rank.
    // Fewer than k phase-1 hits -> no pruning -> exhaustive scan
    // (still exact). Stored radii only ever OVERESTIMATE after a
    // delete/compact (max over fewer members) — an overestimate
    // weakens pruning, never correctness; update appends per-batch
    // cell maxes and search maxes per cell at read time.
    if (flags.getOrElse("tier", "pq") == "exact") {
      require(filterSql.isEmpty && rerankN.isEmpty,
        "--tier exact composes with neither --filter nor --rerank")
      require(exists(spark, s"$idx/ivf_radii"),
        s"$idx has no ivf_radii artifact (rebuild to enable --tier exact)")
      val r2 = spark.read.parquet(s"$idx/ivf_radii")
        .groupBy(col("cell")).agg(max(col("r2")).as("r2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dc = cents.toSeq
        .map { case (j, c) => j -> math.sqrt(l2(pv, 0, c).toDouble) }
      def score(cellIds: Seq[Long]): DataFrame = {
        val m0 = spark.read.parquet(s"$idx/assignments")
          .filter(col("cell").isin(cellIds: _*))
          .filter(col("id") =!= probeId)
        val m =
          if (exists(spark, s"$idx/tombstones"))
            m0.join(spark.read.parquet(s"$idx/tombstones").select(col("id")),
              Seq("id"), "left_anti")
          else m0
        spark.read.parquet(in).filter(size(col(vecCol)) === dims)
          .select(col(idCol).cast("long").as("id"),
            SemDedup.microsVec(col(vecCol)).as("mv"))
          .join(m.select(col("id")), Seq("id"), "left_semi")
          .select(col("id"), graft.ops.VectorExpressions.sqDist(
            col("mv"), typedLit(pv.toSeq)).as("d"))
      }
      val phase1 = dc.map { case (j, d) => (d, j) }.sorted
        .take(nprobe).map(_._2)
      val top1 = score(phase1).orderBy(col("d"), col("id")).limit(k)
        .collect()
      val dk =
        if (top1.length < k) Double.MaxValue
        else top1.last.getAs[Long]("d").toDouble
      val survivors = dc.collect {
        case (j, d) if !phase1.contains(j) && {
          val lb = math.max(0.0,
            d - math.sqrt(r2.getOrElse(j, Long.MaxValue).toDouble))
          lb * lb <= dk
        } => j
      }
      return score(phase1 ++ survivors)
        .orderBy(col("d"), col("id")).limit(k)
    }

    val membersAll = spark.read.parquet(s"$idx/assignments")
      .filter(col("cell").isin(probedCells: _*))
      .filter(col("id") =!= probeId)
    // retraction: tombstoned ids must not surface — the anti-join
    // runs on the CELL-RESTRICTED candidates, never the whole index
    val members0 =
      if (exists(spark, s"$idx/tombstones"))
        membersAll.join(
          spark.read.parquet(s"$idx/tombstones").select(col("id")),
          Seq("id"), "left_anti")
      else membersAll
    // pre-filter INSIDE the probed cells: cell restriction and the
    // stratum predicate reach the same scan
    val members = filterSql.fold(members0)(f => members0.filter(expr(f)))
    // code artifacts written by this round carry the cell key: the
    // probed-cell restriction becomes a pushed literal `cell IN` on
    // the code scan itself (row-group pruning), instead of a
    // corpus-linear semi join — SCALING.md round 12's "next lever",
    // taken. The id-level semi join below still applies the stratum
    // filter and the tombstone retraction; legacy cell-less
    // artifacts just skip the scan-level restriction.
    def cellRestrict(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      if (df.schema.fieldNames.contains("cell"))
        df.filter(col("cell").isin(probedCells: _*)).drop("cell")
      else df
    val codes = cellRestrict(spark.read.parquet(s"$idx/pq_codes"))
    val tier = flags.getOrElse("tier", "pq")
    require(tier == "pq" || tier == "sq8", s"unknown --tier $tier")
    val adcRanked =
      if (tier == "sq8") {
        // SQ8 tier: reconstruct each candidate from its code array via
        // the broadcast range tables (reference objects inside the
        // fused kernel) and score against the FULL-precision probe —
        // asymmetric distance, same contract as q259
        val hasSq8 = spark.read.json(s"$idx/summary")
          .filter(col("key") === "sq8")
          .collect().headOption.exists(_.getLong(1) == 1L)
        require(hasSq8, s"$idx was built without --sq8 true")
        val rows = spark.read.parquet(s"$idx/sq8_ranges").collect()
        val lo = new Array[Long](dims)
        val wd = new Array[Long](dims)
        rows.foreach { r =>
          val i = r.getAs[Long]("i").toInt
          lo(i) = r.getAs[Long]("lo")
          wd(i) = r.getAs[Long]("wd")
        }
        cellRestrict(spark.read.parquet(s"$idx/sq8_codes"))
          .join(members.select(col("id")), Seq("id"), "left_semi")
          .select(col("id"), graft.ops.VectorExpressions.sqDist(
            graft.ops.VectorExpressions.sq8UnpackDequant(col("codes"), lo, wd),
            typedLit(pv.toSeq)).as("adc"))
      } else if (!residual) {
        // global PQ: one (s, code) -> distance table for the probe
        val table = books.toSeq.map { case ((s, j), c) =>
          (s, j, l2(pv, s.toInt * sub, c))
        }.toDF("s", "code", "d")
        codes.join(members.select(col("id")), Seq("id"), "left_semi")
          .join(broadcast(table), Seq("s", "code"))
          .groupBy(col("id")).agg(sum(col("d")).as("adc"))
      } else {
        // residual PQ: the codes quantize (vector - cell centroid), so
        // the probe's table is keyed by CELL too — its residual against
        // each probed cell vs the codebook entries (nprobe x m x k rows)
        val table = probedCells.flatMap { pc =>
          val cc = cents(pc)
          val pr = Array.tabulate(dims)(i => pv(i) - cc(i))
          books.toSeq.map { case ((s, j), c) =>
            (pc, s, j, l2(pr, s.toInt * sub, c))
          }
        }.toDF("cell", "s", "code", "d")
        codes.join(members, Seq("id")) // attach the candidate's cell
          .join(broadcast(table), Seq("cell", "s", "code"))
          .groupBy(col("id")).agg(sum(col("d")).as("adc"))
      }
    rerankN match {
      case None =>
        adcRanked.orderBy(col("adc"), col("id")).limit(k)
      case Some(n) =>
        // q246's ladder through the artifacts: shortlist the n
        // ADC-best, rejoin ONLY those ids to the float source, exact
        // cosine re-rank to k
        val shortlist = adcRanked.orderBy(col("adc"), col("id")).limit(n)
        val pf = spark.read.parquet(in)
          .filter(col(idCol).cast("long") === probeId &&
            size(col(vecCol)) === dims)
          .select(col(vecCol)).head().getSeq[Float](0)
        spark.read.parquet(in)
          .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
          .join(broadcast(shortlist), Seq("id"))
          .select(col("id"), col("adc"),
            round(round(graft.ops.Similarity.cosine(col("v"),
              typedLit(pf)), 6) * lit(1000000d)).cast("long")
              .as("cos_x1e6"))
          .orderBy(col("cos_x1e6").desc, col("id"))
          .limit(k)
    }
  }
}
