package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TextOps

/** CLI: lexical (BM25) index BUILD / SEARCH split with persisted
  * artifacts — [[IndexCorpus]]'s counterpart for the lexical arm of a
  * hybrid retrieval stack. Build tokenizes the corpus ONCE into the
  * classic IR artifacts; search runs against the files alone, so the
  * serving path never touches the raw corpus:
  *
  *   - `postings`  (t, id, tf, dl) — the inverted index, term-keyed,
  *     with the document length DENORMALIZED into each row so the
  *     serve path scores from the searched lists alone;
  *   - `doclens`   (id, dl)       — per-document term counts (the
  *     authoritative source for stats rewrites);
  *   - `stats`     (key, value)   — n docs, total terms, avgdl, gram,
  *     term-bucket count.
  *
  * Storage goes through [[Artifacts]] (round 13): every artifact is a
  * set of manifest-listed SEGMENTS, postings segments PARTITIONED by
  * a term-hash bucket `tb = pmod(hash(t), buckets)`. Consequences the
  * round-12 `coalesce(1)` layout couldn't give:
  *
  *   - builds/compacts write with `repartition(tb)` — every core
  *     writes, nothing funnels through one task;
  *   - the serve path's literal `t IN (...)` predicate is joined by a
  *     literal `tb IN (...)` PARTITION filter (buckets derived from
  *     the same hash at query time), so untouched posting buckets are
  *     pruned at directory level before row-group stats are even
  *     consulted;
  *   - a command's writes (an ingest's postings+doclens+docids+stats)
  *     publish in ONE manifest flip — no half-applied ingest states
  *     (closing the round-12 advisory crash window where content
  *     could land without its manifest row), and compact never
  *     overwrites the files it reads, so a crash mid-compact leaves
  *     the old index serving byte-identically.
  *
  * Scoring is [[TextOps.bm25Scores]]'s exact-integer Okapi contract
  * (k1 = 1.2, b = 0.75 with cleared denominators; idf =
  * floor(log2(n/df)), idf-0 terms pruned — a search term in more
  * than half the corpus contributes nothing and generates no
  * candidates). The q267 driver row proves a search through the
  * artifacts equals the q260 oracle chain bit-for-bit.
  *
  * `update` ingests NEW documents into an existing index: their
  * postings and doc lengths APPEND as new segments (df needs no
  * maintenance — search derives it from the postings at query time)
  * and the scalar stats rewrite from the updated doclens. The lexical
  * update is EXACT: an updated index is state-identical to a fresh
  * build over the union — q268 proves it under the driver hash by
  * sharing q267's full-build oracle.
  *
  * Lifecycle: `delete` retracts documents by TOMBSTONE (O(deleted);
  * q271 proves post-delete search == a fresh build over the
  * survivors), `compact` folds the tombstones into the files and
  * merges append segments without forgetting the retraction set
  * (q272 proves answers unchanged). `compact --threshold <permille>`
  * is INCREMENTAL: only segments whose tombstone-hit density crosses
  * the threshold rewrite; cold segments' files are untouched (q285 +
  * LexIndexSpec prove answers unchanged and cold files unmodified),
  * so a retraction wave localized in recent appends costs the dirty
  * segments, not the index. The docids artifact is the EVER-INGESTED
  * manifest — it only grows, which is what makes retraction permanent
  * across update/compact.
  *
  * Usage:
  *   runMain graft.tools.LexIndex build <docs.parquet> <indexDir>
  *     [--id doc_id] [--text text] [--gram 2] [--buckets 16]
  *   runMain graft.tools.LexIndex update <indexDir> <newDocs.parquet>
  *     [--id doc_id] [--text text]
  *   runMain graft.tools.LexIndex delete <indexDir> <ids.parquet>
  *     [--id doc_id]
  *   runMain graft.tools.LexIndex compact <indexDir>
  *     [--threshold <permille>]
  *   runMain graft.tools.LexIndex search <indexDir> "<query text>"
  *     [--k 10] [--filter "<sqlExpr over id, t, tf, dl>"]
  *     [--at <manifestVersion>]
  *   runMain graft.tools.LexIndex searchBatch <indexDir>
  *     <queries.parquet> [--id query_id] [--text text] [--k 10]
  *     [--filter "<sqlExpr>"] [--max-inline-terms 4096]
  *     [--max-broadcast-probes 262144] [--at <manifestVersion>]
  *   runMain graft.tools.LexIndex history <indexDir>
  *   runMain graft.tools.LexIndex export <srcIndexDir> <dstIndexDir>
  *     [--at <manifestVersion>]
  *   runMain graft.tools.LexIndex fsck <indexDir>
  *   runMain graft.tools.LexIndex contention <indexDir>
  *
  * Every mutating command accepts `--keep-manifests N` (sets
  * `spark.graft.keepManifests` for the session): the vacuum retention
  * window external concurrent readers pin against ([[Artifacts]]),
  * and `--vacuum-grace-ms MS` (the age below which vacuum presumes a
  * never-referenced segment belongs to a live CONCURRENT writer —
  * see the multi-writer contract in [[Artifacts]]'s object doc).
  * `search`/`searchBatch --at V` is the TIME-TRAVEL read over that
  * window: every artifact (postings, stats, tombstones, ...) resolves
  * against retained manifest V, so the answer is the one the index
  * served at that version — updates and deletes that came after are
  * invisible, exactly (q300's full-corpus oracle through a
  * post-delete index is the driver-checked proof).
  */
object LexIndex {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-lexindex")
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
        case Some("searchBatch") =>
          searchBatch(spark, args.drop(1)).show(100, truncate = false)
        case Some("history") =>
          history(spark, args.drop(1)).show(100, truncate = false)
        case Some("export") => export(spark, args.drop(1))
        case Some("fsck") =>
          fsck(spark, args.drop(1)).show(100, truncate = false)
        case Some("contention") =>
          contention(spark, args.drop(1)).show(100, truncate = false)
        case _ =>
          sys.error("usage: LexIndex build|update|delete|compact|" +
            "search|searchBatch|history|export|fsck|contention ...")
      }
    } finally spark.stop()
  }

  private def flagsOf(args: Array[String], from: Int): Map[String, String] =
    args.drop(from).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  /** Working-state read: current manifest overridden by this
    * command's PENDING (written, not yet committed) segments — stats
    * rewrites must see the post-command state before the flip.
    */
  private def rd(spark: SparkSession, idx: String, name: String,
      pending: Map[String, Seq[String]]): DataFrame =
    pending.get(name) match {
      case Some(segs) => Artifacts.readSegs(spark, idx, name, segs)
      case None       => Artifacts.read(spark, idx, name)
    }

  private def has(spark: SparkSession, idx: String, name: String,
      pending: Map[String, Seq[String]]): Boolean =
    pending.get(name).exists(_.nonEmpty) || Artifacts.exists(spark, idx, name)

  /** The term-hash bucket expression — MUST match between build and
    * search (search derives each query term's bucket with the same
    * Spark murmur3 `hash`, then inlines the buckets as a literal
    * partition predicate). The count is a BUILD-TIME knob recorded in
    * stats and honored by every later command, so deployments size it
    * to the corpus (the 16 default fits the test scales; at 100 TB
    * you want enough buckets that one bucket's posting lists are a
    * few files — search cost is per-bucket-touched, and a query
    * touches at most |terms| buckets at any count).
    */
  private def termBucket(buckets: Long) =
    Artifacts.Bucket("tb", pmod(hash(col("t")), lit(buckets)), Seq("t"))

  /** The driver-side evaluation of the SAME bucket expression: seed 42
    * is the `hash()` SQL function's seed [[termBucket]] partitions
    * with. LexIndexSpec pins this against a Spark-computed
    * `pmod(hash(t), buckets)` over a sample vocabulary, so a future
    * change to the build's bucketing expression cannot silently
    * diverge from the serve path's driver math (round-18 VERDICT
    * item 8 — the coupling now fails a test instead of mis-routing).
    */
  private[tools] def termBucketOf(t: String, buckets: Long): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType)), 42).eval(null)
      .asInstanceOf[Int]
    java.lang.Math.floorMod(h.toLong, buckets)
  }

  /** Build the postings/doclens/stats artifacts; returns
    * (artifact, rows) per write.
    */
  def build(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: build <docs.parquet> <indexDir> [flags]")
    val (in, out) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    val gram = flags.getOrElse("gram", "2").toInt
    val buckets = flags.getOrElse("buckets", "16").toLong
    GraftSession.tune(spark)
    import spark.implicits._

    val docs = spark.read.parquet(in)
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextOps.ngrams(col(textCol), gram)).as("t"))
    val postings0 = graft.Scratch.cache(
      toks.groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    var pend = Map.empty[String, Seq[String]]
    val written = Seq.newBuilder[(String, Long)]
    // counted writes (round 17): every row count — and the two stats
    // scalars — is captured DURING the segment write it describes
    // (Dataset.observe), replacing one read-back count job per
    // artifact plus a docs.count() pass and a doclens re-aggregate
    // (4 extra jobs per build; at scale, second scans of output the
    // write pass had just materialized)
    def write(name: String, df: DataFrame,
        bucket: Option[Artifacts.Bucket] = None,
        extra: Seq[org.apache.spark.sql.Column] = Nil): (Long, Seq[Any]) = {
      val (seg, rows, xs) =
        Artifacts.writeSegmentCounted(spark, out, name, df, bucket, extra)
      pend += name -> Seq(seg)
      written += (name -> rows)
      (rows, xs)
    }
    // the document length DENORMALIZES into every posting row (dl,
    // appended last — positional readers unaffected): search then
    // scores from the searched lists ALONE, with no corpus-sized
    // doclens join on the serve path (the impact-ordered-postings
    // layout; doclens stays authoritative for stats rewrites)
    val dlDf = postings0.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    write("postings", postings0.join(dlDf, Seq("id"))
      .select(col("t"), col("id"), col("tf"), col("dl")),
      Some(termBucket(buckets)))
    // toktot observes as sum(dl) on the doclens write; a ZERO-DOC
    // build (the legitimate bootstrap of the streaming ingest path —
    // q275 builds empty, then micro-batches populate via ingestFrame)
    // observes a null sum -> 0
    val toktot = write("doclens", dlDf, extra = Seq(sum(col("dl"))))._2 match {
      case Seq(l: java.lang.Long) => l.longValue()
      case Seq(null)              => 0L
      case other => sys.error(s"unexpected observed toktot: $other")
    }
    // the doc-id MANIFEST: every ingested id, including zero-token
    // documents (text shorter than the gram) that never reach
    // doclens — update's dedup anti-joins THIS, not doclens, so
    // re-ingesting an empty doc can't double-count n / avgdl's
    // denominator. Its observed count IS the document count (taken
    // straight from the write — round-18 ADVICE fix: the previous
    // shape called written.result() mid-stream and kept appending,
    // which Builder declares undefined).
    val n = write("docids", docs.select(col(idCol).cast("long").as("id")))._1
    write("stats", Seq(
      ("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", gram.toLong),
      ("buckets", buckets))
      .toDF("key", "value").coalesce(1))
    Artifacts.commit(spark, out, pend)
    refresh(spark, out)
    written.result()
  }

  /** Incremental ingest: append the new documents' postings and doc
    * lengths as new segments (ids already present OR ever retracted
    * are rejected — the docids manifest is EVER-INGESTED, so a
    * tombstoned id can never resurface; see [[delete]]), then rewrite
    * the scalar stats from the live state via [[statsFrame]] — the
    * shared path, so a delete-then-update sequence can't write a
    * toktot that still counts tombstoned documents. All four segments
    * publish in ONE manifest flip — an ingest is atomic; a crash
    * before the flip leaves the previous index state (no
    * indexed-but-unmanifested content, no duplicate re-ingest rows).
    * The tokenizer gram comes from the index's own stats. EXACT by
    * construction: see object doc.
    */
  def update(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: update <indexDir> <newDocs.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    Artifacts.applyRetentionFlag(spark, flags, idx)
    Seq("ingested" ->
      ingestFrame(spark, idx, spark.read.parquet(in), idCol, textCol))
  }

  /** The incremental-ingest core shared by the [[update]] CLI and the
    * STREAMING maintenance path (q275's foreachBatch calls this once
    * per micro-batch — each batch appends its postings/doclens and
    * rewrites the scalar stats, so the index is SEARCHABLE and exact
    * between batches, and the end-of-stream state is identical to one
    * batch build over everything that arrived). The per-batch stats
    * rewrite costs one doclens aggregate — metadata-sized next to the
    * corpus text the batch just tokenized.
    */
  def ingestFrame(spark: SparkSession, idx: String, docs: DataFrame,
      idCol: String, textCol: String): Long = {
    GraftSession.tune(spark)
    Artifacts.requireManifest(spark, idx)

    val stats0 = Artifacts.collectKV(spark, idx, "stats")
    val gram = stats0("gram").toInt
    val buckets = stats0.getOrElse("buckets", 16L)
    // localCheckpoint cuts lineage back to the artifacts this command
    // supersedes (same discipline as IndexCorpus.update). Dedup
    // against the docids MANIFEST, not doclens: a zero-token document
    // never appears in doclens, so a doclens anti-join would re-admit
    // it and double-count n.
    val known = Artifacts.read(spark, idx, "docids").select(col("id"))
    val fresh = graft.Scratch.localCheckpoint(
      docs
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .join(known, Seq("id"), "left_anti"))
    val newPostings = graft.Scratch.cache(fresh
      .select(col("id"), explode(TextOps.ngrams(col("text"), gram)).as("t"))
      .groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    val newDl = newPostings.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    // CONCURRENT-WRITER path: the three content segments are written
    // once (base-independent deltas), then the commit rebases onto
    // whatever manifest is current at publish time — a competing
    // ingest that wins the CAS race is merged under, not clobbered
    // (Artifacts.commitAppendsWithRetry). The stats frame is the one
    // state-DEPENDENT artifact, so it re-derives from the rebased
    // working map on every attempt. Rebasing is sound only while the
    // writers' batches are DISJOINT: this command deduped `fresh`
    // against the docids manifest it started from, so if a competitor
    // committed any of OUR ids meanwhile, merging would double-ingest
    // them — validateRebase detects that and aborts (re-running the
    // command re-dedups against the merged state).
    val segP = Artifacts.writeSegment(spark, idx, "postings",
      newPostings.join(newDl, Seq("id"))
        .select(col("t"), col("id"), col("tf"), col("dl")),
      Some(termBucket(buckets)))
    val segD = Artifacts.writeSegment(spark, idx, "doclens", newDl)
    // counted write (round 17): the ingested-row count rides the
    // docids write — the previous fresh.count() was a separate
    // materialization pass over the checkpointed batch
    val (segI, nNew, _) = Artifacts.writeSegmentCounted(spark, idx,
      "docids", fresh.select(col("id")))
    val deltas = Map("postings" -> Seq(segP), "doclens" -> Seq(segD),
      "docids" -> Seq(segI))
    Artifacts.commitAppendsWithRetry(spark, idx, deltas,
      finish = pend => pend + ("stats" ->
        Seq(Artifacts.writeSegment(spark, idx, "stats",
          statsFrame(spark, idx, pend)))),
      validateRebase = () => {
        val mine = Artifacts.readSegs(spark, idx, "docids", Seq(segI))
        val clash = Artifacts.read(spark, idx, "docids")
          .join(mine, Seq("id"), "left_semi").count()
        if (clash > 0) throw Artifacts.CommitConflictException(idx,
          Artifacts.currentVersion(spark, idx) + 1,
          s"$clash doc ids were concurrently ingested by another " +
            "writer; re-run this ingest to re-dedup against the merged state")
      })
    Artifacts.vacuum(spark, idx)
    refresh(spark, idx)
    nNew
  }

  /** Per-version collection statistics over the RETAINED manifest
    * chain: (version, n, toktot, avgdl) — each version's scalar stats
    * artifact read through `Artifacts.withPinned`, so the row is
    * exactly what a `search --at version` serves from. The lifecycle
    * audit surface: q304's oracle re-derives every version's row in
    * closed form from the corpus and the command sequence.
    */
  def history(spark: SparkSession, args: Array[String])
      : org.apache.spark.sql.DataFrame = {
    require(args.length >= 1, "usage: history <indexDir>")
    val idx = args(0)
    GraftSession.tune(spark)
    Artifacts.requireManifest(spark, idx)
    import spark.implicits._
    // the layer-level version chain (bounded by the retention window)
    // drives which snapshots get a stats row — with the round-18
    // driver-side contention rollup below, `history` now runs ZERO
    // Spark jobs: every row is manifest + stats-footer metadata
    val chain = Artifacts.manifestVersions(spark, idx)
    // starvation-risk columns (round 17): contention events that
    // landed at each version + the worst lost-attempt count — in the
    // audit an operator actually runs, not only under `contention`
    val cont = Artifacts.contentionByVersion(spark, idx)
    chain.map { v =>
      val s0 = Artifacts.withPinned(spark, idx, v) {
        Artifacts.collectKV(spark, idx, "stats")
      }
      val (ev, worst) = cont.getOrElse(v, (0L, 0L))
      (v, s0("n"), s0("toktot"), s0("avgdl"), ev, worst)
    }.toDF("version", "n", "toktot", "avgdl",
      "contention_events", "max_lost_attempts")
  }

  /** Index INTEGRITY audit (`fsck <indexDir>`): one row per invariant
    * the serving contract rests on, as (invariant, observed, expected) —
    * a healthy index reads observed == expected on every row.
    *
    *   - segments_missing: manifest-listed segment dirs absent on
    *     disk (the unrecoverable failure — a mis-sized vacuum grace
    *     or external deletion).
    *   - stats_n / stats_toktot: the scalar stats artifact vs a fresh
    *     recount of the live state (docids minus tombstones; doclens
    *     restricted to live ids) — BM25's collection statistics must
    *     equal what a from-scratch rebuild would compute (the q268/
    *     q271 equivalence, auditable without a rebuild).
    *   - postings_dl_mismatch: posting rows whose denormalized dl
    *     disagrees with the doclens artifact for that id.
    *   - postings_tf_sum_mismatch: ids whose postings tf-sum != dl
    *     (the tokenizer identity: document length IS the sum of its
    *     term frequencies).
    *
    * The content checks run over ALL rows including tombstoned ones
    * (postings and doclens carry dead rows symmetrically until a
    * compact folds them out). q307 drives a full lifecycle and hashes
    * every row against the closed-form corpus recount.
    */
  /** Commit-contention telemetry, lexical arm — see
    * [[IndexCorpus.contention]] for the operational contract (the two
    * CLIs share [[Artifacts.contentionReport]]).
    */
  def contention(spark: SparkSession, args: Array[String])
      : org.apache.spark.sql.DataFrame = {
    require(args.length >= 1, "usage: contention <indexDir>")
    GraftSession.tune(spark)
    Artifacts.requireManifest(spark, args(0))
    Artifacts.contentionReport(spark, args(0))
  }

  def fsck(spark: SparkSession, args: Array[String])
      : org.apache.spark.sql.DataFrame = {
    require(args.length >= 1, "usage: fsck <indexDir>")
    val idx = args(0)
    GraftSession.tune(spark)
    Artifacts.requireManifest(spark, idx)
    import spark.implicits._
    val (_, missing) = Artifacts.segmentCheck(spark, idx)
    // value checks read the content artifacts — uncomputable when the
    // manifest references lost files, so they report (-1, 0) then and
    // the segments_missing row carries the diagnosis
    val valueRows: Seq[(String, Long, Long)] =
      try {
        val stats0 = Artifacts.collectKV(spark, idx, "stats")
        val live = graft.Scratch.cache(liveIds(spark, idx, Map.empty))
        val postings = graft.Scratch.cache(
          Artifacts.read(spark, idx, "postings")
            .select(col("id"), col("tf"), col("dl")))
        val doclens = Artifacts.read(spark, idx, "doclens")
          .select(col("id"), col("dl").as("dl_doc"))
        // ALL FOUR audit scalars in ONE job (round 18): each invariant
        // contributes a tagged branch to a single union-aggregate —
        // the previous shape scheduled four separate count/sum jobs
        // per fsck (live count, toktot sum, dl mismatch, tf-sum
        // mismatch), each paying the job floor on the shared caches
        val audit = live
          .select(lit("n").as("inv"), lit(1L).as("v"))
          .unionByName(Artifacts.read(spark, idx, "doclens")
            .join(broadcast(live), Seq("id"), "left_semi")
            .select(lit("tok").as("inv"), col("dl").as("v")))
          .unionByName(postings.select(col("id"), col("dl")).distinct()
            .join(doclens, Seq("id"), "left_outer")
            .filter(col("dl_doc").isNull || col("dl") =!= col("dl_doc"))
            .select(lit("dlm").as("inv"), lit(1L).as("v")))
          .unionByName(postings
            .groupBy(col("id"), col("dl"))
            .agg(sum(col("tf")).as("tfsum"))
            .filter(col("tfsum") =!= col("dl"))
            .select(lit("tfs").as("inv"), lit(1L).as("v")))
          .groupBy(col("inv")).agg(sum(col("v")).as("s"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        Seq(
          ("postings_dl_mismatch", audit.getOrElse("dlm", 0L), 0L),
          ("postings_tf_sum_mismatch", audit.getOrElse("tfs", 0L), 0L),
          ("stats_n", stats0("n"), audit.getOrElse("n", 0L)),
          ("stats_toktot", stats0("toktot"), audit.getOrElse("tok", 0L)))
      } catch {
        case _: Throwable if missing > 0 =>
          Seq("postings_dl_mismatch", "postings_tf_sum_mismatch",
            "stats_n", "stats_toktot").map((_, -1L, 0L))
      }
    // strands read the telemetry files alone — computable even when
    // content artifacts are lost, so they sit outside the try
    val strands = Artifacts.contentionStrands(spark, idx)
    (("segments_missing", missing, 0L) +:
      ("contention_strands", strands, 0L) +: valueRows)
      .toDF("invariant", "observed", "expected")
      .orderBy(col("invariant"))
  }

  /** Materialize a (possibly historical) snapshot as a brand-new
    * standalone index: `export <src> <dst> [--at V]` — see
    * [[Artifacts.exportSnapshot]]. The export then serves exactly as
    * the source did at V (q305 proves a pre-delete export answers the
    * full-corpus oracle), with no retention-window coupling to src.
    */
  def export(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: export <srcIndexDir> <dstIndexDir> [--at V]")
    val flags = flagsOf(args, 2)
    GraftSession.tune(spark)
    val res = Artifacts.exportSnapshot(spark, args(0), args(1),
      flags.get("at").map(_.toLong))
    refresh(spark, args(1))
    res
  }

  /** Invalidate any cached plan that scans the index files. Every
    * mutating command calls this after its commit: a search may have
    * left a (query-scoped, not-yet-released) cached scan of the old
    * file set in the session's CacheManager, and a later same-shaped
    * plan would silently reuse it — reading superseded listings.
    */
  private def refresh(spark: SparkSession, idx: String): Unit =
    spark.catalog.refreshByPath(idx)

  /** Live doc ids = manifest minus tombstones, against the working
    * state (`pending` overrides).
    */
  private def liveIds(spark: SparkSession, idx: String,
      pending: Map[String, Seq[String]]): DataFrame = {
    val all = rd(spark, idx, "docids", pending).select(col("id"))
    if (has(spark, idx, "tombstones", pending))
      all.join(rd(spark, idx, "tombstones", pending).select(col("id")),
        Seq("id"), "left_anti")
    else all
  }

  /** Retract documents from the index. Deletion is a TOMBSTONE, not a
    * rewrite: the doc ids append to a `tombstones` artifact (O(deleted)
    * cost — at 100 TB a delete wave must not repay the build) and the
    * scalar stats rewrite from the surviving doclens, so n / avgdl are
    * immediately exact. [[search]] anti-joins the tombstones before
    * deriving df, which makes post-delete answers IDENTICAL to a fresh
    * build over the surviving corpus — the q271 driver row proves it
    * by hashing a post-delete search against the survivor-corpus
    * oracle chain. Physical space comes back at the next [[compact]].
    * Ids not present (or already deleted) are ignored; re-ingesting a
    * tombstoned id via [[update]] is rejected because the docids
    * manifest is EVER-INGESTED — neither delete nor compact ever
    * removes an id from it (deletes are permanent retractions —
    * redacted or opted-out documents must not resurface; LexIndexSpec
    * exercises the resurrection rule both before and after compact).
    */
  def delete(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: delete <indexDir> <ids.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "doc_id")
    GraftSession.tune(spark)
    Artifacts.applyRetentionFlag(spark, flags, idx)
    Artifacts.requireManifest(spark, idx)
    // structural command: the whole derivation (dedup, stats recount)
    // is against one snapshot — a commit landing in between makes it
    // stale, so the publish CAS-fails and the derivation re-runs from
    // the new state, bounded times (Artifacts.commitStructuralWithRetry)
    var nDel = 0L
    Artifacts.commitStructuralWithRetry(spark, idx) { _ =>
      val doomed = graft.Scratch.localCheckpoint(
        spark.read.parquet(in).select(col(idCol).cast("long").as("id"))
          .distinct()
          .join(liveIds(spark, idx, Map()), Seq("id"), "left_semi"))
      // counted write (round 17): the deleted-row count rides the
      // tombstone write instead of a separate pre-write count job
      val (segT, n, _) = Artifacts.writeSegmentCounted(
        spark, idx, "tombstones", doomed)
      nDel = n
      var pend: Map[String, Seq[String]] = Map("tombstones" ->
        (Artifacts.segmentsOf(spark, idx, "tombstones") :+ segT))
      pend = Artifacts.withReplaced(spark, idx, pend, "stats",
        statsFrame(spark, idx, pend))
      Artifacts.merged(spark, idx, pend)
    }
    Artifacts.vacuum(spark, idx)
    refresh(spark, idx)
    Seq("deleted" -> nDel)
  }

  /** Fold the tombstones into the content files: rewrite postings and
    * doclens without the deleted ids (an anti-join against the SMALL
    * tombstone set — O(rewritten) join state, never a broadcast of
    * the live ids), each rewritten segment replacing what it compacts
    * via one atomic manifest flip — compact never overwrites the
    * files it reads, so a crash at ANY point leaves the previous
    * index serving byte-identically (LexIndexSpec's crash test drives
    * the failpoint). What compact must NOT do is forget: the docids
    * manifest keeps every ever-ingested id and the tombstones
    * artifact survives (distinct) as the permanent retraction set —
    * otherwise a post-compact [[update]] would re-admit a retracted
    * id.
    *
    * Default (no flags) is a FULL compact: every content artifact
    * consolidates to one segment. `--threshold <permille>` compacts
    * INCREMENTALLY: a segment rewrites only when its tombstone-hit
    * density (dead rows / rows) reaches the threshold; cold segments
    * keep their files byte-identical (the spec asserts it), so a
    * delete wave localized in recent appends costs the dirty
    * segments, not a full-index rewrite. Answers are unchanged either
    * way (search already honored the tombstones) — q272/q285 pin that
    * against the same survivor-corpus oracle as q271.
    */
  def compact(spark: SparkSession, args: Array[String]): Seq[(String, Long)] =
    compactImpl(spark, args, crashBeforeCommit = false)

  /** `crashBeforeCommit` is the spec's failpoint: do all the segment
    * writes, then throw instead of flipping the manifest — proving a
    * mid-compact crash leaves the prior index state fully serving.
    */
  private[tools] def compactImpl(spark: SparkSession, args: Array[String],
      crashBeforeCommit: Boolean): Seq[(String, Long)] = {
    require(args.length >= 1, "usage: compact <indexDir> [flags]")
    val idx = args(0)
    val flags = flagsOf(args, 1)
    val thresholdPm = flags.get("threshold").map(_.toLong)
    GraftSession.tune(spark)
    Artifacts.applyRetentionFlag(spark, flags, idx)
    Artifacts.requireManifest(spark, idx)
    refresh(spark, idx)
    // structural command, DELTA-REBASE form (round 15): the
    // corpus-sized consolidation derives ONCE, reading exactly the
    // base manifest's segment lists; a commit landing mid-compact (a
    // concurrent ingest wave, a delete) CAS-fails the publish and the
    // retry merges the already-consolidated segments with the
    // competitor's appends-since-base instead of re-deriving — one
    // rewrite no matter how many append races are lost, with only the
    // metadata-sized stats frame re-derived per attempt
    // (Artifacts.commitRewriteWithDeltaRetry; a competing structural
    // rewrite still surfaces as a conflict). The ingest-vs-compact
    // race and the sustained-ingest storm tests drive this live.
    val baseMap = Artifacts.currentManifest(spark, idx)
      .map(_._2).getOrElse(Map.empty)
    var pend = Map.empty[String, Seq[String]]
    val written = Seq.newBuilder[(String, Long)]
    val hasTomb = baseMap.get("tombstones").exists(_.nonEmpty)
    val tomb =
      if (hasTomb) Some(graft.Scratch.cache(
        Artifacts.readSegs(spark, idx, "tombstones", baseMap("tombstones"))
          .select(col("id")).distinct()))
      else None
    val stats0 = Artifacts.collectKV(spark, idx, "stats")
    val buckets = stats0.getOrElse("buckets", 16L)

    // content artifacts: postings/doclens filter the tombstones,
    // docids merges UNFILTERED (the ever-ingested manifest must not
    // forget). Full mode rewrites each to ONE segment; threshold mode
    // rewrites only tombstone-dense segments and leaves cold ones
    // ([[Artifacts.compactSegments]] — docids never rewrites
    // incrementally: an unfiltered manifest merge buys nothing a
    // delete wave needs back).
    val plan: Seq[(String, Boolean, Option[Artifacts.Bucket])] =
      thresholdPm match {
      case None => Seq(
        ("postings", true, Some(termBucket(buckets))),
        ("doclens", true, None), ("docids", false, None))
      case Some(_) => Seq(
        ("postings", true, Some(termBucket(buckets))),
        ("doclens", true, None))
    }
    plan.foreach { case (name, filtered, bucket) =>
      Artifacts.compactSegments(spark, idx, name, tomb, thresholdPm,
        filtered, bucket, baseSegs = Some(baseMap.getOrElse(name, Seq.empty)))
        .foreach(segs => pend += name -> segs)
    }
    tomb.foreach { ts =>
      pend = Artifacts.withReplaced(spark, idx, pend, "tombstones", ts)
    }
    if (crashBeforeCommit)
      sys.error("injected crash: compact before manifest commit")
    Artifacts.commitRewriteWithDeltaRetry(spark, idx, baseMap, pend,
      finish = merged => merged + ("stats" ->
        Seq(Artifacts.writeSegment(spark, idx, "stats",
          statsFrame(spark, idx, merged)))))
    Artifacts.vacuum(spark, idx)
    refresh(spark, idx)
    // post-compact per-artifact sizes from parquet FOOTERS (round 18,
    // VERDICT item 3) — see IndexCorpus.compactImpl
    pend.keys.toSeq.sorted.foreach { name =>
      written += (name -> Artifacts.countRows(spark, idx, name))
    }
    written.result()
  }

  /** The scalar stats frame recomputed from the CURRENT live state
    * (pending overrides) — shared by build/update/delete/compact so n
    * and avgdl always reflect exactly the searchable documents.
    */
  private def statsFrame(spark: SparkSession, idx: String,
      pending: Map[String, Seq[String]]): DataFrame = {
    import spark.implicits._
    val stats0 = Artifacts.collectKV(spark, idx, "stats")
    val live = graft.Scratch.cache(liveIds(spark, idx, pending))
    // BOTH scalars in ONE job (round 18): n rides a unit-count branch
    // unioned under the toktot aggregate — the previous shape ran a
    // live.count() job and then a separate doclens-sum job on every
    // stats rewrite (every lex ingest/delete/compact attempt, and
    // once per streaming micro-batch on q275's maintenance path)
    val agg = live.select(lit(1L).as("cnt"), lit(0L).as("dl"))
      .unionByName(rd(spark, idx, "doclens", pending)
        .join(broadcast(live), Seq("id"), "left_semi")
        .select(lit(0L).as("cnt"), col("dl")))
      .agg(coalesce(sum(col("cnt")), lit(0L)),
        coalesce(sum(col("dl")), lit(0L))).head()
    val n = agg.getLong(0)
    val toktot = agg.getLong(1)
    Seq(("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", stats0("gram")),
      ("buckets", stats0.getOrElse("buckets", 16L)))
      .toDF("key", "value").coalesce(1)
  }

  /** Search the persisted index with a raw query string: tokenize it
    * with the index's own gram setting (distinct terms, query-side
    * tf ignored — the standard set-of-terms BM25 form this engine
    * pins everywhere), restrict the postings to the searched terms,
    * anti-join the tombstones (a retracted document must neither
    * appear in results nor inflate df — the q271 contract), derive
    * df, prune idf-0 terms, score the surviving candidate lists,
    * top-k by (score desc, id). The tombstone anti-join runs AFTER
    * the term restriction, so its left side is the searched posting
    * lists, never the whole index.
    *
    * The term restriction is a LITERAL `t IN (...)` data predicate
    * PLUS a literal `tb IN (...)` PARTITION predicate (the terms'
    * murmur3 buckets, derived by the same expression the build
    * partitioned with): PushedFilters prunes row groups by min/max +
    * dictionary, PartitionFilters prunes whole bucket DIRECTORIES —
    * the round-13 upgrade over row-group-only pruning. A broadcast
    * join (the round-11 form) planned a FULL postings scan per query;
    * the ServeProbe decades measure the difference (SCALING.md).
    */
  def search(spark: SparkSession, args: Array[String]): DataFrame = {
    require(args.length >= 2, "usage: search <indexDir> <query> [flags]")
    flagsOf(args, 2).get("at") match {
      case Some(v) => // time-travel: resolve every artifact at manifest v
        Artifacts.withPinned(spark, args(0), v.toLong)(searchImpl(spark, args))
      case None => searchImpl(spark, args)
    }
  }

  private def searchImpl(spark: SparkSession, args: Array[String]): DataFrame = {
    val (idx, query) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val k = flags.getOrElse("k", "10").toInt
    val filterSql = flags.get("filter")
    GraftSession.tune(spark)
    import spark.implicits._

    val stats = Artifacts.collectKV(spark, idx, "stats")
    val n = stats("n")
    val avgdl = stats("avgdl")
    val gram = stats("gram").toInt
    val buckets = stats.getOrElse("buckets", 16L)
    // tokenize the query string ON THE DRIVER with the same kernel
    // the index used (round 17: the previous shape ran a one-row
    // Spark job per search just to split a query string — pure
    // scheduling overhead on the serve path). The bucket derives from
    // the SAME catalyst Murmur3Hash expression the build partitioned
    // with, evaluated directly, so build/search bucketing can never
    // diverge.
    val terms = graft.ops.TextKernels.ngrams(query, gram, distinct = true)
      .map(_.toString).toSeq
    if (terms.isEmpty)
      // a query shorter than the gram has no terms, hence no candidates
      return spark.range(0).select(col("id"), col("id").as("score"))
    val tbs = terms.map(t => Long.box(termBucketOf(t, buckets))).distinct
    val postingsAll = Artifacts.read(spark, idx, "postings")
    val qPost0 = (
      if (postingsAll.schema.fieldNames.contains("tb"))
        postingsAll.filter(col("tb").isin(tbs: _*))
      else postingsAll)
      .filter(col("t").isin(terms: _*))
    val qPost = graft.Scratch.cache(
      if (Artifacts.exists(spark, idx, "tombstones"))
        qPost0.join(
          Artifacts.read(spark, idx, "tombstones").select(col("id")),
          Seq("id"), "left_anti")
      else qPost0)
    val dfq = broadcast(qPost
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .select(col("t"), col("idf")))
    // --filter restricts CANDIDATES only, after df derives: term
    // statistics stay corpus-level (the filter-query contract — a
    // stratum member's score is identical to the unfiltered search's,
    // and a member is never lost), applied to the searched lists,
    // never the whole index. The expression sees the posting columns
    // (id, t, tf, dl).
    val cand = filterSql.fold(qPost: DataFrame)(f => qPost.filter(expr(f)))
    // current indexes carry dl inside the posting rows — the score
    // derives from the searched lists alone; a legacy (pre-dl) index
    // pays the doclens join it was built with
    val scored =
      if (postingsAll.schema.fieldNames.contains("dl"))
        cand.join(dfq, Seq("t"))
      else cand.join(dfq, Seq("t"))
        .join(Artifacts.read(spark, idx, "doclens"), Seq("id"))
    scored
      .withColumn("term", expr(
        s"idf * 22000 * tf * $avgdl DIV " +
          s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
      .groupBy(col("id")).agg(sum(col("term")).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
  }

  /** BATCH serving: score EVERY query of a (query_id, text) frame in
    * ONE pass over the index — the production shape (round-13 brief
    * item 3: thousands of probes amortize one job's fixed cost; the
    * single-query path pays the ~second-scale job floor per probe).
    * Per-query semantics are IDENTICAL to [[search]]: same tokenizer,
    * same set-of-terms form, same tombstone handling, same integer
    * BM25, per-query top-k by (score desc, id) — q282's oracle is the
    * per-query replay of q267's chain.
    *
    * Plan shape: the UNION of all queries' terms restricts the
    * postings scan (literal `tb IN` partition filter always — the
    * bucket set is at most `buckets` values; plus the literal
    * `t IN` data filter while the term union stays inline-able), the
    * (query_id, t) pairs broadcast onto the restricted lists, df
    * derives ONCE per term (it is a per-term global), and the
    * per-query top-k is one WindowGroupLimit — no per-query jobs, no
    * driver loop.
    */
  def searchBatch(spark: SparkSession, args: Array[String]): DataFrame = {
    require(args.length >= 2,
      "usage: searchBatch <indexDir> <queries.parquet> [flags]")
    flagsOf(args, 2).get("at") match {
      case Some(v) =>
        Artifacts.withPinned(spark, args(0), v.toLong)(
          searchBatchImpl(spark, args, None))
      case None => searchBatchImpl(spark, args, None)
    }
  }

  /** [[searchBatch]] with the query frame passed DIRECTLY instead of
    * a parquet path — the streaming-serve entry point (a foreachBatch
    * handler scores each micro-batch's queries without a per-trigger
    * write+read round-trip). `args` omit the queries path:
    * <indexDir> [flags]. Semantics are byte-identical to the path
    * form (which now routes through this).
    */
  def searchBatchFrame(spark: SparkSession, args: Array[String],
      queries: DataFrame): DataFrame = {
    require(args.length >= 1,
      "usage: searchBatchFrame <indexDir> [flags] + frame")
    val full = args.take(1) ++ Array("__query_frame__") ++ args.drop(1)
    flagsOf(args, 1).get("at") match {
      case Some(v) =>
        Artifacts.withPinned(spark, args(0), v.toLong)(
          searchBatchImpl(spark, full, Some(queries)))
      case None => searchBatchImpl(spark, full, Some(queries))
    }
  }

  private def searchBatchImpl(spark: SparkSession,
      args: Array[String], queriesOpt: Option[DataFrame]): DataFrame = {
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "query_id")
    val textCol = flags.getOrElse("text", "text")
    val k = flags.getOrElse("k", "10").toInt
    // terms inline into the scan as literals while the union is small
    // (driver-bounded); past the cap only the bucket partition filter
    // restricts the scan and the terms meet it as a broadcast join
    val maxInline = flags.getOrElse("max-inline-terms", "4096").toInt
    // the probe frame broadcasts onto the restricted posting lists
    // while it fits executor memory; past the cap (measured in
    // (query, term) pairs — the broadcast's actual row count) the
    // same join runs as a SHUFFLE (merge-hinted, so AQE can't
    // re-broadcast a frame the caller declared too big) — millions
    // of probes serve without a driver-side OOM, at one extra
    // exchange of the probe pairs
    val maxBcast = flags.getOrElse("max-broadcast-probes", "262144").toLong
    GraftSession.tune(spark)

    val stats = Artifacts.collectKV(spark, idx, "stats")
    val n = stats("n")
    val avgdl = stats("avgdl")
    val gram = stats("gram").toInt
    val buckets = stats.getOrElse("buckets", 16L)

    val qTerms = graft.Scratch.cache(queriesOpt
      .getOrElse(spark.read.parquet(in))
      .select(col(idCol).cast("long").as("qid"), col(textCol).as("text"))
      .select(col("qid"),
        explode(array_distinct(TextOps.ngrams(col("text"), gram))).as("t")))
    // the distinct (t, tb) union: tb set is bounded by the bucket
    // count; the term list inlines only below the cap. Round 18
    // (VERDICT item 1): the per-term PAIR COUNT rides the same job —
    // sum(n) over the un-truncated term union is exactly the
    // qTerms.count() the broadcast-cap decision used to run as its
    // own job per search.
    val termRows = qTerms.groupBy(col("t"))
      .agg(count(lit(1)).as("n"))
      .select(col("t"), pmod(hash(col("t")), lit(buckets)).as("tb"),
        col("n"))
      .limit(maxInline + 1).collect()
    val inline = termRows.length <= maxInline
    val postingsAll = Artifacts.read(spark, idx, "postings")
    val bucketed = postingsAll.schema.fieldNames.contains("tb")
    // (query, term) pair total for the broadcast cap: exact from the
    // inline term rows; past the cap it rides the bucket-union job
    var nPairs = termRows.map(_.getLong(2)).sum
    val scanned0 =
      if (!bucketed) postingsAll
      else if (inline)
        postingsAll.filter(col("tb").isin(
          termRows.map(r => Long.box(r.getLong(1))).distinct.toSeq: _*))
      else {
        // one job yields the full bucket union AND the exact pair
        // count the truncated inline probe could not
        val r = qTerms.agg(
          collect_set(pmod(hash(col("t")), lit(buckets))).as("tbs"),
          count(lit(1)).as("np")).head()
        nPairs = r.getLong(1)
        postingsAll.filter(col("tb").isin(
          r.getSeq[Long](0).map(Long.box).toSeq: _*))
      }
    // legacy (un-bucketed) index past the inline cap: the truncated
    // term probe cannot give the exact pair total — fall back to the
    // explicit count rather than under-feed the broadcast cap
    if (!inline && !bucketed) nPairs = qTerms.count()
    val scanned =
      if (inline) scanned0.filter(col("t").isin(
        termRows.map(_.getString(0)).toSeq: _*))
      else scanned0.join(broadcast(qTerms.select(col("t")).distinct()),
        Seq("t"), "left_semi")
    val qPost = graft.Scratch.cache(
      if (Artifacts.exists(spark, idx, "tombstones"))
        scanned.join(
          Artifacts.read(spark, idx, "tombstones").select(col("id")),
          Seq("id"), "left_anti")
      else scanned)
    // df is a PER-TERM global — derived once from the restricted
    // lists, shared by every query that searched the term
    val dfq = qPost
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .select(col("t"), col("idf"))
    // legacy (pre-dl) indexes stay servable at batch scale too: the
    // same doclens-join fallback the single-query path keeps
    val qPostDl0 =
      if (postingsAll.schema.fieldNames.contains("dl")) qPost
      else qPost.join(Artifacts.read(spark, idx, "doclens"), Seq("id"))
    // --filter: candidates only, after df — the single-query contract
    val qPostDl = flags.get("filter")
      .fold(qPostDl0)(f => qPostDl0.filter(expr(f)))
    val probeSide =
      if (nPairs <= maxBcast) broadcast(qTerms)
      else qTerms.hint("merge")
    val scored = qPostDl.join(probeSide, Seq("t"))
      .join(broadcast(dfq), Seq("t"))
      .withColumn("term", expr(
        s"idf * 22000 * tf * $avgdl DIV " +
          s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
      .groupBy(col("qid"), col("id")).agg(sum(col("term")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("rnk"), col("id"), col("score"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
