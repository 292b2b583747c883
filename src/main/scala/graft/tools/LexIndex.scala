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
  *   - `stats`     (key, value)   — n docs, total terms, avgdl, gram.
  *
  * Scoring is [[TextOps.bm25Scores]]'s exact-integer Okapi contract
  * (k1 = 1.2, b = 0.75 with cleared denominators; idf =
  * floor(log2(n/df)), idf-0 terms pruned — a search term in more
  * than half the corpus contributes nothing and generates no
  * candidates). The q267 driver row proves a search through the
  * artifacts equals the q260 oracle chain bit-for-bit.
  *
  * 100 TB posture: build is one tokenize + postings aggregate
  * (map-side combined; what shuffles is the (id, term) partial
  * domain); search touches ONLY the searched terms' posting lists
  * (term-keyed parquet predicate) plus the doc-length join — the
  * corpus text never loads at serve time.
  *
  * `update` ingests NEW documents into an existing index: their
  * postings and doc lengths APPEND (df needs no maintenance — search
  * derives it from the postings at query time, so appended lists
  * update every term's df automatically) and the scalar stats
  * rewrite from the updated doclens. Unlike the vector index's
  * frozen-codebook update (an approximation the q202 row prices),
  * the lexical update is EXACT: an updated index is state-identical
  * to a fresh build over the union — q268 proves it under the
  * driver hash by sharing q267's full-build oracle.
  *
  * Lifecycle: `delete` retracts documents by TOMBSTONE (O(deleted);
  * q271 proves post-delete search == a fresh build over the
  * survivors), `compact` folds the tombstones into the files and
  * merges append fragments without forgetting the retraction set
  * (q272 proves answers unchanged). The docids artifact is the
  * EVER-INGESTED manifest — it only grows, which is what makes
  * retraction permanent across update/compact.
  *
  * Usage:
  *   runMain graft.tools.LexIndex build <docs.parquet> <indexDir>
  *     [--id doc_id] [--text text] [--gram 2]
  *   runMain graft.tools.LexIndex update <indexDir> <newDocs.parquet>
  *     [--id doc_id] [--text text]
  *   runMain graft.tools.LexIndex delete <indexDir> <ids.parquet>
  *     [--id doc_id]
  *   runMain graft.tools.LexIndex compact <indexDir>
  *   runMain graft.tools.LexIndex search <indexDir> "<query text>"
  *     [--k 10]
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
        case _ =>
          sys.error("usage: LexIndex build|update|delete|compact|search ...")
      }
    } finally spark.stop()
  }

  private def flagsOf(args: Array[String], from: Int): Map[String, String] =
    args.drop(from).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

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
    GraftSession.tune(spark)
    import spark.implicits._

    val docs = spark.read.parquet(in)
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextOps.ngrams(col(textCol), gram)).as("t"))
    val postings0 = graft.Scratch.cache(
      toks.groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    val written = Seq.newBuilder[(String, Long)]
    def write(name: String, df: DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      written += (name -> spark.read.parquet(s"$out/$name").count())
    }
    // the document length DENORMALIZES into every posting row (dl,
    // appended last — positional readers unaffected): search then
    // scores from the searched lists ALONE, with no corpus-sized
    // doclens join on the serve path (the impact-ordered-postings
    // layout; doclens stays authoritative for stats rewrites)
    val dlDf = postings0.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    write("postings", postings0.join(dlDf, Seq("id"))
      .select(col("t"), col("id"), col("tf"), col("dl")))
    write("doclens", dlDf)
    // the doc-id MANIFEST: every ingested id, including zero-token
    // documents (text shorter than the gram) that never reach
    // doclens — update's dedup anti-joins THIS, not doclens, so
    // re-ingesting an empty doc can't double-count n / avgdl's
    // denominator
    write("docids", docs.select(col(idCol).cast("long").as("id")))
    val n = docs.count()
    // coalesce: a ZERO-DOC build is the legitimate bootstrap of the
    // streaming ingest path (q275 builds empty, then micro-batches
    // populate via ingestFrame)
    val toktot = spark.read.parquet(s"$out/doclens")
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    write("stats", Seq(
      ("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", gram.toLong))
      .toDF("key", "value"))
    written.result()
  }

  /** Incremental ingest: append the new documents' postings and doc
    * lengths (ids already present OR ever retracted are rejected —
    * the docids manifest is EVER-INGESTED, so a tombstoned id can
    * never resurface; see [[delete]]), then rewrite the scalar stats
    * from the live state via [[rewriteStats]] — the shared path, so a
    * delete-then-update sequence can't write a toktot that still
    * counts tombstoned documents. The tokenizer gram comes from the
    * index's own stats. EXACT by construction: see object doc.
    */
  def update(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: update <indexDir> <newDocs.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
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

    val stats0 = spark.read.parquet(s"$idx/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gram = stats0("gram").toInt
    // localCheckpoint cuts lineage back to the artifacts the appends
    // below write into (same discipline as IndexCorpus.update).
    // Dedup against the docids MANIFEST, not doclens: a zero-token
    // document never appears in doclens, so a doclens anti-join would
    // re-admit it and double-count n. Pre-manifest indexes (no
    // docids artifact) fall back to doclens plus the tombstones (a
    // legacy index that saw a delete must still reject the retracted
    // ids even though its doclens was compacted).
    val hasManifest = exists(spark, s"$idx/docids")
    val known =
      if (hasManifest) spark.read.parquet(s"$idx/docids").select(col("id"))
      else spark.read.parquet(s"$idx/doclens").select(col("id"))
    val existing =
      if (!hasManifest && exists(spark, s"$idx/tombstones"))
        known.unionByName(
          spark.read.parquet(s"$idx/tombstones").select(col("id")))
      else known
    val fresh = graft.Scratch.localCheckpoint(
      docs
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .join(existing, Seq("id"), "left_anti"))
    val nNew = fresh.count()
    val newPostings = graft.Scratch.cache(fresh
      .select(col("id"), explode(TextOps.ngrams(col("text"), gram)).as("t"))
      .groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    val newDl = newPostings.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    // match the index's own postings layout: current indexes carry
    // the denormalized dl; pre-dl legacy indexes keep their shape
    val hasDl = spark.read.parquet(s"$idx/postings")
      .schema.fieldNames.contains("dl")
    val appendPostings =
      if (hasDl) newPostings.join(newDl, Seq("id"))
        .select(col("t"), col("id"), col("tf"), col("dl"))
      else newPostings
    appendPostings.write.mode("append").parquet(s"$idx/postings")
    newDl.write.mode("append").parquet(s"$idx/doclens")
    // manifest append LAST: a failure mid-update must not leave ids
    // in the manifest with no indexed content (the anti-join would
    // then permanently block re-ingesting those documents)
    if (hasManifest)
      fresh.select(col("id")).write.mode("append").parquet(s"$idx/docids")
    refresh(spark, idx)
    rewriteStats(spark, idx)
    nNew
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Invalidate any cached plan that scans the index files. Every
    * mutating command calls this after its writes: a search may have
    * left a (query-scoped, not-yet-released) cached scan of the old
    * file set in the session's CacheManager, and a later same-shaped
    * plan would silently reuse it — reading appended-over listings or
    * compacted-away files.
    */
  private def refresh(spark: SparkSession, idx: String): Unit =
    spark.catalog.refreshByPath(idx)

  /** Live doc ids = manifest minus tombstones (manifest-less legacy
    * indexes fall back to doclens ids).
    */
  private def liveIds(spark: SparkSession, idx: String): DataFrame = {
    val all =
      if (exists(spark, s"$idx/docids"))
        spark.read.parquet(s"$idx/docids").select(col("id"))
      else spark.read.parquet(s"$idx/doclens").select(col("id"))
    if (exists(spark, s"$idx/tombstones"))
      all.join(spark.read.parquet(s"$idx/tombstones"), Seq("id"), "left_anti")
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
    import spark.implicits._

    val doomed = graft.Scratch.localCheckpoint(
      spark.read.parquet(in).select(col(idCol).cast("long").as("id"))
        .distinct()
        .join(liveIds(spark, idx), Seq("id"), "left_semi"))
    val nDel = doomed.count()
    doomed.write.mode("append").parquet(s"$idx/tombstones")
    refresh(spark, idx)
    rewriteStats(spark, idx)
    Seq("deleted" -> nDel)
  }

  /** Fold the tombstones into the content files: rewrite postings and
    * doclens without the deleted ids (an anti-join against the SMALL
    * tombstone set — O(index) rewrite but O(deleted) join state, never
    * a broadcast of the live ids), each re-coalesced (repeated
    * `update` appends accumulate one parquet fragment per ingest —
    * compaction merges them; docids merges too, UNFILTERED). What
    * compact must NOT do is forget: the docids manifest keeps every
    * ever-ingested id and the tombstones artifact survives (distinct,
    * coalesced) as the permanent retraction set — otherwise a
    * post-compact [[update]] would re-admit a retracted id. Answers
    * are unchanged by construction (search already honored the
    * tombstones) — q272 pins that by hashing a delete-then-compact
    * search against the same survivor-corpus oracle as q271; the
    * physical claims (dead rows gone, fragments merged, retraction
    * still enforced) are LexIndexSpec's compact tests.
    */
  def compact(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 1, "usage: compact <indexDir>")
    val idx = args(0)
    GraftSession.tune(spark)
    refresh(spark, idx)
    val hasTomb = exists(spark, s"$idx/tombstones")
    val written = Seq.newBuilder[(String, Long)]
    def rewrite(name: String, filtered: Boolean): Unit = {
      val path = s"$idx/$name"
      if (exists(spark, path)) {
        val src = spark.read.parquet(path)
        val out =
          if (filtered && hasTomb)
            src.join(spark.read.parquet(s"$idx/tombstones").select(col("id")),
              Seq("id"), "left_anti")
          else src
        // localCheckpoint is LAZY — the count() forces every
        // partition into block storage BEFORE the overwrite
        // truncates the very files the plan reads
        val snap = graft.Scratch.localCheckpoint(out)
        snap.count()
        snap.coalesce(1).write.mode("overwrite").parquet(path)
        refresh(spark, path)
        written += (name -> spark.read.parquet(path).count())
      }
    }
    rewrite("postings", filtered = true)
    rewrite("doclens", filtered = true)
    rewrite("docids", filtered = false)
    if (hasTomb) {
      val tomb = graft.Scratch.localCheckpoint(
        spark.read.parquet(s"$idx/tombstones").select(col("id")).distinct())
      tomb.count()
      tomb.coalesce(1).write.mode("overwrite").parquet(s"$idx/tombstones")
      refresh(spark, s"$idx/tombstones")
      written += ("tombstones" -> spark.read
        .parquet(s"$idx/tombstones").count())
    }
    rewriteStats(spark, idx)
    written.result()
  }

  /** Rewrite the scalar stats frame from the CURRENT live state —
    * shared by build/update/delete/compact so n and avgdl always
    * reflect exactly the searchable documents.
    */
  private def rewriteStats(spark: SparkSession, idx: String): Unit = {
    import spark.implicits._
    val gram = spark.read.parquet(s"$idx/stats")
      .filter(col("key") === "gram").head().getLong(1)
    val live = graft.Scratch.cache(liveIds(spark, idx))
    val n = live.count()
    val toktot = spark.read.parquet(s"$idx/doclens")
      .join(broadcast(live), Seq("id"), "left_semi")
      .agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    Seq(("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", gram))
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
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
    * The term restriction is a LITERAL `t IN (...)` predicate, not a
    * join: the query string is a driver value, so its terms collect
    * from one 1-row tokenize (the SAME kernel the index used) and
    * inline into the scan — PushedFilters reaches the postings
    * parquet, and row-group stats + dictionary pages prune everything
    * but the searched lists. A broadcast join (the old form) planned
    * a FULL postings scan per query; the ServeProbe x8-x128 decade
    * measures the difference (SCALING.md round 12).
    */
  def search(spark: SparkSession, args: Array[String]): DataFrame = {
    require(args.length >= 2, "usage: search <indexDir> <query> [flags]")
    val (idx, query) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val k = flags.getOrElse("k", "10").toInt
    GraftSession.tune(spark)
    import spark.implicits._

    val stats = spark.read.parquet(s"$idx/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = stats("n")
    val avgdl = stats("avgdl")
    val gram = stats("gram").toInt
    // tokenize the query string with the same kernel the index used;
    // a handful of terms collects to the driver so they can inline
    // into the scan predicate
    val terms = Seq(query).toDF("text")
      .select(explode(array_distinct(TextOps.ngrams(col("text"), gram)))
        .as("t"))
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty)
      // a query shorter than the gram has no terms, hence no candidates
      return spark.range(0).select(col("id"), col("id").as("score"))
    val postingsAll = spark.read.parquet(s"$idx/postings")
    val qPost0 = postingsAll.filter(col("t").isin(terms: _*))
    val qPost = graft.Scratch.cache(
      if (exists(spark, s"$idx/tombstones"))
        qPost0.join(
          spark.read.parquet(s"$idx/tombstones").select(col("id")),
          Seq("id"), "left_anti")
      else qPost0)
    val dfq = broadcast(qPost
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .select(col("t"), col("idf")))
    // current indexes carry dl inside the posting rows — the score
    // derives from the searched lists alone; a legacy (pre-dl) index
    // pays the doclens join it was built with
    val scored =
      if (postingsAll.schema.fieldNames.contains("dl"))
        qPost.join(dfq, Seq("t"))
      else qPost.join(dfq, Seq("t"))
        .join(spark.read.parquet(s"$idx/doclens"), Seq("id"))
    scored
      .withColumn("term", expr(
        s"idf * 22000 * tf * $avgdl DIV " +
          s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
      .groupBy(col("id")).agg(sum(col("term")).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
  }
}
