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
  *   - `postings`   (t, id, tf)   — the inverted index, term-keyed;
  *   - `doclens`    (id, dl)      — per-document term counts;
  *   - `stats`      (key, value)  — n docs, total terms, avgdl, gram.
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
  * Usage:
  *   runMain graft.tools.LexIndex build <docs.parquet> <indexDir>
  *     [--id doc_id] [--text text] [--gram 2]
  *   runMain graft.tools.LexIndex update <indexDir> <newDocs.parquet>
  *     [--id doc_id] [--text text]
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
    val postings = graft.Scratch.cache(
      toks.groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    val written = Seq.newBuilder[(String, Long)]
    def write(name: String, df: DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      written += (name -> spark.read.parquet(s"$out/$name").count())
    }
    write("postings", postings)
    write("doclens", postings.groupBy(col("id"))
      .agg(sum(col("tf")).as("dl")))
    // the doc-id MANIFEST: every ingested id, including zero-token
    // documents (text shorter than the gram) that never reach
    // doclens — update's dedup anti-joins THIS, not doclens, so
    // re-ingesting an empty doc can't double-count n / avgdl's
    // denominator
    write("docids", docs.select(col(idCol).cast("long").as("id")))
    val n = docs.count()
    val toktot = spark.read.parquet(s"$out/doclens")
      .agg(sum(col("dl"))).head().getLong(0)
    write("stats", Seq(
      ("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", gram.toLong))
      .toDF("key", "value"))
    written.result()
  }

  /** Incremental ingest: append the new documents' postings and doc
    * lengths (ids already present are rejected — callers dedup
    * upstream, the q78 incremental contract), rewrite the scalar
    * stats from the updated doclens. The tokenizer gram comes from
    * the index's own stats. EXACT by construction: see object doc.
    */
  def update(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: update <indexDir> <newDocs.parquet> [flags]")
    val (idx, in) = (args(0), args(1))
    val flags = flagsOf(args, 2)
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    GraftSession.tune(spark)
    import spark.implicits._

    val stats0 = spark.read.parquet(s"$idx/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gram = stats0("gram").toInt
    // localCheckpoint cuts lineage back to the artifacts the appends
    // below write into (same discipline as IndexCorpus.update).
    // Dedup against the docids MANIFEST, not doclens: a zero-token
    // document never appears in doclens, so a doclens anti-join would
    // re-admit it and double-count n. Pre-manifest indexes (no
    // docids artifact) fall back to doclens with the old caveat.
    val fs = new org.apache.hadoop.fs.Path(s"$idx/docids")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasManifest = fs.exists(new org.apache.hadoop.fs.Path(s"$idx/docids"))
    val existing =
      if (hasManifest) spark.read.parquet(s"$idx/docids").select(col("id"))
      else spark.read.parquet(s"$idx/doclens").select(col("id"))
    val fresh = graft.Scratch.localCheckpoint(
      spark.read.parquet(in)
        .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
        .join(existing, Seq("id"), "left_anti"))
    val nNew = fresh.count()
    if (hasManifest)
      fresh.select(col("id")).write.mode("append").parquet(s"$idx/docids")
    val newPostings = graft.Scratch.cache(fresh
      .select(col("id"), explode(TextOps.ngrams(col("text"), gram)).as("t"))
      .groupBy(col("t"), col("id")).agg(count(lit(1)).as("tf")))
    newPostings.write.mode("append").parquet(s"$idx/postings")
    newPostings.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
      .write.mode("append").parquet(s"$idx/doclens")
    val n = stats0("n") + nNew
    val toktot = spark.read.parquet(s"$idx/doclens")
      .agg(sum(col("dl"))).head().getLong(0)
    Seq(("n", n), ("toktot", toktot),
      ("avgdl", if (n > 0) toktot / n else 0L), ("gram", gram.toLong))
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
    Seq("ingested" -> nNew)
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

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
    * under the full-chain oracle. Physical space comes back at the
    * next [[compact]]. Ids not present (or already deleted) are
    * ignored; re-ingesting a tombstoned id via [[update]] is rejected
    * by the docids manifest (deletes are permanent retractions —
    * redacted or opted-out documents must not resurface).
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
    rewriteStats(spark, idx)
    Seq("deleted" -> nDel)
  }

  /** Fold the tombstones into the files: rewrite postings / doclens /
    * docids without the deleted ids, each re-coalesced (repeated
    * `update` appends accumulate one parquet fragment per ingest —
    * compaction merges them), then drop the tombstone set. Answers are
    * unchanged by construction (search already honored the tombstones)
    * — q272 pins that under the driver hash; what changes is physical:
    * fragment count and dead rows, which LexIndexSpec asserts.
    */
  def compact(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 1, "usage: compact <indexDir>")
    val idx = args(0)
    GraftSession.tune(spark)
    val live = liveIds(spark, idx)
    val written = Seq.newBuilder[(String, Long)]
    Seq("postings", "doclens", "docids").foreach { name =>
      val path = s"$idx/$name"
      if (exists(spark, path)) {
        // localCheckpoint materializes the survivors BEFORE the
        // overwrite truncates the very files the plan reads
        val survivors = graft.Scratch.localCheckpoint(
          spark.read.parquet(path)
            .join(broadcast(live.select(col("id"))), Seq("id"), "left_semi"))
        survivors.coalesce(1).write.mode("overwrite").parquet(path)
        written += (name -> spark.read.parquet(path).count())
      }
    }
    val tomb = new org.apache.hadoop.fs.Path(s"$idx/tombstones")
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tomb)) fs.delete(tomb, true)
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
    * pins everywhere), look each term's df up in the postings,
    * prune idf-0 terms, score ONLY the surviving terms' posting
    * lists, top-k by (score desc, id).
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
    // tokenize the query string with the same kernel the index used
    val qTerms = Seq(query).toDF("text")
      .select(explode(array_distinct(TextOps.ngrams(col("text"), gram)))
        .as("t"))
    val postings = spark.read.parquet(s"$idx/postings")
    val dfq = broadcast(postings
      .join(broadcast(qTerms), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .select(col("t"), col("idf")))
    postings.join(dfq, Seq("t"))
      .join(spark.read.parquet(s"$idx/doclens"), Seq("id"))
      .withColumn("term", expr(
        s"idf * 22000 * tf * $avgdl DIV " +
          s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
      .groupBy(col("id")).agg(sum(col("term")).as("score"))
      .orderBy(col("score").desc, col("id")).limit(k)
  }
}
