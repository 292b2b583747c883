package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{Prefix, TextOps}

/** CLI: concat-and-chunk sequence packing as artifacts — parquet
  * corpus in, the pack tables an LM data loader consumes out:
  *
  *   - `manifest/`   one row per (doc, sequence) incidence:
  *                   (doc_id, seq_id, start_slot, n_slots) — where in
  *                   the fixed-length training sequence each doc's
  *                   token span lands (docs crossing a boundary emit
  *                   one row per touched sequence)
  *   - `seq_stats/`  per-sequence rollup (docs, first/last doc,
  *                   filled slots) — q221's shape, unlimited
  *   - `source_stats/` per-source packing economics: boundary-split
  *                   docs under this order (q204) and the pad-to-
  *                   seqlen waste the packing avoids (q215)
  *   - `summary/`    one-json totals (docs, tokens, sequences,
  *                   boundary docs, tail tokens)
  *
  * `--order source` concatenates in (source, id) order instead of id
  * order — q211's free packing lever. The cumulative token position
  * comes from the guarded distributed prefix sum (ops/Prefix.scala):
  * no single-reducer window at corpus scale, and the only driver-side
  * state is the nBuckets-row offset table.
  *
  * Usage:
  *   sbt "runMain graft.tools.PackCorpus <in.parquet> <outDir>
  *     [--id doc_id] [--text text] [--source source]
  *     [--seq-len 512] [--order id|source]"
  */
object PackCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-pack")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic body. Returns (artifact, row count) pairs. */
  def run(spark: SparkSession, args: Array[String]): Seq[(String, Long)] = {
    require(args.length >= 2, "usage: PackCorpus <in.parquet> <outDir> [flags]")
    val in = args(0)
    val out = args(1)
    val flags = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    val srcCol = flags.getOrElse("source", "source")
    val seqLen = flags.getOrElse("seq-len", "512").toLong
    require(seqLen > 0, s"seq-len must be positive, got $seqLen")
    val order = flags.getOrElse("order", "id")
    GraftSession.tune(spark)

    val docs = spark.read.parquet(in)
    val tk0 = docs.select(col(idCol).cast("long").as("id"),
      (if (docs.columns.contains(srcCol)) col(srcCol)
       else lit("all")).as("source"),
      TextOps.tokenCount(col(textCol)).cast("long").as("toks"))
    // concat order: raw id, or source-grouped via the catalog-sized
    // source index (q211's synthetic single-numeric order key)
    val tk = graft.Scratch.cache(order match {
      case "id" => tk0.withColumn("ord", col("id"))
      case "source" =>
        // The source-order key packs (src_idx, id) into one long, so
        // it is only collision-free for non-null ids in [0, 1e12).
        // Snowflake/hash-range/negative/non-numeric ids (the cast
        // yields null) would silently collide or interleave across
        // source blocks, violating cumSum's distinct-order contract
        // and corrupting the manifest — fail loudly instead. Cheap:
        // a column-pruned scan of the id column only.
        val badIds = docs
          .select(col(idCol).cast("long").as("id"))
          .filter(col("id").isNull || col("id") < 0L ||
            col("id") >= 1000000000000L)
          .count()
        require(badIds == 0L, s"--order source requires ids castable " +
          s"to long in [0, 1e12) (got $badIds violating rows); " +
          "re-index doc ids densely or use --order id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_p")).orderBy(col("source"))
        val srcIdx = tk0.select(col("source")).distinct()
          .withColumn("_p", Prefix.markerZero(length(col("source"))))
          .withColumn("src_idx", row_number().over(w).cast("long"))
          .drop("_p")
        tk0.join(broadcast(srcIdx), Seq("source"))
          .withColumn("ord", expr("src_idx * 1000000000000 + id"))
          .drop("src_idx")
      case o => throw new IllegalArgumentException(
        s"--order must be id or source, got $o")
    })

    val cum = graft.Scratch.cache(
      Prefix.cumSum(tk, "ord", col("toks"), "cum"))

    val written = Seq.newBuilder[(String, Long)]
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name")
      written += (name -> spark.read.parquet(s"$out/$name").count())
    }

    // manifest: one row per (doc, touched sequence); start_slot is
    // the doc span's offset inside that sequence, n_slots its share
    val spans = graft.Scratch.cache(cum.filter(col("toks") > 0)
      .select(col("id"), col("source"), col("toks"), col("cum"),
        explode(sequence(expr(s"(cum - toks) DIV $seqLen"),
          expr(s"(cum - 1) DIV $seqLen"))).as("seq_id"))
      .withColumn("start_slot", expr(
        s"greatest(cum - toks, seq_id * $seqLen) - seq_id * $seqLen"))
      .withColumn("n_slots", expr(
        s"least(cum, (seq_id + 1) * $seqLen)" +
          s" - greatest(cum - toks, seq_id * $seqLen)")))
    write("manifest", spans
      .select(col("id").as(idCol), col("seq_id"),
        col("start_slot"), col("n_slots"))
      .repartition(col("seq_id"))
      .sortWithinPartitions(col("seq_id"), col("start_slot")))

    write("seq_stats", spans.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("first_doc"),
        max(col("id")).as("last_doc"),
        sum(col("n_slots")).as("n_tokens"))
      .orderBy(col("seq_id")))

    val boundary = expr(s"CASE WHEN toks > 0 AND" +
      s" (cum - 1) DIV $seqLen > (cum - toks) DIV $seqLen" +
      " THEN 1 ELSE 0 END")
    write("source_stats", cum.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(boundary).as("n_boundary_docs"),
        sum(expr(s"((toks + ${seqLen - 1}) DIV $seqLen) * $seqLen"))
          .as("padded_tokens"))
      .withColumn("pack_saved_tokens",
        expr("padded_tokens - n_tokens"))
      .orderBy(col("source")))

    val tot = cum.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("toks")), lit(0L)).as("n_tokens"),
      coalesce(sum(boundary), lit(0L)).as("n_boundary_docs")).head()
    val nTok = tot.getLong(1)
    val nSeqs = (nTok + seqLen - 1) / seqLen
    val tail = if (nTok == 0L) 0L else nTok - (nSeqs - 1) * seqLen
    import spark.implicits._
    Seq((tot.getLong(0), nTok, nSeqs, tot.getLong(2), tail, seqLen, order))
      .toDF("n_docs", "n_tokens", "n_seqs", "n_boundary_docs",
        "tail_tokens", "seq_len", "order")
      .coalesce(1).write.mode("overwrite").json(s"$out/summary")

    val res = written.result()
    res.foreach { case (n, c) =>
      System.err.println(f"[graft-pack] $n%-13s $c%8d rows") }
    res
  }
}
