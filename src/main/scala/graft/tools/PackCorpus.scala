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
        // The source-order key packs (src_idx, dense_rank(id)) into
        // one long. Ids are DENSELY RE-INDEXED first — rank-over-id
        // via the guarded distributed prefix sum (bucketed offsets,
        // never a single reducer) — so ANY distinct long ids work:
        // negative, snowflake, hash-range. The only preconditions
        // left are the ones packing semantics need regardless of
        // ordering: ids castable to long, non-null, and unique —
        // checked in one column-pruned aggregate.
        val idCheck = docs.select(col(idCol).cast("long").as("id"))
          .agg(count(lit(1)).as("n"), count(col("id")).as("nn"),
            count_distinct(col("id")).as("nd")).head()
        require(idCheck.getLong(0) == idCheck.getLong(1),
          s"--order source requires ids castable to non-null long " +
            s"(${idCheck.getLong(0) - idCheck.getLong(1)} null rows)")
        require(idCheck.getLong(0) == idCheck.getLong(2),
          s"--order source requires unique ids " +
            s"(${idCheck.getLong(0) - idCheck.getLong(2)} duplicates)")
        val nDocs = idCheck.getLong(0)
        val dense = Prefix.cumSum(tk0, "id", lit(1L), "_dense")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("_p")).orderBy(col("source"))
        val srcIdx = tk0.select(col("source")).distinct()
          .withColumn("_p", Prefix.markerZero(length(col("source"))))
          .withColumn("src_idx", row_number().over(w).cast("long"))
          .drop("_p")
        dense.join(broadcast(srcIdx), Seq("source"))
          .withColumn("ord",
            col("src_idx") * lit(nDocs + 1L) + col("_dense"))
          .drop("src_idx", "_dense")
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
