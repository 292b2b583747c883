package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Dedup

/** CLI: corpus-scale dedup end-to-end — parquet in, cluster labels
  * out. The training-pipeline counterpart of AnalyzeSlowQueries: a
  * user points it at a document table and gets every row labeled with
  * its near-dup cluster and a canonical flag, ready for a
  * keep-canonical filter.
  *
  * Usage:
  *   sbt "runMain graft.tools.DedupCorpus <in.parquet> <outDir>
  *     [--id doc_id] [--text text]
  *     [--method minhash|simhash|exact]
  *     [--maxdist 8]            (simhash)
  *     [--shingle 3] [--bands 4] [--rows 4] [--num 1] [--den 2]  (minhash)
  *
  * minhash: MinHash+LSH pairs -> connected components (Jaccard-
  *   verified near-dups; the default).
  * simhash: 120-bit SimHash pigeonhole pairs -> connected components
  *   (hamming <= maxdist).
  * exact: whitespace-normalized content fingerprint equality.
  */
object DedupCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-dedup")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** Session-agnostic body (tests pass their own session). Returns
    * (total, canonical).
    */
  def run(spark: SparkSession, args: Array[String]): (Long, Long) = {
    require(args.length >= 2, "usage: DedupCorpus <in.parquet> <outDir> [flags]")
    val in = args(0)
    val out = args(1)
    val flags = args.drop(2).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val idCol = flags.getOrElse("id", "doc_id")
    val textCol = flags.getOrElse("text", "text")
    val method = flags.getOrElse("method", "minhash")
    GraftSession.tune(spark)

    val docs = spark.read.parquet(in)
    val labeled = method match {
      case "minhash" =>
        Dedup.dedupClusters(docs, idCol, textCol,
          n = flags.getOrElse("shingle", "3").toInt,
          bands = flags.getOrElse("bands", "4").toInt,
          rows = flags.getOrElse("rows", "4").toInt,
          num = flags.getOrElse("num", "1").toInt,
          den = flags.getOrElse("den", "2").toInt)
      case "simhash" =>
        val pairs = Dedup.simhashPairs120(docs, idCol, textCol,
          maxDist = flags.getOrElse("maxdist", "8").toInt)
          .select(col("id_a"), col("id_b"))
        val comps = Dedup.connectedComponents(pairs)
        docs.select(col(idCol))
          .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
          .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster"))
          .withColumn("is_canonical", col(idCol) === col("cluster"))
      case "exact" =>
        Dedup.exactDedup(
          docs.select(col(idCol), col(textCol)),
          md5(regexp_replace(lower(col(textCol)), "\\s+", " ")), idCol)
          .select(col(idCol),
            min(col(idCol)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(md5(regexp_replace(lower(col(textCol)), "\\s+", " "))))
              .as("cluster"))
          .withColumn("is_canonical", col(idCol) === col("cluster"))
      case other => sys.error(s"unknown --method $other")
    }
    labeled.write.mode("overwrite").parquet(out)

    val total = spark.read.parquet(out).count()
    val canonical = spark.read.parquet(out)
      .filter(col("is_canonical")).count()
    println(s"[graft-dedup] $method: $total docs -> $canonical canonical " +
      s"(${total - canonical} duplicates) at $out")
    (total, canonical)
  }
}
