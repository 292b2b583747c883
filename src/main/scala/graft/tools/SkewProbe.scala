package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{SketchExpressions, TextOps}

/** Diagnostic probe comparing block-key skew of three q23 blocking
  * candidates across scale factors; the numbers pin the choice of
  * min-of-k SHINGLE hashes (Dedup.jaccardPairsMinK) and the bound in
  * OpsSpec's skew test.
  *
  * Measured (max block population / corpus):
  *   - (lang, first token) natural key: 1.9-2.8%, Zipf-shaped;
  *   - min-of-3 single-TOKEN hashes:   77-81% (!) — the test corpus
  *     has a 31-word vocabulary, so the globally-minimal token hash
  *     sits in ~4/5 of all docs; degenerate for small vocabularies;
  *   - min-of-3 3-gram SHINGLE hashes: 0.6-1.2%, SHRINKING with
  *     corpus size (shingle space ~vocab^3).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]").appName("skew").getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val n = docs.count()
      val oldMax = docs.select(concat(col("lang"),
        element_at(TextOps.tokens(col("text")), 1)).as("b"))
        .groupBy("b").count().agg(max("count")).head.getLong(0)
      val tokMax = docs.select(explode(
        slice(array_sort(array_distinct(transform(
          array_distinct(TextOps.tokens(col("text"))), t => TextOps.hash32(t)))),
          1, 3)).as("b"))
        .groupBy("b").count().agg(max("count")).head.getLong(0)
      val shMax = docs.select(explode(
        slice(array_sort(SketchExpressions.hashedShingles(col("text"), 3)), 1, 3)).as("b"))
        .groupBy("b").count().agg(max("count")).head.getLong(0)
      println(s"SKEW $sf n=$n oldMax=$oldMax (${100.0 * oldMax / n}%) " +
        s"tokMax=$tokMax (${100.0 * tokMax / n}%) " +
        s"shingleMax=$shMax (${100.0 * shMax / n}%)")
    }
    spark.stop()
  }
}
