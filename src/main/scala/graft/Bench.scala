package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    // Warm the session once (JVM/codegen/FS init), not per query: a
    // trivial job, one footer read per table, and one pass through the
    // hot execution paths (columnar scan -> whole-stage codegen hash
    // agg with decimal sums, ranking window, broadcast join) on small
    // limits — otherwise the alphabetically-first query pays all the
    // JIT/codegen compilation and its timing measures the JVM, not the
    // operator.
    spark.range(16).repartition(4).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").schema
      catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(20000)
      li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")), count(lit(1)))
        .queryExecution.toRdd.foreach(_ => ())
      val ev = spark.read.parquet(s"$sfDir/events.parquet").limit(20000)
      ev.withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"))))
        .queryExecution.toRdd.foreach(_ => ())
      val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      ev.join(broadcast(nat), ev("user_id") % 25 === nat("n_nationkey"))
        .queryExecution.toRdd.foreach(_ => ())
      // text/sketch kernel JIT + codegen, so the first documents query
      // measures the operator rather than compilation
      val doc = spark.read.parquet(s"$sfDir/documents.parquet").limit(500)
      doc.select(
        graft.ops.SketchExpressions.simhash120(col("text")),
        graft.ops.SketchExpressions.minhashSignature(col("text"), 3),
        graft.ops.TextExpressions.ngrams(col("text"), 3, distinct = true),
        graft.ops.TextExpressions.repetitionStats(col("text")),
        graft.ops.TextExpressions.fingerprint(col("text")))
        .queryExecution.toRdd.foreach(_ => ())
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(500)
      emb.select(graft.ops.VectorExpressions.cosine(col("embedding"),
        col("embedding"))).queryExecution.toRdd.foreach(_ => ())
    } catch { case _: Throwable => () } // warm-up must never fail the bench
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // Materialize every row of every column (toRdd evaluates the full
        // physical plan) — a bare .count() lets Catalyst prune the
        // projections, so narrow parse/window queries would be timed with
        // their per-row work optimized away.
        try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // Keep the line SHORT: the consumer parses it out of a bounded tail
    // of the sbt output, and BENCH_r03 showed a 69-query line with
    // 9-decimal floats overflowing that window (the head of the line was
    // truncated -> "parsed": null). Millisecond precision is plenty.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val note = "full-materialization timing (toRdd)"
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"note":"$note","sf":"$sfDir"}"""
    println(line)
    // Also land the line in a file: sbt interleaves Spark logs with
    // stdout, so a consumer tailing the process output can fail to
    // parse the JSON (BENCH_r02 "parsed": null). The file is clean.
    try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
