package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: where does the fixed cost of a micro-batch go?
  *
  * Runs the q57-shaped streaming volume query against the bench
  * fixture and prints every progress event's durationMs breakdown
  * (queryPlanning / getBatch / addBatch / walCommit / commitOffsets /
  * triggerExecution) plus wall-clock for start / processAllAvailable /
  * stop. The streaming queries cost ~4 s each at sf0.1 for ~1 MB of
  * input — this tool attributes that overhead so the harness tuning
  * (shuffle partitions, checkpoint location, trigger sizing) is
  * evidence-based rather than guessed.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode

    def runOnce(tag: String, shufflePartitions: Int): Unit = {
      val t0 = System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      try {
        val ev = graft.queries.Registry.table(spark, sfDir, "events")
          .select(timestamp_micros(expr("ts DIV 1000")).as("timestamp"),
            (col("event_id") % 1000).as("duration"))
        val src = "/tmp/graft_streamprobe_src"
        if (!new java.io.File(src, "_SUCCESS").exists)
          ev.write.mode("overwrite").parquet(src)
        val t1 = System.nanoTime()
        val stream = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 8).parquet(src)
        val qn = "probe_" + tag + "_" + shufflePartitions
        val query = graft.streaming.StreamingAnalyzer.volumePerMinute(stream)
          .writeStream.outputMode(OutputMode.Complete)
          .format("memory").queryName(qn).start()
        val t2 = System.nanoTime()
        query.processAllAvailable()
        val t3 = System.nanoTime()
        query.recentProgress.foreach { p =>
          println(s"[probe $tag/$shufflePartitions] batch=${p.batchId} " +
            s"rows=${p.numInputRows} durations=${p.durationMs}")
        }
        query.stop()
        val t4 = System.nanoTime()
        def ms(a: Long, b: Long): Long = (b - a) / 1000000
        println(s"[probe $tag/$shufflePartitions] fixture=${ms(t0, t1)}ms " +
          s"start=${ms(t1, t2)}ms processAll=${ms(t2, t3)}ms " +
          s"stop=${ms(t3, t4)}ms total=${ms(t0, t4)}ms")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    runOnce("cold", 8)   // first stream in the JVM pays one-time init
    runOnce("warm", 8)   // steady-state harness cost
    runOnce("warm2", 8)  // repeatability
    runOnce("p4", 4)     // fewer state partitions
    runOnce("p32", 32)   // more state partitions
    spark.stop()
  }
}
