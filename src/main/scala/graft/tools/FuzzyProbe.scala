package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Fuzzy

/** Stage timing for the fuzzy-linkage scan (q107): where does the
  * wall time go at sf0.1 — key derivation, candidate join, verify,
  * or the presentation sort?
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fuzzy] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm
    docs.select(Fuzzy.linkKey(col("text"), 24).as("k"))
      .queryExecution.toRdd.foreach(_ => ())
    time("linkKey scan") {
      docs.select(Fuzzy.linkKey(col("text"), 24).as("k"))
        .queryExecution.toRdd.foreach(_ => ())
    }
    for (i <- 1 to 3) {
      time(s"pairs no-sort run$i") {
        Fuzzy.fuzzyKeyPairs(docs, "doc_id", "text", 24, 2)
          .queryExecution.toRdd.foreach(_ => ())
      }
      graft.Scratch.release()
    }
    time("pairs + orderBy") {
      Fuzzy.fuzzyKeyPairs(docs, "doc_id", "text", 24, 2)
        .orderBy(col("id_a"), col("id_b"))
        .queryExecution.toRdd.foreach(_ => ())
    }
    graft.Scratch.release()
    // stage decomposition: candidates only (no verify columns)
    val keyed = graft.Scratch.cache(docs.select(col("doc_id").as("id"),
      Fuzzy.linkKey(col("text"), 24).as("key")))
    keyed.count()
    def side(an: String, kn: String) = keyed.select(col("id").as(an),
      col("key").as(kn),
      posexplode(array((0 to 2).map(s =>
        substring(col("key"), s * 8 + 1, 8)): _*)).as(Seq("si", "sv")))
    for (i <- 1 to 2) {
      time(s"join only run$i") {
        side("id_a", "key_a").join(side("id_b", "key_b"), Seq("si", "sv"))
          .filter(col("id_a") < col("id_b"))
          .queryExecution.toRdd.foreach(_ => ())
      }
      time(s"join+firstshared run$i") {
        val firstShared = (0 to 2).foldRight(lit(-1): Column) { (s, els) =>
          when(substring(col("key_a"), s * 8 + 1, 8) ===
            substring(col("key_b"), s * 8 + 1, 8), lit(s)).otherwise(els)
        }
        side("id_a", "key_a").join(side("id_b", "key_b"), Seq("si", "sv"))
          .filter(col("id_a") < col("id_b"))
          .filter(col("si") === firstShared)
          .queryExecution.toRdd.foreach(_ => ())
      }
      time(s"join+hamming run$i") {
        side("id_a", "key_a").join(side("id_b", "key_b"), Seq("si", "sv"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("hd", Fuzzy.hammingDist(col("key_a"), col("key_b")))
          .filter(col("hd") <= 2)
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    for (i <- 1 to 2) {
      val firstShared = (0 to 2).foldRight(lit(-1): Column) { (s, els) =>
        when(substring(col("key_a"), s * 8 + 1, 8) ===
          substring(col("key_b"), s * 8 + 1, 8), lit(s)).otherwise(els)
      }
      def verified = side("id_a", "key_a")
        .join(side("id_b", "key_b"), Seq("si", "sv"))
        .filter(col("id_a") < col("id_b"))
        .filter(col("si") === firstShared)
        .withColumn("hd", Fuzzy.hammingDist(col("key_a"), col("key_b")))
        .filter(col("hd") <= 2)
      time(s"full minus ld run$i") {
        verified.select(col("id_a"), col("id_b"), col("hd"))
          .queryExecution.toRdd.foreach(_ => ())
      }
      time(s"full with ld run$i") {
        verified.select(col("id_a"), col("id_b"), col("hd"),
          levenshtein(col("key_a"), col("key_b")).cast("long").as("ld"))
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    graft.Scratch.release()
    spark.stop()
  }
}
