package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Bucketed co-located joins — the repeated-join scale pattern: both
  * sides pre-hashed into the same bucket layout at write time, so the
  * join plans with NO shuffle exchange (the bucketing IS the
  * exchange, paid once at write).
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("BucketingSpec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.tune(s)
    s
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    // the session is a JVM-wide singleton shared across suites: the
    // broadcast-threshold override must not leak to later suites
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed")
    // the in-memory catalog forgets tables between JVM runs but the
    // warehouse DIRECTORY persists; clear the locations or saveAsTable
    // fails with LOCATION_ALREADY_EXISTS on rerun
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("ev_bucketed", "dim_bucketed").foreach { t =>
      val dir = wh.resolve(t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("ev_bucketed")
    (1 to 500).map(i => (i.toLong, s"label$i")).toDF("k", "label")
      .write.bucketBy(8, "k").saveAsTable("dim_bucketed")

    val joined = spark.table("ev_bucketed")
      .join(spark.table("dim_bucketed"), "k")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"expected shuffle-free co-located join, got:\n$physical")
    assert(joined.count() == 9980) // k=0 (20 rows) has no dim row

    // contrast: the same join on un-bucketed data shuffles both sides
    val plain = (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
      .join((1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "label"), "k")
    assert(plain.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }
}
