package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Co-located (bucketed) fact-fact joins: the 100 TB shape where both
  * sides are large, broadcast is impossible, and a per-query shuffle
  * of either side is the dominant cost. Writing both tables bucketed
  * on the join key lets every subsequent join run shuffle-free — the
  * bucketing IS the pre-paid shuffle, amortized over all later
  * queries. This spec pins the plan property that makes it work:
  * bucketed scans feed SortMergeJoin with NO Exchange on either side,
  * while the same join over plain parquet must exchange both sides.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = {
    val s = GraftSession.local(4, "BucketedJoinSpec")
    // the planner opportunistically falls back to non-bucketed scans
    // when it thinks the layout doesn't pay; pin it on so the spec
    // tests the bucketed path deterministically
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s
  }

  test("bucketed tables join with no shuffle; plain parquet shuffles") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumnRenamed("vec_id", "doc_id")

    dropTable("b_docs")
    dropTable("b_emb")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("b_docs")
    emb.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("b_emb")

    val thresholdWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_docs").join(spark.table("b_emb"), "doc_id")
        .select(col("doc_id"), col("n_chars"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle:\n$p")
      assert(joined.count() == docs.count())

      // contrast: identical join over the raw parquet exchanges both sides
      val plain = docs.join(emb, "doc_id").select(col("doc_id"), col("n_chars"))
      val pp = plain.queryExecution.executedPlan.toString
      assert(pp.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdWas)
      dropTable("b_docs")
      dropTable("b_emb")
    }
  }

  /** DROP TABLE plus physical location cleanup — a create that died
    * mid-write leaves an orphan directory the catalog no longer knows
    * about, and the next saveAsTable then fails LOCATION_ALREADY_EXISTS.
    */
  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name)
    if (loc.isDirectory) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("bucket pruning: an equality predicate scans one bucket") {
    dropTable("b_docs2")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("b_docs2")
    try {
      val q = spark.table("b_docs2").filter(col("doc_id") === 42L)
      val scan = q.queryExecution.executedPlan.toString
      // Spark's bucket pruning reports "SelectedBucketsCount: 1 out of 8"
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan:\n$scan")
      assert(q.count() == 1L)
    } finally dropTable("b_docs2")
  }
}
