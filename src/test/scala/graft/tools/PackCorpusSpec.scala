package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** End-to-end drive of the packing CLI on the sf0.001 corpus: the
  * manifest must tile every sequence exactly (interior sequences sum
  * to seq-len), cover every non-empty doc, and be deterministic; the
  * source-order variant must change only the concatenation, not the
  * token accounting.
  */
class PackCorpusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "PackCorpusSpec")

  private val in = "/root/testdata/sf0.001/documents.parquet"

  test("pack artifacts: exact tiling, full coverage, determinism") {
    val tmp = Files.createTempDirectory("graft_pack").toString
    val res = PackCorpus.run(spark, Array(in, s"$tmp/out",
      "--seq-len", "256")).toMap

    val man = spark.read.parquet(s"$tmp/out/manifest")
    val seqs = spark.read.parquet(s"$tmp/out/seq_stats")
    val summary = spark.read.json(s"$tmp/out/summary").head()

    // every doc with tokens appears; token shares sum to the doc's
    // token count
    val docs = spark.read.parquet(in)
    val nonEmpty = docs
      .select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).cast("long").as("t"))
      .filter(col("t") > 0)
    val perDoc = man.groupBy(col("doc_id"))
      .agg(sum(col("n_slots")).as("s"))
    val joined = nonEmpty.join(perDoc, Seq("doc_id"), "left")
    assert(joined.filter(col("s").isNull || col("s") =!= col("t"))
      .count() == 0L, "every non-empty doc's slots must sum to toks")

    // interior sequences are EXACTLY full; only the last may be short
    val lastSeq = seqs.agg(max(col("seq_id"))).head().getLong(0)
    assert(seqs.filter(col("seq_id") < lastSeq &&
      col("n_tokens") =!= 256L).count() == 0L)
    assert(res("seq_stats") == lastSeq + 1)
    assert(summary.getAs[Long]("n_seqs") == lastSeq + 1)
    // slot geometry: starts in range, shares positive
    assert(man.filter(col("start_slot") < 0 ||
      col("start_slot") >= 256 || col("n_slots") <= 0).count() == 0L)

    // determinism
    val res2 = PackCorpus.run(spark, Array(in, s"$tmp/out2",
      "--seq-len", "256")).toMap
    assert(res == res2)
    val h1 = man.agg(sum(hash(col("doc_id"), col("seq_id"),
      col("start_slot"), col("n_slots")).cast("long"))).head().getLong(0)
    val h2 = spark.read.parquet(s"$tmp/out2/manifest")
      .agg(sum(hash(col("doc_id"), col("seq_id"),
        col("start_slot"), col("n_slots")).cast("long"))).head().getLong(0)
    assert(h1 == h2)
  }

  test("source order: same token totals, different concatenation") {
    val tmp = Files.createTempDirectory("graft_pack2").toString
    val a = PackCorpus.run(spark, Array(in, s"$tmp/a",
      "--seq-len", "256")).toMap
    val b = PackCorpus.run(spark, Array(in, s"$tmp/b",
      "--seq-len", "256", "--order", "source")).toMap
    // identical totals either order
    val sa = spark.read.json(s"$tmp/a/summary").head()
    val sb = spark.read.json(s"$tmp/b/summary").head()
    assert(sa.getAs[Long]("n_tokens") == sb.getAs[Long]("n_tokens"))
    assert(sa.getAs[Long]("n_seqs") == sb.getAs[Long]("n_seqs"))
    assert(a("manifest") > 0 && b("manifest") > 0)
    // source_stats boundary columns match q204/q211 semantics:
    // per-source padded_tokens identical across orders (order-free)
    val pa = spark.read.parquet(s"$tmp/a/source_stats")
      .select(col("source"), col("padded_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pb = spark.read.parquet(s"$tmp/b/source_stats")
      .select(col("source"), col("padded_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pa == pb)
  }

  test("source order densely re-indexes snowflake/negative ids: " +
    "manifest identical to the dense-id corpus in the same order") {
    val tmp = Files.createTempDirectory("graft_pack3").toString
    // remap the dense fixture ids through an order-preserving but
    // WILD id space: negative for even rows, >= 1e12 for odd — the
    // exact inputs the old [0, 1e12) validation rejected
    val docs = spark.read.parquet(in)
    val wildExpr = when(pmod(col("doc_id"), lit(2)) === 0,
        col("doc_id") - lit(5000000L))
      .otherwise(col("doc_id") + lit(3000000000000L))
    // interleave parity so wild-id RANK order == original id order
    // does NOT hold trivially: sort mapping must come from the dense
    // re-index, not from luck. Verify the mapping is order-preserving
    // is false: evens (negative) all sort before odds (>=1e12).
    val wild = docs.withColumn("doc_id", wildExpr)
    val wildPath = s"$tmp/wild.parquet"
    wild.write.parquet(wildPath)
    val r = PackCorpus.run(spark, Array(wildPath, s"$tmp/w",
      "--seq-len", "256", "--order", "source")).toMap
    assert(r("manifest") > 0)
    // reference: the SAME corpus with ids pre-ranked densely by hand
    // (evens first, then odds — matching the wild ids' sort order)
    val ref = docs.withColumn("_rk",
        when(pmod(col("doc_id"), lit(2)) === 0, col("doc_id"))
          .otherwise(col("doc_id") + lit(1000000L)))
      .withColumn("doc_id", col("_rk")).drop("_rk")
    val refPath = s"$tmp/ref.parquet"
    ref.write.parquet(refPath)
    PackCorpus.run(spark, Array(refPath, s"$tmp/r",
      "--seq-len", "256", "--order", "source"))
    // identical packing geometry: map wild ids back and compare
    val wm = spark.read.parquet(s"$tmp/w/manifest")
      .withColumn("orig", when(col("doc_id") < 0,
          col("doc_id") + lit(5000000L))
        .otherwise(col("doc_id") - lit(3000000000000L)))
    val rm = spark.read.parquet(s"$tmp/r/manifest")
      .withColumn("orig", when(pmod(col("doc_id"), lit(2)) === 0,
          col("doc_id"))
        .otherwise(col("doc_id") - lit(1000000L)))
    val wset = wm.select(col("orig"), col("seq_id"), col("start_slot"),
      col("n_slots")).collect().map(_.toSeq).toSet
    val rset = rm.select(col("orig"), col("seq_id"), col("start_slot"),
      col("n_slots")).collect().map(_.toSeq).toSet
    assert(wset == rset,
      "wild-id packing must equal the hand-ranked dense packing")
  }
}
