package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** End-to-end drive of the composed curation funnel on the sf0.001
  * corpus, holdout decontamination included.
  */
class CurateCorpusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "CurateCorpusSpec")

  test("curation funnel runs end-to-end and only ever shrinks") {
    val in = "/root/testdata/sf0.001/documents.parquet"
    val tmp = java.nio.file.Files.createTempDirectory("graft_curate").toString
    // holdout = a slice of the corpus itself: those docs trivially
    // share all their 8-grams with their originals, so if they survive
    // to the decontam stage they MUST be dropped there
    val hold = spark.read.parquet(in).filter(col("doc_id") % 100 === 7)
    hold.write.mode("overwrite").parquet(s"$tmp/holdout")

    val funnel = CurateCorpus.run(spark, Array(in, s"$tmp/out",
      "--lang", "en", "--holdout", s"$tmp/holdout",
      "--temperature", "0.5", "--shards", "4", "--salt", "e1"))

    val names = funnel.map(_._1)
    assert(names == Seq("input", "lang", "quality", "exact_dedup",
      "near_dedup", "decontam", "mixture"))
    val counts = funnel.map(_._2)
    assert(counts.head == 500L)
    assert(counts(1) == 193L) // the labeled-en slice of sf0.001
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel must be monotone: $funnel")
    assert(counts.last > 0L)

    // written corpus == mixture survivors, laid out in 4 shard dirs
    val outDf = spark.read.parquet(s"$tmp/out/corpus")
    assert(outDf.count() == counts.last)
    assert(outDf.select(col("shard")).distinct().count() <= 4)

    // no long-survivor shares an 8-gram with the holdout
    val holdIds = hold.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val survivors = outDf.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(survivors.intersect(holdIds).isEmpty,
      "holdout docs must never survive decontamination")

    // funnel artifact exists and matches
    val fj = spark.read.json(s"$tmp/out/funnel")
    assert(fj.count() == funnel.length)
  }

  test("target-shares reweight stage and curriculum sidecar") {
    val in = "/root/testdata/sf0.001/documents.parquet"
    val tmp = Files.createTempDirectory("graft_curate2").toString
    val funnel = CurateCorpus.run(spark, Array(in, s"$tmp/out",
      "--target-shares", "src0:200,src1:40", "--curriculum", "3",
      "--shards", "2", "--salt", "e1")).toMap
    // unlisted sources get target 0 -> only src0/src1 docs survive
    val outDf = spark.read.parquet(s"$tmp/out/corpus")
    assert(outDf.select(col("source")).distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("src0", "src1")))
    assert(funnel("reweight") == outDf.count())
    // curriculum sidecar: one phase per doc, phases contiguous 0..2
    val cur = spark.read.parquet(s"$tmp/out/curriculum")
    assert(cur.count() == outDf.count())
    assert(funnel("curriculum_phases") <= 3L)
    val phases = cur.select(col("phase")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(phases.forall(p => p >= 0 && p < 3))
  }

  test("dsir-target selection stage: deterministic, bounded, biased " +
    "toward the target profile") {
    val in = "/root/testdata/sf0.001/documents.parquet"
    val tmp = Files.createTempDirectory("graft_curate3").toString
    // target = the labeled-en slice: selection should keep en docs at
    // a higher rate than the rest (their hashed-bigram profile IS the
    // target profile)
    spark.read.parquet(in).filter(col("lang") === "en")
      .write.mode("overwrite").parquet(s"$tmp/target")
    def run(out: String) = CurateCorpus.run(spark, Array(in, out,
      "--dsir-target", s"$tmp/target", "--shards", "2", "--salt", "e1"))
      .toMap
    val f1 = run(s"$tmp/out1")
    assert(f1.contains("dsir_select"))
    assert(f1("dsir_select") <= f1("near_dedup") && f1("dsir_select") > 0)
    // deterministic: same inputs -> identical survivor count
    val f2 = run(s"$tmp/out2")
    assert(f1("dsir_select") == f2("dsir_select"))
    // bias check on the written corpus
    val outDf = spark.read.parquet(s"$tmp/out1/corpus")
    val keptEn = outDf.filter(col("lang") === "en").count().toDouble
    val baseEn = spark.read.parquet(in)
      .filter(col("lang") === "en").count().toDouble
    val keptOther = (outDf.count() - keptEn).max(1.0)
    val baseOther = 500.0 - baseEn
    assert(keptEn / baseEn > keptOther / baseOther,
      s"en keep rate ${keptEn / baseEn} should beat " +
        s"non-en ${keptOther / baseOther}")
  }
}
