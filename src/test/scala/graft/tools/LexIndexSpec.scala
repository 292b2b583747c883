package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Build/search e2e over the persisted lexical artifacts: the search
  * answer must match the hand-computed integer BM25 values of
  * CurationOpsSpec's pins, straight from the files.
  */
class LexIndexSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "LexIndexSpec")

  private def corpusDir(): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("lexidx_corpus").toString
    Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple cherry"),
      (2L, "cherry durian"),
      (3L, "durian elderberry fig grape"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    s"$d/documents.parquet"
  }

  test("build artifacts + string-query search reproduce the " +
    "hand-computed BM25 values; unknown terms yield no rows") {
    val in = corpusDir()
    val idx = Files.createTempDirectory("lexidx").toString
    val res = LexIndex.build(spark,
      Array(in, s"$idx/lex", "--gram", "1")).toMap
    // 10 distinct (term, doc) postings: apple{0,1} banana{0}
    // cherry{1,2} durian{2,3} elderberry/fig/grape{3}
    assert(res("postings") == 10L)
    assert(res("doclens") == 4L)
    assert(res("stats") == 4L)

    // "apple banana": doc0 = 1157 + 2315 = 3472, doc1 = 1466
    // (CurationOpsSpec's bm25TopK pin, served from the files)
    val got = LexIndex.search(spark, Array(s"$idx/lex", "apple banana"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3472L), (1L, 1466L)))

    // single term re-ranks: doc1 (tf 3 -> 1466) above doc0 (1157)
    val one = LexIndex.search(spark, Array(s"$idx/lex", "apple"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one == Seq((1L, 1466L), (0L, 1157L)))

    // a term absent from the corpus generates no candidates
    assert(LexIndex.search(spark, Array(s"$idx/lex", "kumquat"))
      .collect().isEmpty)

    // duplicate query terms collapse (set-of-terms form)
    val dup = LexIndex.search(spark, Array(s"$idx/lex", "apple apple"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dup == one)
  }

  test("update: subset build + incremental ingest answers exactly " +
    "like a full build; already-ingested ids are rejected") {
    import spark.implicits._
    val in = corpusDir()
    val sub = Files.createTempDirectory("lexidx_sub").toString
    spark.read.parquet(in).filter(col("doc_id") < 2)
      .write.mode("overwrite").parquet(s"$sub/part.parquet")

    val full = Files.createTempDirectory("lexidx_full").toString
    LexIndex.build(spark, Array(in, s"$full/lex", "--gram", "1"))
    val inc = Files.createTempDirectory("lexidx_inc").toString
    LexIndex.build(spark,
      Array(s"$sub/part.parquet", s"$inc/lex", "--gram", "1"))
    // feed the WHOLE corpus: docs 0-1 must be rejected, 2-3 ingested
    val res = LexIndex.update(spark, Array(s"$inc/lex", in)).toMap
    assert(res("ingested") == 2L)

    for (q <- Seq("apple banana", "cherry durian", "kumquat")) {
      val a = LexIndex.search(spark, Array(s"$full/lex", q))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = LexIndex.search(spark, Array(s"$inc/lex", q))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a == b, s"query '$q': full=$a incremental=$b")
    }
    // stats rewrote to the full-corpus values
    val st = spark.read.parquet(s"$inc/lex/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st("n") == 4L && st("toktot") == 12L && st("avgdl") == 3L)
  }

  test("update: a zero-token document (no grams at the index's gram " +
    "size) is still deduped on re-ingest — n does not double-count") {
    import spark.implicits._
    val d = Files.createTempDirectory("lexidx_zero").toString
    // gram=2: doc 7 ("solo") emits NO bigrams, so it never reaches
    // doclens — only the docids manifest knows it was ingested
    Seq((7L, "solo"), (8L, "alpha beta gamma"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/docs.parquet")
    val idx = Files.createTempDirectory("lexidx_zeroidx").toString
    LexIndex.build(spark, Array(s"$d/docs.parquet", s"$idx/lex",
      "--gram", "2"))
    val st0 = spark.read.parquet(s"$idx/lex/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st0("n") == 2L)
    assert(spark.read.parquet(s"$idx/lex/doclens").count() == 1L)
    assert(spark.read.parquet(s"$idx/lex/docids").count() == 2L)

    // re-feed the SAME corpus: both docs (including the zero-token
    // one) must be rejected; n and avgdl's denominator stay at 2
    val res = LexIndex.update(spark, Array(s"$idx/lex", s"$d/docs.parquet"))
      .toMap
    assert(res("ingested") == 0L)
    val st1 = spark.read.parquet(s"$idx/lex/stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st1("n") == 2L && st1("toktot") == st0("toktot"))
  }
}
