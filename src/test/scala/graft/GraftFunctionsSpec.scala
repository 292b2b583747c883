package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface of the custom expressions. */
class GraftFunctionsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "GraftFunctionsSpec")

  test("lex_slow_query is callable from SQL") {
    val r = spark.sql(
      """SELECT lex_slow_query(
        |  'W Query too slow, took 42 ms: SELECT 1').duration AS d""".stripMargin)
      .head()
    assert(r.getLong(0) == 42L)
  }

  test("topk_by aggregate is callable from SQL") {
    val r = spark.sql(
      """SELECT topk_by(v, p, 2) AS top FROM VALUES
        |  (1L, 'a'), (9L, 'b'), (5L, 'c') AS t(v, p)""".stripMargin)
      .selectExpr("transform(top, x -> x.payload) AS ps").head()
    assert(r.getSeq[String](0) == Seq("b", "c"))
  }

  test("topk_by casts non-long ord and non-string payload (SQL path)") {
    // the registry wraps args in Cast(Long)/Cast(String) like the
    // Scala wrapper — an INT ord or INT payload from SQL used to
    // ClassCastException inside TopKByAgg.update
    val r = spark.sql(
      """SELECT topk_by(v, p, 2) AS top FROM VALUES
        |  (1, 10), (9, 90), (5, 50) AS t(v, p)""".stripMargin)
      .selectExpr("transform(top, x -> x.payload) AS ps").head()
    assert(r.getSeq[String](0) == Seq("90", "50"))
  }

  test("sketch functions are callable from SQL and match the DataFrame API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT simhash60('a b c') AS s, minhash_signature('a b c d') AS m, " +
        "simhash120('a b c') AS s2")
      .head()
    val viaDf = Seq(("a b c", "a b c d")).toDF("t1", "t2")
      .select(graft.ops.SketchExpressions.simhash60(col("t1")).as("s"),
        graft.ops.SketchExpressions.minhashSignature(col("t2"), 3).as("m"),
        graft.ops.SketchExpressions.simhash120(col("t1")).as("s2"))
      .head()
    assert(viaSql.getLong(0) == viaDf.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaDf.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) == viaDf.getSeq[Long](2))
    assert(viaSql.getSeq[Long](2).head == viaSql.getLong(0)) // word0 == simhash60
  }

  test("vector and text kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT
        | cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        | text_fingerprint('A  b') AS fp,
        | rolling_hash('a b') AS rh,
        | token_count(' a  b c ') AS tc,
        | lang_predict('the query table') AS lang,
        | quality_signals('the the cat').n_distinct AS nd""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getString(1).length == 32) // md5 hex of 'a b'
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 3)
    assert(r.getString(4) == "analytics") // 2 analytics markers beat 1 en
    assert(r.getInt(5) == 2)
  }

  test("ngrams SQL surface and the array_distinct fusion rule") {
    val r = spark.sql(
      """SELECT ngrams('x y x y') AS g,
        |       ngrams_distinct('x y x y') AS gd,
        |       repetition_stats('a a b').top_tok_cnt AS top""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("x y x", "y x y"))
    assert(r.getSeq[String](1) == Seq("x y x", "y x y"))
    assert(r.getInt(2) == 2)
    // the optimizer rewrites array_distinct(ngrams(..)) into the
    // kernel's distinct mode: no ArrayDistinct survives optimization
    val q = spark.sql("SELECT array_distinct(ngrams('x y x y x')) AS g")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("array_distinct"))
    assert(q.head().getSeq[String](0) == Seq("x y x", "y x y"))
  }

  test("hamming_dist SQL surface: casts + byte semantics") {
    val r = spark.sql(
      """SELECT hamming_dist('abcd', 'abxd') AS h1,
        |       hamming_dist('abc', 'abcde') AS h2,
        |       hamming_dist(12345, 12945) AS h3""".stripMargin).head()
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 2L) // length difference counts per byte
    assert(r.getLong(2) == 1L) // non-string args cast, not ClassCast
  }

  test("winnow and sorted_intersect_count SQL surfaces") {
    val r = spark.sql(
      """SELECT size(winnow('a b c d e f g h i j k l')) AS nf,
        |       sorted_intersect_count(array(1L, 3L, 5L, 7L),
        |                              array(3L, 4L, 5L, 9L)) AS ic,
        |       sorted_intersect_count(array(1, 2, 3),
        |                              array(2, 3, 4)) AS ic_cast
        |""".stripMargin).head()
    assert(r.getInt(0) > 0)       // 12 tokens >= n+w-1=8 -> fingerprints
    assert(r.getInt(1) == 2)      // {3,5}
    assert(r.getInt(2) == 2)      // int arrays cast to long, not ClassCast
    // the SQL surface re-sorts: unsorted input cannot undercount
    val u = spark.sql(
      "SELECT sorted_intersect_count(array(3L, 1L), array(1L, 3L)) AS c")
      .head().getInt(0)
    assert(u == 2)
  }

  test("misra_gries aggregate is callable from SQL and keeps the hot key") {
    spark.range(100).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'hot' ELSE 'c' || id END AS k")
      .createOrReplaceTempView("mg_in")
    val cand = spark.sql("SELECT misra_gries(k, 4) AS c FROM mg_in")
      .head().getSeq[String](0)
    assert(cand.contains("hot")) // freq n/2 > n/5 -> guaranteed present
    assert(cand.size <= 4)
    // pinned-parameter surfaces reject extra args instead of silently
    // ignoring them
    val e = intercept[Exception] {
      spark.sql("SELECT winnow('a b c', 6, 10)").head()
    }
    assert(e.getMessage.contains("winnow(text)"))
  }

  test("corrupt-record side channel returns the broken documents") {
    val dir = java.nio.file.Files.createTempDirectory("pages")
    java.nio.file.Files.writeString(dir.resolve("bad.json"), "not json {{{")
    java.nio.file.Files.writeString(dir.resolve("good.json"),
      """{"responses":[{"hits":{"total":0,"hits":[]}}]}""")
    val corrupt = graft.ingest.KibanaReader.corruptRecords(
      spark, Seq(dir.resolve("bad.json").toString, dir.resolve("good.json").toString))
    assert(corrupt.count() == 1)
    assert(corrupt.head().getString(0).contains("not json"))
  }
}
