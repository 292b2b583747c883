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

  test("sketch functions are callable from SQL and match the DataFrame API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaSql = spark.sql("SELECT simhash60('a b c') AS s, minhash_signature('a b c d') AS m")
      .head()
    val viaDf = Seq(("a b c", "a b c d")).toDF("t1", "t2")
      .select(graft.ops.SketchExpressions.simhash60(col("t1")).as("s"),
        graft.ops.SketchExpressions.minhashSignature(col("t2"), 3).as("m"))
      .head()
    assert(viaSql.getLong(0) == viaDf.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaDf.getSeq[Long](1))
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
