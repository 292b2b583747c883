package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class SkewSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "SkewSpec")
  import spark.implicits._

  private def skewed = {
    // key "hot" owns 90% of rows
    val hot = (1 to 900).map(i => ("hot", i.toLong))
    val cold = (1 to 100).map(i => (s"k${i % 10}", i.toLong))
    (hot ++ cold).toDF("key", "v")
  }

  test("salted count/sum equals the direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(count(lit(1)).as("count"), sum($"v").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(skewed, Seq($"key"), $"v", $"v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals the direct join") {
    val dims = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val direct = skewed.join(dims, "key")
      .groupBy($"label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dims, "key", $"v", salts = 8)
      .groupBy($"label").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }
}
