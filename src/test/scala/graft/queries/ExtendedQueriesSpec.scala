package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class ExtendedQueriesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "ExtendedQueriesSpec")

  test("approx distinct stays within HLL error of exact counts") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val approx = Registry.queries("q42_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (p, o)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$flag parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$flag orders: $ao vs $o")
    }
  }

  test("split assignment is deterministic and roughly proportional") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = (0L until 2000L).toDF("id")
    val assign = graft.ops.TextOps.splitAssign(col("id"), "exp1",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = ids.withColumn("s", assign).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700) // ~80%
    assert(counts("val") > 120 && counts("val") < 280)
    // determinism: same salt -> identical assignment across evaluations
    val again = ids.withColumn("s", assign).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    // different salt -> different (but still proportional) draw
    val other = ids.withColumn("s",
      graft.ops.TextOps.splitAssign(col("id"), "exp2",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .filter(col("s") =!= assign).count()
    assert(other > 0)
  }

  test("every registered oracle is syntactically runnable SQL text") {
    // structural sanity: non-empty, balanced parens, mentions a table
    Registry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(sql.count(_ == '(') == sql.count(_ == ')'), s"$name parens")
    }
    assert(Registry.queries.keySet == Registry.all.keySet)
    assert(Registry.queries.size >= 42)
  }
}
