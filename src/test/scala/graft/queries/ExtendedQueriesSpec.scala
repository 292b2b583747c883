package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class ExtendedQueriesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "ExtendedQueriesSpec")

  test("approx distinct stays within HLL error of exact counts") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    // the raw-estimate accuracy pin (tighter than q42's 10% verdict)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"),
        countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (flag, ap, ao, p, o) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$flag parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$flag orders: $ao vs $o")
    }
    // and the driver-visible q42 shape: exact counts + verdict flags,
    // every flag 1 (the oracle asserts the same constants)
    val q42 = Registry.queries("q42_approx_distinct")(spark, dir).collect()
    assert(q42.nonEmpty)
    q42.foreach { r =>
      assert(r.getLong(3) == 1L && r.getLong(4) == 1L,
        s"${r.getString(0)} HLL verdict flags: $r")
    }
  }

  test("stableStreamSrc re-writes when the source content changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_fp").toFile
    val ev = new java.io.File(dir, "events.parquet")
    spark.range(5).toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(ev.getAbsolutePath)
    val p1 = SlowLogQueries.stableStreamSrc(dir.getAbsolutePath, "fptest",
      spark.range(5).toDF("x"))
    assert(spark.read.parquet(p1).count() == 5)
    // regenerate the fixture in place: same path, new content
    spark.range(9).toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(ev.getAbsolutePath)
    ev.listFiles().foreach(f => f.setLastModified(f.lastModified() + 5000))
    val p2 = SlowLogQueries.stableStreamSrc(dir.getAbsolutePath, "fptest",
      spark.range(9).toDF("x"))
    assert(p1 != p2, "path-keyed cache served stale stream input")
    assert(spark.read.parquet(p2).count() == 9)
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
