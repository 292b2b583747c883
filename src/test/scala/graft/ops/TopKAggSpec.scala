package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The grouped top-k TypedImperativeAggregate vs the rank-window
  * idiom it replaces: identical results, including ties, across
  * partial/merge paths.
  */
class TopKAggSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "TopKAggSpec")
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"p".asc)
    df.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"g", $"rk", $"v", $"p")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3))).toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g").agg(TopKAgg.topKBy($"v", $"p", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).cast("int").as("rk"),
        $"t.ord".as("v"), $"t.payload".as("p"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getString(3))).toSet

  test("matches the rank window, ties included, across 32 partitions") {
    // deterministic synthetic data with heavy ties to stress the
    // (ord DESC, payload ASC) tie-break; repartition(32) forces the
    // partial-heap merge path and the serialize round-trip
    val df = (1 to 5000).map { i =>
      (s"g${i % 7}", (i * 37 % 50).toLong, s"p${i % 613}")
    }.toDF("g", "v", "p").repartition(32)
    assert(viaAgg(df, 5) == viaWindow(df, 5))
    assert(viaAgg(df, 1) == viaWindow(df, 1))
  }

  test("groups smaller than k return all rows in rank order") {
    val df = Seq(("a", 3L, "x"), ("a", 9L, "y")).toDF("g", "v", "p")
    val rows = df.groupBy($"g").agg(TopKAgg.topKBy($"v", $"p", 10).as("top"))
      .select(explode($"top").as("t")).select($"t.ord", $"t.payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((9L, "y"), (3L, "x")))
  }

  test("null ord or payload rows are ignored") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("b")), (Some(5L), None))
      .toDF("v", "p").withColumn("g", lit("g"))
    val rows = df.groupBy($"g").agg(TopKAgg.topKBy($"v", $"p", 3).as("top"))
      .select(size($"top")).head().getInt(0)
    assert(rows == 1)
  }
}
