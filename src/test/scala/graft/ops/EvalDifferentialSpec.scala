package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Differential tests for the statistics operators: many small random
  * groups ride ONE Spark job per operator, each group checked against
  * a brute-force Scala reference — the generated-input hardening the
  * hand-picked example tests can't give. Seeded, so failures replay.
  */
class EvalDifferentialSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "EvalDifferentialSpec")
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  test("groupAuc == brute-force pair counting over 40 random groups") {
    val data = for {
      g <- 0 until 40
      _ <- 0 until (2 + rnd.nextInt(30))
    } yield (s"g$g", rnd.nextInt(8), rnd.nextInt(2).toLong)
    val got = Eval.groupAuc(data.toDF("g", "s", "l"),
      col("g"), col("s"), col("l")).collect()
      .map(r => r.getAs[String]("grp") ->
        Option(r.getAs[java.lang.Long]("auc_permille"))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val expect =
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val u2 = (for (p <- pos; q <- neg)
            yield if (p > q) 2L else if (p == q) 1L else 0L).sum
          Some(u2 * 1000L / (2L * pos.size * neg.size))
        }
      assert(got(g) == expect, s"group $g")
    }
  }

  test("ksDrift == brute-force ECDF max over the union value set") {
    // the op only evaluates at each group's own steps (and their left
    // limits); the brute force walks EVERY union value — equality IS
    // the supremum argument, on generated data
    val data = for {
      g <- 0 until 25
      _ <- 0 until (1 + rnd.nextInt(20))
    } yield (s"g$g", rnd.nextInt(12).toLong)
    val got = Eval.ksDrift(data.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("ks_permille")).toMap
    val all = data.map(_._2)
    val n = all.size.toLong
    val union = all.distinct.sorted
    data.groupBy(_._1).foreach { case (g, rows) =>
      val vs = rows.map(_._2)
      val ng = vs.size.toLong
      val d = union.map { v =>
        val cumG = vs.count(_ <= v).toLong
        val cumA = all.count(_ <= v).toLong
        math.abs(cumG * n - cumA * ng)
      }.max
      assert(got(g) == d * 1000L / (ng * n), s"group $g")
    }
  }

  test("keySkewProfile == brute-force sorted-index gini and percentiles") {
    val sizes = (0 until 60).map(i => s"k$i" -> (1 + rnd.nextInt(40)))
    val df = sizes.flatMap { case (k, c) => Seq.fill(c)(k) }.toDF("k")
    val got = Skew.keySkewProfile(df, col("k")).head()
    val xs = sizes.map(_._2.toLong).sorted
    val nk = xs.size.toLong
    val nr = xs.sum
    val gnum = xs.zipWithIndex.map { case (x, i) =>
      (2L * (i + 1) - nk - 1) * x
    }.sum
    assert(got.getAs[Long]("gini_permille") == gnum * 1000L / (nk * nr))
    assert(got.getAs[Long]("top1_cnt") == xs.max)
    def pct(p: Long) = xs((((nk * p + 999) / 1000) - 1).toInt max 0)
    assert(got.getAs[Long]("p50_cnt") == pct(500))
    assert(got.getAs[Long]("p99_cnt") == pct(990))
  }

  test("olsTrend == BigInt rational slope over 30 random groups") {
    val data = for {
      g <- 0 until 30
      _ <- 0 until (2 + rnd.nextInt(12))
    } yield (s"g$g", rnd.nextInt(1000).toLong, (rnd.nextInt(2001) - 1000).toLong)
    val got = Eval.olsTrend(data.toDF("g", "x", "y"),
      col("g"), col("x"), col("y")).collect()
      .map(r => r.getAs[String]("grp") ->
        Option(r.getAs[java.lang.Long]("slope_micro"))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val n = BigInt(rows.size)
      val xm = rows.map(_._2).min
      val xs = rows.map(r => BigInt(r._2 - xm))
      val ys = rows.map(r => BigInt(r._3))
      val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
        xs.sum * ys.sum
      val den = n * xs.map(a => a * a).sum - xs.sum * xs.sum
      val expect =
        if (den == 0) None
        else Some(((num * 1000000) / den).toLong) // BigInt / truncates
      assert(got(g) == expect, s"group $g")
    }
  }
}
