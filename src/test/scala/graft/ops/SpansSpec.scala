package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class SpansSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "SpansSpec")
  import spark.implicits._

  private def merge(rows: Seq[(Long, Int)], n: Int) =
    Spans.mergeSpans(rows.toDF("doc_id", "pos"), "doc_id", "pos", n)
      .orderBy($"doc_id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("single hit -> one span of exactly n tokens") {
    assert(merge(Seq((1L, 5)), 4) == Seq((1L, 5L, 4L, 1L)))
  }

  test("overlapping and adjacent hits merge; a gap > n splits") {
    // n=4: hits at 0,2 overlap; 6 touches (6-2<=4); 11 is a new span
    // (11-6=5>4). Span1 covers tokens [0, 9] = 10; span2 [11, 14] = 4.
    assert(merge(Seq((1L, 0), (1L, 2), (1L, 6), (1L, 11)), 4) ==
      Seq((1L, 0L, 10L, 3L), (1L, 11L, 4L, 1L)))
  }

  test("gap == n still merges (intervals touch end-to-start)") {
    // n=3: [0,2] and [3,5] are adjacent -> one 6-token span
    assert(merge(Seq((1L, 0), (1L, 3)), 3) == Seq((1L, 0L, 6L, 2L)))
  }

  test("documents are independent partitions") {
    val got = merge(Seq((1L, 0), (2L, 0), (2L, 1)), 4)
    assert(got == Seq((1L, 0L, 4L, 1L), (2L, 0L, 5L, 2L)))
  }

  test("consecutive full-overlap run is one span with all hits counted") {
    val run = (0 until 50).map(p => (7L, p))
    assert(merge(run, 8) == Seq((7L, 0L, 57L, 50L)))
  }

  test("random positions: spans == brute-force interval union (seeded)") {
    val rnd = new scala.util.Random(42)
    // brute-force reference: mark every covered token, read off runs
    def naive(ps: Seq[Int], n: Int): Seq[(Long, Long, Long)] = {
      val covered = ps.flatMap(p => p until p + n).toSet
      val hits = ps.toSet
      if (covered.isEmpty) Nil
      else {
        val sorted = covered.toSeq.sorted
        val runs = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc @ (cur :: rest), t) =>
            if (t == cur.head + 1) (t :: cur) :: rest else List(t) :: acc
          case (Nil, t) => List(List(t))
        }.map(_.reverse).reverse
        runs.map(r => (r.head.toLong, r.length.toLong,
          r.count(hits.contains).toLong))
      }
    }
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(8)
      val ps = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(100)).distinct
      val got = merge(ps.map(p => (1L, p)), n)
        .map { case (_, st, len, hits) => (st, len, hits) }
      assert(got == naive(ps, n).sortBy(_._1),
        s"trial $trial n=$n ps=${ps.sorted}")
    }
  }
}
