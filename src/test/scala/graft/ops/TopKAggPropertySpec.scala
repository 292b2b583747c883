package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Property parity for the top-k heap aggregate against naive
  * sort-take, driven through the raw update/merge/serialize/eval
  * lifecycle in randomized partition splits — the exact path Spark
  * exercises across mappers and reducers, minus the cluster.
  */
object TopKAggPropertySpec extends Properties("graft.ops.topk") {

  private val rowGen: Gen[(Long, String)] = for {
    v <- Gen.choose(-20L, 20L) // narrow range -> heavy ties
    p <- Gen.oneOf("a", "b", "c", "dd", "e1", "f")
  } yield (v, p)

  private val caseGen = for {
    rows <- Gen.listOf(rowGen)
    k <- Gen.choose(1, 8)
    nSplits <- Gen.choose(1, 5)
  } yield (rows, k, nSplits)

  private def naive(rows: List[(Long, String)], k: Int): List[(Long, String)] =
    rows.sortBy { case (v, p) => (-v, p) }.take(k)

  property("update/merge/serde/eval == naive sort-take at any split") =
    Prop.forAll(caseGen) { case (rows, k, nSplits) =>
      val agg = TopKByAgg(
        BoundReference(0, LongType, nullable = true),
        BoundReference(1, StringType, nullable = true), k)
      // partial buffers per split (mapper side)...
      val partials = rows.grouped(math.max(rows.size / nSplits, 1)).map { part =>
        part.foldLeft(agg.createAggregationBuffer()) { (buf, r) =>
          agg.update(buf, new GenericInternalRow(
            Array[Any](r._1, UTF8String.fromString(r._2))))
        }
      }.toList
      // ...serialized, deserialized, and merged (reducer side)
      val merged = partials
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = agg.eval(merged).asInstanceOf[ArrayData]
      val out = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getLong(0), r.getUTF8String(1).toString)
      }.toList
      out == naive(rows, k)
    }
}
