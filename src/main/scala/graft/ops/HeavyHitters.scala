package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a mergeable
  * `TypedImperativeAggregate`: at most `k` counters per buffer, one
  * pass, map-side partial aggregation — the frequent-items summary
  * for a column whose distinct cardinality is far beyond memory.
  *
  * GUARANTEE (Misra-Gries; merge-preserving per Agarwal et al.,
  * "Mergeable Summaries"): every item with true frequency
  * > n/(k+1) is present in the final candidate set, under ANY merge
  * order. Candidate COUNTS are sketch estimates and which
  * below-threshold stragglers survive IS merge-order-dependent — so
  * the library's query discipline (q127) never emits raw sketch
  * state: candidates are re-counted exactly in a second pass
  * (a semi-join-sized aggregate, not a full groupBy) and only items
  * exactly above the threshold are returned. The result is
  * deterministic and the oracle can brute-force it, which proves
  * RECALL (the sketch lost no true heavy hitter), the q58 pattern.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "misra_gries needs k > 0")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Classic MG step: resident key increments; a new key either takes
    * a free counter or decrements EVERY counter (dropping zeros) —
    * amortized O(1) per row since each decrement pays for a prior
    * increment.
    */
  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k =>
          // clone: Spark reuses the row's backing buffer across rows
          buf.update(key.clone(), 1L)
        case None =>
          val dead = buf.iterator.collect {
            case (kk, 1L) => kk
          }.toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries combine: sum counts, then if over k
    * counters, subtract the (k+1)-th largest count from all and drop
    * the non-positive — the multi-item generalization of the
    * decrement step.
    */
  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (kk, c) =>
      buf.update(kk, buf.getOrElse(kk, 0L) + c)
    }
    if (buf.size > k) {
      val t = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (kk, c) =>
        val nc = c - t
        if (nc <= 0) dead += kk
        nc
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidate keys only (sorted for stable presentation) — sketch
    * counts are deliberately NOT exposed; see class doc.
    */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sortBy(_.toString).map(x => x: Any))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val b = kk.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
  override def prettyName: String = "misra_gries"
}

object HeavyHitters {

  /** `misra_gries(key, k)` as a Column aggregate: the candidate key
    * array (superset of every item with freq > n/(k+1)).
    */
  def candidates(key: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(
      ColumnBridge.expression(key.cast("string")), k).toAggregateExpression())

  /** Exact heavy hitters through the sketch: one MG pass for the
    * candidate set (<= k keys, collected to the driver — k-sized, not
    * data-sized), then one exact count restricted to the candidates
    * (a broadcast IN-filter before the aggregate — the second pass
    * groups at most k keys, not the full cardinality). Returns keys
    * with exact count strictly above n/(k+1), with n the non-null
    * row count; the MG guarantee makes this EXACTLY the true heavy
    * hitter set.
    */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, keyCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val row = keyed.agg(
      candidates(col("key"), k).as("cand"),
      count(lit(1)).as("n")).head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    keyed.filter(col("key").isin(cand: _*))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .select(col("key"), col("cnt"),
        lit(n).as("n_rows"),
        (col("cnt") * 1000 / n).cast("long").as("share_permille"))
  }
}
