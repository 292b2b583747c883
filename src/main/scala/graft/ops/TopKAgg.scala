package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped exact top-k as a custom `TypedImperativeAggregate` — the
  * §2.11 UDAF surface, and the scale-correct replacement for the
  * rank-window idiom. `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` must shuffle and SORT every group's full row set;
  * this aggregate keeps a k-bounded heap per group, combines
  * map-side like any partial aggregate (each mapper ships at most k
  * rows per group, pre-shuffle), and never materializes a group's
  * ordering. At 100 TB the window form sorts the corpus; this form
  * moves k rows per (mapper, group).
  *
  * Semantics: top k by `ord` DESC with `payload` ASC tie-break —
  * exactly `ORDER BY ord DESC, payload` — returned as
  * `array<struct<ord, payload>>` in rank order. Rows with a null ord
  * or payload are ignored (SQL aggregate convention).
  */
case class TopKByAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]]
  with BinaryLike[Expression] {

  require(k > 0, "topk_by needs k > 0")

  /** Dequeues the WORST element first: smaller ord, then larger
    * payload. Keeping the queue at size k therefore retains the k
    * best under (ord DESC, payload ASC).
    */
  // @transient lazy: one instance per (de)serialized aggregate rather
  // than a fresh allocation per push() call on the per-row hot path;
  // transient because the anonymous Ordering is not Serializable
  @transient private lazy val worstFirst: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, UTF8String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Long, UTF8String)],
      e: (Long, UTF8String)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // e beats the worst
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      // clone: Spark reuses the row's backing buffer across rows
      push(buf, (o.asInstanceOf[Long], p.asInstanceOf[UTF8String].clone()))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, UTF8String)],
      other: mutable.PriorityQueue[(Long, UTF8String)]): mutable.PriorityQueue[(Long, UTF8String)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any =
    // sorted(worstFirst) ascends in "worseness", i.e. best first —
    // rank order
    new GenericArrayData(buf.toSeq.sorted(worstFirst)
      .map { case (o, p) => InternalRow(o, p) })

  override def serialize(buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) =>
      out.writeLong(o)
      val b = p.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val o = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.enqueue((o, UTF8String.fromBytes(b)))
    }
    buf
  }

  override def left: Expression = ord
  override def right: Expression = payload
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def withNewMutableAggBufferOffset(offset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByAgg =
    copy(ord = l, payload = r)
  override def prettyName: String = "topk_by"
}

object TopKAgg {
  /** `topk_by(ord, payload, k)` as a Column aggregate. Input typing
    * is enforced here with casts (the `private[sql]`
    * ExpectsInputTypes machinery is out of reach — same convention as
    * LexSlowQuery).
    */
  def topKBy(ord: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(TopKByAgg(
      ColumnBridge.expression(ord.cast("long")),
      ColumnBridge.expression(payload.cast("string")),
      k).toAggregateExpression())
}
