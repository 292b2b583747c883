package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-bloom membership pruning — the standard shape for
  * decontaminating a huge corpus against a SMALL reference set
  * (test-set n-grams, a blocklist, a seen-before ledger) at 100 TB:
  *
  *   1. aggregate the small side into a driver-resident BloomFilter
  *      (KB-MB — sketch-sized like IVF centroids, never data-sized;
  *      built distributed via treeAggregate under df.stat.bloomFilter);
  *   2. map-side-filter the corpus scan with `might_contain` — the
  *      sketch rides to executors inside the expression (reference
  *      object, codegen'd call), so ~(1-fpp) of the corpus dies in the
  *      scan stage WITHOUT shuffling;
  *   3. exact-verify the tiny surviving fraction with a semi-join, so
  *      bloom false positives never reach the result — output is
  *      EXACTLY the semi-join's, which is what makes the whole
  *      pipeline oracle-checkable against plain IN (...) SQL.
  *
  * A Catalyst expression rather than a Scala UDF: stays inside
  * whole-stage codegen (no row boxing), and shows up readably in
  * .explain as bloom_might_contain.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExpressions {

  /** might-contain over a LONG key column. */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(key.cast("long")), bloom))

  /** Build a BloomFilter over a long-keyed column of `df` (distributed
    * partial sketches, driver merge — `df.stat.bloomFilter`).
    */
  def buildLongBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    val keyed = df.select(key.cast("long").as("k")).filter(col("k").isNotNull)
    keyed.stat.bloomFilter(col("k"), math.max(expectedItems, 1L), fpp)
  }
}
