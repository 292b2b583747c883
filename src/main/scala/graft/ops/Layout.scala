package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys. The
  * Z-order (Morton) curve interleaves the bits of two dimension
  * columns so that rows close in BOTH dimensions land close on the
  * one-dimensional sort key — the primitive behind
  * `OPTIMIZE ... ZORDER BY` style table layout: write the table
  * range-partitioned/sorted by the Morton key and min/max file
  * statistics become selective for predicates on EITHER dimension,
  * instead of only the leading sort column.
  *
  * Pure bit arithmetic on nonnegative longs — bounded shifts and
  * masks, no UDF, fully codegen'd, and reproducible in any engine
  * (the audit query's oracle recomputes it in SQL).
  */
object Layout {

  /** Morton-interleave the low `bits` bits of nonneg longs x and y:
    * bit b of x lands at position 2b, bit b of y at 2b+1.
    */
  def morton(x: Column, y: Column, bits: Int): Column = {
    requireBits(bits)
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  // bits = 32 would need position 2*31+1 = 63 — the long sign bit —
  // making 1L << 63 negative and breaking the key's sort order
  private def requireBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 31,
      s"bits must be in [1, 31], got $bits (interleaved positions " +
        "reach 2*bits-1 and must stay below the long sign bit)")

  /** The same interleave as DuckDB SQL, for oracle construction. */
  def mortonSql(x: String, y: String, bits: Int): String = {
    requireBits(bits)
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) * ${1L << (2 * b)}) + " +
        s"((($y >> $b) & 1) * ${1L << (2 * b + 1)})"
    }.mkString("(", " + ", ")")
  }
}
