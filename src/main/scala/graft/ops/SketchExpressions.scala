package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass sketch kernels as custom Catalyst expressions.
  *
  * The Column-function formulation (transform/filter/aggregate over
  * md5 hex prefixes) is semantically identical but evaluates
  * interpreted (higher-order functions are codegen fallbacks) and
  * allocates a hex string + conv per shingle — ~20x slower per row.
  * These expressions compute the same values (pinned by the DuckDB
  * oracle queries q24-q26) in one pass over the text with a reused
  * MessageDigest and no intermediate strings.
  *
  * Hash contract (identical across the Column forms, these kernels,
  * and the DuckDB oracle SQL):
  *   hash32(s) = first 4 md5 bytes of UTF-8(s) as unsigned
  *   hash60(s) = first 15 md5 hex chars (60 bits)
  */
object SketchKernels {

  def tokenize(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)

  /** First 4 md5 bytes as unsigned 32-bit (== parsing 8 hex chars). */
  def hash32(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 15 md5 hex chars = 60 bits: 7 full bytes + the high nibble
    * of the 8th.
    */
  def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** MinHash signature over distinct word n-gram shingles:
    * sig_i = min over shingles of (a_i * (hash32 mod P) + b_i) mod P.
    * Empty shingle set -> null elements (matches array_min(empty)).
    */
  def minhashSignature(text: String, n: Int): Array[Any] = {
    val toks = tokenize(text)
    val md = MessageDigest.getInstance("MD5")
    val params = Dedup.minhashParams
    val p = Dedup.MinhashP
    val k = params.length
    val mins = Array.fill[Long](k)(Long.MaxValue)
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        val sh = sb.result()
        if (seen.add(sh)) {
          val h = hash32(md, sh) % p
          var q = 0
          while (q < k) {
            val (a, b) = params(q)
            val v = (h * a + b) % p
            if (v < mins(q)) mins(q) = v
            q += 1
          }
        }
        i += 1
      }
    }
    if (mins(0) == Long.MaxValue) Array.fill[Any](k)(null)
    else mins.map(x => x: Any)
  }

  /** Hashed distinct shingle set (the verify-join payload). */
  def hashedShingles(text: String, n: Int): Array[Any] = {
    val toks = tokenize(text)
    val md = MessageDigest.getInstance("MD5")
    val p = Dedup.MinhashP
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        val sh = sb.result()
        if (seen.add(sh)) out += hash32(md, sh) % p
        i += 1
      }
    }
    out.toArray
  }

  /** Distinct-match count of two ascending-sorted long arrays
    * (two-pointer merge, duplicate runs consumed once).
    */
  def sortedIntersectCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        cnt += 1
        while (i < na && a.getLong(i) == va) i += 1
        while (j < nb && b.getLong(j) == va) j += 1
      }
    }
    cnt
  }

  // codegen entry points (static calls emitted by the expressions)
  def minhashEval(u: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(minhashSignature(u.toString, n))
  def shinglesEval(u: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(hashedShingles(u.toString, n))
  def simhashEval(u: UTF8String): Long = simhash60(u.toString)

  /** 60-bit SimHash over distinct whitespace tokens (majority vote per
    * bit; ones*2 > n sets the bit).
    */
  def simhash60(text: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](60)
    var n = 0
    tokenize(text).foreach { t =>
      if (seen.add(t)) {
        n += 1
        val h = hash60(md, t)
        var b = 0
        while (b < 60) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** md5 hex chars 17..31 = 60 bits from the SECOND half of the digest
    * (bytes 8..14 + high nibble of byte 15) — independent of hash60's
    * bits, same non-negative-long representation.
    */
  def hash60b(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 8
    while (i < 15) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(15) & 0xf0L) >> 4)
  }

  /** 120-bit SimHash as TWO 60-bit words (majority vote per bit over
    * distinct tokens, same rule as simhash60). Two 60-bit words
    * instead of 2x64 keep every word non-negative, so bit shifts and
    * hex literals behave identically in Spark and the DuckDB oracle
    * (16 hex chars overflow a signed BIGINT parse). Word 0 uses md5
    * hex chars 1-15 (== simhash60's hash), word 1 chars 17-31.
    */
  def simhash120(text: String): Array[Any] = {
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](120)
    var n = 0
    tokenize(text).foreach { t =>
      if (seen.add(t)) {
        n += 1
        val h0 = hash60(md, t)
        val h1 = hash60b(md, t)
        var b = 0
        while (b < 60) {
          if (((h0 >> b) & 1L) == 1L) counts(b) += 1
          if (((h1 >> b) & 1L) == 1L) counts(60 + b) += 1
          b += 1
        }
      }
    }
    val sig = new Array[Long](2)
    var b = 0
    while (b < 120) {
      if (counts(b) * 2 > n) sig(b / 60) |= (1L << (b % 60))
      b += 1
    }
    Array[Any](sig(0), sig(1))
  }

  def simhash120Eval(u: UTF8String): GenericArrayData =
    new GenericArrayData(simhash120(u.toString))

}

/** minhash_signature(text): array<long> of k affine-min values. */
case class MinHashSignatureExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashEval(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.SketchKernels.minhashEval($c, $n);")
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** hashed_shingles(text): array<long> distinct shingle hashes mod P. */
case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.shinglesEval(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.SketchKernels.shinglesEval($c, $n);")
  override protected def withNewChildInternal(c: Expression): HashedShinglesExpr =
    copy(child = c)
  override def prettyName: String = "hashed_shingles"
}

/** sorted_intersect_count(a, b): distinct values present in BOTH
  * sorted long arrays, by a two-pointer merge scan that skips
  * duplicates — semantics of len(list_intersect(a, b)) without
  * building per-row hash sets or result arrays (the generic
  * array_intersect was the dominant cost of the containment verify:
  * candidate pairs x ~2x50-element set builds per row).
  * PRECONDITION: both inputs ascending-sorted.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.sortedIntersectCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.SketchKernels.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : SortedIntersectCountExpr = copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** simhash60(text): long. */
case class SimHash60Expr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.SketchKernels.simhashEval($c);")
  override protected def withNewChildInternal(c: Expression): SimHash60Expr =
    copy(child = c)
  override def prettyName: String = "simhash60"
}

/** simhash120(text): array<long> of two 60-bit words. */
case class SimHash120Expr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash120Eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.SketchKernels.simhash120Eval($c);")
  override protected def withNewChildInternal(c: Expression): SimHash120Expr =
    copy(child = c)
  override def prettyName: String = "simhash120"
}

object SketchExpressions {
  def minhashSignature(text: Column, n: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(text.cast("string")), n))
  def hashedShingles(text: Column, n: Int): Column =
    ColumnBridge.column(HashedShinglesExpr(ColumnBridge.expression(text.cast("string")), n))
  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60Expr(ColumnBridge.expression(text.cast("string"))))
  def simhash120(text: Column): Column =
    ColumnBridge.column(SimHash120Expr(ColumnBridge.expression(text.cast("string"))))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
