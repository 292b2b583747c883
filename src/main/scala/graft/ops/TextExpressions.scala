package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-analysis kernels (same cure as [[SketchKernels]]:
  * the Column formulations recompute the token array per signal and
  * run interpreted HOFs; these tokenize once per row inside one
  * codegen'd call). Value parity with the Column forms and the DuckDB
  * oracles is pinned by OpsSpec + q20/q21.
  */
object TextKernels {

  import SketchKernels.{hash32, tokenize}

  /** Polynomial rolling hash: fold h = (h*31 + hash32(tok)) mod 2^31-1
    * (intermediates < 2^37 — no overflow; empty input -> seed 0).
    */
  def rollingHash(text: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    var h = 0L
    tokenize(text).foreach { t => h = (h * 31 + hash32(md, t)) % 2147483647L }
    h
  }

  /** Argmax of distinct-token marker overlap, first-wins ties,
    * all-zero -> "und" — mirrors `TextOps.langPredict`.
    */
  def langPredict(text: String, markers: Seq[(String, Seq[String])]): String = {
    val distinct = new java.util.HashSet[String]()
    tokenize(text).foreach(distinct.add)
    val scores = markers.map { case (l, m) => l -> m.count(distinct.contains) }
    val best = scores.map(_._2).max
    if (best == 0) "und"
    else scores.find(_._2 == best).get._1
  }

  /** (n_tokens, n_distinct, n_stop, max_tok_len) in one pass;
    * max_tok_len is null for token-less text (array_max(empty) parity).
    * Token length counts code points (Spark `length`, DuckDB `length`).
    */
  def qualitySignals(text: String, stopwords: Seq[String]): GenericInternalRow = {
    val toks = tokenize(text)
    val distinct = new java.util.HashSet[String]()
    var maxLen = 0
    toks.foreach { t =>
      distinct.add(t)
      val len = t.codePointCount(0, t.length)
      if (len > maxLen) maxLen = len
    }
    val nStop = stopwords.count(distinct.contains)
    new GenericInternalRow(Array[Any](
      toks.length, distinct.size, nStop,
      if (toks.isEmpty) null else maxLen))
  }

  /** Lowercase, collapse `\s+` runs to one space, md5-hex — one pass,
    * no regex engine (the regexp_replace Column form measured ~276us
    * per 500-char row). `\s` here is the regex's ASCII set.
    */
  def fingerprint(text: String): String = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var inWs = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (ws) { if (!inWs) sb.append(' '); inWs = true }
      else { sb.append(c); inWs = false }
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Gopher-style repetition signals in one pass: (n_tokens,
    * top_tok_cnt, n_bigrams, n_dup_bigrams). top_tok_cnt is the
    * occurrence count of the most frequent token (null for token-less
    * text — max-of-empty parity with the oracle); n_dup_bigrams counts
    * bigram occurrences beyond each bigram's first (total - distinct).
    */
  def repetitionStats(text: String): GenericInternalRow = {
    val toks = tokenize(text)
    val freq = new java.util.HashMap[String, Int]()
    toks.foreach(t => freq.merge(t, 1, Integer.sum))
    var top = 0
    freq.values.forEach(c => if (c > top) top = c)
    val bigrams = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length - 1) {
      bigrams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val nBigrams = math.max(toks.length - 1, 0)
    new GenericInternalRow(Array[Any](
      toks.length,
      if (toks.isEmpty) null else top,
      nBigrams,
      nBigrams - bigrams.size))
  }

  /** Ordered word n-grams in one pass (duplicates kept, or first-
    * occurrence-distinct when `distinct`): the HOF formulation
    * (transform + n element_at lookups + concat_ws per window) runs
    * interpreted and dominated the n-gram fan-out queries (q72/q74
    * measured 7-17 s at sf0.1); this is the same one-StringBuilder
    * sliding join the sketch kernels use. Sub-n-token text -> empty
    * array (HOF parity).
    */
  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken) in one
    * pass: per-position n-gram 60-bit hashes (one MessageDigest, no
    * hex round trips), minimum of each w-position window, distinct.
    * The HOF formulation (transform + slice + array_min per window)
    * runs interpreted per element — same cost family as the n-gram
    * HOF this kernel family replaced. Fewer than w full windows ->
    * empty array.
    */
  def winnow(text: String, n: Int, w: Int): Array[Any] = {
    val toks = tokenize(text)
    val p = toks.length - n + 1
    if (p < w) return Array.empty[Any]
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](p)
    var i = 0
    while (i < p) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      hs(i) = SketchKernels.hash60(md, sb.toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i + w <= p) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    out
  }

  def winnowEval(u: UTF8String, n: Int, w: Int): ArrayData =
    new GenericArrayData(winnow(u.toString, n, w))

  def ngrams(text: String, n: Int, distinct: Boolean): Array[Any] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty[Any]
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length - n + 1)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val g = sb.toString
      if (seen == null || seen.add(g)) out += UTF8String.fromString(g)
      i += 1
    }
    out.toArray
  }

  // codegen entry points
  def ngramsEval(u: UTF8String, n: Int, distinct: Boolean): ArrayData =
    new GenericArrayData(ngrams(u.toString, n, distinct))
  def repetitionEval(u: UTF8String): GenericInternalRow =
    repetitionStats(u.toString)
  def fingerprintEval(u: UTF8String): UTF8String =
    UTF8String.fromString(fingerprint(u.toString))
  def rollingHashEval(u: UTF8String): Long = rollingHash(u.toString)
  def langEval(u: UTF8String, markers: Seq[(String, Seq[String])]): UTF8String =
    UTF8String.fromString(langPredict(u.toString, markers))
  def qualityEval(u: UTF8String, stop: Seq[String]): GenericInternalRow =
    qualitySignals(u.toString, stop)
  def tokenCountEval(u: UTF8String): Int = tokenize(u.toString).length
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextKernels.fingerprintEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.fingerprintEval($c);")
  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
  override def prettyName: String = "text_fingerprint"
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.rollingHashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.rollingHashEval($c);")
  override protected def withNewChildInternal(c: Expression): RollingHashExpr =
    copy(child = c)
  override def prettyName: String = "rolling_hash"
}

case class LangPredictExpr(child: Expression,
    markers: Seq[(String, Seq[String])]) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextKernels.langEval(input.asInstanceOf[UTF8String], markers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langMarkers", markers,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.langEval($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): LangPredictExpr =
    copy(child = c)
  override def prettyName: String = "lang_predict"
}

case class QualitySignalsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("max_tok_len", IntegerType, nullable = true)))
  override def nullSafeEval(input: Any): Any =
    TextKernels.qualityEval(input.asInstanceOf[UTF8String], stopwords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopwords,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.qualityEval($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): QualitySignalsExpr =
    copy(child = c)
  override def prettyName: String = "quality_signals"
}

case class NgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.ngramsEval(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.ngramsEval($c, $n, $distinct);")
  override protected def withNewChildInternal(c: Expression): NgramsExpr =
    copy(child = c)
  override def prettyName: String = "ngrams"
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top_tok_cnt", IntegerType, nullable = true),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_dup_bigrams", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.repetitionEval($c);")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

case class WinnowExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowEval(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.winnowEval($c, $n, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
  override def prettyName: String = "winnow"
}

case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCountEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.ops.TextKernels.tokenCountEval($c);")
  override protected def withNewChildInternal(c: Expression): TokenCountExpr =
    copy(child = c)
  override def prettyName: String = "token_count"
}

object TextExpressions {
  def fingerprint(text: Column): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(text.cast("string"))))
  def rollingHash(text: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(text.cast("string"))))
  def langPredict(text: Column, markers: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangPredictExpr(
      ColumnBridge.expression(text.cast("string")), markers))
  def qualitySignals(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualitySignalsExpr(
      ColumnBridge.expression(text.cast("string")), stopwords))
  def tokenCount(text: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(text.cast("string"))))
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text.cast("string"))))
  def ngrams(text: Column, n: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(NgramsExpr(
      ColumnBridge.expression(text.cast("string")), n, distinct))
  def winnow(text: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(
      ColumnBridge.expression(text.cast("string")), n, w))
}
