package graft.parse

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The slow-query log-line lexer as a single Catalyst expression.
  *
  * Why a custom Expression and not composed Column functions: the
  * lexer's conditional pointer arithmetic (reference:
  * analyze_slow_queries.py:939-983) needs ~15 mutually-referencing
  * intermediate positions; as composed `Column`s every downstream
  * reference duplicates the whole subtree and optimizer alias
  * substitution blows the plan up combinatorially (observed: OOM in
  * CollapseProject/PushDownPredicates on an 8 GiB driver). As one
  * expression node it is O(1) plan size, evaluates in a single pass
  * over the string, and stays inside whole-stage codegen via a static
  * call (SURVEY.md §2.11, preference order (b)).
  */
object SlowQueryLexer {

  /** Null when the line is not a slow-query log (the reference raises
    * and skips the row); `duration` is null when the duration text is
    * not a valid Python int literal (int() raise -> skip).
    */
  val schema: StructType = StructType(Seq(
    StructField("duration_str", StringType),
    StructField("duration", LongType),
    StructField("counts", StringType),
    StructField("bound_values", StringType),
    StructField("query", StringType)))

  private val Marker = "Query too slow, took "

  /** Exact translation of the reference's find/slice pointer walk.
    * All positions are 0-based as in Python; slices are
    * [start, end) like Python's `s[a:b]`.
    */
  def evalRow(input: UTF8String): InternalRow = {
    if (input == null) return null
    val buff = input.toString
    val p = buff.indexOf(Marker)
    if (p == -1) return null // 'Not a slow query log'
    val posMs = buff.indexOf(" ms: ", p)
    if (posMs == -1) return null // 'Unable to find query time'
    val durationStr = buff.substring(p + 21, posMs)
    var ptr = posMs + 5
    // counts only when the char right after " ms: " is '[' — note the
    // reference indexes buff[pos_ms + 5] unguarded, so a line ENDING
    // at " ms: " raises IndexError -> row skip; mirror with a bounds
    // check -> null row
    if (ptr >= buff.length) return null
    var counts: String = null
    if (buff.charAt(ptr) == '[') {
      val end = buff.indexOf(']', ptr)
      if (end == -1) {
        // Python buff[ptr:end+1] with end=-1 -> buff[ptr:0] -> ""
        counts = ""
        ptr = 1
      } else {
        counts = buff.substring(ptr, end + 1)
        ptr = end + 2
      }
    }
    var boundValues: String = null
    var rptr = buff.length
    if (counts != null && counts.nonEmpty) {
      var start = buff.indexOf("; [", math.min(ptr, buff.length))
      if (start == -1) start = buff.indexOf("] [", math.min(ptr, buff.length))
      if (start != -1) {
        boundValues = buff.substring(start + 2)
        rptr = start + 1
      }
    }
    val query =
      if (ptr >= rptr) ""
      else buff.substring(math.min(ptr, buff.length), rptr)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(durationStr),
      pythonInt(durationStr),
      if (counts == null) null else UTF8String.fromString(counts),
      if (boundValues == null) null else UTF8String.fromString(boundValues),
      UTF8String.fromString(query)))
  }

  /** Python 2 int(str) semantics: optional surrounding whitespace,
    * optional sign, at least one digit; anything else -> null (raise).
    */
  private def pythonInt(s: String): Any = {
    val t = s.trim
    if (t.isEmpty) return null
    val body = if (t.charAt(0) == '+' || t.charAt(0) == '-') t.substring(1) else t
    if (body.isEmpty || !body.forall(_.isDigit)) return null
    try java.lang.Long.valueOf(t.replace("+", "").toLong)
    catch { case _: NumberFormatException => null }
  }
}

/** Callers must hand this a StringType child ([[LogColumns.lex]]
  * inserts the cast); input typing is enforced there rather than via
  * the `private[sql]` ExpectsInputTypes machinery.
  */
case class LexSlowQuery(child: Expression) extends UnaryExpression {

  override def dataType: DataType = SlowQueryLexer.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SlowQueryLexer.evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val row = ctx.freshName("lexRow")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |$rowCls $row = graft.parse.SlowQueryLexer.evalRow($c);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LexSlowQuery =
    copy(child = newChild)

  override def prettyName: String = "lex_slow_query"
}
