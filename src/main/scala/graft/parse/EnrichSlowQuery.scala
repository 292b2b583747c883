package graft.parse

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.QueryPattern

/** Driver-built catalog + per-row enrichment logic, shipped to
  * executors inside [[EnrichSlowQuery]] (a few KB — the reference's
  * broadcast-style lookup tables, SURVEY.md §2.5).
  *
  * This is a direct Scala translation of the reference's processor
  * dispatch + enrichment (analyze_slow_queries.py:892-936 dispatch;
  * :605-694 SELECT; :697-769 INSERT; :570-602,772-839 passthroughs;
  * :454-567 shared helpers). One pass, no Catalyst sub-expressions —
  * see [[LexSlowQuery]] for why the hot parse path is fused into
  * single expression nodes.
  */
case class SlowQueryCatalog(
    cfKs: Map[String, String],
    tagKs: Map[String, String],
    pkIdx: Map[(String, String), Seq[String]],
    patterns: Seq[QueryPattern],
    enrichDml: Boolean = false) extends Serializable {

  import SlowQueryCatalog._

  /** null = row skipped (no processor matched, or the multi-dot table
    * segment raised in the reference's 2-tuple unpack).
    */
  def enrichInternal(qU: UTF8String, bvU: UTF8String, tagsA: ArrayData): InternalRow = {
    if (qU == null) return null
    val rawQuery = qU.toString
    val bvStr = if (bvU == null) null else bvU.toString
    val tags: IndexedSeq[String] =
      if (tagsA == null) IndexedSeq.empty
      else (0 until tagsA.numElements()).map { i =>
        val u = tagsA.getUTF8String(i); if (u == null) null else u.toString
      }

    val qtype =
      if (rawQuery.startsWith("SELECT") || rawQuery.startsWith("select")) "SELECT"
      else if (rawQuery.startsWith("BEGIN BATCH") || rawQuery.startsWith("begin batch")) "BATCH"
      else if (rawQuery.startsWith("INSERT") || rawQuery.startsWith("insert")) "INSERT"
      else if (rawQuery.startsWith("DELETE") || rawQuery.startsWith("delete")) "DELETE"
      else if (rawQuery.startsWith("UPDATE") || rawQuery.startsWith("update")) "UPDATE"
      else return null // 'No processor available' -> row skip

    var query = rawQuery
    var bound = mutable.LinkedHashMap.empty[String, String]
    var keyspace: String = null
    var columnFamily: String = null
    var primaryKey: String = null

    if (qtype == "SELECT" || qtype == "INSERT" ||
        (enrichDml && (qtype == "DELETE" || qtype == "UPDATE"))) {
      if (bvStr != null) bound = parseBoundValues(bvStr)
      if (qtype == "SELECT" && patterns.nonEmpty) {
        patterns.find(p => query.startsWith(p.start)).foreach { p =>
          val (nq, pbv) = SlowQueryCatalog.normalize(query, p)
          query = nq
          pbv.foreach { case (k, v) => bound(k) = v } // dict.update
        }
      }
      // DELETE shares SELECT's " FROM <tbl> " shape; UPDATE names the
      // table immediately after the verb (CQL: UPDATE tbl SET ...)
      val table = qtype match {
        case "SELECT" => selectTable(query)
        case "DELETE" => selectTable(query)
        case "INSERT" => insertTable(rawQuery)
        case _        => updateTable(rawQuery)
      }
      if (table != null) {
        if (table.contains(".")) {
          // Python table.split('.') 2-tuple unpack: != 2 parts raises
          val parts = table.split("\\.", -1)
          if (parts.length != 2) return null
          keyspace = parts(0).toLowerCase
          columnFamily = parts(1).toLowerCase
        } else {
          columnFamily = table.toLowerCase
          keyspace = guessKeyspace(columnFamily, tags)
        }
      }
      if (bound.nonEmpty && truthy(keyspace) && truthy(columnFamily)) {
        primaryKey = pkIdx.get((keyspace, columnFamily)) match {
          case None => null // 'No schema for ks.cf' -> warn + None
          case Some(cols) =>
            cols.flatMap(bound.get).mkString("-") // missing components skipped
        }
      }
    }

    val keys = new GenericArrayData(bound.keys.map(UTF8String.fromString).toArray[Any])
    val vals = new GenericArrayData(bound.values.map(UTF8String.fromString).toArray[Any])
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(qtype),
      UTF8String.fromString(query),
      new ArrayBasedMapData(keys, vals),
      if (keyspace == null) null else UTF8String.fromString(keyspace),
      if (columnFamily == null) null else UTF8String.fromString(columnFamily),
      if (primaryKey == null) null else UTF8String.fromString(primaryKey)))
  }

  /** CF -> keyspace guess (analyze_slow_queries.py:527-551). */
  private def guessKeyspace(cf: String, tags: Seq[String]): String = {
    if (tagKs.nonEmpty &&
        (!cfKs.contains(cf) || cfKs(cf) == "unknown")) {
      tags.find(t => t != null && tagKs.contains(t)) match {
        case Some(t) => return tagKs(t)
        case None    => ()
      }
    }
    cfKs.getOrElse(cf, null)
  }

}

object SlowQueryCatalog {

  def truthy(s: String): Boolean = s != null && s.nonEmpty

  def strip(s: String, c: Char): String =
    s.dropWhile(_ == c).reverse.dropWhile(_ == c).reverse

  /** F8 normalization (analyze_slow_queries.py:860-886) — the ONE
    * implementation, shared by the fused expression and the
    * [[LogColumns.normalizePatterns]] UDF so the quirk semantics
    * (positional find, strip-space then first-of-space/comma/semicolon,
    * replace-ALL) can never drift between the two surfaces.
    */
  def normalize(query0: String, p: QueryPattern): (String, Seq[(String, String)]) = {
    var q = query0
    val bv = mutable.ArrayBuffer.empty[(String, String)]
    p.parameters.foreach { name =>
      val from = math.max(0, q.indexOf(name) + name.length)
      val eq = q.indexOf('=', math.min(from, q.length))
      val start = math.min(eq + 1, q.length)
      val temp = strip(q.substring(start), ' ')
      var end = temp.indexOf(' ')
      if (end == -1) end = temp.indexOf(',')
      if (end == -1) end = temp.indexOf(';')
      if (end != -1) {
        val value = temp.substring(0, end)
        q = q.replace(value, "?")
        bv += (name.toLowerCase -> strip(value, '\''))
      }
    }
    (q, bv.toSeq)
  }

  /** F1 (analyze_slow_queries.py:295-316). */
  def strSlice(s: String, before: String, after: String): String = {
    val start = s.indexOf(before)
    if (start == -1) return null
    val rest = s.substring(start + before.length)
    val end = rest.indexOf(after)
    if (end == -1) null else rest.substring(0, end)
  }

  /** F4 (analyze_slow_queries.py:674-694). */
  def selectTable(q: String): String = {
    var t = strSlice(q, " FROM ", " ")
    if (!truthy(t)) t = strSlice(q, " from ", " ")
    if (!truthy(t)) t = strSlice(q, " FROM ", ";")
    if (!truthy(t)) t = strSlice(q, " from ", ";")
    if (truthy(t)) t else null
  }

  /** F5 (analyze_slow_queries.py:754-769). */
  def insertTable(q: String): String = {
    var t = strSlice(q, "INSERT INTO ", " ")
    if (!truthy(t)) t = strSlice(q, "insert into ", " ")
    if (truthy(t)) t else null
  }

  /** UPDATE-statement table extraction — no reference counterpart
    * (the reference's TODO at analyze_slow_queries.py:57); built in
    * the F5 style: probe the cased then lowercase verb, table runs to
    * the next space (CQL: `UPDATE tbl [USING ...] SET ...`).
    */
  def updateTable(q: String): String = {
    var t = strSlice(q, "UPDATE ", " ")
    if (!truthy(t)) t = strSlice(q, "update ", " ")
    if (truthy(t)) t else null
  }

  /** F3 (analyze_slow_queries.py:454-476): strip ALL brackets, split
    * on ',', first-':' split, trim key spaces, strip ALL value quotes;
    * colon-less fragments dropped; duplicate keys last-wins.
    */
  def parseBoundValues(bvStr: String): mutable.LinkedHashMap[String, String] = {
    val cleaned = bvStr.replace("[", "").replace("]", "")
    val out = mutable.LinkedHashMap.empty[String, String]
    cleaned.split(",", -1).foreach { frag =>
      val i = frag.indexOf(':')
      if (i >= 0) {
        out(strip(frag.substring(0, i), ' ')) = strip(frag.substring(i + 1), '\'')
      }
    }
    out
  }
}

/** The fused enrichment expression: (raw_query, bound_values_str,
  * tags) -> struct(type, query, bound_values, keyspace,
  * column_family, primary_key), or null when the reference would have
  * skipped the row. One plan node; whole-stage codegen calls straight
  * into [[SlowQueryCatalog.enrichInternal]].
  */
case class EnrichSlowQuery(
    queryExpr: Expression,
    bvExpr: Expression,
    tagsExpr: Expression,
    catalog: SlowQueryCatalog) extends TernaryExpression {

  override def first: Expression = queryExpr
  override def second: Expression = bvExpr
  override def third: Expression = tagsExpr
  override def nullable: Boolean = true

  override def dataType: DataType = EnrichSlowQuery.schema

  override def eval(input: InternalRow): Any =
    catalog.enrichInternal(
      queryExpr.eval(input).asInstanceOf[UTF8String],
      bvExpr.eval(input).asInstanceOf[UTF8String],
      tagsExpr.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val catRef = ctx.addReferenceObj("catalog", catalog, classOf[SlowQueryCatalog].getName)
    val q = queryExpr.genCode(ctx)
    val b = bvExpr.genCode(ctx)
    val t = tagsExpr.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code =
      code"""
        |${q.code}
        |${b.code}
        |${t.code}
        |$rowCls ${ev.value} = $catRef.enrichInternal(
        |  ${q.isNull} ? null : ${q.value},
        |  ${b.isNull} ? null : ${b.value},
        |  ${t.isNull} ? null : ${t.value});
        |boolean ${ev.isNull} = ${ev.value} == null;
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): EnrichSlowQuery =
    copy(queryExpr = newFirst, bvExpr = newSecond, tagsExpr = newThird)

  override def prettyName: String = "enrich_slow_query"
}

object EnrichSlowQuery {
  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("query", StringType),
    StructField("bound_values", MapType(StringType, StringType)),
    StructField("keyspace", StringType),
    StructField("column_family", StringType),
    StructField("primary_key", StringType)))
}
