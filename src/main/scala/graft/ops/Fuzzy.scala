package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width fuzzy record linkage — the approximate-string-join
  * modality (typo'd titles, normalized names, malformed IDs) that the
  * sketch-based near-dup family (MinHash/SimHash) does not cover:
  * those need enough tokens/shingles to sketch, while linkage keys
  * are a few dozen characters.
  *
  * Semantics: each row derives a normalized fixed-width key (lowered,
  * non-alphanumerics stripped, truncated/right-padded to `width`);
  * pairs whose keys differ in at most `k` character POSITIONS
  * (Hamming distance, exact) are emitted, annotated with both the
  * Hamming and Levenshtein distances of their keys.
  *
  * Candidate generation is the pigeonhole principle on character
  * segments (the SimHash band trick applied to raw characters): split
  * the key into k+1 contiguous segments — any pair at Hamming
  * distance <= k has all k mismatches inside at most k segments, so
  * the pair MUST agree exactly on at least one segment, at the same
  * position. Candidates are per-(segment index, segment value) bucket
  * self-joins; recall is 100% by construction for the Hamming
  * predicate. Exactly-once emission via the first-shared-segment
  * filter (the minhashPairs trick).
  *
  * 100 TB posture: no all-pairs — candidates are equi-join buckets
  * keyed by (position, 8-char value); the verify is 24 codegen'd
  * char compares, no UDF. Hot buckets (a very common normalized
  * prefix, or many empty keys) are the residual hazard: the triangle
  * split used by the SimHash scans (ops/Dedup.scala trianglePairs)
  * is the escalation if a corpus concentrates key segments.
  */
object Fuzzy {

  /** Normalized fixed-width linkage key. */
  def linkKey(text: Column, width: Int): Column =
    rpad(substring(regexp_replace(lower(text), "[^a-z0-9 ]", ""), 1, width),
      width, "#")

  /** Exact Hamming distance as an unrolled per-char Column formula —
    * the DIFFERENTIAL form (kept for tests): measured at sf0.1, 24
    * substring compares stacked with the first-shared-segment
    * when-chain in one filter stage degrade the generated code ~8x
    * (non-additive; each alone is fast), which is exactly the failure
    * mode the fused kernels exist for.
    */
  def hammingDistUnrolled(a: Column, b: Column, width: Int): Column =
    (1 to width).map(i =>
      (substring(a, i, 1) =!= substring(b, i, 1)).cast("long")).reduce(_ + _)

  /** Exact Hamming distance, fused byte-loop kernel (keys are ASCII
    * by construction of [[linkKey]], so byte compare == char
    * compare); length difference counts as mismatches.
    */
  def hammingDist(a: Column, b: Column): Column =
    ColumnBridge.column(HammingExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def segBounds(width: Int, k: Int): Seq[(Int, Int)] = {
    val base = width / (k + 1)
    (0 to k).map { s =>
      val start = s * base + 1
      val len = if (s == k) width - s * base else base
      (start, len)
    }
  }

  /** All pairs whose normalized keys are within Hamming distance `k`,
    * with key Hamming + Levenshtein distances attached.
    * Output: (id_a, id_b, hd, ld), id_a < id_b.
    */
  def fuzzyKeyPairs(df: DataFrame, idCol: String, textCol: String,
      width: Int, k: Int): DataFrame = {
    // width < k+1 would make base = 0: the first k segments become
    // empty strings shared by EVERY row, and the segment equi-join
    // degenerates to the all-pairs cross product the pigeonhole
    // blocking exists to prevent (still correct, scale destroyed)
    require(width >= k + 1,
      s"key width ($width) must be at least k+1 (${k + 1}) so every " +
        "pigeonhole segment is non-empty")
    val bounds = segBounds(width, k)
    def seg(key: Column, s: Int): Column = {
      val (start, len) = bounds(s)
      substring(key, start, len)
    }
    // null text would diverge from a SQL brute-force oracle (a NULL
    // key's char compares are NULL -> a DuckDB list_filter counts 0
    // mismatches and emits the pair; Spark's null equi-join key drops
    // it) — exclude null keys as part of the operator's contract
    val keyed = graft.Scratch.cache(df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), linkKey(col(textCol), width).as("key")))
    val ea = keyed.select(col("id").as("id_a"), col("key").as("key_a"),
      posexplode(array(bounds.indices.map(s => seg(col("key"), s)): _*))
        .as(Seq("si", "sv")))
    val eb = keyed.select(col("id").as("id_b"), col("key").as("key_b"),
      posexplode(array(bounds.indices.map(s => seg(col("key"), s)): _*))
        .as(Seq("si", "sv")))
    // first shared segment: emit each candidate pair exactly once
    val firstShared = bounds.indices.foldRight(lit(-1): Column) { (s, els) =>
      when(seg(col("key_a"), s) === seg(col("key_b"), s), lit(s)).otherwise(els)
    }
    ea.join(eb, Seq("si", "sv"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("si") === firstShared)
      .withColumn("hd", hammingDist(col("key_a"), col("key_b")))
      .filter(col("hd") <= k)
      .select(col("id_a"), col("id_b"), col("hd"),
        levenshtein(col("key_a"), col("key_b")).cast("long").as("ld"))
  }
}

/** Static kernel for [[HammingExpr]] — byte loop over UTF8String
  * contents (exact for the ASCII keys [[Fuzzy.linkKey]] produces);
  * a length difference counts one mismatch per extra byte.
  */
object FuzzyKernels {
  def hammingEval(a: UTF8String, b: UTF8String): Long = {
    val ba = a.getBytes
    val bb = b.getBytes
    val n = math.min(ba.length, bb.length)
    var d = math.abs(ba.length - bb.length).toLong
    var i = 0
    while (i < n) {
      if (ba(i) != bb(i)) d += 1
      i += 1
    }
    d
  }
}

/** Fused byte-wise Hamming distance (see [[Fuzzy.hammingDist]]). */
case class HammingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyKernels.hammingEval(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.FuzzyKernels.hammingEval($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HammingExpr = copy(left = l, right = r)
  override def prettyName: String = "hamming_dist"
}
