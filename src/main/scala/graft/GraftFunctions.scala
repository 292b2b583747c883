package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

import graft.ops.{CosineSimExpr, FingerprintExpr, HammingExpr,
  HashedShinglesExpr, LangPredictExpr, MinHashSignatureExpr, NgramsExpr,
  QualitySignalsExpr, RepetitionStatsExpr, RollingHashExpr, SimHash120Expr,
  SimHash60Expr, SortedIntersectCountExpr, TextOps, TokenCountExpr,
  WinnowExpr}
import graft.parse.LexSlowQuery

/** SQL-surface registration of graft's custom expressions, so
  * spark.sql users get the same operators as the DataFrame API:
  *
  *   SELECT lex_slow_query(message).duration, simhash60(text),
  *          minhash_signature(text), hashed_shingles(text) ...
  *
  * Two entry points: [[GraftExtensions]] for builder-time wiring
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`), and
  * [[GraftFunctions.register]] for an already-built session (the
  * driver-owned sessions of the Verify/Bench contract).
  */
object GraftFunctions {

  /** (name, builder) for every SQL-exposed graft expression. MinHash/
    * shingle arity is pinned to the library default n=3 shingles.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "lex_slow_query" -> (args => LexSlowQuery(args.head)),
    "simhash60" -> (args => SimHash60Expr(args.head)),
    "simhash120" -> (args => SimHash120Expr(args.head)),
    "minhash_signature" -> (args => MinHashSignatureExpr(args.head, 3)),
    "hashed_shingles" -> (args => HashedShinglesExpr(args.head, 3)),
    "cosine_sim" -> (args => CosineSimExpr(args.head, args(1))),
    "text_fingerprint" -> (args => FingerprintExpr(args.head)),
    "rolling_hash" -> (args => RollingHashExpr(args.head)),
    "token_count" -> (args => TokenCountExpr(args.head)),
    "lang_predict" -> (args => LangPredictExpr(args.head, TextOps.langMarkers)),
    "quality_signals" -> (args => QualitySignalsExpr(args.head, TextOps.stopwords)),
    // trigram default, matching the shingle arity above
    "ngrams" -> (args => NgramsExpr(args.head, 3, distinct = false)),
    "ngrams_distinct" -> (args => NgramsExpr(args.head, 3, distinct = true)),
    "repetition_stats" -> (args => RepetitionStatsExpr(args.head)),
    // byte-wise Hamming distance of two strings (fuzzy-linkage verify)
    "hamming_dist" -> (args => HammingExpr(
      Cast(args(0), StringType), Cast(args(1), StringType))),
    // winnowing fingerprint set, n=4 w=5 PINNED (extra args would
    // otherwise be silently ignored — fail loudly instead)
    "winnow" -> (args => {
      require(args.length == 1,
        "winnow(text) takes exactly 1 argument (n=4, w=5 are pinned)")
      WinnowExpr(Cast(args(0), StringType), 4, 5)
    }),
    // distinct-match count of two long arrays. The SQL surface sorts
    // both inputs (SortArray) so ad-hoc callers can't silently get an
    // undercount from unsorted arrays; internal hot paths call the
    // kernel directly on pre-sorted data and skip the re-sort.
    "sorted_intersect_count" -> (args => {
      require(args.length == 2, "sorted_intersect_count(a, b) takes 2 arrays")
      SortedIntersectCountExpr(
        new org.apache.spark.sql.catalyst.expressions.SortArray(
          Cast(args(0), ArrayType(LongType)), Literal(true)),
        new org.apache.spark.sql.catalyst.expressions.SortArray(
          Cast(args(1), ArrayType(LongType)), Literal(true)))
    }),
    // aggregate: k must be a foldable literal. The ord/payload casts
    // mirror the Scala wrapper (TopKAgg.topKBy): TopKByAgg.update
    // reads Long/UTF8String directly, so an uncast INT ord or
    // non-string payload from SQL would ClassCastException at runtime.
    "topk_by" -> (args => graft.ops.TopKByAgg(
      Cast(args(0), LongType), Cast(args(1), StringType),
      args(2).eval().asInstanceOf[Number].intValue())),
    // aggregate: Misra-Gries candidate keys, k must be foldable
    "misra_gries" -> (args => {
      require(args.length == 2, "misra_gries(key, k) takes 2 arguments")
      graft.ops.MisraGriesAgg(
        Cast(args(0), StringType),
        args(1).eval().asInstanceOf[Number].intValue())
    }))

  def register(spark: SparkSession): SparkSession = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // optimizer rules can't be injected into a built session through
    // extensions; experimentalMethods is the supported hook for that
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.FuseNgramsDistinct))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.FuseNgramsDistinct
    spark
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft", name),
          builder))
    }
    e.injectOptimizerRule(_ => graft.plans.FuseNgramsDistinct)
  }
}
