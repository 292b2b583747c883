package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding vocabulary learning — the tokenizer-
  * training step of an LLM data pipeline, re-expressed as iterative
  * Spark aggregation.
  *
  * Shape: the corpus collapses ONCE into a (word, count) table — the
  * only corpus-sized shuffle; at 100 TB this table is vocab-sized
  * (millions of rows), so every subsequent merge round runs on data
  * thousands of times smaller than the input. Each round is one
  * map-side-combinable pair-count aggregation plus a TakeOrdered(1)
  * for the argmax pair; only that single best-pair row ever reaches
  * the driver (the merge table IS the operator's output and is
  * dimension-sized by definition, like the IVF centroid set).
  *
  * Segmentations are carried as a separator-delimited STRING, not an
  * array: each token is wrapped in single U+001F separators, so
  * adjacent tokens a,b show the boundary pattern `‖a‖‖b‖`. Applying a
  * merge is then plain `replace(seg, ‖a‖‖b‖, ‖ab‖)` — and because SQL
  * `replace` substitutes left-to-right non-overlapping, it implements
  * BPE's greedy left-to-right merge semantics EXACTLY (for the a==b
  * run case `xxx`, the first match consumes its trailing separator so
  * the scan resumes at the third x: `[xx, x]`, as BPE requires). The
  * same replace exists byte-identically in DuckDB, which is what makes
  * the whole iterative algorithm oracle-checkable as generated SQL
  * (see [[oracleSql]]).
  *
  * Iterative-loop discipline (measured on connectedComponents): AQE
  * off inside the loop (re-planning cost dwarfs the tiny stages),
  * cache each round's segmentation, release the previous one a round
  * late, lineage cut by localCheckpoint every few rounds.
  */
object Bpe {

  val Sep = "\u001f"

  /** The learned merge table: one row per round —
    * (step, lhs, rhs, merged, pair_cnt), deterministic via the
    * (count desc, lhs, rhs) tie-break.
    */
  def learn(spark: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    // corpus -> weighted word table (the ONE corpus-sized shuffle),
    // then char-level initial segmentation ‖c1‖‖c2‖…
    // (?s) dotall: Java's bare '.' skips LF CR U+0085 U+2028 U+2029, while
    // RE2's (the oracle's) skips only \n — a token containing any of
    // them would segment DIFFERENTLY per engine. The separator char
    // itself is stripped from tokens first (on both sides): a literal
    // U+001F inside a token would corrupt the separator encoding
    // identically in both engines, invisible to the oracle.
    // Built and MATERIALIZED here, under the session's adaptive
    // settings: Zipf-skewed word keys are exactly what AQE skew
    // handling exists for. Only the tiny vocab-sized loop rounds run
    // with AQE off (per-round re-planning latency dominates there).
    val words0 = graft.Scratch.cache(docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("seg", regexp_replace(translate(col("word"), Sep, ""),
        "(?s)(.)", Sep + "$1" + Sep)))
    words0.count()
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try learnLoop(spark, words0, rounds)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  private def learnLoop(spark: SparkSession, words0: DataFrame,
      rounds: Int): DataFrame = {
    var words = words0
    var prev: DataFrame = null

    val merges = Seq.newBuilder[Row]
    var step = 1
    var done = false
    while (step <= rounds && !done) {
      val toks = split(trim(col("seg"), Sep), Sep + Sep)
      val pairs = words
        .select(col("cnt"), toks.as("tk"))
        .select(col("cnt"), explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1), i =>
            struct(element_at(col("tk"), i).as("a"),
              element_at(col("tk"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // exactly one row per round — the argmax pair
      if (pairs.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (pairs(0).getString(0), pairs(0).getString(1), pairs(0).getLong(2))
        merges += Row(step.toLong, a, b, a + b, cnt)
        // the collect above just materialized `words`, so the round-
        // older cache is now safe to release (one round late — its
        // child is materialized and won't recompute through it)
        if (prev != null) prev.unpersist()
        prev = words
        // plain literal replace — regexp-free, left-to-right
        val applied = words.withColumn("seg",
          replace(col("seg"), lit(Sep + a + Sep + Sep + b + Sep),
            lit(Sep + a + b + Sep)))
        words = graft.Scratch.cache(
          if (step % 3 == 0) graft.Scratch.localCheckpoint(applied)
          else applied)
        step += 1
      }
    }

    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_cnt", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1), schema)
      .orderBy(col("step"))
  }

  /** ENCODE with a learned vocabulary — the apply side of BPE, the
    * op a pipeline actually runs over the full 100 TB once training
    * tokenization is fixed. Shape: the merge table is rounds-sized on
    * the driver (like the IVF centroid set); segmentation + merge
    * application runs on the DISTINCT word table (vocab-sized, not
    * corpus-sized); the per-doc pass is one explode feeding a
    * broadcast join against the vocab and a map-side-combinable sum.
    * Output: (id, words, bpe_tokens) per doc.
    */
  /** (word -> BPE token count) vocabulary table for the `rounds`-
    * round learned merges — the shared apply side of [[encode]] and
    * [[fertility]]. Vocabulary-sized; broadcasts to the corpus join.
    */
  private def vocabNTok(spark: SparkSession, docs: DataFrame,
      textCol: String, rounds: Int): DataFrame = {
    val m = learn(spark, docs, textCol, rounds).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word")).distinct()
      .withColumn("seg", regexp_replace(translate(col("word"), Sep, ""),
        "(?s)(.)", Sep + "$1" + Sep))
    m.foldLeft(words) { case (df, (a, b)) =>
      df.withColumn("seg", replace(col("seg"),
        lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)))
    }
      .withColumn("n_tok", size(split(trim(col("seg"), Sep), Sep + Sep)))
      .select(col("word"), col("n_tok"))
  }

  def encode(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, rounds: Int): DataFrame = {
    val seged = vocabNTok(spark, docs, textCol, rounds)
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(broadcast(seged), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("words"), sum(col("n_tok")).as("bpe_tokens"))
  }

  /** Tokenizer fertility by group (the "how many BPE tokens does a
    * word cost in each language" table that drives per-language token
    * budgets): permille ratio of BPE tokens to whitespace words under
    * the corpus-learned `rounds`-round vocabulary. Same plan shape as
    * [[encode]] — the corpus meets only a broadcast vocabulary.
    */
  def fertility(spark: SparkSession, docs: DataFrame, groupCol: String,
      textCol: String, rounds: Int): DataFrame = {
    val seged = vocabNTok(spark, docs, textCol, rounds)
    docs.select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(broadcast(seged), Seq("word"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("words"), sum(col("n_tok")).as("bpe_tokens"))
      .withColumn("fertility_permille",
        expr("(bpe_tokens * 1000) DIV words"))
  }

  /** Generated DuckDB oracle: the merge rounds UNROLLED as a CTE
    * chain — pair counts, argmax pair, replace-apply — using the same
    * separator encoding, the same md5-free integer arithmetic, and
    * the same (cnt desc, a, b) tie-break, so the driver hash-checks
    * the full iterative algorithm, not just one round.
    */
  def oracleSql(toksSql: String, rounds: Int): String = {
    val sep = "chr(31)"
    val rnds = (1 to rounds).map { r =>
      s"""t$r AS (SELECT cnt, string_split(trim(seg, $sep), $sep||$sep) AS tk
         |  FROM w${r - 1}),
         |p$r AS (SELECT pr[1] AS a, pr[2] AS b,
         |   CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT cnt, unnest(list_transform(
         |    generate_series(1, len(tk) - 1), i -> [tk[i], tk[i+1]])) AS pr
         |   FROM t$r) GROUP BY 1, 2),
         |b$r AS (SELECT a, b, pair_cnt FROM p$r
         |  ORDER BY pair_cnt DESC, a, b LIMIT 1),
         |w$r AS (SELECT word, cnt, replace(seg,
         |   $sep||b.a||$sep||$sep||b.b||$sep, $sep||b.a||b.b||$sep) AS seg
         |  FROM w${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS step, a AS lhs, b AS rhs, a || b AS merged, pair_cnt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       | SELECT t AS word, count(*) AS cnt,
       |  regexp_replace(replace(t, $sep, ''), '(?s)(.)', $sep||'\\1'||$sep, 'g') AS seg
       | FROM (SELECT unnest($toksSql) AS t FROM documents) GROUP BY t),
       |$rnds
       |$sel
       |ORDER BY step""".stripMargin
  }

  /** Generated DuckDB oracle for [[encode]]: the same learned-merge
    * CTE chain as [[oracleSql]], then the final segmented word table
    * joined back to per-doc tokens and summed.
    */
  def encodeOracleSql(toksSql: String, rounds: Int): String = {
    val sep = "chr(31)"
    val rnds = (1 to rounds).map { r =>
      s"""t$r AS (SELECT cnt, string_split(trim(seg, $sep), $sep||$sep) AS tk
         |  FROM w${r - 1}),
         |p$r AS (SELECT pr[1] AS a, pr[2] AS b,
         |   CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT cnt, unnest(list_transform(
         |    generate_series(1, len(tk) - 1), i -> [tk[i], tk[i+1]])) AS pr
         |   FROM t$r) GROUP BY 1, 2),
         |b$r AS (SELECT a, b, pair_cnt FROM p$r
         |  ORDER BY pair_cnt DESC, a, b LIMIT 1),
         |w$r AS (SELECT word, cnt, replace(seg,
         |   $sep||b.a||$sep||$sep||b.b||$sep, $sep||b.a||b.b||$sep) AS seg
         |  FROM w${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       | SELECT t AS word, count(*) AS cnt,
       |  regexp_replace(replace(t, $sep, ''), '(?s)(.)', $sep||'\\1'||$sep, 'g') AS seg
       | FROM (SELECT unnest($toksSql) AS t FROM documents) GROUP BY t),
       |$rnds,
       |vocab AS (
       | SELECT word,
       |  len(string_split(trim(seg, $sep), $sep||$sep)) AS n_tok
       | FROM w$rounds),
       |dt AS (
       | SELECT doc_id, unnest($toksSql) AS word FROM documents)
       |SELECT doc_id, count(*) AS words,
       | CAST(sum(n_tok) AS BIGINT) AS bpe_tokens
       |FROM dt JOIN vocab USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Generated DuckDB oracle for [[fertility]]: the [[encodeOracleSql]]
    * merge chain + vocabulary, aggregated per group column instead of
    * per doc.
    */
  def fertilityOracleSql(toksSql: String, groupCol: String,
      rounds: Int): String = {
    val base = encodeOracleSql(toksSql, rounds)
    val cut = base.indexOf("dt AS (")
    base.substring(0, cut) +
      s"""dt AS (
         | SELECT $groupCol, unnest($toksSql) AS word FROM documents)
         |SELECT $groupCol, count(*) AS words,
         | CAST(sum(n_tok) AS BIGINT) AS bpe_tokens,
         | CAST(sum(n_tok) * 1000 // count(*) AS BIGINT) AS fertility_permille
         |FROM dt JOIN vocab USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
