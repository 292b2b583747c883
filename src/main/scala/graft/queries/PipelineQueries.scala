package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{BloomExpressions, TextOps}

/** Round-4 training-data-pipeline operators: corpus curation steps a
  * pretraining data job runs AFTER dedup — domain capping, repetition
  * filtering (Gopher rules), corpus n-gram/vocabulary statistics,
  * n-gram decontamination with a broadcast-bloom prune, deterministic
  * resharding, and curriculum length bucketing.
  *
  * Same oracle discipline as OpsQueries: md5-derived hashes, integer
  * thresholds, explicit CASTs to Spark's result types.
  */
object PipelineQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** whitespace tokens, empties dropped (mirror of TextOps.tokens) */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** DuckDB equivalent of TextOps.hash32 */
  private def h32(e: String) = s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  def all: Map[String, Q] = Map(

    // Domain capping: at most N docs per source, best-first — the
    // anti-over-representation step (a single crawl domain must not
    // dominate the corpus). One shuffle on the key; rank-N windows are
    // the right scale shape because N is small by definition.
    "q70_domain_cap" -> Q(
      (s, dir) => TextOps.capPerKey(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), Seq(col("n_chars").desc, col("doc_id").asc), n = 3)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk"))
        .orderBy(col("source"), col("rk")),
      Some(
        """SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk FROM (
          | SELECT doc_id, source, n_chars,
          |  row_number() OVER (PARTITION BY source
          |    ORDER BY n_chars DESC, doc_id) AS rk
          | FROM documents) WHERE rk <= 3 ORDER BY source, rk""".stripMargin)),

    // Gopher-style repetition filter signals, integer-exact: the
    // most-common-token count and duplicate-bigram count per doc (one
    // fused pass per row — the HOF form is quadratic and stays a
    // differential test). is_repetitive pins the >20% rule as an
    // integer comparison.
    "q71_repetition" -> Q(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          col("r.top_tok_cnt").as("top_tok_cnt"),
          col("r.n_bigrams").as("n_bigrams"),
          col("r.n_dup_bigrams").as("n_dup_bigrams"))
        .withColumn("is_repetitive", col("top_tok_cnt") * 5 > col("n_tokens"))
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
           |r AS (SELECT doc_id,
           | CAST(len(t) AS INTEGER) AS n_tokens,
           | CAST(list_aggregate(list_transform(list_distinct(t),
           |   x -> len(list_filter(t, y -> y = x))), 'max') AS INTEGER) AS top_tok_cnt,
           | CAST(greatest(len(t) - 1, 0) AS INTEGER) AS n_bigrams,
           | CAST(greatest(len(t) - 1, 0) - len(list_distinct(
           |   list_transform(generate_series(1, len(t) - 1),
           |    i -> t[i] || ' ' || t[i+1]))) AS INTEGER) AS n_dup_bigrams
           | FROM tk)
           |SELECT doc_id, n_tokens, top_tok_cnt, n_bigrams, n_dup_bigrams,
           | top_tok_cnt * 5 > n_tokens AS is_repetitive
           |FROM r ORDER BY doc_id""".stripMargin)),

    // Corpus-wide most-frequent trigrams: explode KEEPING duplicates
    // (counting form of the shingle fan-out), partial-agg count, global
    // top-100 via TakeOrderedAndProject — never a full sort.
    "q72_top_ngrams" -> Q(
      (s, dir) => t(s, dir, "documents")
        .select(explode(TextOps.ngrams(col("text"), 3)).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram")).limit(100),
      Some(
        s"""WITH g AS (
           | SELECT unnest(list_transform(generate_series(1, len(t) - 2),
           |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
           | FROM (SELECT $toksSql AS t FROM documents))
           |SELECT gram, count(*) AS cnt FROM g GROUP BY gram
           |ORDER BY cnt DESC, gram LIMIT 100""".stripMargin)),

    // Vocabulary Zipf profile: top-50 tokens with rank, cumulative
    // count, and ppm coverage of the whole token stream. The global
    // window runs over the LIMIT-50 result only (50 rows on one
    // reducer — never the vocabulary); the stream total is one
    // map-side-combinable scalar agg.
    "q73_zipf" -> Q(
      (s, dir) => {
        val counts = t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        val total = counts.agg(sum(col("cnt"))).head().getLong(0)
        // the LIMIT-50 above IS the scale guard here (the window can
        // never see more than 50 rows); the marker partition records
        // that as a deliberate one-partition choice in-plan (column-
        // derived so the optimizer can't fold it away — Prefix
        // .markerZero scaladoc)
        val rankW = Window.partitionBy(col("_p"))
          .orderBy(col("cnt").desc, col("token"))
        counts.orderBy(col("cnt").desc, col("token")).limit(50)
          .withColumn("_p", graft.ops.Prefix.markerZero(col("cnt")))
          .withColumn("rank", row_number().over(rankW))
          .withColumn("cum_cnt", sum(col("cnt")).over(
            rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("ppm", expr(s"cum_cnt * 1000000 DIV ${total}L"))
          .drop("_p")
          .orderBy(col("rank"))
      },
      Some(
        s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
           |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
           |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 50)
           |SELECT token, cnt,
           | CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank,
           | CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
           |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
           | CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
           |   ROWS UNBOUNDED PRECEDING) * 1000000 // total AS BIGINT) AS ppm
           |FROM top, tot ORDER BY rank""".stripMargin)),

    // n-gram decontamination (the GPT-3/PaLM rule): train docs sharing
    // any 8-gram with the test corpus, with per-doc hit counts. The
    // test side's distinct 8-grams build a broadcast BLOOM that prunes
    // the train-side gram stream in the scan stage (map-side, no
    // shuffle); survivors are exact-verified by a broadcast semi-join,
    // so the result is exactly the IN-subquery's — bloom false
    // positives cannot leak (see BloomExpressions scaladoc).
    "q74_ngram_decontam" -> Q(
      (s, dir) => {
        val grams = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.ngramsDistinct(col("text"), 8)).as("gram"))
        val test = graft.Scratch.cache(grams
          .filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(col("gram")).distinct())
        // bloom keys are xxhash64 — Spark-internal only (build and
        // probe use the same fn; the ORACLE-visible comparison is the
        // exact semi-join on gram strings), so no md5 portability tax
        val nTest = test.count()
        val bloom = BloomExpressions.buildLongBloom(test,
          xxhash64(col("gram")), expectedItems = nTest)
        grams.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .filter(BloomExpressions.mightContain(
            xxhash64(col("gram")), bloom))
          // test is corpus-derived → broadcast only under the gate
          // (the count is already paid for by the bloom sizing)
          .join(graft.ops.Hints.broadcastIfSmall(test, nTest),
            Seq("gram"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(
           |  list_transform(generate_series(1, len(t) - 7),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           |    || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
           |    || ' ' || t[i+7]))) AS gram FROM tk),
           |te AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
           |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 0)
           |SELECT doc_id, count(*) AS n_hits FROM tr
           |WHERE gram IN (SELECT gram FROM te)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Deterministic reshard — the training-data "global shuffle"
    // without random(): salted-hash shard assignment + an independent
    // salted-hash intra-shard order, reproducible across engines and
    // cluster layouts. One shuffle; per-shard rank windows.
    "q75_reshard" -> Q(
      (s, dir) => TextOps.reshard(
        t(s, dir, "documents").select(col("doc_id")), "doc_id",
        nShards = 16, salt = "epoch1")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos")),
      Some(
        s"""WITH s AS (SELECT doc_id,
           |  ${h32("CAST(doc_id AS VARCHAR) || '_epoch1_shard'")} % 16 AS shard,
           |  ${h32("CAST(doc_id AS VARCHAR) || '_epoch1_pos'")} AS pk
           | FROM documents)
           |SELECT doc_id, shard,
           | CAST(row_number() OVER (PARTITION BY shard
           |   ORDER BY pk, doc_id) AS INTEGER) AS pos
           |FROM s ORDER BY shard, pos""".stripMargin)),

    // Dataset card: the per-source summary a curation job publishes —
    // doc/token totals, language spread, repetitive-doc and
    // exact-dup-doc counts. One pass computes every per-doc signal
    // (fused kernels), then two key-shuffles (per-source agg;
    // per-(source, fingerprint) dup counting).
    "q77_data_card" -> Q(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("lang"),
          col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("toks"),
          TextOps.repetitionStats(col("text")).as("r"),
          TextOps.fingerprint(col("text")).as("fp"))
          .withColumn("rep",
            when(col("r.top_tok_cnt") * 5 > col("r.n_tokens"), 1L)
              .otherwise(0L))
        val stats = d.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("rep")).as("n_repetitive"))
        val dups = d.groupBy(col("source"), col("fp"))
          .agg((count(lit(1)) - 1).as("extra"))
          .groupBy(col("source")).agg(sum(col("extra")).as("n_dup_docs"))
        stats.join(dups, Seq("source")).orderBy(col("source"))
      },
      Some(
        s"""WITH d AS (SELECT source, lang, doc_id,
           |  CAST(len($toksSql) AS BIGINT) AS toks,
           |  list_aggregate(list_transform(list_distinct($toksSql),
           |    x -> len(list_filter($toksSql, y -> y = x))), 'max') AS top_cnt,
           |  len($toksSql) AS n_toks,
           |  md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
           | FROM documents),
           |st AS (SELECT source, count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS n_tokens,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |  CAST(sum(CASE WHEN top_cnt * 5 > n_toks THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_repetitive
           | FROM d GROUP BY source),
           |du AS (SELECT source, CAST(sum(c - 1) AS BIGINT) AS n_dup_docs
           | FROM (SELECT source, fp, count(*) AS c FROM d GROUP BY 1, 2)
           | GROUP BY source)
           |SELECT st.source, n_docs, n_tokens, n_langs, n_repetitive,
           |  n_dup_docs
           |FROM st JOIN du USING (source) ORDER BY source""".stripMargin)),

    // Deterministic token-budget subsample via DISTRIBUTED PREFIX SUM
    // (contiguous hash-range buckets -> per-bucket totals -> driver
    // prefix offsets -> per-bucket windowed cumsum, over-budget
    // buckets pruned before the window) — the scale-safe form of the
    // global running total the oracle computes with one big window.
    "q79_token_budget" -> Q(
      (s, dir) => TextOps.tokenBudgetSample(t(s, dir, "documents"),
        "doc_id", "text", budget = 10000L, salt = "b1")
        .orderBy(col("cum_tokens"), col("doc_id")),
      Some(
        s"""WITH s AS (SELECT doc_id,
           |  CAST(len($toksSql) AS BIGINT) AS toks,
           |  ${h32("CAST(doc_id AS VARCHAR) || '_b1'")} AS h
           | FROM documents),
           |c AS (SELECT doc_id, toks,
           |  CAST(sum(toks) OVER (ORDER BY h, doc_id
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           | FROM s)
           |SELECT doc_id, toks, cum_tokens FROM c
           |WHERE cum_tokens <= 10000
           |ORDER BY cum_tokens, doc_id""".stripMargin)),

    // Incremental ("seen-before") dedup — the production append path:
    // an arriving BATCH (odd ids) is checked against the existing
    // corpus LEDGER (even ids) with the cross-corpus MinHash band join
    // (never a self-join), and every batch doc gets a VERDICT: is_new,
    // or dup_of = the smallest matching ledger doc. Differs from q68
    // (which emits the pair list): this is the per-doc admission
    // decision an ingest job acts on. The oracle recomputes verdicts
    // from the brute-force shared-band pair set.
    "q78_incremental_dedup" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val ledger = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        val pairs = graft.ops.Dedup.crossMinhashPairs(ledger, batch,
          "doc_id", "text", n = 3, bands = 4, rows = 4, num = 1, den = 2)
        val dupOf = pairs.groupBy(col("id_b"))
          .agg(min(col("id_a")).as("dup_of"))
        batch.select(col("doc_id"))
          .join(dupOf.withColumnRenamed("id_b", "doc_id"), Seq("doc_id"), "left")
          .withColumn("is_new", col("dup_of").isNull)
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |p AS (
           | SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END AS lid,
           |        CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS bid
           | FROM chk
           | WHERE (id_a % 2) <> (id_b % 2) AND i_cnt * 2 >= u_cnt),
           |v AS (SELECT bid, min(lid) AS dup_of FROM p GROUP BY bid)
           |SELECT d.doc_id, v.dup_of, v.dup_of IS NULL AS is_new
           |FROM documents d LEFT JOIN v ON v.bid = d.doc_id
           |WHERE d.doc_id % 2 = 1
           |ORDER BY d.doc_id""".stripMargin)),

    // q74's decontamination as a STREAM: train docs arrive in
    // file-stream micro-batches and are checked against the static
    // test-gram table via a stream-static left-semi join (static side
    // loaded once, probed per batch). The oracle is the same exact
    // IN-subquery as q74 — streaming the corpus must not change one
    // verdict.
    "q80_streaming_decontam" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val test = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(explode(TextOps.ngramsDistinct(col("text"), 8)).as("gram"))
          .distinct()
        val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), col("text"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dc")
        train.write.mode("overwrite").parquet(tmp.toString)
        val stream = s.readStream.schema(train.schema)
          .option("maxFilesPerTrigger", 8) // force >1 micro-batch
          .parquet(tmp.toString)
        val qn = "graft_stream_dc_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val query = graft.streaming.StreamingAnalyzer
          .decontaminateStream(stream, "doc_id", "text", test, n = 8)
          .writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
          .format("memory")
          .queryName(qn)
          .start()
        try { query.processAllAvailable() } finally { query.stop() }
        s.table(qn).orderBy(col("doc_id"))
      },
      Some(
        s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(
           |  list_transform(generate_series(1, len(t) - 7),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           |    || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
           |    || ' ' || t[i+7]))) AS gram FROM tk),
           |te AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
           |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 0)
           |SELECT doc_id, count(*) AS n_hits FROM tr
           |WHERE gram IN (SELECT gram FROM te)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Dedup KEEP policy by quality: real pipelines keep the BEST copy
    // per near-dup cluster, not the lowest id — clusters (q60's
    // operator) joined with the q21 integer quality score, argmax per
    // cluster with min-id ties. Oracle: recursive-closure clusters +
    // the same score formula + the same window.
    "q82_dedup_keep_best" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = graft.ops.Dedup.dedupClusters(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("doc_id"), col("cluster"))
        val scored = docs.select(col("doc_id"),
          TextOps.qualitySignals(col("text")).as("q"))
          .select(col("doc_id"),
            (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
              when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("score").desc, col("doc_id").asc)
        clusters.join(scored, Seq("doc_id"))
          .withColumn("keep", row_number().over(w) === 1)
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH RECURSIVE ${OpsQueries.minhashCtes},
           |pairs AS (
           | SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM documents
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |comp AS (
           | SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
           |sc AS (
           | SELECT doc_id,
           |  CAST(len(list_intersect(list_distinct($toksSql),
           |    ['the','a','of','and','to','in','is'])) * 3
           |   + len(list_distinct($toksSql)) * 2
           |   - (CASE WHEN list_aggregate(list_transform($toksSql,
           |       t -> length(t)), 'max') > 12 THEN 5 ELSE 0 END)
           |   AS INTEGER) AS score
           | FROM documents)
           |SELECT c.doc_id, c.cluster, sc.score,
           | row_number() OVER (PARTITION BY c.cluster
           |   ORDER BY sc.score DESC, c.doc_id) = 1 AS keep
           |FROM comp c JOIN sc ON sc.doc_id = c.doc_id
           |ORDER BY c.doc_id""".stripMargin)),

    // MinHash estimator diagnostics: for each verified near-dup pair,
    // the signature-agreement estimate (matching positions of the
    // 16-slot signature — the textbook Jaccard estimator) next to the
    // exact intersect/union counts, so sketch accuracy is measurable
    // in-engine. All integers; the estimator unrolls to 16 codegen'd
    // comparisons.
    "q83_minhash_estimate" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sigs = docs.select(col("doc_id"),
          graft.ops.SketchExpressions.minhashSignature(col("text"), 3).as("sig"))
        val pairs = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
        val est = (1 to 16).map(i =>
          when(element_at(col("sig_a"), i) === element_at(col("sig_b"), i), 1)
            .otherwise(0)).reduce(_ + _)
        pairs
          .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
            Seq("id_a"))
          .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("i_cnt"), col("u_cnt"),
            est.as("est_match"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val estSql = (1 to 16).map(i =>
          s"(CASE WHEN sa.sig[$i] = sb.sig[$i] THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH ${OpsQueries.minhashCtes},
           |p AS (
           | SELECT id_a, id_b, i_cnt, u_cnt FROM chk
           | WHERE i_cnt * 2 >= u_cnt)
           |SELECT p.id_a, p.id_b, p.i_cnt, p.u_cnt,
           | CAST($estSql AS INTEGER) AS est_match
           |FROM p
           |JOIN sig sa ON sa.id = p.id_a
           |JOIN sig sb ON sb.id = p.id_b
           |ORDER BY p.id_a, p.id_b""".stripMargin
      }),

    // Column profile (ANALYZE-style table statistics) in ONE pass —
    // row count, per-column null counts, exact distinct cardinalities,
    // numeric min/max — the stats a catalog publishes and a curation
    // job sanity-checks before/after every transform. Single
    // map-side-combinable aggregate over the full scan (the distincts
    // expand, but per-column, never row x column).
    "q84_column_profile" -> Q(
      (s, dir) => t(s, dir, "events").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("null_type"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        (floor(min(col("value")) * 1000)).cast("long").as("min_value_milli"),
        (floor(max(col("value")) * 1000)).cast("long").as("max_value_milli")),
      Some(
        """SELECT count(*) AS n_rows,
          | CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
          | CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_type,
          | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
          | min(event_id) AS min_id, max(event_id) AS max_id,
          | CAST(floor(min(value) * 1000) AS BIGINT) AS min_value_milli,
          | CAST(floor(max(value) * 1000) AS BIGINT) AS max_value_milli
          |FROM events""".stripMargin)),

    // Curriculum length-bucketing: docs binned by token count into
    // doubling buckets, with per-bucket doc/token totals and the
    // cumulative token budget in bucket order (the window runs over
    // <= 6 bucket rows, not data).
    "q76_length_buckets" -> Q(
      (s, dir) => {
        val bucketed = t(s, dir, "documents")
          .select(TextOps.tokenCount(col("text")).cast("long").as("toks"))
          .withColumn("bucket",
            when(col("toks") < 16, 0).when(col("toks") < 32, 1)
              .when(col("toks") < 64, 2).when(col("toks") < 128, 3)
              .when(col("toks") < 256, 4).otherwise(5).cast("long"))
        graft.ops.Prefix.cumSum(
          graft.Scratch.cache(bucketed.groupBy(col("bucket")).agg(
            count(lit(1)).as("n_docs"),
            sum(col("toks")).as("sum_tokens"),
            min(col("toks")).as("min_tokens"),
            max(col("toks")).as("max_tokens"))),
          "bucket", col("sum_tokens"), "cum_tokens")
          .orderBy(col("bucket"))
      },
      Some(
        s"""WITH b AS (SELECT CASE
           |  WHEN len(t) < 16 THEN 0 WHEN len(t) < 32 THEN 1
           |  WHEN len(t) < 64 THEN 2 WHEN len(t) < 128 THEN 3
           |  WHEN len(t) < 256 THEN 4 ELSE 5 END::BIGINT AS bucket,
           |  len(t)::BIGINT AS toks
           | FROM (SELECT $toksSql AS t FROM documents)),
           |a AS (SELECT bucket, count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS sum_tokens,
           |  min(toks) AS min_tokens, max(toks) AS max_tokens
           | FROM b GROUP BY bucket)
           |SELECT bucket, n_docs, sum_tokens, min_tokens, max_tokens,
           | CAST(sum(sum_tokens) OVER (ORDER BY bucket
           |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
           |FROM a ORDER BY bucket""".stripMargin)),

    // Temperature-flattened source mixture (alpha = 1/2): per-source
    // doc counts, the integer sampling denominator isqrt(n), and the
    // surviving count under the deterministic hash32(id) % isqrt(n)
    // == 0 rule. The oracle re-derives the SAME doc-level verdicts
    // (same md5 hash, same integer isqrt), so the hash match proves
    // the sample is engine-independent — the property that makes a
    // mixture resumable mid-training. See TextOps.temperatureSample.
    "q87_mixture_sample" -> Q(
      (s, dir) => TextOps.temperatureSample(
        t(s, dir, "documents"), col("doc_id"), col("source"))
        .groupBy(col("src").as("source"), col("n_docs"), col("samp_den"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("source")),
      Some(
        """WITH c AS (SELECT source, count(*) AS n_docs
          |  FROM documents GROUP BY 1),
          |s AS (SELECT source, n_docs,
          |  CAST(floor(sqrt(n_docs)) AS BIGINT) AS r0 FROM c),
          |s2 AS (SELECT source, n_docs,
          |  CASE WHEN r0*r0 > n_docs THEN r0 - 1
          |       WHEN (r0+1)*(r0+1) <= n_docs THEN r0 + 1
          |       ELSE r0 END AS samp_den FROM s)
          |SELECT d.source, n_docs, samp_den, count(*) AS n_sampled
          |FROM documents d JOIN s2 USING (source)
          |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          |  % samp_den = 0
          |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    // Distributed BPE vocabulary learning: 8 merge rounds over the
    // corpus word table. The oracle unrolls the same iterative
    // algorithm as a generated CTE chain (same separator-string
    // segmentation, same left-to-right replace semantics, same
    // tie-break), so the hash match covers every round's pair counts
    // AND argmax choice end-to-end. See ops/Bpe.scala.
    "q88_bpe_learn" -> Q(
      (s, dir) => graft.ops.Bpe.learn(s, t(s, dir, "documents"),
        "text", rounds = 8),
      Some(graft.ops.Bpe.oracleSql(toksSql, rounds = 8))),

    // Passage-level dedup: 16-token non-overlapping passages, each
    // surviving only at its first global (doc, position) occurrence;
    // docs rebuilt from survivors. The sub-document complement of q22
    // — what the dedup papers apply when whole-doc dedup leaves
    // boilerplate recurring inside otherwise-unique pages.
    "q91_passage_dedup" -> Q(
      (s, dir) => TextOps.passageDedup(
        t(s, dir, "documents"), "doc_id", "text", chunk = 16)
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tk AS (
           | SELECT doc_id, $toksSql AS t FROM documents
           | WHERE len($toksSql) > 0),
           |ch AS (
           | SELECT doc_id, CAST(s // 16 AS INTEGER) AS chunk_idx,
           |  array_to_string(list_slice(t, s + 1, s + 16), ' ') AS chunk_text
           | FROM (SELECT doc_id, t,
           |        unnest(generate_series(0, len(t) - 1, 16)) AS s FROM tk)),
           |rk AS (
           | SELECT *, row_number() OVER (PARTITION BY md5(chunk_text)
           |   ORDER BY doc_id, chunk_idx) AS rn FROM ch),
           |agg AS (
           | SELECT doc_id, count(*) AS n_kept,
           |  string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_kept
           | FROM rk WHERE rn = 1 GROUP BY 1),
           |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1)
           |SELECT t.doc_id, n_chunks,
           | coalesce(n_kept, 0) AS n_kept,
           | coalesce(text_kept, '') AS text_kept
           |FROM tot t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Vocabulary drift between two corpus snapshots (here: the even/
    // odd doc_id halves standing in for consecutive crawls): top-20
    // tokens by absolute count change. FULL OUTER join on the token —
    // a token may exist in only one snapshot — with integer-exact
    // deltas; both token-count aggregations are map-side combinable
    // and the final top-20 is a bounded heap.
    "q94_vocab_drift" -> Q(
      (s, dir) => {
        def cnts(f: Column => Column) = t(s, dir, "documents")
          .filter(f(col("doc_id")))
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        val a = cnts(_ % 2 === 0).withColumnRenamed("cnt", "cnt_a")
        val b = cnts(_ % 2 =!= 0).withColumnRenamed("cnt", "cnt_b")
        a.join(b, Seq("token"), "full_outer")
          .select(col("token"),
            coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
            coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
          .withColumn("delta", abs(col("cnt_a") - col("cnt_b")))
          .orderBy(col("delta").desc, col("token")).limit(20)
      },
      Some(
        s"""WITH a AS (
           | SELECT unnest($toksSql) AS token FROM documents
           | WHERE doc_id % 2 = 0),
           |ac AS (SELECT token, count(*) AS cnt_a FROM a GROUP BY 1),
           |b AS (
           | SELECT unnest($toksSql) AS token FROM documents
           | WHERE doc_id % 2 <> 0),
           |bc AS (SELECT token, count(*) AS cnt_b FROM b GROUP BY 1)
           |SELECT coalesce(ac.token, bc.token) AS token,
           | coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b,
           | abs(coalesce(cnt_a, 0) - coalesce(cnt_b, 0)) AS delta
           |FROM ac FULL OUTER JOIN bc USING (token)
           |ORDER BY delta DESC, token LIMIT 20""".stripMargin)),

    // Latest-wins upsert materialization (the SCD-1 merge a corpus
    // refresh performs): a base snapshot unioned with an update batch
    // (modified texts + brand-new ids), highest version per doc wins.
    // One shuffle on the id; the rn=1 filter plans as WindowGroupLimit
    // so no group's rows fully sort. Updates are synthesized from the
    // same table so the oracle can re-derive them bit-identically.
    "q97_upsert" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val base = docs.withColumn("version", lit(0L))
        val upd = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
          .withColumn("version", lit(1L))
          .unionByName(docs.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
            .withColumn("version", lit(1L)))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("version").desc)
        base.unionByName(upd)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .select(col("doc_id"), col("version"),
            md5(coalesce(col("text"), lit(""))).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some(
        """WITH base AS (
          |  SELECT doc_id, text, 0 AS version FROM documents),
          |upd AS (
          |  SELECT doc_id, text || ' v2' AS text, 1 AS version
          |  FROM documents WHERE doc_id % 5 = 0
          |  UNION ALL
          |  SELECT doc_id + 10000000, text, 1
          |  FROM documents WHERE doc_id % 7 = 0),
          |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
          |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |  ORDER BY version DESC) AS rn FROM u)
          |SELECT doc_id, CAST(version AS BIGINT) AS version,
          | md5(coalesce(text, '')) AS text_md5
          |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // THE flagship composition under oracle: the CurateCorpus CLI's
    // 7-stage funnel (lang -> quality/repetition -> exact dedup ->
    // near-dup keep-best -> 8-gram decontamination -> temperature
    // mixture -> reshard), run through the ACTUAL tool entry point
    // (tools/CurateCorpus.run — the same composed job a production
    // pipeline submits), emitting the per-stage survivor counts. The
    // oracle composes the individual stage oracles (q21/q22/q60/q82/
    // q74/q87 fragments) over the shrinking survivor set, so a
    // divergence at ANY stage shifts every later count. Holdout =
    // the q74 convention (doc_id % 10 == 0 slice), re-written each
    // run so a regenerated fixture can't serve stale contamination.
    "q99_curate_funnel" -> Q(
      (s, dir) => {
        GraftSession.tune(s)
        val tmp = "/tmp/graft_q99_" + Integer.toHexString(dir.hashCode)
        val hold = tmp + "/holdout"
        val out = tmp + "/curated"
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0)
          .write.mode("overwrite").parquet(hold)
        val funnel = graft.tools.CurateCorpus.run(s, Array(
          s"$dir/documents.parquet", out,
          "--lang", "en", "--holdout", hold, "--temperature", "0.5"))
        import s.implicits._
        funnel.zipWithIndex
          .map { case ((n, c), i) => (i.toLong, n, c) }
          .toDF("stage_idx", "stage", "n_docs")
          .orderBy(col("stage_idx"))
      },
      Some {
        // ONE line: a multi-line fragment interpolated into the outer
        // stripMargin template would lose the leading '|' of its '||'
        // continuation lines to the margin strip
        val gram8 = "list_distinct(list_transform(generate_series(1, len(t) - 7), " +
          (0 until 8).map(i => s"t[i+$i]").mkString("i -> ", " || ' ' || ", "))")
        val h32doc =
          "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        s"""WITH RECURSIVE
           |inp AS (SELECT doc_id, text, lang, source FROM documents),
           |lng AS (SELECT * FROM inp WHERE lang = 'en'),
           |qtk AS (SELECT *, $toksSql AS t FROM lng),
           |qf AS (SELECT doc_id, text, lang, source FROM qtk
           | WHERE len(t) >= 5 AND len(t) <= 100000
           |  AND list_aggregate(list_transform(list_distinct(t),
           |   x -> len(list_filter(t, y -> y = x))), 'max') * 5 <= len(t)),
           |ex AS (SELECT doc_id, text, lang, source FROM (
           |  SELECT *, row_number() OVER (
           |   PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
           |   ORDER BY doc_id) AS rn FROM qf) WHERE rn = 1),
           |${OpsQueries.minhashCtesFrom("ex")},
           |pairs AS (
           | SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM ex
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |comp AS (
           | SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
           |sc AS (
           | SELECT doc_id,
           |  CAST(len(list_intersect(list_distinct($toksSql),
           |    ['the','a','of','and','to','in','is'])) * 3
           |   + len(list_distinct($toksSql)) * 2
           |   - (CASE WHEN list_aggregate(list_transform($toksSql,
           |       t -> length(t)), 'max') > 12 THEN 5 ELSE 0 END)
           |   AS INTEGER) AS score
           | FROM ex),
           |nr AS (
           | SELECT c.doc_id FROM comp c JOIN sc USING (doc_id)
           | QUALIFY row_number() OVER (PARTITION BY c.cluster
           |   ORDER BY sc.score DESC, c.doc_id) = 1),
           |nrd AS (SELECT e.* FROM ex e JOIN nr USING (doc_id)),
           |htk AS (SELECT doc_id, $toksSql AS t FROM documents
           |  WHERE doc_id % 10 = 0),
           |hg AS (SELECT DISTINCT unnest($gram8) AS gram FROM htk),
           |dtk AS (SELECT doc_id, $toksSql AS t FROM nrd),
           |cont AS (SELECT DISTINCT doc_id FROM
           |  (SELECT doc_id, unnest($gram8) AS gram FROM dtk)
           |  WHERE gram IN (SELECT gram FROM hg)),
           |dc AS (SELECT * FROM nrd
           |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
           |mc AS (SELECT source, count(*) AS n_docs FROM dc GROUP BY 1),
           |m1 AS (SELECT source, n_docs,
           |  CAST(floor(sqrt(n_docs)) AS BIGINT) AS r0 FROM mc),
           |m2 AS (SELECT source,
           |  CASE WHEN r0*r0 > n_docs THEN r0 - 1
           |       WHEN (r0+1)*(r0+1) <= n_docs THEN r0 + 1
           |       ELSE r0 END AS samp_den FROM m1),
           |mx AS (SELECT dc.doc_id FROM dc JOIN m2 USING (source)
           |  WHERE $h32doc % samp_den = 0)
           |SELECT * FROM (
           | SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage,
           |  count(*) AS n_docs FROM inp
           | UNION ALL SELECT 1, 'lang', count(*) FROM lng
           | UNION ALL SELECT 2, 'quality', count(*) FROM qf
           | UNION ALL SELECT 3, 'exact_dedup', count(*) FROM ex
           | UNION ALL SELECT 4, 'near_dedup', count(*) FROM nr
           | UNION ALL SELECT 5, 'decontam', count(*) FROM dc
           | UNION ALL SELECT 6, 'mixture', count(*) FROM mx
           |) ORDER BY stage_idx""".stripMargin
      }))
}
