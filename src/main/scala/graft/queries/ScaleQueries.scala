package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{BloomExpressions, Dedup, DocSim, Fuzzy, GraphOps, Layout,
  Quantize, Similarity, TextOps}

/** Round-5 widening of the pipeline-operator surface (q100-q131):
  * embedding quantization, TF-IDF similarity joins, graph analytics
  * over the near-dup graph (PageRank, triangles, k-core, label
  * propagation, incremental CC), anomaly/quantile verdicts, release
  * diffs and layout audits, fuzzy linkage, boilerplate and winnowing
  * fingerprints, containment detection, distribution matching,
  * rarity/surprisal scores, source-overlap and modality-agreement
  * matrices, weighted reservoirs, Misra-Gries heavy hitters (batch
  * and streaming), windowed funnels, and transition matrices. Same
  * oracle discipline as OpsQueries: every formula is integer-exact
  * (or exact fixed-point from float inputs) so DuckDB reproduces the
  * hashes bit-for-bit; CTEs referenced more than once per level are
  * MATERIALIZED (DuckDB inlines per reference).
  */
object ScaleQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** 3-sigma per-minute volume flags from a (minute, cnt) frame —
    * cleared-denominator integer form (n*cnt - s vs 9*(n*ss - s^2)),
    * shared by the batch (q103) and streaming (q184) embodiments.
    */
  private[queries] def anomalyFlags(cnt: DataFrame): DataFrame = {
    val st = cnt.agg(count(lit(1)).as("nm"),
      sum(col("cnt")).as("s"), sum(expr("cnt * cnt")).as("ss"))
    cnt.crossJoin(broadcast(st))
      .withColumn("dev_n", expr("nm * cnt - s"))
      .withColumn("flag", (col("dev_n") > 0 &&
        expr("dev_n * dev_n > 9 * (nm * ss - s * s)")).cast("long"))
      .select(col("minute"), col("cnt"), col("dev_n"), col("flag"))
  }

  private[queries] val anomalyOracle: String =
    """WITH m AS (
      | SELECT epoch_ns(ts) // 60000000000 AS minute, count(*) AS cnt
      | FROM events GROUP BY 1),
      |st AS (
      | SELECT count(*) AS nm, CAST(sum(cnt) AS BIGINT) AS s,
      |  CAST(sum(cnt * cnt) AS BIGINT) AS ss FROM m)
      |SELECT minute, cnt, nm * cnt - s AS dev_n,
      | CAST(nm * cnt - s > 0 AND
      |  (nm * cnt - s) * (nm * cnt - s) > 9 * (nm * ss - s * s)
      |  AS BIGINT) AS flag
      |FROM m, st ORDER BY minute""".stripMargin

  def all: Map[String, Q] = Map(

    // per-dimension int8 affine quantization of the embedding corpus,
    // with an in-query reconstruction-error certificate: max_err must
    // sit within one quantization step. Exact fixed-point micros
    // (floor(double(v)*1e6) — see ops/Quantize.scala) keep every
    // value integer on both engines.
    "q100_quantize_audit" -> Q(
      (s, dir) => Quantize.quantizeAudit(t(s, dir, "embeddings"), "embedding")
        .orderBy(col("dim")),
      Some(
        """WITH ex AS (
          | SELECT unnest(range(len(embedding))) AS dim,
          |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
          | FROM embeddings),
          |st AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM ex GROUP BY 1),
          |c AS (
          | SELECT dim, lo, hi, v,
          |  CASE WHEN hi > lo THEN ((v - lo) * 255) // (hi - lo)
          |       ELSE 0 END AS code
          | FROM ex JOIN st USING (dim)),
          |r AS (
          | SELECT dim, lo, hi, code,
          |  v - (lo + (code * (hi - lo)) // 255) AS err
          | FROM c)
          |SELECT CAST(dim AS INTEGER) AS dim, lo, hi, count(*) AS n,
          | CAST(min(code) AS BIGINT) AS min_code,
          | CAST(max(code) AS BIGINT) AS max_code,
          | CAST(max(err) AS BIGINT) AS max_err,
          | CAST(sum(err) AS BIGINT) AS sum_err,
          | CAST(max(err) <= ((hi - lo) // 255) + 1 AS BIGINT) AS ok
          |FROM r GROUP BY dim, lo, hi ORDER BY dim""".stripMargin)),

    // top-50 most similar document pairs by integer TF-IDF dot
    // product through the df-capped inverted index (posting lists
    // bounded by maxDf=50 — the scale guarantee; see ops/DocSim.scala).
    // maxDf=50 on the fixture vocabulary (31 tokens, 30 of them in
    // >100 docs) admits exactly the one discriminative token band, so
    // the driver row checks 50 REAL pairs — the earlier maxDf=20
    // admitted nothing and the row was vacuously green at 0 == 0.
    "q101_docsim_pairs" -> Q(
      (s, dir) => DocSim.tfidfPairs(t(s, dir, "documents"),
        "doc_id", "text", maxDf = 50, topN = 50),
      Some(
        s"""WITH tok AS (
           | SELECT doc_id AS id, unnest(${OpsQueries.toksSql}) AS token
           | FROM documents),
           |tf AS (SELECT id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfq AS (
           | SELECT token, count(*) AS df FROM tf GROUP BY 1
           | HAVING count(*) BETWEEN 2 AND 50),
           |w AS (
           | SELECT token, id, tf * (${DocSim.Scale} // df) AS w
           | FROM tf JOIN dfq USING (token)),
           |p AS (
           | SELECT a.id AS id_a, b.id AS id_b,
           |  sum(a.w * b.w) AS dot, count(*) AS shared
           | FROM w a JOIN w b USING (token) WHERE a.id < b.id
           | GROUP BY 1, 2)
           |SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
           | CAST(shared AS BIGINT) AS shared
           |FROM p ORDER BY dot DESC, id_a, id_b LIMIT 50""".stripMargin)),

    // integer PageRank (3 unrolled iterations, damping 85/100, rank in
    // 1e6 fixed-point) over the symmetrized MinHash near-dup graph —
    // the oracle re-derives the same graph (OpsQueries.minhashCtes)
    // and unrolls the same three iterations as CTEs
    "q102_pagerank" -> Q(
      (s, dir) => GraphOps.pagerank(
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2),
        iters = 3).orderBy(col("node")),
      Some {
        val iter = (prev: String, next: String) =>
          s"""$next AS (
             | SELECT d.node, d.deg,
             |  150000 + (85 * s.inflow) // 100 AS r
             | FROM d JOIN (
             |  SELECT e.dst AS node, sum(p.r // p.deg) AS inflow
             |  FROM e JOIN $prev p ON e.src = p.node GROUP BY 1) s
             | USING (node))""".stripMargin
        s"""WITH ${OpsQueries.minhashCtes},
           |pr AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |e AS (
           | SELECT id_a AS src, id_b AS dst FROM pr
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pr),
           |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
           |r0 AS (SELECT node, deg, 1000000 AS r FROM d),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT node, CAST(deg AS BIGINT) AS deg, CAST(r AS BIGINT) AS pr_rank
           |FROM r3 ORDER BY node""".stripMargin
      }),

    // volume anomaly detection on the events stream: per-minute counts
    // flagged when cnt > mean + 3 sigma, in exact integer arithmetic —
    // (N*cnt - S)^2 > 9*(N*SS - S^2) multiplies the z-score rule
    // through by N^2 so no engine ever divides or square-roots.
    // Overflow bound: exact while N*maxcnt < 2^31.5 (dev^2 < 2^63);
    // at trillion-event scale run the rule per day/shard or in
    // DECIMAL(38,0) — the shape (tiny stats broadcast over a
    // key-bounded aggregate) is unchanged
    "q103_anomaly_minutes" -> Q(
      (s, dir) => ScaleQueries.anomalyFlags(t(s, dir, "events")
          .select(expr("ts DIV 60000000000").as("minute"))
          .groupBy(col("minute")).agg(count(lit(1)).as("cnt")))
        .orderBy(col("minute")),
      Some(ScaleQueries.anomalyOracle)),

    // quantile-sketch accuracy verdict (q42's pattern for
    // percentile_approx): exact discrete p50/p90 per lang by order
    // statistic, plus integer within-tolerance flags for the sketch —
    // the oracle computes the exact values and asserts the flags,
    // so a sketch outside tolerance flips the hash
    "q104_quantile_verdict" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
        val ranked = docs.withColumn("rn", row_number().over(w))
        val st = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        val ex = ranked.join(broadcast(st), Seq("lang"))
        val e50 = ex.filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("lang"), col("n_chars").as("exact_p50"))
        val e90 = ex.filter(col("rn") === expr("(9 * n + 9) DIV 10"))
          .select(col("lang"), col("n_chars").as("exact_p90"))
        val approx = docs.groupBy(col("lang")).agg(
          percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("a50"),
          percentile_approx(col("n_chars"), lit(0.9), lit(10000)).as("a90"))
        st.join(e50, Seq("lang")).join(e90, Seq("lang"))
          .join(approx, Seq("lang"))
          .withColumn("tol", greatest(lit(2L), expr("(hi - lo) DIV 10")))
          .select(col("lang"), col("n"), col("exact_p50"), col("exact_p90"),
            (abs(col("a50") - col("exact_p50")) <= col("tol"))
              .cast("long").as("within_p50"),
            (abs(col("a90") - col("exact_p90")) <= col("tol"))
              .cast("long").as("within_p90"))
          .orderBy(col("lang"))
      },
      Some(
        """WITH st AS (
          | SELECT lang, count(*) AS n, min(n_chars) AS lo, max(n_chars) AS hi
          | FROM documents GROUP BY 1),
          |r AS (
          | SELECT lang, n_chars, row_number() OVER
          |  (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn
          | FROM documents),
          |e50 AS (
          | SELECT r.lang, n_chars AS exact_p50 FROM r JOIN st USING (lang)
          | WHERE rn = (n + 1) // 2),
          |e90 AS (
          | SELECT r.lang, n_chars AS exact_p90 FROM r JOIN st USING (lang)
          | WHERE rn = (9 * n + 9) // 10)
          |SELECT lang, n, exact_p50, exact_p90,
          | CAST(1 AS BIGINT) AS within_p50, CAST(1 AS BIGINT) AS within_p90
          |FROM st JOIN e50 USING (lang) JOIN e90 USING (lang)
          |ORDER BY lang""".stripMargin)),

    // corpus release diff: two deterministic synthetic releases of the
    // documents table (B drops doc_id%10==3 and edits doc_id%5==0,
    // A drops doc_id%10==7) full-outer joined on id, classified
    // added/removed/changed/unchanged by content hash, rolled up per
    // source. One shuffle on the id; hashes compare without moving
    // text. The dataset-card companion for shipping corpus updates.
    "q105_corpus_diff" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
          .select(col("doc_id"), col("source"),
            md5(col("text").cast("binary")).as("h_a"))
        val b = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
          .select(col("doc_id"), col("source").as("source_b"),
            md5(concat(col("text"),
              when(pmod(col("doc_id"), lit(5)) === 0, lit(" v2"))
                .otherwise(lit(""))).cast("binary")).as("h_b"))
        a.join(b, Seq("doc_id"), "full_outer")
          .select(coalesce(col("source"), col("source_b")).as("source"),
            when(col("h_a").isNull, lit("added"))
              .when(col("h_b").isNull, lit("removed"))
              .when(col("h_a") =!= col("h_b"), lit("changed"))
              .otherwise(lit("unchanged")).as("status"))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("source"), col("status"))
      },
      Some(
        """WITH a AS (
          | SELECT doc_id, source, md5(text) AS h_a
          | FROM documents WHERE doc_id % 10 <> 7),
          |b AS (
          | SELECT doc_id, source AS source_b,
          |  md5(text || CASE WHEN doc_id % 5 = 0 THEN ' v2' ELSE '' END) AS h_b
          | FROM documents WHERE doc_id % 10 <> 3),
          |d AS (
          | SELECT COALESCE(a.source, b.source_b) AS source,
          |  CASE WHEN h_a IS NULL THEN 'added'
          |       WHEN h_b IS NULL THEN 'removed'
          |       WHEN h_a <> h_b THEN 'changed'
          |       ELSE 'unchanged' END AS status
          | FROM a FULL OUTER JOIN b USING (doc_id))
          |SELECT source, status, count(*) AS n
          |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Z-order layout audit: Morton-interleave (user_id, second) into
    // a clustering key (the OPTIMIZE ZORDER primitive), bucket rows by
    // the key's top bits, and measure per-bucket min/max spans in BOTH
    // dimensions against a row-major layout of the same bucket count.
    // The audited claim: z-buckets bound both dimensions (32x32
    // tiles), so min/max file statistics prune on either predicate —
    // row-major buckets bound only the leading dimension. Pure bit
    // arithmetic, bit-identical in the oracle (ops/Layout.scala).
    "q106_zorder_audit" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          pmod(col("user_id"), lit(1024L)).as("x"),
          pmod(expr("ts DIV 1000000000"), lit(1024L)).as("y"))
        val z = ev.select(lit("zorder").as("layout"),
          shiftright(Layout.morton(col("x"), col("y"), 10), 10).as("bucket"),
          col("x"), col("y"))
        val rm = ev.select(lit("rowmajor").as("layout"),
          shiftright(col("x") * 1024 + col("y"), 10).as("bucket"),
          col("x"), col("y"))
        z.union(rm)
          .groupBy(col("layout"), col("bucket"))
          .agg(min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
            min(col("y")).as("y_lo"), max(col("y")).as("y_hi"),
            count(lit(1)).as("nb"))
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("buckets"), sum(col("nb")).as("rows_total"),
            max(expr("x_hi - x_lo")).as("max_dx"),
            max(expr("y_hi - y_lo")).as("max_dy"),
            sum(expr("(x_hi - x_lo + 1) + (y_hi - y_lo + 1)")).as("sum_spans"))
          .orderBy(col("layout"))
      },
      Some {
        val m = Layout.mortonSql("x", "y", 10)
        // pmod equivalents, not bare % (sign-preserving in DuckDB):
        // parity must not depend on the fixture having nonneg ids
        s"""WITH ev AS (
           | SELECT ((user_id % 1024) + 1024) % 1024 AS x,
           |  (((epoch_ns(ts) // 1000000000) % 1024) + 1024) % 1024 AS y
           | FROM events),
           |pts AS (
           | SELECT 'zorder' AS layout, $m >> 10 AS bucket, x, y FROM ev
           | UNION ALL
           | SELECT 'rowmajor' AS layout, (x * 1024 + y) >> 10 AS bucket, x, y
           | FROM ev),
           |bk AS (
           | SELECT layout, bucket, min(x) AS x_lo, max(x) AS x_hi,
           |  min(y) AS y_lo, max(y) AS y_hi, count(*) AS nb
           | FROM pts GROUP BY 1, 2)
           |SELECT layout, count(*) AS buckets,
           | CAST(sum(nb) AS BIGINT) AS rows_total,
           | CAST(max(x_hi - x_lo) AS BIGINT) AS max_dx,
           | CAST(max(y_hi - y_lo) AS BIGINT) AS max_dy,
           | CAST(sum((x_hi - x_lo + 1) + (y_hi - y_lo + 1)) AS BIGINT) AS sum_spans
           |FROM bk GROUP BY layout ORDER BY layout""".stripMargin
      }),

    // fixed-width fuzzy record linkage: normalized 24-char keys,
    // pairs within Hamming distance 2 via segment-pigeonhole blocking
    // (recall-complete by construction — the oracle is the BRUTE
    // FORCE all-pairs scan, so a single missed candidate flips the
    // hash), annotated with the keys' Levenshtein distance
    "q107_fuzzy_linkage" -> Q(
      (s, dir) => graft.Scratch.cache(
        Fuzzy.fuzzyKeyPairs(t(s, dir, "documents"),
          "doc_id", "text", width = 24, k = 2))
        // cache before the presentation sort: the range-partitioned
        // orderBy samples its input first, which would re-run the
        // whole candidate join (the q56 lesson); the verified pair
        // table is tiny
        .orderBy(col("id_a"), col("id_b")),
      Some(
        """WITH ky AS (
          | SELECT doc_id AS id,
          |  rpad(substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
          |   1, 24), 24, '#') AS key
          | FROM documents WHERE text IS NOT NULL),
          |p AS (
          | SELECT a.id AS id_a, b.id AS id_b, a.key AS ka, b.key AS kb
          | FROM ky a JOIN ky b ON a.id < b.id),
          |h AS (
          | SELECT id_a, id_b, ka, kb,
          |  len(list_filter(generate_series(1, 24),
          |   i -> substr(ka, i, 1) <> substr(kb, i, 1))) AS hd
          | FROM p)
          |SELECT id_a, id_b, CAST(hd AS BIGINT) AS hd,
          | CAST(levenshtein(ka, kb) AS BIGINT) AS ld
          |FROM h WHERE hd <= 2 ORDER BY id_a, id_b""".stripMargin)),

    // per-group equi-depth histogram (8 tiles of n_chars per lang) —
    // the statistics backbone behind range-partition boundaries and
    // skew detection: exact ntile over a deterministic total order
    // (value, id). At 100 TB the same profile comes from
    // approx_percentile boundaries (q104 gates that sketch); the
    // exact form here is what the sketch is graded against.
    "q108_equidepth_hist" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
        docs.withColumn("tile", ntile(8).over(w))
          .groupBy(col("lang"), col("tile"))
          .agg(count(lit(1)).as("n"), min(col("n_chars")).as("lo"),
            max(col("n_chars")).as("hi"))
          .select(col("lang"), col("tile"), col("n"), col("lo"), col("hi"))
          .orderBy(col("lang"), col("tile"))
      },
      Some(
        """WITH t AS (
          | SELECT lang, n_chars, ntile(8) OVER
          |  (PARTITION BY lang ORDER BY n_chars, doc_id) AS tile
          | FROM documents)
          |SELECT lang, CAST(tile AS INTEGER) AS tile, count(*) AS n,
          | min(n_chars) AS lo, max(n_chars) AS hi
          |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // BPE ENCODE — the apply side of q88's learner: tokenize the
    // corpus with the 8-round learned vocabulary and report per-doc
    // word/BPE-token counts. The oracle re-learns the same merges
    // (q88's unrolled CTE chain) and re-applies them, so the whole
    // learn-then-encode path is hash-checked end to end.
    "q109_bpe_encode" -> Q(
      (s, dir) => graft.ops.Bpe.encode(s, t(s, dir, "documents"),
        "doc_id", "text", rounds = 8)
        .orderBy(col("doc_id")),
      Some(graft.ops.Bpe.encodeOracleSql(OpsQueries.toksSql, rounds = 8))),

    // hard-negative mining (contrastive training data): per anchor,
    // the top-5 cosine-nearest candidates whose TEXTS are not
    // near-dups of the anchor's — the vector modality ranks, the text
    // modality (q24's minhash pair graph) excludes. vec_id and doc_id
    // are aligned in the fixtures.
    "q110_hard_negatives" -> Q(
      (s, dir) => Similarity.hardNegatives(t(s, dir, "embeddings"),
        "vec_id", "embedding",
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2),
        nAnchors = 8, k = 5)
        .orderBy(col("anchor_id"), col("rnk")),
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |nd AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS anchor_id, id_b AS cand_id FROM nd
           | UNION ALL
           | SELECT id_b AS anchor_id, id_a AS cand_id FROM nd),
           |a AS (
           | SELECT vec_id AS anchor_id, embedding AS av
           | FROM embeddings WHERE vec_id < 8),
           |sc AS (
           | SELECT a.anchor_id, e.vec_id AS cand_id,
           |  round(${OpsQueries.cosSql("e.embedding", "a.av")}, 6) AS cos
           | FROM embeddings e, a WHERE e.vec_id <> a.anchor_id),
           |fl AS (
           | SELECT sc.* FROM sc
           | WHERE NOT EXISTS (SELECT 1 FROM sym
           |  WHERE sym.anchor_id = sc.anchor_id
           |   AND sym.cand_id = sc.cand_id)),
           |r AS (
           | SELECT *, row_number() OVER
           |  (PARTITION BY anchor_id ORDER BY cos DESC, cand_id) AS rnk
           | FROM fl)
           |SELECT anchor_id, cand_id, cos, CAST(rnk AS INTEGER) AS rnk
           |FROM r WHERE rnk <= 5 ORDER BY anchor_id, rnk""".stripMargin)),

    // multi-benchmark decontamination scorecard: q74's rule against
    // THREE test sets at once, with per-(doc, set) hit attribution —
    // what a release pipeline actually runs (decontaminate against
    // many benchmarks simultaneously). The scale point: ONE pass over
    // the corpus gram stream serves all K sets — one shared bloom
    // prunes map-side, then a single broadcast join attributes
    // survivors to every set containing the gram (vs K independent
    // passes at K x the scan cost).
    "q111_multi_decontam" -> Q(
      (s, dir) => {
        val grams = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.ngramsDistinct(col("text"), 8)).as("gram"))
        val test = graft.Scratch.cache(grams
          .filter(pmod(col("doc_id"), lit(10)) <= 2)
          .select(pmod(col("doc_id"), lit(10)).cast("int").as("tset"),
            col("gram")).distinct())
        // sized to the (set, gram) count — an upper bound on distinct
        // grams, so the bloom only gets sparser
        val nTest = test.count()
        val bloom = BloomExpressions.buildLongBloom(
          test.select(col("gram")), xxhash64(col("gram")),
          expectedItems = nTest)
        grams.filter(pmod(col("doc_id"), lit(10)) > 2)
          .filter(BloomExpressions.mightContain(xxhash64(col("gram")), bloom))
          // test is corpus-derived → broadcast only under the gate
          .join(graft.ops.Hints.broadcastIfSmall(test, nTest), Seq("gram"))
          .groupBy(col("doc_id"), col("tset"))
          .agg(count(lit(1)).as("n_hits"))
          .orderBy(col("doc_id"), col("tset"))
      },
      Some(
        s"""WITH tk AS (SELECT doc_id, ${OpsQueries.toksSql} AS t FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(
           |  list_transform(generate_series(1, len(t) - 7),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           |    || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
           |    || ' ' || t[i+7]))) AS gram FROM tk),
           |te AS (SELECT DISTINCT CAST(doc_id % 10 AS INTEGER) AS tset, gram
           |       FROM g WHERE doc_id % 10 <= 2),
           |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 > 2)
           |SELECT tr.doc_id, te.tset, count(*) AS n_hits
           |FROM tr JOIN te USING (gram)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // horizon-bounded near-dup: q24's pairs restricted to docs whose
    // (synthetic) ingestion weeks differ by <= 1, via (band, week)
    // blocking keys — candidate space grows with the horizon WINDOW,
    // not with corpus age. Oracle = the recall-complete band-sharing
    // pair set post-filtered by the same horizon, so a pair the
    // temporal blocking wrongly drops (or double-emits) flips the
    // hash.
    "q112_horizon_neardup" -> Q(
      (s, dir) => Dedup.minhashPairsHorizon(t(s, dir, "documents"),
        "doc_id", "text", week = expr("doc_id DIV 70"),
        n = 3, bands = 4, rows = 4, num = 1, den = 2)
        .orderBy(col("id_a"), col("id_b")),
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |wk AS (SELECT doc_id AS id, doc_id // 70 AS w FROM documents)
           |SELECT c.id_a, c.id_b, a.w AS wk_a, b.w AS wk_b, i_cnt, u_cnt
           |FROM chk c
           |JOIN wk a ON a.id = c.id_a
           |JOIN wk b ON b.id = c.id_b
           |WHERE i_cnt * 2 >= u_cnt AND abs(a.w - b.w) <= 1
           |ORDER BY id_a, id_b""".stripMargin)),

    // degree-oriented triangle counting over the near-dup graph:
    // per-node triangle participation (clique membership vs hub of
    // unrelated collisions). The oracle re-derives the same acyclic
    // (degree, id) orientation with row-value comparisons and the
    // same wedge-close joins — exactly-once per triangle by the
    // orientation argument, checked cross-engine.
    "q113_triangles" -> Q(
      (s, dir) => GraphOps.triangleCounts(
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2))
        .orderBy(col("node")),
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |pr AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS u, id_b AS v FROM pr
           | UNION ALL SELECT id_b, id_a FROM pr),
           |d AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1),
           |wd AS (
           | SELECT id_a, id_b, da.deg AS da, db.deg AS db FROM pr
           | JOIN d da ON da.node = id_a JOIN d db ON db.node = id_b),
           |o AS MATERIALIZED (
           | SELECT
           |  CASE WHEN row(da, id_a) < row(db, id_b)
           |       THEN id_a ELSE id_b END AS u,
           |  CASE WHEN row(da, id_a) < row(db, id_b)
           |       THEN id_b ELSE id_a END AS v,
           |  CASE WHEN row(da, id_a) < row(db, id_b)
           |       THEN db ELSE da END AS dv
           | FROM wd),
           |wg AS (
           | SELECT a.u, a.v, b.v AS w FROM o a JOIN o b USING (u)
           | WHERE row(a.dv, a.v) < row(b.dv, b.v)),
           |tr AS (
           | SELECT wg.u, wg.v, wg.w FROM wg
           | JOIN o ON o.u = wg.v AND o.v = wg.w),
           |ex AS (SELECT unnest([u, v, w]) AS node FROM tr)
           |SELECT node, count(*) AS n_tri FROM ex
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // cross-document boilerplate audit: fixed 8-token segments,
    // boilerplate = segment (by 60-bit hash) in > 2 distinct docs.
    // The oracle groups by the SAME md5-prefix hash, so both engines
    // agree by construction even on a hash collision.
    "q114_boilerplate" -> Q(
      (s, dir) => TextOps.boilerplateStats(
        t(s, dir, "documents"), "doc_id", "text", segLen = 8, maxDocs = 2)
        .orderBy(col("doc_id")),
      Some(
        """WITH tok AS (
          | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
          | FROM documents),
          |seg AS (
          | SELECT doc_id,
          |  ('0x' || substr(md5(array_to_string(
          |    list_slice(t, i * 8 + 1, i * 8 + 8), ' ')), 1, 15))::BIGINT AS sh
          | FROM tok, unnest(range((len(t) + 7) // 8)) AS u(i)),
          |df AS (SELECT sh, count(DISTINCT doc_id) AS ndocs FROM seg GROUP BY 1)
          |SELECT doc_id, count(*) AS n_segs,
          | CAST(count(*) FILTER (WHERE df.ndocs > 2) AS BIGINT) AS n_boiler,
          | CAST((count(*) FILTER (WHERE df.ndocs > 2)) * 100 // count(*)
          |      AS BIGINT) AS pct_boiler
          |FROM seg JOIN df USING (sh)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // winnowing (MOSS) fingerprint overlap pairs: per-position 4-gram
    // hashes, min of each 5-position window, df-capped inverted-index
    // join. Guarantee: any shared run of >= n+w-1 = 8 tokens shares a
    // fingerprint. The oracle replays the same window minima with a
    // ROWS frame and the full-window count trick.
    "q115_winnow_pairs" -> Q(
      (s, dir) => TextOps.winnowPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 4, w = 5, maxDf = 20, minShared = 5)
        .orderBy(col("id_a"), col("id_b")),
      Some(
        s"""WITH $winnowCtes,
           |pr AS (
           | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           | FROM fpc a JOIN fpc b USING (fp) WHERE a.doc_id < b.doc_id
           | GROUP BY 1, 2 HAVING count(*) >= 5)
           |SELECT * FROM pr ORDER BY id_a, id_b""".stripMargin)),

    // fixed-round k-core peel over the winnowing overlap graph: every
    // input-graph node with initial degree, post-peel degree, and the
    // in-core flag. The oracle unrolls the 3 peel rounds as CTEs —
    // degree, survivor filter, edge restriction — exactly the loop
    // the Spark side runs.
    "q116_kcore" -> Q(
      (s, dir) => GraphOps.kCore(
        TextOps.winnowPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 4, w = 5, maxDf = 20, minShared = 5),
        k = 2, rounds = 3)
        .orderBy(col("node")),
      Some(
        s"""WITH $winnowCtes,
           |e0 AS MATERIALIZED (
           | SELECT a.doc_id AS id_a, b.doc_id AS id_b
           | FROM fpc a JOIN fpc b USING (fp) WHERE a.doc_id < b.doc_id
           | GROUP BY 1, 2 HAVING count(*) >= 5),
           |d0 AS MATERIALIZED (SELECT u AS node, count(*) AS deg FROM (
           |  SELECT id_a AS u FROM e0 UNION ALL SELECT id_b FROM e0) GROUP BY 1),
           |s0 AS MATERIALIZED (SELECT node FROM d0 WHERE deg >= 2),
           |e1 AS MATERIALIZED (SELECT id_a, id_b FROM e0
           |  JOIN s0 a ON a.node = id_a JOIN s0 b ON b.node = id_b),
           |d1 AS MATERIALIZED (SELECT u AS node, count(*) AS deg FROM (
           |  SELECT id_a AS u FROM e1 UNION ALL SELECT id_b FROM e1) GROUP BY 1),
           |s1 AS MATERIALIZED (SELECT node FROM d1 WHERE deg >= 2),
           |e2 AS MATERIALIZED (SELECT id_a, id_b FROM e1
           |  JOIN s1 a ON a.node = id_a JOIN s1 b ON b.node = id_b),
           |d2 AS MATERIALIZED (SELECT u AS node, count(*) AS deg FROM (
           |  SELECT id_a AS u FROM e2 UNION ALL SELECT id_b FROM e2) GROUP BY 1),
           |s2 AS MATERIALIZED (SELECT node FROM d2 WHERE deg >= 2),
           |e3 AS MATERIALIZED (SELECT id_a, id_b FROM e2
           |  JOIN s2 a ON a.node = id_a JOIN s2 b ON b.node = id_b),
           |d3 AS MATERIALIZED (SELECT u AS node, count(*) AS deg FROM (
           |  SELECT id_a AS u FROM e3 UNION ALL SELECT id_b FROM e3) GROUP BY 1)
           |SELECT d0.node, d0.deg AS deg0,
           | COALESCE(d3.deg, 0) AS deg,
           | CAST(COALESCE(d3.deg, 0) >= 2 AS BIGINT) AS in_core
           |FROM d0 LEFT JOIN d3 USING (node) ORDER BY node""".stripMargin)),

    // asymmetric containment pairs (small doc quoted inside a big
    // one — the case symmetric-Jaccard minhash blocking misses).
    // Spark blocks by prefix filtering, whose recall is EXACT by the
    // pigeonhole argument, so the oracle is brute-force all-pairs —
    // it proves both the containment arithmetic AND that the
    // prefix-filter blocking lost nothing.
    "q117_containment" -> Q(
      (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, thrPermille = 800)
        .orderBy(col("id_a"), col("id_b")),
      Some(
        s"""WITH tk AS (
           | SELECT doc_id AS id, ${OpsQueries.toksSql} AS t FROM documents),
           |shs AS (
           | SELECT id, list_distinct(list_transform(generate_series(1, len(t) - 2),
           |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM tk),
           |hs AS (
           | SELECT id, list_transform(s,
           |   x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % ${Dedup.MinhashP}) AS hs
           | FROM shs WHERE len(s) > 0),
           |v AS (
           | SELECT ha.id AS id_a, hb.id AS id_b,
           |  CAST(len(list_intersect(ha.hs, hb.hs)) AS INTEGER) AS i_cnt,
           |  CAST(len(ha.hs) AS INTEGER) AS n_a,
           |  CAST(len(hb.hs) AS INTEGER) AS n_b
           | FROM hs ha JOIN hs hb ON ha.id < hb.id)
           |SELECT id_a, id_b, i_cnt, n_a, n_b,
           | CAST(i_cnt * 1000 // n_a AS BIGINT) AS cont_a,
           | CAST(i_cnt * 1000 // n_b AS BIGINT) AS cont_b
           |FROM v WHERE greatest(i_cnt * 1000 // n_a, i_cnt * 1000 // n_b) >= 800
           |ORDER BY id_a, id_b""".stripMargin)),

    // distribution-matching downsample scoreboard: largest achievable
    // scale for the target lang mix (no upsampling), per-class keep
    // permille, and the exact kept counts under the salted md5-bucket
    // rule. Every number is integer; the oracle replays the same
    // min-scale arithmetic and hash rule.
    "q118_match_distribution" -> Q(
      (s, dir) => TextOps.matchDistribution(t(s, dir, "documents"),
        "doc_id", "lang",
        Seq("en" -> 40, "de" -> 15, "es" -> 15, "fr" -> 15, "zh" -> 15),
        salt = "mix1")
        .orderBy(col("cls")),
      Some(
        """WITH tgt(cls, tgt) AS (
          |  VALUES ('en', 40), ('de', 15), ('es', 15), ('fr', 15), ('zh', 15)),
          |obsc AS (SELECT lang AS cls, count(*) AS nobs FROM documents GROUP BY 1),
          |j AS (
          | SELECT cls, tgt, COALESCE(nobs, 0) AS obs
          | FROM tgt LEFT JOIN obsc USING (cls)),
          |sc AS (SELECT min(obs * 1000000 // tgt) AS scale1e6 FROM j),
          |r AS (
          | SELECT cls, obs, CAST(tgt AS BIGINT) AS tgt,
          |  CASE WHEN obs > 0
          |   THEN (scale1e6 * tgt // 1000000) * 1000 // obs
          |   ELSE 0 END AS permille
          | FROM j, sc),
          |k AS (
          | SELECT lang AS cls,
          |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_mix1'), 1, 8))::BIGINT
          |    % 1000 AS bucket
          | FROM documents),
          |kc AS (
          | SELECT cls, count(*) FILTER (WHERE bucket < permille) AS nkept
          | FROM k JOIN r USING (cls) GROUP BY 1)
          |SELECT cls, obs, tgt, CAST(permille AS BIGINT) AS permille,
          | CAST(COALESCE(nkept, 0) AS BIGINT) AS kept
          |FROM r LEFT JOIN kc USING (cls) ORDER BY cls""".stripMargin)),

    // corpus-relative token-rarity score: dense frequency rank of the
    // vocabulary, mean rank per doc occurrence (integer floor) — the
    // tail-vocabulary / gibberish flag.
    "q119_token_rarity" -> Q(
      (s, dir) => TextOps.tokenRarity(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tok AS (
           | SELECT doc_id AS id, unnest(${OpsQueries.toksSql}) AS token
           | FROM documents),
           |v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
           |r AS (SELECT token,
           |  dense_rank() OVER (ORDER BY cnt DESC, token) AS rank FROM v)
           |SELECT id AS doc_id, count(*) AS n_tokens,
           | CAST(sum(rank) AS BIGINT) AS rank_sum,
           | CAST(sum(rank) // count(*) AS BIGINT) AS rarity
           |FROM tok JOIN r USING (token)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // catalog-level source-overlap matrix: one union-MinHash signature
    // per source (componentwise min over per-doc signatures), all
    // source pairs scored by matching components in permille. The
    // oracle re-derives per-doc signatures from the shared minhash
    // CTEs and aggregates the same way.
    "q120_source_overlap" -> Q(
      (s, dir) => Dedup.sourceOverlap(t(s, dir, "documents"),
        "source", "text", n = 3)
        .orderBy(col("src_a"), col("src_b")),
      Some(
        s"""WITH ${OpsQueries.minhashCtes},
           |srcm AS (SELECT doc_id AS id, source FROM documents),
           |sg AS (
           | SELECT source, i AS k, sig[i] AS v
           | FROM sig JOIN srcm USING (id),
           |  unnest(generate_series(1, 16)) AS u(i)),
           |m AS (SELECT source, k, min(v) AS v FROM sg GROUP BY 1, 2),
           |p AS (
           | SELECT a.source AS src_a, b.source AS src_b,
           |  count(*) AS k_cnt,
           |  sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS matches
           | FROM m a JOIN m b ON a.k = b.k AND a.source < b.source
           | GROUP BY 1, 2)
           |SELECT src_a, src_b, CAST(matches AS BIGINT) AS matches,
           | CAST(matches * 1000 // k_cnt AS BIGINT) AS est_permille
           |FROM p ORDER BY src_a, src_b""".stripMargin)),

    // modality-agreement matrix for dedup: pairs found by text
    // MinHash LSH vs by embedding sign-LSH, full-outer joined on the
    // pair key and counted by presence. Disagreement is the
    // diagnostic: text_only = paraphrase-invisible surface dups,
    // embedding_only = semantic dups the shingles miss.
    "q121_dedup_agreement" -> Q(
      (s, dir) => {
        val tp = Dedup.minhashPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 3, bands = 4, rows = 4, num = 1, den = 2)
          .select(col("id_a"), col("id_b")).withColumn("tf", lit(1L))
        val ep = Similarity.nearDupPairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", Similarity.hyperplanes(8, 64), 0.35)
          .select(col("id_a"), col("id_b")).withColumn("ef", lit(1L))
        tp.join(ep, Seq("id_a", "id_b"), "full_outer")
          .select(when(col("tf").isNotNull && col("ef").isNotNull, "both")
            .when(col("tf").isNotNull, "text_only")
            .otherwise("embedding_only").as("modality"))
          .groupBy(col("modality")).agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("modality"))
      },
      Some {
        val wSql = s"list_transform(generate_series(0, 63), d -> " +
          s"(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 8))::BIGINT % 1001) - 500)"
        s"""WITH ${OpsQueries.minhashCtes},
           |tpr AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |w AS (
           | SELECT p, $wSql AS wv FROM generate_series(0, 7) AS t(p)),
           |bk AS (
           | SELECT vec_id, embedding,
           |  sum(CASE WHEN (${OpsQueries.dotSql("embedding", "wv")}) >= 0
           |      THEN (1::BIGINT << p) ELSE 0::BIGINT END) AS bucket
           | FROM embeddings, w GROUP BY vec_id, embedding),
           |epr AS (
           | SELECT x.vec_id AS id_a, y.vec_id AS id_b
           | FROM bk x JOIN bk y ON x.bucket = y.bucket
           | WHERE x.vec_id < y.vec_id
           |  AND round(${OpsQueries.cosSql("x.embedding", "y.embedding")}, 6)
           |      >= 0.35),
           |ag AS (
           | SELECT CASE
           |   WHEN t.id_a IS NOT NULL AND e.id_a IS NOT NULL THEN 'both'
           |   WHEN t.id_a IS NOT NULL THEN 'text_only'
           |   ELSE 'embedding_only' END AS modality
           | FROM tpr t FULL OUTER JOIN epr e
           |  ON t.id_a = e.id_a AND t.id_b = e.id_b)
           |SELECT modality, count(*) AS n_pairs FROM ag
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // incremental clustering gate: absorb the new batch (doc_id >=
    // 250) into yesterday's clusters by contracting old components to
    // supernodes and running CC over NEW edges only. The oracle is
    // the from-scratch recursive transitive closure over ALL pairs —
    // a hash match proves incremental == full reclustering.
    "q122_incremental_cc" -> Q(
      (s, dir) => Dedup.incrementalClusters(t(s, dir, "documents"),
        "doc_id", "text", splitId = 250L,
        n = 3, bands = 4, rows = 4, num = 1, den = 2)
        .orderBy(col("doc_id")),
      Some(
        s"""WITH RECURSIVE ${OpsQueries.minhashCtes},
           |pairs AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM documents
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src)
           |SELECT a AS doc_id, min(b) AS cluster FROM reach
           |GROUP BY a ORDER BY doc_id""".stripMargin)),

    // bigram-surprisal quality score: dense rank of each bigram
    // within its prefix-token group (most common continuation = 1),
    // doc score = mean occurrence rank x100. The rank window is
    // per-prefix — parallel across the vocabulary, no global sort.
    "q123_bigram_surprise" -> Q(
      (s, dir) => TextOps.bigramSurprise(t(s, dir, "documents"),
        "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(
        s"""WITH tok AS (
           | SELECT doc_id AS id, ${OpsQueries.toksSql} AS t FROM documents),
           |bgt AS (
           | SELECT id, unnest(list_transform(generate_series(1, len(t) - 1),
           |   i -> t[i] || ' ' || t[i+1])) AS bg FROM tok),
           |c AS (SELECT bg, count(*) AS cnt FROM bgt GROUP BY 1),
           |r AS (SELECT bg, dense_rank() OVER (
           |  PARTITION BY string_split(bg, ' ')[1]
           |  ORDER BY cnt DESC, bg) AS rank FROM c)
           |SELECT id AS doc_id, count(*) AS n_bigrams,
           | CAST(sum(rank) AS BIGINT) AS surprise_sum,
           | CAST(sum(rank) * 100 // count(*) AS BIGINT) AS surprise_x100
           |FROM bgt JOIN r USING (bg)
           |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // dedup ROI report: per cluster-size bucket, how many clusters,
    // how many docs a keep-canonical policy removes, and how many
    // tokens that saves — the number that justifies (or kills) a
    // dedup stage at corpus scale.
    "q124_dedup_roi" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val lab = Dedup.dedupClusters(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
        val tk = docs.select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        val cl = lab.join(tk, Seq("doc_id"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("csize"), sum(col("tk")).as("tot"),
            sum(when(col("is_canonical"), col("tk")).otherwise(0L)).as("kept"))
        cl.groupBy(col("csize"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("tot") - col("kept")).as("tokens_saved"))
          .select(col("csize"), col("n_clusters"),
            ((col("csize") - 1) * col("n_clusters")).as("docs_removed"),
            col("tokens_saved"))
          .orderBy(col("csize"))
      },
      Some(
        s"""WITH RECURSIVE ${OpsQueries.minhashCtes},
           |pairs AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM documents
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |comp AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
           |tk AS (
           | SELECT doc_id, CAST(len(${OpsQueries.toksSql}) AS BIGINT) AS tk
           | FROM documents),
           |cl AS (
           | SELECT cluster, count(*) AS csize, sum(tk) AS tot,
           |  sum(CASE WHEN doc_id = cluster THEN tk ELSE 0 END) AS kept
           | FROM comp JOIN tk USING (doc_id) GROUP BY 1)
           |SELECT csize, count(*) AS n_clusters,
           | CAST((csize - 1) * count(*) AS BIGINT) AS docs_removed,
           | CAST(sum(tot - kept) AS BIGINT) AS tokens_saved
           |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // dup x quality contingency: are near-dup cluster members
    // disproportionately low-quality? Counts over the 2x2 of
    // (in a multi-doc cluster) x (below the q21 quality bar) —
    // the interaction that decides stage ORDER in a curation funnel
    // (dedup-then-filter vs filter-then-dedup).
    "q125_dup_quality" -> Q(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val lab = Dedup.dedupClusters(docs, "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2)
        val csize = lab.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
        val q = docs.select(col("doc_id"),
          TextOps.qualitySignals(col("text")).as("q"))
          .select(col("doc_id"),
            (col("q.n_distinct") * 2 + col("q.n_stop") * 3 -
              when(col("q.max_tok_len") > 12, 5).otherwise(0)).as("score"))
        lab.join(csize, Seq("cluster")).join(q, Seq("doc_id"))
          .select((col("csize") > 1).cast("long").as("in_dup_cluster"),
            (col("score") < 20).cast("long").as("low_quality"))
          .groupBy(col("in_dup_cluster"), col("low_quality"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("in_dup_cluster"), col("low_quality"))
      },
      Some {
        val ts = OpsQueries.toksSql
        s"""WITH RECURSIVE ${OpsQueries.minhashCtes},
           |pairs AS (SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
           |sym AS (
           | SELECT id_a AS src, id_b AS dst FROM pairs
           | UNION ALL
           | SELECT id_b AS src, id_a AS dst FROM pairs),
           |reach(a, b) AS (
           | SELECT doc_id, doc_id FROM documents
           | UNION
           | SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src),
           |comp AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
           |cs AS (SELECT cluster, count(*) AS csize FROM comp GROUP BY 1),
           |qs AS (
           | SELECT doc_id,
           |  len(list_distinct($ts)) * 2 +
           |  len(list_intersect(list_distinct($ts),
           |   ['the','a','of','and','to','in','is'])) * 3 -
           |  CASE WHEN list_aggregate(list_transform($ts, t -> length(t)),
           |   'max') > 12 THEN 5 ELSE 0 END AS score
           | FROM documents),
           |j AS (
           | SELECT CAST(csize > 1 AS BIGINT) AS in_dup_cluster,
           |  CAST(score < 20 AS BIGINT) AS low_quality
           | FROM comp JOIN cs USING (cluster) JOIN qs USING (doc_id))
           |SELECT in_dup_cluster, low_quality, count(*) AS n_docs
           |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }),

    // deterministic weighted reservoir: exactly 20 docs per lang by
    // ascending hash*1e6 DIV n_chars priority (fixed-point A-Res —
    // longer docs proportionally likelier), engine- and run-stable.
    "q126_weighted_reservoir" -> Q(
      (s, dir) => TextOps.weightedReservoir(t(s, dir, "documents"),
        "doc_id", "lang", col("n_chars"), k = 20, salt = "rsv1")
        .orderBy(col("stratum"), col("rn")),
      Some(
        """WITH k AS (
          | SELECT lang AS stratum, doc_id, n_chars,
          |  (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_rsv1'), 1, 8))::BIGINT
          |   * 1000000) // n_chars AS pri
          | FROM documents WHERE n_chars > 0),
          |r AS (
          | SELECT stratum, doc_id, pri, row_number() OVER (
          |  PARTITION BY stratum ORDER BY pri, doc_id) AS rn
          | FROM k)
          |SELECT stratum, rn, doc_id, pri FROM r WHERE rn <= 20
          |ORDER BY stratum, rn""".stripMargin)),

    // Misra-Gries heavy hitters through the mergeable sketch UDAF:
    // 16 counters against a synthesized 2-hot/5000-cold key column
    // (the corpus itself is deliberately uniform — q62's synthesis
    // precedent), then exact re-count of the <= 16 candidates and the
    // strict n/(k+1) cut. The oracle brute-forces the true heavy
    // set, so the hash match proves the sketch lost no heavy hitter
    // under merge — the q58 recall-oracle pattern.
    "q127_heavy_hitters" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          when(col("event_id") % 3 === 0,
            concat(lit("hot_"), (col("event_id") % 2).cast("string")))
            .otherwise(
              concat(lit("cold_"), (col("event_id") % 5000).cast("string")))
            .as("key"))
        graft.ops.HeavyHitters.heavyHitters(ev, "key", k = 16)
          .orderBy(col("key"))
      },
      Some(
        """WITH kv AS (
          | SELECT CASE WHEN event_id % 3 = 0
          |   THEN 'hot_' || CAST(event_id % 2 AS VARCHAR)
          |   ELSE 'cold_' || CAST(event_id % 5000 AS VARCHAR) END AS key
          | FROM events),
          |nt AS (SELECT count(*) AS n FROM kv),
          |c AS (SELECT key, count(*) AS cnt FROM kv GROUP BY 1)
          |SELECT key, cnt, n AS n_rows,
          | CAST(cnt * 1000 // n AS BIGINT) AS share_permille
          |FROM c, nt WHERE cnt * 17 > n ORDER BY key""".stripMargin)),

    // conversion-window funnel: each stage must fire within 6h of the
    // previous stage's first-touch (q90 is the unwindowed chain);
    // reports users converting per stage and the summed conversion
    // delay in exact integer micros. Each stage is one equi-join on
    // user plus a min-aggregate — no window function, no self-join
    // fan-out; stage tables shrink monotonically.
    "q128_funnel_windowed" -> Q(
      (s, dir) => {
        val D = 21600000000L // 6h in micros
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_type"), expr("ts DIV 1000").as("tsu"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("tsu") > col("t1") && col("tsu") <= col("t1") + D)
          .groupBy(col("user_id"))
          .agg(min(col("tsu")).as("t2"), min(col("t1")).as("t1"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2.select(col("user_id"), col("t2")), Seq("user_id"))
          .filter(col("tsu") > col("t2") && col("tsu") <= col("t2") + D)
          .groupBy(col("user_id"))
          .agg(min(col("tsu")).as("t3"), min(col("t2")).as("t2"))
        s1.agg(count(lit(1)).as("n_users"))
          .select(lit("1_signup").as("stage"), col("n_users"),
            lit(0L).as("sum_delay_us"))
          .unionAll(s2.agg(count(lit(1)).as("n_users"),
            sum(col("t2") - col("t1")).as("sum_delay_us"))
            .select(lit("2_click_6h").as("stage"), col("n_users"),
              col("sum_delay_us")))
          .unionAll(s3.agg(count(lit(1)).as("n_users"),
            sum(col("t3") - col("t2")).as("sum_delay_us"))
            .select(lit("3_purchase_6h").as("stage"), col("n_users"),
              col("sum_delay_us")))
          .orderBy(col("stage"))
      },
      Some(
        """WITH ev AS (
          | SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu FROM events),
          |s1 AS (SELECT user_id, min(tsu) AS t1 FROM ev
          |       WHERE event_type = 'signup' GROUP BY 1),
          |s2 AS (SELECT ev.user_id, min(tsu) AS t2, min(t1) AS t1 FROM ev
          |       JOIN s1 USING (user_id)
          |       WHERE event_type = 'click'
          |        AND tsu > t1 AND tsu <= t1 + 21600000000
          |       GROUP BY 1),
          |s3 AS (SELECT ev.user_id, min(tsu) AS t3, min(t2) AS t2 FROM ev
          |       JOIN s2 USING (user_id)
          |       WHERE event_type = 'purchase'
          |        AND tsu > t2 AND tsu <= t2 + 21600000000
          |       GROUP BY 1)
          |SELECT '1_signup' AS stage, count(*) AS n_users,
          | CAST(0 AS BIGINT) AS sum_delay_us FROM s1
          |UNION ALL
          |SELECT '2_click_6h', count(*), CAST(sum(t2 - t1) AS BIGINT) FROM s2
          |UNION ALL
          |SELECT '3_purchase_6h', count(*), CAST(sum(t3 - t2) AS BIGINT) FROM s3
          |ORDER BY stage""".stripMargin)),

    // event-transition matrix (first-order Markov counts): per-user
    // lag window ordered by (ts, event_id) — the unique id breaks
    // timestamp ties identically in both engines — then global
    // (prev, next) counts with integer row-normalized permille.
    // Scale: the window partitions by user (parallel), the matrix is
    // |event_types|^2-sized.
    "q129_transitions" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
        val tr = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts DIV 1000").as("tsu"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
        val c = tr.groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("cnt"))
        val tot = c.groupBy(col("prev")).agg(sum(col("cnt")).as("row_total"))
        c.join(tot, Seq("prev"))
          .select(col("prev"), col("next"), col("cnt"),
            (col("cnt") * 1000 / col("row_total")).cast("long")
              .as("p_permille"))
          .orderBy(col("prev"), col("next"))
      },
      Some(
        """WITH ev AS (
          | SELECT user_id, event_id, event_type,
          |  epoch_ns(ts) // 1000 AS tsu FROM events),
          |tr AS (
          | SELECT user_id, event_type,
          |  lag(event_type) OVER (
          |   PARTITION BY user_id ORDER BY tsu, event_id) AS prev
          | FROM ev),
          |c AS (
          | SELECT prev, event_type AS next, count(*) AS cnt FROM tr
          | WHERE prev IS NOT NULL GROUP BY 1, 2),
          |tot AS (SELECT prev, sum(cnt) AS row_total FROM c GROUP BY 1)
          |SELECT prev, next, cnt,
          | CAST(cnt * 1000 // row_total AS BIGINT) AS p_permille
          |FROM c JOIN tot USING (prev) ORDER BY prev, next""".stripMargin)),

    // STREAMING Misra-Gries: the same sketch as q127 but as a
    // Structured-Streaming global aggregate in Complete mode — the
    // canonical bounded-state claim for frequent items over an
    // unbounded stream: the state store holds ONE k-counter buffer,
    // never per-key state, while micro-batches merge in via the
    // mergeable-summary combine. Candidates are then exact-verified
    // against the static table exactly as in q127, so the shared
    // brute-force oracle also proves the sketch survived micro-batch
    // merging with zero heavy-hitter loss.
    "q130_streaming_heavy_hitters" -> Q(
      (s, dir) => {
        val keyed = t(s, dir, "events").select(
          when(col("event_id") % 3 === 0,
            concat(lit("hot_"), (col("event_id") % 2).cast("string")))
            .otherwise(
              concat(lit("cold_"), (col("event_id") % 5000).cast("string")))
            .as("key"))
        val src = SlowLogQueries.stableStreamSrc(dir, "hh", keyed)
        val row = SlowLogQueries.withShufflePartitions(s, 8) {
          val stream = s.readStream.schema(keyed.schema)
            .option("maxFilesPerTrigger", 8) // force >1 micro-batch
            .parquet(src)
          val qn = "graft_stream_hh_" +
            java.util.UUID.randomUUID().toString.replace("-", "")
          val query = stream
            .agg(graft.ops.HeavyHitters.candidates(col("key"), 16).as("cand"),
              count(lit(1)).as("n"))
            .writeStream
            .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
            .format("memory").queryName(qn).start()
          try { query.processAllAvailable() } finally { query.stop() }
          s.table(qn).head()
        }
        val cand = row.getSeq[String](0)
        val n = row.getLong(1)
        keyed.filter(col("key").isin(cand: _*))
          .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * 17 > n)
          .select(col("key"), col("cnt"), lit(n).as("n_rows"),
            (col("cnt") * 1000 / n).cast("long").as("share_permille"))
          .orderBy(col("key"))
      },
      Some(
        """WITH kv AS (
          | SELECT CASE WHEN event_id % 3 = 0
          |   THEN 'hot_' || CAST(event_id % 2 AS VARCHAR)
          |   ELSE 'cold_' || CAST(event_id % 5000 AS VARCHAR) END AS key
          | FROM events),
          |nt AS (SELECT count(*) AS n FROM kv),
          |c AS (SELECT key, count(*) AS cnt FROM kv GROUP BY 1)
          |SELECT key, cnt, n AS n_rows,
          | CAST(cnt * 1000 // n AS BIGINT) AS share_permille
          |FROM c, nt WHERE cnt * 17 > n ORDER BY key""".stripMargin)),

    // synchronous label-propagation communities over the near-dup
    // graph (3 unrolled rounds, most-frequent neighbor label,
    // smallest-label ties). The oracle replays the identical rounds
    // as MATERIALIZED CTEs — mode + tie-break are total orders, so
    // the hash pins every round exactly.
    "q131_label_prop" -> Q(
      (s, dir) => GraphOps.labelPropagation(
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rows = 4, num = 1, den = 2), rounds = 3)
        .orderBy(col("node")),
      Some(
        s"""WITH $labelPropCtes
           |SELECT node, lbl AS community FROM l3 ORDER BY node""".stripMargin)),

    // Modularity report of the label-propagation communities over the
    // near-dup graph — the quality number that says whether the
    // partition actually concentrates edges. Everything integer:
    // per community we emit e_in (internal edges), deg_sum, and the
    // contribution 4m*e_in - deg_sum^2; Newman's Q is
    // sum(contrib) / (4m^2), a ratio of emitted integers. Labels join
    // the edge list node-keyed (node-sized frames, plain shuffle
    // joins); the 1-row edge total broadcasts. The contribution is
    // DECIMAL(38,0) unconditionally — int64 dies at m*e_in > 2^61
    // (~1e9 edges), decimal is exact to 1e37 with a data-independent
    // schema (both engines cast identically). The DRIVER-FACING
    // column is the exact decimal as a STRING: final-result DECIMAL
    // is the known cross-engine hash hazard (scripts/check_oracle.py),
    // and a string carries the full 38 digits losslessly where BIGINT
    // truncates and DOUBLE rounds.
    "q166_modularity" -> Q(
      (s, dir) => {
        val pairs = Dedup.minhashPairs(t(s, dir, "documents"), "doc_id",
          "text", n = 3, bands = 4, rows = 4, num = 1, den = 2)
        GraphOps.modularity(pairs,
          GraphOps.labelPropagation(pairs, rounds = 3))
          .withColumn("contrib_4m2", col("contrib_4m2").cast("string"))
      },
      Some(
        s"""WITH $labelPropCtes,
           |m AS (SELECT count(*) AS m FROM pr),
           |e AS (
           | SELECT la.lbl AS community, count(*) AS e_in
           | FROM pr
           | JOIN l3 la ON la.node = pr.id_a
           | JOIN l3 lb ON lb.node = pr.id_b
           | WHERE la.lbl = lb.lbl GROUP BY 1),
           |dg AS (
           | SELECT node, count(*) AS deg FROM (
           |  SELECT id_a AS node FROM pr
           |  UNION ALL SELECT id_b FROM pr) s GROUP BY 1),
           |dc AS (
           | SELECT l3.lbl AS community, sum(dg.deg) AS deg_sum,
           |  count(*) AS n_nodes
           | FROM l3 JOIN dg ON dg.node = l3.node GROUP BY 1)
           |SELECT dc.community, CAST(dc.n_nodes AS BIGINT) AS n_nodes,
           | CAST(coalesce(e.e_in, 0) AS BIGINT) AS e_in,
           | CAST(dc.deg_sum AS BIGINT) AS deg_sum,
           | CAST(dc.deg_sum - 2 * coalesce(e.e_in, 0) AS BIGINT)
           |  AS cut_edges,
           | CAST(CAST(4 * CAST(m.m AS DECIMAL(38,0)) * coalesce(e.e_in, 0)
           |   - CAST(dc.deg_sum AS DECIMAL(38,0)) * dc.deg_sum
           |   AS DECIMAL(38,0)) AS VARCHAR) AS contrib_4m2
           |FROM dc LEFT JOIN e ON e.community = dc.community CROSS JOIN m
           |ORDER BY dc.community""".stripMargin)),
  )

  /** Shared oracle CTE chain for q131/q166: minhash near-dup pairs ->
    * symmetric edges -> three synchronous label-propagation rounds,
    * ending in l3(node, lbl).
    */
  private val labelPropCtes: String = {
    val round = (prev: String, cn: String, ln: String) =>
      s"""$cn AS MATERIALIZED (
         | SELECT s.src, l.lbl, count(*) AS c
         | FROM sym s JOIN $prev l ON l.node = s.dst GROUP BY 1, 2),
         |$ln AS MATERIALIZED (
         | SELECT src AS node, lbl FROM (
         |  SELECT src, lbl, row_number() OVER (
         |   PARTITION BY src ORDER BY c DESC, lbl) AS rn FROM $cn)
         | WHERE rn = 1)""".stripMargin
    s"""${OpsQueries.minhashCtes},
       |pr AS MATERIALIZED (
       | SELECT id_a, id_b FROM chk WHERE i_cnt * 2 >= u_cnt),
       |sym AS MATERIALIZED (
       | SELECT id_a AS src, id_b AS dst FROM pr
       | UNION ALL SELECT id_b, id_a FROM pr),
       |l0 AS MATERIALIZED (
       | SELECT DISTINCT src AS node, src AS lbl FROM sym),
       |${round("l0", "c1", "l1")},
       |${round("l1", "c2", "l2")},
       |${round("l2", "c3", "l3")}""".stripMargin
  }

  /** Shared oracle CTE chain for the winnowing fingerprint table
    * (tok -> per-position 4-gram hashes -> 5-window minima -> distinct
    * fingerprints -> df-capped index), used by q115 and q116.
    */
  private val winnowCtes: String =
    """tok AS (
      | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      | FROM documents),
      |ng AS (
      | SELECT doc_id, i AS pos,
      |  ('0x' || substr(md5(array_to_string(
      |    list_slice(t, i, i + 3), ' ')), 1, 15))::BIGINT AS h
      | FROM tok, unnest(range(1, len(t) - 2)) AS u(i)),
      |w AS (
      | SELECT doc_id, pos,
      |  min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS m,
      |  count(*) OVER (PARTITION BY doc_id ORDER BY pos
      |               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS cnt
      | FROM ng),
      |fp AS MATERIALIZED (SELECT DISTINCT doc_id, m AS fp FROM w WHERE cnt = 5),
      |capped AS MATERIALIZED (SELECT fp FROM fp GROUP BY 1 HAVING count(*) <= 20),
      |fpc AS MATERIALIZED (SELECT doc_id, fp FROM fp JOIN capped USING (fp))""".stripMargin
}
