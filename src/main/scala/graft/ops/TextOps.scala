package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: language
  * ID, quality scoring, token counting, fingerprinting. All are pure
  * narrow Column expressions — no shuffle, fully codegen'd, safe to
  * run inline in a 100 TB scan.
  *
  * Cross-engine determinism rules (the DuckDB oracle must reproduce
  * every value): tokenization splits on single spaces dropping empty
  * tokens; hashes derive from md5 hex prefixes; scores use integer
  * arithmetic only.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** First 8 md5 hex chars as an unsigned 32-bit value in a long —
    * the cross-engine portable string hash
    * (DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** First 15 md5 hex chars (60 bits, positive in signed 64). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Token count by whitespace — HOF form (differential reference). */
  def tokenCountHof(text: Column): Column = size(tokens(text))

  /** Token count by whitespace (fused kernel). */
  def tokenCount(text: Column): Column = TextExpressions.tokenCount(text)

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric symbols each count as one token.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))

  /** Language marker sets for the n-gram-free token-overlap heuristic.
    * Deliberately tiny and documented: language ID at corpus scale is
    * a scoring pass over token sets; swap the marker lists for real
    * profiles without touching the plan shape.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "analytics" -> Seq("query", "table", "join", "group", "sort", "merge"),
    "streaming" -> Seq("stream", "window", "batch", "row", "data"))

  /** Per-language overlap score: |distinct(tokens) ∩ markers|. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(markers.map(lit): _*)))

  /** Predicted language — HOF form (differential reference): argmax of
    * marker overlap with deterministic ties (first in langMarkers order
    * wins; all-zero -> "und").
    */
  def langPredictHof(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, langScore(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Predicted language (fused kernel, one tokenize per row). */
  def langPredict(text: Column): Column =
    TextExpressions.langPredict(text, langMarkers)

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Integer quality signals — HOF form (differential reference):
    * token count, distinct-token count, stopword hits, max token
    * length. Score is a pinned integer formula over them (see quality
    * query oracle).
    */
  def qualitySignalsHof(text: Column): Column = {
    val toks = tokens(text)
    val dtoks = array_distinct(toks)
    struct(
      size(toks).as("n_tokens"),
      size(dtoks).as("n_distinct"),
      size(array_intersect(dtoks, array(stopwords.map(lit): _*))).as("n_stop"),
      array_max(transform(toks, t => length(t))).as("max_tok_len"))
  }

  /** Integer quality signals (fused kernel, one pass per row). */
  def qualitySignals(text: Column): Column =
    TextExpressions.qualitySignals(text, stopwords)

  /** Normalized-content fingerprint — HOF/regex form (differential
    * reference): md5 of lowercased text with runs of whitespace
    * collapsed — the exact-dup key robust to spacing.
    */
  def fingerprintHof(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  /** Normalized-content fingerprint (fused kernel — the regex form
    * measured ~276us/row).
    */
  def fingerprint(text: Column): Column = TextExpressions.fingerprint(text)

  /** Deterministic dataset split assignment: md5-bucket of the id
    * (plus a salt so different experiments draw independent splits)
    * into [0, 100), mapped to named splits by cumulative percentage.
    * Stable across runs, sessions, engines, and cluster layouts —
    * the property random() splits lack.
    *
    * @param splits (name, percent) in order; percents must sum to 100
    */
  def splitAssign(id: Column, salt: String, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val bucket = pmod(hash32(concat(id.cast("string"), lit("_" + salt))), lit(100))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    splits.zip(cum).foldRight(lit(null).cast("string"): Column) {
      case (((name, _), upper), acc) => when(bucket < upper, name).otherwise(acc)
    }
  }

  /** Deterministic per-stratum downsampling: keep a row when its
    * salted md5 bucket (0..999) falls under the stratum's per-mille
    * rate. Engine-, partitioning-, and run-independent (the same rows
    * are kept everywhere — unlike rand()-based .sample), which is what
    * makes rebalancing reproducible and auditable. Strata missing from
    * `permille` keep everything (rate 1000).
    */
  def stratifiedKeep(id: Column, stratum: Column, salt: String,
      permille: Map[String, Int]): Column = {
    val bucket = pmod(hash32(concat(id.cast("string"), lit("_" + salt))), lit(1000))
    val rate = permille.foldRight(lit(1000): Column) {
      case ((s, r), acc) => when(stratum === s, lit(r)).otherwise(acc)
    }
    bucket < rate
  }

  /** Order-independent table fingerprint: bit_xor of a per-row content
    * hash. XOR commutes, so the checksum is independent of row order,
    * partitioning, and merge order — one map-side-combinable aggregate
    * even at 100 TB. Pair with count: xor alone cannot see a row
    * duplicated an even number of times.
    */
  def rowHash(cols: Column*): Column =
    hash32(concat_ws("", cols.map(_.cast("string")): _*))

  /** Polynomial rolling hash over tokens (order-sensitive document
    * fingerprint): fold h = (h*31 + hash32(token)) mod 2^31-1. The
    * modulus keeps every intermediate below 2^37 — no 64-bit overflow
    * in either engine. Sequential fold in both (Spark `aggregate`,
    * DuckDB `list_reduce` with a prepended 0 seed) so results are
    * bit-identical.
    */
  def rollingHashHof(text: Column): Column = {
    val p = lit(2147483647L) // 2^31-1
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + hash32(t), p))
  }

  /** Rolling hash (fused kernel: one MessageDigest, no per-token
    * hex-string round trips).
    */
  def rollingHash(text: Column): Column = TextExpressions.rollingHash(text)

  /** Ordered word n-grams, duplicates KEPT (fused kernel — the
    * counting form; [[ngramsDistinct]] is the set form over the same
    * windows). Sub-n-token text -> empty array.
    */
  def ngrams(text: Column, n: Int): Column =
    TextExpressions.ngrams(text, n, distinct = false)

  /** Distinct word n-grams, first occurrence kept (fused kernel;
    * == array_distinct(ngrams)).
    */
  def ngramsDistinct(text: Column, n: Int): Column =
    TextExpressions.ngrams(text, n, distinct = true)

  /** n-grams — HOF form (differential reference; interpreted, the
    * fused kernel measured ~10x faster on the fan-out queries).
    */
  def ngramsHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals (fused kernel, one pass per row):
    * struct(n_tokens, top_tok_cnt, n_bigrams, n_dup_bigrams). The
    * repetition FILTERS of Rai et al.'s quality pipeline reduce to
    * integer comparisons over these (e.g. most-common-token fraction
    * > 20%  <=>  top_tok_cnt * 5 > n_tokens) — kept as integers so the
    * thresholds never flap cross-engine.
    */
  def repetitionStats(text: Column): Column =
    TextExpressions.repetitionStats(text)

  /** Repetition signals — HOF form (differential reference; quadratic
    * in distinct tokens, never for the hot path).
    */
  def repetitionStatsHof(text: Column): Column = {
    val tk = tokens(text)
    val bigrams = ngramsHof(text, 2)
    struct(
      size(tk).as("n_tokens"),
      array_max(transform(array_distinct(tk),
        t => size(filter(tk, x => x === t)))).as("top_tok_cnt"),
      size(bigrams).as("n_bigrams"),
      (size(bigrams) - size(array_distinct(bigrams))).as("n_dup_bigrams"))
  }

  /** Per-key cap (domain capping): keep at most `n` rows per key,
    * ranked by `order`. One shuffle on the key; the per-key rank is a
    * window, which at 100 TB is exactly the shape you want for
    * "at most N documents per domain" — each domain's rows land on one
    * reducer, and N is small. (For a SKEWED cap with huge N, two-phase
    * salted top-N is the fallback — see Skew.saltedAgg.)
    */
  def capPerKey(df: DataFrame, keyCol: Column, order: Seq[Column],
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** Temperature-flattened source-mixture sampling (alpha = 1/2),
    * exact-integer and deterministic: a source with n docs is kept at
    * rate 1/isqrt(n), so its expected surviving count is ~sqrt(n) —
    * the standard mixture reweighting that keeps one giant crawl
    * source from dominating a training run while never starving small
    * curated ones. A doc survives iff hash32(id) % isqrt(n) == 0 — no
    * random(), so the sample is reproducible across runs, engines and
    * partitionings, and appending data to one source never flips
    * another source's verdicts. isqrt is double sqrt plus an integer
    * correction step (exact below 2^52, i.e. any per-source count).
    * Plan: one map-side-combinable count per source, source-count
    * table broadcast back, per-row hash filter — one tiny shuffle
    * regardless of corpus size.
    */
  def temperatureSample(df: DataFrame, idCol: Column,
      srcCol: Column): DataFrame = {
    val cnts = df.select(srcCol.as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("n_docs"))
      .withColumn("r0", floor(sqrt(col("n_docs"))).cast("long"))
      .withColumn("samp_den",
        when(col("r0") * col("r0") > col("n_docs"), col("r0") - 1)
          .when((col("r0") + 1) * (col("r0") + 1) <= col("n_docs"),
            col("r0") + 1)
          .otherwise(col("r0")))
      .drop("r0")
    df.withColumn("src", srcCol)
      .join(broadcast(cnts), Seq("src"))
      .filter(pmod(hash32(idCol.cast("string")), col("samp_den")) === 0)
  }

  /** Deterministic corpus reshard (the training-data "global shuffle"
    * without random()): shard = salted md5 bucket of the id, position
    * within the shard = rank of a SECOND independent salted hash — so
    * both the shard assignment and the intra-shard order are
    * reproducible across runs, engines, and cluster layouts, and
    * re-running on an appended corpus moves only the new rows.
    * One shuffle on the shard id; per-shard windows rank
    * corpus/nShards rows each.
    */
  def reshard(df: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    val shard = pmod(hash32(concat(col(idCol).cast("string"),
      lit("_" + salt + "_shard"))), lit(nShards))
    val posKey = hash32(concat(col(idCol).cast("string"),
      lit("_" + salt + "_pos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("pos_key"), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("pos_key", posKey)
      .withColumn("pos", row_number().over(w))
      .drop("pos_key")
  }

  /** Deterministic token-budget subsample ("take the first B tokens'
    * worth of docs"): docs are globally ordered by a salted hash
    * (+ id tie-break) and kept while the running token total stays
    * within `budget`. The global cumulative sum — the classic
    * single-partition-sort trap — is computed as a DISTRIBUTED PREFIX
    * SUM instead: the 32-bit hash space is cut into `nBuckets`
    * contiguous ranges (so bucket order == global hash order), each
    * bucket's token total is one map-side-combinable agg, the
    * bucket-count-sized totals row set becomes driver-side prefix
    * offsets (scalar-sized, like IVF centroids), and each bucket then
    * runs an independent windowed cumsum + its offset. Buckets whose
    * offset already exceeds the budget are pruned BEFORE the window —
    * at 100 TB with a 1% budget, 99% of the corpus never reaches the
    * sort.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
      budget: Long, salt: String, nBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val bucketWidth = (1L << 32) / nBuckets
    // null text counts 0 tokens (included, costs no budget) — a bare
    // null would null the windowed cumsum and silently drop the row
    val base = df.select(col(idCol),
      coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("toks"))
      .withColumn("h", hash32(concat(col(idCol).cast("string"),
        lit("_" + salt))))
      .withColumn("bucket", expr(s"h DIV $bucketWidth"))
    val totals = base.groupBy(col("bucket")).agg(sum(col("toks")).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("bucket", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("h"), col(idCol))
    base.join(broadcast(offDf), Seq("bucket"))
      .filter(col("off") < budget) // prune whole buckets past the budget
      .withColumn("cum_tokens", sum(col("toks")).over(w) + col("off"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("toks"), col("cum_tokens"))
  }

  /** Top-k salient terms per doc by an integer-exact tf-idf score:
    * score = tf * ((SCALE * N) DIV df) (rational idf — no ln(), which
    * is libm-dependent and would flap cross-engine hashes). The
    * association matters for overflow: the naive (tf * SCALE * N)
    * DIV df forms tf*SCALE*N first, past 2^63 at tf*N > 9.2e12 —
    * trivially reached at billion-doc scale. Grouping the idf factor
    * first bounds the product by tf * (SCALE*N/df): exact while
    * N < 9.2e12 docs and, per term, tf * idf_scaled < 2^63 — for a
    * df=1 term at N=1e9 that allows tf up to ~9e9, beyond any real
    * document. The inverted index shape at scale: one explode +
    * (doc, token) count for tf, one distinct-doc count for df; df is
    * VOCABULARY-sized, so it broadcasts to the tf join — the
    * corpus-sized side never reshuffles; ranking is windowed per doc.
    *
    * `n` (corpus size) is a driver scalar from one count — at 100 TB
    * this is one cheap agg, or a known catalog statistic.
    */
  /** The tf-idf score with the OVERFLOW-SAFE association (idf factor
    * formed first) — factored out so the overflow spec pins the
    * operator's actual formula at a synthetic billion-doc `n` no
    * test corpus can reach (OpsSpec "tf-idf score association").
    */
  private[ops] def tfidfScore(n: Long, scale: Long = 1000000L): Column =
    expr(s"tf * (($scale * ${n}L) DIV df)")

  def topTfidfTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val n = df.count()
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tok.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    tf.join(broadcast(dfreq), Seq("token"))
      .withColumn("score", tfidfScore(n))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("score"))
  }

  /** Overlapping token-window chunking (the RAG / pretraining
    * chunker): each doc fans out to windows of `chunk` tokens taken
    * every `stride` tokens (overlap = chunk - stride). Pure narrow
    * fan-out — sequence + transform + posexplode, no shuffle; chunk
    * count per doc is ceil(n/stride), so output size is predictable
    * from token counts.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunk >= stride, "need chunk >= stride > 0")
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(0, size(tk) - 1, $stride), s -> " +
            s"concat_ws(' ', slice(tk, s + 1, $chunk)))"))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", tokenCount(col("chunk_text")))
  }

  /** Multi-vector (maxsim, ColBERT-style late-interaction) retrieval:
    * every document becomes a BAG of chunk vectors ([[chunkDocs]]'s
    * token windows, each a `buckets`-dim hashed token-count vector
    * kept SPARSE as (id, chunk, bucket, cnt) rows), and a query
    * (itself a document's chunk bag, ids < nQueries) scores a
    * candidate as
    *
    *   maxsim(q, d) = sum over q's chunks of
    *                    max over d's chunks of dot(qc, dc)
    *
    * — the late-interaction form: each query chunk independently
    * finds its best-matching passage, then evidence sums. All
    * integer-exact (counts, products, sums), so the q276 oracle
    * replays it in closed form. Counts are non-negative, so a
    * (query-chunk, doc) pair whose chunks share NO hash bucket
    * contributes its true max of 0 by simply not appearing.
    *
    * 100 TB posture: the only join is corpus-chunk-buckets against
    * the BROADCAST query bag keyed by bucket (candidates = docs
    * sharing at least one hashed token bucket with the query); the
    * max and sum reductions are two hash aggregates over the dot
    * frame, and the final per-query top-k is one ranking window.
    * No cartesian, nothing corpus-sized on the driver.
    */
  def maxsimTopK(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, topK: Int, chunk: Int = 32, stride: Int = 24,
      buckets: Int = 16): DataFrame = {
    val ch = chunkDocs(docs, idCol, textCol, chunk, stride)
    val vecs = graft.Scratch.cache(ch
      .select(col(idCol).cast("long").as("id"), col("chunk_idx"),
        explode(tokens(col("chunk_text"))).as("tok"))
      .select(col("id"), col("chunk_idx"),
        pmod(hash32(col("tok")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("id"), col("chunk_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))) // query + corpus sides both read it
    val qv = broadcast(vecs.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("chunk_idx").as("qc"),
        col("bucket"), col("cnt").as("qcnt")))
    val dots = vecs.join(qv, Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("qc"), col("id"), col("chunk_idx"))
      .agg(sum(col("qcnt") * col("cnt")).as("dot"))
    val best = dots.groupBy(col("qid"), col("qc"), col("id"))
      .agg(max(col("dot")).as("best"))
    val sc = best.groupBy(col("qid"), col("id"))
      .agg(sum(col("best")).as("maxsim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("maxsim").desc, col("id"))
    sc.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("qid").as("query_id"), col("rnk"),
        col("id").as("doc_id"), col("maxsim"))
  }

  /** Passage-level dedup (the sub-document variant of exact dedup —
    * "remove duplicated paragraphs wherever they recur"): docs split
    * into non-overlapping `chunk`-token passages; a passage survives
    * only at its FIRST global occurrence (min (doc, position) over its
    * content hash); each doc is rebuilt from its surviving passages in
    * position order. One shuffle keyed on the passage md5 (the text
    * rides that shuffle exactly once — it is needed for the rebuild
    * anyway), then one groupBy(doc) for reassembly. Docs whose every
    * passage was seen earlier come back with empty text, not dropped —
    * the caller decides the policy.
    */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
      chunk: Int): DataFrame = {
    val ch = chunkDocs(df, idCol, textCol, chunk, chunk)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("chunk_text")))
      .orderBy(col(idCol), col("chunk_idx"))
    val kept = ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        c => c.getField("chunk_text")), " ").as("text_kept"))
    ch.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** PII redaction patterns: emails, then long digit runs (>= 7 —
    * phone/account numbers; shorter runs are ids/quantities and stay).
    * Both are RE2-compatible (no backrefs/lookarounds), so Java regex
    * (Spark) and RE2 (DuckDB et al.) agree. Spark's regexp_replace is
    * a native codegen expression; if profiling ever shows the
    * backtracking engine hot on a 100 TB scan, the fix is a fused
    * scan kernel like TextExpressions — the patterns need no
    * backtracking.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{7,}"

  /** Redact emails then long digit runs. Email first: an email's
    * local/domain part may contain a long digit run, and the
    * placeholder must win.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(LongNumRe), lit("<NUM>"))

  /** Greedy contiguous sequence packing: docs in a deterministic
    * per-stream order (streamCol partitions, idCol order) are packed
    * into fixed token-budget context blocks; a doc belongs to the
    * block in which its first token falls (cumulative-sum DIV
    * capacity, i.e. concat-then-chunk pretraining layout). Returns
    * per-(stream, block) packing stats.
    *
    * Scale posture: the running sum is a window partitioned by the
    * STREAM column, so each stream's cumsum is independent — parallel
    * across streams, no global single-partition sort (the classic
    * global-cumsum trap). Streams are the unit a packing job shards
    * by anyway (per language / per shard file).
    */
  def packSequences(df: DataFrame, streamCol: String, idCol: String,
      textCol: String, capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(streamCol)).orderBy(col(idCol))
    df.select(col(streamCol), col(idCol),
      tokenCount(col(textCol)).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("block",
        floor((col("cum") - col("toks")) / capacity).cast("long"))
      .groupBy(col(streamCol), col("block"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
  }

  /** Distribution-matching downsample scoreboard: given a target
    * class mix (percents summing to 100), compute the LARGEST corpus
    * scale at which the target mix is achievable without
    * upsampling — scale = min over classes of obs_c / target_c —
    * derive each class's deterministic keep rate in permille, and
    * report per class: observed count, target percent, keep rate,
    * and the count actually kept by the salted md5-bucket rule (the
    * same engine-independent rule the stratified sampler uses).
    *
    * Scale posture: the rate table is class-count-sized (the one
    * single-partition window runs over ~5 rows); docs join to it by
    * class (broadcast-sized side) and the keep rule is a narrow
    * per-row hash — one aggregate pass plus one broadcast join over
    * the corpus, no collect.
    */
  def matchDistribution(docs: DataFrame, idCol: String, classCol: String,
      target: Seq[(String, Int)], salt: String): DataFrame = {
    require(target.map(_._2).sum == 100, "target percents must sum to 100")
    val spark = docs.sparkSession
    val tgt = spark.createDataFrame(target).toDF("cls", "tgt")
    // LEFT join from the TARGET side: a target class with zero
    // observed docs pins the achievable scale to ZERO (the mix is
    // unreachable without upsampling) instead of silently dropping
    // out of the min. All derivations are integer DIV — a double
    // quotient would lose ulps past 2^53 (billion-doc classes) and
    // drift from the oracle's exact `//`.
    val obs = tgt.join(
      docs.groupBy(col(classCol).as("cls")).agg(count(lit(1)).as("nobs")),
      Seq("cls"), "left")
      .select(col("cls"), col("tgt"), coalesce(col("nobs"), lit(0L)).as("obs"))
    // class-domain-sized: the global min attaches via a broadcast
    // 1-row aggregate, never an unpartitioned window
    val rates = Prefix.withGlobal(obs,
      "scale1e6" -> min(expr("(obs * 1000000) DIV tgt")))
      .withColumn("final_n", expr("(scale1e6 * tgt) DIV 1000000"))
      .withColumn("permille",
        when(col("obs") > 0, expr("(final_n * 1000) DIV obs")).otherwise(0L))
      .select(col("cls"), col("obs"), col("tgt").cast("long").as("tgt"),
        col("permille"))
    val bucket = pmod(
      hash32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(1000))
    val kept = docs.select(col(classCol).as("cls"), col(idCol))
      .join(rates.select(col("cls"), col("permille")), Seq("cls"))
      .groupBy(col("cls"))
      .agg(sum(when(bucket < col("permille"), 1L).otherwise(0L)).as("nkept"))
    rates.join(kept, Seq("cls"), "left")
      .select(col("cls"), col("obs"), col("tgt"), col("permille"),
        coalesce(col("nkept"), lit(0L)).as("kept"))
  }

  /** Per-document token-rarity score: rank every vocabulary token by
    * corpus frequency (dense rank, most frequent = 1, ties broken by
    * token), then score each doc as the mean rank of its token
    * OCCURRENCES (integer floor). High scores flag docs built from
    * tail vocabulary — gibberish, code soup, OCR noise — the cheap
    * corpus-relative complement to the per-row quality signals.
    *
    * Scale posture: one explode + one vocabulary aggregate; the
    * ranked vocabulary is vocab-sized (the single-partition rank
    * window runs over it, same bound as the TF-IDF df side) and
    * joins back to occurrences by token. Two shuffles total.
    */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val counts = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    // dense_rank over (cnt DESC, token) — but that key is UNIQUE per
    // row (one row per token), so dense_rank == row_number, which
    // decomposes distributed in TWO levels: (# tokens in strictly-
    // higher count tiers, via the guarded prefix sum over the
    // COUNT-OF-COUNTS domain frame) + (# tokens in the same tier
    // with a strictly-smaller 4-char prefix, a cnt-partitioned
    // prefix sum over the (tier, prefix) frame) + (position within
    // the (tier, prefix) cell). The second level matters: under
    // Zipf's law the cnt=1 tier alone holds ~half the vocabulary, so
    // a window partitioned by cnt ALONE would still funnel hundreds
    // of millions of hapax tokens through one reducer at corpus
    // scale. Prefix-truncation is monotone under Spark's UTF8String
    // byte comparison (UTF-8 byte order == codepoint order), so
    // (cnt DESC, pfx ASC, token ASC) == (cnt DESC, token ASC) and
    // the decomposition is exact.
    val pfx = substring(col("token"), 1, 4)
    val tiers = Prefix.cumSum(
        counts.groupBy(col("cnt")).agg(count(lit(1)).as("m")),
        "cnt", col("m"), "cum_ge", desc = true)
      .select(col("cnt"), (col("cum_ge") - col("m")).as("higher"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cnt")).orderBy(col("pfx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val pfxOffsets = counts
      .groupBy(col("cnt"), pfx.as("pfx")).agg(count(lit(1)).as("mp"))
      .withColumn("smaller", sum(col("mp")).over(wp) - col("mp"))
      .select(col("cnt"), col("pfx"), col("smaller"))
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cnt"), col("pfx")).orderBy(col("token"))
    val ranked = counts.withColumn("pfx", pfx)
      .join(tiers, Seq("cnt"))
      .join(pfxOffsets, Seq("cnt", "pfx"))
      .select(col("token"),
        (col("higher") + col("smaller") + row_number().over(wi))
          .as("rank"))
    tok.join(ranked, Seq("token"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rank")).cast("long").as("rank_sum"))
      .select(col(idCol), col("n_tokens"), col("rank_sum"),
        floor(col("rank_sum") / col("n_tokens")).cast("long").as("rarity"))
  }

  /** Deterministic weighted reservoir: exactly `k` rows per stratum,
    * chosen by ascending integer priority hash * 1e6 DIV weight —
    * the fixed-point analog of A-Res (Efraimidis/Spirakis) weighted
    * sampling without replacement: doubling a row's weight halves
    * its priority, so heavy rows win slots proportionally more
    * often, yet the draw is a pure function of (id, salt) — stable
    * across runs, engines, and partitionings, unlike rand()-based
    * reservoirs. All arithmetic is integer (DIV), never a
    * double-rounded quotient that could flap a cross-engine hash.
    *
    * Scale posture: one windowed pass; the rank<=k filter plans as
    * WindowGroupLimit, so each map task forwards at most k rows per
    * stratum to the shuffle — the reservoir property itself.
    */
  def weightedReservoir(docs: DataFrame, idCol: String, stratumCol: String,
      weight: Column, k: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("pri"), col(idCol))
    docs.select(col(stratumCol).as("stratum"), col(idCol),
      hash32(concat(col(idCol).cast("string"), lit("_" + salt))).as("h"),
      weight.cast("long").as("wt"))
      // zero/negative/null weight = zero selection probability: such
      // rows are EXCLUDED, not given the NULL-sorts-first jackpot a
      // naive DIV would hand them (and the oracle's `//` would error)
      .filter(col("wt") > 0)
      .withColumn("pri", expr("(h * 1000000) DIV wt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("stratum"), col("rn"), col(idCol), col("pri"))
  }

  /** Per-document bigram surprisal: rank each bigram WITHIN its
    * prefix-token group by corpus frequency (dense rank, most common
    * continuation = 1), then score a doc as the mean rank of its
    * bigram occurrences, x100 integer floor. A cheap integer-exact
    * stand-in for conditional-bigram perplexity: docs whose every
    * continuation is the corpus's most likely one score ~100
    * (templated/repetitive), docs full of rank-20 continuations
    * score ~2000 (incoherent token soup).
    *
    * Scale posture: the rank window partitions by the PREFIX token —
    * parallel across the vocabulary, never a global sort (unlike the
    * unigram rarity rank, whose window is vocab-global); one bigram
    * vocabulary aggregate, one join back by bigram.
    */
  def bigramSurprise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs.select(col(idCol).as("id"),
      explode(ngrams(col(textCol), 2)).as("bg"))
    val ranked = bg.groupBy("bg").agg(count(lit(1)).as("cnt"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .select(col("bg"), dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w1")).orderBy(col("cnt").desc, col("bg")))
        .as("rank"))
    bg.join(ranked, Seq("bg"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("rank")).cast("long").as("surprise_sum"))
      .select(col(idCol), col("n_bigrams"), col("surprise_sum"),
        floor(col("surprise_sum") * 100 / col("n_bigrams")).cast("long")
          .as("surprise_x100"))
  }

  /** Per-doc bigram language-model surprisal in integer BITS — the
    * perplexity-proxy quality filter, engine-exactly: surprisal of a
    * bigram is bitlen(C(w1 ·)) - bitlen(C(w1 w2)) ~ -log2 P(w2|w1)
    * (bitlen = length of the binary representation, the established
    * cross-engine integer-log2: Spark `length(conv(x,10,2))` ==
    * DuckDB `length(printf('%b',x))`). Unlike [[bigramSurprise]]
    * (occurrence-RANK-based), this scores actual probability ratios,
    * so rare continuations of common prefixes — the fluency signal a
    * perplexity filter keys on — dominate.
    *
    * Scale: both count tables are bigram-VOCABULARY-sized; the prefix
    * totals derive from the bigram counts (no second corpus pass);
    * the corpus shuffles once on the gram key to pick up its score —
    * the q123 shape. No sort, no driver state.
    */
  def lmSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs.select(col(idCol).as("id"),
      explode(ngrams(col(textCol), 2)).as("bg"))
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val bits = c2.join(c1, Seq("w1"))
      .select(col("bg"),
        (length(conv(col("c1"), 10, 2)) - length(conv(col("c2"), 10, 2)))
          .cast("long").as("bits"))
    bg.join(bits, Seq("bg"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("bits_sum"))
      .withColumn("bits_x100", expr("bits_sum * 100 DIV n_bigrams"))
  }

  /** BM25 top-k lexical retrieval, in an exact-integer rank-preserving
    * form — the lexical arm of a hybrid retrieval stack (the embedding
    * arm is [[Similarity]]'s ANN family; q208 fuses rankings via RRF).
    *
    * Queries are data-derived (deterministic): for each probe doc
    * (id < nQueries), the distinct first `qTerms` tokens. Scoring is
    * Okapi BM25 at the standard k1 = 1.2, b = 0.75, made integer by
    * clearing denominators (k1 = 6/5, b = 3/4):
    *
    *   tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    *     == 22*tf*avgdl / (10*tf*avgdl + 3*avgdl + 9*dl)
    *
    * so term = idf * 22000 * tf * avgdl DIV (10*tf*avgdl + 3*avgdl
    * + 9*dl) — ONE truncating division per (query term, doc), summed.
    * idf is the cross-engine integer log2: bitlen(N DIV df) - 1 =
    * floor(log2(N/df)); terms in more than half the corpus get idf 0
    * and are pruned BEFORE candidate generation (exactly the stopword
    * cut classic BM25 approximates — their score contribution is
    * identically 0, and the pruning is part of the contract: a doc
    * matching ONLY such terms is not a candidate). avgdl = total
    * terms DIV total docs (all docs, term-less included).
    *
    * The indexing unit is the word `gram`-gram (gram = 1 is classic
    * unigram BM25). On small-vocabulary corpora every unigram is a
    * stopword by the idf-0 rule (the synthetic `documents` table:
    * ~30 words, each in ~80% of docs) and unigram BM25 rightly
    * retrieves nothing — bigrams restore a discriminative term space
    * there, exactly as phrase indexing does in production engines.
    *
    * Overflow: idf <= 62, so idf * 22000 * tf * avgdl stays in long
    * for tf * avgdl up to ~6.7e12 — petabyte-corpus safe for any
    * realistic document length.
    *
    * 100 TB posture: the corpus tokenizes ONCE into a (doc, term) tf
    * aggregate (map-side combined); query terms, their df counts, and
    * the global scalars are catalog-sized broadcasts, so candidate
    * generation is a broadcast semi-join that touches only posting
    * lists of the (pruned) query terms; the only corpus-keyed shuffle
    * joins the candidate set to per-doc lengths (AQE broadcasts the
    * candidate side at runtime when small). The final top-k window
    * partitions by query over candidates only.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, qTerms: Int, topK: Int, gram: Int = 1): DataFrame = {
    require(topK >= 1, s"need positive topK, got $topK")
    val sc = bm25Scores(docs, idCol, textCol, nQueries, qTerms, gram)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    sc.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid").as("query_id"), col("rnk").cast("long").as("rnk"),
        col("id").as("doc_id"), col("score"))
  }

  /** The [[bm25TopK]] candidate scores before ranking — one row per
    * (query, candidate doc matching >= 1 positive-idf query term),
    * columns (qid, id, score). Exposed so fusion queries (RRF with a
    * dense ranking) can rank the full candidate list their own way.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, qTerms: Int, gram: Int): DataFrame = {
    require(nQueries >= 1 && qTerms >= 1 && gram >= 1,
      s"need positive nQueries/qTerms/gram, got " +
        s"($nQueries, $qTerms, $gram)")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(ngrams(col(textCol), gram)).as("t"))
    val tf = graft.Scratch.cache(
      toks.groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val g = broadcast(docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum(col("dl")).as("toktot")))
      .select(col("n"), expr("toktot DIV n").as("avgdl")))
    val qt = broadcast(docs.filter(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("qid"),
        explode(array_distinct(slice(ngrams(col(textCol), gram), 1, qTerms)))
          .as("t")))
    val dfq = broadcast(tf.join(qt.select(col("t")).distinct(), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df")))
    val cand = tf.join(qt, Seq("t"))
      .join(dfq, Seq("t"))
      .crossJoin(g)
      .withColumn("idf",
        (length(conv(expr("n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .join(dl, Seq("id"))
      .withColumn("term", expr(
        "idf * 22000 * tf * avgdl DIV (10*tf*avgdl + 3*avgdl + 9*dl)"))
    cand.groupBy(col("qid"), col("id"))
      .agg(sum(col("term")).as("score"))
  }

  /** BM25 with pseudo-relevance-feedback query expansion (two-round
    * retrieval, the classic PRF shape): round 1 ranks by [[bm25Scores]];
    * the top `fbDocs` documents per query are assumed relevant; the
    * `fbTerms` highest-weight NEW terms from those documents (weight =
    * feedback tf x idf, positive-idf only, original query terms
    * excluded, ties to the lexicographically first term) join the
    * query; round 2 rescores the corpus with the expanded term set
    * (expansion terms weigh like originals — the simplest Rocchio
    * point, documented as contract) and returns the top `topK`.
    *
    * Bounded driver step: the feedback set is nQueries x fbDocs
    * (qid, doc) pairs — collected like a codebook, never the corpus.
    * Everything else is the [[bm25Scores]] machinery: catalog-sized
    * broadcasts meeting the one corpus-wide postings aggregate.
    */
  def bm25PrfTopK(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, qTerms: Int, topK: Int, gram: Int,
      fbDocs: Int, fbTerms: Int): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1,
      s"need positive fbDocs/fbTerms, got ($fbDocs, $fbTerms)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    // ONE postings aggregate serves both rounds (the second corpus
    // tokenization a bm25Scores call would pay is the dominant cost)
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(ngrams(col(textCol), gram)).as("t"))
    val tf = graft.Scratch.cache(
      toks.groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf")))
    val dl = graft.Scratch.cache(
      tf.groupBy(col("id")).agg(sum(col("tf")).as("dl")))
    val scal = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum(col("dl")).as("toktot")))
      .select(col("n"), expr("toktot DIV n").as("avgdl"))
      .collect().head
    val n = scal.getAs[Long]("n")
    val avgdl = scal.getAs[Long]("avgdl")
    val qt = broadcast(docs.filter(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("qid"),
        explode(array_distinct(slice(ngrams(col(textCol), gram), 1, qTerms)))
          .as("t")))
    def idfOf(termSet: DataFrame): DataFrame =
      broadcast(tf.join(termSet, Seq("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("df"))
        .withColumn("idf",
          (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
        .filter(col("idf") > 0)
        .select(col("t"), col("idf")))
    def rescore(qw: DataFrame): DataFrame =
      tf.join(qw, Seq("t"))
        .join(dl, Seq("id"))
        .withColumn("term", expr(
          s"idf * 22000 * tf * $avgdl DIV " +
            s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
        .groupBy(col("qid"), col("id")).agg(sum(col("term")).as("score"))

    // round 1: the original query terms, exactly bm25Scores' values
    val qw1 = qt.join(idfOf(qt.select(col("t")).distinct()), Seq("t"))
      .select(col("qid"), col("t"), col("idf"))
    val fbPairs = rescore(broadcast(qw1))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= fbDocs)
      .select(col("qid"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val fb = broadcast(docs.sparkSession
      .createDataFrame(fbPairs.toSeq).toDF("qid", "id"))

    // expansion: feedback term weights -> idf -> top NEW terms
    val fbw = broadcast(tf.join(fb, Seq("id"))
      .groupBy(col("qid"), col("t")).agg(sum(col("tf")).as("fbw")))
    val dfe = idfOf(fbw.select(col("t")).distinct())
    val wE = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy((col("fbw") * col("idf")).desc, col("t"))
    val expTerms = fbw.join(dfe, Seq("t"))
      .join(qt, Seq("qid", "t"), "left_anti")
      .withColumn("rn", row_number().over(wE))
      .filter(col("rn") <= fbTerms)
      .select(col("qid"), col("t"), col("idf"))
    val qw2 = broadcast(qw1.unionByName(expTerms))
    rescore(qw2).withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid").as("query_id"), col("rnk").cast("long").as("rnk"),
        col("id").as("doc_id"), col("score"))
  }

  /** FROZEN BM25 collection statistics for the streaming embodiment:
    * (query-weight table (qid, t, idf) — idf-0 terms already pruned,
    * catalog-sized, broadcast to every micro-batch — and the integer
    * avgdl scalar). Exactly [[bm25Scores]]'s internal stats, exposed
    * so arrivals can be scored per micro-batch with NO cross-batch
    * state beyond these constants: a document's score needs only its
    * own tokens + the frozen table, which is what makes BM25 serving
    * embarrassingly streamable once the index statistics are pinned.
    */
  def bm25FrozenStats(docs: DataFrame, idCol: String, textCol: String,
      nQueries: Int, qTerms: Int, gram: Int): (DataFrame, Long) = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(ngrams(col(textCol), gram)).as("t"))
    val qt = broadcast(docs.filter(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("qid"),
        explode(array_distinct(slice(ngrams(col(textCol), gram), 1, qTerms)))
          .as("t")))
    val scal = docs.agg(count(lit(1)).as("n"))
      .crossJoin(toks.agg(count(lit(1)).as("toktot")))
      .select(col("n"), expr("toktot DIV n").as("avgdl"))
      .collect().head
    val n = scal.getAs[Long]("n")
    val avgdl = scal.getAs[Long]("avgdl")
    val dfq = toks.select(col("id"), col("t")).distinct()
      .join(qt.select(col("t")).distinct(), Seq("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val qw = qt.join(broadcast(dfq), Seq("t"))
      .withColumn("idf",
        (length(conv(expr(s"$n DIV df"), 10, 2)) - 1).cast("long"))
      .filter(col("idf") > 0)
      .select(col("qid"), col("t"), col("idf"))
    (qw, avgdl)
  }

  /** Score a frame of ARRIVING documents against [[bm25FrozenStats]]:
    * per-arrival tf/dl derive from the arrival's own tokens (complete
    * within any micro-batch — rows are whole documents), the weight
    * table broadcasts, and the per-(query, doc) scores are exactly
    * [[bm25Scores]]'s — the shared q260 oracle is the proof.
    */
  def bm25ScoreArrivals(arrivals: DataFrame, idCol: String,
      textCol: String, qw: DataFrame, avgdl: Long, gram: Int): DataFrame = {
    val toks = arrivals.select(col(idCol).cast("long").as("id"),
      explode(ngrams(col(textCol), gram)).as("t"))
    val tf = graft.Scratch.cache(
      toks.groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    tf.join(broadcast(qw), Seq("t"))
      .join(dl, Seq("id"))
      .withColumn("term", expr(
        s"idf * 22000 * tf * $avgdl DIV " +
          s"(10*tf*$avgdl + 3*$avgdl + 9*dl)"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("term")).as("score"))
  }

  /** Mixture reweighting plan (the DoReMi-style "hit these domain
    * shares" step, downsample-only): given target corpus shares in
    * permille, emit per source the integer keep-rate that realizes
    * the target — capped at 1000 (no upsampling) — plus the expected
    * post-sampling doc count and the deficit where the source simply
    * has too few docs. All arithmetic integer permille; sources
    * absent from `targets` get target 0 (dropped by the plan), and
    * targets absent from the corpus (a typo'd source name, an empty
    * domain) still emit a row with n_docs=0 / keep_permille=0 and the
    * full target mass as deficit — a silent disappearance would read
    * as "share satisfied" when the source contributed nothing.
    *
    * Scale: one map-side-combinable count per source + catalog-sized
    * broadcast joins; the corpus itself never shuffles.
    */
  def mixtureReweight(docs: DataFrame, srcCol: Column,
      targets: Seq[(String, Int)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(srcCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val tgt = targets.toDF("source", "target_permille")
    // present sources (target 0 if unlisted) ∪ corpus-absent targets.
    // Union-of-two-broadcast-joins rather than one full-outer join:
    // full outer can't broadcast-hash, and both sides here are
    // catalog-sized, so this keeps the q175 no-shuffle plan pin.
    val present = counts.join(broadcast(tgt), Seq("source"), "left")
      .na.fill(0, Seq("target_permille"))
      .select(col("source"), col("n_docs"), col("target_permille"))
    val absent = tgt
      .join(broadcast(counts.select(col("source"))), Seq("source"), "left_anti")
      .select(col("source"), lit(0L).as("n_docs"), col("target_permille"))
    present.unionByName(absent)
      .crossJoin(broadcast(counts.agg(
        coalesce(sum(col("n_docs")), lit(0L)).as("n_total"))))
      .withColumn("keep_permille",
        when(col("n_docs") === 0L, lit(0L)).otherwise(
          least(lit(1000L), expr("(target_permille * n_total) DIV n_docs"))))
      .withColumn("expected_docs", expr("(n_docs * keep_permille) DIV 1000"))
      .withColumn("deficit_docs",
        greatest(lit(0L), expr("(target_permille * n_total) DIV 1000 - expected_docs")))
      .select(col("source"), col("n_docs"), col("target_permille"),
        col("keep_permille"), col("expected_docs"), col("deficit_docs"))
  }

  /** Token-balanced curriculum phases: order docs by an integer
    * difficulty score (easiest first, id tie-break) and cut the
    * sequence into `phases` contiguous groups of ~equal TOKEN mass —
    * phase = ((cumulative_tokens - 1) * phases) DIV total. The
    * global cumulative sum uses the [[tokenBudgetSample]] distributed
    * prefix-sum shape, with buckets cut on the SCORE DOMAIN (so
    * bucket order == score order): per-bucket totals to the driver
    * (bucket-count-sized), prefix offsets broadcast back, windowed
    * cumsum per bucket. No global sort, no single-partition window.
    */
  def curriculumPhases(docs: DataFrame, idCol: String, scoreCol: Column,
      tokCol: Column, phases: Int, nBuckets: Int = 32): DataFrame =
    curriculumAssign(docs, idCol, scoreCol, tokCol, phases, nBuckets)
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .orderBy(col("phase"))

  /** The per-doc phase assignment behind [[curriculumPhases]]:
    * (id, score, toks, phase) — the artifact a trainer's data loader
    * consumes (CurateCorpus writes it as `curriculum/`).
    */
  def curriculumAssign(docs: DataFrame, idCol: String, scoreCol: Column,
      tokCol: Column, phases: Int, nBuckets: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"),
      scoreCol.cast("long").as("score"),
      coalesce(tokCol.cast("long"), lit(0L)).as("toks"))
    val agg = base.agg(count(lit(1)), max(col("score")),
      sum(col("toks"))).head()
    // empty input (upstream filter/decontam dropped every doc):
    // return the empty assignment rather than NPE on getLong. A
    // NON-empty frame whose score column is all-null is a caller
    // bug (wrong column / all-null signal) — fail loudly instead of
    // silently emitting zero rows.
    if (agg.getLong(0) == 0L) {
      return base.withColumn("phase", lit(0L))
        .select(col("id"), col("score"), col("toks"), col("phase"))
        .limit(0)
    }
    require(!agg.isNullAt(1),
      "curriculumAssign: score column is null for every row — " +
        "check the scoreCol expression")
    val maxS = agg.getLong(1); val total = math.max(agg.getLong(2), 1L)
    val b = base.withColumn("bucket",
      expr(s"(score * $nBuckets) DIV ${maxS + 1}"))
    val totals = b.groupBy(col("bucket")).agg(sum(col("toks")).as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    val offDf = offsets.toSeq.toDF("bucket", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("score"), col("id"))
    b.join(broadcast(offDf), Seq("bucket"))
      .withColumn("cum", sum(col("toks")).over(w) + col("off"))
      .withColumn("phase", expr(s"((cum - 1) * $phases) DIV $total"))
      .select(col("id"), col("score"), col("toks"), col("phase"))
  }

  /** Degenerate-repetition detector (the "model is looping" / spammy
    * filler signal): per doc, the longest run of identical
    * CONSECUTIVE tokens ("go go go go" -> 4) and the longest chain of
    * period-2 bigram repeats ("a b a b a b" -> the bigram "a b"
    * occurs 3 times at stride 2 -> 3). Both in ONE narrow HOF pass
    * over the token array — no explode, no shuffle, no per-token
    * window; the aggregation state is six scalars.
    *
    * The period-2 recurrence: r_i = 1 + (s_i == s_{i-2} ? r_{i-2} :
    * 0) over bigrams s_i, tracked with two alternating run counters
    * (the parity chains) plus the last three tokens.
    */
  def repeatRuns(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val acc0 = struct(
      lit(null).cast("string").as("p1"), lit(null).cast("string").as("p2"),
      lit(null).cast("string").as("p3"),
      lit(0L).as("run1"), lit(0L).as("best1"),
      lit(0L).as("runA"), lit(0L).as("runB"), lit(0L).as("best2"))
    val stepped = aggregate(tokens(col(textCol)), acc0, (a, t) => {
      val same1 = a.getField("p1").isNotNull && (a.getField("p1") === t)
      val run1 = when(same1, a.getField("run1") + 1L).otherwise(lit(1L))
      // bigram (p1, t) vs the one two back (p3, p2): runB holds the
      // stride-2 chain length ending at s_{i-2}; after the step the
      // counters swap parity
      val sameBg = a.getField("p1").isNotNull && a.getField("p3").isNotNull &&
        (t === a.getField("p2")) && (a.getField("p1") === a.getField("p3"))
      val newRun = when(sameBg, a.getField("runB") + 1L)
        .otherwise(when(a.getField("p1").isNotNull, lit(1L)).otherwise(lit(0L)))
      struct(t.as("p1"), a.getField("p1").as("p2"), a.getField("p2").as("p3"),
        run1.as("run1"), greatest(a.getField("best1"), run1).as("best1"),
        newRun.as("runA"), a.getField("runA").as("runB"),
        greatest(a.getField("best2"), newRun).as("best2"))
    })
    docs.select(col(idCol),
      coalesce(size(tokens(col(textCol))), lit(0)).cast("long").as("n_tokens"),
      coalesce(stepped.getField("best1"), lit(0L)).as("max_token_run"),
      coalesce(stepped.getField("best2"), lit(0L)).as("max_bigram_loop"))
  }

  /** Cross-label n-gram leakage matrix: for every unordered label
    * pair, how many DISTINCT n-grams appear under both labels — the
    * split-hygiene audit that catches e.g. the same boilerplate (or
    * the same document) filed under two languages or two training
    * splits. No pair join on docs: (gram, label) is deduplicated,
    * grams collapse to their label SET (bounded by the label-domain
    * size), and pairs explode from that tiny set — gram strings
    * shuffle once.
    */
  def crossLabelLeakage(docs: DataFrame, idCol: String, labelCol: Column,
      textCol: String, n: Int = 8): DataFrame = {
    val gl = docs.select(labelCol.as("lab"),
        explode(ngramsDistinct(col(textCol), n)).as("gram"))
      .distinct()
    gl.groupBy(col("gram")).agg(collect_set(col("lab")).as("labs"))
      .filter(size(col("labs")) >= 2)
      .select(explode(col("labs")).as("lab_a"), col("labs"))
      .select(col("lab_a"), explode(col("labs")).as("lab_b"))
      .filter(col("lab_a") < col("lab_b"))
      .groupBy(col("lab_a"), col("lab_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("lab_a"), col("lab_b"))
  }

  /** Prefix-template mining (the "same form letter / scraped page
    * shell" families): the template key is the first `k` tokens with
    * digit runs collapsed to `<N>`, keyed by its md5 (32 hex chars on
    * the wire regardless of template length, collision-safe at corpus
    * scale where a 32-bit hash is not). One groupBy on the md5 key;
    * output bounded by the HAVING >= 2 filter. Digit collapse uses
    * the Java-and-RE2-compatible `[0-9]+` (the q132 regex subset
    * discipline) so the oracle's regexp_replace agrees byte-for-byte.
    */
  def prefixTemplates(docs: DataFrame, srcCol: Column, textCol: String,
      k: Int = 6): DataFrame = {
    val tpl = concat_ws(" ", transform(
      slice(tokens(col(textCol)), 1, k),
      t => regexp_replace(t, lit("[0-9]+"), lit("<N>"))))
    docs.filter(col(textCol).isNotNull)
      .select(md5(tpl.cast("binary")).as("tpl_md5"), srcCol.as("source"))
      .groupBy(col("tpl_md5"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= 2)
  }

  /** Cross-document boilerplate audit (CCNet-style line dedup,
    * re-expressed over fixed token segments since the corpus carries
    * no newlines): cut each doc into consecutive `segLen`-token
    * segments, count DISTINCT docs per segment, and flag segments
    * present in more than `maxDocs` docs as boilerplate. Output is
    * one row per doc: total segments, boilerplate segments, and the
    * integer boilerplate percentage.
    *
    * Scale posture: one explode (n_tokens/segLen rows per doc), one
    * groupBy on the 60-bit segment hash — segments never shuffle as
    * strings, only as longs — and the doc-frequency side joins back
    * by the same hash. No self-join, no all-pairs; this is the
    * filter that removes nav bars / cookie banners from a crawl at
    * corpus scale, one shuffle each way.
    */
  def boilerplateStats(docs: DataFrame, idCol: String, textCol: String,
      segLen: Int = 8, maxDocs: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val seg = docs
      .filter(size(toks) > 0)
      .select(col(idCol).as("id"),
        explode(transform(
          sequence(lit(0),
            ((size(toks) + segLen - 1) / segLen).cast("int") - 1),
          i => concat_ws(" ", slice(toks, i * segLen + 1, lit(segLen)))))
          .as("seg"))
      .select(col("id"), hash60(col("seg")).as("sh"))
    val segDf = seg.groupBy("sh")
      .agg(countDistinct(col("id")).as("ndocs"))
    seg.join(segDf, Seq("sh"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("ndocs") > maxDocs, 1L).otherwise(0L)).as("n_boiler"))
      .select(col(idCol), col("n_segs"), col("n_boiler"),
        (col("n_boiler") * 100 / col("n_segs")).cast("long")
          .as("pct_boiler"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): hash every token `n`-gram by position, then keep the
    * MINIMUM hash of each `w`-position window — any shared substring
    * of length >= n + w - 1 tokens is GUARANTEED to share a
    * fingerprint, while only ~2/(w+1) of positions are kept. Returns
    * the distinct (id, fp) fingerprint table.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 5): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(TextExpressions.winnow(col(textCol), n, w)).as("fp"))

  /** Winnowing fingerprints — HOF form (differential reference for
    * the fused kernel): per-position hash array, window minima via
    * slice + array_min, per-doc distinct. Fully narrow like the
    * kernel, but interpreted per element.
    */
  def winnowFingerprintsHof(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 5): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .filter(size(toks) >= n + w - 1)
      .select(col(idCol).as("id"),
        transform(sequence(lit(1), size(toks) - n + 1),
          i => hash60(concat_ws(" ", slice(toks, i, lit(n))))).as("hs"))
      .select(col("id"),
        explode(array_distinct(
          transform(sequence(lit(1), size(col("hs")) - w + 1),
            j => array_min(slice(col("hs"), j, lit(w)))))).as("fp"))
  }

  /** Document-overlap pairs through the winnowing fingerprint index:
    * pairs sharing >= `minShared` fingerprints, with the shared
    * count. Fingerprints present in more than `maxDf` docs are
    * dropped FIRST (a hub fingerprint is boilerplate by definition
    * and would quadratically explode its bucket — same cap
    * discipline as the TF-IDF posting lists, ops/DocSim.scala).
    *
    * Scale posture: the join is an inverted-index bucket join whose
    * per-bucket fan-out is bounded by maxDf^2; no all-pairs, no
    * broadcast of anything data-sized.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4, w: Int = 5, maxDf: Int = 20,
      minShared: Int = 5): DataFrame = {
    val fp = graft.Scratch.cache(winnowFingerprints(docs, idCol, textCol, n, w))
    val capped = fp.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val fpc = graft.Scratch.cache(fp.join(capped, Seq("fp")))
    fpc.select(col("fp"), col("id").as("id_a"))
      .join(fpc.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Winsorized length statistics per group: exact loPermille /
    * hiPermille cutoffs on an integer value column, the value sum
    * after clipping to [lo_cut, hi_cut], and how many rows each side
    * clipped — the robust-stats report that decides outlier-length
    * truncation policy before tokenization.
    *
    * Exact percentiles WITHOUT a corpus-scale sort: the corpus
    * collapses once to a (group, value) histogram (value-DOMAIN
    * sized); the cumulative window that locates the cutoffs and the
    * clipped re-aggregation both run on the histogram. Rank rule:
    * cut = smallest v whose cumulative count reaches
    * ceil(n * permille / 1000) — ceil via the integer identity
    * cum * 1000 >= n * p. All arithmetic is integer-exact, so DuckDB
    * reproduces the hashes bit-for-bit.
    */
  def winsorizedStats(df: DataFrame, groupCol: Column, valueCol: Column,
      loPermille: Int, hiPermille: Int): DataFrame = {
    require(0 <= loPermille && loPermille <= hiPermille && hiPermille <= 1000,
      s"need 0 <= lo <= hi <= 1000, got ($loPermille, $hiPermille)")
    import org.apache.spark.sql.expressions.Window
    // NULL values are excluded by contract (a NULL length has no rank;
    // keeping them would also diverge cross-engine — Spark windows
    // sort NULLS FIRST ascending, DuckDB NULLS LAST)
    val hist = df.filter(valueCol.isNotNull)
      .groupBy(groupCol.as("grp"), valueCol.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val cuts = h.groupBy(col("grp")).agg(
      max(col("n")).as("n"),
      min(when(col("cum") * 1000 >= col("n") * loPermille, col("v")))
        .as("lo_cut"),
      min(when(col("cum") * 1000 >= col("n") * hiPermille, col("v")))
        .as("hi_cut"))
    hist.join(broadcast(cuts), Seq("grp"))
      .groupBy(col("grp"))
      .agg(
        max(col("n")).as("n"),
        max(col("lo_cut")).cast("long").as("lo_cut"),
        max(col("hi_cut")).cast("long").as("hi_cut"),
        sum(greatest(least(col("v"), col("hi_cut")), col("lo_cut")) *
          col("cnt")).cast("long").as("winsor_sum"),
        sum(when(col("v") < col("lo_cut"), col("cnt")).otherwise(0L))
          .cast("long").as("clipped_lo"),
        sum(when(col("v") > col("hi_cut"), col("cnt")).otherwise(0L))
          .cast("long").as("clipped_hi"))
      // integer DIV: double `/` rounds above 2^53, breaking the
      // bit-for-bit claim once summed chars pass ~9e12
      .withColumn("winsor_mean_permille",
        expr("(winsor_sum * 1000) DIV n"))
  }

  /** Corpus novelty growth curve: how many NEW distinct n-grams each
    * id-range bucket introduces (first-occurrence bucket per gram) —
    * the diminishing-returns chart for "is more of this corpus worth
    * crawling". Buckets are (id * buckets) DIV (max_id + 1), so the
    * curve follows ingestion order without a sort.
    *
    * Scale posture: one gram-keyed shuffle (min is map-side
    * combinable) off the fused n-gram kernel; the bucket frame is
    * `buckets` rows. Output: decile, new_grams, cum_grams,
    * share_permille.
    */
  def noveltyCurve(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = df.agg(max(col(idCol)).as("m"))
    val firstDec = df.crossJoin(broadcast(mx))
      .select(expr(s"($idCol * $buckets) DIV (m + 1)").as("dec"),
        explode(ngramsDistinct(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(min(col("dec")).as("decile"))
    // `buckets` rows — cached so the Prefix guard's stats pass doesn't
    // recompute the gram aggregate
    val byDec = graft.Scratch.cache(firstDec.groupBy(col("decile"))
      .agg(count(lit(1)).as("new_grams")))
    Prefix.cumSum(
      Prefix.withGlobal(byDec, "total" -> sum(col("new_grams"))),
      "decile", col("new_grams"), "cum_grams")
      .select(col("decile"), col("new_grams"),
        col("cum_grams").cast("long").as("cum_grams"),
        expr("(new_grams * 1000) DIV total").as("share_permille"))
  }

  /** Per-group vocabulary richness with the bias-corrected Chao1
    * estimate of TOTAL (unseen-included) vocabulary:
    * chao1 = D + f1*(f1-1) / (2*(f2+1)), where D = observed distinct
    * tokens, f1 = singletons, f2 = doubletons — the data-card number
    * that says how much vocabulary another crawl of the same source
    * would add. Integer DIV keeps it exact (f1 caps at the vocabulary,
    * ~10^9 at web scale, so f1*(f1-1) stays under 2^63).
    *
    * Scale posture: the corpus collapses ONCE to (group, token)
    * occurrence counts — group × vocab sized, one shuffle — and every
    * later frame is group-keyed. No windows, no joins.
    */
  def vocabRichness(df: DataFrame, groupCol: Column,
      textCol: Column): DataFrame =
    df.select(groupCol.as("grp"), explode(tokens(textCol)).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("d_observed"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).cast("long").as("f2"),
        sum(col("cnt")).cast("long").as("n_tokens"))
      .withColumn("chao1",
        expr("d_observed + (f1 * (f1 - 1)) DIV (2 * (f2 + 1))"))
      .select(col("grp"), col("n_tokens"), col("d_observed"),
        col("f1"), col("f2"), col("chao1"))

  /** Hashed-n-gram importance weights (the DSIR recipe, Xie et al.
    * 2023): score every document by how target-like its content
    * distribution is, using hashed bigram features — the selection
    * signal for skewing a raw crawl toward a target domain WITHOUT a
    * trained classifier. Each bigram occurrence hashes into one of
    * `buckets` feature buckets; the per-bucket score is a smoothed
    * target-share estimate in ppm,
    *   score(b) = ((tgt_cnt + 1) * 1e6) DIV (all_cnt + 2),
    * i.e. P(target | bucket) with add-one smoothing — DSIR's
    * log-likelihood-ratio is replaced by this rational share so both
    * engines agree bit-for-bit (no transcendental log cross-engine).
    * A document's weight is the sum of its occurrences' bucket
    * scores; w_avg (integer mean) is the resampling score, and
    * `selected` applies a fixed threshold deterministic across
    * engines (swap for q126's weighted reservoir to sample instead
    * of cut).
    *
    * 100 TB posture: two narrow passes over the exploded bigrams —
    * a bucket-keyed aggregate whose output is `buckets` rows
    * (map-side combinable, broadcast back), and a doc-keyed
    * aggregate joined against that broadcast. Nothing corpus-sized
    * shuffles on a non-doc key. Overflow: (tgt_cnt + 1) * 1e6 needs
    * tgt_cnt < 9.2e12 occurrences PER BUCKET — at a trillion-bigram
    * corpus size the bucket counts approach that only if `buckets`
    * is tiny; widen to DECIMAL(38,0)/HUGEINT past it. Docs with no
    * bigram (< 2 tokens) carry no evidence and are absent from the
    * output — a length floor upstream is the usual companion.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, selectThreshold: Long): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def ex = df.select(col(idCol).as("id"),
      isTarget.cast("long").as("tgt"),
      explode(ngrams(col(textCol), 2)).as("g"))
      .select(col("id"), col("tgt"),
        pmod(hash32(col("g")), lit(buckets.toLong)).as("b"))
    val score = ex.groupBy(col("b"))
      .agg(sum(col("tgt")).as("t"), count(lit(1)).as("r"))
      .select(col("b"), expr("((t + 1) * 1000000) DIV (r + 2)").as("score"))
    ex.join(broadcast(score), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("score")).as("w_sum"))
      .select(col("id"), col("n_grams"), col("w_sum"),
        expr("w_sum DIV n_grams").as("w_avg"))
      .withColumn("selected",
        (col("w_avg") >= selectThreshold).cast("long"))
  }

  /** PMI collocation mining: the top-k adjacent token pairs ranked by
    * pointwise mutual information — the corpus-statistics op behind
    * phrase detection (merge "new york" into one token before BPE /
    * embedding training).
    *
    * Determinism: PMI's log and its constant corpus factors are
    * monotone decorations — ranking by n_xy / (n_x * n_y) is
    * rank-equivalent to ranking by PMI within one corpus. We emit the
    * integer score n_xy * SCALE DIV (n_x * n_y) (SCALE = 1e6; exact
    * while n_x * n_y < 2^63 / 1e6 — unigram pair products to ~9e12,
    * i.e. two tokens of ~3M occurrences each; larger corpora shrink
    * SCALE) with a min-count floor to suppress noise pairs, ordered
    * (score desc, bigram asc) — fully reproducible cross-engine.
    *
    * Scale: unigram and bigram counts are two key-shuffles with
    * map-side partials; unigram counts are VOCABULARY-sized, so both
    * enrichment joins broadcast them onto the bigram frame (the
    * corpus-sized side is reduced to distinct bigrams before any
    * join); the top-k is TakeOrderedAndProject, never a full sort.
    */
  def collocations(df: DataFrame, textCol: String, k: Int,
      minCount: Long): DataFrame = {
    val scale = 1000000L
    val uni = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val bi = df.select(explode(ngrams(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
    bi.join(broadcast(uni.select(col("token").as("x"), col("n").as("n_x"))),
        Seq("x"))
      .join(broadcast(uni.select(col("token").as("y"), col("n").as("n_y"))),
        Seq("y"))
      .withColumn("score", expr(s"n_xy * $scale DIV (n_x * n_y)"))
      .select(col("bigram"), col("n_xy"), col("n_x"), col("n_y"),
        col("score"))
      .orderBy(col("score").desc, col("bigram").asc)
      .limit(k)
  }

  /** DSIR-style hashed-n-gram importance scores (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * bucket every bigram occurrence by a portable 32-bit hash into
    * `nBuckets` bins, estimate per-bucket target/source likelihood
    * ratios with add-one smoothing in exact integer arithmetic
    * (`(n_target + 1) * 1e6 DIV (n_source + 1)`), then score each
    * SOURCE document by the truncating mean ratio of its bigram
    * stream. High scores = documents whose hashed-feature profile
    * looks like the target distribution — the upweighting signal an
    * importance-resampling selection step consumes.
    *
    * Sibling of [[importanceWeights]] (q157) — same hashed-feature
    * machinery, DIFFERENT statistic: q157 emits the calibrated
    * target SHARE of each bucket, P(target | bucket) =
    * (t+1)*1e6 DIV (r+2), for threshold selection over ALL docs;
    * this op emits the target/source likelihood RATIO p/q — DSIR's
    * actual sampling weight — over the source split only, and is the
    * statistic q209 applies online against the frozen
    * [[dsirRatios]] table.
    *
    * Output: one row per source doc — (id, n_grams, w_sum, score),
    * docs with no bigrams omitted (no features, no estimate).
    *
    * Scale: two key-shuffles over the bigram stream (bucket counts,
    * per-doc sums); the ratio table is `nBuckets` rows — broadcast
    * onto the stream, so the corpus never reshuffles for the lookup.
    * Everything truncating-integer, so cross-engine exact.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 64): DataFrame =
    dsirScoresAgainst(df.filter(!isTarget), idCol, textCol,
      dsirRatios(df, textCol, isTarget, nBuckets), nBuckets)

  /** Score a doc frame against an already-fit `(bucket, w)` ratio
    * table — the ONE implementation of the DSIR scoring plan
    * (explode bigrams -> bucket -> broadcast ratio join -> doc-keyed
    * truncating mean). Works on batch and streaming frames alike;
    * [[dsirScores]], q209's stream, and CurateCorpus's
    * `--dsir-target` stage all route through here so the statistic
    * can never silently diverge between them.
    */
  def dsirScoresAgainst(df: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, nBuckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(ngrams(col(textCol), 2)).as("gram"))
      .withColumn("bucket", dsirBucket(col("gram"), nBuckets))
      // LEFT join: a gram whose bucket was unseen at fit time (novel
      // streaming vocabulary) gets the add-one-smoothed default ratio
      // (0+1)*1e6 DIV (0+1) = 1e6, instead of silently dropping the
      // gram (and, when all grams miss, the whole doc)
      .join(broadcast(ratios), Seq("bucket"), "left")
      .withColumn("w", coalesce(col("w"), lit(1000000L)))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("w_sum"))
      .withColumn("score", expr("w_sum DIV n_grams"))

  /** [[dsirScores]]' hashed-feature bucket for one bigram. */
  def dsirBucket(gram: Column, nBuckets: Int): Column =
    pmod(hash32(gram), lit(nBuckets.toLong))

  /** [[dsirScores]]' frozen ratio table — (bucket, w), `nBuckets`
    * rows. Split out so an online scorer (q209's stream) can apply
    * the offline-fit ratios via a stream-static broadcast join.
    */
  def dsirRatios(df: DataFrame, textCol: String, isTarget: Column,
      nBuckets: Int): DataFrame =
    df.select(isTarget.as("is_t"),
        explode(ngrams(col(textCol), 2)).as("gram"))
      .withColumn("bucket", dsirBucket(col("gram"), nBuckets))
      .groupBy(col("bucket")).agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("ns"))
      .select(col("bucket"),
        expr("(nt + 1) * 1000000 DIV (ns + 1)").as("w"))
}
