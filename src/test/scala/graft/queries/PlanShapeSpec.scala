package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Physical-plan regression guards: the scale-critical plan
  * properties (bounded-heap top-N, broadcast dimension joins,
  * map-side partial aggregation, cache reuse, pruned scans) asserted
  * as substrings of the executed plan, so a future change that
  * silently degrades a plan fails here rather than only in BENCH
  * numbers.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4, "PlanShapeSpec")
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    Registry.queries(q)(spark, dir).queryExecution.executedPlan.toString
  }

  test("top-N plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q03_topn")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("dimension joins broadcast (nation hinted; customer left to AQE)") {
    val p = plan("q06_join_enrich")
    // at test sf both sides plan broadcast via file-size statistics
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // but only the fixed-size side (nation, 25 rows) may carry a
    // FORCED hint — customer scales with sf, and a hint on it would
    // bypass AQE's size check and OOM at the 100 TB target
    val opt = Registry.queries("q06_join_enrich")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val hinted = "strategy=broadcast".r.findAllIn(opt).size
    assert(hinted <= 1, s"$hinted forced broadcast hints (expected <= 1, nation only):\n$opt")
  }

  test("mixture sampling broadcasts the source-count table") {
    // the per-source denominator table is dimension-sized; the corpus
    // side must never shuffle for the join
    val p = plan("q87_mixture_sample")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("passage dedup's rank filter plans as WindowGroupLimit") {
    // rn = 1 must run the group-limit pushdown (partial limit before
    // the shuffle), not a full per-group sort + filter
    val p = plan("q91_passage_dedup")
    assert(p.contains("WindowGroupLimit"))
  }

  test("top-k aggregate combines partially map-side") {
    // the whole point of TopKByAgg vs the rank window: partial +
    // final ObjectHashAggregate around one exchange, <= k rows per
    // group shipped
    val p = plan("q93_topk_agg")
    assert(p.contains("ObjectHashAggregate"))
    assert(p.contains("partial_topk_by"))
    assert(!p.contains("Window"))
  }

  test("full-scan aggregation is hash-based with partial combine") {
    val p = plan("q01_agg_sum")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"))
    assert(!p.contains("SortAggregate"))
  }

  test("slow-log report keeps the event volume on HashAggregate") {
    // the tiny pair-min rollup may sort-aggregate; the full-volume
    // first stage must not
    val p = plan("q17_slowlog_e2e")
    assert(p.contains("HashAggregate"))
    assert(p.contains("InMemoryTableScan")) // shared parse served from cache
  }

  test("scans prune to referenced columns") {
    val p = plan("q03_topn")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_partkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"))
  }

  test("minhash candidate generation reuses the cached signatures") {
    val p = plan("q24_minhash_lsh")
    assert(p.contains("InMemoryTableScan"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("range join stays an equi-join (no nested loop)") {
    val p = plan("q41_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("lex index search: the searched terms reach the postings scan " +
    "as a pushed literal In predicate AND their hash buckets as a " +
    "PartitionFilter (directory pruning, round 13)") {
    val p = plan("q267_lex_index_search")
    // the scan over the postings artifact must carry PushedFilters
    // with the In(t, ...) literal — the serve-path contract ServeProbe
    // prices (a broadcast-join form scans every posting per query) —
    // and, since the postings segments are partitioned by the term
    // hash bucket, a PartitionFilters In(tb, ...) that prunes whole
    // bucket directories before any file opens
    val scanLine = p.linesIterator
      .filter(_.contains("postings")).mkString("\n")
    assert(scanLine.contains("PushedFilters: [In(t, ") ||
      p.contains("PushedFilters: [In(t, "),
      s"postings scan lost the term pushdown:\n$scanLine")
    assert(p.contains("PartitionFilters: [tb#") ||
      p.linesIterator.exists(l => l.contains("PartitionFilters") &&
        l.contains("tb#")),
      s"postings scan lost the bucket partition filter:\n$scanLine")
  }

  test("sq8 index search: the probed cells prune the code artifacts " +
    "at BOTH levels — cb PartitionFilter (whole bucket directories) " +
    "and pushed In(cell) row-group predicate on the sorted column") {
    val p = plan("q262_sq8_index_search")
    // both membership scans carry the literal probed-cell
    // restriction as a bucket PARTITION predicate plus a pushed data
    // predicate — neither the assignments nor the sq8 code artifact
    // is met by a corpus-linear pass
    val cbPartLines = p.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("cb#"))
      .toSeq
    assert(cbPartLines.nonEmpty,
      s"code scan lost the cell-bucket partition filter:\n" +
        p.linesIterator.filter(_.contains("sq8_codes")).mkString("\n"))
    assert(p.contains("In(cell, ") || p.contains("In(cell,"),
      "code scan lost the pushed In(cell) row-group predicate")
    graft.Scratch.release()
  }

  test("batch lex serving: bucket partition filter on the postings " +
    "scan; per-query top-k pushes as WindowGroupLimit") {
    val p = plan("q282_lex_batch_search")
    assert(p.linesIterator.exists(l => l.contains("PartitionFilters") &&
      l.contains("tb#")),
      "batch postings scan lost the bucket partition filter")
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must push the group limit below the sort")
    graft.Scratch.release()
  }

  test("batch vec serving: cell-bucket partition filter on the code " +
    "scans; per-probe routing and top-k as WindowGroupLimit; no " +
    "cartesian product") {
    val p = plan("q283_index_batch_search")
    assert(p.linesIterator.exists(l => l.contains("PartitionFilters") &&
      l.contains("cb#")),
      "batch code scan lost the cell-bucket partition filter")
    assert(p.contains("WindowGroupLimit"),
      "per-probe top-k must push the group limit below the sort")
    assert(!p.contains("CartesianProduct"))
    graft.Scratch.release()
  }

  test("batch serving probe-side broadcast cap: under the cap the " +
    "probe frame broadcasts onto the restricted lists; past it the " +
    "same join falls back to a merge-hinted SHUFFLE (lexical and " +
    "vector paths, both modes pinned)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("plan_bcap").toString
    graft.tools.LexIndex.build(spark,
      Array(s"$dir/documents.parquet", s"$tmp/lex", "--gram", "2"))
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 4)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(graft.ops.TextOps.tokens(col("text")), 1, 5))
          .as("text"))
      .write.mode("overwrite").parquet(s"$tmp/queries.parquet")
    def lexPlan(extra: String*): String = {
      val df = graft.tools.LexIndex.searchBatch(spark,
        Array(s"$tmp/lex", s"$tmp/queries.parquet", "--k", "5") ++ extra)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val pB = lexPlan()
    assert(!pB.contains("SortMergeJoin"),
      s"default-cap lexical batch plan shuffled the probe join:\n$pB")
    val pS = lexPlan("--max-broadcast-probes", "0")
    assert(pS.contains("SortMergeJoin"),
      s"past-cap lexical batch plan did not fall back to a shuffle:\n$pS")

    graft.tools.IndexCorpus.build(spark, Array(s"$dir/embeddings.parquet",
      s"$tmp/idx", "--ivf-k", "4", "--sq8", "true"))
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 4).select(col("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/probes.parquet")
    def vecPlan(extra: String*): String = {
      val df = graft.tools.IndexCorpus.searchBatch(spark,
        Array(s"$tmp/idx", s"$dir/embeddings.parquet",
          s"$tmp/probes.parquet", "--k", "5", "--nprobe", "2",
          "--tier", "sq8") ++ extra)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // the probe join is the pid-keyed one; pin it specifically (the
    // cell-keyed candidate join is free to shuffle in either mode)
    def pidSmj(p: String): Boolean = p.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("pid#"))
    def pidBcast(p: String): Boolean = p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("pid#"))
    val vB = vecPlan()
    assert(pidBcast(vB) && !pidSmj(vB),
      s"default-cap vector batch plan lost the probe broadcast:\n$vB")
    val vS = vecPlan("--max-broadcast-probes", "0")
    assert(pidSmj(vS),
      s"past-cap vector batch plan did not fall back to a shuffle:\n$vS")
    // both modes must return identical answers (the cap is a plan
    // knob, never a semantics knob)
    val a = graft.tools.IndexCorpus.searchBatch(spark,
      Array(s"$tmp/idx", s"$dir/embeddings.parquet", s"$tmp/probes.parquet",
        "--k", "5", "--nprobe", "2", "--tier", "sq8")).collect().toSeq
    val b = graft.tools.IndexCorpus.searchBatch(spark,
      Array(s"$tmp/idx", s"$dir/embeddings.parquet", s"$tmp/probes.parquet",
        "--k", "5", "--nprobe", "2", "--tier", "sq8",
        "--max-broadcast-probes", "0")).collect().toSeq
    assert(a == b, "broadcast/shuffle modes disagree")
    val al = graft.tools.LexIndex.searchBatch(spark,
      Array(s"$tmp/lex", s"$tmp/queries.parquet", "--k", "5"))
      .collect().toSeq
    val bl = graft.tools.LexIndex.searchBatch(spark,
      Array(s"$tmp/lex", s"$tmp/queries.parquet", "--k", "5",
        "--max-broadcast-probes", "0")).collect().toSeq
    assert(al == bl, "broadcast/shuffle lexical modes disagree")
    graft.Scratch.release()
  }

  test("knn graph: blocked equi-joins only (no cartesian), fused " +
    "cosine verify, per-node top-k as WindowGroupLimit") {
    val p = plan("q274_knn_graph")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("cosine_sim"), "verify must use the fused kernel")
    assert(p.contains("WindowGroupLimit"),
      "per-node top-k must push the group limit below the sort")
    // the candidate-pair frame is cached once and read by both
    // mirror arms
    assert(p.contains("InMemoryTableScan"))
  }

  test("ANN paths use the fused vector kernels, not interpreted HOFs") {
    for (q <- Seq("q27_ann_topk", "q28_ann_lsh", "q29_embed_neardup")) {
      val p = plan(q)
      assert(p.contains("cosine_sim"), s"$q missing fused cosine")
      // the HOF formulation would appear as aggregate(zip_with(...))
      assert(!p.contains("zip_with"), s"$q still has interpreted HOF math")
    }
    assert(plan("q28_ann_lsh").contains("lsh_bucket"))
  }

  test("knn join broadcasts the probe side; corpus never shuffles for the join") {
    val p = plan("q54_knn_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("cosine_sim") && p.contains("lsh_bucket"))
  }

  // q23/q26/q56 registry entries localCheckpoint before their
  // presentation sort (avoids the range-sampling double execution), so
  // the operator's plan is asserted directly — the checkpoint boundary
  // hides everything beneath it from the registry query's plan string.
  private def opPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("simhash pairs: no dedup shuffle, no cross join, cached sigs") {
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = opPlan(graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 8))
    assert(p.contains("InMemoryTableScan")) // both band-join sides cached
    assert(p.contains("simhash60")) // fused kernel, not HOF bit math
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // exactly-once emission replaced dropDuplicates: no agg on pair ids
    assert(!p.contains("partial_first"))
  }

  test("wide simhash pairs keep the 60-bit form's plan shape") {
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = opPlan(graft.ops.Dedup.simhashPairs120(docs, "doc_id", "text", 8))
    assert(p.contains("InMemoryTableScan")) // cached sig pass
    assert(p.contains("simhash120")) // fused kernel, not HOF bit math
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("partial_first")) // first-agreeing-band emission
  }

  test("min-k jaccard: fused shingle kernel, equi-join on keys, cached base") {
    assume(new java.io.File(dir).isDirectory, s"driver testdata at $dir")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = opPlan(graft.ops.Dedup.jaccardPairsMinK(docs, "doc_id", "text",
      n = 3, k = 3, num = 1, den = 2))
    assert(p.contains("hashed_shingles")) // fused kernel computes the keys
    assert(p.contains("InMemoryTableScan")) // both self-join sides cached
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("partial_first")) // smallest-shared-key emission
  }

  test("exact IVF recall gate: fused cosine, bounded-heap top-k, no cross join") {
    val p = plan("q58_ivf_recall")
    assert(p.contains("cosine_sim"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("zip_with")) // no interpreted HOF math
  }

  test("wide OR-construction: per-table equi-joins only, fused kernels") {
    val p = plan("q59_embed_neardup_wide_or")
    assert(p.contains("lsh_bucket") && p.contains("cosine_sim"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("partial_first")) // first-table-wins emission
  }

  test("tf-idf broadcasts the vocabulary-sized df side") {
    val p = plan("q63_tfidf_terms")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin")) // corpus side must not reshuffle for the join
    assert(!p.contains("CartesianProduct"))
  }

  test("corpus top-ngrams: fused fan-out, partial agg + bounded-heap top-N") {
    val p = plan("q72_top_ngrams")
    assert(p.contains("TakeOrderedAndProject")) // never a global sort
    assert(p.contains("partial_")) // map-side combine under the shuffle
    assert(p.contains("ngrams")) // fused kernel, not interpreted HOF windows
    assert(!p.contains("concat_ws")) // the HOF construction's signature
  }

  test("ngram decontamination: bloom prune in scan stage, broadcast verify") {
    val p = plan("q74_ngram_decontam")
    assert(p.contains("bloom_might_contain")) // map-side sketch prune
    assert(p.contains("BroadcastHashJoin")) // exact verify vs small test side
    assert(!p.contains("SortMergeJoin")) // corpus grams never reshuffle to verify
    assert(!p.contains("CartesianProduct"))
  }

  test("domain cap and reshard shuffle once on the key (no extra exchanges)") {
    for (q <- Seq("q70_domain_cap", "q75_reshard")) {
      val p = plan(q)
      // the rank window + final presentation sort; nothing else shuffles
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("repetition stats run as the fused kernel, not HOF array math") {
    val p = plan("q71_repetition")
    assert(p.contains("repetition_stats"))
    assert(!p.contains("array_distinct")) // the quadratic HOF form
  }

  test("contamination check: band equi-joins, no self/cross join, cached sketches") {
    val p = plan("q68_contamination")
    assert(p.contains("InMemoryTableScan")) // both prepared sides cached
    assert(p.contains("hashed_shingles")) // fused sketch kernels
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("partial_first")) // first-shared-band emission
  }

  test("quantize audit: dimension stats broadcast, embedding column pruned scan") {
    val p = plan("q100_quantize_audit")
    assert(p.contains("BroadcastHashJoin")) // 64-row stats side
    assert(!p.contains("SortMergeJoin")) // exploded corpus never reshuffles to meet stats
    assert(p.contains("ReadSchema: struct<embedding")) // vec_id pruned away
  }

  test("docsim join: df cap side broadcasts, postings meet on an equi-join") {
    val p = plan("q101_docsim_pairs")
    assert(p.contains("BroadcastHashJoin")) // vocabulary-sized dfreq
    assert(p.contains("TakeOrderedAndProject")) // top-N without a global sort
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("InMemoryTableScan")) // postings cached, both join sides reuse
  }

  test("pagerank: equi-joins only, cached edge/degree tables reused per iteration") {
    // at this scale the size-adaptive driver replay kicks in — the
    // registry plan must be a LocalRelation scan (zero shuffle
    // stages); the DISTRIBUTED loop's shape is pinned separately by
    // forcing the cap to zero
    val pq = plan("q102_pagerank")
    assert(pq.contains("LocalTableScan"))
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val p = graft.ops.GraphOps.pagerank(edges, iters = 3, driverMaxEdges = 0L)
      .queryExecution.executedPlan.toString
    graft.Scratch.release()
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("InMemoryTableScan"))
  }

  test("horizon near-dup: (band, week) equi-join, cached signatures, no cross") {
    val p = plan("q112_horizon_neardup")
    assert(p.contains("InMemoryTableScan")) // shared hashed-signature cache
    assert(p.contains("hashed_shingles")) // fused sketch kernel
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("hard negatives: anchors broadcast, corpus never shuffles to be scored") {
    val p = plan("q110_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin")) // the intended 8-anchor cross
    assert(p.contains("cosine_sim")) // fused kernel, not interpreted HOF
    assert(!p.contains("CartesianProduct")) // never a shuffle-shuffle cross
  }

  test("fuzzy linkage: fused hamming kernel, segment equi-join, no cross join") {
    val p = plan("q107_fuzzy_linkage")
    assert(p.contains("hamming_dist")) // the fused verify kernel
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("InMemoryTableScan")) // keyed table cached for both sides
  }

  test("winnow pairs: fused kernel, inverted-index equi-join, no cross") {
    val p = plan("q115_winnow_pairs")
    assert(p.contains("winnow(")) // the one-pass fingerprint kernel
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("containment: merge-scan verify kernel over prefix-filtered index") {
    val p = plan("q117_containment")
    assert(p.contains("sorted_intersect_count")) // not generic array_intersect
    assert(p.contains("hashed_shingles")) // fused sketch kernel
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("boilerplate: scan prunes to id+text, hash aggregation") {
    val p = plan("q114_boilerplate")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"))
    assert(!read.contains("lang") && !read.contains("source"))
    assert(p.contains("HashAggregate"))
  }

  test("weighted reservoir plans as WindowGroupLimit (<= k rows/stratum shuffle)") {
    val p = plan("q126_weighted_reservoir")
    assert(p.contains("WindowGroupLimit"))
  }

  test("heavy hitters: sketch aggregate combines partially map-side") {
    // q127's returned DataFrame is the exact-verify second pass (the
    // sketch pass runs eagerly for its k-sized candidate collect), so
    // pin the aggregate's own plan directly
    val p = spark.range(1000)
      .selectExpr("CAST(id % 37 AS STRING) AS key")
      .agg(graft.ops.HeavyHitters.candidates(
        org.apache.spark.sql.functions.col("key"), 8))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"))
    assert(p.contains("partial_misra_gries"))
  }

  test("label propagation's argmax filter plans as WindowGroupLimit") {
    // registry plan is the driver replay at this scale (LocalRelation);
    // the distributed form's WindowGroupLimit is pinned by forcing the
    // cap to zero
    val pq = plan("q131_label_prop")
    assert(pq.contains("LocalTableScan"))
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val p = graft.ops.GraphOps.labelPropagation(edges, rounds = 2,
      driverMaxEdges = 0L).queryExecution.executedPlan.toString
    graft.Scratch.release()
    assert(p.contains("WindowGroupLimit"))
    assert(!p.contains("CartesianProduct"))
  }

  test("triangles and k-core: equi-joins only on the edge tables") {
    Seq("q113_triangles", "q116_kcore").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("redaction audit: regex counting is pure expressions, hash aggregation") {
    val p = plan("q132_redaction_audit")
    // the per-rule counts are plain string expressions (regexp_count
    // lowers to size(regexp_extract_all)) — codegen-able, no UDF; the
    // audit aggregates partially map-side
    assert(p.contains("regexp_extract_all"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("exact source jaccard: completion join broadcasts, no corpus cross") {
    val p = plan("q133_source_jaccard_exact")
    // the aggregated intersection table broadcasts onto the pair
    // frame; the only nested-loop join allowed is the deliberate
    // catalog-sized (sources x sources) pair frame — never a
    // CartesianProduct over anything data-sized
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("winsorized stats: cutoffs broadcast back onto the histogram") {
    val p = plan("q134_winsorized_stats")
    // the cuts table is group-cardinality-sized — must broadcast; the
    // only sort is the value-domain window, not a corpus sort
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("semantic dedup: no cartesian, no corpus sort-merge; prune join stays in-cluster") {
    val p = plan("q156_semantic_dedup")
    // the within-cluster self-join is an equi-join on the cluster id;
    // nothing may plan as an all-pairs nested loop
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("importance weights: bucket score table broadcasts onto the exploded corpus") {
    val p = plan("q157_importance_weights")
    // the score side is buckets-sized (4096 rows) — the corpus join
    // must broadcast it, never shuffle the exploded bigrams by bucket
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("dup spans: islands window and span agg share one doc-key exchange") {
    val p = plan("q161_dup_spans")
    // the gaps-and-islands merge = Window(doc_id) -> HashAggregate
    // (doc_id, span) -> HashAggregate(doc_id): all co-partitioned, so
    // exactly ONE hashpartitioning exchange on doc_id may appear
    val docKeyExchanges = "hashpartitioning\\(doc_id".r
      .findAllIn(p).size
    assert(docKeyExchanges == 1, s"doc-key exchanges: $docKeyExchanges\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("collocations: unigram counts broadcast; top-k is TakeOrderedAndProject") {
    val p = plan("q164_collocations")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("NB classifier: class/prior/vocab frames broadcast, model join keeps corpus partitioned") {
    val p = plan("q163_nb_confusion")
    // classes/prior/vocab are |C|- or 1-row frames -> broadcast; the
    // (class, token) model join may shuffle (vocabulary-sized) but
    // nothing plans as an all-pairs nested loop over the corpus
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("repeat-runs fold is a pure narrow pass (zero exchanges before the sort)") {
    // the whole point of the six-scalar HOF fold: no explode, no
    // shuffle, no per-token window — the OP plan (before the
    // presentation orderBy) must contain no Exchange at all
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.TextOps.repeatRuns(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"))
  }

  test("curriculum phases: windows are bucket-partitioned, never single-partition") {
    val p = plan("q176_curriculum_phases")
    // the distributed prefix sum must keep every Window partitioned by
    // the score bucket — a Window with an empty partitionSpec is the
    // single-partition global-sort trap this op exists to avoid
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      "single-partition window found:\n" + p)
    assert(p.contains("BroadcastHashJoin")) // offsets frame broadcast
  }

  test("fact-fact join pushes both date filters to the parquet scans") {
    val p = plan("q190_ship_priority")
    // o_orderdate < cutoff and l_shipdate > cutoff must reach the
    // scans as PushedFilters, not post-scan Filters over full reads
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate")
      || p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("q225 Q6 shape: every predicate reaches the parquet scan as " +
    "a PushedFilter and the read schema is pruned to the 4 columns") {
    // formatted explain — the plain treeString truncates the
    // PushedFilters list mid-entry
    val p = Registry.queries("q225_forecast_revenue")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_quantity"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount"), p)
    assert(p.contains("LessThanOrEqual(l_discount"), p)
    // column pruning: a 4-column projection must not read the
    // 11-column table
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_extendedprice") && !read.contains("l_orderkey"),
      read)
  }

  test("5-way star join: no forced broadcast of sf-scaling inputs") {
    val p = plan("q191_local_supplier_volume")
    // nation (25 rows, fixed) broadcasts; at test sf AQE/statistics
    // also broadcast customer/supplier, but only by MEASURED size
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"$smj sort-merge joins (expected <= 1):\n$p")
    // the scale pin: customer and supplier SCALE WITH sf (15M / 1M
    // rows per TB) — a forced hint on either would bypass AQE's size
    // check and guarantee an OOM at 100 TB. Only the one fixed-size
    // side (nation) may carry a hint.
    val opt = Registry.queries("q191_local_supplier_volume")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val hinted = "strategy=broadcast".r.findAllIn(opt).size
    assert(hinted <= 1, s"$hinted forced broadcast hints (expected <= 1, nation only):\n$opt")
  }

  test("q216 volume shipping: nation broadcasts twice, no forced " +
    "hint on sf-scaling sides") {
    val p = plan("q216_volume_shipping")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // same scale rule as q191: only the fixed-size nation (under two
    // roles) may carry forced hints — customer/supplier/orders scale
    // with sf and must stay under AQE's measured-size check
    val opt = Registry.queries("q216_volume_shipping")(spark, dir)
      .queryExecution.optimizedPlan.toString
    val hinted = "strategy=broadcast".r.findAllIn(opt).size
    assert(hinted <= 2,
      s"$hinted forced broadcast hints (expected <= 2, nation roles only):\n$opt")
  }

  test("q231 Q21 shape: EXISTS/NOT-EXISTS realize as semi + anti " +
    "joins on the order key, never a cartesian") {
    val p = plan("q231_waiting_supplier")
    // the double self-correlation must plan as ONE semi and ONE anti
    // join on l_orderkey with the suppkey inequality as a join
    // residual — a nested-loop or cartesian fallback here would scan
    // lineitem^2 at scale
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // top-20 must be a bounded-heap TakeOrderedAndProject
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q232/q233 correlated scalar aggregates decorrelate to ONE " +
    "aggregate-join (no per-row re-aggregation, no forced broadcast " +
    "of sf-scaling sides)") {
    for (q <- Seq("q232_small_qty_revenue", "q233_dominant_supplier")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      assert(p.contains("HashAggregate"), s"$q:\n$p")
      val opt = Registry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      // q232's part filter and per-part aggregate SCALE with sf — no
      // forced hints there; q233 may hint only the 25-row nation
      val hinted = "strategy=broadcast".r.findAllIn(opt).size
      val allowed = if (q.startsWith("q233")) 1 else 0
      assert(hinted <= allowed,
        s"$q: $hinted forced broadcast hints (expected <= $allowed):\n$opt")
    }
    // q232's decorrelated aggregate feeds from the SAME cached scan
    // as the probe side — one pass over the brand-restricted lines
    assert(plan("q232_small_qty_revenue").contains("InMemoryTableScan"))
  }

  test("q237/q238 multi-level stars: only fixed-size dimensions " +
    "carry forced broadcast hints") {
    for ((q, allowed) <- Seq("q237_market_share" -> 3, // nation x2 + region
        "q238_product_profit" -> 1)) { // nation only
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      val opt = Registry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      val hinted = "strategy=broadcast".r.findAllIn(opt).size
      assert(hinted <= allowed,
        s"$q: $hinted forced broadcast hints (expected <= $allowed):\n$opt")
    }
  }

  test("q240 Q22 shape: scalar-average broadcast + anti join, " +
    "no cartesian over data-sized frames") {
    val p = plan("q240_dormant_customers")
    // the 1-row average may ride a BroadcastNestedLoopJoin (that IS
    // the broadcast scalar); the NOT EXISTS must be a LeftAnti join
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q241 Q11 shape: HAVING-vs-global-scalar is one aggregate + " +
    "1-row broadcast, never a re-aggregation or window") {
    val p = plan("q241_important_parts")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // exactly two aggregations: per-part value + the 1-row total
    assert(p.contains("HashAggregate"), p)
  }

  test("mixture reweight: corpus never shuffles past the count aggregate") {
    val p = plan("q175_mixture_reweight")
    // counts + targets are catalog-sized: both joins broadcast
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin")) // 1-row total frame
    assert(!p.contains("SortMergeJoin"))
  }

  test("q246 IVF+residual-PQ search: codes score via broadcast ADC " +
    "tables, rankings are bounded-heap aggregates, no cartesian") {
    val p = plan("q246_ivf_rpq_search")
    // candidate scoring = codes frame x broadcast (cell, code0,
    // code1) ADC table — an equi BroadcastHashJoin; vectors never
    // join the candidate path
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the ONLY nested-loop is the deliberate nProbes-row probe
    // broadcast feeding the exact reference ranking
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    // topk_by rankings are ObjectHashAggregate (k-bounded heaps),
    // never a per-probe rank window over the corpus
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q245 filtered ANN: per-stratum top-10 is a bounded heap, cell " +
    "ranks broadcast, no cartesian") {
    val p = plan("q245_filtered_ann")
    // exact per-stratum top-10 on the filtered scan must be
    // TakeOrderedAndProject (bounded heap), never global sort + limit
    assert(p.contains("TakeOrderedAndProject"), p)
    // the 4-row cell-rank frame joins broadcast; the corpus never
    // shuffles against it
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q247 frame ANN: probe is a literal (no join), top-20 is a " +
    "bounded heap over the cached frame features") {
    val p = plan("q247_frame_ann")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the probe vector rides as a typedLit inside the cosine
    // expression — scoring must not introduce any join at all
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"), p)
    assert(p.contains("InMemoryTableScan"), p) // decoded features cached
  }

  test("q252 cluster quality: corpus touched by fused projections " +
    "only; every stitch join broadcasts; no sort-merge anywhere") {
    val p = plan("q252_cluster_quality")
    // winner + runner-up distances come from the fused kernels, not
    // an exploded distance frame
    assert(p.contains("nearest_centroid"), p)
    assert(p.contains("second_centroid_dist"), p)
    // k-row card stitches (DB pairs, peers, final left join) must all
    // broadcast — a SortMergeJoin here means a k-row frame shuffled
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q256 blocking-recall audit: sample side broadcasts, probe " +
    "membership is the fused top_centroids kernel, ladder is a " +
    "3-row broadcast") {
    val p = plan("q256_blocking_recall_audit")
    assert(p.contains("top_centroids"), p)
    // the only cross joins are the broadcast sample x reference
    // differential and the 3-row nprobe ladder
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the hinted cross
  }

  test("q259 sq8 recall: fused quantize/distance kernels, probes " +
    "broadcast, micros base cached across stats and scoring") {
    val p = plan("q259_sq8_adc_recall")
    assert(p.contains("sq8_dequant") && p.contains("sq_dist"), p)
    assert(!p.contains("zip_with"), p) // no interpreted HOF math
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // 10-probe cross
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q260 bm25: postings cached once and met by broadcast query " +
    "terms; top-k limits inside the window (WindowGroupLimit)") {
    val p = plan("q260_bm25_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p) // dl join is size-adaptive here
    assert(p.contains("BroadcastHashJoin"), p) // qt/dfq catalog sides
    assert(p.contains("InMemoryTableScan"), p) // tf postings, 4 consumers
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q261 hybrid rrf: fused cosine arm, no cartesian, fusion rank " +
    "limits inside the window") {
    val p = plan("q261_hybrid_rrf")
    assert(p.contains("cosine_sim"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q264 bm25 prf: round 2 reuses the cached postings (round 1 " +
    "ran during construction), no cartesian, top-k inside the window") {
    val p = plan("q264_bm25_prf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan"), p) // shared tf postings
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q265 exposure audit: anchors broadcast, top-50 limits inside " +
    "the window, shares stitched on hash joins") {
    val p = plan("q265_retrieval_exposure")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("cosine_sim"), p) // fused kernel in the scoring arm
  }

  test("q266 ltr features: fused cosine, cached postings, lexical " +
    "arm joins in without a cartesian") {
    val p = plan("q266_ltr_features")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cosine_sim"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q270 retrieval arms: both scored passes fused-kernel, no " +
    "cartesian, label/rel stitches are hash joins") {
    val p = plan("q270_retrieval_arms")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cosine_sim"), p)
    assert(p.contains("InMemoryTableScan"), p) // bm25 postings cached
  }
}
