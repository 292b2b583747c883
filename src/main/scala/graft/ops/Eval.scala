package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-calibration operators for filter cascades: a cheap
  * per-doc score (e.g. the integer quality signals) is audited
  * against an expensive reference verdict (e.g. the repetition
  * filter) at EVERY decision threshold — the report that decides
  * where to put the cheap filter in a cascade and what it costs in
  * recall.
  */
object Eval {

  /** Precision/recall/F1 sweep over every distinct score value, where
    * "predict positive" means score >= threshold. Output one row per
    * distinct score: threshold, n_pred, tp, precision_permille,
    * recall_permille, f1_permille (integer permille; F1 via the exact
    * identity 2*TP / (n_pred + total_pos)).
    *
    * Scale posture: the corpus collapses ONCE to the (score, label)
    * histogram — score-DOMAIN sized, not corpus-sized; the sweep's
    * descending-cumulative sums run through [[Prefix.cumSums]], which
    * GUARDS that claim: one-partition window under the session cap,
    * the bucketed distributed prefix sum above it (a heavy-tailed
    * score domain at 100x no longer funnels through one reducer).
    */
  def thresholdSweep(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val hist = graft.Scratch.cache(df.groupBy(scoreCol.as("threshold"))
      .agg(count(lit(1)).as("cnt"),
        sum(labelCol.cast("long")).as("pos")))
    Prefix.cumSums(
      Prefix.withGlobal(hist, "total_pos" -> sum(col("pos"))),
      "threshold", desc = true,
      Seq(col("cnt") -> "n_pred", col("pos") -> "tp"))
      // integer DIV throughout: double `/` would round above 2^53,
      // silently breaking the bit-for-bit oracle claim at corpus scale
      .select(col("threshold"),
        col("n_pred").cast("long").as("n_pred"),
        col("tp").cast("long").as("tp"),
        expr("(tp * 1000) DIV n_pred").as("precision_permille"),
        when(col("total_pos") === 0, 0L)
          .otherwise(expr("(tp * 1000) DIV total_pos"))
          .as("recall_permille"),
        expr("(tp * 2000) DIV (n_pred + total_pos)").as("f1_permille"))
  }

  /** Exact per-group AUC (area under the ROC curve) of `scoreCol`
    * against binary `labelCol`, via the Mann-Whitney rank-sum identity
    * with full tie handling: on the (group, score) histogram, a tie
    * group of `cnt` rows ending at cumulative rank `cum` spans ranks
    * [cum-cnt+1, cum], so its doubled average rank is 2*cum - cnt + 1
    * and doubled-U = sum(pos * (2*cum - cnt + 1)) - n_pos*(n_pos+1).
    * AUC = U / (n_pos * n_neg), reported as integer permille. Groups
    * with no positives or no negatives report NULL (AUC undefined).
    *
    * Scale posture: the corpus collapses ONCE to the per-group score
    * histogram (group × score-domain sized); the rank windows partition
    * by group over that histogram — never corpus-sized frames. The
    * rank-sum and the permille numerator exceed 2^63 once a group
    * passes ~10^9 rows, so both accumulate in DECIMAL(38,0) (the
    * oracle's HUGEINT twin) — exact to 10^38, then the bounded
    * permille result drops back to BIGINT.
    */
  def groupAuc(df: DataFrame, groupCol: Column, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val hist = df.groupBy(groupCol.as("grp"), scoreCol.as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(labelCol.cast("long")).as("pos"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .groupBy(col("grp"))
      .agg(sum(col("cnt")).cast("long").as("n"),
        sum(col("pos")).cast("long").as("n_pos"),
        sum((col("cum") * 2 - col("cnt") + 1).cast("decimal(38,0)") *
          col("pos")).as("r2"))
      .withColumn("n_neg", col("n") - col("n_pos"))
      .withColumn("u2",
        col("r2") - col("n_pos").cast("decimal(38,0)") * (col("n_pos") + 1))
      .select(col("grp"), col("n"), col("n_pos"),
        when(col("n_pos") === 0 || col("n_neg") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((u2 * 1000) DIV
              |  (CAST(n_pos AS DECIMAL(38,0)) * 2 * n_neg) AS BIGINT)"""
              .stripMargin))
          .as("auc_permille"))
  }

  /** Exact two-sample Kolmogorov-Smirnov distance of each group's
    * `valueCol` distribution against the GLOBAL distribution of the
    * same frame, in integer permille: D = max over v of
    * |ECDF_grp(v) - ECDF_all(v)|, evaluated cross-multiplied so no
    * division happens until the final permille.
    *
    * The max needs no group × value-domain cross frame: the step
    * function |cum_g(v)*N - cum_all(v)*n_g| is piecewise monotone
    * between the group's OWN value steps (only cum_all moves, one
    * direction), so per group-row it suffices to test (a) the step
    * itself and (b) the supremum just BEFORE it — previous group
    * cumulative against cum_all(v) - cnt_all(v). The frame therefore
    * stays (group, value)-keyed end to end. NULL values are excluded
    * by contract (no rank cross-engine).
    *
    * Scale posture: two domain-sized histograms, one broadcast-able
    * join on value, windows partitioned by group. Cross products
    * cum * N reach 2^63 at ~3*10^9 rows either side, so comparisons
    * run in DECIMAL(38,0) (oracle: HUGEINT); the permille result is
    * bounded and drops back to BIGINT.
    */
  /** Exact chi-square independence audit of two categorical columns
    * (e.g. source x language): one output row per cell of the FULL
    * contingency table — zero cells included, they carry expected
    * counts too — with the observed count, the expected count in
    * millis, the cell's chi-square contribution in micros, and the
    * table-wide total. All arithmetic is integer:
    *   exp_milli      = (R * C * 1000) DIV N
    *   contrib_micros = (1e6 * (O*N - R*C)^2) DIV (N * R * C)
    * (the (O*N - R*C) form clears denominators before squaring, so no
    * division happens until the final DIV — each cell floors once,
    * order-independent, so both engines agree bit-for-bit). The 1e6
    * scaling is applied via the split identity
    * floor(1e6*s/d) = 1e6*(s DIV d) + (1e6*(s MOD d)) DIV d, which
    * keeps every intermediate inside DECIMAL(38,0)/HUGEINT up to
    * ~3*10^9 corpus rows (the square itself is the binding term);
    * past that the statistic needs a divide-first formulation that
    * trades exactness, so the bound is documented instead of
    * silently rounded through.
    *
    * Scale posture: the corpus collapses ONCE to observed cells; the
    * full table is a broadcast cross of the two catalog-sized margin
    * frames (justified: both sides are category catalogs, not data).
    */
  def chi2Independence(df: DataFrame, rowCol: Column,
      colCol: Column): DataFrame = {
    val cells = graft.Scratch.cache(
      df.groupBy(rowCol.as("r"), colCol.as("c"))
        .agg(count(lit(1)).as("obs")))
    val rm = cells.groupBy(col("r")).agg(sum(col("obs")).as("rn"))
    val cm = cells.groupBy(col("c")).agg(sum(col("obs")).as("cn"))
    val full = Prefix.withGlobal(
      rm.crossJoin(broadcast(cm))
        .join(cells, Seq("r", "c"), "left")
        .select(col("r"), col("c"), col("rn"), col("cn"),
          coalesce(col("obs"), lit(0L)).as("obs")),
      "n" -> sum(col("obs")))
    val scored = full
      .withColumn("dev",
        expr("CAST(obs AS DECIMAL(38,0)) * n - CAST(rn AS DECIMAL(38,0)) * cn"))
      .withColumn("sq", expr("dev * dev"))
      .withColumn("den", expr("CAST(n AS DECIMAL(38,0)) * rn * cn"))
      .select(col("r"), col("c"),
        col("obs").cast("long").as("obs"),
        expr("CAST((CAST(rn AS DECIMAL(38,0)) * cn * 1000) DIV n AS BIGINT)")
          .as("exp_milli"),
        expr("""CAST((sq DIV den) * 1000000 +
               |  ((sq % den) * 1000000) DIV den AS BIGINT)""".stripMargin)
          .as("contrib_micros"))
    Prefix.withGlobal(scored,
      "chi2_total_micros" -> sum(col("contrib_micros")).cast("long"))
  }

  /** Per-group Pearson correlation of two numeric columns. The moment
    * sums accumulate EXACTLY in DECIMAL(38,0)/HUGEINT (one
    * map-side-combinable pass); only the final
    * num / sqrt(denx * deny) happens in double, rounded to 6 places —
    * the same cross-engine double contract the cosine queries pin
    * (identical integer inputs + identical IEEE op order = identical
    * bits). Zero-variance groups report NULL. Output: grp, n, corr.
    */
  def pearson(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame =
    df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(groupCol.as("grp"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("denx", expr("n * sxx - sx * sx"))
      .withColumn("deny", expr("n * syy - sy * sy"))
      .select(col("grp"), col("n").cast("long").as("n"),
        when(col("denx") === 0 || col("deny") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            sqrt(col("denx").cast("double") * col("deny").cast("double")),
            6))
          .as("corr"))

  /** Per-group Spearman rank statistics, tie-handled and fully
    * integer — the rank-based complement of [[pearson]] (robust to
    * monotone transforms and outliers; the pair worth comparing when
    * a quality score's SCALE is arbitrary but its ORDER matters).
    *
    * Emits per group: n, sum_d2_x4 = sum((R2x - R2y)^2) over DOUBLED
    * average ranks (R2 = 2*min_rank + tie_count - 1, integer even
    * with ties; 4x the textbook sum(d^2)), and the tie-correction
    * masses tie_x / tie_y = sum(t^3 - t) per tied value. Spearman's
    * rho with tie correction is a pure function of these integers, so
    * the consumer (or a judge) derives the float once; nothing
    * engine-dependent is emitted. Bounds: sum_d2_x4 <= 4n^3 — int64
    * holds to n ~ 1.3e6 rows per group; larger groups lift the sum
    * to DECIMAL(38,0).
    *
    * Scale posture: exact ranks need one sort-shuffle per axis within
    * each group (inherent to exact Spearman). At unbounded group
    * sizes use the histogram route instead (rank from cumulative
    * counts over the VALUE domain, the q134/q145 pattern) — exactness
    * is the same; this form is the general-domain one.
    */
  def spearman(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(groupCol.as("grp"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
    def doubledRank(v: String) = {
      val ord = Window.partitionBy(col("grp")).orderBy(col(v))
      val ties = Window.partitionBy(col("grp"), col(v))
      (rank().over(ord) * 2 + count(lit(1)).over(ties) - 1)
        .cast("long")
    }
    val ranked = base
      .withColumn("r2x", doubledRank("x"))
      .withColumn("r2y", doubledRank("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum((col("r2x") - col("r2y")) * (col("r2x") - col("r2y")))
          .as("sum_d2_x4"))
    def tieMass(v: String, out: String) = base
      .groupBy(col("grp"), col(v)).agg(count(lit(1)).as("t"))
      .groupBy(col("grp"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as(out))
    ranked
      .join(tieMass("x", "tie_x"), Seq("grp"))
      .join(tieMass("y", "tie_y"), Seq("grp"))
      .select(col("grp"), col("n"), col("sum_d2_x4"), col("tie_x"),
        col("tie_y"))
  }

  /** Classifier confusion matrix: observed (label, prediction) cells
    * with counts and the within-label share in permille — the
    * diagonal is per-class recall. Observed cells only (a full table
    * with zero cells is [[chi2Independence]]'s job).
    *
    * Scale posture: one map-side-combinable aggregation to the
    * class-catalog-sized cell frame; the share window partitions by
    * label over that frame.
    */
  def confusionMatrix(df: DataFrame, labelCol: Column,
      predCol: Column): DataFrame =
    df.groupBy(labelCol.as("label"), predCol.as("pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_label",
        sum(col("n")).over(Window.partitionBy(col("label"))))
      .select(col("label"), col("pred"), col("n").cast("long").as("n"),
        expr("(n * 1000) DIV n_label").as("label_permille"))

  /** Exact per-group OLS trend (least-squares slope of y over x) in
    * integer micros — the drift detector: "is this source's document
    * length (or quality score) sliding as ingestion progresses".
    * slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), reported as
    * slope_micro = that ratio * 1e6, floored toward zero identically
    * in both engines via the split-division identity (valid for
    * negative numerators too, because Spark DIV/% and DuckDB /// %
    * agree on truncation and sign-of-dividend remainders).
    *
    * x is rebased per group to x - min(x) before the sums: the slope
    * is algebraically shift-invariant, and the rebase is what keeps
    * n*Sxx inside DECIMAL(38,0)/HUGEINT — exact while
    * n * span^2 * n < 10^38 (e.g. 10^9 rows over a 10^9 id span).
    * Groups with zero x-variance report NULL. Output: grp, n, x_span,
    * mean_y_milli, slope_micro.
    *
    * Scale posture: two map-side-combinable aggregations on the group
    * key (min pass broadcast back, then the moment sums). Nothing
    * corpus-sized shuffles, no windows.
    */
  def olsTrend(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val base = df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(groupCol.as("grp"), xCol.cast("long").as("x0"),
        yCol.cast("long").as("y"))
    val mins = base.groupBy(col("grp")).agg(min(col("x0")).as("xmin"))
    val m = base.join(broadcast(mins), Seq("grp"))
      .withColumn("x", col("x0") - col("xmin"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        max(col("x")).as("x_span"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
    m.select(col("grp"), col("n").cast("long").as("n"),
      col("x_span").cast("long").as("x_span"),
      expr("(sy * 1000) DIV n").as("mean_y_milli"),
      when(col("den") === 0, lit(null).cast("long"))
        .otherwise(expr(
          "(num DIV den) * 1000000 + ((num % den) * 1000000) DIV den"))
        .as("slope_micro"))
  }

  def ksDrift(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val rows = df.filter(valueCol.isNotNull)
      .select(groupCol.as("grp"), valueCol.as("v"))
    ksDriftFromHist(graft.Scratch.cache(
      rows.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))))
  }

  /** [[ksDrift]] from an ALREADY-AGGREGATED (grp, v, cnt) histogram —
    * the entry point for streaming drift monitoring (q178): a
    * Complete-mode streaming aggregation maintains exactly this
    * histogram (value-domain-bounded state), and each micro-batch
    * snapshot runs the same KS arithmetic batch-side, so the stream's
    * final verdict equals the batch operator's by construction.
    */
  def ksDriftFromHist(gHist: DataFrame): DataFrame = {
    // value-DOMAIN-sized at any corpus scale, but GUARDED: the
    // cumulative sum routes through Prefix (bucketed prefix sum past
    // the session cap) instead of trusting the bound. The global
    // histogram aggregate is cached: cumSum's eager stats action
    // would otherwise re-run the (grp,v)->v collapse on every call —
    // per MICRO-BATCH under q178 (tiny domain-sized cache, released
    // by the harness's Scratch.release at query end)
    val aHist = Prefix.cumSum(
      graft.Scratch.cache(
        gHist.groupBy(col("v")).agg(sum(col("cnt")).as("cnt_all"))),
      "v", col("cnt_all"), "cum_all")
    val wG = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // broadcast the global histogram so the windowed group frame
    // keeps its grp layout
    val joined = gHist
      .withColumn("cum_g", sum(col("cnt")).over(wG))
      .join(broadcast(aHist), Seq("v"))
    val totals = Prefix.withGlobal(
      gHist.groupBy(col("grp"))
        .agg(sum(col("cnt")).cast("long").as("n_g")),
      "n_all" -> sum(col("n_g")).cast("long"))
    val d = joined.join(broadcast(totals), Seq("grp"))
      .select(col("grp"), col("n_g"), col("n_all"),
        greatest(
          abs(col("cum_g").cast("decimal(38,0)") * col("n_all") -
            col("cum_all").cast("decimal(38,0)") * col("n_g")),
          abs((col("cum_g") - col("cnt")).cast("decimal(38,0)") *
            col("n_all") -
            (col("cum_all") - col("cnt_all")).cast("decimal(38,0)") *
            col("n_g"))).as("gap"))
      .groupBy(col("grp"))
      .agg(first(col("n_g")).as("n"),
        first(col("n_all")).as("n_all"),
        max(col("gap")).as("d_scaled"))
    d.select(col("grp"), col("n").cast("long").as("n"),
      expr("""CAST((d_scaled * 1000) DIV
             |  (CAST(n AS DECIMAL(38,0)) * n_all) AS BIGINT)"""
        .stripMargin).as("ks_permille"))
  }

  /** Reliability-diagram bins (calibration audit): the score domain
    * splits into `nbins` equal-width bins between the observed min
    * and max, and each bin reports its size, positive count, and
    * positive rate in permille — where [[thresholdSweep]] answers
    * "what cutoff", this answers "does a score of X MEAN probability
    * X" (the monotone-rate check before a cheap score gates an
    * expensive stage). bin = ((score - lo) * nbins) DIV (hi - lo + 1)
    * — integer-exact, upper edge inclusive by the +1.
    *
    * Scale posture: the corpus collapses ONCE to the score-domain
    * histogram; the (lo, hi) frame is one broadcast row; the bin
    * aggregate is histogram-sized. Overflow bound: sum(score * cnt)
    * per bin must stay below 2^63 — holds to ~10^12 rows of
    * integer scores under 2^31; widen to DECIMAL(38,0) past that.
    */
  def calibrationBins(df: DataFrame, scoreCol: Column,
      labelCol: Column, nbins: Int): DataFrame = {
    require(nbins >= 1, s"nbins must be >= 1, got $nbins")
    val hist = df.groupBy(scoreCol.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"), sum(labelCol.cast("long")).as("pos"))
    val bounds = hist.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    hist.join(broadcast(bounds))
      .withColumn("bin", expr(s"((v - lo) * $nbins) DIV (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).cast("long").as("n"),
        sum(col("pos")).cast("long").as("n_pos"),
        sum(col("v") * col("cnt")).cast("long").as("score_sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000) DIV n").as("pos_permille"),
        expr("score_sum DIV n").as("mean_score"))
  }
}
