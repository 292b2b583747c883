package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Engine-completeness surface beyond the reference's fixed pipeline:
  * pivot, exact percentiles, grouping sets, scalar subqueries,
  * collected sets, and JSON field extraction — each oracle-checked.
  * (SURVEY.md §2.9/§2.6 notes these as "not present" in the
  * reference; a drop-in engine still wants them.)
  */
object ExtendedQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def all: Map[String, Q] = Map(

    "q32_pivot" -> Q(
      (s, dir) => {
        val p = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", eventTypes)
          .agg(count(lit(1)))
        p.select(col("user_id") +:
            eventTypes.map(e => coalesce(col(e), lit(0L)).as(e)): _*)
          .orderBy(col("user_id"))
      },
      Some {
        val cases = eventTypes.map(e =>
          s"CAST(sum(CASE WHEN event_type = '$e' THEN 1 ELSE 0 END) AS BIGINT) AS $e")
          .mkString(",\n ")
        s"""SELECT user_id,
           | $cases
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    "q33_percentiles" -> Q(
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"), floor(col("value") * 10).cast("long").as("d"))
        .groupBy(col("event_type"))
        .agg(
          percentile(col("d"), lit(0.5)).as("median_d"),
          percentile(col("d"), lit(0.9)).as("p90_d"),
          min(col("d")).as("min_d"),
          max(col("d")).as("max_d"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             | quantile_cont(CAST(floor(value*10) AS BIGINT), 0.5) AS median_d,
             | quantile_cont(CAST(floor(value*10) AS BIGINT), 0.9) AS p90_d,
             | min(CAST(floor(value*10) AS BIGINT)) AS min_d,
             | max(CAST(floor(value*10) AS BIGINT)) AS max_d
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q34_grouping_sets" -> Q(
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("events_v")
        s.sql(
          """SELECT event_type, user_id, count(*) AS cnt
            |FROM events_v
            |GROUP BY GROUPING SETS ((event_type), (user_id))
            |ORDER BY event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, user_id, count(*) AS cnt
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (user_id))
             |ORDER BY event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin)),

    "q35_scalar_subquery" -> Q(
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        // integer-only comparison: cnt * n_active_custs > n_orders
        s.sql(
          """SELECT c.c_custkey, count(o.o_orderkey) AS cnt
            |FROM customer_v c JOIN orders_v o ON c.c_custkey = o.o_custkey
            |GROUP BY c.c_custkey
            |HAVING count(o.o_orderkey) *
            |  (SELECT count(DISTINCT o_custkey) FROM orders_v) >
            |  (SELECT count(*) FROM orders_v)
            |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, count(o.o_orderkey) AS cnt
             |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             |GROUP BY c.c_custkey
             |HAVING count(o.o_orderkey) *
             |  (SELECT count(DISTINCT o_custkey) FROM orders) >
             |  (SELECT count(*) FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    "q36_collect_sets" -> Q(
      // joined to a plain string: list-typed outputs format differently
      // across parquet readers, a needless hash-compare hazard
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("types"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             | array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
             | count(DISTINCT event_type) AS n_types
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // as-of join vs DuckDB's native ASOF JOIN — two entirely
    // independent implementations must agree row-for-row. Event times
    // are remapped into the orders date range so matches genuinely
    // vary; the right side is deduped to one row per (custkey, date).
    "q40_asof_join" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          col("event_id"),
          (col("user_id") % 150).as("cust"),
          to_timestamp(date_add(lit("1995-01-01").cast("date"),
            (col("event_id") % 2400).cast("int"))).as("at"))
        val ord = t(s, dir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"),
            // BIGINT cents, not DECIMAL — trailing-zero decimals render
            // engine-dependently and flap type-sensitive hash compares
            (max(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("o_price_c"))
          .withColumnRenamed("o_custkey", "cust")
        graft.ops.Temporal.asofJoin(ev, ord, "cust",
          col("at"), col("o_orderdate"), Seq("o_orderkey", "o_price_c"))
          .select(col("event_id"), col("o_orderkey"), col("o_price_c"))
          .orderBy(col("event_id"))
      },
      // Portable as-of oracle: union probe + state rows, carry the last
      // non-null state forward per cust (DuckDB's native ASOF JOIN has
      // version-sensitive equal-timestamp semantics — round-1 verdict).
      // State rows sort before probes at equal t (is_probe 0 < 1), so a
      // probe at exactly the state's timestamp matches it (>= semantics).
      Some("""WITH ev AS (
             | SELECT event_id, user_id % 150 AS cust,
             |  TIMESTAMP '1995-01-01' + to_days(CAST(event_id % 2400 AS INT)) AS at
             | FROM events),
             |ord AS (
             | SELECT o_custkey AS cust, o_orderdate,
             |  max(o_orderkey) AS o_orderkey,
             |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS o_price_c
             | FROM orders GROUP BY 1, 2),
             |u AS (
             | SELECT cust, at AS t, 1 AS is_probe, event_id,
             |  CAST(NULL AS BIGINT) AS o_orderkey,
             |  CAST(NULL AS BIGINT) AS o_price_c
             | FROM ev
             | UNION ALL
             | SELECT cust, CAST(o_orderdate AS TIMESTAMP) AS t, 0 AS is_probe,
             |  CAST(NULL AS BIGINT) AS event_id, o_orderkey, o_price_c
             | FROM ord),
             |f AS (
             | SELECT event_id, is_probe,
             |  last_value(o_orderkey IGNORE NULLS) OVER w AS o_orderkey,
             |  last_value(o_price_c IGNORE NULLS) OVER w AS o_price_c
             | FROM u
             | WINDOW w AS (PARTITION BY cust ORDER BY t, is_probe
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, o_orderkey, o_price_c FROM f WHERE is_probe = 1
             |ORDER BY event_id""".stripMargin)),

    // bucketed interval join: events (day-granular point) inside
    // 14-day order windows for the same customer; oracle is the plain
    // inequality join
    "q41_range_join" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          col("event_id"), (col("user_id") % 150).as("cust"),
          (col("event_id") % 2400).as("day"))
        val iv = t(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey").as("cust"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("start_day"))
          .withColumn("end_day", col("start_day") + 13)
        graft.ops.Temporal.rangeJoin(ev, iv,
          col("day"), col("start_day"), col("end_day"), bucketWidth = 14,
          keys = Seq("cust"))
          .select(col("event_id"), col("o_orderkey"))
          .orderBy(col("event_id"), col("o_orderkey"))
      },
      Some("""WITH ev AS (
             | SELECT event_id, user_id % 150 AS cust, event_id % 2400 AS day
             | FROM events),
             |iv AS (
             | SELECT o_orderkey, o_custkey,
             |  date_diff('day', DATE '1995-01-01', o_orderdate) AS start_day
             | FROM orders)
             |SELECT e.event_id, i.o_orderkey
             |FROM ev e JOIN iv i
             |  ON e.cust = i.o_custkey
             | AND e.day >= i.start_day AND e.day <= i.start_day + 13
             |ORDER BY e.event_id, i.o_orderkey""".stripMargin)),

    // HLL approximate distinct counts. The raw sketch estimates are
    // algorithm-specific (DuckDB's approx_distinct uses a different
    // sketch), so the driver-visible output carries what BOTH engines
    // can compute: the exact distinct counts plus an integer
    // within-10%-of-exact verdict on Spark's HLL estimate (default
    // rsd 0.05, so 10% is a 2-sigma bound and the flag is
    // deterministically 1 on this data — the oracle asserts exactly
    // that; an HLL drift past the bound flips the flag and reddens
    // the hash). Tighter estimate-vs-exact accuracy remains pinned by
    // ExtendedQueriesSpec.
    "q42_approx_distinct" -> Q(
      (s, dir) => {
        // two distinct-aggregations on DIFFERENT columns in one agg
        // would plan an Expand (N copies of every input row — measured
        // 5.9x on this query); one distinct column per pass keeps each
        // pass a plain two-stage partial agg, and the passes meet in a
        // 3-row broadcast join
        val li = t(s, dir, "lineitem")
        def pass(c: String, nm: String) = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col(c)).as(s"approx_$nm"),
            countDistinct(col(c)).as(s"exact_$nm"))
        pass("l_partkey", "parts")
          .join(broadcast(pass("l_orderkey", "orders")), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("approx_parts") - col("exact_parts")) * 10
              <= col("exact_parts")).cast("long").as("parts_within_10pct"),
            (abs(col("approx_orders") - col("exact_orders")) * 10
              <= col("exact_orders")).cast("long").as("orders_within_10pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             | count(DISTINCT l_partkey) AS exact_parts,
             | count(DISTINCT l_orderkey) AS exact_orders,
             | CAST(1 AS BIGINT) AS parts_within_10pct,
             | CAST(1 AS BIGINT) AS orders_within_10pct
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // native session windows (merge-within-gap) vs an oracle that
    // derives the same sessions with lag/cumsum arithmetic
    "q43_session_window" -> Q(
      (s, dir) => t(s, dir, "events")
        .select(col("user_id"),
          timestamp_micros(expr("ts DIV 1000")).as("tsm"),
          floor(col("value") * 10).cast("long").as("d"))
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), sum(col("d")).as("dur"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("cnt"), col("dur"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH e AS (
             | SELECT user_id, ts, CAST(floor(value*10) AS BIGINT) AS d,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
             | FROM events
             | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             | SELECT user_id, ts, d,
             |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             | FROM e)
             |SELECT user_id,
             | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             | count(*) AS cnt, CAST(sum(d) AS BIGINT) AS dur
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // skew tools under oracle: salting is semantically transparent, so
    // the plain aggregation / join IS the oracle — the hash match
    // proves the two-phase merge and key replication change nothing
    "q52_salted_agg" -> Q(
      (s, dir) => graft.ops.Skew.saltedCountSum(
        t(s, dir, "events"),
        keys = Seq(col("event_type")),
        valueCol = floor(col("value") * 10).cast("long"),
        saltSource = col("user_id"), salts = 8)
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS count,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) AS BIGINT) AS sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q53_salted_join" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), (col("user_id") % 25).as("n_nationkey"))
        val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        graft.ops.Skew.saltedJoin(ev, nat, "n_nationkey",
          saltSource = col("event_id"), salts = 8)
          .select(col("event_id"), col("n_name"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, n_name
             |FROM events JOIN nation ON user_id % 25 = n_nationkey
             |ORDER BY event_id""".stripMargin)),

    // Time-based rolling aggregates: a RANGE frame over integer epoch
    // seconds (10-minute trailing window per user). RANGE — not ROWS —
    // is the semantics a monitoring/feature pipeline needs ("events in
    // the last N minutes"), and the integer ORDER BY key keeps the
    // frame arithmetic exact cross-engine. One hash shuffle on
    // user_id; each partition is a linear scan with a sliding frame.
    // The user subset keeps the driver-side result bounded — the
    // window itself runs pre-LIMIT shapes at full scale.
    "q86_rolling_window" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
          .rangeBetween(-600, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") % 47 === 0)
          .select(col("event_id"), col("user_id"),
            expr("ts DIV 1000000000").as("ts_sec"),
            floor(col("value") * 10).cast("long").as("d"))
          .withColumn("roll_cnt", count(lit(1)).over(w))
          .withColumn("roll_sum", sum(col("d")).over(w))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      Some("""WITH e AS (
             | SELECT event_id, user_id,
             |  epoch_ns(ts) // 1000000000 AS ts_sec,
             |  CAST(floor(value*10) AS BIGINT) AS d
             | FROM events WHERE user_id % 47 = 0)
             |SELECT event_id, user_id, ts_sec, d,
             | count(*) OVER w AS roll_cnt,
             | CAST(sum(d) OVER w AS BIGINT) AS roll_sum
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             | RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts_sec, event_id""".stripMargin)),

    // Retention cohort matrix: users grouped by first-seen week,
    // counted in each later week they return. Week index is integer
    // epoch-day DIV 7 — no engine week-start semantics in play. Two
    // hash shuffles (per-user min, then cell counts); the (user, week)
    // distinct collapses activity before the join, so the cohort join
    // runs on user-week granularity, not raw events.
    "q89_retention_cohorts" -> Q(
      (s, dir) => {
        val uw = t(s, dir, "events")
          .select(col("user_id"),
            expr("ts DIV 1000000000 DIV 604800").as("week"))
          .distinct()
        val cohort = uw.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        uw.join(cohort, Seq("user_id"))
          .withColumn("offset", col("week") - col("cohort_week"))
          .groupBy(col("cohort_week"), col("offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("offset"))
      },
      Some("""WITH uw AS (
             | SELECT DISTINCT user_id,
             |  epoch_ns(ts) // 1000000000 // 604800 AS week
             | FROM events),
             |c AS (SELECT user_id, min(week) AS cohort_week
             |      FROM uw GROUP BY 1)
             |SELECT cohort_week, week - cohort_week AS "offset",
             | count(*) AS n_users
             |FROM uw JOIN c USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Ordered conversion funnel: signup -> click -> purchase, each
    // stage's timestamp strictly after the previous stage's FIRST
    // completion (min-ts chaining — the standard funnel semantics).
    // Each stage is a filtered per-user min + an equi-join on user_id;
    // stage populations only shrink, so later joins run on shrinking
    // keys. Output: one row per stage with the surviving user count.
    "q90_funnel" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_type"), expr("ts DIV 1000").as("tsu"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("tsu") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("tsu") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t3"))
        val stages = Seq(("1_signup", s1), ("2_click_after_signup", s2),
          ("3_purchase_after_click", s3))
        stages.map { case (nm, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(nm).as("stage"),
            col("n_users"))
        }.reduce(_.unionAll(_)).orderBy(col("stage"))
      },
      Some("""WITH ev AS (
             | SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
             | FROM events),
             |s1 AS (SELECT user_id, min(tsu) AS t1 FROM ev
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT ev.user_id, min(tsu) AS t2 FROM ev
             |       JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tsu > t1 GROUP BY 1),
             |s3 AS (SELECT ev.user_id, min(tsu) AS t3 FROM ev
             |       JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tsu > t2 GROUP BY 1)
             |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
             |UNION ALL
             |SELECT '2_click_after_signup', count(*) FROM s2
             |UNION ALL
             |SELECT '3_purchase_after_click', count(*) FROM s3
             |ORDER BY stage""".stripMargin)),

    // Grouped exact top-k via the custom TypedImperativeAggregate
    // (ops/TopKAgg.scala): k-bounded heaps with map-side partial
    // combine replace the rank-window's full per-group shuffle-sort.
    // The oracle IS that window — the hash match proves the heap
    // aggregate implements (ord DESC, payload ASC) ranking exactly,
    // ties included.
    "q93_topk_agg" -> Q(
      (s, dir) => {
        val pre = t(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            floor(col("value") * 10).cast("long").as("d"))
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("d")).as("dur"))
        pre.groupBy(col("event_type"))
          .agg(graft.ops.TopKAgg.topKBy(col("dur"),
            col("user_id").cast("string"), 3).as("top"))
          .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("event_type"),
            (col("pos") + 1).cast("int").as("rank"),
            col("t.payload").as("user_id"),
            col("t.ord").as("dur"))
          .orderBy(col("event_type"), col("rank"))
      },
      Some("""WITH p AS (
             | SELECT event_type, user_id,
             |  CAST(sum(CAST(floor(value*10) AS BIGINT)) AS BIGINT) AS dur
             | FROM events GROUP BY 1, 2),
             |r AS (
             | SELECT event_type, CAST(user_id AS VARCHAR) AS user_id, dur,
             |  CAST(row_number() OVER (PARTITION BY event_type
             |   ORDER BY dur DESC, CAST(user_id AS VARCHAR)) AS INTEGER) AS rank
             | FROM p)
             |SELECT event_type, rank, user_id, dur FROM r
             |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin)),

    "q37_json_extract" -> Q(
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
