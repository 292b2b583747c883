package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.parse.LogColumns

/** Driver-contract embodiments of the reference operator inventory
  * (SURVEY.md §2) over the TPC-H-ish test tables, each paired with an
  * ANSI-SQL DuckDB oracle.
  *
  * Conventions for oracle hash-parity:
  *  - double columns that get aggregated are cast to DECIMAL(18,2)
  *    first (exact arithmetic — summing IEEE doubles in different
  *    orders would flap the hash) — but the FINAL output is always
  *    BIGINT cents (`(sum(...)*100).cast("long")`), never DECIMAL:
  *    trailing-zero decimals ("730.00") render engine-dependently;
  *  - every query ends in a total ORDER BY (ties broken by keys);
  *  - the reference's floor-division average is `//` in DuckDB and
  *    floor() in Spark, both on exact integers.
  */
object CoreQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** events.ts is INT64 nanos (read as long); integer-divide to micros. */
  private def evTs = timestamp_micros(expr("ts DIV 1000"))

  def all: Map[String, Q] = Map(

    // S6/A1 — full-scan grouped aggregation (reference A1 shape)
    "q01_agg_sum" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          (sum(col("l_quantity").cast("decimal(18,2)")) * 100).cast("long").as("sum_qty_c"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100).cast("long").as("sum_price_c"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      // Final outputs are exact BIGINT cents, never DECIMAL: decimal
      // values with trailing zeros ("730.00") render differently across
      // engines' string paths and flap type-sensitive hash compares. The
      // ×100 happens AFTER the exact DECIMAL(18,2) sum, so no precision
      // is lost.
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_c
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // P3 — HAVING min_count (reference :1077-1091)
    "q02_having" -> Q(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"),
          (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
        .filter(col("cnt") >= 5)
        .orderBy(col("event_type"), col("user_id")),
      Some("""SELECT event_type, user_id, count(*) AS cnt,
             | CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
             |FROM events GROUP BY 1,2 HAVING count(*) >= 5 ORDER BY 1,2""".stripMargin)),

    // T1 — global top-N with deterministic tie-break (TakeOrderedAndProject)
    "q03_topn" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100).cast("long").as("revenue_c"),
          count(lit(1)).as("cnt"))
        .orderBy(col("revenue_c").desc, col("l_partkey").asc)
        .limit(100),
      Some("""SELECT l_partkey,
             | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_c,
             | count(*) AS cnt
             |FROM lineitem GROUP BY 1
             |ORDER BY revenue_c DESC, l_partkey LIMIT 100""".stripMargin)),

    // A4 — per-minute tumbling volume with floor-div average
    "q04_volume" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(
            date_format(date_trunc("minute", evTs), "yyyy-MM-dd HH:mm").as("minute"),
            floor(col("value") * 10).cast("long").as("duration"))
        ev.groupBy(col("minute"))
          .agg(count(lit(1)).as("cnt"), sum(col("duration")).as("duration"))
          .withColumn("avg_duration", floor(col("duration") / col("cnt")).cast("long"))
          .orderBy(col("minute"))
      },
      Some("""SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
             | count(*) AS cnt,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) AS BIGINT) AS duration,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) // count(*) AS BIGINT) AS avg_duration
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A5+W1 — per-minute top-k by ranking window
    "q05_volume_top" -> Q(
      (s, dir) => {
        val agg = t(s, dir, "events")
          .select(date_format(date_trunc("hour", evTs), "yyyy-MM-dd HH:00").as("bucket"),
            col("event_type"))
          .groupBy(col("bucket"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("bucket"))
          .orderBy(col("cnt").desc, col("event_type").asc)
        agg.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("bucket"), col("rn"))
      },
      Some("""WITH a AS (
             | SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
             |  event_type, count(*) AS cnt
             | FROM events GROUP BY 1,2),
             |r AS (SELECT *, CAST(row_number() OVER
             |  (PARTITION BY bucket ORDER BY cnt DESC, event_type) AS INTEGER) AS rn FROM a)
             |SELECT bucket, event_type, cnt, rn FROM r WHERE rn <= 3
             |ORDER BY bucket, rn""".stripMargin)),

    // J1/J2 — dimension enrichment with 'unknown' sentinel. Only
    // `nation` (fixed 25 rows) is hint-broadcast; `customer` scales
    // with sf, so its join strategy is left to AQE (broadcast at small
    // sf, shuffle join at scale) — the reference's analog of this
    // enrichment joins against a schema catalog, which maps to the
    // nation side, not the customer side.
    "q06_join_enrich" -> Q(
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val customer = t(s, dir, "customer")
        val nation = broadcast(t(s, dir, "nation"))
        orders
          .join(customer, col("o_custkey") === col("c_custkey"), "left")
          .join(nation, col("c_nationkey") === col("n_nationkey"), "left")
          .groupBy(coalesce(col("n_name"), lit("unknown")).as("nation"))
          .agg(count(lit(1)).as("cnt"),
            (sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long").as("total_c"))
          .orderBy(col("nation"))
      },
      Some("""SELECT coalesce(n_name, 'unknown') AS nation, count(*) AS cnt,
             | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_c
             |FROM orders
             |LEFT JOIN customer ON o_custkey = c_custkey
             |LEFT JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // C1 — multi-way CASE classification (first-match-wins when chain)
    "q07_classify" -> Q(
      (s, dir) => t(s, dir, "events")
        .select(
          when(col("event_type") === "purchase" && col("value") >= 100, "BIG_PURCHASE")
            .when(col("event_type") === "purchase", "PURCHASE")
            .when(col("event_type") === "error", "ERROR")
            .otherwise("OTHER").as("class"),
          col("value"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("cnt"),
          (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
        .orderBy(col("class")),
      Some("""SELECT CASE
             |  WHEN event_type = 'purchase' AND value >= 100 THEN 'BIG_PURCHASE'
             |  WHEN event_type = 'purchase' THEN 'PURCHASE'
             |  WHEN event_type = 'error' THEN 'ERROR'
             |  ELSE 'OTHER' END AS class,
             | count(*) AS cnt,
             | CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_c
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F2 — the REAL lexer over synthesized slow-query lines; the oracle
    // computes the expected parse directly from the source columns
    "q08_lex_agg" -> Q(
      (s, dir) => {
        val msgs = t(s, dir, "events").select(concat(
          lit("WARN Query too slow, took "),
          floor(col("value") * 10).cast("long").cast("string"),
          lit(" ms: [1 bound values] SELECT * FROM ks"),
          (col("user_id") % 3).cast("string"),
          lit(".t"), (col("event_id") % 5).cast("string"),
          lit(" WHERE id=?; [id:'u"), col("user_id").cast("string"),
          lit("']")).as("message"))
        msgs.select(LogColumns.lex(col("message")).as("lex"))
          .select(col("lex.query").as("query"), col("lex.duration").as("duration"))
          .groupBy(col("query"))
          .agg(count(lit(1)).as("cnt"), sum(col("duration")).as("duration"))
          .withColumn("avg_duration", floor(col("duration") / col("cnt")).cast("long"))
          .orderBy(col("query"))
      },
      Some("""SELECT 'SELECT * FROM ks' || CAST(user_id % 3 AS VARCHAR)
             |  || '.t' || CAST(event_id % 5 AS VARCHAR) || ' WHERE id=?;' AS query,
             | count(*) AS cnt,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) AS BIGINT) AS duration,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) // count(*) AS BIGINT) AS avg_duration
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // F3 — bound-values map parse; oracle reconstructs expected values
    "q09_bound_values" -> Q(
      (s, dir) => {
        val msgs = t(s, dir, "events").select(
          col("event_id"),
          concat(lit("[ a:'x"), col("user_id").cast("string"),
            lit("', b:'y"), col("event_id").cast("string"), lit("']")).as("bv"))
        msgs.select(
          col("event_id"),
          LogColumns.boundValuesMap(col("bv")).as("m"))
          .select(col("event_id"),
            try_element_at(col("m"), lit("a")).as("a_val"),
            try_element_at(col("m"), lit("b")).as("b_val"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, 'x' || CAST(user_id AS VARCHAR) AS a_val,
             | 'y' || CAST(event_id AS VARCHAR) AS b_val
             |FROM events ORDER BY event_id""".stripMargin)),

    // S7 — union + distinct aggregation
    "q10_union" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(col("event_type") === "purchase" && col("value") >= 50)
        val b = ev.filter(col("event_type") === "error")
        a.unionByName(b)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users
             |FROM (
             | SELECT * FROM events WHERE event_type = 'purchase' AND value >= 50
             | UNION ALL
             | SELECT * FROM events WHERE event_type = 'error')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // set ops — intersect/except (engine-complete beyond reference's union)
    "q11_set_ops" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val signups = ev.filter(col("event_type") === "signup").select(col("user_id"))
        val purchases = ev.filter(col("event_type") === "purchase").select(col("user_id"))
        signups.intersect(purchases)
          .withColumn("kind", lit("both"))
          .unionByName(
            signups.except(purchases).withColumn("kind", lit("signup_only")))
          .orderBy(col("kind"), col("user_id"))
      },
      Some("""SELECT user_id, 'both' AS kind FROM
             | (SELECT user_id FROM events WHERE event_type='signup'
             |  INTERSECT
             |  SELECT user_id FROM events WHERE event_type='purchase')
             |UNION ALL
             |SELECT user_id, 'signup_only' AS kind FROM
             | (SELECT user_id FROM events WHERE event_type='signup'
             |  EXCEPT
             |  SELECT user_id FROM events WHERE event_type='purchase')
             |ORDER BY kind, user_id""".stripMargin)),

    // semi/anti joins (EXISTS / NOT EXISTS)
    "q12_semi_anti" -> Q(
      (s, dir) => {
        val customer = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
        val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_orders").as("kind"))
        val noO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_orders").as("kind"))
        withO.unionByName(noO).orderBy(col("kind"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, 'has_orders' AS kind FROM customer c
             | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |UNION ALL
             |SELECT c_custkey, 'no_orders' AS kind FROM customer c
             | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY kind, c_custkey""".stripMargin)),

    // F7 — PK concatenation with null-skipping concat_ws
    "q13_pk_concat" -> Q(
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          concat_ws("-",
            col("c_custkey").cast("string"),
            col("c_nationkey").cast("string"),
            nullif(col("c_mktsegment"), lit("BUILDING"))).as("pk"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, concat_ws('-', CAST(c_custkey AS VARCHAR),
             |  CAST(c_nationkey AS VARCHAR), nullif(c_mktsegment, 'BUILDING')) AS pk
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // rollup — hierarchical aggregation (engine-complete extra)
    "q14_rollup" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          (sum(col("l_quantity").cast("decimal(18,2)")) * 100).cast("long").as("sum_qty_c"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_c
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // analytic windows — lag + running sum (beyond reference's W1)
    "q15_window_analytics" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("running",
            sum(floor(col("value") * 10).cast("long"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("event_id"), col("user_id"), col("prev_type"), col("running"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             | lag(event_type, 1) OVER w AS prev_type,
             | CAST(sum(CAST(floor(value*10) AS BIGINT)) OVER
             |  (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // sessionization — gap-based sessions via window composition
    "q16_sessionize" -> Q(
      (s, dir) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapNs = 30L * 60 * 1000 * 1000 * 1000
        t(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             | SELECT user_id, ts, event_id,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
             | FROM events
             | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             | SELECT user_id,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             | FROM g)
             |SELECT user_id, session_id, count(*) AS cnt FROM s
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin))
  )
}
