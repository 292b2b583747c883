package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Prefix

/** Round-8 warehouse shapes: the hard TPC-H join patterns the board
  * lacked — Q1's canonical wide multi-aggregate pricing summary
  * (q230), Q21's double EXISTS/NOT-EXISTS self-join on the fact
  * table realized as semi+anti joins (q231), and the two correlated
  * scalar-aggregate subqueries Q17 (q232) and a Q20-style dominant-
  * supplier pattern (q233), both decorrelated into aggregate-joins —
  * one aggregation pass per key, never per-row re-aggregation.
  *
  * Money math follows the registry convention (q190/q227): integer
  * revenue units `floor(price*100) * (100 - floor(disc*100))` so the
  * DuckDB oracle reproduces every hash bit-for-bit — no DECIMAL in
  * final results, no float accumulation order hazard.
  *
  * Scale notes: every join here shuffles on its key or semi/anti-
  * joins the fact table against itself on the order key; the only
  * broadcast() hints are fixed-size inputs (the 25-row nation
  * table), per the q191 rule — sf-scaling frames (filtered part
  * subsets, per-part aggregates) are left to AQE, which will
  * broadcast them when runtime stats allow and shuffle when not.
  */
object WarehouseQueries {

  import Registry.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Registry.table(spark, dir, name)

  /** Integer revenue units: cents x (100 - discount%). */
  private def revU(price: String, disc: String) =
    floor(col(price) * 100).cast("long") *
      (lit(100L) - floor(col(disc) * 100).cast("long"))

  def all: Map[String, Q] = Map(

    // TPC-H Q1 shape (pricing summary): the canonical wide
    // multi-aggregate scan — one pass over lineitem, six aggregates
    // with expression arithmetic per row, grouped by the 6-cell
    // (returnflag, linestatus) domain. Whole-stage-codegen hash agg
    // with map-side partials; integer units make disc_price and
    // charge exact (charge = cents x (100-d%) x (100+t%), so 1e4 x
    // the dollar value). Averages are truncating integer ratios of
    // the group sums.
    "q230_pricing_summary" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("ep_u"),
          floor(col("l_discount") * 100).cast("long").as("disc_c"),
          floor(col("l_tax") * 100).cast("long").as("tax_c"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty")).as("sum_qty"),
          sum(col("ep_u")).as("sum_base_u"),
          sum(col("ep_u") * (lit(100L) - col("disc_c"))).as("sum_disc_u"),
          sum(col("ep_u") * (lit(100L) - col("disc_c")) *
            (lit(100L) + col("tax_c"))).as("sum_charge_u"),
          sum(col("disc_c")).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty_centi", expr("sum_qty * 100 DIV count_order"))
        .withColumn("avg_price_u", expr("sum_base_u DIV count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
          |  AS BIGINT) AS sum_base_u,
          | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT) *
          |  (100 - CAST(floor(l_discount * 100) AS BIGINT))) AS BIGINT)
          |  AS sum_disc_u,
          | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT) *
          |  (100 - CAST(floor(l_discount * 100) AS BIGINT)) *
          |  (100 + CAST(floor(l_tax * 100) AS BIGINT))) AS BIGINT)
          |  AS sum_charge_u,
          | CAST(sum(CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT)
          |  AS sum_disc_c,
          | count(*) AS count_order,
          | CAST(sum(CAST(l_quantity AS BIGINT)) * 100 // count(*)
          |  AS BIGINT) AS avg_qty_centi,
          | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
          |  // count(*) AS BIGINT) AS avg_price_u
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // classic double-correlated self-join stress on the fact table.
    // The schema has no commit/receipt dates, so "failed the order"
    // is marked by l_returnflag = 'R' on a finalized ('F') order:
    // count, per supplier, the returned line items on orders where
    // at least one OTHER supplier also shipped (EXISTS -> LEFT SEMI
    // self-join on the order key with a suppkey-inequality residual)
    // but no OTHER supplier's item was returned (NOT EXISTS -> LEFT
    // ANTI self-join, same shape). Both realized as single-shuffle
    // joins on l_orderkey — PlanShapeSpec pins semi+anti presence
    // and the absence of any cartesian/nested-loop fallback.
    "q231_waiting_supplier" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val l1 = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val l2 = li.select(col("l_orderkey").as("o2"),
          col("l_suppkey").as("s2"))
        val l3 = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
        l1.join(l2, col("l_orderkey") === col("o2") &&
            col("l_suppkey") =!= col("s2"), "left_semi")
          .join(l3, col("l_orderkey") === col("o3") &&
            col("l_suppkey") =!= col("s3"), "left_anti")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some(
        """SELECT s_name, count(*) AS numwait
          |FROM lineitem l1
          |JOIN orders ON o_orderkey = l1.l_orderkey
          | AND o_orderstatus = 'F'
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE l1.l_returnflag = 'R'
          | AND EXISTS (SELECT 1 FROM lineitem l2
          |  WHERE l2.l_orderkey = l1.l_orderkey
          |   AND l2.l_suppkey <> l1.l_suppkey)
          | AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |  WHERE l3.l_orderkey = l1.l_orderkey
          |   AND l3.l_suppkey <> l1.l_suppkey
          |   AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // scalar-aggregate subquery — "lines whose quantity is under 20%
    // of the part's average" — DECORRELATED: one groupBy computes
    // (count, sum qty) per part, joined back to the line rows; the
    // per-row predicate qty < 0.2 * avg becomes the integer-exact
    // cross-multiplication qty * 5 * n < sum_qty. The brand filter
    // restricts lineitem FIRST (partkey-equijoin against the
    // filtered part list), and because the restriction is by the
    // aggregation key, per-part aggregates over the restricted frame
    // equal those over the full table — the subquery never scans
    // unqualified parts' lines. One cached pass feeds both the
    // aggregate and the probe side.
    "q232_small_qty_revenue" -> Q(
      (s, dir) => {
        val qual = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23" && col("p_size") <= 15)
          .select(col("p_partkey"))
        val li = graft.Scratch.cache(t(s, dir, "lineitem")
          .join(qual, col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            col("l_quantity").cast("long").as("qty"),
            floor(col("l_extendedprice") * 100).cast("long").as("ep_u")))
        val ag = li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
        li.join(ag, Seq("l_partkey"))
          .filter(col("qty") * lit(5L) * col("n") < col("sq"))
          .agg(count(lit(1)).as("n_small"),
            coalesce(sum(col("ep_u")), lit(0L)).as("s"))
          .select(col("n_small"),
            expr("s DIV 7").as("avg_yearly_u"))
      },
      Some(
        """WITH q AS (SELECT p_partkey FROM part
          |  WHERE p_brand = 'Brand#23' AND p_size <= 15),
          |li AS (
          | SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
          |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS ep_u
          | FROM lineitem JOIN q ON l_partkey = p_partkey),
          |ag AS (
          | SELECT l_partkey, count(*) AS n, sum(qty) AS sq
          | FROM li GROUP BY 1)
          |SELECT count(*) AS n_small,
          | CAST(CAST(COALESCE(sum(ep_u), 0) AS BIGINT) // 7 AS BIGINT)
          |  AS avg_yearly_u
          |FROM li JOIN ag USING (l_partkey)
          |WHERE qty * 5 * n < sq""".stripMargin)),

    // TPC-H Q8 shape (national market share): the 8-way multi-level
    // star — lineitem fans out to orders -> customer -> nation ->
    // region on one side and supplier -> nation on the other, with
    // part filtering the fact rows. nation (twice, two roles) and
    // region carry broadcast hints (fixed-size: 25/5 rows);
    // customer/supplier/part/orders scale with sf and are left to
    // AQE (q191 rule). Share = conditional-sum permille per order
    // year, all integer units.
    "q237_market_share" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revU("l_extendedprice", "l_discount").as("rev"))
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("yr"))
        val pt = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val n1 = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
        val reg = broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA").select(col("r_regionkey")))
        val n2 = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation")))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(pt, col("l_partkey") === col("p_partkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(n1, col("c_nationkey") === col("c_nk"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(n2, col("s_nationkey") === col("s_nk"))
          .groupBy(col("yr"))
          .agg(count(lit(1)).as("n_items"),
            sum(when(col("supp_nation") === "NATION_5", col("rev"))
              .otherwise(0L)).as("nation_rev_u"),
            sum(col("rev")).as("total_rev_u"))
          .withColumn("mkt_share_permille", expr(
            "CASE WHEN total_rev_u = 0 THEN 0" +
              " ELSE nation_rev_u * 1000 DIV total_rev_u END"))
          .orderBy(col("yr"))
      },
      Some(
        """WITH rev AS (
          | SELECT year(o_orderdate) AS yr, n2.n_name AS supp_nation,
          |  CAST(floor(l_extendedprice * 100) AS BIGINT) *
          |   (100 - CAST(floor(l_discount * 100) AS BIGINT)) AS rev
          | FROM lineitem
          | JOIN orders ON o_orderkey = l_orderkey
          | JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
          | JOIN customer ON c_custkey = o_custkey
          | JOIN nation n1 ON n1.n_nationkey = c_nationkey
          | JOIN region ON r_regionkey = n1.n_regionkey
          |  AND r_name = 'ASIA'
          | JOIN supplier ON s_suppkey = l_suppkey
          | JOIN nation n2 ON n2.n_nationkey = s_nationkey
          | WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |   AND o_orderdate < TIMESTAMP '1998-01-01')
          |SELECT yr, count(*) AS n_items,
          | CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
          |  ELSE 0 END) AS BIGINT) AS nation_rev_u,
          | CAST(sum(rev) AS BIGINT) AS total_rev_u,
          | CAST(CASE WHEN sum(rev) = 0 THEN 0
          |  ELSE sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
          |   ELSE 0 END) * 1000 // sum(rev) END AS BIGINT)
          |  AS mkt_share_permille
          |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q9 shape (product-type profit): the expression-heavy
    // multi-level star — per (supplier nation, order year) profit
    // where each line's amount is revenue units minus cost units
    // (this schema has no partsupp, so unit cost is the part's
    // retail price: amount = rev_u - retail_cents * 100 * qty, all
    // in the same 1e-4-dollar units; negative amounts are real and
    // keep the integer math honest). Only the 25-row nation table is
    // hinted; part/supplier/orders join by key under AQE.
    "q238_product_profit" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"),
            revU("l_extendedprice", "l_discount").as("rev"))
        val pt = t(s, dir, "part")
          .filter(col("p_name").contains("gear"))
          .select(col("p_partkey"),
            floor(col("p_retailprice") * 100).cast("long").as("cost_c"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr"))
        val sup = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nat = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name")))
        li.join(pt, col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .withColumn("amount_u",
            col("rev") - col("cost_c") * lit(100L) * col("qty"))
          .groupBy(col("n_name"), col("yr"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("amount_u")).as("profit_u"))
          .orderBy(col("n_name"), col("yr").desc)
      },
      Some(
        """SELECT n_name, year(o_orderdate) AS yr, count(*) AS n_items,
          | CAST(sum(
          |  CAST(floor(l_extendedprice * 100) AS BIGINT) *
          |   (100 - CAST(floor(l_discount * 100) AS BIGINT)) -
          |  CAST(floor(p_retailprice * 100) AS BIGINT) * 100 *
          |   CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_u
          |FROM lineitem
          |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
          |JOIN orders ON o_orderkey = l_orderkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON n_nationkey = s_nationkey
          |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin)),

    // TPC-H Q22 shape (dormant high-balance customers): the
    // scalar-average-filter + anti-join pattern — customers in three
    // market segments whose balance beats the positive-balance
    // average (a 1-row broadcast scalar via Prefix.withGlobal, never
    // an unpartitioned window) and who placed NO order since
    // 2000-01-01 (NOT EXISTS -> LEFT ANTI against the date-filtered
    // orders — the filter pushes into the anti-join's build side).
    // Integer cents keep both sides hash-exact.
    "q240_dormant_customers" -> Q(
      (s, dir) => {
        val sel = t(s, dir, "customer")
          .filter(col("c_mktsegment")
            .isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
          .select(col("c_custkey"), col("c_mktsegment"),
            floor(col("c_acctbal") * 100).cast("long").as("bal_c"))
        val avgRow = sel.filter(col("bal_c") > 0)
          .agg(sum(col("bal_c")).cast("long").as("sum_bal"),
            count(lit(1)).as("cnt"))
          // Structural integer DIV, matching the oracle's `//` exactly
          // rather than relying on double division staying precise.
          .select(expr("sum_bal DIV cnt").as("avg_c"))
        val recent = t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
          .select(col("o_custkey"))
        sel.join(broadcast(avgRow))
          .filter(col("bal_c") > col("avg_c"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal_c")).as("total_bal_c"))
          .orderBy(col("c_mktsegment"))
      },
      Some(
        """WITH sel AS (
          | SELECT c_custkey, c_mktsegment,
          |  CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_c
          | FROM customer
          | WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')),
          |a AS (
          | SELECT CAST(CAST(sum(bal_c) AS BIGINT) // count(*) AS BIGINT)
          |  AS avg_c
          | FROM sel WHERE bal_c > 0)
          |SELECT c_mktsegment, count(*) AS numcust,
          | CAST(sum(bal_c) AS BIGINT) AS total_bal_c
          |FROM sel, a
          |WHERE bal_c > avg_c AND NOT EXISTS (
          | SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |  AND o_orderdate >= TIMESTAMP '2000-01-01')
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q11 shape (important stock): group-HAVING against a
    // GLOBAL scalar — per-part revenue value kept only when it
    // exceeds 1/1500 of the whole corpus's value. The global total
    // is a second aggregate over the per-part frame, broadcast as
    // one row; the HAVING becomes an integer cross-multiplication
    // (value * 1500 > total), never a per-row re-aggregation or an
    // unpartitioned window.
    "q241_important_parts" -> Q(
      (s, dir) => {
        val v = t(s, dir, "lineitem")
          .select(col("l_partkey"),
            revU("l_extendedprice", "l_discount").as("rev"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("rev")).as("value_u"))
        Prefix.withGlobal(v, "total_u" -> sum(col("value_u")))
          .filter(col("value_u") * 1500 > col("total_u"))
          .select(col("l_partkey"), col("value_u"))
          .orderBy(col("value_u").desc, col("l_partkey"))
      },
      Some(
        """WITH v AS (
          | SELECT l_partkey,
          |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT) *
          |   (100 - CAST(floor(l_discount * 100) AS BIGINT))) AS BIGINT)
          |   AS value_u
          | FROM lineitem GROUP BY 1),
          |tot AS (SELECT CAST(sum(value_u) AS BIGINT) AS t FROM v)
          |SELECT l_partkey, value_u
          |FROM v, tot WHERE value_u * 1500 > t
          |ORDER BY value_u DESC, l_partkey""".stripMargin)),

    // TPC-H Q12 shape (shipping-mode priority split): fact-dimension
    // join with a CONDITIONAL-COUNT pivot — per line status (the
    // schema's ship-mode analog), how many shipped lines belonged to
    // high-priority orders (1-URGENT / 2-HIGH) vs not, in a one-year
    // ship window. One shuffle on the order key, two CASE-sum
    // aggregates; the date filter pushes to the lineitem scan. With
    // this row, all 22 TPC-H query shapes have a board analog.
    "q242_priority_split" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")))
          .select(col("l_orderkey"), col("l_linestatus"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some(
        """SELECT l_linestatus,
          | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q20 shape (qualifying suppliers): the nested
    // IN-subquery-with-correlated-aggregate pattern, restated for
    // this schema (no partsupp table): suppliers who DOMINATED the
    // 1996 supply of some red part — their (supplier, part) shipped
    // quantity exceeds half the part's total — surfaced by name and
    // nation. Decorrelation: the per-part total is ONE aggregate
    // joined to the (supplier, part) rollup (never recomputed per
    // row), and the outer IN becomes a LEFT SEMI join onto supplier.
    // Both rollups come from one cached scan of the 1996 window; the
    // only broadcast() is the fixed-size nation table.
    "q233_dominant_supplier" -> Q(
      (s, dir) => {
        val li = graft.Scratch.cache(t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")))
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty")))
        val partQty = li.groupBy(col("l_partkey"))
          .agg(sum(col("qty")).as("part_qty"))
        val suppPart = li
          .join(t(s, dir, "part")
            .filter(col("p_name").startsWith("red"))
            .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("qty")).as("supp_qty"))
        val dominant = suppPart.join(partQty, Seq("l_partkey"))
          .filter(col("supp_qty") * 2 > col("part_qty"))
        t(s, dir, "supplier")
          .join(dominant, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some(
        """WITH li AS (
          | SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
          | FROM lineitem
          | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |   AND l_shipdate < TIMESTAMP '1997-01-01'),
          |pq AS (SELECT l_partkey, sum(qty) AS part_qty
          |       FROM li GROUP BY 1),
          |sp AS (SELECT l_suppkey, l_partkey, sum(qty) AS supp_qty
          |       FROM li JOIN part ON l_partkey = p_partkey
          |       WHERE p_name LIKE 'red%' GROUP BY 1, 2)
          |SELECT s_suppkey, s_name, n_name
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_suppkey IN (
          | SELECT l_suppkey FROM sp JOIN pq USING (l_partkey)
          | WHERE supp_qty * 2 > part_qty)
          |ORDER BY s_suppkey""".stripMargin))
  )
}
