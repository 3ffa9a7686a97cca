package graft.ops

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational engine capability: scans, projections, filters, joins (all
  * kinds), hash aggregation, windows, rollup, set ops, sort/limit/top-k.
  *
  * The reference's own relational surface is tiny — one single-table
  * GROUP BY mart (`/root/reference/dbt/models/marts/fct_spacex_launches_by_year.sql:3-11`)
  * over a cast-only staging view
  * (`/root/reference/dbt/models/staging/stg_spacex_launches.sql:3-24`) — so
  * most rows here are the ABSENT-in-reference capabilities from SURVEY.md
  * §2.2–2.9, expressed over the TPC-H-ish testdata.
  *
  * Scale stance (100 TB): every query is a declarative plan — filters and
  * projections reach the parquet scan, aggregates use partial+final
  * HashAggregate, dimension joins broadcast the bounded side
  * (region/nation/supplier/part — broadcast-sized at every sf per
  * FIXTURES.md), fact-fact joins shuffle on their keys and rely on AQE for
  * skew/coalescing. No collect(), no driver-side loops.
  *
  * Determinism for the DuckDB oracle: every output ends with a total ORDER BY
  * (unique tie-break), double aggregates go through [[graft.Exact]], and no
  * nondeterministic functions appear.
  */
object Relational {

  private def yearL(c: Column): Column = year(c).cast("long")

  /** `sum(l_extendedprice * (1 - l_discount))` in exact integer cents×bp —
    * see [[graft.Exact.scaledLong]] for why products can't sum as doubles. */
  private def revenueSum: Column =
    sum(Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount"))))
      .cast("double") / lit(10000.0)

  private val revenueSumSql: String =
    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0"

  /** Exact money sum (integer cents → double): safe at any magnitude, unlike
    * a double→decimal cast path (see [[graft.Exact.dsum]] caveat). */
  private def moneySum(c: Column): Column =
    sum(Exact.cents(c)).cast("double") / lit(100.0)

  private def moneySumSql(x: String): String =
    s"CAST(sum(CAST(round($x * 100) AS BIGINT)) AS DOUBLE) / 100.0"

  /** TPC-H Q1-shaped pricing summary: filter → groupBy → exact sums/avgs.
    * Covers SURVEY §2.4 A1/A2/A9 + §2.2 P5 (the reference's mart shape,
    * `fct_spacex_launches_by_year.sql:4-10`, generalized to two keys). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        (sum(Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount"))))
          .cast("double") / lit(10000.0)).as("sum_disc_price"),
        (sum(Exact.cents(col("l_extendedprice")) * (lit(100L) - Exact.cents(col("l_discount")))
          * (lit(100L) + Exact.cents(col("l_tax")))).cast("double") / lit(1000000.0)).as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty,
      |  ${moneySumSql("l_extendedprice")} AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Top-k by sort: TakeOrderedAndProject, tie-broken on the unique key.
    * SURVEY §2.7 O2 (`/root/reference/README.md:102`). */
  def q02TopkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  val q02Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin

  /** Revenue per (region, nation): fact scan joined to three broadcast dims.
    * Joins are ABSENT in the reference (SURVEY §2.3) — this is the canonical
    * star-join the `rocket` FK (`/root/reference/README.md:117`) never got.
    * At 100 TB the dims stay broadcast-sized; only lineitem shuffles (into
    * the final small aggregation). */
  def q03RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val na = Tables.nation(s, dir)
    val re = Tables.region(s, dir)
    li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        revenueSum.as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q03Oracle: String =
    s"""SELECT r_name, n_name,
      |  $revenueSumSql AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Fact-fact equi join (orders ⋈ customer) + groupBy: at scale this is a
    * shuffle join on o_custkey/c_custkey (customer is NOT broadcast — it
    * grows with sf), AQE handles skew. */
  def q04SegmentOrderStats(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        moneySum(col("o_totalprice")).as("total_price"),
        (moneySum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      .orderBy(col("c_mktsegment"))
  }

  val q04Oracle: String =
    s"""SELECT c_mktsegment,
      |  count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  ${moneySumSql("o_totalprice")} AS total_price,
      |  ${moneySumSql("o_totalprice")} / count(*) AS avg_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Anti join (NOT EXISTS): customers with no orders, counted per nation.
    * SURVEY §2.3 semi/anti row. */
  def q05CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_custkey"))
    val na = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers_no_orders"))
      .orderBy(col("n_name"))
  }

  val q05Oracle: String =
    """SELECT n_name, count(*) AS n_customers_no_orders
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q6 shape: tight filter + ungrouped sum — the whole query folds
    * into one scan with pushed predicates (check `.explain`: PushedFilters on
    * l_shipdate; only 4 columns read). */
  def q06RevenueFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
        col("l_quantity") < lit(25.0))
      .agg(
        Exact.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  val q06Oracle: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,10))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 25.0""".stripMargin

  /** Ranking top-3 orders per market segment (SURVEY §2.5). Same semantics
    * as `row_number().over(partitionBy(segment))` + `rk <= 3`, but
    * c_mktsegment has 5 distinct values, so that window funnels the fact
    * table through 5 sort tasks at any scale. Instead a
    * [[graft.functions.TopKPairsAggregator]] groupBy caps every partial
    * buffer at 3 rows (the shuffle carries ≤ |segments|·3·|map tasks| rows)
    * and posexplode recovers the rank from the aggregator's (price desc,
    * key asc) output order — identical tie-break, no giant sort. */
  def q07Top3PerSegment(s: SparkSession, dir: String): DataFrame = {
    val top3 = udaf(new graft.functions.TopKPairsAggregator(3),
      org.apache.spark.sql.Encoders.product[graft.functions.ScoredKey])
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(top3(col("o_orderkey"), Exact.cents(col("o_totalprice"))).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "sk")))
      .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rk"),
        col("sk.key").as("o_orderkey"),
        (col("sk.score").cast("double") / 100.0).as("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  val q07Oracle: String =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rk <= 3
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** Analytic window: monthly revenue + running cumulative total (SURVEY
    * §2.5 running-totals row). The monthly aggregate shrinks the data before
    * the window, so the unbounded-preceding frame runs over ~tens of rows
    * even at 100 TB. */
  def q08MonthlyRunningRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val monthly = o.groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("revenue_cents"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("month")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .select(
        col("month"),
        (col("revenue_cents").cast("double") / lit(100.0)).as("revenue"),
        col("n_orders"),
        (sum(col("revenue_cents")).over(w).cast("double") / lit(100.0)).as("running_revenue"))
      .orderBy(col("month"))
  }

  val q08Oracle: String =
    """WITH monthly AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT month,
      |  CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue,
      |  n_orders,
      |  CAST(sum(revenue_cents) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_revenue
      |FROM monthly ORDER BY month""".stripMargin

  /** Exact + approximate distinct (SURVEY §2.4 A7): exact countDistinct per
    * group. (approx_count_distinct is deliberately NOT oracle-checked — HLL
    * implementations differ across engines; it gets a spec instead.) */
  def q09DistinctCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), yearL(col("o_orderdate")).as("order_year"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"), col("order_year"))

  val q09Oracle: String =
    """SELECT o_orderstatus, year(o_orderdate) AS order_year,
      |  count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ROLLUP (SURVEY §2.4 A8): subtotals + grand total over (year, priority);
    * grouping() columns disambiguate NULL-key rows from real NULLs. */
  def q10RollupOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("order_year", yearL(col("o_orderdate")))
      .rollup(col("order_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"),
        grouping(col("o_orderpriority")).cast("long").as("is_year_total"),
        grouping(col("order_year")).cast("long").as("is_grand_total"))
      .orderBy(col("is_grand_total"), col("order_year").asc_nulls_first,
        col("is_year_total"), col("o_orderpriority").asc_nulls_first)

  val q10Oracle: String =
    s"""SELECT year(o_orderdate) AS order_year, o_orderpriority,
      |  count(*) AS n_orders,
      |  ${moneySumSql("o_totalprice")} AS total_price,
      |  GROUPING(o_orderpriority) AS is_year_total,
      |  GROUPING(year(o_orderdate)) AS is_grand_total
      |FROM orders
      |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
      |ORDER BY is_grand_total, order_year ASC NULLS FIRST, is_year_total, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Set operations (SURVEY §2.9): customers active in 1996 vs 1997 —
    * INTERSECT / EXCEPT / UNION, one labeled count per op. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    // Each cohort feeds three of the four set ops — persist so the orders
    // scan + distinct runs once per year, not per op (released by the
    // harness's post-query Caches.releaseAll).
    def custIn(y: Int): DataFrame = graft.Caches.persist(
      o.filter(yearL(col("o_orderdate")) === y).select(col("o_custkey")).distinct())
    val a = custIn(1996)
    val b = custIn(1997)
    val rows = Seq(
      ("both_years", a.intersect(b)),
      ("only_1996", a.except(b)),
      ("only_1997", b.except(a)),
      ("either_year", a.union(b).distinct()))
    rows.map { case (label, df) =>
      df.agg(count(lit(1)).as("n_customers")).select(lit(label).as("cohort"), col("n_customers"))
    }.reduce(_.unionByName(_)).orderBy(col("cohort"))
  }

  val q11Oracle: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      |SELECT * FROM (
      |  SELECT 'both_years' AS cohort, count(*) AS n_customers FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |  UNION ALL
      |  SELECT 'only_1996', count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |  UNION ALL
      |  SELECT 'only_1997', count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
      |  UNION ALL
      |  SELECT 'either_year', count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
      |ORDER BY cohort""".stripMargin

  /** Semi join (EXISTS): parts that ship in large quantities, with per-brand
    * counts. left_semi keeps the probe side only — no row multiplication. */
  def q12SemiJoinParts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= lit(45.0))
      .select(col("l_partkey"))
    p.join(big, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  val q12Oracle: String =
    """SELECT p_brand, count(*) AS n_parts
      |FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 45.0)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** The reference mart, re-expressed over testdata with its NULL quirk
    * intact (SURVEY §2.6; `fct_spacex_launches_by_year.sql:4-10`):
    * `success := nullif(o_orderstatus,'P') = 'F'` is three-valued (NULL for
    * status 'P'), `CASE WHEN success THEN 1 ELSE 0` sends NULL to the else
    * branch in BOTH conditional sums, so completed + other = n_orders and
    * NULL inflates the rate denominator — exactly the reference's documented
    * behavior (`/root/reference/README.md:140`). Rate is a raw IEEE division
    * (no rounding) for bit-exact oracle parity. */
  def q13StatusRateByYear(s: SparkSession, dir: String): DataFrame = {
    val succ = nullif(col("o_orderstatus"), lit("P")) === lit("F")
    Tables.orders(s, dir)
      .groupBy(yearL(col("o_orderdate")).as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(succ, 1L).otherwise(0L)).as("completed"),
        sum(when(succ, 0L).otherwise(1L)).as("other"))
      .withColumn("completed_rate_pct",
        lit(100.0) * col("completed") / nullif(col("n_orders"), lit(0L)))
      .orderBy(col("order_year"))
  }

  val q13Oracle: String =
    """SELECT order_year, n_orders, completed, other,
      |  100.0 * completed / nullif(n_orders, 0) AS completed_rate_pct
      |FROM (
      |  SELECT year(o_orderdate) AS order_year,
      |    count(*) AS n_orders,
      |    CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS completed,
      |    CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS other
      |  FROM orders GROUP BY 1) t
      |ORDER BY order_year""".stripMargin

  /** Multi-way join depth: lineitem→orders→customer→nation→region with a
    * selective order-date filter. Customer/orders shuffle; nation/region
    * broadcast. TPC-H Q5 shape (local-supplier condition dropped — supplier
    * nation join covered by q03). */
  def q14OrderRevenueByRegion(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter(yearL(col("o_orderdate")) === 1997)
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val na = Tables.nation(s, dir)
    val re = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        revenueSum.as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  val q14Oracle: String =
    s"""SELECT r_name,
      |  $revenueSumSql AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE year(o_orderdate) = 1997
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Approximate aggregates (SURVEY §2.4 A7 approx row), re-expressed over
    * the engine's OWN deterministic sketches so the DuckDB oracle can
    * hash-check them (VERDICT r4 item 1): distinct customers per status via
    * the integer-exact HLL ([[Sketches]] — the same registers as q127), and
    * the approximate median price via a fixed-width $1000 bucket histogram
    * (mid-bucket estimate at the ceil(n/2) rank). Spark's
    * `approx_count_distinct`/`percentile_approx` answer the same questions
    * interactively but their sketch internals are engine-specific and
    * unhashable across engines; these sketches merge identically
    * (register max / histogram sum are associative) and reproduce
    * bit-for-bit anywhere. n_zero_registers (q127) is the small-range
    * signal: raw HLL is the large-range regime; OperatorsSpec bounds its
    * error only there. Scale shape: two partial+final aggregations over
    * the fact table (registers, histogram) + one over the distinct frame;
    * the median window runs on the REDUCED per-bucket histogram. */
  def q18ApproxStats(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Caches.persist(Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_custkey"), col("o_totalprice")))
    val base = o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("exact_customers"))
    val hll = Sketches.hllEstimate(
        Sketches.hllRegisters(o, col("o_orderstatus"), col("o_custkey")))
      .select(col("g").as("o_orderstatus"), col("hll_estimate").as("hll_customers"))
    val hist = o
      .select(col("o_orderstatus"), floor(col("o_totalprice") / 1000).cast("long").as("bucket"))
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("o_orderstatus")).orderBy(col("bucket"))))
    val med = cum
      .join(base.select(col("o_orderstatus"), col("n_orders")), Seq("o_orderstatus"))
      .filter(col("cum") * 2 >= col("n_orders")) // first bucket at rank ceil(n/2)
      .groupBy(col("o_orderstatus"))
      .agg(min(col("bucket")).as("mb"))
      .select(col("o_orderstatus"), (col("mb") * 1000 + 500).as("approx_median_price"))
    base.join(hll, Seq("o_orderstatus")).join(med, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_orders"), col("exact_customers"),
        col("hll_customers"),
        (col("hll_customers") - col("exact_customers")).as("hll_err"),
        col("approx_median_price"))
      .orderBy(col("o_orderstatus"))
  }

  val q18Oracle: String = {
    import Sketches.{AlphaM2, Buckets, ValueBits}
    val scale = 1L << (ValueBits + 1)
    s"""WITH o AS (SELECT o_orderstatus, o_custkey, o_totalprice FROM orders),
      |base AS (
      |  SELECT o_orderstatus, count(*) AS n_orders,
      |         count(DISTINCT o_custkey) AS exact_customers
      |  FROM o GROUP BY 1),
      |h AS (
      |  SELECT o_orderstatus,
      |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 2) AS BIGINT) bucket,
      |    CASE WHEN CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 3, 10) AS BIGINT) = 0
      |         THEN ${ValueBits + 1}
      |         ELSE ${ValueBits + 1} - length(bin(
      |           CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 3, 10) AS BIGINT)))
      |    END rho
      |  FROM o),
      |regs AS (SELECT o_orderstatus, bucket, max(rho) m FROM h GROUP BY 1, 2),
      |terms AS (
      |  SELECT o_orderstatus,
      |    CAST(sum(1::BIGINT << (${ValueBits + 1} - m)) AS BIGINT) s, count(*) nb
      |  FROM regs GROUP BY 1),
      |est AS (
      |  SELECT o_orderstatus,
      |    CAST(${AlphaM2 * scale} // (s + ($Buckets - nb) * $scale) AS BIGINT) hll_customers
      |  FROM terms),
      |b AS (
      |  SELECT o_orderstatus, CAST(floor(o_totalprice / 1000) AS BIGINT) bucket, count(*) cnt
      |  FROM o GROUP BY 1, 2),
      |c AS (
      |  SELECT o_orderstatus, bucket,
      |         sum(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bucket) cum
      |  FROM b),
      |med AS (
      |  SELECT c.o_orderstatus, CAST(min(bucket) * 1000 + 500 AS BIGINT) approx_median_price
      |  FROM c JOIN base USING (o_orderstatus)
      |  WHERE cum * 2 >= n_orders GROUP BY 1)
      |SELECT base.o_orderstatus, n_orders,
      |       CAST(exact_customers AS BIGINT) AS exact_customers,
      |       hll_customers,
      |       CAST(hll_customers - exact_customers AS BIGINT) AS hll_err,
      |       approx_median_price
      |FROM base JOIN est USING (o_orderstatus) JOIN med USING (o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin
  }

  /** Full outer join (SURVEY §2.3 — the remaining join kind): each year's
    * top-20 customers by order count, stitched FULL OUTER on custkey so
    * customers prominent in only one year keep a NULL side. */
  def q19FullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    def top20(yr: Int): DataFrame =
      Tables.orders(s, dir)
        .filter(yearL(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("o_custkey").asc)
        .limit(20)
    val a = top20(1996).select(col("o_custkey").as("custkey"), col("n").as("n_1996"))
    val b = top20(1997).select(col("o_custkey").as("custkey"), col("n").as("n_1997"))
    a.join(b, Seq("custkey"), "full_outer")
      .orderBy(col("custkey"))
  }

  val q19Oracle: String =
    """WITH a AS (
      |  SELECT o_custkey AS custkey, count(*) AS n_1996 FROM orders
      |  WHERE year(o_orderdate) = 1996 GROUP BY 1
      |  ORDER BY n_1996 DESC, custkey ASC LIMIT 20),
      |b AS (
      |  SELECT o_custkey AS custkey, count(*) AS n_1997 FROM orders
      |  WHERE year(o_orderdate) = 1997 GROUP BY 1
      |  ORDER BY n_1997 DESC, custkey ASC LIMIT 20)
      |SELECT coalesce(a.custkey, b.custkey) AS custkey, n_1996, n_1997
      |FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      |ORDER BY custkey""".stripMargin

  /** Dispersion statistics (SURVEY §2.4 A9: min/max/avg/stddev) with exact
    * arithmetic: built-in `stddev` sums doubles (order-dependent, breaks
    * hash parity), so the sample variance comes from exact integer/decimal
    * moments — S1 = Σcents (int64), S2 = Σcents² (decimal — 600k rows of
    * 2.5e15 squares overflow int64) — then one deterministic double
    * conversion at the end: sqrt((n·S2 − S1²)/(n(n−1)))/100. */
  def q28Dispersion(s: SparkSession, dir: String): DataFrame = {
    val xq = Exact.cents(col("o_totalprice"))
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        (min(xq).cast("double") / 100.0).as("min_price"),
        (max(xq).cast("double") / 100.0).as("max_price"),
        sum(xq).as("s1"),
        sum((xq * xq).cast("decimal(38,0)")).as("s2"))
      .select(
        col("o_orderstatus"),
        col("n"),
        col("min_price"),
        col("max_price"),
        (col("s1").cast("double") / 100.0 / col("n")).as("avg_price"),
        (sqrt((col("n") * col("s2") - col("s1").cast("decimal(38,0)") * col("s1")).cast("double")
          / (col("n") * (col("n") - 1))) / 100.0).as("stddev_price"))
      .orderBy(col("o_orderstatus"))
  }

  val q28Oracle: String =
    """SELECT o_orderstatus, n, min_price, max_price,
      |  CAST(s1 AS DOUBLE) / 100.0 / n AS avg_price,
      |  sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE) / (n * (n - 1))) / 100.0 AS stddev_price
      |FROM (
      |  SELECT o_orderstatus, count(*) AS n,
      |    CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS min_price,
      |    CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS max_price,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s1,
      |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) * CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS s2
      |  FROM orders GROUP BY o_orderstatus) t
      |ORDER BY o_orderstatus""".stripMargin

  /** Pivot (SURVEY §2.4 A3 generalized — the mart's conditional sums are a
    * 2-value pivot): order counts by year × status, explicit value list so
    * the output schema is static and deterministic. */
  def q26PivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(yearL(col("o_orderdate")).as("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("order_year"))

  val q26Oracle: String =
    """SELECT year(o_orderdate) AS order_year,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin

  /** Correlated scalar subquery through the SQL entry point (SURVEY §3.3 /
    * §4 decorrelation row): parts priced above their brand's average.
    * Catalyst's RewriteCorrelatedScalarSubquery turns the correlation into
    * an aggregate + join — check `.explain`: no per-row subquery execution. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def q27CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    // unique view name per invocation — fixed names race on shared sessions
    val pv = s"graft_part_v${viewSeq.incrementAndGet()}"
    Tables.part(s, dir).createOrReplaceTempView(pv)
    // spark.sql() resolves the view at analysis time, so it can be dropped
    // as soon as the DataFrame exists (ADVICE r2: long-lived sessions were
    // accumulating catalog entries without bound).
    try s.sql(
      s"""SELECT p_brand, count(*) AS n_above_brand_avg,
        |  CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_above_price
        |FROM $pv p
        |WHERE CAST(round(p_retailprice * 100) AS BIGINT) >
        |      (SELECT CAST(sum(CAST(round(i.p_retailprice * 100) AS BIGINT)) AS DOUBLE) / count(*)
        |       FROM $pv i WHERE i.p_brand = p.p_brand)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
    finally s.catalog.dropTempView(pv)
  }

  val q27Oracle: String =
    """SELECT p_brand, count(*) AS n_above_brand_avg,
      |  CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_above_price
      |FROM part p
      |WHERE CAST(round(p_retailprice * 100) AS BIGINT) >
      |      (SELECT CAST(sum(CAST(round(i.p_retailprice * 100) AS BIGINT)) AS DOUBLE) / count(*)
      |       FROM part i WHERE i.p_brand = p.p_brand)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q220: SQL pipe-operator syntax (SPARK-49555, Spark 4's `|>` surface)
    * pinned end-to-end on a multi-stage flow: leading FROM, pre-join WHERE
    * (pushes below the join exactly as in nested SQL — pipe order is
    * logical, Catalyst still reorders), JOIN, post-join WHERE, EXTEND
    * (derived column), AGGREGATE … GROUP BY with aliased grouping
    * expression, post-aggregation WHERE (the HAVING equivalent), ORDER BY.
    * The oracle is the same query in classic nested SQL on DuckDB, so the
    * pin is "pipe stages compose to standard semantics", not pipe-vs-pipe.
    * Exact integer cents×percent revenue (graft.Exact discipline). The
    * physical plan is identical to the DataFrame formulation — pipe syntax
    * is pure parser surface, which is exactly what this query documents. */
  def q220PipeSyntax(s: SparkSession, dir: String): DataFrame = {
    val lv = s"graft_li_v${viewSeq.incrementAndGet()}"
    val ov = s"graft_ord_v${viewSeq.incrementAndGet()}"
    Tables.lineitem(s, dir).createOrReplaceTempView(lv)
    Tables.orders(s, dir).createOrReplaceTempView(ov)
    try s.sql(
      s"""FROM $lv
        ||> WHERE l_shipdate >= DATE '1996-01-01'
        ||> JOIN $ov ON l_orderkey = o_orderkey
        ||> WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        ||> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c100
        ||> AGGREGATE CAST(sum(rev_c100) AS BIGINT) AS revenue_c100,
        |     count(*) AS n_items
        |   GROUP BY o_orderpriority, CAST(year(l_shipdate) AS BIGINT) AS ship_year
        ||> WHERE n_items >= 5
        ||> ORDER BY o_orderpriority, ship_year""".stripMargin)
    finally {
      s.catalog.dropTempView(lv)
      s.catalog.dropTempView(ov)
    }
  }

  val q220Oracle: String =
    """SELECT o_orderpriority, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS revenue_c100,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= DATE '1996-01-01'
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY 1, 2
      |HAVING count(*) >= 5
      |ORDER BY o_orderpriority, ship_year""".stripMargin

  /** q225: SQL-defined UDFs (SPARK-51086 surface: `CREATE TEMPORARY
    * FUNCTION … RETURNS … RETURN <expr>`) — the declarative cousin of the
    * Scala UDF row in §2.11, pinned working plus its load-bearing plan
    * property: the analyzer's ResolveSQLFunctions INLINES the body into
    * the plan, so a SQL UDF costs nothing at execution (same codegen'd
    * expressions as writing them inline — the spec asserts equality with
    * the DataFrame formulation). A scalar money UDF (the graft.Exact cents
    * discipline packaged as a reusable function) and a banding UDF feed an
    * aggregate; `GROUP BY ALL` (the Spark 4 grouping-inference surface)
    * picks up both non-aggregate columns. Functions and views are
    * per-invocation named and dropped — session-scoped objects race on the
    * shared-session concurrency harness otherwise (the q27 lesson). */
  def q225SqlUdf(s: SparkSession, dir: String): DataFrame = {
    val n = viewSeq.incrementAndGet()
    val fRev = s"graft_rev_$n"
    val fBand = s"graft_band_$n"
    val lv = s"graft_li225_$n"
    Tables.lineitem(s, dir).createOrReplaceTempView(lv)
    s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fRev(price DOUBLE, disc DOUBLE)
      |RETURNS BIGINT
      |RETURN CAST(round(price * 100) AS BIGINT)
      |  * (100 - CAST(round(disc * 100) AS BIGINT))""".stripMargin)
    s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fBand(q DOUBLE)
      |RETURNS STRING
      |RETURN CASE WHEN q < 10 THEN 'small'
      |            WHEN q < 30 THEN 'mid'
      |            ELSE 'bulk' END""".stripMargin)
    try s.sql(
      s"""SELECT l_returnflag, $fBand(l_quantity) AS band,
        |  CAST(sum($fRev(l_extendedprice, l_discount)) AS BIGINT) AS revenue_c100,
        |  count(*) AS n_items
        |FROM $lv
        |GROUP BY ALL
        |ORDER BY l_returnflag, band""".stripMargin)
    finally {
      s.catalog.dropTempView(lv)
      s.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $fRev")
      s.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $fBand")
    }
  }

  val q225Oracle: String =
    """SELECT l_returnflag,
      |  CASE WHEN l_quantity < 10 THEN 'small'
      |       WHEN l_quantity < 30 THEN 'mid'
      |       ELSE 'bulk' END AS band,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS revenue_c100,
      |  count(*) AS n_items
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY l_returnflag, band""".stripMargin

  /** Scalar string-function surface (SURVEY §2.8 F10 — ABSENT in reference):
    * upper/substr/length/regexp_replace/concat_ws over `part`, row-level. */
  def q15StringFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_tag"))
      .orderBy(col("p_partkey"))

  val q15Oracle: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  substr(p_name, 1, 8) AS name_prefix,
      |  length(p_name) AS name_len,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
      |  concat_ws('#', p_brand, p_type) AS brand_tag
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Regex capture groups + the remaining scalar string surface (SURVEY
    * §2.8 F10, completing q15): regexp_extract with group index, lpad,
    * translate, repeat, reverse, left/right, split_part — all codegen'd
    * row-level functions with exact DuckDB counterparts (initcap is absent
    * in DuckDB, so it stays out of the oracle-checked set). */
  def q96StringFunctions2(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        translate(col("p_brand"), "#", "-").as("brand_dashed"),
        repeat(substring(col("p_name"), 1, 2), 3).as("prefix_x3"),
        reverse(col("p_brand")).as("brand_rev"),
        substring(col("p_type"), 1, 4).as("type_left4"),
        expr("right(p_type, 3)").as("type_right3"),
        expr("split_part(p_type, ' ', 1)").as("type_first_word"))
      .orderBy(col("p_partkey"))

  val q96Oracle: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  translate(p_brand, '#', '-') AS brand_dashed,
      |  repeat(substr(p_name, 1, 2), 3) AS prefix_x3,
      |  reverse(p_brand) AS brand_rev,
      |  left(p_type, 4) AS type_left4,
      |  right(p_type, 3) AS type_right3,
      |  split_part(p_type, ' ', 1) AS type_first_word
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Equi + range join (SURVEY §2.3 theta/range row): lineitems shipped
    * within 30 days of their order's date. The equi key keeps it a hash/sort
    * join; the range predicate filters post-match — no nested-loop blowup. */
  def q16RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_items"))
      .orderBy(col("o_orderpriority"))
  }

  val q16Oracle: String =
    """SELECT o_orderpriority, count(*) AS n_fast_items
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** As-of lookup (SURVEY §2.3 as-of row): for each event, the most recent
    * strictly-prior 'signup' by the same user — `last(..., ignoreNulls)` over
    * an unbounded-to-(-1) frame composes the as-of join from builtins (no
    * custom operator needed when the lookup is within one keyed stream);
    * aggregated per event_type. Time is integer ms (see ops.Events). */
  def q17AsofSignup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ts_ms"))
      .withColumn("prior_signup_ms",
        last(when(col("event_type") === "signup", col("ts_ms")), ignoreNulls = true).over(w))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("prior_signup_ms").isNotNull, 1L).otherwise(0L)).as("n_with_prior_signup"),
        sum(when(col("ts_ms") - col("prior_signup_ms") <= 86400000L, 1L).otherwise(0L)).as("n_within_24h"))
      .orderBy(col("event_type"))
  }

  val q17Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |marked AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type = 'signup' THEN ts_ms END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup_ms
      |  FROM ev)
      |SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CASE WHEN prior_signup_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_prior_signup,
      |  CAST(sum(CASE WHEN ts_ms - prior_signup_ms <= 86400000 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_24h
      |FROM marked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CUBE (SURVEY §2.4 A8, completing rollup): all grouping-set combinations
    * of (status, priority) with grouping flags for disambiguation. */
  def q54CubeOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_priority"))
      .orderBy(col("g_status"), col("g_priority"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val q54Oracle: String =
    s"""SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  ${moneySumSql("o_totalprice")} AS total_price,
      |  GROUPING(o_orderstatus) AS g_status,
      |  GROUPING(o_orderpriority) AS g_priority
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority,
      |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Ranking/analytic window variants (SURVEY §2.5): rank, dense_rank,
    * ntile, lag, lead over a totally-ordered per-year frame, emitting the
    * top-5 per year. The order key is unique (price, orderkey) so every
    * function is deterministic.
    *
    * Scale shape (VERDICT r2 item 1): `order_year` has ~7 distinct values,
    * so a window partitioned by it alone funnels the whole fact table
    * through 7 sort tasks. Instead a [[graft.functions.TopKPairsAggregator]]
    * groupBy pre-filters to the top-6 rows per year (map-side combine caps
    * each partial buffer at 6, the shuffle carries ≤ |years|·6 rows), the
    * ranking/lag/lead windows then run over that ≤6-per-year frame, and
    * ntile(4) — which needs the FULL partition row count, not just the head —
    * is reconstructed arithmetically from the per-year count using the
    * standard tile-size rule (first n%4 tiles get ⌈n/4⌉ rows). Top-6, not
    * top-5, so rank 5's lead() still sees its successor. */
  def q55RankVariants(s: SparkSession, dir: String): DataFrame = {
    val top6 = udaf(new graft.functions.TopKPairsAggregator(6),
      org.apache.spark.sql.Encoders.product[graft.functions.ScoredKey])
    val perYear = Tables.orders(s, dir)
      .groupBy(yearL(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n"),
        top6(col("o_orderkey"), Exact.cents(col("o_totalprice"))).as("top"))
    // ≤ 6 rows per year from here on — window cost is |years|·6 rows total.
    val head = perYear
      .select(col("order_year"), col("n"), explode(col("top")).as("sk"))
      .select(col("order_year"), col("n"),
        col("sk.key").as("o_orderkey"), col("sk.score").as("cents"))
    val w = Window.partitionBy(col("order_year"))
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    // ntile(4) over n rows: first n%4 tiles take ⌈n/4⌉ = base+1 rows each.
    val base = expr("n div 4")
    val rem = col("n") % 4
    val boundary = rem * (base + 1)
    val quartile = when(col("rk") <= boundary,
        ceil(col("rk").cast("double") / (base + 1).cast("double")))
      .otherwise(rem + ceil((col("rk") - boundary).cast("double") /
        greatest(base, lit(1L)).cast("double")))
    val price = (col("cents").cast("double") / 100.0)
    head
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("drk", dense_rank().over(w).cast("long"))
      .withColumn("prev_price", (lag(col("cents"), 1).over(w).cast("double") / 100.0))
      .withColumn("next_price", (lead(col("cents"), 1).over(w).cast("double") / 100.0))
      .filter(col("rk") <= 5)
      .select(col("order_year"), col("rk"), col("drk"), quartile.cast("long").as("quartile"),
        col("o_orderkey"), price.as("o_totalprice"), col("prev_price"), col("next_price"))
      .orderBy(col("order_year"), col("rk"))
  }

  val q55Oracle: String =
    """SELECT order_year, rk, drk, quartile, o_orderkey, o_totalprice, prev_price, next_price
      |FROM (
      |  SELECT year(o_orderdate) AS order_year, o_orderkey, o_totalprice,
      |    rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk,
      |    ntile(4) OVER w AS quartile,
      |    lag(o_totalprice, 1) OVER w AS prev_price,
      |    lead(o_totalprice, 1) OVER w AS next_price
      |  FROM orders
      |  WINDOW w AS (PARTITION BY year(o_orderdate) ORDER BY o_totalprice DESC, o_orderkey ASC)) t
      |WHERE rk <= 5
      |ORDER BY order_year, rk""".stripMargin

  /** Right outer join (SURVEY §2.3 — the remaining explicit join kind):
    * order counts per nation keep every nation row even with no 1996-Q1
    * orders on the left. */
  def q56RightJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val na = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(na, col("c_nationkey") === col("n_nationkey"), "right_outer")
      .groupBy(col("n_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("n_name"))
  }

  val q56Oracle: String =
    """SELECT n_name, count(o_orderkey) AS n_orders
      |FROM (SELECT * FROM orders
      |      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00') o
      |JOIN customer ON o_custkey = c_custkey
      |RIGHT OUTER JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Date/interval arithmetic (SURVEY §2.8 date functions): day diffs,
    * day adds, and calendar field extraction — all integer outputs. */
  def q57DateArithmetic(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_delay_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")).cast("long"))
      .groupBy(
        yearL(col("o_orderdate")).as("order_year"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"))
      .agg(
        count(lit(1)).as("n_items"),
        min(col("ship_delay_days")).as("min_delay"),
        max(col("ship_delay_days")).as("max_delay"),
        sum(col("ship_delay_days")).as("total_delay_days"),
        sum(when(col("l_shipdate").cast("date") > date_add(col("o_orderdate").cast("date"), 60), 1L)
          .otherwise(0L)).as("n_late"))
      .orderBy(col("order_year"), col("order_quarter"))
  }

  val q57Oracle: String =
    """SELECT year(o_orderdate) AS order_year, quarter(o_orderdate) AS order_quarter,
      |  count(*) AS n_items,
      |  min(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS min_delay,
      |  max(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_delay,
      |  CAST(sum(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS total_delay_days,
      |  CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q243: string COLLATION (Spark 4 surface, SPARK-46830): grouping and
    * equality under `UTF8_LCASE` — the engine-level answer to
    * "deduplicate keys case-insensitively" that pipelines otherwise
    * hand-roll with lower() (which breaks for locale-special casing and
    * loses the original spelling). A mixed-case segment column (upper for
    * even custkeys, lower for odd — deterministic synthetic casing) groups
    * under the case-insensitive collation back to 5 segments; the
    * REPRESENTATIVE spelling ships as min() under binary collation
    * (deterministic: uppercase sorts first), never the collated group key
    * itself (whichever variant the engine happens to surface is
    * tie-order-dependent — the one subtle contract this query documents).
    * A collated equality also feeds a conditional count. Oracle: the
    * lower()-normalized formulation — pinning that collation grouping ≡
    * normalize-then-group for this casing. */
  def q243CollationGroups(s: SparkSession, dir: String): DataFrame = {
    val mixed = Tables.customer(s, dir).select(
      when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment"))).as("seg_raw"))
    mixed
      .groupBy(expr("collate(seg_raw, 'UTF8_LCASE')").as("seg_key"))
      .agg(min(col("seg_raw")).as("seg_rep"),
        count(lit(1)).as("n"),
        sum(when(expr("collate(seg_raw, 'UTF8_LCASE') = 'automobile'"), 1L)
          .otherwise(0L)).as("n_eq_automobile"))
      .select(col("seg_rep"), col("n"), col("n_eq_automobile"))
      .orderBy(col("seg_rep"))
  }

  val q243Oracle: String =
    """WITH mixed AS (
      |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
      |              ELSE lower(c_mktsegment) END AS seg_raw
      |  FROM customer)
      |SELECT min(seg_raw) AS seg_rep, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN lower(seg_raw) = 'automobile' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_eq_automobile
      |FROM mixed
      |GROUP BY lower(seg_raw)
      |ORDER BY seg_rep""".stripMargin

  /** q244: ordered-set aggregates (Spark 4 surfaces): `percentile_disc`
    * WITHIN GROUP (SQL:2003 inverse-distribution — returns an ACTUAL data
    * value, the house exactness stance, vs percentile_cont's interpolated
    * float) and `listagg` WITHIN GROUP (SPARK-42746 — ordered string
    * aggregation, the ISO form of q72's concat_ws(collect_list)). Median
    * and p90 quantity per return flag, plus the flag's line statuses as an
    * ordered comma list (pre-reduced to distinct statuses first — listagg
    * input is the bounded status set, not raw lines). The oracle spells
    * percentile_disc by its DEFINITION (smallest value whose cume_dist ≥ p
    * = the value at rank ceil(p·n)) rather than trusting DuckDB's
    * quantile_disc to share edge conventions — the pin is against the
    * standard, not another engine's shortcut. */
  def q244OrderedSetAggs(s: SparkSession, dir: String): DataFrame = {
    val n = viewSeq.incrementAndGet()
    val lv = s"graft_li244_$n"
    Tables.lineitem(s, dir).createOrReplaceTempView(lv)
    try s.sql(
      s"""WITH st AS (
        |  SELECT DISTINCT l_returnflag, l_linestatus FROM $lv),
        |lists AS (
        |  SELECT l_returnflag,
        |    listagg(l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)
        |      AS statuses
        |  FROM st GROUP BY l_returnflag),
        |qs AS (
        |  SELECT l_returnflag,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
        |      AS BIGINT) AS median_qty,
        |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)
        |      AS BIGINT) AS p90_qty
        |  FROM $lv GROUP BY l_returnflag)
        |SELECT qs.l_returnflag, median_qty, p90_qty, statuses
        |FROM qs JOIN lists ON qs.l_returnflag = lists.l_returnflag
        |ORDER BY qs.l_returnflag""".stripMargin)
    finally s.catalog.dropTempView(lv)
  }

  val q244Oracle: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |qs AS (
      |  SELECT l_returnflag,
      |    max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN q END) AS median_qty,
      |    max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN q END) AS p90_qty
      |  FROM ranked GROUP BY 1),
      |st AS (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem),
      |lists AS (
      |  SELECT l_returnflag,
      |    string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses
      |  FROM st GROUP BY 1)
      |SELECT qs.l_returnflag, median_qty, p90_qty, statuses
      |FROM qs JOIN lists ON qs.l_returnflag = lists.l_returnflag
      |ORDER BY qs.l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q243_collation_groups" -> (q243CollationGroups _),
    "q244_ordered_set_aggs" -> (q244OrderedSetAggs _),
    "q01_pricing_summary"      -> (q01PricingSummary _),
    "q02_topk_orders"          -> (q02TopkOrders _),
    "q03_revenue_by_nation"    -> (q03RevenueByNation _),
    "q04_segment_order_stats"  -> (q04SegmentOrderStats _),
    "q05_customers_no_orders"  -> (q05CustomersWithoutOrders _),
    "q06_revenue_filter"       -> (q06RevenueFilter _),
    "q07_top3_per_segment"     -> (q07Top3PerSegment _),
    "q08_monthly_running_rev"  -> (q08MonthlyRunningRevenue _),
    "q09_distinct_customers"   -> (q09DistinctCustomers _),
    "q10_rollup_orders"        -> (q10RollupOrders _),
    "q11_set_ops"              -> (q11SetOps _),
    "q12_semi_join_parts"      -> (q12SemiJoinParts _),
    "q13_status_rate_by_year"  -> (q13StatusRateByYear _),
    "q14_order_revenue_by_region" -> (q14OrderRevenueByRegion _),
    "q15_string_functions"     -> (q15StringFunctions _),
    "q96_string_functions2"    -> (q96StringFunctions2 _),
    "q220_pipe_syntax"         -> (q220PipeSyntax _),
    "q225_sql_udf"             -> (q225SqlUdf _),
    "q16_range_join"           -> (q16RangeJoin _),
    "q17_asof_signup"          -> (q17AsofSignup _),
    "q18_approx_stats"         -> (q18ApproxStats _),
    "q19_full_outer_join"      -> (q19FullOuterJoin _),
    "q28_dispersion"           -> (q28Dispersion _),
    "q26_pivot_status"         -> (q26PivotStatus _),
    "q27_correlated_subquery"  -> (q27CorrelatedSubquery _),
    "q54_cube_orders"          -> (q54CubeOrders _),
    "q55_rank_variants"        -> (q55RankVariants _),
    "q56_right_join"           -> (q56RightJoin _),
    "q57_date_arithmetic"      -> (q57DateArithmetic _),
  )

  val oracles: Map[String, String] = Map(
    "q243_collation_groups"    -> q243Oracle,
    "q244_ordered_set_aggs"    -> q244Oracle,
    "q01_pricing_summary"      -> q01Oracle,
    "q02_topk_orders"          -> q02Oracle,
    "q03_revenue_by_nation"    -> q03Oracle,
    "q04_segment_order_stats"  -> q04Oracle,
    "q05_customers_no_orders"  -> q05Oracle,
    "q06_revenue_filter"       -> q06Oracle,
    "q07_top3_per_segment"     -> q07Oracle,
    "q08_monthly_running_rev"  -> q08Oracle,
    "q09_distinct_customers"   -> q09Oracle,
    "q10_rollup_orders"        -> q10Oracle,
    "q11_set_ops"              -> q11Oracle,
    "q12_semi_join_parts"      -> q12Oracle,
    "q13_status_rate_by_year"  -> q13Oracle,
    "q14_order_revenue_by_region" -> q14Oracle,
    "q15_string_functions"     -> q15Oracle,
    "q96_string_functions2"    -> q96Oracle,
    "q220_pipe_syntax"         -> q220Oracle,
    "q225_sql_udf"             -> q225Oracle,
    "q16_range_join"           -> q16Oracle,
    "q17_asof_signup"          -> q17Oracle,
    "q18_approx_stats"         -> q18Oracle,
    "q19_full_outer_join"      -> q19Oracle,
    "q28_dispersion"           -> q28Oracle,
    "q26_pivot_status"         -> q26Oracle,
    "q27_correlated_subquery"  -> q27Oracle,
    "q54_cube_orders"          -> q54Oracle,
    "q55_rank_variants"        -> q55Oracle,
    "q56_right_join"           -> q56Oracle,
    "q57_date_arithmetic"      -> q57Oracle,
  )
}
