package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact-decimal money arithmetic — shared single formulation (rationale at
  * graft.functions.ExprUtils.cents). Local alias keeps call sites short. */
private object Exact {
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ExprUtils.cents(c)
  def sumMoney(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ExprUtils.sumMoney(c)
}

/** Testdata analogs of the reference's relational operator inventory
  * (SURVEY.md §2). Each method is one `SparkEntry.queries` entry with a
  * DuckDB oracle in `SparkEntry.oracleSql`.
  *
  * Determinism contract: every query's RESULT SET is deterministic (no bare
  * LIMIT without a total order; float aggregates rounded) so the driver's
  * sort-and-hash compare is stable across engines.
  *
  * Scale notes are inline — these shapes are written for a 1000-executor
  * cluster even though they are verified at sf0.01:
  *  - filters/projections sit directly on the parquet scan (pushdown + column
  *    pruning; verified via `.explain` — see PlanSpec),
  *  - small dimensions (region/nation/customer at dim-scale) are broadcast,
  *  - aggregations rely on Catalyst's partial/final two-phase HashAggregate,
  *  - top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  *    (no global sort materialization).
  */
object RelationalQueries {

  // ---- P: projections / filters / predicates (SURVEY §2.2) -----------------

  /** P1 analog: full projection + single equality filter.
    * Ref: `SELECT * FROM t WHERE is_display = TRUE` (lambda_function.py:31). */
  def p1Filter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderstatus") === "F")

  /** P2 analog: narrow projection + range predicate (pruned scan).
    * Ref: `SELECT description FROM t WHERE s_no = 90 LIMIT 150`
    * (ddl_create_tables.sql:34-36). Range instead of LIMIT keeps the result
    * set deterministic. */
  def p2Project(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 100)
      .select("o_orderkey", "o_totalprice")

  /** P4 analog: integer point lookup (ref: WHERE s_no = k,
    * lambda_function.py:652-658). Parquet row-group stats prune this scan. */
  def p4PointLookup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") === 7)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** P5 analog: conjunctive predicate (lambda_function.py:690-694). */
  def p5Conjunction(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")

  /** P6 analog: case-insensitive substring match
    * (ddl_create_tables.sql:69-70 `upper(team_name) LIKE '%GCSS%'`). */
  def p6Like(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(upper(col("c_mktsegment")).like("%BUILD%"))
      .select("c_custkey", "c_name", "c_mktsegment")

  /** P7 analog: EXISTS guard as a left-semi join
    * (lambda_function.py:172-178). At scale the build side (filtered
    * customer) is broadcast — no shuffle of the big orders side. */
  def p7SemiJoin(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.orders(s, d)
      .join(broadcast(probe), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  // ---- J: joins (SURVEY §2.5) ----------------------------------------------

  /** J1 analog: NOT EXISTS / dedup anti-join (README.md:56 duplicate-load
    * avoidance). Broadcast the small side. */
  def j1AntiJoin(s: SparkSession, d: String): DataFrame = {
    val negative = Tables.customer(s, d)
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey"))
    Tables.orders(s, d)
      .join(broadcast(negative), col("o_custkey") === col("c_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey")
  }

  /** Inner equi-join chain over the dimension hierarchy: customer ⋈ nation ⋈
    * region, aggregated per region. nation/region are tiny at every scale →
    * broadcast; the only shuffle is the final 5-group aggregate. */
  def j2InnerJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        Exact.sumMoney(col("c_acctbal")).as("total_acctbal"))

  /** J3: the salted skew join on the fact table — value-identical to the
    * plain lineitem ⋈ orders join (the DuckDB oracle computes exactly
    * that), while the probe-side shuffle keys on (okey, salt) so a hot
    * order key spreads over 8 sub-partitions. The oracle check is the
    * proof that salting never changes results. */
  def j3SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    graft.operators.ScaleJoins.saltedJoin(li, ord, "okey", salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Exact.sumMoney(col("l_extendedprice")).as("total_price"))
  }

  // ---- A: aggregations (SURVEY §2.4) ---------------------------------------

  /** A1: ungrouped multi-aggregate (`SELECT MIN(s_no), MAX(s_no), COUNT(*)`,
    * ddl_create_tables.sql:64). Partial aggregation makes this a single
    * all-to-one shuffle of 32 partial rows regardless of input size. */
  def a1MinMaxCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      min(col("l_orderkey")).as("min_ok"),
      max(col("l_orderkey")).as("max_ok"),
      count(lit(1)).as("cnt"))

  /** A2+A3: COALESCE over scalar MAX on an empty selection — the
    * empty-table-safe key generator (lambda_function.py:270). */
  def a3CoalesceMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 0)
      .agg(coalesce(max(col("o_orderkey")), lit(0L)).as("mx"))

  /** A5: GROUP BY single key + COUNT (dashboard pie charts). */
  def a5GroupCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))

  /** A6: GROUP BY two keys + COUNT (dashboard grouped bar). */
  def a6GroupCount2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))

  /** A6 pivot form: "Count of Records by Team_name and Active_inactive"
    * as a pivot table (explicit value list → no extra distinct-values
    * job; nulls filled with 0 to match SQL FILTER semantics). */
  def a6Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P")).count()
      .na.fill(0L)

  /** A7: SUM KPI per group (README.md:88-89 "Tool usage by team"). */
  def a7GroupSum(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("total_price"))

  /** A8 (extension beyond the reference's flat GROUP BYs): ROLLUP over
    * (priority, status) — the dashboard drill-down hierarchy (detail →
    * per-priority subtotal → grand total) in ONE pass. grouping_id
    * disambiguates a rolled-up NULL from a data NULL (both engines emit
    * the same bitmask). Plan: Spark expands the grouping sets and runs
    * the same two-phase hash aggregate as a flat GROUP BY — subtotals
    * cost one Expand over the scan, not one extra scan per level. */
  def a8Rollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        Exact.sumMoney(col("o_totalprice")).as("total_price"))

  // ---- O: sort / limit / top-k (SURVEY §2.5) -------------------------------

  /** O1+O2+O3: ORDER BY … LIMIT k → TakeOrderedAndProject (per-partition
    * top-k + driver merge; never a global sort). Tie-broken on the unique
    * key so the result set is deterministic across engines. */
  def o3TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  // ---- M analogs (read-shaped; real mutation semantics live in
  //      graft.store/graft.operators and their specs) ------------------------

  /** M1: next-key generation `COALESCE(MAX(key),0)+1`
    * (lambda_function.py:269-271). */
  def m1NextKey(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .agg((coalesce(max(col("c_custkey")), lit(0L)) + 1L).as("next_key"))

  /** M3: UPDATE … SET col = v WHERE key = k, expressed relationally
    * (lambda_function.py:424-428). */
  def m3UpdateProjection(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      col("c_name"),
      when(col("c_custkey") === 1, lit(0.0))
        .otherwise(col("c_acctbal")).as("c_acctbal"))

  /** M5: hard DELETE WHERE key = k (ddl_create_tables.sql:61-62). */
  def m5Delete(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(!(col("c_custkey") === 5))
      .select("c_custkey", "c_name")

  /** M8: duplicate-load avoidance via DISTINCT (README.md:56). */
  def m8Distinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_custkey", "o_orderstatus").distinct()

  // ---- W / U / F extras ----------------------------------------------------

  /** W1: row_number() window — the IDENTITY(1,1) analog (SURVEY §2.3 M1).
    * Deterministic: ordering tie-broken by the unique key. */
  def w1RowNumber(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 50)
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"))
  }

  /** P3: string-equality predicate (`WHERE tool_name = '…'`,
    * ddl_create_tables.sql:31-32). */
  def p3StringEq(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_name") === "Customer#000000042")
      .select("c_custkey", "c_name", "c_acctbal")

  /** S6 analog: keyset pagination — deterministic page of a sorted scan
    * (the Data-API NextToken loop, lambda_function.py:64-91, as a
    * relational op: WHERE key > cursor ORDER BY key LIMIT page). */
  def s6Page(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") > 500)
      .orderBy(col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_orderstatus")

  /** W2: running total per partition — frame-bounded window aggregation
    * (beyond the reference; standard warehouse surface). */
  def w2RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_custkey"),
        (sum(Exact.cents(col("o_totalprice"))).over(w)
          .cast("double") / 100.0).as("running_total"))
  }

  /** W3: top-k per group via rank window — the grouped flavor of O3. */
  def w3TopKPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
  }

  /** `spark.sql` entry path: the same engine surface through SQL text over
    * registered views (SURVEY §1.3 — both DataFrame and SQL entry points). */
  def sqlJoinAgg(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql("""
      SELECT n_name,
             count(*) AS n_customers,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name""")
  }

  /** U1: UNION ALL (the append path S4 as a set op). */
  def u1Union(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val hi = o.filter(col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), lit("HI").as("bucket"))
    val lo = o.filter(col("o_totalprice") < 10000.0)
      .select(col("o_orderkey"), lit("LO").as("bucket"))
    hi.unionByName(lo)
  }

  /** F7: date handling — truncate timestamp→date + group (README.md:56 date
    * check; report_date DATE ingest). Emitted as a yyyy-MM-dd string so the
    * cross-engine hash compares text, not engine-specific date encodings. */
  def f7DateGroup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(count(lit(1)).as("n"))

  /** Flagship: TPC-H Q1-shaped pricing summary over lineitem — the densest
    * exercise of partial+final aggregation and codegen arithmetic.
    *
    * Hash-robust canonicalization (round-2): every output column is a
    * BIGINT or string. Round 1 emitted the sums/averages as doubles and
    * the driver's hash check failed even though a DuckDB 1.0.0 re-run was
    * bit-identical — double compute/formatting is oracle-version-dependent,
    * integers are not. Sums are exact integer cents (see Exact); averages
    * are integer micro-units via integer division (`DIV` here, `//` in the
    * DuckDB oracle — both truncate toward zero for positive inputs). */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(Exact.cents(col("l_extendedprice"))).as("sum_base_cents"),
        // extendedprice cents × (100 - discount%) = exact 1e-4 units
        sum(Exact.cents(col("l_extendedprice")) *
          (lit(100L) - Exact.cents(col("l_discount")))).as("sum_disc_e4"),
        sum(Exact.cents(col("l_discount"))).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_e6", expr("sum_qty * 1000000 DIV count_order"))
      .withColumn("avg_disc_e6", expr("sum_disc_cents * 10000 DIV count_order"))
      // Explicit final order matching the oracle SQL: the driver's compare
      // happens to be column-order-insensitive, but don't rely on it.
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
        "sum_disc_e4", "avg_qty_e6", "avg_disc_e6", "count_order")

  /** TPC-H Q3-shaped join+agg: revenue per (order, date, priority) for one
    * segment. customer side is filtered then broadcast; lineitem never
    * shuffles twice. Result returns all qualifying groups (no float-ordered
    * LIMIT → deterministic set). */
  def q3Revenue(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .groupBy(col("o_orderkey"), col("order_date"), col("o_orderpriority"))
      .agg((sum(Exact.cents(col("l_extendedprice")) *
        (lit(100L) - Exact.cents(col("l_discount")))).cast("double") / 10000.0)
        .as("revenue"))
  }
}
