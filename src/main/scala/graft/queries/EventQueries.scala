package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExprUtils

/** Event-table analytics (SURVEY §2.7 ST3 testdata extension): event-time
  * windows, sessionization, and JSON-props extraction over `events`.
  *
  * NOTE on timestamps: `events.ts` is ns-precision in parquet; Spark
  * truncates to µs while other engines may keep ns — every hashed output
  * therefore emits ts only through `date_trunc`/`date_format` at
  * second-or-coarser granularity, and sums of monetary values use
  * integer cents (never float sums, whose value is addition-order-
  * dependent) so cross-engine comparisons are bit-exact.
  */
object EventQueries {

  /** Tumbling 1-hour event-time aggregate — the batch shape of the
    * Structured Streaming windowed agg (same plan modulo the watermark). */
  def hourlyAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        ExprUtils.sumMoney(col("value")).as("total_value"))

  /** Sessionization: a session breaks after a 30-minute inactivity gap.
    * Classic two-window formulation (lag → gap flag → running sum) — the
    * per-user shuffle is keyed on user_id, so 100 TB of events sessionize
    * with one shuffle and no driver state.
    *
    * ns-proof canonicalization (round-2): ordering, the gap arithmetic,
    * and `session_start_us` all run on integer microseconds (ts DIV 1000
    * on the raw ns; `epoch_ns(ts) // 1000` in the oracle) — identical
    * whether the oracle engine reads the parquet ns column as TIMESTAMP_NS
    * or truncates to µs. All outputs are BIGINT. */
  def sessions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val gapFlag = when(
      col("ts_us") - lag(col("ts_us"), 1).over(byUser) > 1800L * 1000000L,
      1L).otherwise(0L)
    Tables.eventsUs(s, d)
      .withColumn("new_session", gapFlag)
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(ExprUtils.cents(col("value"))).as("session_value_cents"))
  }

  /** JSON-path extraction from the props column (the reference's JSON
    * envelope S2, queried instead of just transported). */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** As-of join over the event stream: each click annotated with the
    * user's most recent prior (ts ≤ click's) purchase amount. Purchases
    * are pre-aggregated per (user, ts) so ties are deterministic; the
    * operator is the union+window composition (graft.operators.AsofJoin —
    * one shuffle on user_id, no range explosion). Oracle: DuckDB's native
    * ASOF LEFT JOIN. */
  def asofPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsUs(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(ExprUtils.cents(col("value"))).as("purchase_cents"))
    graft.operators.AsofJoin
      .asofJoin(clicks, purchases, "user_id", "ts_us", "purchase_cents")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_purchase_cents"))
  }

  /** Range join over the event stream: every error event opens a ±5-minute
    * incident window; count the events landing inside each window. Runs as
    * the bucketed equi-join (graft.operators.RangeJoin, 1-hour buckets) —
    * a hash join plus residual filter, never the nested-loop plan Spark
    * gives a raw BETWEEN join. Oracle: the plain BETWEEN join in DuckDB. */
  def rangeJoinIncidents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsUs(s, d)
    val points = ev.select(col("ts_us"), col("event_id"))
    val windows = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"),
        (col("ts_us") - 300000000L).as("ws"),
        (col("ts_us") + 300000000L).as("we"))
    graft.operators.RangeJoin
      .intervalJoin(points, "ts_us", windows, "ws", "we",
        bucketWidth = 3600L * 1000000L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Per-type value distribution: count, exact sum, min/max — the KPI
    * card shape over a stream table. */
  def typeStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        ExprUtils.sumMoney(col("value")).as("total_value"),
        min(ExprUtils.cents(col("value"))).as("min_cents"),
        max(ExprUtils.cents(col("value"))).as("max_cents"))

  /** Per-type EXACT distinct-user count (audience KPI). Catalyst plans
    * grouped COUNT(DISTINCT x) as the two-shuffle expand/partial shape —
    * exact at any scale, but the distinct keys all pass through the
    * shuffle. The 100 TB alternative when ±2 % error is fine is
    * `approx_count_distinct` (HyperLogLog++, one mergeable sketch per
    * group, single shuffle) — SketchSpec pins its error against this
    * exact query. */
  def distinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Per-type rank-based percentiles (p50/p90/p99 of integer cents):
    * the value at rank ceil(q·n) in cents order — percentile_disc
    * semantics, chosen over interpolating `percentile`/quantile_cont
    * because rank selection on integers is bit-exact across engines
    * while interpolation arithmetic (a·(1-f)+b·f vs a+f·(b-a)) can
    * differ in the last ulp and flip a hashed compare. Ranks use pure
    * integer arithmetic: ceil(q·n) = (q_num·n + q_den - 1) div q_den.
    *
    * Plan shape — HISTOGRAM, not per-row sort: a naive row_number window
    * sorts every row of a type inside one partition, which with
    * low-cardinality group keys (5 types here) is the skew-bound plan
    * that collapses at 100 TB. Instead the rows two-phase-aggregate to a
    * (type, cents) → count histogram — map-side combine shrinks the
    * shuffle to the DISTINCT VALUE DOMAIN, not the row count — and the
    * cumulative window + rank lookup then run over histogram rows
    * (bounded by the cents domain, independent of corpus size). Value at
    * rank r = MIN cents whose cumulative count ≥ r.
    *
    * CONTRACT — bounded value domain: the histogram plan wins only while
    * the per-group DISTINCT-value count stays small relative to the row
    * count (integer cents: ≤ ~10^6 distinct values regardless of corpus
    * size, so the shuffle and the window stay tiny). Pointed at a
    * high-cardinality column (raw floats, micro-timestamps), the
    * "histogram" degenerates to ~one row per input row — the per-group
    * window then re-creates exactly the skew-bound sort this plan exists
    * to avoid. For that regime use [[quantilesApprox]] (mergeable GK
    * sketch, no per-group window at all); SketchSpec pins its rank error
    * against this exact query and demonstrates the high-cardinality
    * crossover. */
  def quantiles(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val whole = Window.partitionBy(col("event_type"))
    Tables.events(s, d)
      .select(col("event_type"), ExprUtils.cents(col("value")).as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(byType))
      .withColumn("n", sum(col("c")).over(whole))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("cents"))).as("p50_cents"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("cents"))).as("p90_cents"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("cents"))).as("p99_cents"))
  }

  /** The UNBOUNDED-domain twin of [[quantiles]]: `approx_percentile`
    * (Greenwald-Khanna, rank error ≤ n/accuracy) — one mergeable sketch
    * per group, single shuffle of sketch-sized rows, NO per-group window
    * — so its cost is independent of the value domain's cardinality.
    * Same output shape as the exact query (per-type p50/p90/p99 cents);
    * values are approximate, hence no DuckDB oracle — SketchSpec bounds
    * them against the exact ranks instead. */
  def quantilesApprox(s: SparkSession, d: String,
                      accuracy: Int = 10000): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), ExprUtils.cents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("ps"))
      .select(col("event_type"), col("n"),
        col("ps").getItem(0).as("p50_cents"),
        col("ps").getItem(1).as("p90_cents"),
        col("ps").getItem(2).as("p99_cents"))

  /** Ordered conversion funnel: how many users reached step i of
    * `steps` IN ORDER (each step's first qualifying event strictly after
    * the previous step's, and — when `horizonUs` > 0 — within that many
    * microseconds of the previous step). Returns one row per step:
    * {{{ (step, users) }}} with users monotonically non-increasing.
    *
    * Plan shape: one shuffle. Step timestamps chain as per-user window
    * minima over the SAME partitioning (user_id, no ordering — unbounded
    * min needs no sort), so Catalyst plans one Exchange followed by k
    * chained Window operators; the per-user collapse then reuses that
    * partitioning (groupBy user_id), and the final step-count aggregate
    * is k rows. No per-user sort, no driver state — 100 TB of events
    * funnel with a single keyed shuffle.
    *
    * All comparisons run on integer microseconds (`ts_us`) — the
    * cross-engine-safe representation (see [[graft.Tables.eventsUs]]). */
  def funnel(s: SparkSession, d: String,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             horizonUs: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = Window.partitionBy(col("user_id"))
    val withTs = steps.zipWithIndex.foldLeft(Tables.eventsUs(s, d)) {
      case (df, (step, i)) =>
        val hit =
          if (i == 0) col("event_type") === step
          else {
            val afterPrev = col("event_type") === step &&
              col(s"t${i - 1}").isNotNull &&
              col("ts_us") > col(s"t${i - 1}")
            if (horizonUs > 0L)
              afterPrev && col("ts_us") <= col(s"t${i - 1}") + horizonUs
            else afterPrev
          }
        df.withColumn(s"t$i", min(when(hit, col("ts_us"))).over(byUser))
    }
    val tAggs = steps.indices.map(i => max(col(s"t$i")).as(s"t$i"))
    val perUser = withTs.groupBy(col("user_id"))
      .agg(tAggs.head, tAggs.tail: _*)
    val cAggs = steps.indices.map(i =>
      count(when(col(s"t$i").isNotNull, lit(1))).as(s"c$i"))
    val counts = perUser.agg(cAggs.head, cAggs.tail: _*)
    // k step-count columns → k (step, users) rows; `stack` keeps it one
    // projection over the single aggregate row.
    val stackArgs = steps.zipWithIndex
      .map { case (step, i) => s"'${i + 1}_$step', c$i" }
      .mkString(", ")
    counts.select(expr(
      s"stack(${steps.length}, $stackArgs) AS (step, users)"))
  }

  /** Weekly retention cohorts: users bucketed by the ISO week (Monday
    * start) of their FIRST event; for every (cohort_week, week_offset),
    * the number of cohort users active in that later week. The classic
    * retention triangle — offset 0 is the cohort size.
    *
    * Week arithmetic is pure integer math on `ts_us` (µs → epoch day →
    * Monday-aligned week index `(day - 4) div 7`; epoch day 4 =
    * Monday 1970-01-05), so both engines bucket identically — no reliance
    * on engine-specific `date_trunc('week')` edge behavior, and immune to
    * the ns-vs-µs parquet precision split.
    *
    * Plan shape — two shuffles, both small: (1) groupBy user_id with
    * map-side-combined `min(week)` + `collect_set(week)` — the set is
    * bounded by CALENDAR weeks (52/user/year), not event count, so the
    * shuffle carries ~distinct (user, week) pairs, a tiny fraction of
    * 100 TB of raw events; (2) the cohort × offset aggregate over
    * exploded per-user week sets — at most |users| × |weeks| rows in,
    * |weeks|² rows out. A window-based formulation would shuffle FULL
    * event rows; this one never moves more than the distinct pairs. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val week = expr("(ts_us div 86400000000 - 4) div 7")
    Tables.eventsUs(s, d)
      .select(col("user_id"), week.as("week"))
      .groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_w"),
        collect_set(col("week")).as("weeks"))
      .select(col("cohort_w"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_w"), (col("week") - col("cohort_w")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, week) unique post-collect_set
      .select(
        date_add(to_date(lit("1970-01-05")), (col("cohort_w") * 7).cast("int"))
          .cast("string").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Sliding-window activity: 10-minute windows every 5 minutes (each
    * event lands in exactly two overlapping windows) — the OVERLAPPING
    * variant of [[hourlyAgg]]'s tumbling window, same shape Structured
    * Streaming uses for sliding event-time aggs. Spark's `window()`
    * aligns starts to the epoch, so the oracle reconstructs membership
    * as floor-to-5-minutes plus its 5-minute-shifted twin. */
  def slidingActivity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(ExprUtils.cents(col("value"))).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("value_cents"))
}
