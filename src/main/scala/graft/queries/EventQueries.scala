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
  * truncates to µs while DuckDB keeps ns — every hashed output therefore
  * emits ts only through `date_trunc`/`date_format` at second-or-coarser
  * granularity (see .claude/skills/verify/SKILL.md).
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
}
