package graft

import org.apache.spark.sql.functions._

import graft.queries.EventQueries

/** Sketch aggregates — the 100 TB substitutes for the exact KPI queries,
  * pinned against those queries' answers (SURVEY §7.3: try
  * `approx_count_distinct` and friends before customs).
  *
  *  - approx_count_distinct (HyperLogLog++) replaces the two-shuffle
  *    grouped COUNT(DISTINCT) when ±2 % is acceptable: one mergeable
  *    sketch per group, single shuffle, no distinct-key explosion.
  *  - approx_percentile (Greenwald-Khanna) replaces the skew-bound
  *    per-group sort of the exact rank quantile: mergeable summaries,
  *    error bounded in RANK (not value) by the accuracy parameter.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct tracks the exact per-type distinct users") {
    val exact = EventQueries.distinctUsers(spark, sfDir)
      .select(col("event_type"), col("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val a = approx(t)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"type $t: approx $a vs exact $e drifts past 5%")
    }
  }

  test("approx_percentile lands within rank tolerance of the exact p50/p90") {
    // Exact rank-quantiles from the oracle-checked query.
    val exact = EventQueries.quantiles(spark, sfDir)
      .select(col("event_type"), col("n"), col("p50_cents"), col("p90_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Tables.events(spark, sfDir)
      .select(col("event_type"),
        graft.functions.ExprUtils.cents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("cents"),
        array(lit(0.5), lit(0.9)), lit(1000)).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // GK guarantees rank error ≤ n/accuracy; translate to a value check by
    // verifying the approx value sits between the exact values at ranks
    // ceil(q·n) ∓ 2·n/accuracy (cents are dense enough that the rank band
    // maps to a tight value band; an exact-rank equality would over-claim).
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"),
        graft.functions.ExprUtils.cents(col("value")).as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, a) => t -> a.map(_._2).sorted }
    for ((t, (n, p50, p90)) <- exact; (q, approxV) <- Seq(0.5 -> approx(t)(0), 0.9 -> approx(t)(1))) {
      val arr = cents(t)
      val slack = math.max(2L, 2L * n / 1000L).toInt
      val r = math.ceil(q * n).toInt
      val lo = arr(math.max(0, r - 1 - slack))
      val hi = arr(math.min(arr.length - 1, r - 1 + slack))
      assert(approxV >= lo && approxV <= hi,
        s"type $t q=$q: approx $approxV outside exact rank band [$lo, $hi] (exact p50=$p50 p90=$p90)")
    }
  }

  test("quantilesApprox at accuracy ≥ n reproduces the exact rank quantiles") {
    // GK's rank error is ≤ n/accuracy; with accuracy above the row count
    // the sketch is lossless, so the twin must agree with the exact
    // histogram query value-for-value — pinning that both compute the
    // same percentile_disc semantics before the approximate regime opens
    // any gap.
    val exact = EventQueries.quantiles(spark, sfDir)
      .select(col("event_type"), col("n"), col("p50_cents"),
        col("p90_cents"), col("p99_cents"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = EventQueries.quantilesApprox(spark, sfDir, accuracy = 2000000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(approx == exact, "lossless-accuracy sketch diverged from exact")
  }

  test("high-cardinality domain: the exact histogram degenerates; the GK sketch holds its rank bound") {
    import spark.implicits._
    // The regime EventQueries.quantiles' contract EXCLUDES: ~every value
    // distinct (7919 is coprime to the prime 999983, so 100k ids map to
    // 100k distinct residues).
    val n = 100000
    val df = spark.range(n).select(lit("g").as("event_type"),
      (col("id") * 7919L % 999983L).as("cents"))
    val nDistinct = df.select(col("cents")).distinct().count()
    assert(nDistinct == n, "fixture must be all-distinct")
    // The histogram "compression" is 1:1 here — the exact plan's grouped
    // histogram carries one row per input row into the per-group window,
    // which is the degenerate sort the scaladoc warns about...
    val hist = df.groupBy(col("event_type"), col("cents")).count()
    assert(hist.count() == nDistinct)
    // ...while the sketch path needs no window at all and keeps its
    // rank guarantee: approx value within the exact values at ranks
    // ceil(q·n) ∓ 2n/accuracy.
    val acc = 1000
    val ps = df.groupBy(col("event_type"))
      .agg(percentile_approx(col("cents"),
        array(lit(0.5), lit(0.9)), lit(acc)).as("ps"))
      .collect()(0).getSeq[Long](1)
    val sorted = df.select(col("cents")).as[Long].collect().sorted
    val slack = 2 * n / acc
    for ((q, v) <- Seq(0.5 -> ps(0), 0.9 -> ps(1))) {
      val r = math.ceil(q * n).toInt
      val lo = sorted(math.max(0, r - 1 - slack))
      val hi = sorted(math.min(n - 1, r - 1 + slack))
      assert(v >= lo && v <= hi,
        s"q=$q: approx $v outside exact rank band [$lo, $hi]")
    }
  }

  test("sliding windows cover each event exactly twice") {
    val n = Tables.events(spark, sfDir).count()
    val windowed = EventQueries.slidingActivity(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(windowed == 2 * n, s"sliding windows counted $windowed of ${2 * n}")
  }
}
