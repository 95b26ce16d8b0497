package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.store.ObservedStats

/** Pins for the CollectMetrics helpers the r18/r19 observation fusions
  * ride on — specifically the r19 `structSet` (the MaxScore probe's
  * per-term champion stats riding the θ̂ scoring action): the observed
  * set must equal the eager per-key aggregate, per-key-constant columns
  * must dedup to one struct per key, and the collapsed-plan/timeout
  * regime must return None so callers run their eager fallback instead
  * of trusting a missing metric. */
class ObservedStatsSpec extends SparkSpec {

  test("structSet: one struct per key, equal to the eager aggregate") {
    import spark.implicits._
    // stats columns constant per key — the champion-row shape
    val rows = Seq(
      ("apple", 3L, 7L, 2), ("apple", 3L, 7L, 2), ("apple", 3L, 7L, 2),
      ("pear", 1L, 4L, 9), ("pear", 1L, 4L, 9),
      ("plum", 5L, 5L, 1))
      .toDF("term", "df", "max_tf", "min_dl")
    val obs = Observation()
    val observed = rows.observe(obs,
      collect_set(struct(col("term"), col("df"), col("max_tf"),
        col("min_dl"))).as("ts"))
    // a downstream action that is NOT a trivial count — the observation
    // must resolve off whatever action the caller happens to run
    observed.groupBy(col("term")).count().collect()
    val got = ObservedStats.structSet(obs)
      .getOrElse(fail("observation did not resolve"))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    val eager = rows.groupBy(col("term"))
      .agg(first(col("df")).as("df"), first(col("max_tf")).as("max_tf"),
        first(col("min_dl")).as("min_dl"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(got === eager.toSeq)
  }

  test("structSet: unresolved observation returns None (fallback regime)") {
    import spark.implicits._
    val rows = Seq(("apple", 1L)).toDF("term", "df")
    val obs = Observation()
    rows.observe(obs, collect_set(struct(col("term"), col("df"))).as("ts"))
    // no action ever runs over the observed frame -> the 2 s await times
    // out and the caller must get None, never a silent empty stats set
    assert(ObservedStats.structSet(obs).isEmpty)
  }
}
