package graft

import org.apache.spark.sql.SparkSession

/** Shared session configuration for all entry points (Verify, Bench,
  * tests). Keeps the engine-level knobs in ONE place so the driver, the
  * test suites, and ad-hoc runs agree. */
object Sessions {

  /** Apply graft's standard config to a builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    // events.ts is parquet TIMESTAMP(NANOS) — read as long, converted in
    // Tables.events (Spark has no nanosecond timestamp type).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // At local[32] over sf0.1 the default 128 MB split gives too few input
    // partitions to keep 32 cores busy; smaller splits balance the scans.
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.ui.enabled", "false")

  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
