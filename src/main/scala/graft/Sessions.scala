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
    // Write timestamps as TIMESTAMP(MICROS), not the legacy INT96 pair:
    // INT96 carries no usable min/max statistics (readers ignore them by
    // spec), so neither row-group pruning nor ZoneMap time zones can
    // work on INT96 columns — and every other engine reads MICROS.
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // At local[32] over sf0.1 the default 128 MB split gives too few input
    // partitions to keep 32 cores busy; smaller splits balance the scans.
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.ui.enabled", "false")

  /** Production-cluster AQE/skew tuning, applied to a LIVE session (all
    * runtime-settable SQL confs — usable on a session someone else built).
    *
    * The test suites override these knobs DOWN to toy thresholds so skew
    * handling is observable on kilobyte fixtures (ScaleJoinSpec); these
    * are the values a real 1000-executor run wants, with the reasoning
    * recorded so they are tuned, not cargo-culted:
    *
    *  - skew split at 5× the median partition AND ≥ 256 MB: the Spark
    *    defaults — a partition below 256 MB sorts fine in a multi-GB
    *    executor, and below 5× median the imbalance is noise.
    *  - advisory partition size 64 MB: post-shuffle coalesce target;
    *    small enough to keep thousands of cores busy, large enough that
    *    per-task overhead (~100 ms) stays < 5% of task time.
    *  - broadcast threshold 64 MB: cluster executors (4–8 GB/core) hold a
    *    64 MB dim table comfortably; star-schema joins then never shuffle
    *    the fact side (the local[] default of 10 MB undersells this).
    *  - `totalCores` > 0 sets shuffle.partitions to 3× cores: enough
    *    granularity for AQE to coalesce DOWN (it cannot split an
    *    under-partitioned stage except via skew-split).
    */
  def tuneForCluster(s: SparkSession, totalCores: Int = 0): SparkSession = {
    val c = s.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
    c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    c.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    if (totalCores > 0)
      c.set("spark.sql.shuffle.partitions", (totalCores * 3).toString)
    s
  }

  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s) // the graft_* SQL surface
    s
  }
}
