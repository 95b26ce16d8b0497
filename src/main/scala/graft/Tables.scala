package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Schemas are listed in
  * FIXTURES.md §2. All query entry points take `(SparkSession, sfDir)` so the
  * same code runs at any scale factor — nothing here assumes a row count.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see Sessions.tune); the raw long is converted here to a µs-precision
    * TimestampType via integer division (ns epochs exceed 2^53 — a double
    * division would silently lose precision). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** `ts` → µs TimestampType (no-op if already a timestamp).
    * Applies to both batch and streaming reads of the events table.
    *
    * Handles both testdata generations the driver has shipped:
    *   - TIMESTAMP(NANOS) read as a raw long (nanosAsLong=true) → integer
    *     DIV 1000 then timestamp_micros;
    *   - TIMESTAMP(MICROS) with isAdjustedToUTC=false, read as
    *     TIMESTAMP_NTZ → cast to TIMESTAMP. The session timezone is pinned
    *     to UTC (Sessions.tune), so the cast reinterprets the wall-clock
    *     value as the identical UTC instant — value-preserving, and
    *     required because `withWatermark`/`unix_micros` reject NTZ. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  /** events plus an integer-microseconds `ts_us` column — the canonical
    * cross-engine representation of the ns-precision `ts`. 9,992/10,000
    * sf0.01 events carry sub-µs nanos Spark cannot represent, so any
    * ordering or gap arithmetic hashed against a DuckDB oracle must run on
    * this integer (DuckDB ≥1.1 keeps ns and would order/floor differently
    * through the timestamp type). */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", org.apache.spark.sql.functions.expr("ts DIV 1000"))
          .withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.col("ts_us")))
      case _ =>
        // TIMESTAMP and TIMESTAMP_NTZ both land here; unix_micros rejects
        // NTZ, so route through normalizeEventTs (UTC cast — same µs ints).
        normalizeEventTs(raw).withColumn("ts_us",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")))
    }
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` entry points work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
