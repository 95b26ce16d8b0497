package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-minimizing join strategies — the "plans at 100×"
  * toolkit the relational surface falls back on when a key distribution or
  * a repeated big-big join would bottleneck a 1000-executor run.
  *
  * Three tools, in preference order:
  *  1. AQE skew-join (free, runtime): Sessions.tune keeps
  *     `spark.sql.adaptive.enabled=true`; AQE splits oversized post-shuffle
  *     partitions of a sort-merge join automatically. ScaleJoinSpec asserts
  *     the split actually happens on a skewed fixture (`skew=true` in the
  *     final adaptive plan) — with TEST-SCALE thresholds (64 KB partitions)
  *     so a ~MB fixture registers as skew; the PRODUCTION knob set
  *     (256 MB skew threshold, 64 MB advisory partitions, 3×cores shuffle
  *     partitions) is `Sessions.tuneForCluster`, asserted by the same
  *     spec — deployments call that, never the test values.
  *  2. Salted join (explicit, deterministic): when one probe-side key is so
  *     hot a SINGLE key exceeds an executor (AQE cannot split one key's
  *     sort-merge group), spread it over `salts` sub-keys and replicate the
  *     build side. Costs build×salts rows — use for medium build sides that
  *     are too big to broadcast but far smaller than the probe.
  *  3. Bucketed co-located join (storage-level): pay ONE shuffle at write
  *     time (`bucketBy` on the join key), then every subsequent join on
  *     that key is exchange-free — the repeated-join amortization the
  *     reference's SORTKEY tables aim at (ddl/create_tables.sql).
  */
object ScaleJoins {

  /** Inner equi-join with probe-side salting.
    *
    * The probe side's hot keys are spread across `salts` sub-keys by a
    * per-row hash (value irrelevant to correctness — every salt of a key
    * joins the same build rows); the build side is replicated `salts`
    * times via a literal-range explode. Result rows/columns are identical
    * to `probe.join(build, key)` — only the partitioning of the shuffle
    * changes: each (key, salt) group is ≤ 1/salts of the hot key.
    *
    * The salt derives from xxhash64 of the probe's OTHER columns (stable
    * under task retry, unlike rand()/monotonic ids), falling back to the
    * key itself for single-column rows. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts=$salts must be positive")
    val saltSrc: Seq[Column] = {
      val others = probe.columns.filterNot(_ == key).map(col).toSeq
      if (others.nonEmpty) others else Seq(col(key))
    }
    val probeS = probe.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(salts.toLong)))
    val buildS = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    probeS.join(buildS, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed parquet table: the one-time
    * shuffle that makes every later equi-join / aggregation on `key`
    * exchange-free (and sort-free) for any reader using the same bucket
    * count. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table) // managed table under the session warehouse

  /** Join two same-bucketed tables on their bucket key — plans as a
    * sort-merge join with ZERO exchanges when bucket counts match
    * (PlanSpec asserts). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
