package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.operators.ScaleJoins

/** Skew + co-location: the explicit salted join is value-identical to the
  * plain join while splitting hot keys; AQE splits skewed sort-merge
  * partitions at runtime; bucketed tables join with zero exchanges. */
class ScaleJoinSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  /** 50k-row probe with 80% of rows on key 1; 100-key build side. */
  private def skewed: (DataFrame, DataFrame) = {
    import spark.implicits._
    val probe = spark.range(50000)
      .select((when(col("id") % 5 =!= 0, lit(1L)).otherwise(col("id") % 100))
        .as("k"), (col("id") * 3).as("payload"))
    val build = spark.range(100).select(col("id").as("k"),
      concat(lit("name_"), col("id")).as("name"))
    (probe, build)
  }

  test("salted join returns exactly the plain join's rows") {
    val (probe, build) = skewed
    val plain = probe.join(build, Seq("k"))
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s")).collect()(0)
    val salted = ScaleJoins.saltedJoin(probe, build, "k", salts = 8)
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s")).collect()(0)
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getLong(1) === plain.getLong(1))
    // the join's shuffle must be keyed on (k, salt), not k alone
    val df = ScaleJoins.saltedJoin(probe, build, "k", salts = 8)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("__salt"),
      "salt column missing from the join plan")
  }

  test("AQE splits a skewed sort-merge partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // sf-test thresholds: one hot partition of ~MBs must register as skew
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val (probe, build) = skewed
      // build side enlarged so both sides sort-merge (no broadcast path)
      val bigBuild = build.crossJoin(spark.range(50).select(col("id").as("r")))
        .select(col("k"), concat(col("name"), lit("_"), col("r")).as("name"))
      // global agg (no partitioning requirement downstream of the join —
      // a keyed groupBy would make AQE veto the split as an extra shuffle)
      val joined = probe.join(bigBuild, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val s = finalPlan(joined)
      assert(s.contains("SortMergeJoin"), s"expected sort-merge join:\n$s")
      assert(s.contains("skew=true"),
        s"AQE did not mark the skewed join split:\n$s")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("tuneForCluster sets the production AQE/skew knobs on a live session") {
    // A derived session shares the SparkContext but owns its SQL conf —
    // the helper must not need a builder (production hands you a session).
    val s2 = spark.newSession()
    Sessions.tuneForCluster(s2, totalCores = 1000)
    val c = s2.conf
    assert(c.get("spark.sql.adaptive.enabled") === "true")
    assert(c.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(c.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor") === "5.0")
    assert(c.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes") === "256m")
    assert(c.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") === "64m")
    assert(c.get("spark.sql.autoBroadcastJoinThreshold") === "64m")
    assert(c.get("spark.sql.shuffle.partitions") === "3000")
    // the parent session's conf is untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    // and a join still runs correctly under the tuned conf
    val (probe, build) = skewed
    val n = probe.join(build, Seq("k")).count()
    val n2 = s2.range(1).sparkSession.sql("SELECT 1").count() // session alive
    assert(n > 0 && n2 === 1L)
  }

  test("bucketed tables join with zero exchanges") {
    val conf = spark.conf
    val savedBroadcast = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      ScaleJoins.writeBucketed(orders, "bkt_orders", "o_orderkey", 4)
      ScaleJoins.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 4)
      val joined = ScaleJoins.bucketedJoin(spark, "bkt_orders", "bkt_lineitem",
        "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"bucketed join must be exchange-free:\n$plan")
      // sanity: same row count as the plain shuffled join
      val plain = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      savedBroadcast match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
