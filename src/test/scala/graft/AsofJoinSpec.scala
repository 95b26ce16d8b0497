package graft

import graft.operators.AsofJoin

/** As-of join semantics on planted rows: latest right value with
  * right.ts <= left.ts per key; null when nothing precedes. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks the latest right value at or before each left timestamp") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 10L, "d")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 11L, 200L))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "v")
      .collect().map(r => (r.getAs[String]("name"),
        Option(r.getAs[java.lang.Long]("asof_v")).map(_.toLong))).toMap
    assert(out("a") === Some(100L)) // equal ts matches (<= semantics)
    assert(out("b") === Some(150L)) // latest prior, not first
    assert(out("c") === None)       // nothing at or before ts=5
    assert(out("d") === None)       // key 2's right row is later (11 > 10)
  }

  test("plans with a single shuffle (union + one keyed window)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val left = spark.range(10000).selectExpr("id % 50 AS k", "id AS ts", "id AS payload")
    val right = spark.range(2000).selectExpr("id % 50 AS k", "id * 3 AS ts", "id AS v")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "v")
    out.collect()
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.size <= 1,
      s"asof join must shuffle once, saw ${exchanges.size}:\n$plan")
  }

  test("left columns and row count are preserved") {
    val left = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k", "ts", "name")
    val right = Seq((9L, 1L, 7L)).toDF("k", "ts", "v") // different key only
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "v")
    assert(out.count() === 2)
    assert(out.columns.toSet === Set("k", "ts", "name", "asof_v"))
    assert(out.filter(out("asof_v").isNotNull).count() === 0)
  }
}
