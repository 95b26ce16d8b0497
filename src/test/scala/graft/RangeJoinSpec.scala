package graft

import graft.operators.RangeJoin

/** Bucketed interval join: containment semantics across bucket
  * boundaries, and the plan is a hash equi-join, not a nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches points to containing intervals across bucket boundaries") {
    // bucketWidth 10: intervals spanning one and multiple buckets
    val points = Seq((5L, "p5"), (10L, "p10"), (19L, "p19"), (25L, "p25"),
      (42L, "p42")).toDF("ts", "pname")
    val intervals = Seq((8L, 12L, "i_a"), (0L, 30L, "i_b"), (40L, 41L, "i_c"))
      .toDF("lo", "hi", "iname")
    val all = RangeJoin.intervalJoin(points, "ts", intervals, "lo", "hi", 10L)
      .select("pname", "iname").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // inclusive bounds: 10 ∈ [8,12]; 5/10/19/25 ∈ [0,30]; 42 ∉ [40,41]
    assert(all.toSet === Set(("p10", "i_a"), ("p5", "i_b"), ("p10", "i_b"),
      ("p19", "i_b"), ("p25", "i_b")))
    // no duplicate pairs despite i_b spanning 4 buckets
    assert(all.length === all.toSet.size, "pair duplicated across buckets")
  }

  test("plans as a hash equi-join on the bucket key, not a nested loop") {
    val points = spark.range(1000).selectExpr("id * 7 AS ts", "id AS pid")
    val intervals = spark.range(100)
      .selectExpr("id * 70 AS lo", "id * 70 + 35 AS hi", "id AS iid")
    val joined = RangeJoin.intervalJoin(points, "ts", intervals, "lo", "hi", 100L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join degenerated to a nested loop:\n$plan")
  }
}
