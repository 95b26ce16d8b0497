package graft

/** Every-registered-query smoke: build each `SparkEntry.queries` entry
  * against sf0.001 and force analysis. DataFrame construction is eagerly
  * analyzed, so a resolution/type error (the r7 `TIMESTAMP_NTZ` regression
  * — `unix_micros` rejecting the driver-regenerated events column) fails
  * HERE at commit time instead of surfacing as a silently-missing
  * correctness row. The three event-time queries additionally execute,
  * because their past failure mode was exactly a type drift in the events
  * table that analysis alone may not always catch.
  */
class QuerySmokeSpec extends SparkSpec {

  test("every registered query analyzes against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed analysis:\n${failures.mkString("\n")}")
  }

  test("event-time queries execute and return rows") {
    for (name <- Seq("events_asof", "events_rangejoin", "events_sessions")) {
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }
}
