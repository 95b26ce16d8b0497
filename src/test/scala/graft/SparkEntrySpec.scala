package graft

/** Driver-contract invariants: the flagship smoke query returns rows, and
  * every oracle key names a registered query (a dangling oracle would make
  * the driver's correctness gate run SQL with no Spark result to compare). */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key is a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are unique and non-empty") {
    assert(SparkEntry.queries.keys.forall(_.nonEmpty))
    // Map keys are unique by construction; guard the count drifting to a
    // literal duplicate in the source by checking a sane floor instead.
    assert(SparkEntry.queries.size >= 50,
      s"query registry shrank to ${SparkEntry.queries.size}")
  }
}
