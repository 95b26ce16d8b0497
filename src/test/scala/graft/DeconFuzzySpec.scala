package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.queries.ExtensionQueries

/** Fuzzy benchmark decontamination: hand truth (verbatim leak, edited
  * leak, clean doc, within-side pairs discarded) and the registered
  * planted-leak query. */
class DeconFuzzySpec extends SparkSpec {

  import spark.implicits._

  test("hand truth: verbatim + edited leaks flagged, sides decoded") {
    val bench = Seq((10L, "one two three four five six seven eight"))
      .toDF("id", "text")
    val train = Seq(
      (1L, "one two three four five six seven eight"),          // verbatim
      (2L, "one two three four five six seven eight edited"),   // near
      (3L, "totally different text with other words entirely"), // clean
      // in-train near-dup pair: must NOT surface (cross-side only)
      (4L, "totally different text with other words entirely x")
    ).toDF("id", "text")
    val out = Dedup.benchmarkNearDups(train, bench, "text", "id",
        tauNum = 4, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    // 8 tokens → 6 shingles; edited: 7 shingles, inter 6, union 7
    assert(out === Set((1L, 10L, 6L, 6L), (2L, 10L, 6L, 7L)))
  }

  test("registered decon_fuzzy: every hold-out row leaks twice") {
    val out = ExtensionQueries.deconFuzzy(spark, sfDir).persist()
    try {
      val bench = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 23 === 0)
      val nBench = bench.count()
      // verbatim retained copies: (d, d) at J = 1 for every bench row
      val verbatim = out.filter(col("doc_id") === col("bench_id") &&
        col("inter_count") === col("union_count")).count()
      assert(verbatim === nBench, "every retained copy must flag at J=1")
      // planted edited copies: (d + 20000, d), J < 1 but above τ
      val edited = out.filter(col("doc_id") === col("bench_id") + 20000)
      assert(edited.count() === nBench, "every edited copy must flag")
      assert(edited.filter(col("inter_count") >= col("union_count")).count()
        === 0, "an edited copy is near-verbatim, not verbatim")
    } finally out.unpersist(blocking = false)
  }
}
