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

  test("shuffle-free decon ≡ full self-join + parity split (r11 #1)") {
    // The pre-r13 formulation: full ngramJaccardPairs over the parity
    // union (exact union-wide df order), cross-side pairs kept by an
    // OUTPUT filter. The rewritten path — sampled-df rarity order,
    // broadcast bench prefixes, candidate-restricted exact verify —
    // must produce the identical evidence set on a corpus that has
    // in-train dups, in-bench dups, AND cross leaks; the prefix
    // theorem guarantees it for ANY fixed shingle order, which is the
    // load-bearing claim this spec pins cross-implementation.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1500)
    val bench = docs.filter(col("doc_id") % 23 === 0)
      .select(col("doc_id"), col("text"))
      // planted in-bench near-dup pair (must not surface)
      .unionByName(bench0Planted(docs))
    val train = docs.select(col("doc_id"), col("text"))
      .unionByName(bench.select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" edited")).as("text")))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val old = {
      val u = train.select((col("doc_id") * 2).as("jid"), col("text"))
        .unionByName(bench.select((col("doc_id") * 2 + 1).as("jid"), col("text")))
      val pairs = Dedup.ngramJaccardPairs(u, "text", "jid")
      val o = pairs.filter(col("id_a") % 2 =!= col("id_b") % 2)
        .select(
          shiftright(when(col("id_a") % 2 === 0, col("id_a"))
            .otherwise(col("id_b")), 1).as("doc_id"),
          shiftright(when(col("id_a") % 2 === 1, col("id_a"))
            .otherwise(col("id_b")), 1).as("bench_id"),
          col("inter_count"), col("union_count"))
      val s = pairSet(o)
      pairs.unpersist(blocking = false)
      s
    }
    val anchored = Dedup.benchmarkNearDups(train, bench, "text", "doc_id")
    try assert(pairSet(anchored) === old,
      "anchored candidate join must be output-identical to the self-join")
    finally anchored.unpersist(blocking = false)
    assert(old.nonEmpty, "the corpus must actually contain cross leaks")
  }

  /** A near-dup PAIR living entirely inside the benchmark side. */
  private def bench0Planted(docs: org.apache.spark.sql.DataFrame) = {
    val d0 = docs.filter(col("doc_id") === 0)
    d0.select((col("doc_id") + 31000).as("doc_id"), col("text"))
      .unionByName(d0.select((col("doc_id") + 31001).as("doc_id"),
        concat(col("text"), lit(" z")).as("text")))
  }

  test("maxCandidates budget aborts a dup-heavy decon before verify") {
    // Boilerplate corpus: every train doc is a candidate for every
    // bench doc, so the cross candidate count (10 × 5 = 50) blows a
    // tiny budget — production decon (non-zero default) must abort
    // loudly instead of fanning out the verify join.
    val text = "the same boilerplate sentence repeated across the corpus"
    val train = (1L to 10L).map(i => (i, text)).toDF("id", "text")
    val bench = (1L to 5L).map(i => (i, text)).toDF("id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.benchmarkNearDups(train, bench, "text", "id", maxCandidates = 10L)
    }
    assert(e.getMessage.contains("maxCandidates"))
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
