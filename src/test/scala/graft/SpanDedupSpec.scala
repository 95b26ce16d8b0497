package graft

import org.apache.spark.sql.functions._

import graft.functions.SpanDedup
import graft.queries.ExtensionQueries

/** Span-level (repeated-substring) dedup: fixed-width frequent n-gram
  * coverage removal — hand truth with overlapping/boundary windows,
  * fast broadcast-set path ≡ explode+join fallback, idempotence,
  * short-doc passthrough, within-doc occurrences of a cross-doc
  * frequent gram removed too. */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // n=3, maxDf=2. "one two three" sits in 3 docs (df=3 > 2) → every
  // occurrence's 3 tokens are covered; all other grams have df ≤ 2.
  private def corpus = Seq(
    (1L, "a one two three b"),
    (2L, "one two three c d e"),
    // within-doc repeat: BOTH occurrences covered (df counts docs, not
    // occurrences, but coverage removes every match)
    (3L, "x one two three y one two three"),
    (4L, "totally unrelated text here"),
    (5L, "short doc"), // < n tokens: no windows, passes through
    (6L, "")
  ).toDF("doc_id", "text")

  private def clean(df: org.apache.spark.sql.DataFrame,
                    gramGate: Int = 1000000, candGate: Int = 1000000) =
    SpanDedup.dropFrequentSpans(df, "doc_id", "text", n = 3, maxDf = 2,
      gramGate = gramGate, candGate = candGate)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap

  test("hand truth: coverage union, within-doc repeats, passthroughs") {
    val out = clean(corpus)
    assert(out(1L) === (("a b", 3)))
    assert(out(2L) === (("c d e", 3)))
    assert(out(3L) === (("x y", 6)), "both occurrences covered")
    assert(out(4L) === (("totally unrelated text here", 0)))
    assert(out(5L) === (("short doc", 0)), "docs under n tokens untouched")
    assert(out(6L) === (("", 0)))
  }

  test("fallback (explode+join) path is row-identical to the fast path") {
    // gramGate=0 forces the coverage join; candGate=0 forces the direct
    // string df count — both gated fallbacks in one shot
    assert(clean(corpus) === clean(corpus, gramGate = 0, candGate = 0))
  }

  test("cleaning is idempotent") {
    val once = SpanDedup.dropFrequentSpans(corpus, "doc_id", "text",
      n = 3, maxDf = 2).select(col("doc_id"), col("text_clean").as("text"))
    val twice = SpanDedup.dropFrequentSpans(once, "doc_id", "text",
      n = 3, maxDf = 2)
    assert(twice.filter(col("n_dropped") =!= 0).count() === 0,
      "a cleaned corpus has no frequent grams left")
  }

  test("frequentGrams: distinct-DOC frequency, strict threshold") {
    val freq = SpanDedup.frequentGrams(corpus, "text", n = 3, maxDf = 2)
      .as[(String, Long)].collect().toMap
    // doc 3 contains the gram twice but counts ONCE: df is 3 docs
    assert(freq === Map("one two three" -> 3L))
  }

  test("registered text_spandedup: banner stripped, one row per doc") {
    val out = ExtensionQueries.textSpanDedup(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.count() === docs.count(), "one row per document")
    // the planted banner 8-gram is corpus-frequent → no cleaned text of
    // a banner doc may still contain it
    val leaked = out.filter(col("doc_id") % 3 === 0)
      .filter(col("text_clean").contains(
        "alpha beta gamma delta epsilon zeta eta theta")).count()
    assert(leaked === 0, "planted banner must be removed everywhere")
    // banner docs lose at least the 8 banner tokens
    val tooFew = out.filter(col("doc_id") % 3 === 0)
      .filter(col("n_dropped") < 8).count()
    assert(tooFew === 0)
  }
}
