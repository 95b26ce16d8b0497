package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Boilerplate
import graft.plans.PiiOps
import graft.queries.ExtensionQueries

/** Corpus-cleaning operators: corpus-frequency line removal (fast
  * broadcast-set path ≡ explode+join fallback ≡ hand truth), PII
  * redaction (pattern semantics, rewrite order, idempotence), and the
  * leakage-safe split contract (clusters never straddle splits). */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    // "sign in" appears in 3 docs (df=3 > maxDf=2) → dropped everywhere;
    // "unique a/b/c" df=1 kept; "shared" df=2 == maxDf kept.
    (1L, "unique a\nsign in\nshared"),
    (2L, "sign in\nunique b\nshared"),
    (3L, "sign in"),                       // all lines dropped → ""
    (4L, "unique c\n\nend"),               // contains an empty line (df=2)
    (5L, "\nmiddle"),                      // leading empty line
    (6L, "no newline doc")
  ).toDF("doc_id", "text")

  test("dropFrequentLines: hand truth, order kept, all-dropped doc is ''") {
    val out = Boilerplate.dropFrequentLines(corpus, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("unique a\nshared", 1)))
    assert(out(2L) === (("unique b\nshared", 1)))
    assert(out(3L) === (("", 1)), "every line dropped → empty string, row kept")
    // empty line df=2 (docs 4, 5) ≤ maxDf → kept verbatim
    assert(out(4L) === (("unique c\n\nend", 0)))
    assert(out(5L) === (("\nmiddle", 0)))
    assert(out(6L) === (("no newline doc", 0)))
  }

  test("fallback (explode+join) path is row-identical to the fast path") {
    val fast = Boilerplate.dropFrequentLines(corpus, "doc_id", "text", maxDf = 2)
    // lineGate = 0 forces the join path; candGate = 0 forces the direct
    // string df count — both gated fallbacks in one shot.
    val slow = Boilerplate.dropFrequentLines(corpus, "doc_id", "text",
      maxDf = 2, lineGate = 0, candGate = 0)
    assert(fast.collect().toSet === slow.collect().toSet)
  }

  test("frequentLines: exact (line, df) pairs above the threshold") {
    val freq = Boilerplate.frequentLines(corpus, "text", maxDf = 2)
      .as[(String, Long)].collect().toMap
    assert(freq === Map("sign in" -> 3L))
    // threshold is strict: df == maxDf survives
    val freq1 = Boilerplate.frequentLines(corpus, "text", maxDf = 1)
      .as[(String, Long)].collect().toMap
    assert(freq1 === Map("sign in" -> 3L, "shared" -> 2L, "" -> 2L))
  }

  test("registered text_linededup matches a brute-force recomputation") {
    val out = ExtensionQueries.textLineDedup(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.count() === docs.count(), "one row per document")
    // the df=1 'unique line N' arm must always survive
    val uniques = out.filter(col("doc_id") % 5 === 3)
      .filter(!col("text_clean").contains(
        concat(lit("unique line "), col("doc_id").cast("string")))).count()
    assert(uniques === 0, "df=1 lines must never be dropped")
    // the planted df-heavy footer arms must always be gone
    val leaked = out.filter(
      col("text_clean").contains("subscribe to our newsletter") ||
      col("text_clean").contains("all rights reserved")).count()
    assert(leaked === 0, "df-heavy boilerplate must be dropped")
  }

  // ---- PII ------------------------------------------------------------

  private def redact(s: String): String =
    PiiOps.redact(UTF8String.fromString(s)).toString

  test("PII redaction: each pattern, the chain order, and idempotence") {
    assert(redact("mail bob.smith+x@sub.example.co.uk now") ===
      "mail <EMAIL> now")
    assert(redact("ssn 123-45-6789.") === "ssn <SSN>.")
    assert(redact("call 555-123-4567 or 555.123.4567") ===
      "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.001.1 up") === "host <IP> up")
    assert(redact("a@b.com 1.2.3.4 111-22-3333 999-88-77") ===
      "<EMAIL> <IP> <SSN> 999-88-77",
      "3-2-2 grouping is neither an SSN nor a 3-3-4 phone")
    // no match → the input UTF8String is returned unchanged (no copy)
    val clean = UTF8String.fromString("nothing here")
    assert(PiiOps.redact(clean) eq clean)
    // redacted text is a fixed point: placeholders contain no PII shapes
    val once = redact("a@b.com and 10.0.0.1 and 123-45-6789")
    assert(redact(once) === once)
  }

  test("PII counts are per-pattern on the original text") {
    val r = PiiOps.counts(UTF8String.fromString(
      "a@b.com c@d.org 10.0.0.1 123-45-6789 555-123-4567"))
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) ===
      ((2, 1, 1, 1)), "(email, ssn, phone, ip)")
  }

  test("registered pii_scrub: planted PII all redacted, counts match arms") {
    val out = ExtensionQueries.piiScrub(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      assert(out.filter(col("n_email") =!= 1).count() === 0)
      assert(out.filter(col("n_ip") =!= 1).count() === 0)
      assert(out.filter(col("n_phone") =!=
        when(col("doc_id") % 3 === 0, 1).otherwise(0)).count() === 0)
      assert(out.filter(col("n_ssn") =!=
        when(col("doc_id") % 4 === 0, 1).otherwise(0)).count() === 0)
      // nothing PII-shaped survives the rewrite
      val residual = out.filter(
        col("text_redacted").rlike(PiiOps.EmailPattern) ||
        col("text_redacted").rlike(PiiOps.SsnPattern) ||
        col("text_redacted").rlike(PiiOps.PhonePattern) ||
        col("text_redacted").rlike(PiiOps.Ipv4Pattern)).count()
      assert(residual === 0, "redacted text must match no PII pattern")
    } finally out.unpersist()
  }

  // ---- per-source cap -------------------------------------------------

  test("capPerSource: straggler-free plan, selection ≡ window formulation") {
    val out = ExtensionQueries.capPerSource(spark, sfDir, k = 10)
    // the whole point: a k-heap aggregate, NOT a per-source window sort
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "cap must not plan a per-source window (low-cardinality straggler)")
    val rows = out.collect()
    val perSource = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= 10), "cap of 10 per source")
    assert(perSource.values.exists(_ == 10), "cap binds on this corpus")
    // reference: the row_number-over-(hash, id) window it replaces
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy((col("doc_id") % 2147483647L * 2654435761L % 100000007L
        * 97003L % 100000007L % 100L).asc, col("doc_id").asc)
    val ref = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        row_number().over(w).as("rk")).filter(col("rk") <= 10)
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ===
      ref.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  // ---- leakage-safe split --------------------------------------------

  test("assignSplitsByOwner: lineage clusters share a split, orphans self-own") {
    val docs = (1L to 8L).toDF("doc_id")
    // closed lineage: 3,4 → root 1; 7 → root 5 (near-dup chains collapsed)
    val owners = Seq((3L, 1L), (4L, 1L), (7L, 5L)).toDF("id", "keep_id")
    val out = ExtensionQueries.assignSplitsByOwner(docs, "doc_id", owners)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet === (1L to 8L).toSet)
    assert(out(3L)._1 === 1L && out(4L)._1 === 1L && out(7L)._1 === 5L)
    assert(Set(out(1L), out(3L), out(4L)).map(_._2).size === 1,
      "cluster {1,3,4} must land in one split")
    assert(out(5L)._2 === out(7L)._2, "cluster {5,7} must land in one split")
    assert(Seq(2L, 6L, 8L).forall(i => out(i)._1 === i), "orphans self-own")
    // split is a pure function of the owner id — same rule as the
    // registered exact-dup query, so the two agree on self-owned docs
    val solo = ExtensionQueries.assignSplitsByOwner(docs, "doc_id",
      Seq.empty[(Long, Long)].toDF("id", "keep_id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Seq(2L, 6L, 8L).map(k => k -> out(k)._2).toMap ===
      Seq(2L, 6L, 8L).map(k => k -> solo(k)).toMap)
  }

  test("splitLeakageSafe: exact-dup clusters never straddle splits") {
    val out = ExtensionQueries.splitLeakageSafe(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.count() === docs.count())
    // same text ⇒ same keep_id ⇒ same split (join back on text)
    val straddle = out.join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("text")
      .agg(countDistinct("split").as("ns"), countDistinct("keep_id").as("nk"))
      .filter(col("ns") > 1 || col("nk") > 1).count()
    assert(straddle === 0, "a duplicate cluster must land in ONE split")
    // keep_id is the cluster min and a member of the cluster
    val badOwner = out.filter(col("keep_id") > col("doc_id")).count()
    assert(badOwner === 0, "owner is the minimum doc_id")
    // deterministic: a second evaluation is identical
    assert(out.collect().toSet ===
      ExtensionQueries.splitLeakageSafe(spark, sfDir).collect().toSet)
  }
}
