package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Exact n-gram Jaccard similarity join: the pair set must EQUAL the
  * brute-force all-pairs computation — the prefix filter is a pruning
  * optimization, never a semantics change. */
class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  /** In-JVM reference: word 3-gram shingle set, Dedup.shingles contract
    * (size < n → single joined shingle; empty text → [""]). */
  private def shingleSet(text: String, n: Int = 3): Set[String] = {
    val tk = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (tk.size < n) Set(tk.mkString(" "))
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  private def bruteForce(docs: Seq[(Long, String)], tauNum: Int, tauDen: Int,
                         n: Int = 3): Set[(Long, Long, Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t, n) }
    (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * tauDen >= tauNum * union
    } yield (ia, ib, inter, union)).toSet
  }

  private def run(docs: Seq[(Long, String)], tauNum: Int, tauDen: Int) =
    Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
        shingleN = 3, tauNum = tauNum, tauDen = tauDen)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("pair set equals brute force on a planted near-dup corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val base = (0L until 60L).map { i =>
      i -> Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted: one-word edits of every 5th doc (high Jaccard), plus exact dups
    val variants = base.collect { case (i, t) if i % 5 == 1 =>
      val w = t.split(" "); w(w.length / 2) = "CHANGED"
      (i + 1000L) -> w.mkString(" ")
    }
    val exact = base.collect { case (i, t) if i % 7 == 3 => (i + 2000L) -> t }
    val docs = base ++ variants ++ exact
    val expected = bruteForce(docs, 4, 5)
    assert(expected.nonEmpty, "planted corpus must contain true pairs")
    assert(run(docs, 4, 5) === expected)
  }

  test("exact rational threshold boundary: >= tau kept, < tau dropped") {
    // 3-gram shingles of k+2 tokens => k shingles. a: tokens 0..11 (10
    // shingles), b: tokens 0..10 + x (9 shared + 1 new => inter 9,
    // union 11). J = 9/11: kept at tau = 9/11 exactly, dropped at 5/6.
    val tks = (0 until 12).map(i => s"w$i")
    val a = tks.mkString(" ")
    val b = (tks.take(11) :+ "x").mkString(" ")
    val docs = Seq(1L -> a, 2L -> b)
    assert(run(docs, 9, 11) === Set((1L, 2L, 9L, 11L)))
    assert(run(docs, 5, 6) === Set.empty)
  }

  test("short and degenerate docs follow the shingle contract") {
    val docs = Seq(
      1L -> "one two",          // < n tokens: single "one two" shingle
      2L -> "one two",          // identical short doc => J = 1
      3L -> "",                 // empty => [""] shingle
      4L -> " \t ",             // whitespace-only => [""] too => J = 1 with 3
      5L -> "one two three four five")
    val got = run(docs, 4, 5)
    assert(got === bruteForce(docs, 4, 5))
    assert(got.contains((1L, 2L, 1L, 1L)))
    assert(got.contains((3L, 4L, 1L, 1L)))
  }

  test("tau = 1 returns exactly the identical-shingle-set pairs") {
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d e",
      3L -> "a b c d e f")
    assert(run(docs, 1, 1) === Set((1L, 2L, 3L, 3L)))
  }

  test("maxCandidates budget fails fast on a boilerplate corpus") {
    // 40 identical boilerplate docs: every pair is a candidate —
    // C(40,2) = 780, the output-quadratic regime the guard exists for.
    val docs = (0L until 40L)
      .map(i => i -> "the exact same boilerplate paragraph repeated verbatim")
    val df = docs.toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(df, "text", "doc_id",
        shingleN = 3, tauNum = 4, tauDen = 5, maxCandidates = 100L)
    }
    assert(ex.getMessage.contains("maxCandidates"), ex.getMessage)
    // the same corpus under a sufficient budget (and the unlimited
    // default, which every other test exercises) completes normally
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id",
      shingleN = 3, tauNum = 4, tauDen = 5, maxCandidates = 1000L)
    assert(pairs.count() === 780L)
    pairs.unpersist(blocking = false)
  }

  test("sampled rarity order ≡ exact union-df order, pair for pair") {
    // The r13 candidate rewrite's load-bearing claim, pinned
    // cross-implementation: the prefix theorem holds for ANY fixed
    // shingle order, so the sampled-df path (default) must equal the
    // exact union-df path on a real corpus — across sample fractions,
    // including 0.05 (sparse table) and 1.0 (full draw, still the
    // estimated-order code path).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 2000).select(col("doc_id"), col("text"))
    def pairSet(frac: Double): Set[(Long, Long, Long, Long)] = {
      val p = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        dfSampleFraction = frac)
      val s = p.as[(Long, Long, Long, Long)].collect().toSet
      p.unpersist(blocking = false)
      s
    }
    val exact = pairSet(0.0)
    assert(exact.nonEmpty, "the corpus must contain near-dup pairs")
    assert(pairSet(0.05) === exact, "sparse sampled order diverged")
    assert(pairSet(1.0) === exact, "full-draw sampled order diverged")
  }

  test("the df̂ sample is a pure function of content, not partition layout") {
    // r13 advice: DataFrame.sample's draw depends on the physical
    // partition layout even under a fixed seed, so the rarity order,
    // candidate volume, and whether a maxCandidates fail-fast trips
    // would change when a corpus is merely repartitioned. The
    // content-hash sample must pick the IDENTICAL id set across
    // layouts, and hit close to the asked fraction.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 5000).select(col("doc_id"), col("text"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.contentSample(df, "doc_id", 0.2)
        .select(col("doc_id")).as[Long].collect().toSet
    val base = ids(docs)
    assert(ids(docs.repartition(3)) === base)
    assert(ids(docs.repartition(17, col("text"))) === base)
    assert(ids(docs.coalesce(1)) === base)
    // a hash-ring cut at 0.2 should land near 20% (binomial tails)
    val n = docs.count()
    assert(base.size > 0.1 * n && base.size < 0.3 * n,
      s"content sample badly off the asked fraction: ${base.size}/$n")
    // fraction 1.0 keeps everything (the no-filter fast path)
    assert(Dedup.contentSample(docs, "doc_id", 1.0).count() === docs.count())
  }
}
