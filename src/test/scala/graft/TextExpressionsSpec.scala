package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.plans.TextExpressions

/** The compiled byte-scan text expressions must be EXACTLY equivalent to
  * the regex formulations they replaced — those regexes are the contract
  * the DuckDB oracle SQL mirrors, so any divergence here is a silent
  * cross-engine correctness break, not just a perf bug. */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial fixed cases + seeded random strings mixing every
    * separator, ASCII text, digits, and multi-byte UTF-8 (whose
    * continuation bytes must never be mistaken for ASCII separators). */
  private val fixed = Seq(
    "", " ", "\t", "\n\r\f", "a", " a", "a ", "  a  b  ",
    "a\tb\nc\rd\fef", "héllo wörld", "日本語 テスト", "a b",
    "ő\t\tő", "mixé1 23digits", "😀 emoji 😀",
    "trailing\n", "\ttab-led", "double  space", "ABC xyz 123 .,;")

  private val random: Seq[String] = {
    val rnd = new scala.util.Random(20260813L)
    val alphabet: Array[String] = Array(
      " ", "\t", "\n", "\r", "\f", "\u000B", "a", "Z", "0", "9", ".",
      "é", "ñ", "日", "語", "😀", " ", "x", "Q", "5",
      ",", "!", "?", "(", ")", "{", "}", "-", "'", "\"", "[", "]")
    Seq.fill(300)(Seq.fill(rnd.nextInt(40))(
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  private val corpus = (fixed ++ random).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  test("ws_tokens equals the regex trim+split formulation on every input") {
    val df = corpus.toDF("id", "t")
    val mismatches = df.select(col("id"),
        TF.tokens(col("t")).as("fast"),
        TF.tokensRegex(col("t")).as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(mismatches === 0)
  }

  test("ascii_range_count equals the regex char-class count on every input") {
    val df = corpus.toDF("id", "t")
    val mismatches = df.select(col("id"),
        TextExpressions.asciiRangeCount(col("t"), '0', '9').as("fast"),
        length(regexp_replace(col("t"), "[^0-9]", "")).as("ref"),
        TextExpressions.asciiRangeCount(col("t"), 'A', 'Z').as("fastU"),
        length(regexp_replace(col("t"), "[^A-Z]", "")).as("refU"))
      .filter(col("fast") =!= col("ref") || col("fastU") =!= col("refU"))
      .count()
    assert(mismatches === 0)
  }

  test("ascii_set_count equals the punct regex class on every input") {
    val df = corpus.toDF("id", "t")
    val mismatches = df.select(col("id"),
        TextExpressions.asciiSetCount(col("t"), ".,;:!?'\"()[]{}-").as("fast"),
        length(regexp_replace(col("t"), "[^.,;:!?'\"()\\[\\]{}-]", "")).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches === 0)
  }

  test("ws_token_count equals size(ws_tokens) on every input") {
    val df = corpus.toDF("id", "t")
    val mismatches = df.select(col("id"),
        TF.tokenCount(col("t")).as("fast"),
        size(TF.tokens(col("t"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches === 0)
  }

  test("meanTokenLen identity equals the per-token aggregate formulation") {
    // new: (chars − ws chars) / tokens;  old: interpreted HOF summing
    // length(token). Code-point counting makes the identity exact, emoji
    // and multi-byte text included.
    val df = corpus.toDF("id", "t")
    val old = graft.functions.ExprUtils.let(TF.tokens(col("t"))) { tk =>
      when(size(tk) === 0, lit(0.0)).otherwise(
        aggregate(tk, lit(0L), (acc, s) => acc + length(s))
          .cast("double") / size(tk))
    }
    val mismatches = df.select(col("id"),
        TF.meanTokenLen(col("t")).as("fast"), old.as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(mismatches === 0)
  }

  test("word_shingles equals the HOF slice+concat formulation on every input") {
    for (n <- Seq(1, 2, 3, 5)) {
      val mismatches = corpus.toDF("id", "t")
        .select(col("id"),
          graft.functions.Dedup.shingles(col("t"), n).as("fast"),
          graft.functions.Dedup.shinglesHof(col("t"), n).as("ref"))
        .filter(not(col("fast") === col("ref")))
        .count()
      assert(mismatches === 0, s"shingle mismatch at n=$n")
    }
  }

  test("word_shingle_hashes equals sorted distinct xxhash64 of the shingles") {
    for (n <- Seq(1, 3)) {
      val mismatches = corpus.toDF("id", "t")
        .select(col("id"),
          graft.functions.Dedup.shingleHashes(col("t"), n).as("fast"),
          array_sort(transform(graft.functions.Dedup.shinglesHof(col("t"), n),
            s => xxhash64(s))).as("ref"))
        .filter(not(col("fast") === col("ref")))
        .count()
      assert(mismatches === 0, s"shingle-hash mismatch at n=$n")
    }
  }

  test("word_shingle_hashes skips null tokens like concat_ws and regrows its buffer") {
    // The type check accepts array<string, containsNull=true>, so null
    // elements must hash exactly like the concat_ws reference (which
    // drops them) — not NPE. The long-token rows force the scratch
    // buffer past its 4 KiB initial size through the overflow-safe
    // max(total, 2×) growth path.
    val big1 = "x" * 10000; val big2 = "y" * 9000
    val df = Seq(
      (1L, Seq("a", null, "b", "c")),
      (2L, Seq[String](null, null)),
      (3L, Seq("x", null)),
      (4L, Seq(big1, big2, "z", big1))
    ).toDF("id", "tk")
    val n = 3
    val ref = graft.functions.ExprUtils.let(col("tk")) { tk =>
      when(size(tk) < n, array(xxhash64(concat_ws(" ", tk))))
        .otherwise(array_sort(array_distinct(transform(
          sequence(lit(0), size(tk) - n),
          i => xxhash64(concat_ws(" ", slice(tk, i + 1, lit(n))))))))
    }
    val mismatches = df.select(col("id"),
        TextExpressions.wordShingleHashes(col("tk"), n).as("fast"), ref.as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(mismatches === 0)
  }

  test("word_shingle_hashes from text is bit-equal to the token-array path") {
    // The fused string path must produce EXACTLY the hashes of
    // wordShingleHashes(ws_tokens(text)) — decon candidate generation
    // relies on hash equality matching gram-string equality.
    for (n <- Seq(2, 4)) {
      val df = corpus.toDF("id", "t")
      val mismatches = df.select(col("id"),
          TextExpressions.wordShingleHashesOfText(col("t"), n).as("fused"),
          TextExpressions.wordShingleHashes(TF.tokens(col("t")), n).as("ref"))
        .filter(not(col("fused") === col("ref")))
        .count()
      assert(mismatches === 0, s"fused shingle hashes diverged at n=$n")
    }
  }

  test("ngram_repetition equals the explode+groupBy formulation on every input") {
    // The fused byte-scan + index-sort must agree with the distributed
    // reference formulation it replaces (the one the DuckDB oracle
    // mirrors): tokenize, explode n-gram windows, count per (id, gram),
    // aggregate per id. The adversarial corpus exercises multi-byte
    // UTF-8, every separator, and empty/whitespace-only strings.
    for (n <- Seq(2, 3)) {
      val df = corpus.toDF("id", "t")
        .select(col("id"), col("t"), TF.tokens(col("t")).as("tk"))
      val fast = df.select(col("id"),
        TextExpressions.ngramRepetition(col("t"), n).as("r"))
      val windows = df.select(col("id"),
          explode(when(size(col("tk")) < n, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(col("tk")) - n),
              i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))).as("g"))
      val perGram = windows.groupBy(col("id"), col("g")).count()
      val refAgg = perGram.groupBy(col("id")).agg(
        sum("count").cast("int").as("total"),
        count(lit(1)).cast("int").as("distinct"),
        max("count").cast("int").as("top"))
      val ref = df.select(col("id")).join(refAgg, Seq("id"), "left")
        .select(col("id"), struct(
          coalesce(col("total"), lit(0)).as("total"),
          coalesce(col("distinct"), lit(0)).as("distinct"),
          coalesce(col("top"), lit(0)).as("top")).as("r"))
      val mismatches = fast.alias("f").join(ref.alias("r"), Seq("id"))
        .filter(not(col("f.r") === col("r.r"))).count()
      assert(mismatches === 0, s"ngram_repetition n=$n diverged")
    }
  }

  test("ngram_repetition fixed cases pin the window semantics") {
    val df = Seq(
      (1L, "a a a a"),      // 2-grams: 3 windows of "a a"
      (2L, "a b a b a"),    // 2-grams: a b, b a, a b, b a
      (3L, "x"),            // no 2-gram window
      (4L, ""),             // no tokens at all
      // 2000 tokens, maximal duplication — drives the 3-way quicksort
      // deep: 2-grams are "a b"×1000 and "b a"×999
      (5L, "a b " * 1000)
    ).toDF("id", "t")
    val out = df.select(col("id"),
        TextExpressions.ngramRepetition(col("t"), 2).as("r"))
      .selectExpr("id", "r.total", "r.distinct", "r.top")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(1L) === ((3, 1, 3)))
    assert(out(2L) === ((4, 2, 2)))
    assert(out(3L) === ((0, 0, 0)))
    assert(out(4L) === ((0, 0, 0)))
    assert(out(5L) === ((1999, 2, 1000)))
  }

  test("ws_tokens handles nulls and stays inside whole-stage codegen") {
    val df = Seq((1L, "a b"), (2L, null)).toDF("id", "t")
    val out = df.select(col("id"), TF.tokens(col("t")).as("tk")).collect()
    assert(out.find(_.getLong(0) == 1L).get.getSeq[String](1) === Seq("a", "b"))
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))

    // codegen assertion needs a real scan (a local relation constant-folds)
    val scanned = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(TF.tokens(col("text")).as("tk"))
    scanned.collect()
    val plan = scanned.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(l => l.contains("ws_tokens") || l.contains("Project")).getOrElse("")
    assert(projLine.trim.startsWith("*") || projLine.contains("*("),
      s"ws_tokens fell out of codegen:\n$plan")
  }
}
