package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{DropSpansInSet, GramsInHashSet, TextExpressions => TX}

/** Span-level (repeated-substring) dedup — the sub-document regime the
  * line filter cannot see (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better", arXiv:2107.06499, motivate
  * removing repeated spans; their suffix-array ExactSubstr finds any
  * repeat ≥ 50 tokens): a fixed-width token n-gram that occurs in more
  * than `maxDf` DISTINCT documents is corpus boilerplate (cookie
  * banners mid-sentence, license blocks, templated intros) wherever it
  * starts, line boundaries or not. Every token covered by any frequent
  * window is removed; survivors re-join single-spaced (the tokenized
  * view — a removed span's surrounding whitespace has no survivor).
  *
  * Suffix arrays don't distribute; the fixed-n sliding window does,
  * and a repeat of length L ≥ n is covered by its L−n+1 frequent
  * windows, so long repeats are removed IN FULL with a window of
  * modest n — the standard scalable approximation of ExactSubstr.
  *
  * Scale shape (the [[Boilerplate]] protocol, per-position):
  *   1. hash-df counting shuffles the DISTINCT per-doc window hashes
  *      (8 B each, the existing `word_shingle_hashes` scan — zero
  *      per-window allocation) — document frequency, by definition;
  *   2. candidate hashes (df > maxDf) pull ONLY their gram STRINGS out
  *      via an in-expression sorted-set probe ([[GramsInHashSet]]);
  *      the exact distinct-doc recount over those candidate-sized rows
  *      means a hash collision can only promote an innocent gram into
  *      the recount, never delete it;
  *   3. the verified frequent-gram strings ride into the per-row
  *      [[DropSpansInSet]] rewrite — a zero-exchange map whose hot
  *      loop probes windows by hash and only builds a string to
  *      confirm a hit.
  * Both collects are gated; above the gates the operator falls back to
  * the explode + join + re-assemble plan (HOF gram construction — the
  * interpreted-lambda cost is why it is the fallback), pinned equal by
  * SpanDedupSpec.
  *
  * Documents with fewer than n tokens have no windows: they pass
  * through (re-joined) and contribute nothing to any df — the
  * WordShingles whole-short-doc shingle is explicitly filtered out of
  * every counting phase. */
object SpanDedup {

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)

  /** Exact (gram, gram_df) pairs with distinct-document df > maxDf. */
  def frequentGrams(df: DataFrame, textCol: String, n: Int, maxDf: Long,
                    candGate: Int = 4_000_000): DataFrame =
    frequentGramsOfToks(
      df.select(TextFunctions.tokens(col(textCol)).as("toks")), n, maxDf, candGate)

  private def frequentGramsOfToks(toks: DataFrame, n: Int, maxDf: Long,
                                  candGate: Int): DataFrame = {
    val long = toks.filter(size(col("toks")) >= n)
    val stringCounted = long
      .select(explode(TX.wordShingles(col("toks"), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("gram_df"))
      .filter(col("gram_df") > maxDf)
    val candRows = long
      .select(explode(TX.wordShingleHashes(col("toks"), n)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > maxDf)
      .select(col("h")).take(candGate + 1)
    if (candRows.length > candGate) stringCounted
    else {
      val set = candRows.map(_.getLong(0)).sorted
      long.select(explode(bridged(GramsInHashSet(
          GraftColumnBridge.expression(col("toks")), n, set))).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("gram_df"))
        .filter(col("gram_df") > maxDf)
    }
  }

  /** Clean `textCol` of corpus-frequent n-gram spans: returns
    * (`idCol`, text_clean, n_dropped) — n_dropped counts removed
    * TOKENS. `gramGate` bounds the collected frequent-gram string set;
    * above it the fallback joins coverage positions and re-assembles
    * (two corpus-keyed exchanges instead of zero; identical result). */
  def dropFrequentSpans(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, maxDf: Long = 2,
                        gramGate: Int = 1_000_000,
                        candGate: Int = 4_000_000): DataFrame = {
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
    val freq = frequentGramsOfToks(toks.select(col("toks")), n, maxDf, candGate)
    val freqRows = freq.select(col("gram")).take(gramGate + 1)
    if (freqRows.length <= gramGate) {
      val set = freqRows.map(r => UTF8String.fromString(r.getString(0)))
      java.util.Arrays.sort(set.asInstanceOf[Array[AnyRef]])
      toks.select(col(idCol), bridged(DropSpansInSet(
          GraftColumnBridge.expression(col("toks")), n, set)).as("r"))
        .select(col(idCol), col("r.text_clean").as("text_clean"),
          col("r.n_dropped").as("n_dropped"))
    } else {
      // explode + coverage join + ordered re-assembly (rare wide path;
      // the frequent frame is recomputed inside the join rather than
      // cache-pinned, same trade as Boilerplate's fallback)
      val grams = toks.filter(size(col("toks")) >= n)
        .select(col(idCol), posexplode(transform(
          sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
          .as(Seq("gpos", "gram")))
      val cov = grams.join(freq.select(col("gram")), Seq("gram"))
        .select(col(idCol),
          explode(sequence(col("gpos"), col("gpos") + n - 1)).as("tpos"))
        .distinct()
      val tokPos = toks
        .select(col(idCol), posexplode(col("toks")).as(Seq("tpos", "tok")))
      val kept = tokPos.join(cov, Seq(idCol, "tpos"), "left_anti")
      val agg = kept.groupBy(col(idCol)).agg(
        array_join(transform(array_sort(collect_list(
          struct(col("tpos"), col("tok")))), x => x.getField("tok")), " ")
          .as("text_clean"),
        count(lit(1)).as("n_kept"))
      toks.select(col(idCol), size(col("toks")).as("n_toks"))
        .join(agg, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("text_clean"), lit("")).as("text_clean"),
          (col("n_toks") - coalesce(col("n_kept"), lit(0L)))
            .cast("int").as("n_dropped"))
    }
  }
}
