package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{BigramLogProbSum, GramsInHashSetAll, WordNgramHashesAll,
  WordNgramsAll}

/** Statistical n-gram language-model quality filter — the CCNet stage
  * (Wenzek et al. 2020, arXiv:1911.00359: score each document with an
  * LM trained on a trusted corpus, drop the high-perplexity tail). A
  * full KenLM is driver-external; the distributable core the stage
  * actually needs is (a) a bigram count table trained with one
  * aggregation over the trusted corpus and (b) a per-document
  * conditional-log-probability scan — both exact integer math here, so
  * every number is reproducible bit-for-bit by the DuckDB oracle.
  *
  * Quantization: flog2(c) = floor(log2(c)) = length(bin(c)) - 1 — an
  * integer both engines compute identically (no float log). The model
  * value of bigram "u v" is qlp = flog2(c("u v")) - flog2(c("u")), a
  * quantized log2 P(v|u) ≤ 0 (a bigram occurs at most as often as its
  * head token). A bigram unseen in training — or seen but pruned by
  * `minCount`, the standard LM vocabulary cut that also bounds the
  * model — scores the fixed `penalty` (a pessimistic unseen-mass
  * log-prob, the integer stand-in for backoff smoothing).
  *
  * Document decision: keep iff lm_score >= threshold * n_bigrams —
  * the integer cross-multiplied form of "mean bits per bigram above
  * threshold" (both sides negative; no division, no rounding).
  * Documents under 2 tokens have no bigrams: (0, 0), kept — length
  * gates are a separate stage's job.
  *
  * Scale shape:
  *   1. TRAIN is one occurrence-count aggregation over the trusted
  *      corpus (map-side partial combine makes the exchange
  *      distinct-grams-per-partition sized — the vocabulary-build
  *      shape, not the corpus size) plus a unigram count and a
  *      broadcast-sized join of the two (the bigram table joins its
  *      head-token count; the unigram side is vocabulary-sized).
  *      `minCount` prunes the long tail at the source.
  *   2. SCORE is a zero-exchange per-row map: the pruned model rides
  *      in [[BigramLogProbSum]] as a task-binary sorted array, each
  *      adjacent pair probes by scratch-buffer hash and confirms by
  *      exact string. Above `modelGate` the scorer falls back to
  *      explode + broadcast-or-shuffle join + re-aggregate (identical
  *      result, pinned by NgramLmSpec).
  */
object NgramLm {

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)

  /** floor(log2(c)) for c >= 1, as exact integer math. */
  private def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** Train a bigram model on `df(textCol)`: returns (gram, qlp) where
    * gram = "u v" (adjacent whitespace tokens) with occurrence count
    * > minCount, and qlp = flog2(c(gram)) - flog2(c(u)).
    *
    * Two-phase counting (the [[SpanDedup]] protocol, occurrence
    * flavor): phase 1 counts 8-byte window HASHES (zero string builds,
    * zero-allocation scratch-buffer scan, map-side combined); only the
    * candidates above minCount pull their gram STRINGS out
    * ([[graft.plans.GramsInHashSetAll]]) for the exact occurrence
    * recount — the string exchange carries candidate mass instead of
    * every window in the corpus. A hash collision can only PROMOTE an
    * innocent gram into the recount (its exact string count then
    * decides), never drop a frequent one (a gram's hash count ≥ its
    * true count). Above `candGate` candidates the direct string count
    * runs instead — identical model, pinned by NgramLmSpec. */
  def train(df: DataFrame, textCol: String, minCount: Long = 1,
            candGate: Int = 4_000_000): DataFrame = {
    val toks = df.select(TextFunctions.tokens(col(textCol)).as("toks"))
    val long = toks.filter(size(col("toks")) >= 2)
    def stringCounted: DataFrame = long
      .select(explode(bridged(WordNgramsAll(
        GraftColumnBridge.expression(col("toks")), 2))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") > minCount)
    val candRows = long
      .select(explode(bridged(WordNgramHashesAll(
        GraftColumnBridge.expression(col("toks")), 2))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > minCount)
      .select(col("h")).take(candGate + 1)
    val bc =
      if (candRows.length > candGate) stringCounted
      else {
        val set = candRows.map(_.getLong(0)).sorted
        long.select(explode(bridged(GramsInHashSetAll(
            GraftColumnBridge.expression(col("toks")), 2, set))).as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("c"))
          .filter(col("c") > minCount)
      }
    // context counts: plain unigram occurrence totals (the standard
    // c(u) approximation; c("u v") <= c(u) keeps qlp <= 0)
    val uc = toks.select(explode(col("toks")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    bc.withColumn("u", substring_index(col("gram"), " ", 1))
      .join(uc, Seq("u"))
      .select(col("gram"), (flog2(col("c")) - flog2(col("cu"))).as("qlp"))
  }

  /** Commit a trained model to a [[graft.store.SnapshotStore]] table —
    * the train-once/score-many amortization TextIndex gives retrieval,
    * for the LM filter: (gram, qlp) sorted by gram (tight string zone
    * ranges per file for future probes), training parameters riding in
    * the version metadata with the data's atomicity. Retraining commits
    * a new version; old versions stay readable (loadVersion), so a
    * scoring run can pin the model version it started with. */
  def commitModel(store: graft.store.SnapshotStore, table: String,
                  model: DataFrame, minCount: Long): Long =
    store.commit(table, model.select(col("gram"), col("qlp")),
      sortKey = Some("gram"),
      meta = Map("lm.kind" -> "bigram-qlp", "lm.minCount" -> minCount.toString),
      statsCols = Seq("gram"))

  /** The latest committed model of `table`, as [[scoreDocs]] expects. */
  def loadModel(store: graft.store.SnapshotStore, table: String): DataFrame =
    store.load(table).select(col("gram"), col("qlp"))

  /** Score every document of `df` against a trained `model` (gram,
    * qlp): returns (idCol, lm_score, n_bigrams, keep). */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                model: DataFrame, penalty: Long = -30L, threshold: Long = -12L,
                modelGate: Int = 4_000_000): DataFrame = {
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
    val rows = model.select(col("gram"), col("qlp")).take(modelGate + 1)
    val scored =
      if (rows.length <= modelGate) {
        val sorted = rows
          .map(r => (UTF8String.fromString(r.getString(0)), r.getLong(1)))
          .sortBy(_._1) // UTF8String binary order = the probe's search order
        toks.select(col(idCol), bridged(BigramLogProbSum(
            GraftColumnBridge.expression(col("toks")),
            sorted.map(_._1), sorted.map(_._2), penalty)).as("r"))
          .select(col(idCol), col("r.lm_score").as("lm_score"),
            col("r.n_bigrams").as("n_bigrams"))
      } else {
        // fallback: explode pairs, join the model (Catalyst picks
        // broadcast vs shuffle by size), re-aggregate per doc — one
        // corpus-keyed exchange, identical integers
        val pairs = toks.filter(size(col("toks")) >= 2)
          .select(col(idCol), explode(bridged(WordNgramsAll(
            GraftColumnBridge.expression(col("toks")), 2))).as("gram"))
        val agg = pairs.join(model, Seq("gram"), "left")
          .groupBy(col(idCol)).agg(
            sum(coalesce(col("qlp"), lit(penalty))).as("s"),
            count(lit(1)).as("n"))
        toks.select(col(idCol))
          .join(agg, Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("s"), lit(0L)).as("lm_score"),
            coalesce(col("n"), lit(0L)).cast("int").as("n_bigrams"))
      }
    scored.withColumn("keep",
      col("lm_score") >= lit(threshold) * col("n_bigrams"))
  }
}
