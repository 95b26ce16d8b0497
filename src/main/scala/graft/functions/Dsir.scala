package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{TextExpressions => TX}

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
  * feature distribution looks like a small TARGET corpus (the
  * domain/quality sample you wish the training mix resembled), by
  * scoring each document with the log-likelihood ratio of two bag-of-
  * buckets models. The quantized integer form here:
  *
  *   w(b)   = flog2(c_tgt(b) + 1) − flog2(c_raw(b) + 1) + K
  *   K      = flog2(T_raw + 1) − flog2(T_tgt + 1)
  *   imp(x) = Σ_token w(bucket(token))
  *
  * with flog2(c) = floor(log2 c) = length(bin(c)) − 1 (the same exact
  * integer quantization [[NgramLm]] uses), bucket = the library-wide
  * md5-nibble hashing-trick recipe ([[graft.plans.HashedFeatures]] —
  * first md5 byte mod dim), +1 the Laplace floor that keeps empty
  * buckets defined, and K the quantized normalization constant
  * (flog2 of the two corpora's total token counts) that recenters w so
  * imp(x) reads as a per-token quantized log P_tgt/P_raw. All integer
  * math → reproducible bit-for-bit by the DuckDB oracle from raw text.
  *
  * The keep rule is the integer cross-multiplied mean form the other
  * scored filters use: keep iff imp(x) ≥ threshold · n_tokens.
  * (Original DSIR samples Gumbel-noised weights; a deterministic
  * threshold on the same statistic is the reproducible variant, and a
  * caller wanting sampled selection can feed `dsir_score` into
  * [[graft.queries.ExtensionQueries.mixSampled]]'s hash sampler.)
  *
  * Scale shape: TRAIN is two scans (target is tiny by definition; raw
  * is one pass) each reduced map-side to ≤ dim rows per partition by
  * the per-row [[graft.plans.BucketCounts]] vector — the shuffle
  * carries O(partitions · dim) whatever the corpus size — then 2·dim
  * longs collect to the driver for the weight arithmetic. SCORE is a
  * zero-exchange fused md5+accumulate codegen scan
  * ([[graft.plans.BucketWeightSum]] with the dim weights as task-binary
  * literals). No join, no model table, no corpus-keyed exchange
  * anywhere. */
object Dsir {

  private def flog2p1(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c + 1)

  /** (bucket → occurrence count, total tokens) of a corpus. */
  private def countBuckets(df: DataFrame, textCol: String, dim: Int)
      : (Array[Long], Long) = {
    val rows = df
      .select(explode(TX.bucketCounts(
        TextFunctions.tokens(col(textCol)), dim)).as("f"))
      .groupBy(col("f.bucket").as("bucket"))
      .agg(sum(col("f.c")).as("c"))
      .collect()
    val counts = new Array[Long](dim)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    (counts, counts.sum)
  }

  /** Train the importance weights: one dim-sized aggregate over each
    * corpus, driver arithmetic on 2·dim longs. */
  def importanceWeights(target: DataFrame, raw: DataFrame, textCol: String,
                        dim: Int = 64): Seq[Long] = {
    val (ct, tt) = countBuckets(target, textCol, dim)
    val (cr, tr) = countBuckets(raw, textCol, dim)
    val k = flog2p1(tr) - flog2p1(tt)
    (0 until dim).map(b => flog2p1(ct(b)) - flog2p1(cr(b)) + k)
  }

  /** Score every document: (idCol, dsir_score, n_tokens, keep). The
    * threshold is the rational num/den "mean quantized log-ratio per
    * token" in cross-multiplied integer form (den > 0):
    * keep iff dsir_score · den ≥ num · n_tokens. */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                weights: Seq[Long], thresholdNum: Long,
                thresholdDen: Long = 1L): DataFrame = {
    require(thresholdDen > 0, s"thresholdDen must be > 0, got $thresholdDen")
    df.select(col(idCol),
        TX.bucketWeightSum(TextFunctions.tokens(col(textCol)), weights)
          .as("dsir_score"),
        TextFunctions.tokenCount(col(textCol)).cast("int").as("n_tokens"))
      .withColumn("keep",
        col("dsir_score") * lit(thresholdDen) >=
          lit(thresholdNum) * col("n_tokens"))
  }
}
