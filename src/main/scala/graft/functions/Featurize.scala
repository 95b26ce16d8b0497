package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExprUtils.let

/** Feature hashing ("hashing trick"): text → fixed-width sparse/dense
  * vectors with no trained vocabulary — the bridge from the `documents`
  * table to the embedding/ANN operator family (builder prompt's
  * training-data-pipeline extension; reference has no analog — its text
  * columns stop at SQL filters, `lambda/lambda_function.py:520-700`).
  *
  * Scale design: no vocabulary means no driver-side state, no broadcast
  * dictionary, and no fit/transform split — each row featurizes
  * independently inside one codegen stage, so the operator is a pure map
  * at any corpus size. The sparse form is ONE explode + ONE hash-keyed
  * aggregation (the same shuffle shape as vocab_topk); the dense form
  * never shuffles at all.
  *
  * Hash recipe (cross-engine, mirrors Dedup.simhash64Md5's nibble reads):
  * per token t, h = md5(t) hex; bucket = (nib(1)·16 + nib(2)) mod dim;
  * sign = +1 if nib(3) is odd else −1. md5 is the one hash Spark and
  * DuckDB compute identically, so the sparse output is pinned to a DuckDB
  * oracle from raw text (`embed_docs`). Signed counting (Weinberger et
  * al., ICML 2009) keeps bucket-collision noise zero-mean.
  */
object Featurize {

  /** Sparse hashed bag-of-tokens: one row per (id, bucket) with the
    * signed token count, zero-weight buckets dropped. Empty/whitespace
    * docs contribute no rows (explode of an empty feature array).
    *
    * A PURE MAP stage: the native HashedFeatures expression accumulates
    * the whole signed-count vector per row, so no shuffle and no
    * aggregation map ever sees corpus-sized data. (The first
    * formulation exploded tokens and re-aggregated
    * `groupBy(id, bucket)` — a ~235M-group hash aggregate at 5M docs;
    * this one is scan-shaped at any corpus size.) */
  def hashFeaturesSparse(df: DataFrame, textCol: String, idCol: String,
                         dim: Int = 64): DataFrame =
    df.select(col(idCol),
        explode(graft.plans.TextExpressions.hashedFeatures(
          TextFunctions.tokens(col(textCol)), dim)).as("f"))
      .select(col(idCol), col("f.bucket").as("bucket"), col("f.weight").as("weight"))

  /** Learned quality-filter margin: a fastText-style linear classifier
    * head over the hashed bag-of-words ([[graft.plans.TextExpressions
    * .LinearMargin]] — one fused md5+accumulate pass per row, no feature
    * array materialized). `weights` are integer (fixed-point) per-bucket
    * parameters — scale a trained float model to milli-units — so the
    * margin is an exact integer and the keep decision
    * (margin ≥ threshold) carries a full cross-engine oracle, unlike
    * any float-dot formulation. */
  def qualityMargin(text: Column, weights: Seq[Long], bias: Long): Column =
    graft.plans.TextExpressions.linearMargin(
      TextFunctions.tokens(text), weights, bias)

  /** Deterministic stand-in weights for the quality filter's fixtures
    * and oracle queries: w(b) = ((b·37 + 11) mod 21) − 10 — integers in
    * [−10, 10], expressible verbatim in the DuckDB oracle, playing the
    * role of a trained model's (scaled) parameters. */
  def fixtureWeights(dim: Int = 64): Seq[Long] =
    (0 until dim).map(b => ((b * 37 + 11) % 21 - 10).toLong)

  /** Dense hashed embedding as an `array<double>` column: the native
    * sparse accumulation (HashedFeatures) scattered into a dense
    * array, L2-normalized so downstream cosine operators (Similarity.*)
    * read it directly. All-zero vectors (empty docs, or exact sign
    * cancellation) come back as all-zero rather than NaN. Still a pure
    * projection (no shuffle); the residual HOF work is dim map-lookups
    * per row — the earlier formulation folded a zip_with over every
    * TOKEN interpreted (~dim·tokens ops per row) and was write-path-only. */
  def hashEmbedding(text: Column, dim: Int = 64): Column = {
    require(dim > 0 && dim <= 256, s"dim must be in 1..256, got $dim")
    let(map_from_entries(graft.plans.TextExpressions.hashedFeatures(
      TextFunctions.tokens(text), dim))) { m =>
      let(transform(sequence(lit(0), lit(dim - 1)),
        j => coalesce(element_at(m, j), lit(0L)).cast("double"))) { v =>
        let(sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))) { nrm =>
          when(nrm === 0.0, v).otherwise(transform(v, x => x / nrm))
        }
      }
    }
  }
}
