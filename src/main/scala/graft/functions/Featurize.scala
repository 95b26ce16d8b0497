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

  /** Hash bucket in [0, dim) for one token column (dim ≤ 256: two md5
    * nibbles = 8 bits of keyspace; plenty for the embedding widths the
    * ANN family uses and keeps the oracle SQL finite). */
  private def bucketOf(h: Column, dim: Int): Column = {
    require(dim > 0 && dim <= 256, s"dim must be in 1..256, got $dim")
    pmod(conv(h.substr(1, 1), 16, 10).cast("int") * 16 +
      conv(h.substr(2, 1), 16, 10).cast("int"), lit(dim))
  }

  private def signOf(h: Column): Column =
    when(pmod(conv(h.substr(3, 1), 16, 10).cast("int"), lit(2)) === 1,
      lit(1L)).otherwise(lit(-1L))

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

  /** Dense hashed embedding as an `array<double>` column: the same
    * signed-count recipe accumulated per row (no shuffle — the whole
    * featurization is a projection), L2-normalized so downstream cosine
    * operators (Similarity.*) read it directly. All-zero vectors (empty
    * docs, or exact sign cancellation) come back as all-zero rather than
    * NaN. HOF lambdas evaluate interpreted — fine for the featurize-once
    * write path this feeds; the hot read path consumes the materialized
    * vectors, not this expression. */
  def hashEmbedding(text: Column, dim: Int = 64): Column = {
    require(dim > 0 && dim <= 256, s"dim must be in 1..256, got $dim")
    let(aggregate(TextFunctions.tokens(text),
      array_repeat(lit(0.0), dim),
      (acc, t) => let(md5(t)) { h =>
        let(bucketOf(h, dim))(b =>
          let(signOf(h).cast("double")) { s =>
            zip_with(acc, sequence(lit(0), lit(dim - 1)),
              (a, j) => when(j === b, a + s).otherwise(a))
          })
      })) { v =>
      let(sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))) { nrm =>
        when(nrm === 0.0, v).otherwise(transform(v, x => x / nrm))
      }
    }
  }
}
