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

  /** Train the linear quality filter IN-ENGINE: batch perceptron over
    * the hashed signed-count features, ALL-INTEGER end to end — margins
    * are exact integers ([[qualityMargin]]), the violator rule
    * `y·margin ≤ 0` is an integer comparison, and each iteration's
    * gradient `Σ_violators y·x_b` is a sum of longs, so the result is
    * bit-identical under ANY partitioning or execution order (no float
    * summation, no transcendentals — the reason perceptron was chosen
    * over logistic GD, whose sigmoid would put engine-specific `exp`
    * ulps inside a quantization and break the cross-engine oracle).
    *
    * The bias trains as a pseudo-feature (bucket −1, weight 1 on every
    * row), which folds the whole iteration into ONE aggregate job: scan
    * → filter violators by the previous round's margin (a pure map —
    * the fused LinearMargin expression with the current weights as
    * literals) → explode features ++ bias row → 65-group sum. `iters`
    * is a fixed count, not a convergence test — determinism again.
    *
    * Scale shape: per iteration one corpus scan (over the persisted
    * tokenized frame) and a dim+1-group aggregate whose map-side
    * partials reduce each slice to ≤ dim+1 rows — the shuffle carries
    * O(partitions·dim) regardless of corpus size. Training is the rare
    * operator that is driver-ITERATIVE by nature: k collect actions of
    * dim+1 longs each.
    *
    * `labelCol`: integer ±1. Returns (weights, bias) ready for
    * [[qualityMargin]]. */
  def trainPerceptron(df: DataFrame, textCol: String, labelCol: String,
                      dim: Int = 64, iters: Int = 3): (Seq[Long], Long) = {
    require(dim > 0 && dim <= 4096, s"dim must be in 1..4096, got $dim")
    require(iters > 0, s"iters must be positive, got $iters")
    import org.apache.spark.storage.StorageLevel
    val w = Array.fill(dim)(0L)
    var bias = 0L
    val feats = df.select(col(labelCol).cast("long").as("y"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val featsWithBias = concat(
        graft.plans.TextExpressions.hashedFeatures(col("toks"), dim),
        array(struct(lit(-1).as("bucket"), lit(1L).as("weight"))))
      for (_ <- 0 until iters) {
        val margin = graft.plans.TextExpressions.linearMargin(
          col("toks"), w.toSeq, bias)
        val grads = feats.filter(col("y") * margin <= 0L)
          .select(col("y"), explode(featsWithBias).as("f"))
          .groupBy(col("f.bucket").as("bucket"))
          .agg(sum(col("y") * col("f.weight")).as("g"))
          .collect()
        grads.foreach { r =>
          val b = r.getInt(0); val g = r.getLong(1)
          if (b < 0) bias += g else w(b) += g
        }
      }
      (w.toSeq, bias)
    } finally feats.unpersist(blocking = false)
  }

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
