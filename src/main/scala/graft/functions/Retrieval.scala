package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopKAggregate

/** Sparse (inverted-index) retrieval over hashed bag-of-token features —
  * the text-side counterpart of the dense ANN family (reference analog:
  * none — its text columns stop at SQL LIKE filters,
  * `lambda/lambda_function.py:520-700`; this is the builder prompt's
  * similarity-search extension applied to sparse vectors).
  *
  * Scale design: the corpus postings table (one row per non-zero feature)
  * is the natural distributed inverted index — it never collects, never
  * re-shuffles on an id, and joins to the (small, broadcast) query
  * postings on the feature key alone. Scoring is a two-phase aggregate:
  * map-side partial sums of per-feature products, one exchange keyed on
  * (query_id, neighbor_id) — candidate-pair-sized, not corpus-sized —
  * then the per-query ranking is the same bounded top-k heap aggregate
  * the dense paths use (no corpus-sized window sort anywhere).
  *
  * Scores are integer dot products of signed counts (exact in a Double up
  * to 2^53), so the whole path — tokenize → hash → signed count → join →
  * dot → top-k — is pinned end-to-end by a DuckDB oracle from raw text
  * (`retrieve_sparse`).
  */
object Retrieval {

  /** Top-k corpus documents per query by sparse dot product.
    *
    * `corpus` and `queries` are sparse feature tables with columns
    * (idCol, bucketCol, weightCol) — e.g. `Featurize.hashFeaturesSparse`
    * output. `queries` must be small (its postings are broadcast).
    *
    * Join semantics: only (query, doc) pairs sharing ≥1 feature are
    * scored — a doc with no common feature is absent even if some scored
    * dot is negative (signed-count hashing admits negative weights).
    * That is the standard inverted-index retrieval contract: absence
    * means "no evidence", not "score 0".
    *
    * Returns (query_id, neighbor_id, dot, rank), rank 1..k per query,
    * ordered (dot desc, neighbor_id asc) — the same deterministic
    * tie-break contract as the dense similarity family. */
  def sparseDotTopK(corpus: DataFrame, corpusIdCol: String,
                    queries: DataFrame, queryIdCol: String,
                    bucketCol: String = "bucket", weightCol: String = "weight",
                    k: Int = 10): DataFrame = {
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"),
      col(bucketCol).as("bucket"), col(weightCol).cast("long").as("w_c"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(bucketCol).as("bucket"), col(weightCol).cast("long").as("w_q"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("w_c") * col("w_q")).as("dot"))
    scored
      .groupBy(col("query_id"))
      .agg(TopKAggregate.boundedTopK(
        col("neighbor_id"), col("dot").cast("double"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.neighbor_id").as("neighbor_id"),
        // integer dot rode the heap as an exact Double; surface it typed
        col("col.score").cast("long").as("dot"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
