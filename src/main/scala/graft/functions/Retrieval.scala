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

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Okapi scorer
    * Lucene and every production text index default to).
    *
    *   score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
    *                 (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * `corpus` is (idCol, textCol); `queries` (queryIdCol, queryTextCol)
    * must be small — its TERM SET is broadcast, which is what keeps the
    * whole plan candidate-sized at any corpus scale:
    *  - the exploded corpus postings are semi-joined against the
    *    broadcast query terms BEFORE any aggregation, so tf counting,
    *    df counting, and scoring only ever touch rows for terms a query
    *    actually contains (|terms| · corpus-hit rows, not |vocab|);
    *  - doc length and N/avgdl are one map + one scalar aggregate over
    *    the corpus scan (no shuffle);
    *  - per-query ranking is the shared bounded top-k heap aggregate.
    * Tokens are case-folded (IR convention — unlike the hashing-trick
    * family, which matches its oracle's raw-token recipe).
    *
    * Scores are floats (ln), so no cross-engine oracle — the registered
    * query is rows-only; RetrievalSpec pins scores to an independent JVM
    * implementation of the same formula.
    *
    * Returns (query_id, neighbor_id, score, rank), rank 1..k,
    * (score desc, id asc). */
  def bm25TopK(corpus: DataFrame, corpusIdCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val docsTok = corpus.select(col(corpusIdCol).as("neighbor_id"),
      TF.tokens(lower(col(textCol))).as("toks"))

    // scalar corpus stats: one aggregate over the token-count projection
    val stats = docsTok.agg(
      count(lit(1)).as("n_docs"), avg(size(col("toks"))).as("avgdl")).collect()(0)
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)

    // distinct query terms, broadcast into the postings filter
    val qTerms = queries
      .select(explode(array_distinct(TF.tokens(lower(col(queryTextCol))))).as("term"))
      .distinct()

    // postings restricted to query terms, then tf per (doc, term) and
    // df per term — both candidate-sized aggregations
    val hits = docsTok
      .select(col("neighbor_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(qTerms), Seq("term"))
      .groupBy(col("term"), col("neighbor_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfPerTerm = hits.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))

    val perTerm = hits.join(broadcast(dfPerTerm), Seq("term"))
      .withColumn("idf", log(lit(1.0) +
        (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib", col("idf") * col("tf") * (k1 + 1) /
        (col("tf") + (col("dl") * (b / avgdl) + (1 - b)) * k1))

    // fan out per query: (query_id, its term multiset) — tf weighting of
    // repeated query terms is 1 per distinct term (standard BM25 query
    // side at these lengths)
    val qSide = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TF.tokens(lower(col(queryTextCol))))).as("term"))
    val scored = perTerm.join(broadcast(qSide), Seq("term"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("contrib")).as("score"))

    scored
      .groupBy(col("query_id"))
      .agg(TopKAggregate.boundedTopK(col("neighbor_id"), col("score"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.neighbor_id").as("neighbor_id"),
        round(col("col.score"), 6).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
