package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the builder prompt:
  *  - `bruteForceTopK` — exact cosine top-k; the baseline. Cost O(N·Q):
  *    fine when the query set is small (it is broadcast; the corpus is
  *    scanned once, never shuffled).
  *  - `annTopK` — random-hyperplane LSH buckets; the 100 TB path. The
  *    corpus is bucketed ONCE (one codegen scan + shuffle on a short int
  *    key); each query probes only its own bucket ± multiprobe neighbors.
  *
  * All math is higher-order Column functions (`zip_with`/`aggregate`) —
  * codegen, no UDF, no MLlib dependency. Floats are widened to double
  * before multiply so accumulation is stable.
  */
object Similarity {

  /** Dot product of two equal-length float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact brute-force cosine top-k.
    *
    * `queries` must be small (it is broadcast): (queryIdCol, queryVecCol).
    * Returns (query_id, neighbor_id, sim, rank), rank 1..k per query,
    * ties broken by neighbor id for determinism.
    *
    * Plan: corpus scan → broadcast nested-loop join (no corpus shuffle) →
    * per-query top-k via window on the query-partitioned shuffle. The only
    * shuffled data is (query_id, id, sim) triples — 16 bytes/row·Q, not
    * the vectors. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, queryIdCol: String, queryVecCol: String,
                     k: Int = 10): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", cosine(col(vecCol), col(queryVecCol)))
      .select(col(queryIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Deterministic random hyperplanes (seeded), dim × nPlanes. */
  private[functions] def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bits of the vector against `nPlanes` hyperplanes,
    * packed into a long. Same planes ⇒ same bucketing for corpus and
    * queries. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 12, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, nPlanes, seed)
    val bits = planes.map { p =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) > 0, lit(1L)).otherwise(lit(0L))
    }
    bits.zipWithIndex.map { case (b, i) => b * lit(1L << i) }
      .reduce(_ + _)
  }

  /** Approximate top-k: probe the query's own bucket plus all buckets at
    * Hamming distance ≤ `multiprobe` (flipping low-index planes) — recall
    * knob without re-bucketing the corpus.
    *
    * Scale shape: corpus bucketed once (shuffle on 8-byte key); query side
    * explodes to (bucket, query) pairs and joins bucket-to-bucket. Each
    * task handles one bucket's candidates; skew bounded by bucket count
    * (2^nPlanes ≫ executors). */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, queryIdCol: String, queryVecCol: String,
              dim: Int, k: Int = 10, nPlanes: Int = 12,
              multiprobe: Int = 1, seed: Long = 42L): DataFrame = {
    val bucketed = corpus.withColumn("bucket",
      lshBucket(col(vecCol), dim, nPlanes, seed))

    val qBucket = queries.withColumn("bucket0",
      lshBucket(col(queryVecCol), dim, nPlanes, seed))
    // Multiprobe: the home bucket + single-bit flips of the first
    // `multiprobe * nPlanes`... keep it simple: flip each of the nPlanes
    // bits when multiprobe >= 1 (nPlanes+1 probes per query).
    val probes: Column =
      if (multiprobe <= 0) array(col("bucket0"))
      else array(col("bucket0") +:
        (0 until nPlanes).map(i => col("bucket0").bitwiseXOR(lit(1L << i))): _*)
    val qProbes = qBucket
      .withColumn("bucket", explode(probes))
      .select(col(queryIdCol).as("query_id"), col(queryVecCol).as("qvec"),
        col("bucket"))

    val scored = bucketed.join(qProbes, Seq("bucket"))
      .withColumn("sim", cosine(col(vecCol), col("qvec")))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("sim"))
      // a corpus vector can match several probes of one query
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Embedding-cosine near-duplicate pairs: multi-table hyperplane LSH.
    *
    * A single hash table of b bits catches a cos-θ pair with probability
    * (1-θ/π)^b — too low for anything but near-identical vectors. Like
    * MinHash banding, `nTables` independent tables OR-ed together lift
    * recall to 1-(1-p)^T (cos 0.95 with 8×8: ≈0.99) while keeping the
    * per-table bucket join small. The embedding analog of
    * Dedup.nearDuplicatePairs — no cross join at any scale; candidate
    * volume is bounded by bucket size caps per table. */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            nTables: Int = 8, bitsPerTable: Int = 8,
                            seed: Long = 42L,
                            maxBucketSize: Int = 2000): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val tableKeys = array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        lshBucket(col("v"), dim, bitsPerTable, seed + t * 7919).as("bucket"))
    }: _*)
    val bucketed = base
      .select(col("id"), col("v"), explode(tableKeys).as("tk"))
      .select(col("tk.table").as("table"), col("tk.bucket").as("bucket"),
        col("id"), col("v"))
    val counted = bucketed.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("table"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucketSize).drop("bucket_n")
    val a = counted.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = counted.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
