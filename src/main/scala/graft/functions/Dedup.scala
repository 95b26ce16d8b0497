package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora (builder prompt's
  * training-data-pipeline extension).
  *
  * Scale design: NOTHING here does an O(n²) cross join. Near-dup detection
  * is always candidate-generation (LSH bucketing: shuffle keyed on a short
  * bucket id) followed by exact verification restricted to candidate pairs.
  * That is the shape that survives 100 TB: the only all-to-all operation is
  * a hash-partitioned groupBy on bucket keys, and bucket skew is capped by
  * `maxBucketSize` (degenerate buckets — e.g. boilerplate-heavy shingles —
  * are dropped rather than allowed to produce quadratic pair blowup).
  */
object Dedup {

  // ---- exact -----------------------------------------------------------

  /** Exact dedup groups: one row per distinct text, with the surviving id
    * (min) and the duplicate count. A single hash-partitioned aggregate. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup: keep the min-id row per distinct text. Implemented as an
    * aggregate + self-semi-join on (hash, id) — no window over the full
    * corpus, so no single-key sort at scale. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol)
      .select(col("text_hash").as("keep_hash"), col("keep_id"))
    df.withColumn("graft_text_hash", md5(col(textCol)))
      .join(keep,
        col("graft_text_hash") === col("keep_hash") && col(idCol) === col("keep_id"),
        "left_semi")
      .drop("graft_text_hash")
  }

  /** Whitespace-insensitive exact dedup key (rolling token hash) — catches
    * reformatting-only duplicates. See TextFunctions.fingerprint. */
  def fingerprintGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---- shingling + MinHash + LSH --------------------------------------

  /** Word n-gram shingles of the token array (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash signature: k independent permutations simulated by seeded
    * xxhash64; each signature slot is the min hash over the shingle set.
    * Pure codegen (HOF transform + array_min), no UDF. */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingleArr, s => xxhash64(lit(seed), s)))
    }: _*)

  /** LSH banding: split a k-slot signature into `bands` bands of k/bands
    * rows; each band hashes to one bucket key. Two docs sharing ANY band
    * bucket become a candidate pair. (b=8, r=4 over k=32 → catches
    * Jaccard ≳ 0.6 with high probability.) */
  def lshBandKeys(sig: Column, k: Int = 32, bands: Int = 8): Column = {
    val r = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(sig, b * r + 1, r))).as("bucket"))
    }: _*)
  }

  /** Candidate pairs from MinHash-LSH banding, verified with exact n-gram
    * Jaccard over the shingle sets. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ `threshold`.
    *
    * Plan shape at scale: one scan computing signatures (codegen) →
    * explode to (band,bucket,id,shingles) → shuffle by bucket →
    * within-bucket self-join (bounded by maxBucketSize) → distinct pairs →
    * Jaccard verify. The shuffled payload carries the shingle arrays so
    * verification needs no second join back to the corpus. */
  def nearDuplicatePairs(df: DataFrame, textCol: String, idCol: String,
                         shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                         threshold: Double = 0.6,
                         maxBucketSize: Int = 1000): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
      .withColumn("bandkeys", lshBandKeys(minhashSignature(col("sh"), k), k, bands))

    val buckets = withSig
      .select(col("id"), col("sh"), explode(col("bandkeys")).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("sh"))

    // Cap degenerate buckets (boilerplate shingles) to avoid quadratic pairs.
    val counted = buckets.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")

    val a = counted.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = counted.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))

    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Near-dedup: drop every doc that near-duplicates a lower-id doc. */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                         threshold: Double = 0.6): DataFrame = {
    val dupIds = nearDuplicatePairs(df, textCol, idCol, threshold = threshold)
      .select(col("id_b").as("dup_id")).distinct()
    df.join(broadcast(dupIds), col(idCol) === col("dup_id"), "left_anti")
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash of the token multiset: per-token xxhash64 bit votes,
    * sign-packed. Pure HOF pipeline (aggregate + zip_with + transform) —
    * no UDF, stays in codegen. Near-dups have small Hamming distance. */
  def simhash64(text: Column): Column = {
    // Bit positions unrolled at plan-build time (Scala ints) — shiftright
    // needs a literal shift, and the unrolled form codegens flat.
    val votes = aggregate(
      TextFunctions.tokens(text),
      array(Seq.fill(64)(lit(0L)): _*),
      (acc, t) => zip_with(acc,
        array((0 until 64).map { i =>
          (shiftright(xxhash64(t), i).bitwiseAND(lit(1L)) * 2 - 1).cast("long")
        }: _*),
        (a, b) => a + b))
    // Pack sign bits without long overflow (ANSI mode): two 32-bit halves
    // folded with non-overflowing acc*2+bit, combined bitwise.
    val lo = aggregate(reverse(slice(votes, 1, 32)), lit(0L),
      (acc, v) => acc * 2 + when(v > 0, 1L).otherwise(0L))
    val hi = aggregate(reverse(slice(votes, 33, 32)), lit(0L),
      (acc, v) => acc * 2 + when(v > 0, 1L).otherwise(0L))
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit hash into four 16-bit keys
    * (pigeonhole: Hamming ≤ 3 ⇒ at least one band equal), bucket-join on
    * band equality, verify exact Hamming ≤ `maxHamming`. Same scale shape
    * as MinHash-LSH: shuffle on short keys, no cross join. */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3,
                          maxBucketSize: Int = 1000): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh64"))
    val banded = hashed.select(col("id"), col("sh64"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sh64"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
      }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("sh64"))

    val counted = banded.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")

    val a = counted.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh64").as("h_a"))
    val b = counted.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh64").as("h_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("h_a"), col("h_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
