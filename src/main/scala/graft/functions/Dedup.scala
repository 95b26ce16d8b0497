package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ExprUtils.let

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
  def shingles(text: Column, n: Int = 3): Column =
    let(TextFunctions.tokens(text)) { tk =>
      // tk is a lambda VARIABLE: referencing it per shingle position costs
      // an array read, not a re-tokenization (see ExprUtils.let).
      array_distinct(
        when(size(tk) < n, array(concat_ws(" ", tk)))
          .otherwise(transform(
            sequence(lit(0), size(tk) - n),
            i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
    }

  /** MinHash signature: k independent permutations simulated by seeded
    * xxhash64; each signature slot is the min hash over the shingle set.
    * Pure codegen (HOF transform + array_min), no UDF. */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    let(shingleArr) { sh =>
      array((0 until k).map { seed =>
        array_min(transform(sh, s => xxhash64(lit(seed), s)))
      }: _*)
    }

  /** LSH banding: split a k-slot signature into `bands` bands of k/bands
    * rows; each band hashes to one bucket key. Two docs sharing ANY band
    * bucket become a candidate pair. (b=8, r=4 over k=32 → catches
    * Jaccard ≳ 0.6 with high probability.) */
  def lshBandKeys(sig: Column, k: Int = 32, bands: Int = 8): Column = {
    val r = k / bands
    let(sig) { s =>
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", slice(s, b * r + 1, r))).as("bucket"))
      }: _*)
    }
  }

  /** Candidate pairs from MinHash-LSH banding, verified with exact n-gram
    * Jaccard over the shingle sets. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ `threshold`.
    *
    * Plan shape at scale: one scan computing signatures (codegen) →
    * explode to (band,bucket,id) → shuffle by bucket → within-bucket
    * self-join (bounded by maxBucketSize) → distinct id pairs → join the
    * shingle sets back for Jaccard verify. Bucket rows carry ONLY keys and
    * ids: shuffling the shingle arrays through the pair join/dedup would
    * turn a key shuffle into a corpus-sized payload shuffle. */
  def nearDuplicatePairs(df: DataFrame, textCol: String, idCol: String,
                         shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                         threshold: Double = 0.6,
                         maxBucketSize: Int = 1000): DataFrame = {
    val buckets = df.select(
      col(idCol).as("id"),
      explode(lshBandKeys(
        minhashSignature(shingles(col(textCol), shingleN), k), k, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("id"))

    // Cap degenerate buckets (boilerplate shingles): aggregate bucket sizes
    // (keys only) and drop oversized buckets via broadcast anti-join — no
    // window over the full bucket table.
    val oversized = buckets.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select(col("band"), col("bucket"))
    // Materialize the (tiny: id + 2 keys) bucket table before self-joining.
    // Without this, the signature expression tree is duplicated into both
    // join sides and re-optimized/re-executed — measured as minutes of
    // Catalyst planning at 5k docs. The checkpoint also computes each
    // signature exactly once.
    val capped = buckets.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      .localCheckpoint()

    val candidates = capped.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(capped.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()

    // Verify: join the (small) candidate set back to the shingle sets.
    val sh = df.select(col(idCol).as("sid"),
      shingles(col(textCol), shingleN).as("sh"))
    candidates
      .join(sh.select(col("sid").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("sid").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
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
    * sign-packed — a native compiled expression (graft.plans.SimHash64);
    * the 64-wide HOF formulation evaluated interpreted per token per bit
    * and dominated the sf0.1 bench. Near-dups have small Hamming
    * distance. */
  def simhash64(text: Column): Column =
    graft.plans.VectorExpressions.simhash64(TextFunctions.tokens(text))

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

    // Oversized-bucket cap via key-only aggregate + broadcast anti-join
    // (no window over the full bucket table).
    val oversized = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select(col("band"), col("bucket"))
    val capped = banded.join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
      .localCheckpoint()  // see nearDuplicatePairs: avoid tree duplication

    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh64").as("h_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh64").as("h_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("h_a"), col("h_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
