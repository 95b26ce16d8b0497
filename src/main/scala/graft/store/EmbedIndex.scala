package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Similarity

/** Persistent multi-table hyperplane-LSH index — INCREMENTAL
  * batch-vs-corpus near-dup dedup for the EMBEDDING-COSINE regime: the
  * third near-dup index alongside [[DedupIndex]] (MinHash/Jaccard) and
  * [[SimHashIndex]] (Hamming), completing the regime set with the one
  * that catches SEMANTIC duplicates no token-level hash can (same
  * content re-worded; the judge case for embedding-based dedup in a
  * training pipeline).
  *
  * One row per vector:
  * {{{ (id, uv: array<double>, bks: array<struct<table:int,bucket:long>>) }}}
  * `uv` is the L2-normalized (double-widened) vector and `bks` its
  * hyperplane bucket per hash table: table t's bucket is the sign
  * pattern of `bits` random-hyperplane projections (seed + t·7919 —
  * the same construction as `Similarity.embeddingNearDupPairs`). A
  * cos-θ pair collides in one table with probability (1−θ/π)^bits;
  * `nTables` OR-ed tables lift recall to 1−(1−p)^T (near-identical
  * pairs: ≈1 − 10⁻¹³ at 8×16 bits, and DETERMINISTIC for a fixed seed).
  * Unlike the pigeonhole combo keys of [[SimHashIndex]] this is
  * probabilistic-recall banding — the price of the continuous metric —
  * so the structural parameters (nTables, bits, seed, dim) AND the
  * verify threshold ride in the snapshot metadata, fixed at build time:
  * re-keying per append would silently break the shared-bucket
  * guarantee across generations, exactly the SimHashIndex argument.
  *
  * `bits` must be sized for the EXPECTED FINAL corpus
  * (ceil(log2(N·8/maxBucketSize)), clamped [8,24] — the
  * embeddingNearDupPairs auto-size formula): at 1M vectors an 8-bit
  * table averages ~4k members per bucket, every bucket trips the cap,
  * and recall silently collapses. Pass `expectedCorpus` accordingly.
  *
  * The verify payload (the unit vector, ~8·dim bytes) rides WITH the
  * key rows — same trade as SimHashIndex's hash-in-key: one append
  * costs one columnar scan of the index, a size-gated broadcast
  * bucket-set semi-join (no corpus shuffle), a capped window over the
  * touched-bucket membership, and in-bucket dot-product verification
  * (CosinePairs) — no second corpus scan. Appends are O(batch)
  * [[DeltaChain]] versions under the shared exactly-once batch-id
  * watermark.
  *
  * Incremental ≡ batch: bucket keys are a pure per-vector function of
  * committed parameters; an append sees the union membership of every
  * batch-touched bucket, and pairs between older vectors were emitted
  * by the append that introduced their younger member. Cap semantics
  * match the batch operator's while final bucket sizes stay under
  * maxBucketSize (same degenerate-regime caveat as the other indexes).
  * EmbedIndexSpec pins pair-for-pair equality with
  * `Similarity.embeddingNearDupPairs` across batchings. */
object EmbedIndex {

  private val P = "embdedup." // metadata key prefix
  private val chain = new DeltaChain(s"${P}parts")

  /** The embeddingNearDupPairs corpus-sizing formula, applied to the
    * EXPECTED corpus (an index must not re-key as it grows). */
  def autoBits(expectedCorpus: Long, maxBucketSize: Int): Int =
    math.min(24, math.max(8,
      math.ceil(math.log(math.max(1L, expectedCorpus) * 8.0 / maxBucketSize)
        / math.log(2)).toInt))

  private def encode(vecs: DataFrame, dim: Int, nTables: Int, bits: Int,
                     seed: Long): DataFrame = {
    val tableKeys = array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        Similarity.lshBucket(col("vec"), dim, bits, seed + t * 7919)
          .as("bucket"))
    }: _*)
    vecs.select(col("id"), Similarity.unitVector(col("vec")).as("uv"),
      tableKeys.as("bks"))
  }

  /** Encode `vecs` (id, vec) and commit as a fresh full snapshot with
    * every structural parameter in the metadata. Computes NO pairs (run
    * `Similarity.embeddingNearDupPairs` for the corpus-internal ones) —
    * or init empty with `vecs.limit(0)`. */
  def build(store: SnapshotStore, table: String, vecs: DataFrame, dim: Int,
            threshold: Double, nTables: Int = 8, expectedCorpus: Long = 5000000L,
            maxBucketSize: Int = 2000, seed: Long = 42L): Long = {
    val bits = autoBits(expectedCorpus, maxBucketSize)
    store.commit(table, encode(vecs, dim, nTables, bits, seed),
      sortKey = Some("id"),
      meta = Map(
        s"${P}dim" -> dim.toString,
        s"${P}threshold" -> threshold.toString,
        s"${P}nTables" -> nTables.toString,
        s"${P}bits" -> bits.toString,
        s"${P}seed" -> seed.toString,
        s"${P}maxBucketSize" -> maxBucketSize.toString,
        s"${P}parts" -> ""))
  }

  /** The live index contents as of the current version. */
  def load(store: SnapshotStore, table: String): DataFrame = {
    val v = store.currentVersion(table)
    chain.load(store, table, v, store.metaForVersion(table, v))
  }

  /** Dedup `batchVecs` (id, vec) against the indexed corpus AND itself
    * under the COMMITTED parameters, then append its encodings as an
    * O(batch) delta. Returns the new pairs — (id_a, id_b, cos ≥
    * committed threshold, rounded to 6 places like the batch operator)
    * with at least one member in the batch — EAGER (persisted +
    * materialized; unpersist when done), or None for a replayed
    * (streamId, batchId). Consume-before-vacuum contract as the other
    * indexes. */
  def appendBatchOnce(store: SnapshotStore, table: String,
                      batchVecs: DataFrame,
                      streamId: String, batchId: Long,
                      compactEvery: Int = 8,
                      broadcastKeyLimit: Long = BroadcastGate.DefaultKeyLimit,
                      batchCountHint: Option[Long] = None)
      : Option[DataFrame] = {
    var result: Option[DataFrame] = None
    var enc: DataFrame = null
    store.transactMeta[Unit](table, sortKey = Some("id")) {
      val v = store.currentVersion(table)
      if (v == 0)
        throw new IllegalStateException(
          s"$table: build the embedding index before appending " +
            "(EmbedIndex.build; vecs.limit(0) for an empty init)")
      val meta = store.metaForVersion(table, v)
      val key = s"stream.$streamId.lastBatchId"
      if (batchId <= meta.get(key).map(_.toLong).getOrElse(-1L)) Left(())
      else {
        def req(k: String): String = meta.getOrElse(P + k,
          throw new IllegalStateException(
            s"$table has no committed embed-index metadata '$P$k'"))
        val nTables = req("nTables").toInt
        enc = encode(batchVecs, req("dim").toInt, nTables,
          req("bits").toInt, req("seed").toLong)
          .persist(StorageLevel.MEMORY_AND_DISK) // batch-sized, read 3×
        // Gate sizing without a distinct() job: hint from the caller, or
        // a narrow count on the persisted encoding (warms the cache).
        val nBatch = batchCountHint.getOrElse(enc.count())
        result = Some(pairsVsIndex(
          chain.load(store, table, v, meta), enc, nBatch, nTables,
          req("threshold").toDouble, req("maxBucketSize").toInt,
          broadcastKeyLimit))
        Right(chain.next(store, table, v, meta, enc, compactEvery,
          Map(key -> batchId.toString)))
      }
    }
    if (enc != null) enc.unpersist(blocking = false)
    result
  }

  private def keysOf(e: DataFrame): DataFrame =
    e.select(col("id"), col("uv"), explode(col("bks")).as("bk"))
      .select(col("bk.table").as("table"), col("bk.bucket").as("bucket"),
        col("id"), col("uv"))

  /** Pairs of `batchEnc` against `idx` ∪ itself — the corpus enters
    * through a size-gated broadcast bucket filter; the unit vector rides
    * with the key rows, so verification (CosinePairs dot products)
    * happens in-bucket with no extra corpus scan. */
  private def pairsVsIndex(idx: DataFrame, batchEnc: DataFrame,
                           nBatch: Long, nTables: Int,
                           threshold: Double, maxBucketSize: Int,
                           broadcastKeyLimit: Long): DataFrame = {
    val bKeys = keysOf(batchEnc)
    // nBatch × nTables bounds the distinct bucket count (one key per
    // hash table per vector) — gate sized with zero driver actions.
    val bBuckets = bKeys.select(col("table"), col("bucket")).distinct()
    val cKeys = keysOf(idx)
      .join(BroadcastGate(bBuckets, nBatch * nTables, broadcastKeyLimit),
        Seq("table", "bucket"), "left_semi")
    pairsAmong(cKeys.unionByName(bKeys),
      batchEnc.select(col("id")), nBatch, threshold, maxBucketSize,
      broadcastKeyLimit)
  }

  /** READ-ONLY recovery twin of [[appendBatchOnce]]'s pair result (same
    * contract as SimHashIndex.pairsForCommitted: valid until a LATER
    * batch lands, which sequential-batchId streaming guarantees). */
  def pairsForCommitted(store: SnapshotStore, table: String, ids: DataFrame,
                        broadcastKeyLimit: Long = BroadcastGate.DefaultKeyLimit)
      : DataFrame = {
    val v = store.currentVersion(table)
    val meta = store.metaForVersion(table, v)
    val threshold = meta(s"${P}threshold").toDouble
    val maxBucketSize = meta(s"${P}maxBucketSize").toInt
    val nTables = meta(s"${P}nTables").toInt
    val idx = chain.load(store, table, v, meta)
    val idRows = ids.select(col("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nIds = idRows.count()
    val batchRows = idx.join(BroadcastGate(idRows, nIds, broadcastKeyLimit),
      Seq("id"), "left_semi")
    // nIds × nTables bounds the touched-bucket count — no second action.
    val bBuckets = keysOf(batchRows).select(col("table"), col("bucket"))
      .distinct()
    val allKeys = keysOf(idx)
      .join(BroadcastGate(bBuckets, nIds * nTables, broadcastKeyLimit),
        Seq("table", "bucket"), "left_semi")
    val out = pairsAmong(allKeys, idRows, nIds, threshold, maxBucketSize,
      broadcastKeyLimit)
    idRows.unpersist(blocking = false)
    out
  }

  /** In-bucket pair generation over the touched-bucket membership,
    * restricted to pairs touching `newIds` — identical skeleton to
    * SimHashIndex.pairsAmong with CosinePairs as the verifier. */
  private def pairsAmong(allKeys: DataFrame, newIds: DataFrame, nIds: Long,
                         threshold: Double, maxBucketSize: Int,
                         broadcastKeyLimit: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("table"), col("bucket")).orderBy(col("id"))
    val allPairs = allKeys
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxBucketSize + 1)
      .groupBy(col("table"), col("bucket"))
      .agg(collect_list(struct(col("id"), col("uv"))).as("members"))
      // size == maxBucketSize+1 marks a truncated degenerate bucket:
      // dropped whole, the batch operator's cap semantics
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(graft.plans.VectorExpressions
        .cosinePairs(col("members"), threshold)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), round(col("p.cos"), 6).as("cos"))
      .dropDuplicates("id_a", "id_b")

    // ONE shared broadcast for both membership probes.
    val verified = BroadcastGate
      .restrictToTouching(allPairs, newIds.select(col("id")), nIds,
        broadcastKeyLimit)
      .select(col("id_a"), col("id_b"), col("cos"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    verified.count()
    verified
  }

  /** Keep the index current from a stream of (id, vec) rows — the
    * SimHashIndex.maintainFromStream contract verbatim. */
  def maintainFromStream(store: SnapshotStore, table: String,
                         stream: DataFrame, checkpointDir: String,
                         streamId: String = "emb-inbox",
                         onPairs: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendBatchOnce(store, table, batch, streamId, batchId).foreach { pairs =>
            try onPairs(pairs, batchId)
            finally pairs.unpersist(blocking = false)
          }
        }
      }
      .start()

  /** On-demand chain fold into a full snapshot (maintenance-triggered;
    * appends also fold themselves every `compactEvery`). Returns true if
    * a compacting commit happened, false if already compact — IDEMPOTENT,
    * and the commit is the store's atomic version flip, so a crash
    * mid-compaction leaves the old chain fully live. */
  def compactIndex(store: SnapshotStore, table: String): Boolean =
    store.transactMeta[Unit](table, sortKey = Some("id")) {
      val v = store.currentVersion(table)
      if (v == 0) Left(())
      else chain.compactNow(store, table, v, store.metaForVersion(table, v))
        .toRight(())
    }.isRight

  /** Drop version dirs outside the live delta chain. */
  def vacuumIndex(store: SnapshotStore, table: String): Unit =
    store.dropVersions(table,
      store.versions(table).toSet -- chain.liveVersions(store, table))
}
