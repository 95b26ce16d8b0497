package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Persistent fingerprint index — INCREMENTAL exact/reformatting dedup,
  * the cheap front half of dedup-on-ingest (run before the near-dup
  * band-key index: an exact duplicate never needs MinHash verification).
  *
  * One row per DISTINCT fingerprint, carrying the surviving document id:
  * {{{ (fp: long, id: long) }}}
  * where fp = [[TextFunctions.fingerprint]] (xxhash64 of the token
  * sequence — whitespace-insensitive, order-sensitive). The index IS the
  * deduplicated corpus keyed by content: its row count equals the number
  * of distinct texts ever ingested.
  *
  * Append semantics are FIRST-ARRIVAL keep: a batch document whose
  * fingerprint is already indexed is a duplicate of the indexed owner;
  * within a batch the min id per fingerprint survives. When batches
  * arrive in ascending-id order (the normal ingest pattern) this equals
  * the batch operator's global keep-min ([[graft.functions.Dedup
  * .fingerprintGroups]]) — FingerprintIndexSpec pins that equivalence,
  * and the `dedup_incr_fp_oracle` query pins it to DuckDB truth.
  *
  * Scale shape of one append (batch b against corpus N):
  *  - encode: one xxhash64 over the batch tokens — O(b), no corpus CPU;
  *  - collision probe: the batch's fingerprint set (distinct, b-sized)
  *    BROADCASTS into the index (fp, id) scan — index rows stream
  *    through the hash join, no corpus shuffle; only colliding rows
  *    (≤ b) come back;
  *  - commit: the batch's new-survivor rows as an O(b) [[DeltaChain]]
  *    delta, compacted every `compactEvery` appends, exactly-once via
  *    the shared batch-id watermark discipline.
  *  Honest floor: one columnar scan of the 16-byte index rows per
  *  append — the same amortize-by-batching price as [[DedupIndex]],
  *  ~50× cheaper per row because there are no band keys or shingle
  *  hashes to read.
  *
  * Contract: ids globally unique; fingerprint collisions of distinct
  * token sequences are the usual 2⁻⁶⁴ non-event (same caveat as
  * fingerprintGroups). */
object FingerprintIndex {

  private val P = "fpdedup." // metadata key prefix
  private val chain = new DeltaChain(s"${P}parts")

  private def encode(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))

  /** Commit `corpus` (deduplicated keep-min by fingerprint) as version 1
    * of a new index, or a chain-resetting rebuild. Use `corpus.limit(0)`
    * for an empty init when everything arrives via appends. */
  def build(store: SnapshotStore, table: String, corpus: DataFrame,
            textCol: String, idCol: String): Long = {
    val survivors = encode(corpus, textCol, idCol)
      .groupBy(col("fp")).agg(min(col("id")).as("id"))
    store.commit(table, survivors.select(col("fp"), col("id")),
      sortKey = Some("fp"), meta = Map(s"${P}parts" -> ""))
  }

  /** The live index (delta-chain union) as of the current version. */
  def load(store: SnapshotStore, table: String): DataFrame = {
    val v = store.currentVersion(table)
    chain.load(store, table, v, store.metaForVersion(table, v))
  }

  /** Dedup `batch` against the indexed corpus and itself, append the new
    * survivors, and return one row per batch document:
    * {{{ (id, keep_id, is_new) }}}
    * where keep_id is the surviving owner of the document's content
    * (itself iff is_new) — the lineage a curation pipeline records for
    * every dropped duplicate. EAGER: persisted + materialized before the
    * commit; unpersist when done. Exactly-once via (streamId, batchId):
    * a replayed batch returns None. */
  def appendBatchOnce(store: SnapshotStore, table: String, batch: DataFrame,
                      textCol: String, idCol: String,
                      streamId: String, batchId: Long,
                      compactEvery: Int = 8): Option[DataFrame] = {
    var result: Option[DataFrame] = None
    var enc: DataFrame = null
    store.transactWith[Unit](table, sortKey = Some("fp")) { _ =>
      val v = store.currentVersion(table)
      if (v == 0)
        throw new IllegalStateException(
          s"$table: build the fingerprint index before appending " +
            "(FingerprintIndex.build; corpus.limit(0) for an empty init)")
      val meta = store.metaForVersion(table, v)
      val key = s"stream.$streamId.lastBatchId"
      if (batchId <= meta.get(key).map(_.toLong).getOrElse(-1L)) Left(())
      else {
        enc = encode(batch, textCol, idCol)
          .persist(StorageLevel.MEMORY_AND_DISK) // batch-sized, read 3×
        // Batch-internal keep-min per fingerprint.
        val batchKeep = enc.groupBy(col("fp")).agg(min(col("id")).as("batch_keep"))
        // Collision probe: batch fp set broadcasts into the index scan —
        // the corpus side never shuffles; owners of already-seen content
        // (≤ batch-sized) come back.
        val owners = load(store, table)
          .join(broadcast(batchKeep.select(col("fp"))), Seq("fp"), "left_semi")
          .select(col("fp"), col("id").as("owner_id"))
        val resolved = enc
          .join(broadcast(batchKeep), Seq("fp"))
          .join(broadcast(owners), Seq("fp"), "left")
          .select(col("id"),
            coalesce(col("owner_id"), col("batch_keep")).as("keep_id"))
          .withColumn("is_new", col("id") === col("keep_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        resolved.count()
        result = Some(resolved)
        val newSurvivors = enc
          .join(resolved.filter(col("is_new")).select(col("id")), Seq("id"))
          .select(col("fp"), col("id"))
        Right(chain.next(store, table, v, meta, newSurvivors,
          compactEvery, Map(key -> batchId.toString)))
      }
    }
    // The commit (inside transactWith) consumed the encoding; the result
    // has its own cache and re-derives enc from `batch` on block loss.
    if (enc != null) enc.unpersist(blocking = false)
    result
  }

  /** Drop version dirs outside the live delta chain (see
    * VectorIndex.vacuumIndex). */
  def vacuumIndex(store: SnapshotStore, table: String): Unit =
    store.dropVersions(table,
      store.versions(table).toSet -- chain.liveVersions(store, table))
}
