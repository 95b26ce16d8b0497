package graft.store

import org.apache.spark.sql.DataFrame

/** Delta-chain versioning over a [[SnapshotStore]] table, shared by the
  * persistent indexes (VectorIndex's IVFPQ codes, DedupIndex's band keys).
  *
  * A chained table's version directory holds only that commit's DELTA
  * rows; the version's metadata records (under `partsKey`) the parent
  * version dirs whose union completes the table. N appends therefore cost
  * O(sum of batch sizes), not N full rewrites. Once the chain reaches
  * `compactEvery` members, the next append folds everything into a fresh
  * full snapshot (empty parts), bounding read fan-in; a chain-aware
  * vacuum then drops the dirs outside the live chain.
  *
  * Version dirs and their metadata are immutable once the LATEST pointer
  * has flipped, so resolving one version number and reading both its
  * chain and its data is a consistent lock-free read. Chain WRITES
  * (`next`) must run under the table lock (SnapshotStore.transactWith) —
  * a concurrent commit invalidates a chain read taken before locking.
  *
  * `canonCols` (when non-empty) projects EVERY chain member to those
  * columns before the union. This is how an index sheds a stored column
  * without orphaning old tables: members written by older code carry the
  * extra column (e.g. SimHashIndex's pre-r13 `bks`, DedupIndex's pre-r14
  * `bks`), members written after the slimming don't, and a strict
  * `unionByName` over the mixed chain would throw AnalysisException on
  * the FIRST post-upgrade append (old fat base + new slim delta). The
  * projection makes old- and new-format members union cleanly on reads,
  * appends and compactions — and a compaction then rewrites the table in
  * the slim canonical layout, completing the migration. */
private[store] final class DeltaChain(partsKey: String,
                                      canonCols: Seq[String] = Nil) {

  private def canon(df: DataFrame): DataFrame =
    if (canonCols.isEmpty) df
    else df.select(canonCols.map(org.apache.spark.sql.functions.col): _*)

  /** Version dirs whose rows make up table version `v`: the recorded
    * parent deltas/base, then v itself. Empty parts ⇒ v is a full
    * snapshot. */
  def chainOf(meta: Map[String, String], v: Long): Seq[Long] =
    meta.get(partsKey).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.toLong)).getOrElse(Seq.empty) :+ v

  /** The live table contents (delta-chain union) as of version `v`. */
  def load(store: SnapshotStore, table: String, v: Long,
           meta: Map[String, String]): DataFrame =
    chainOf(meta, v).map(m => canon(store.loadVersion(table, m)))
      .reduce(_ unionByName _)

  /** Zone-pruned chain read: each chain member version is pruned by its
    * OWN `_graft_zones` sidecar (immutable alongside its data), so a
    * selective predicate skips whole delta files before any footer is
    * opened. Members without a sidecar (pre-zone-map commits) fall back
    * to a full read of that member; the predicate is re-applied as an
    * ordinary filter either way, so results ≡ `load(...).filter(preds)`. */
  def loadPruned(store: SnapshotStore, table: String, v: Long,
                 meta: Map[String, String],
                 preds: Seq[ZoneMap.ZonePred],
                 keepFile: (String, Map[String, ZoneMap.Zone]) => Boolean =
                   ZoneMap.KeepAll): DataFrame =
    chainOf(meta, v)
      .map(m => canon(ZoneMap.prunedScanAt(store, table, m, preds, keepFile)))
      .reduce(_ unionByName _)

  /** Delta-or-compact decision for the next commit: below the threshold
    * the new version is `delta` alone (O(batch) write); at it, the chain
    * folds into a full snapshot (amortized O(corpus/compactEvery) per
    * append). Returns (rows to commit, metadata to commit). */
  /** `layout` re-establishes a physical layout (e.g. a range partition)
    * on COMPACTING commits only — chain unions interleave the members'
    * file layouts, so a fold is where clustering must be re-applied;
    * plain deltas pass through untouched (the producer laid them out). */
  def next(store: SnapshotStore, table: String, v: Long,
           meta: Map[String, String], delta: DataFrame,
           compactEvery: Int, extraMeta: Map[String, String],
           layout: DataFrame => DataFrame = identity)
      : (DataFrame, Map[String, String]) = {
    val chain = chainOf(meta, v)
    if (chain.length >= compactEvery)
      (layout(load(store, table, v, meta).unionByName(canon(delta))),
        extraMeta + (partsKey -> ""))
    else
      (canon(delta), extraMeta + (partsKey -> chain.mkString(",")))
  }

  /** On-demand fold of the whole chain into a full snapshot — the
    * maintenance-triggered form of the compactEvery path in [[next]]:
    * (rows, metadata) for the compacting commit, or None when version
    * `v` is already a full snapshot (chain length ≤ 1) and committing
    * would only rewrite identical data. Must run under the table lock
    * like every chain write. */
  def compactNow(store: SnapshotStore, table: String, v: Long,
                 meta: Map[String, String],
                 layout: DataFrame => DataFrame = identity)
      : Option[(DataFrame, Map[String, String])] =
    if (chainOf(meta, v).length <= 1) None
    else Some((layout(load(store, table, v, meta)), Map(partsKey -> "")))

  /** Version dirs referenced by the CURRENT version — everything a
    * chain-aware vacuum must keep. */
  def liveVersions(store: SnapshotStore, table: String): Set[Long] = {
    val v = store.currentVersion(table)
    chainOf(store.metaForVersion(table, v), v).toSet
  }
}
