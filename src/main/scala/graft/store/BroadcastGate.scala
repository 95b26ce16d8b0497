package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint for the incremental-index append paths.
  *
  * The append plans in [[FingerprintIndex]] / [[SimHashIndex]] /
  * [[DedupIndex]] force-broadcast the BATCH's key/bucket/id sets into the
  * corpus-side scans — correct and shuffle-free for the normal ingest
  * regime (batch ≪ corpus), but a forced hint is a driver-OOM hazard
  * when a caller replays a huge backfill through the batch path. Above
  * `limit` keys the hint is dropped and the join planner (AQE at
  * runtime) picks the side — a shuffle join on a backfill-sized batch is
  * the right plan anyway, since such a batch is itself corpus-scale.
  *
  * The default limit (10M keys ≈ 160 MB of (band,bucket)/fp rows) sits
  * well under the driver/executor broadcast budget while covering every
  * sane micro-batch; callers tune it per deployment.
  */
private[graft] object BroadcastGate {
  val DefaultKeyLimit: Long = 10000000L

  def apply(df: DataFrame, keyCount: Long, limit: Long): DataFrame =
    if (keyCount <= limit) broadcast(df) else df
}
