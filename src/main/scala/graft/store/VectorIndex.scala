package graft.store

import org.apache.spark.sql.DataFrame

import graft.functions.Similarity

/** Persistent IVFPQ vector index over the snapshot store — build once,
  * query many.
  *
  * `sim_ivfpq_topk` retrains its quantizers and re-encodes the corpus on
  * every invocation; at corpus scale those are the expensive parts (one
  * full scan + a driver k-means), while a query batch only needs the
  * encoded lists. Persisting the encoded table turns every later batch
  * into probe-join-only work — the index amortization every production
  * ANN service relies on.
  *
  * Layout: the index is an ordinary store table of
  * (neighbor_id, list_id, codes), snapshot-versioned and sorted within
  * partitions by list_id (row-group stats prune probed lists the way
  * SORTKEY pruned point lookups). The trained parameters — IVF centroids
  * and PQ codebooks — ride in the snapshot METADATA, committed atomically
  * with the data, so an index version is self-contained: readers can never
  * pair new codes with old codebooks. Rebuilds are just new versions;
  * time travel and vacuum apply unchanged. */
object VectorIndex {

  private val P = "ivfpq." // metadata key prefix

  /** Train quantizers, encode the corpus, commit as the next version of
    * `indexTable`. Returns the committed version. */
  def build(store: SnapshotStore, indexTable: String, corpus: DataFrame,
            idCol: String, vecCol: String, dim: Int,
            nLists: Int = 64, m: Int = 16, kCodes: Int = 16,
            seed: Long = 42L): Long = {
    val centroids = Similarity.trainIvfCentroids(corpus, vecCol, nLists, seed)
    val codebooks = Similarity.trainPqCodebooks(corpus, vecCol, dim, m, kCodes, seed)
    val encoded = Similarity.ivfPqEncode(corpus, idCol, vecCol, centroids, codebooks)
    store.commit(indexTable, encoded, sortKey = Some("list_id"),
      meta = Map(
        s"${P}dim" -> dim.toString,
        s"${P}nLists" -> nLists.toString,
        s"${P}m" -> m.toString,
        s"${P}kCodes" -> kCodes.toString,
        s"${P}centroids" -> encodeMatrix(centroids),
        s"${P}codebooks" -> encodeCube(codebooks)))
  }

  /** Append new vectors to an existing index: encode them with the
    * CURRENT version's trained parameters (no retrain — centroids/codebooks
    * describe the space, not the rows) and commit corpus ∪ batch as the
    * next version. Parameters are read INSIDE the transaction, so a
    * concurrent rebuild cannot swap codebooks between encode and commit;
    * appends serialize under the table lock like every store mutation.
    * Retrain-by-rebuild (`build`) when the data distribution drifts — it
    * is just another version. */
  def append(store: SnapshotStore, indexTable: String, newVectors: DataFrame,
             idCol: String, vecCol: String): Long =
    store.transactEither[Unit](indexTable, sortKey = Some("list_id")) { cur =>
      val (centroids, codebooks, _) = readParams(store, indexTable)
      val encoded = Similarity.ivfPqEncode(
        newVectors, idCol, vecCol, centroids, codebooks)
      Right(cur.map(_.unionByName(encoded)).getOrElse(encoded))
    }.toOption.get

  /** Exactly-once streaming append: the same batch-id watermark discipline
    * as the catalog ingest (Mutations.appendBatchOnce) — the last applied
    * batchId rides in the snapshot metadata atomically with the data, so a
    * replayed micro-batch (foreachBatch is at-least-once on restart) is
    * skipped instead of double-appending its vectors. Returns true if
    * applied, false if skipped as a replay. */
  def appendBatchOnce(store: SnapshotStore, indexTable: String,
                      batch: DataFrame, idCol: String, vecCol: String,
                      streamId: String, batchId: Long): Boolean = {
    val metaKey = s"stream.$streamId.lastBatchId"
    store.transactEither[Unit](indexTable, sortKey = Some("list_id"),
      meta = Map(metaKey -> batchId.toString)) { cur =>
      val last = store.latestMeta(indexTable).get(metaKey)
        .map(_.toLong).getOrElse(-1L)
      if (batchId <= last) Left(())
      else {
        val (centroids, codebooks, _) = readParams(store, indexTable)
        val encoded = Similarity.ivfPqEncode(
          batch, idCol, vecCol, centroids, codebooks)
        Right(cur.map(_.unionByName(encoded)).getOrElse(encoded))
      }
    }.isRight
  }

  /** Keep an index current from a stream of vectors: each micro-batch
    * encodes with the live parameters and appends exactly once. Caller
    * stops the query. */
  def maintainFromStream(store: SnapshotStore, indexTable: String,
                         stream: DataFrame, idCol: String, vecCol: String,
                         checkpointDir: String,
                         streamId: String = "vector-inbox")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendBatchOnce(store, indexTable, batch, idCol, vecCol,
            streamId, batchId); ()
        }
      }
      .start()

  /** Top-k over the latest committed index version: probe + ADC only — no
    * training, no vector scan. */
  def query(store: SnapshotStore, indexTable: String, queries: DataFrame,
            queryIdCol: String, queryVecCol: String,
            k: Int = 10, nProbe: Int = 8): DataFrame = {
    val (centroids, codebooks, kCodes) = readParams(store, indexTable)
    Similarity.ivfPqScore(store.load(indexTable), queries,
      queryIdCol, queryVecCol, centroids, codebooks, k, nProbe, kCodes)
  }

  /** Trained parameters of the latest committed version:
    * (centroids, codebooks, kCodes). */
  private def readParams(store: SnapshotStore, indexTable: String)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]], Int) = {
    val meta = store.latestMeta(indexTable)
    def req(key: String): String = meta.getOrElse(P + key,
      throw new IllegalStateException(
        s"$indexTable has no committed IVFPQ metadata '$P$key'"))
    (decodeMatrix(req("centroids")), decodeCube(req("codebooks")),
      req("kCodes").toInt)
  }

  // ---- metadata (de)serialization: single-line, Double.toString
  // round-trips bit-exactly; ',' components / ';' vectors / '|' subspaces.
  private[graft] def encodeMatrix(mx: Seq[Seq[Double]]): String =
    mx.map(_.mkString(",")).mkString(";")
  private[graft] def decodeMatrix(s: String): Seq[Seq[Double]] =
    s.split(";", -1).toSeq.map(_.split(",", -1).toSeq.map(_.toDouble))
  private[graft] def encodeCube(cube: Seq[Seq[Seq[Double]]]): String =
    cube.map(encodeMatrix).mkString("|")
  private[graft] def decodeCube(s: String): Seq[Seq[Seq[Double]]] =
    s.split("\\|", -1).toSeq.map(decodeMatrix)
}
