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
    * next version. The store's metadata carry-forward keeps the params
    * attached; `transactEither` runs the read-union-commit under the
    * table lock, so concurrent appends serialize like every store
    * mutation. Retrain-by-rebuild (`build`) when the data distribution
    * drifts — it is just another version. */
  def append(store: SnapshotStore, indexTable: String, newVectors: DataFrame,
             idCol: String, vecCol: String): Long = {
    val meta = store.latestMeta(indexTable)
    def req(key: String): String = meta.getOrElse(P + key,
      throw new IllegalStateException(
        s"$indexTable has no committed IVFPQ metadata '$P$key'"))
    val centroids = decodeMatrix(req("centroids"))
    val codebooks = decodeCube(req("codebooks"))
    val encoded = Similarity.ivfPqEncode(
      newVectors, idCol, vecCol, centroids, codebooks)
    store.transactEither[Unit](indexTable, sortKey = Some("list_id")) {
      case Some(existing) => Right(existing.unionByName(encoded))
      case None => Right(encoded)
    }.toOption.get
  }

  /** Top-k over the latest committed index version: probe + ADC only — no
    * training, no vector scan. */
  def query(store: SnapshotStore, indexTable: String, queries: DataFrame,
            queryIdCol: String, queryVecCol: String,
            k: Int = 10, nProbe: Int = 8): DataFrame = {
    val meta = store.latestMeta(indexTable)
    def req(key: String): String = meta.getOrElse(P + key,
      throw new IllegalStateException(
        s"$indexTable has no committed IVFPQ metadata '$P$key'"))
    val centroids = decodeMatrix(req("centroids"))
    val codebooks = decodeCube(req("codebooks"))
    val kCodes = req("kCodes").toInt
    Similarity.ivfPqScore(store.load(indexTable), queries,
      queryIdCol, queryVecCol, centroids, codebooks, k, nProbe, kCodes)
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
