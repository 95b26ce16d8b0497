package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{Retrieval, TextFunctions}

/** Persistent BM25 text-retrieval index over the snapshot store — build
  * once, query many, append in O(batch). The text-side sibling of
  * [[VectorIndex]] (reference analog: none — its text columns stop at
  * SQL LIKE filters, `lambda/lambda_function.py:520-700`).
  *
  * `Retrieval.bm25TopK` re-tokenizes the corpus on every invocation; at
  * corpus scale that tokenize+explode scan IS the cost (172 s of 177 s
  * in the 5M-doc flagship sweep), while a query batch only needs the
  * postings rows for its own terms. Persisting the postings turns every
  * later query batch into probe-only work — the inverted-index
  * amortization every production text engine (Lucene et al.) relies on.
  *
  * Layout: an ordinary store table of
  * {{{ (term: string, neighbor_id, dl: int, tf: long) }}}
  * — one row per (term, containing doc): term frequency and the doc's
  * token length. Committed sorted within partitions by `term`, so a
  * query-term probe prunes row groups through parquet min/max stats the
  * way SORTKEY pruned point lookups. The corpus-level BM25 statistics —
  * doc count and total token count (avgdl's exact numerator) — ride in
  * the snapshot METADATA, committed atomically with the postings, so an
  * index version is self-contained: readers resolve ONE version and take
  * postings + stats from it, and appended rows can never pair with stale
  * stats. df (docs-per-term) is deliberately NOT stored: scoring only
  * needs df for the query's own terms, and counting it from the probed
  * hit rows is a candidate-sized aggregate on data the query already
  * read — a stored df table would add a per-append vocabulary merge for
  * nothing.
  *
  * Appends are [[DeltaChain]] delta versions (O(batch) write, compacted
  * every `compactEvery`); the metadata stats accumulate exactly
  * (integer adds). One blocking action per append (the batch stats
  * aggregate — it must be exact, it changes scores) + the commit write,
  * the same job budget as the dedup indexes (AppendJobCountSpec).
  *
  * Contract: ids globally unique across build+appends (the curation
  * pipeline's exactly-once ingest provides this) — re-appending an id
  * double-counts its terms. Common-term probes read that term's full
  * postings list (BM25's idf makes them rank-irrelevant but not
  * read-free); block-max/impact-sorted pruning is the engine answer at
  * web scale and out of scope here. */
object TextIndex {

  private val P = "text." // metadata key prefix
  private val chain = new DeltaChain(s"${P}parts")

  /** Tokenization contract tag: case-folded whitespace tokens
    * (`TextFunctions.tokens(lower(text))` — the exact recipe
    * `Retrieval.bm25TopK` uses). An index built under a different recipe
    * cannot be queried by this code: term strings would not line up and
    * every score would be silently wrong, so mismatches refuse. */
  private val Tokenizer = "ws-lower"

  private def requireTokenizer(meta: Map[String, String], table: String): Unit = {
    val found = meta.getOrElse(s"${P}tokenizer", "unknown")
    if (found != Tokenizer)
      throw new IllegalStateException(
        s"$table was tokenized with scheme '$found' but this library " +
          s"queries '$Tokenizer' postings — rebuild the index (TextIndex.build)")
  }

  /** (id, toks) — the shared tokenization. */
  private def tokenized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("neighbor_id"),
      TextFunctions.tokens(lower(col(textCol))).as("toks"))

  /** Postings rows of a tokenized batch: explode → per-(term, doc) count.
    * Empty-token docs contribute no postings (no terms — correct: they
    * can never match) but DO count in the metadata stats.
    *
    * The explode output is RANGE-partitioned on (term, neighbor_id)
    * before the aggregation: range partitioning on a subset of the
    * grouping keys satisfies the aggregate's clustering requirement, so
    * the groupBy reuses the range exchange (ONE shuffle either way —
    * TextIndexSpec pins the exchange count) and the committed files end
    * up owning disjoint term ranges. That file layout is what makes the
    * per-file term zones ([[ZoneMap]], harvested at commit) selective:
    * hash-partitioned files would each span the whole vocabulary and a
    * term probe could never skip one. */
  private def postingsOf(tok: DataFrame): DataFrame =
    tok.select(col("neighbor_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .repartitionByRange(col("term"), col("neighbor_id"))
      .groupBy(col("term"), col("neighbor_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Term-range layout for compaction folds (chain unions lose the
    * per-version range layout; re-establish it when folding). */
  private val termLayout: DataFrame => DataFrame =
    _.repartitionByRange(col("term"), col("neighbor_id"))

  /** (nDocs, sumDl) of a tokenized frame — ONE aggregate action. */
  private def statsOf(tok: DataFrame): (Long, Long) = {
    val r = tok.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("sdl")).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Tokenize + index `corpus`, commit as the next version of
    * `indexTable` (a full snapshot — empty delta chain). Returns the
    * committed version. Use `corpus.limit(0)` for an empty init when
    * everything arrives via appends.
    *
    * `corpusTag` (optional): content-version identifier of the build
    * corpus, rides in the metadata atomically with the postings and
    * survives appends — same drift-detection contract as
    * [[VectorIndex.build]]. */
  def build(store: SnapshotStore, indexTable: String, corpus: DataFrame,
            textCol: String, idCol: String,
            corpusTag: Option[String] = None): Long = {
    val tok = tokenized(corpus, textCol, idCol)
      .persist(StorageLevel.MEMORY_AND_DISK) // read 2×: stats + postings
    try {
      val (nDocs, sumDl) = statsOf(tok)
      store.commit(indexTable, postingsOf(tok), sortKey = Some("term"),
        statsCols = Seq("term"),
        meta = Map(
          s"${P}parts" -> "",
          s"${P}tokenizer" -> Tokenizer,
          s"${P}nDocs" -> nDocs.toString,
          s"${P}sumDl" -> sumDl.toString)
          ++ corpusTag.map(t => s"${P}corpusTag" -> t))
    } finally tok.unpersist(blocking = false)
  }

  /** The corpus content tag recorded at build (None if none given). */
  def corpusTagOf(store: SnapshotStore, indexTable: String): Option[String] =
    store.metaForVersion(indexTable, store.currentVersion(indexTable))
      .get(s"${P}corpusTag")

  /** The live postings (delta-chain union) as of the current version. */
  def load(store: SnapshotStore, indexTable: String): DataFrame = {
    val v = store.currentVersion(indexTable)
    chain.load(store, indexTable, v, store.metaForVersion(indexTable, v))
  }

  /** Corpus-level BM25 statistics of the current version:
    * (nDocs, avgdl). Metadata reads only — zero jobs. */
  def stats(store: SnapshotStore, indexTable: String): (Long, Double) = {
    val meta = store.metaForVersion(indexTable, store.currentVersion(indexTable))
    val n = meta.getOrElse(s"${P}nDocs", "0").toLong
    val sdl = meta.getOrElse(s"${P}sumDl", "0").toLong
    (n, if (n == 0) 0.0 else sdl.toDouble / n)
  }

  /** Append new documents: tokenize the batch, commit ONLY its postings
    * as a delta version, and fold the batch's (docs, tokens) into the
    * metadata stats — read and accumulated INSIDE the transaction, so
    * concurrent appends serialize under the table lock and the stats
    * can never drop a batch. Every `compactEvery` chain members the
    * append folds the chain into a full snapshot instead. */
  def append(store: SnapshotStore, indexTable: String, newDocs: DataFrame,
             textCol: String, idCol: String, compactEvery: Int = 8): Long = {
    var tok: DataFrame = null
    try {
      store.transactMeta[Nothing](indexTable, sortKey = Some("term"),
          statsCols = Seq("term")) {
        val v = store.currentVersion(indexTable)
        requireBuilt(v, indexTable)
        val meta = store.metaForVersion(indexTable, v)
        requireTokenizer(meta, indexTable)
        tok = tokenized(newDocs, textCol, idCol)
          .persist(StorageLevel.MEMORY_AND_DISK)
        Right(deltaFor(store, indexTable, v, meta, tok, compactEvery, Map.empty))
      }.merge
    } finally if (tok != null) tok.unpersist(blocking = false)
  }

  /** Exactly-once streaming append — the shared batch-id watermark
    * discipline (see VectorIndex.appendBatchOnce): a replayed
    * micro-batch is skipped instead of double-counting its terms.
    * Returns true if applied, false if skipped as a replay. */
  def appendBatchOnce(store: SnapshotStore, indexTable: String,
                      batch: DataFrame, textCol: String, idCol: String,
                      streamId: String, batchId: Long,
                      compactEvery: Int = 8): Boolean = {
    val metaKey = s"stream.$streamId.lastBatchId"
    var tok: DataFrame = null
    try {
      store.transactMeta[Unit](indexTable, sortKey = Some("term"),
          statsCols = Seq("term")) {
        val v = store.currentVersion(indexTable)
        requireBuilt(v, indexTable)
        val meta = store.metaForVersion(indexTable, v)
        val last = meta.get(metaKey).map(_.toLong).getOrElse(-1L)
        if (batchId <= last) Left(())
        else {
          requireTokenizer(meta, indexTable)
          tok = tokenized(batch, textCol, idCol)
            .persist(StorageLevel.MEMORY_AND_DISK)
          Right(deltaFor(store, indexTable, v, meta, tok, compactEvery,
            Map(metaKey -> batchId.toString)))
        }
      }.isRight
    } finally if (tok != null) tok.unpersist(blocking = false)
  }

  /** Keep the index current from a document stream (see
    * VectorIndex.maintainFromStream). Caller stops the query. */
  def maintainFromStream(store: SnapshotStore, indexTable: String,
                         stream: DataFrame, textCol: String, idCol: String,
                         checkpointDir: String,
                         streamId: String = "text-inbox")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendBatchOnce(store, indexTable, batch, textCol, idCol,
            streamId, batchId); ()
        }
      }
      .start()

  private def requireBuilt(v: Long, table: String): Unit =
    if (v == 0)
      throw new IllegalStateException(
        s"$table: build the text index before appending/querying " +
          "(TextIndex.build; corpus.limit(0) for an empty init)")

  /** Delta rows + accumulated stats for one append — shared by append
    * and appendBatchOnce. Runs inside the table transaction. */
  private def deltaFor(store: SnapshotStore, table: String, v: Long,
                       meta: Map[String, String], tok: DataFrame,
                       compactEvery: Int, extraMeta: Map[String, String])
      : (DataFrame, Map[String, String]) = {
    val (bDocs, bDl) = statsOf(tok) // the one blocking action per append
    val nDocs = meta.getOrElse(s"${P}nDocs", "0").toLong + bDocs
    val sumDl = meta.getOrElse(s"${P}sumDl", "0").toLong + bDl
    chain.next(store, table, v, meta, postingsOf(tok), compactEvery,
      extraMeta ++ Map(
        s"${P}nDocs" -> nDocs.toString,
        s"${P}sumDl" -> sumDl.toString), layout = termLayout)
  }

  /** BM25 top-k over the latest committed index version: term probe +
    * candidate-sized scoring only — no corpus tokenization.
    *
    * The version is resolved ONCE and postings + stats both come from it
    * (two independent "latest" reads could straddle a concurrent append
    * and score new postings against old avgdl). `queries` must be small
    * (its term set is collected AND broadcast): the collected term list
    * becomes an `IN` predicate that pushes down to the parquet postings
    * scan, where the term sort order turns row-group min/max stats into
    * real pruning — the broadcast-join form would filter post-scan.
    *
    * Ranking parity: feeds the probed postings into the same
    * `Retrieval.bm25Score` tail as the scan path over the same exact
    * stats (sumDl/nDocs ≡ avg over int sizes — both exact in a Double),
    * so indexed ≡ unindexed score-for-score, not just rank-for-rank
    * (RetrievalSpec pins exact equality; `retrieve_bm25_indexed` pins
    * the ranking to DuckDB truth).
    *
    * Returns (query_id, neighbor_id, score, rank), rank 1..k,
    * (score desc, id asc). */
  def query(store: SnapshotStore, indexTable: String, queries: DataFrame,
            queryIdCol: String, queryTextCol: String,
            k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val v = store.currentVersion(indexTable)
    requireBuilt(v, indexTable)
    val meta = store.metaForVersion(indexTable, v)
    requireTokenizer(meta, indexTable)
    val nDocs = meta.getOrElse(s"${P}nDocs", "0").toLong
    val sumDl = meta.getOrElse(s"${P}sumDl", "0").toLong
    val avgdl = if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs
    val qIdType = queries.schema(queryIdCol).dataType
    val postings = chain.load(store, indexTable, v, meta)
    if (nDocs == 0L || avgdl <= 0.0)
      // empty index (or all-empty docs): nothing can match
      return Retrieval.emptyRanked(queries.sparkSession, qIdType,
        postings.schema("neighbor_id").dataType)
    val terms = queries
      .select(explode(array_distinct(TF.tokens(lower(col(queryTextCol))))).as("term"))
      .distinct().collect().map(_.getString(0)).toSeq
    if (terms.isEmpty)
      return Retrieval.emptyRanked(queries.sparkSession, qIdType,
        postings.schema("neighbor_id").dataType)
    // Two pruning layers share the term probe: the zone map drops whole
    // chain files whose [min,max] term range misses every query term
    // (term-sorted layout → tight zones; no footer is even opened), and
    // the residual isin prunes row groups inside the survivors. Results
    // ≡ the plain isin over the full chain (DeltaChain.loadPruned
    // contract); RetrievalSpec pins indexed ≡ scan score-for-score.
    val hits = chain.loadPruned(store, indexTable, v, meta,
      Seq(ZoneMap.stringIn("term", terms)))
    Retrieval.bm25Score(hits, queries, queryIdCol, queryTextCol,
      nDocs, avgdl, k, k1, b)
  }

  /** On-demand chain fold into a full snapshot (maintenance-triggered;
    * appends also fold themselves every `compactEvery`). Returns true if
    * a compacting commit happened, false if already compact — IDEMPOTENT,
    * and the commit is the store's atomic version flip, so a crash
    * mid-compaction leaves the old chain fully live. */
  def compactIndex(store: SnapshotStore, indexTable: String): Boolean =
    store.transactMeta[Unit](indexTable, sortKey = Some("term"),
          statsCols = Seq("term")) {
      val v = store.currentVersion(indexTable)
      if (v == 0) Left(())
      else chain.compactNow(store, indexTable, v,
        store.metaForVersion(indexTable, v), layout = termLayout).toRight(())
    }.isRight

  /** Drop version dirs outside the live delta chain (see
    * VectorIndex.vacuumIndex). */
  def vacuumIndex(store: SnapshotStore, indexTable: String): Unit =
    store.dropVersions(indexTable,
      store.versions(indexTable).toSet -- chain.liveVersions(store, indexTable))
}
