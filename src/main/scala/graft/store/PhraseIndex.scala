package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Persistent POSITIONAL postings index — exact phrase (and, by
  * extension, proximity) retrieval over the corpus, the capability a
  * term-frequency index ([[TextIndex]]) cannot express: BM25 ranks
  * "machine learning" and "learning machine(s)" identically, a phrase
  * query must not. Kept deliberately SEPARATE from the BM25 postings
  * table: positions roughly double a postings index at rest, most
  * corpora never pay for them, and isolating the layout means zero
  * churn in TextIndex's champion/MaxScore machinery (reference analog:
  * none — this is extension surface; construction follows the standard
  * positional inverted index, e.g. Manning et al., IIR §2.4).
  *
  * Layout: one row per (term, document):
  * {{{ (term: string, doc_id: long, posns: array<int>) }}}
  * `posns` = the 0-based token positions of `term` in the document,
  * sorted ascending, under the library-wide tokenization contract
  * (`TextFunctions.tokens(lower(text))` — recorded in the metadata like
  * TextIndex's tag, and queries tokenize their phrases with the same
  * expression, so index and query can never disagree on boundaries).
  * Rows are committed sorted by `term`: a query's pushed `term IN (…)`
  * filter prunes row groups exactly like TextIndex's term-sorted
  * postings.
  *
  * One query batch (Q phrases, k terms each) costs: one phrase
  * tokenization of the Q-row frame, ONE bounded driver action
  * collecting the ≤ Q·k distinct phrase terms (the documented
  * small-query-batch contract shared with TextIndex.queryMaxScore) for
  * the pushed scan filter, a broadcast join of the (query, slot, term)
  * rows into the pruned postings scan, and one hash exchange grouping
  * the ≤ Q·k surviving rows per (query, doc) where
  * [[graft.plans.PhraseTf]] verifies position adjacency in-expression
  * (binary-search probes of the slot position lists). The corpus never
  * shuffles; only postings of the phrases' terms leave the scan.
  *
  * Appends are O(batch) [[DeltaChain]] deltas under the shared
  * exactly-once (streamId, batchId) watermark; positions are per-doc
  * facts (no cross-batch resolution), so the append is the simplest of
  * the index family — encode and chain. [[Graft.maintainAll]] folds and
  * vacuums it via the `phrase.parts` marker. Unique-doc-id contract as
  * every index: re-ingesting a doc id yields duplicate (term, doc) rows
  * and phrase_tf degrades to 0 for affected docs (PhraseTf rejects
  * duplicate slots) rather than silently double-counting. */
object PhraseIndex {

  private val P = "phrase." // metadata key prefix
  private val Tokenizer = "ws-lower-v1" // TextIndex's contract tag
  private val chain = new DeltaChain(s"${P}parts",
    Seq("term", "doc_id", "posns", "dl"))

  /** Positional rows of a document frame: term → sorted 0-based token
    * positions, one row per (term, doc), with the document length
    * (total token count — constant per doc, carried per row exactly
    * like TextIndex's postings) so ranked queries score without a
    * corpus join. */
  private def encode(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("posns"),
        max(col("dl")).as("dl"))

  /** (nDocs, sumDl) of a document frame — ONE aggregate action, the
    * TextIndex stats recipe (avgdl's exact numerator rides in the
    * metadata and ACCUMULATES across appends). */
  private def statsOf(docs: DataFrame, textCol: String): (Long, Long) = {
    val r = docs.select(
        TextFunctions.tokenCount(lower(col(textCol))).as("dl"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Encode `docs` and commit as a fresh full snapshot (or a
    * chain-resetting rebuild); `docs.limit(0)` for an empty init. */
  def build(store: SnapshotStore, table: String, docs: DataFrame,
            textCol: String, idCol: String): Long = {
    val (nDocs, sumDl) = statsOf(docs, textCol)
    store.commit(table, encode(docs, textCol, idCol),
      sortKey = Some("term"),
      meta = Map(
        s"${P}tokenizer" -> Tokenizer,
        s"${P}nDocs" -> nDocs.toString,
        s"${P}sumDl" -> sumDl.toString,
        s"${P}parts" -> ""))
  }

  /** The live index contents (delta-chain union) as of the current
    * version. */
  def load(store: SnapshotStore, table: String): DataFrame = {
    val v = store.currentVersion(table)
    chain.load(store, table, v, store.metaForVersion(table, v))
  }

  /** Append `docs` as an O(batch) delta — exactly-once via
    * (streamId, batchId); a replayed batch returns false. */
  def appendBatchOnce(store: SnapshotStore, table: String, docs: DataFrame,
                      textCol: String, idCol: String,
                      streamId: String, batchId: Long,
                      compactEvery: Int = 8): Boolean =
    store.transactMeta[Unit](table, sortKey = Some("term")) {
      val v = store.currentVersion(table)
      if (v == 0)
        throw new IllegalStateException(
          s"$table: build the phrase index before appending " +
            "(PhraseIndex.build; docs.limit(0) for an empty init)")
      val meta = store.metaForVersion(table, v)
      val found = meta.getOrElse(s"${P}tokenizer", "unknown")
      if (found != Tokenizer)
        throw new IllegalStateException(
          s"$table was tokenized with scheme '$found', this library writes " +
            s"'$Tokenizer' — rebuild the index")
      val key = s"stream.$streamId.lastBatchId"
      if (batchId <= meta.get(key).map(_.toLong).getOrElse(-1L)) Left(())
      else {
        val (bDocs, bDl) = statsOf(docs, textCol)
        Right(chain.next(store, table, v, meta,
          encode(docs, textCol, idCol), compactEvery,
          Map(key -> batchId.toString,
            s"${P}nDocs" -> (meta.getOrElse(s"${P}nDocs", "0").toLong + bDocs).toString,
            s"${P}sumDl" -> (meta.getOrElse(s"${P}sumDl", "0").toLong + bDl).toString)))
      }
    }.isRight

  /** Phrase matches of a query batch against the indexed corpus:
    * one row per (query, matching document) —
    * {{{ (query_id, doc_id, phrase_tf) }}}
    * with phrase_tf ≥ 1 the number of occurrences (overlapping
    * occurrences count — "a b a" occurs twice in "a b a b a").
    * `slop` = 0 (default) is the EXACT phrase; slop s is ordered
    * proximity — each phrase term within s extra tokens after the
    * previous match ("new york" slop 1 matches "new in york"), the
    * [[graft.plans.PhraseTf]] chain contract. Phrases tokenize under
    * the committed contract; an empty phrase (whitespace-only) matches
    * nothing. Plan shape in the class scaladoc; `phrases` is a SMALL
    * batch (the bounded driver action collects its distinct terms). */
  def phraseQuery(store: SnapshotStore, table: String, phrases: DataFrame,
                  queryIdCol: String, phraseCol: String,
                  slop: Int = 0): DataFrame = {
    val v = store.currentVersion(table)
    require(v > 0, s"$table: no committed phrase index")
    val meta = store.metaForVersion(table, v)
    val found = meta.getOrElse(s"${P}tokenizer", "unknown")
    require(found == Tokenizer,
      s"$table carries tokenizer '$found', queries use '$Tokenizer'")
    // (query, slot, term) rows — one per phrase token, slot = position
    // IN THE PHRASE; duplicate phrase terms keep distinct slots, which
    // is what makes repeated-term phrases verify correctly
    val slots = phrases.select(col(queryIdCol).as("query_id"),
        posexplode(TextFunctions.tokens(lower(col(phraseCol))))
          .as(Seq("idx", "term")))
      .select(col("query_id"), col("idx").cast("int").as("idx"), col("term"))
    val ks = slots.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("int").as("k"))
    // the ONE bounded driver action: the query batch's distinct terms,
    // pushed into the term-sorted scan as an isin filter (row-group
    // pruning); small-batch contract as TextIndex.queryMaxScore
    val terms = slots.select(col("term")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    // an all-whitespace batch has no terms: lit(false) keeps the NORMAL
    // plan (and so the caller-derived column types) instead of a
    // hand-built empty frame whose schema could diverge from it
    val termFilter =
      if (terms.isEmpty) lit(false) else col("term").isin(terms: _*)
    val rows = load(store, table)
      .filter(termFilter)
      .join(broadcast(slots), Seq("term"))
    rows
      .groupBy(col("query_id"), col("doc_id"))
      .agg(collect_list(struct(col("idx"), col("posns"))).as("members"),
        max(col("dl")).as("dl"))
      .join(broadcast(ks), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        graft.plans.TextExpressions
          .phraseTf(col("members"), col("k"), slop).as("phrase_tf"),
        col("dl"))
      .filter(col("phrase_tf") >= 1)
  }

  /** BM25-RANKED phrase retrieval (Lucene's sloppy-phrase scoring
    * shape): every [[phraseQuery]] match scored as if the phrase were a
    * single term —
    * {{{ idf(df_phrase) · ptf·(k1+1) / (ptf + k1·(1−b + b·dl/avgdl)) }}}
    * with ptf the phrase occurrence count, df_phrase the number of
    * matching documents (exact, counted from the match set), and
    * (nDocs, avgdl) the committed corpus stats that accumulate across
    * appends. The arithmetic mirrors
    * [[graft.functions.Retrieval]]'s BM25 contribution term-for-term,
    * so the rank projection carries an engine-stable DuckDB oracle
    * (`retrieve_phrase_ranked`) by the same double-precision argument.
    * Per-query ranking is the shared bounded top-k heap — no window —
    * and everything after the match set is match-set-sized. Returns
    * (query_id, doc_id, score, rank), rank 1..k, score rounded for
    * display (compare RANKS across engines, not raw doubles). */
  def phraseQueryRanked(store: SnapshotStore, table: String,
                        phrases: DataFrame, queryIdCol: String,
                        phraseCol: String, k: Int = 10, slop: Int = 0,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val v = store.currentVersion(table)
    require(v > 0, s"$table: no committed phrase index")
    val meta = store.metaForVersion(table, v)
    val nDocs = meta.getOrElse(s"${P}nDocs", "0").toLong
    val avgdl =
      if (nDocs > 0) meta.getOrElse(s"${P}sumDl", "0").toDouble / nDocs
      else 1.0 // empty index: no matches exist, the value is never used
    val m = phraseQuery(store, table, phrases, queryIdCol, phraseCol, slop)
    val dfPerQuery = m.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("double").as("df"))
    m.join(broadcast(dfPerQuery), Seq("query_id"))
      .withColumn("idf", log(lit(1.0) +
        (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("score",
        col("idf") * col("phrase_tf").cast("double") * (k1 + 1) /
          (col("phrase_tf").cast("double") +
            (col("dl") * (b / avgdl) + (1 - b)) * k1))
      .groupBy(col("query_id"))
      .agg(graft.plans.TopKAggregate
        .boundedTopK(col("doc_id"), col("score"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"),
        col("col.neighbor_id").as("doc_id"),
        round(col("col.score"), 6).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** On-demand chain fold (maintenance; appends also self-fold every
    * `compactEvery`) — idempotent, atomic version flip. */
  def compactIndex(store: SnapshotStore, table: String): Boolean =
    store.transactMeta[Unit](table, sortKey = Some("term")) {
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
