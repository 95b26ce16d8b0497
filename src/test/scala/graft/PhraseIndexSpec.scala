package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.store.{PhraseIndex, SnapshotStore}

/** Positional phrase retrieval: index-backed phrase_tf must equal a JVM
  * naive count (sliding token-window comparison) on every (query, doc),
  * across build-vs-append batchings, repeated-term and overlapping
  * phrases, k=1 degeneration, and exactly-once replay. */
class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic tiny-vocab texts: tiny vocab → dense phrase repeats,
  // overlaps, and repeated-term windows by construction
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(0x9E37)
    val vocab = Array("a", "b", "c", "dd", "ee")
    (0L until 60L).map { id =>
      val n = 3 + rnd.nextInt(20)
      id -> Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    } ++ Seq(
      60L -> "a b a b a",     // "a b a" occurs at 0 AND 2 (overlap)
      61L -> "  A  \t B\na ", // case folding + messy whitespace
      62L -> "")              // empty doc: never matches
  }

  private def phrases: Seq[(Long, String)] = Seq(
    (0L, "a b a"),    // repeated-term phrase
    (1L, "b c"),
    (2L, "dd"),       // k = 1 → plain term frequency
    (3L, "a b"),
    (4L, "ee dd c"),
    (5L, "zz a"),     // term absent from the corpus
    (6L, "   "))      // whitespace-only: matches nothing

  /** Naive truth: tokenize like the library (lowercase, ws-split) and
    * count sliding-window matches. */
  private def naive: Set[(Long, Long, Int)] = {
    def toks(s: String): Array[String] =
      s.toLowerCase.trim.split("[ \\t\\n\\u000B\\f\\r]+").filter(_.nonEmpty)
    (for {
      (qid, ph) <- phrases
      p = toks(ph)
      if p.nonEmpty
      (did, text) <- corpus
      t = toks(text)
      if t.length >= p.length
    } yield {
      val tf = (0 to t.length - p.length)
        .count(s => p.indices.forall(i => t(s + i) == p(i)))
      (qid, did, tf)
    }).filter(_._3 >= 1).toSet
  }

  private def got(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id"), col("doc_id"), col("phrase_tf"))
      .as[(Long, Long, Int)].collect().toSet

  test("index phrase_tf equals the naive sliding-window count") {
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-phrase").toString, spark)
    PhraseIndex.build(store, "pos", corpus.toDF("doc_id", "text"),
      "text", "doc_id")
    val out = got(PhraseIndex.phraseQuery(store, "pos",
      phrases.toDF("query_id", "phrase"), "query_id", "phrase"))
    assert(naive.nonEmpty && naive.exists { case (q, d, tf) =>
      q == 0L && d == 60L && tf == 2 }, s"fixture lost its overlap case: $naive")
    assert(out == naive)
  }

  test("multi-batch appends equal the one-shot build; replay skipped") {
    for (nBatches <- Seq(2, 3)) {
      val store = new SnapshotStore(
        Files.createTempDirectory("graft-phrase-app").toString, spark)
      val df = corpus.toDF("doc_id", "text")
      PhraseIndex.build(store, "pos", df.limit(0), "text", "doc_id")
      (0 until nBatches).foreach { i =>
        assert(PhraseIndex.appendBatchOnce(store, "pos",
          df.filter(col("doc_id") % nBatches === i), "text", "doc_id",
          "s", i.toLong))
      }
      assert(!PhraseIndex.appendBatchOnce(store, "pos", df, "text", "doc_id",
        "s", (nBatches - 1).toLong), "replayed batchId must be skipped")
      val out = got(PhraseIndex.phraseQuery(store, "pos",
        phrases.toDF("query_id", "phrase"), "query_id", "phrase"))
      assert(out == naive, s"append path diverged at $nBatches batches")
      // chain folds to the slim canonical layout and keeps answering
      assert(PhraseIndex.compactIndex(store, "pos"))
      PhraseIndex.vacuumIndex(store, "pos")
      assert(got(PhraseIndex.phraseQuery(store, "pos",
        phrases.toDF("query_id", "phrase"), "query_id", "phrase")) == naive)
    }
  }

  test("maintainAll folds an over-length phrase chain via its marker") {
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-phrase-maint").toString, spark)
    val df = corpus.toDF("doc_id", "text")
    PhraseIndex.build(store, "pos", df.limit(0), "text", "doc_id")
    (0 until 3).foreach { i =>
      PhraseIndex.appendBatchOnce(store, "pos",
        df.filter(col("doc_id") % 3 === i), "text", "doc_id", "s", i.toLong,
        compactEvery = 100)
    }
    val actions = Graft.maintainAll(store, maxChainLength = 2)
    assert(actions.contains(Graft.MaintenanceAction("pos", "phrase")))
    assert(got(PhraseIndex.phraseQuery(store, "pos",
      phrases.toDF("query_id", "phrase"), "query_id", "phrase")) == naive)
  }
}
