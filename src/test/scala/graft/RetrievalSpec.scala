package graft

import org.apache.spark.sql.functions._

import graft.functions.{Featurize, Retrieval}

/** Sparse inverted-index retrieval: integer dot products over hashed
  * signed-count features, ranked (dot desc, id asc). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sparseOf(text: String, dim: Int): Map[Int, Long] =
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      .map { t =>
        val h = md5hex(t); val nib = "0123456789abcdef"
        ((nib.indexOf(h(0)) * 16 + nib.indexOf(h(1))) % dim,
          if (nib.indexOf(h(2)) % 2 == 1) 1L else -1L)
      }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      .filter(_._2 != 0L)

  /** JVM reference: top-k by (dot desc, id asc) over docs sharing >= 1
    * bucket with the query. */
  private def bruteTopK(corpus: Seq[(Long, String)], query: (Long, String),
                        dim: Int, k: Int): Seq[(Long, Long, Long, Int)] = {
    val qv = sparseOf(query._2, dim)
    corpus.flatMap { case (id, t) =>
      val cv = sparseOf(t, dim)
      val shared = qv.keySet & cv.keySet
      if (shared.isEmpty) None
      else Some(id -> shared.toSeq.map(b => qv(b) * cv(b)).sum)
    }
      .sortBy { case (id, dot) => (-dot, id) }
      .take(k)
      .zipWithIndex
      .map { case ((id, dot), i) => (query._1, id, dot, i + 1) }
  }

  private val corpus = {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("sun", "moon", "star", "rain", "wind", "snow",
      "leaf", "tree", "rock", "wave", "fire", "mist")
    (0L until 40L).map { i =>
      i -> Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("sparse dot top-k matches the JVM inverted-index reference") {
    val df = corpus.toDF("doc_id", "text")
    val sparse = Featurize.hashFeaturesSparse(df, "text", "doc_id", dim = 16)
    val queries = sparse.filter(col("doc_id") < 2)
    val got = Retrieval.sparseDotTopK(sparse, "doc_id", queries, "doc_id", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    val want = (0L until 2L).flatMap(q =>
      bruteTopK(corpus, q -> corpus(q.toInt)._2, dim = 16, k = 5))
    assert(got === want)
  }

  test("docs sharing no feature with the query are absent") {
    // dim 256: tiny docs occupy few buckets, so disjoint docs exist
    val docs = Seq(1L -> "sun", 2L -> "sun", 3L -> "moon")
    val sparse = Featurize.hashFeaturesSparse(
      docs.toDF("doc_id", "text"), "text", "doc_id", dim = 256)
    val queries = sparse.filter(col("doc_id") === 1L)
    val got = Retrieval.sparseDotTopK(sparse, "doc_id", queries, "doc_id", k = 10)
      .as[(Long, Long, Long, Int)].collect().toSeq.sorted
    // "sun" and "moon" hash to different buckets at dim 256
    assert(got.map(_._2) === Seq(1L, 2L))
    assert(got.forall(_._3 == 1L))
  }

  test("bm25 matches an independent JVM implementation of the formula") {
    val k1 = 1.2; val b = 0.75
    val corp = corpus // (id, text) from the suite fixture
    val queries = Seq(0L -> corp(0)._2, 1L -> "sun rock mist")
    def toks(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val docToks = corp.map { case (id, t) => id -> toks(t) }
    val nDocs = corp.size.toDouble
    val avgdl = docToks.map(_._2.size).sum / nDocs
    def bm25(qt: Seq[String], dt: Seq[String]): Double = {
      val tf = dt.groupBy(identity).map { case (w, xs) => w -> xs.size.toDouble }
      qt.distinct.flatMap { t =>
        tf.get(t).map { f =>
          val df = docToks.count(_._2.contains(t)).toDouble
          val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
          idf * f * (k1 + 1) / (f + (dt.size * (b / avgdl) + (1 - b)) * k1)
        }
      }.sum
    }
    val want = queries.flatMap { case (qid, qt) =>
      docToks.map { case (id, dt) => (qid, id, bm25(toks(qt), dt)) }
        .filter(_._3 > 0.0)
        .sortBy { case (_, id, s) => (-s, id) }
        .take(5)
        .zipWithIndex.map { case ((q, id, s), i) => (q, id, s, i + 1) }
    }
    val got = Retrieval.bm25TopK(
      corp.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 5)
      .as[(Long, Long, Double, Int)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(got.map(r => (r._1, r._2, r._4)) === want.map(r => (r._1, r._2, r._4)),
      s"ranking mismatch:\n$got\nvs\n$want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-6, s"score mismatch at $g vs $w")
    }
  }

  test("bm25 on an empty corpus returns a typed empty result") {
    // The derived-stats path aggregates avg(size(toks)) — null on an
    // empty corpus; the guard must return the output schema, not NPE.
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val qs = Seq(1L -> "alpha beta").toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(empty, "doc_id", "text",
      qs, "query_id", "qtext", k = 5)
    assert(got.count() === 0L)
    assert(got.columns.toSeq === Seq("query_id", "neighbor_id", "score", "rank"))
  }

  test("bm25 with precomputed corpus stats equals the derived-stats result") {
    // The production single-scan path: (N, avgdl) supplied from a stats
    // table instead of a construction-time aggregate. Same rows, same
    // scores — only the number of corpus scans changes.
    val corp = corpus
    val queries = Seq(0L -> corp(0)._2, 1L -> "sun rock mist")
    def toks(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val nDocs = corp.size.toLong
    val avgdl = corp.map(c => toks(c._2).length.toLong).sum.toDouble / nDocs
    def run(stats: Option[(Long, Double)]) = Retrieval.bm25TopK(
        corp.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 5,
        corpusStats = stats)
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    assert(run(Some((nDocs, avgdl))) === run(None))
  }

  test("ties rank by neighbor id ascending") {
    val docs = Seq(10L -> "sun moon", 20L -> "sun moon", 30L -> "sun moon")
    val sparse = Featurize.hashFeaturesSparse(
      docs.toDF("doc_id", "text"), "text", "doc_id", dim = 64)
    val queries = sparse.filter(col("doc_id") === 20L)
    val got = Retrieval.sparseDotTopK(sparse, "doc_id", queries, "doc_id", k = 3)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().toSeq
    assert(got.map(_._2) === Seq(10L, 20L, 30L))
  }
}
