package graft

import org.apache.spark.sql.functions._

import graft.functions.{Featurize, Similarity}

/** Feature hashing: text → sparse signed counts → dense L2-normalized
  * embeddings, wired into the cosine/ANN operator family. The absolute
  * recipe (md5-nibble bucket + sign) is additionally pinned cross-engine
  * by the embed_docs DuckDB oracle. */
class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, ""),
    (5L, " \t\n  ")).toDF("doc_id", "text")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent JVM recompute of the hashing recipe. */
  private def expectSparse(text: String, dim: Int): Map[Int, Long] =
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      .map { t =>
        val h = md5hex(t); val nib = "0123456789abcdef"
        val b = (nib.indexOf(h(0)) * 16 + nib.indexOf(h(1))) % dim
        val s = if (nib.indexOf(h(2)) % 2 == 1) 1L else -1L
        (b, s)
      }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      .filter(_._2 != 0L)

  test("sparse features: deterministic signed counts, empty docs vanish") {
    val sp = Featurize.hashFeaturesSparse(docsDf, "text", "doc_id", dim = 64)
    val by = sp.as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, xs) =>
        id -> xs.map(x => x._2 -> x._3).toMap
      }
    assert(!by.contains(4L) && !by.contains(5L), "empty docs must emit no rows")
    assert(by(1L) === by(2L), "identical docs must featurize identically")
    assert(by(1L) === expectSparse("the quick brown fox jumps over the lazy dog", 64))
    assert(by(3L) === expectSparse("pack my box with five dozen liquor jugs", 64))
  }

  test("linear quality margin equals the JVM twin of the formula") {
    // margin = bias + Σ_token sign(token)·w(bucket(token)) — exactly the
    // integer dot of the signed-count feature vector with the weights.
    val weights = Featurize.fixtureWeights(64)
    assert(weights.min >= -10 && weights.max <= 10 && weights.distinct.size > 10)
    val got = docsDf.select(col("doc_id"),
      Featurize.qualityMargin(col("text"), weights, bias = 3L).as("m"))
      .as[(Long, Long)].collect().toMap
    def expectMargin(text: String): Long =
      3L + expectSparse(text, 64)
        .map { case (b, c) => c * weights(b) }.sum
    assert(got(1L) === expectMargin("the quick brown fox jumps over the lazy dog"))
    assert(got(1L) === got(2L), "identical docs score identically")
    assert(got(3L) === expectMargin("pack my box with five dozen liquor jugs"))
    // empty/whitespace docs: no tokens → margin is exactly the bias
    assert(got(4L) === 3L && got(5L) === 3L)
    // the fused expression ≡ explicit sparse-features dot (same recipe)
    val viaSparse = Featurize.hashFeaturesSparse(docsDf, "text", "doc_id", 64)
      .groupBy(col("doc_id"))
      .agg(sum(col("weight") * element_at(
        typedLit(weights.toArray), col("bucket") + 1)).as("dot"))
      .as[(Long, Long)].collect().toMap
    docsDf.select(col("doc_id")).as[Long].collect().foreach { id =>
      assert(got(id) === 3L + viaSparse.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("dense embedding is the L2-normalized sparse vector") {
    val dim = 64
    val dense = docsDf
      .select(col("doc_id"), Featurize.hashEmbedding(col("text"), dim).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    // empty docs: all-zero, not NaN
    assert(dense(4L).forall(_ == 0.0) && dense(5L).forall(_ == 0.0))
    // non-empty docs: unit norm, entries proportional to sparse weights
    for (id <- Seq(1L, 3L)) {
      val v = dense(id)
      val sparse = expectSparse(if (id == 1L)
        "the quick brown fox jumps over the lazy dog"
      else "pack my box with five dozen liquor jugs", dim)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
      val nrm = math.sqrt(sparse.values.map(w => w.toDouble * w).sum)
      (0 until dim).foreach { b =>
        assert(math.abs(v(b) - sparse.getOrElse(b, 0L) / nrm) < 1e-12,
          s"doc $id bucket $b")
      }
    }
  }

  test("hashed embeddings drive the cosine ANN family end-to-end") {
    val corpus = docsDf.filter(col("doc_id") <= 3)
      .select(col("doc_id").as("vec_id"),
        Featurize.hashEmbedding(col("text"), 64).as("embedding"))
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "query_id", "qvec", k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // the duplicate doc ties with self at cosine 1.0 (id asc breaks it)
    assert(top.map(_._2).toSeq === Seq(1L, 2L))
    assert(top.forall(_._3 === 1.0))
  }
}
