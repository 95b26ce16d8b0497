package graft

import org.apache.spark.sql.functions._

import graft.functions.Dsir
import graft.queries.ExtensionQueries

/** DSIR importance resampling: weights and scores pinned against an
  * independent JVM twin of the md5-bucket + quantized-log recipe,
  * edge cases, and the registered query's arm discrimination. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // independent twin of the library's hashing-trick bucket
  private def bucket(tok: String, dim: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    (h(0) & 0xFF) % dim
  }
  private def flog2p1(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c + 1)

  private def twinWeights(target: Seq[String], raw: Seq[String], dim: Int): Seq[Long] = {
    val ct = new Array[Long](dim); val cr = new Array[Long](dim)
    target.flatMap(_.split("\\s+").filter(_.nonEmpty)).foreach(t => ct(bucket(t, dim)) += 1)
    raw.flatMap(_.split("\\s+").filter(_.nonEmpty)).foreach(t => cr(bucket(t, dim)) += 1)
    val k = flog2p1(cr.sum) - flog2p1(ct.sum)
    (0 until dim).map(b => flog2p1(ct(b)) - flog2p1(cr(b)) + k)
  }

  private val targetTexts = Seq("quark boson quark", "lepton quark")
  private val rawTexts = targetTexts ++ Seq(
    "the cat sat on the mat", "a dog ran", "quark in context", "")

  test("importanceWeights matches the JVM twin") {
    val w = Dsir.importanceWeights(
      targetTexts.toDF("t"), rawTexts.toDF("t"), "t", dim = 16)
    assert(w === twinWeights(targetTexts, rawTexts, 16))
  }

  test("scoreDocs: per-token weight sum, rational threshold, empty doc") {
    val w = twinWeights(targetTexts, rawTexts, 16)
    val docs = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    val out = Dsir.scoreDocs(docs, "doc_id", "t", w,
      thresholdNum = -1L, thresholdDen = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    rawTexts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      val s = toks.map(tok => w(bucket(tok, 16))).sum
      assert(out(i.toLong) === ((s, toks.length, s * 2 >= -1 * toks.length)),
        s"doc $i '$t'")
    }
    assert(out(5L) === ((0L, 0, true)), "empty doc is neutral")
  }

  test("registered mix_dsir: per-token score separates the arms") {
    val out = ExtensionQueries.mixDsir(spark, sfDir).persist()
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      assert(out.count() === docs.count(), "one row per document")
      // scale-free separation assertion: every signature-arm doc's
      // per-token score exceeds every base doc's (the absolute location
      // shifts with the corpus — the 1-bit K quantization — which is
      // why the keep threshold is a calibration knob; see mixDsir doc)
      val ratio = col("dsir_score").cast("double") / col("n_tokens")
      val sigMin = out.filter(col("doc_id") % 4 === 1)
        .agg(min(ratio)).head.getDouble(0)
      val baseMax = out.filter(col("doc_id") % 4 =!= 1 && col("n_tokens") > 0)
        .agg(max(ratio)).head.getDouble(0)
      assert(sigMin > baseMax,
        s"signature arm must separate: sig min $sigMin vs base max $baseMax")
    } finally out.unpersist(blocking = false)
  }
}
