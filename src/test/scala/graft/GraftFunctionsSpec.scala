package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Featurize, Similarity, TextFunctions => TF}

/** The graft_* SQL surface (GraftFunctions): every registered name must
  * produce bit-identical results to the Column API it wraps — the
  * builder IS the Column function, so any drift would mean the bridge
  * mangled the expression tree. */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val ready: Unit = {
    GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("gf_docs")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("gf_embs")
  }

  /** Collect (id, value) sorted by id from both formulations and compare
    * element-wise (Row values: Seq == is element-wise, covers arrays). */
  private def check(sqlExpr: String, colExpr: Column,
                    table: String = "gf_docs", id: String = "doc_id"): Unit = {
    ready
    val viaSql = spark.sql(s"SELECT $id, $sqlExpr AS v FROM $table")
      .collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
    val viaCol = spark.table(table).select(col(id), colExpr.as("v"))
      .collect().map(r => (r.getLong(0), r.get(1))).sortBy(_._1)
    assert(viaSql.length === viaCol.length)
    viaSql.zip(viaCol).foreach { case ((ia, va), (ib, vb)) =>
      assert(ia === ib)
      assert(va === vb, s"$sqlExpr diverges from the Column API at $id=$ia")
    }
  }

  test("text functions: SQL names ≡ Column API") {
    check("graft_tokens(text)", TF.tokens(col("text")))
    check("graft_token_count(text)", TF.tokenCount(col("text")))
    check("graft_subword_count(text)", TF.subwordCount(col("text")))
    check("graft_punct_ratio(text)", TF.punctRatio(col("text")))
    check("graft_digit_count(text)", TF.digitCount(col("text")))
    check("graft_digit_ratio(text)", TF.digitRatio(col("text")))
    check("graft_upper_ratio(text)", TF.upperRatio(col("text")))
    check("graft_mean_token_len(text)", TF.meanTokenLen(col("text")))
    check("graft_stopword_ratio(text)", TF.stopwordRatio(col("text")))
    check("graft_lang_id(text)", TF.langId(col("text")))
    check("graft_quality_score(text)", TF.qualityScore(col("text")))
    check("graft_fingerprint(text)", TF.fingerprint(col("text")))
    check("graft_pii_redact(text)", TF.piiRedact(col("text")))
    check("graft_pii_counts(text)", TF.piiCounts(col("text")))
    check("graft_ngram_stats(text)",
      graft.plans.TextExpressions.ngramRepetition(col("text"), 2))
    check("graft_ngram_stats(text, 3)",
      graft.plans.TextExpressions.ngramRepetition(col("text"), 3))
    check("graft_word_ngrams(text)",
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.WordNgramsAll(
          org.apache.spark.sql.GraftColumnBridge.resolvedExpression(
            TF.tokens(col("text"))), 2)))
    check("graft_bucket_counts(text, 16)",
      graft.plans.TextExpressions.bucketCounts(TF.tokens(col("text")), 16))
  }

  test("dedup hash functions: SQL names ≡ Column API") {
    check("graft_simhash64(text)", Dedup.simhash64(col("text")))
    check("graft_simhash64_md5(text)", Dedup.simhash64Md5(col("text")))
    check("graft_hamming64(graft_simhash64(text), 255)",
      Dedup.hamming64(Dedup.simhash64(col("text")), lit(255)))
    check("graft_shingles(text)", Dedup.shingles(col("text")))
    check("graft_shingles(text, 5)", Dedup.shingles(col("text"), 5))
    check("graft_shingle_hashes(text, 2)", Dedup.shingleHashes(col("text"), 2))
    check("graft_minhash(graft_shingle_hashes(text), 16)",
      Dedup.minhashSignature(Dedup.shingleHashes(col("text")), 16))
    check("graft_band_keys(graft_minhash(graft_shingle_hashes(text)))",
      Dedup.lshBandKeys(Dedup.minhashSignature(Dedup.shingleHashes(col("text")))))
    check("graft_band_keys(graft_minhash(graft_shingle_hashes(text)), 32, 8)",
      Dedup.lshBandKeys(Dedup.minhashSignature(Dedup.shingleHashes(col("text"))), 32, 8))
  }

  test("vector functions: SQL names ≡ Column API") {
    check("graft_dot(embedding, embedding)",
      Similarity.dot(col("embedding"), col("embedding")),
      table = "gf_embs", id = "vec_id")
    check("graft_hash_embedding(text, 32)",
      Featurize.hashEmbedding(col("text"), 32))
  }

  test("graft_topk aggregate: SQL ≡ Column API (bounded heap, grouped)") {
    ready
    val viaSql = spark.sql(
      "SELECT label, graft_topk(vec_id, graft_dot(embedding, embedding), 3) AS v " +
        "FROM gf_embs GROUP BY label")
      .collect().map(r => (r.getInt(0), r.get(1).toString)).sortBy(_._1)
    val viaCol = spark.table("gf_embs").groupBy(col("label"))
      .agg(graft.plans.TopKAggregate.boundedTopK(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")), 3).as("v"))
      .collect().map(r => (r.getInt(0), r.get(1).toString)).sortBy(_._1)
    assert(viaSql.nonEmpty && (viaSql.toSeq == viaCol.toSeq))
  }

  test("integer parameters must be literals") {
    ready
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM gf_docs").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"),
      s"expected a must-be-literal error, got: ${e.getMessage}")
  }

  test("config-path descriptions cover the whole function table") {
    val names = GraftFunctions.descriptions.map(_._1.funcName).toSet
    assert(names === GraftFunctions.all.map(_._1).toSet)
    assert(names.forall(_.startsWith("graft_")))
  }
}
