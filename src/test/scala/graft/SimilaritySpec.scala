package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.queries.ExtensionQueries

/** Similarity-search operators: exact math on known vectors, self-match
  * sanity on real testdata, ANN recall against the exact baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: known values") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 1f), Array(1f, 0f), math.sqrt(0.5)),
      (Array(0f, 0f), Array(1f, 0f), 0.0), // zero-vector guard
    ).toDF("a", "b", "expected")
    val rows = df.select(Similarity.cosine(col("a"), col("b")).as("cos"),
      col("expected")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("bruteForceTopK: each query's own vector ranks first with sim 1.0") {
    val topk = ExtensionQueries.simBruteTopK(spark, sfDir)
    val self = topk.filter(col("rank") === 1)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(self.length === 5)
    self.foreach { case (q, n, sim) =>
      assert(q === n, s"query $q rank-1 neighbor is $n")
      assert(sim > 0.999999)
    }
    // exactly k rows per query
    val counts = topk.groupBy("query_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 === 10))
  }

  test("annTopK: recall@10 beats the candidate-sampling fraction") {
    // Synthetic embeddings are isotropic (no cluster structure), so LSH
    // recall is bounded; the meaningful claim is ENRICHMENT: recall must
    // clearly beat the ~4% candidate fraction the probes scan.
    val recall = ExtensionQueries.simAnnRecall(spark, sfDir)
      .agg(avg(col("recall_at_10"))).first().getDouble(0)
    assert(recall >= 0.08, s"mean recall@10 = $recall (≈random sampling)")
  }

  test("IVF ANN: recall ≥ 0.8 on clustered vectors scanning < 10% of the corpus") {
    // Planted structure: 20 well-separated cluster centers on the unit
    // sphere, 60 points each (center + small noise) — the shape of real
    // embedding corpora, where IVF earns its keep over data-oblivious LSH.
    val rnd = new scala.util.Random(7)
    val dim = 16; val nClusters = 20; val perCluster = 60
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(
      unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val points = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val v = unit(centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat))
      ((c * perCluster + i).toLong, v)
    }
    val corpus = points.toDF("vec_id", "embedding").repartition(8)
    val queries = points.take(5).map { case (id, v) => (id, v) }
      .toDF("query_id", "qvec")

    val centroids = Similarity.trainIvfCentroids(
      corpus, "embedding", nLists = nClusters, seed = 42L)
    val approx = Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10,
      nLists = nClusters, nProbe = 1, centroidsOpt = Some(centroids))
      .select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.8, s"IVF recall@10 = $recall")

    // scanned fraction = probed list sizes summed over queries / (N·Q)
    import graft.plans.VectorExpressions.nearestCentroids
    val listSizes = corpus
      .select(element_at(nearestCentroids(
        Similarity.unitVector(col("embedding")), centroids, 1), 1).as("list_id"))
      .groupBy("list_id").count().as[(Int, Long)].collect().toMap
    val probed = queries
      .select(explode(nearestCentroids(
        Similarity.unitVector(col("qvec")), centroids, 1)).as("list_id"))
      .as[Int].collect()
    val scanned = probed.map(l => listSizes.getOrElse(l, 0L)).sum.toDouble /
      (points.size.toDouble * 5)
    assert(scanned < 0.10, s"IVF scanned fraction = $scanned")
  }

  test("embeddingNearDupPairs: planted duplicate vector is found") {
    val dup = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = Tables.embeddings(spark, sfDir).unionByName(dup)
    val pairs = Similarity.embeddingNearDupPairs(
      corpus, "vec_id", "embedding", dim = 64, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100000L)))
  }
}
