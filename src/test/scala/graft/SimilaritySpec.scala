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

  test("multiprobe: home-first, distinct, saturates the keyspace") {
    import graft.plans.VectorExpressions.{hyperplaneBucket, hyperplaneProbes}
    val df = Seq((1L, Array(0.3f, -0.7f, 0.2f, 0.9f))).toDF("id", "v")
    val row = df.select(
      hyperplaneBucket(col("v"), 4, 3, 42L).as("home"),
      hyperplaneProbes(col("v"), 4, 3, 99, 42L).as("probes")).first()
    val home = row.getLong(0)
    val probes = row.getSeq[Long](1)
    assert(probes.head === home)
    // budget clamps to the 2^3-1 available perturbations; every bucket of
    // the 3-bit keyspace is reached exactly once
    assert(probes.size === 8)
    assert(probes.toSet === (0L until 8L).toSet)
  }

  test("multiprobe: recall non-decreasing in the probe budget") {
    // Probe sets are nested in the budget (best-first generation), so the
    // candidate set — and recall — can only grow with the knob.
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10).select("query_id", "neighbor_id")
    val nExact = exact.count().toDouble
    def recallAt(mp: Int): Double = {
      val approx = Similarity.annTopK(corpus, "vec_id", "embedding",
        queries, "query_id", "qvec", dim = 64, k = 10, nPlanes = 8,
        multiprobe = mp).select("query_id", "neighbor_id")
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count() / nExact
    }
    val curve = Seq(0, 4, 16, 64).map(recallAt)
    assert(curve.sliding(2).forall { case Seq(a, b) => b >= a - 1e-9 },
      s"recall curve $curve not monotone in the probe budget")
    assert(curve.last > curve.head, s"recall curve $curve is flat")
  }

  test("quantizer sample: representative on a cluster-SORTED corpus") {
    // The failure mode of a limit()-based sample: files laid out by
    // source/date mean the first partitions describe ONE shard. Sort the
    // corpus by cluster and give the trainer a sample budget far below the
    // corpus size — a first-partitions draw would see ~4 of 20 clusters
    // and recall would collapse; the hash-ordered draw stays uniform.
    val rnd = new scala.util.Random(31)
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
    // Strictly cluster-ordered physical layout (range partition + sort).
    val corpus = points.toDF("vec_id", "embedding")
      .repartitionByRange(8, col("vec_id")).sortWithinPartitions("vec_id")
    val queries = points.take(5).toDF("query_id", "qvec")

    val centroids = Similarity.trainIvfCentroids(
      corpus, "embedding", nLists = nClusters, seed = 42L, sampleSize = 256)
    val approx = Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10,
      nLists = nClusters, nProbe = 2, centroidsOpt = Some(centroids))
      .select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 10)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.8, s"IVF recall@10 on sorted corpus = $recall")
  }

  test("quantizer sample: identical regardless of partitioning") {
    val base = Tables.embeddings(spark, sfDir)
    val a = Similarity.trainIvfCentroids(
      base.repartition(3), "embedding", nLists = 8, sampleSize = 200)
    val b = Similarity.trainIvfCentroids(
      base.repartition(11), "embedding", nLists = 8, sampleSize = 200)
    assert(a === b, "hash-ordered sample must not depend on partitioning")
  }

  test("quantizer sample: exact-duplicate floods keep the draw bounded and exact") {
    // r16 ADVICE: thousands of identical vectors all hash to the SAME
    // cut value — the tie fetch must stay bounded (CollectLimit of
    // exactly the missing count, never a wide TakeOrdered of every
    // tied row) and the returned multiset must match the single-phase
    // semantics: |below-cut| + nTied = sampleSize.
    val dup = Seq.fill(5000)(Array(3.0, 4.0))  // one normalized value
    val distinct = (0 until 7).map(i => Array(1.0 + i, 2.0))
    val corpus = (dup ++ distinct).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(13)
    val got = Similarity.sampleUnitVectors(corpus, "v", sampleSize = 100)
    assert(got.length === 100)
    // every returned vector is one of the 8 planted values, normalized
    val legal = (dup.take(1) ++ distinct)
      .map(v => { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq })
      .toSet
    assert(got.forall(v => legal.contains(v.toSeq)))
    // and the draw is still partition-independent as a multiset
    val again = Similarity.sampleUnitVectors(
      (dup ++ distinct).zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(3), "v", sampleSize = 100)
    assert(got.map(_.toSeq).sorted(Ordering.by((s: Seq[Double]) => s.mkString(","))) ===
      again.map(_.toSeq).sorted(Ordering.by((s: Seq[Double]) => s.mkString(","))))
  }

  test("NearestCentroids: NaN vector is routed to a list, not a crash") {
    import graft.plans.VectorExpressions.nearestCentroids
    val dirty = Seq((1L, Array(Float.NaN, 1f)), (2L, Array(1f, 0f)))
      .toDF("id", "v")
    val cents: Seq[Seq[Double]] = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val out = dirty.select(col("id"),
      element_at(nearestCentroids(col("v"), cents, 1), 1).as("list_id"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) >= 0 && out(1L) < 2) // dirty row got SOME list
    assert(out(2L) === 0)               // clean row got the right one
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

  test("embeddingNearDupPairs: every reported pair is a true near-dup") {
    // Precision is exact by construction (the verify dot runs in-bucket):
    // every returned pair must appear in the brute-force cos ≥ t set.
    // (Recall is probabilistic in LSH — covered by the planted-dup test.)
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 120L).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / n))
    }
    val truth = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib
      cos = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
      if cos >= 0.6
    } yield (ia, ib)).toSet
    val got = Similarity.embeddingNearDupPairs(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 8, threshold = 0.6, nTables = 8, bitsPerTable = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    assert(got.nonEmpty) // 8 tables × 4 bits on dim-8: some collisions certain
  }

  test("embeddingNearDupPairs: forced float exchange ≡ classic path, cos included") {
    // the r16 batch-shape float exchange: force it on (minDim 0) and
    // off (minDim MaxValue) over the random corpus — the candidate
    // band + exact re-verify must reproduce the double path's pairs
    // AND rounded cos values exactly (the EmbedIndex append-path
    // guarantee, now shared via Similarity.exactReverify)
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 120L).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / n))
    }
    val df = vecs.toDF("vec_id", "embedding")
    def run(minDim: Int): Set[(Long, Long, Double)] =
      Similarity.embeddingNearDupPairs(df, "vec_id", "embedding",
        dim = 8, threshold = 0.6, nTables = 8, bitsPerTable = 4,
        floatExchangeMinDim = minDim)
        .select(col("id_a"), col("id_b"), col("cos"))
        .as[(Long, Long, Double)].collect().toSet
    val forcedFloat = run(0)
    val classic = run(Int.MaxValue)
    assert(forcedFloat.nonEmpty && forcedFloat === classic)
  }

  test("PQ: ADC equals the exact dot when vectors quantize losslessly") {
    // codebooks whose centroids ARE the corpus subvectors → zero
    // quantization error → adc must equal dot(q, v) exactly.
    val corpus = Seq((1L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("query_id", "qvec")
    val codebooks: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.6, 0.8), Seq(0.0, 0.0)),   // subspace 0 centroids
      Seq(Seq(0.0, 0.0), Seq(1.0, 0.0)))   // subspace 1 centroids
    val out = Similarity.pqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim = 4, k = 2, m = 2, kCodes = 2,
      codebooksOpt = Some(codebooks))
      .select("neighbor_id", "adc").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 0.6) < 1e-9)  // dot((1,0,0,0),(0.6,0.8,0,0))
    assert(math.abs(out(2L) - 0.0) < 1e-9)
  }

  test("PQ ANN: neighbors stay in the query's cluster; ADC tracks cosine") {
    val rnd = new scala.util.Random(11)
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
    val codebooks = Similarity.trainPqCodebooks(
      corpus, "embedding", dim, m = 4, k = 16, seed = 42L)
    val approx = Similarity.pqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim, k = 10, m = 4, kCodes = 16,
      codebooksOpt = Some(codebooks))
    // quantization blurs WITHIN-cluster order, but never across these
    // well-separated clusters: every neighbor shares the query's cluster
    val offCluster = approx
      .filter(floor(col("neighbor_id") / perCluster) =!=
        floor(col("query_id") / perCluster))
      .count()
    assert(offCluster === 0, s"$offCluster PQ neighbors left the cluster")
    // ADC ≈ cosine for the returned pairs (both sides unit vectors)
    val unitVecs = corpus.select(col("vec_id"),
      Similarity.unitVector(col("embedding")).as("uv"))
    val err = approx
      .join(unitVecs.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(queries.select(col("query_id"),
        Similarity.unitVector(col("qvec")).as("quv")), Seq("query_id"))
      .select(abs(col("adc") -
        Similarity.dot(col("uv"), col("quv"))).as("e"))
      .agg(avg(col("e")).as("mae")).collect()(0).getDouble(0)
    assert(err < 0.15, s"mean |adc - cos| = $err")
  }

  test("IVFPQ: full k returned, neighbors cluster-true, lists pruned") {
    val rnd = new scala.util.Random(23)
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
    val out = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim, k = 10,
      nLists = nClusters, nProbe = 1, m = 4, kCodes = 16)
    // nProbe=1 on cluster-shaped lists still fills k (each list ≈ 60 ≥ 10)
    assert(out.groupBy("query_id").count()
      .filter(col("count") =!= 10).count() === 0, "some query under-filled")
    // pruning + quantization never cross these separated clusters
    assert(out.filter(floor(col("neighbor_id") / perCluster) =!=
      floor(col("query_id") / perCluster)).count() === 0)
  }

  test("IVFPQ residual codes rank WITHIN a cluster (recall@10 vs brute)") {
    // The failure mode residual (IVFADC) encoding exists for: with
    // raw-vector PQ every member of a tight cluster maps to (nearly) the
    // same code, ADC ties, and within-list ranking degenerates to id
    // order — recall@10 ≈ k/perCluster (here 10/40 = 0.25; measured 0.04
    // at 1M flagship vectors) while the coarse quantizer is perfect.
    // Residual codes must recover most of the true within-list top-10.
    val rnd = new scala.util.Random(5)
    val dim = 32; val nClusters = 8; val perCluster = 40
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(
      unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val points = for {
      c <- 0 until nClusters; i <- 0 until perCluster
    } yield {
      val v = unit(centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat))
      ((c * perCluster + i).toLong, v)
    }
    val corpus = points.toDF("vec_id", "embedding").repartition(8)
    val queries = points.take(5).toDF("query_id", "qvec")
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val truth = topSets(Similarity.bruteForceTopK(corpus, "vec_id",
      "embedding", queries, "query_id", "qvec", k = 10))
    // refine = 1 isolates the residual-ADC ordering (no exact re-rank)
    val got = topSets(Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim, k = 10,
      nLists = nClusters, nProbe = 1, m = 8, kCodes = 16, refine = 1))
    val recall = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty[Long]).intersect(t).size / t.size.toDouble
    }.sum / truth.size
    assert(recall >= 0.6, f"residual-ADC recall@10 = $recall%.2f < 0.6")

    // With the exact re-rank (refine=8 → shortlist 80 ≥ the 40-member
    // list), IVFPQ must return exactly the brute-force top-10.
    val refined = topSets(Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim, k = 10,
      nLists = nClusters, nProbe = 1, m = 8, kCodes = 16, refine = 8))
    assert(refined === truth, "refined IVFPQ differs from brute force")

    // Recall floor of the SERVED DEFAULT (r13 verdict #6): this tight-
    // cluster corpus is exactly the shape where a shallow shortlist
    // ships single-digit recall (refine=1 measured 0.04 at the 1M
    // flagship), so the refine default — no explicit knob — must fully
    // recover the brute-force top-10 here. Guards against any future
    // default regression toward the degenerate ADC-only ordering.
    val served = topSets(Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim, k = 10,
      nLists = nClusters, nProbe = 1, m = 8, kCodes = 16))
    assert(served === truth,
      "the DEFAULT refine depth must not ship degraded recall")
  }
}
