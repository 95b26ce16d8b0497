package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.queries.ExtensionQueries

/** SemDeDup: within-cluster cosine dedup with component-min survivors —
  * hand truth with explicit centroids (transitive chain, cross-cluster
  * pair NOT removed, cap pass-through), and the registered
  * planted-copy oracle query. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private def unit(deg: Double, dim: Int = 4): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat) ++
      Array.fill(dim - 2)(0.0f)
  }

  // explicit centroids remove trainer dependence from the hand truth
  private val e0 = Seq(1.0, 0.0, 0.0, 0.0)
  private val e90 = Seq(0.0, 1.0, 0.0, 0.0)

  test("hand truth: transitive chain collapses to min id") {
    // 0°, 25°, 50°: cos(25°)=0.906 links (1,2) and (2,3); cos(50°)=0.64
    // does NOT link (1,3) — transitivity must still merge all three
    val df = Seq((1L, unit(0)), (2L, unit(25)), (3L, unit(50)),
      (4L, unit(-80))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding", dim = 4,
        nClusters = 1, eps = 0.9, centroidsOpt = Some(Seq(e0)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) === ((1L, true)))
    assert(out(2L) === ((1L, false)), "direct pair with 1")
    assert(out(3L) === ((1L, false)), "transitive via 2 — cos(1,3) < eps")
    assert(out(4L) === ((4L, true)), "unpaired keeps itself")
  }

  test("pairs are WITHIN-cluster only: cross-cluster near-dup survives") {
    // a=0° and b=10° land in the e0 cluster (pair, cos=0.985);
    // c=55° lands in the e90 cluster; cos(b,c)=cos(45°)=0.707 > eps
    // crosses clusters → both kept. SemDeDup's approximation, asserted.
    val df = Seq((1L, unit(0)), (2L, unit(10)), (3L, unit(55)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding", dim = 4,
        nClusters = 2, eps = 0.7, centroidsOpt = Some(Seq(e0, e90)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("degenerate cluster past the cap is dropped whole — members kept") {
    val df = Seq((1L, unit(0)), (2L, unit(1)), (3L, unit(2)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding", dim = 4,
        nClusters = 1, eps = 0.9, maxClusterSize = 2,
        centroidsOpt = Some(Seq(e0)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("registered semdedup_oracle: planted copy dropped, rest kept") {
    val out = ExtensionQueries.semDedupOracle(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10000L) === ((0L, false)), "planted copy collapses onto 0")
    assert(out(0L) === ((0L, true)))
    assert(out.count { case (_, (_, kept)) => !kept } === 1,
      "exactly one duplicate in the fixture")
  }
}
