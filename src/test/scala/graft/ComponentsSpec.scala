package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Connected components over pair graphs: must equal a JVM union-find
  * on every topology a dup graph produces (cliques, stars, chains,
  * singleton-free disjoint unions). */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("cliques, stars, and a long chain resolve to min-id components") {
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val star = (1L to 8L).map(i => (100L, 100L + i))
    // a 64-node path: diameter 63 — pointer jumping must converge well
    // inside maxIter (plain propagation would need 63 rounds)
    val chain = (200L until 263L).map(i => (i, i + 1))
    val edges = clique ++ star ++ chain
    assert(run(edges) === unionFind(edges))
  }

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    assert(run(edges) === unionFind(edges))
  }

  test("empty pair list yields empty components") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() === 0)
  }

  test("driver union-find fast path equals the distributed pointer-jump loop") {
    // r18: under the edge gate the solve collects and runs union-find on
    // the driver; force the distributed loop (gate 0) on the same graph
    // and pin row-for-row equality — the two regimes must be
    // indistinguishable to any caller.
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = edges.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(df, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(df, "id_a", "id_b",
        driverSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist)
    assert(fast === unionFind(edges))
  }

  test("collectLongPairs: primitive paired blobs equal the Row collect") {
    // r19: the fast path's collect materializes NO per-row Row/tuple —
    // partitions reduce to primitive long arrays. Pin pair-multiset
    // equality with the plain collect across a multi-partition frame,
    // including int ids that round-trip through the long cast.
    val df = spark.range(0, 1000, 1, 7)
      .selectExpr("cast(id as int) as a", "cast(id * 31 % 997 as long) as b")
    val blobs = Dedup.collectLongPairs(
      df.select(col("a").cast("long"), col("b").cast("long")))
    val fromBlobs = blobs.flatMap(_.grouped(2).map(p => (p(0), p(1))))
      .sorted.toSeq
    val fromRows = df.collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1))).sorted.toSeq
    assert(fromBlobs === fromRows)
  }

  test("cluster dedup is transitive where pairwise keep-min is not") {
    // docs 1 and 3 near-dup, 2 and 3 near-dup, 1 and 2 NOT (direct
    // Jaccard below tau): the component {1,2,3} keeps only doc 1,
    // while pairwise keep-min would also keep 2 (never a higher id).
    val base = (0 until 12).map(i => s"w$i")
    val d3 = base.mkString(" ")                               // hub
    val d1 = (base.take(11) :+ "x1").mkString(" ")            // ~ d3
    val d2 = ("x2" +: base.drop(1)).mkString(" ")             // ~ d3, not ~ d1
    val docs = Seq(1L -> d1, 2L -> d2, 3L -> d3, 9L -> "totally different words here")
    val pairs = graft.functions.Dedup.ngramJaccardPairs(
      docs.toDF("doc_id", "text"), "text", "doc_id", tauNum = 4, tauDen = 5)
      .as[(Long, Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs === Set((1L, 3L), (2L, 3L)), s"planted topology broken: $pairs")
    val kept = graft.functions.Dedup.dropDuplicateClusters(
      docs.toDF("doc_id", "text"), "text", "doc_id", tauNum = 4, tauDen = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  test("merging two clusters through a single bridge edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
    val got = run(edges)
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
  }

  test("keepBestByComponents: argmax by score, id-asc ties, nulls lose") {
    // component {1,2,3} via the chain (1,3),(2,3); component {10,11};
    // 99 untouched by any pair
    val labels = Dedup.connectedComponents(
      Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"),
      "id_a", "id_b")
    def kept(rows: Seq[(Long, java.lang.Double)]): Set[Long] =
      Dedup.keepBestByComponents(
        rows.toDF("doc_id", "q"), "doc_id", "q", labels)
        .select("doc_id").as[Long].collect().toSet

    // 2 outscores the min id 1 — the keep-min contract would keep 1
    assert(kept(Seq(1L -> 0.5, 2L -> 0.9, 3L -> 0.1,
      10L -> 0.2, 11L -> 0.7, 99L -> 0.0)) === Set(2L, 11L, 99L))
    // exact tie → smaller id (degrades to the keep-min answer)
    assert(kept(Seq(1L -> 0.5, 2L -> 0.5, 3L -> 0.5,
      10L -> 0.3, 11L -> 0.3, 99L -> 0.0)) === Set(1L, 10L, 99L))
    // null scores lose to any non-null; all-null component → min id
    assert(kept(Seq(1L -> null, 2L -> 0.1, 3L -> null,
      10L -> null, 11L -> null, 99L -> null)) === Set(2L, 10L, 99L))
  }

  test("dropDuplicateClustersBy keeps the best-quality cluster member") {
    // the chain topology from the transitive test: 1~3, 2~3 (never 1~2);
    // quality says 2 is the best of component {1,2,3}
    val base = (0 until 12).map(i => s"tok$i")
    val d3 = base.mkString(" ")
    val d1 = (base.take(11) :+ "x1").mkString(" ")
    val d2 = ("x2" +: base.drop(1)).mkString(" ")
    val docs = Seq((1L, d1, 0.2), (2L, d2, 0.9), (3L, d3, 0.5),
      (9L, "totally different words here", 0.0))
      .toDF("doc_id", "text", "q")
    val kept = Dedup.dropDuplicateClustersBy(
      docs, "text", "doc_id", "q", tauNum = 4, tauDen = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 9L),
      "the component survivor must be the argmax, not the min id")
  }

  test("keep-best selection accepts fractional ids, refuses non-numeric") {
    // double ids: the pre-r16 `0L - id` encoding handled these and the
    // r16 integral-only guard over-tightened (r16 ADVICE) — negation is
    // the monotone decreasing inversion on fractional/decimal ids
    val labels = Dedup.connectedComponents(
      Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .select(col("id").cast("double").as("id"),
        col("component_id").cast("double").as("component_id"))
    val rows = Seq((1.0, 0.5), (2.0, 0.9), (3.0, 0.1), (9.5, 0.0))
      .toDF("doc_id", "q")
    val kept = Dedup.keepBestByComponents(rows, "doc_id", "q", labels)
      .select("doc_id").as[Double].collect().toSet
    assert(kept === Set(2.0, 9.5))
    // tie → smaller double id
    val tied = Seq((1.5, 0.5), (2.5, 0.5), (3.5, 0.5))
    val g = Dedup.exactGroupsBy(
      tied.map { case (i, _) => (i, "same") }.toDF("doc_id", "text"),
      "text", "doc_id", "doc_id") // score = id: max id wins, no tie here
    assert(g.select("keep_id").as[Double].collect().toSeq === Seq(3.5))
    val tiedScores = Seq((1.5, "s", 7.0), (2.5, "s", 7.0))
      .toDF("doc_id", "text", "pref")
    assert(Dedup.exactGroupsBy(tiedScores, "text", "doc_id", "pref")
      .select("keep_id").as[Double].collect().toSeq === Seq(1.5))
    // non-numeric ids still refuse loudly (they would coerce to null
    // and silently degrade the tie-break)
    val strIds = Seq(("a", "t", 1.0)).toDF("doc_id", "text", "pref")
    val e = intercept[IllegalArgumentException] {
      Dedup.exactGroupsBy(strIds, "text", "doc_id", "pref")
    }
    assert(e.getMessage.contains("numeric id column"))
  }

  test("exactGroupsBy / dropExactDuplicatesBy: best provenance survives") {
    // identical TEXT, different provenance score — the production case
    // keep-min cannot express
    val rows = Seq(
      (1L, "same text", 1L), (2L, "same text", 5L), (3L, "same text", 5L),
      (7L, "other", 2L))
      .toDF("doc_id", "text", "pref")
    val groups = Dedup.exactGroupsBy(rows, "text", "doc_id", "pref")
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    // score 5 beats 1; tie between ids 2 and 3 → 2
    assert(groups === Set((2L, 3L), (7L, 1L)))
    val kept = Dedup.dropExactDuplicatesBy(rows, "text", "doc_id", "pref")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 7L))
  }
}
