package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKHeap

/** Randomized property check of the bounded top-k heap against a naive
  * sort reference: the heap backs every similarity ranking site, so its
  * ordering contract — (score desc, id asc) under
  * java.lang.Double.compare's total order, NaN greatest, -0.0 < 0.0 —
  * must hold for every insertion order, duplicate mix, capacity, and
  * special value. No Spark session needed; pure data-structure test. */
class TopKHeapSpec extends AnyFunSuite {

  private def naiveTopK(entries: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    entries.sortWith { case ((i1, s1), (i2, s2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }.take(k)

  /** NaN-safe, -0.0-preserving equality key (tuple == is false for NaN). */
  private def bits(xs: Seq[(Long, Double)]): Seq[(Long, Long)] =
    xs.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) }

  test("heap result equals sort reference over random workloads") {
    val rnd = new scala.util.Random(424242L)
    val specials = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, Double.MinPositiveValue)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(300)
      val k = 1 + rnd.nextInt(20)
      val entries = Seq.fill(n) {
        val s =
          if (rnd.nextInt(10) == 0) specials(rnd.nextInt(specials.length))
          // coarse grid → plenty of exact score ties exercising the id
          // tie-break
          else (rnd.nextInt(21) - 10) / 10.0
        (rnd.nextInt(50).toLong, s)
      }
      val heap = new TopKHeap(k)
      entries.foreach { case (id, s) => heap.add(s, id) }
      assert(bits(heap.sortedDesc.toSeq) === bits(naiveTopK(entries, k)),
        s"trial $trial: n=$n k=$k")
    }
  }

  test("merge equals single-heap over the concatenation (partial agg contract)") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(10)
      val parts = Seq.fill(1 + rnd.nextInt(5))(
        Seq.fill(rnd.nextInt(100))((rnd.nextInt(40).toLong, rnd.nextDouble())))
      val merged = new TopKHeap(k)
      parts.foreach { p =>
        val h = new TopKHeap(k)
        p.foreach { case (id, s) => h.add(s, id) }
        merged.mergeFrom(h)
      }
      assert(bits(merged.sortedDesc.toSeq) === bits(naiveTopK(parts.flatten, k)),
        s"trial $trial")
    }
  }

  // ---- MemberHeap (the capped LSH bucket member list) ----

  private def naiveMembers(entries: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    // unique ids by contract (one row per (bucket, doc)); keep the k
    // smallest, ascending
    entries.sortBy(_._1).take(k)

  test("member heap keeps the k smallest ids with payloads, any order") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(300)
      val k = 1 + rnd.nextInt(25)
      // distinct ids (shuffled), arbitrary payloads — incl. k far above
      // and far below n to exercise the lazy-capacity growth path
      val ids = rnd.shuffle((0 until n).map(_.toLong * 3 + 1).toVector)
      val entries = ids.map(id => (id, rnd.nextLong()))
      val heap = new graft.plans.MemberHeap(k)
      entries.foreach { case (id, p) => heap.add(id, p) }
      assert(heap.sortedAsc.toSeq === naiveMembers(entries, k),
        s"trial $trial: n=$n k=$k")
    }
  }

  test("member heap merge equals single heap over the concatenation") {
    val rnd = new scala.util.Random(3L)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(12)
      val all = rnd.shuffle((0 until rnd.nextInt(200))
        .map(i => (i.toLong, rnd.nextLong())).toVector)
      val parts = all.grouped(math.max(1, all.size / (1 + rnd.nextInt(4)))).toSeq
      val merged = new graft.plans.MemberHeap(k)
      parts.foreach { p =>
        val h = new graft.plans.MemberHeap(k)
        p.foreach { case (id, pay) => h.add(id, pay) }
        merged.mergeFrom(h)
      }
      assert(merged.sortedAsc.toSeq === naiveMembers(all, k), s"trial $trial")
    }
  }
}
