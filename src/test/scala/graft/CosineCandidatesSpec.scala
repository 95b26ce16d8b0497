package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{CosineCandidatesF, CosinePairs}

/** Randomized soundness check of the float-exchange candidate margin
  * (EmbedIndex.FloatVerifyMargin = 1e-4): over random clustered member
  * sets — including ADVERSARIAL pairs rotated to sit within ±1e-7 of
  * the threshold, at dim 768 where the accumulated float error is
  * largest — the float candidate set must contain EVERY pair the
  * double path emits (margin soundness: a true pair can never sink
  * below threshold − margin), and the float path's final output
  * (candidates re-filtered by the exact double dot) must equal the
  * double path's pairs with BIT-IDENTICAL cosines. Pure expression
  * test via compute() — no Spark session, so hundreds of trials are
  * cheap. */
class CosineCandidatesSpec extends AnyFunSuite {

  private val Margin = graft.store.EmbedIndex.FloatVerifyMargin

  private val threeFieldD = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("uv", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("fresh", BooleanType, nullable = false))),
    containsNull = false)

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Exact double dot in CosinePairs' accumulation order (k ascending —
    * FP multiply commutes exactly, so member order is irrelevant). */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val d = math.min(a.length, b.length)
    var s = 0.0; var k = 0
    while (k < d) { s += a(k) * b(k); k += 1 }
    s
  }

  private type Member = (Long, Array[Double], Boolean)

  private def membersD(ms: Seq[Member]): ArrayData =
    new GenericArrayData(ms.map { case (id, v, f) =>
      InternalRow(id, new GenericArrayData(v), f) }.toArray[Any])

  private def membersF(ms: Seq[Member]): ArrayData =
    new GenericArrayData(ms.map { case (id, v, f) =>
      InternalRow(id, new GenericArrayData(v.map(_.toFloat)), f)
    }.toArray[Any])

  private def doublePairs(ms: Seq[Member], t: Double): Map[(Long, Long), Double] = {
    val out = CosinePairs(Literal.create(null, threeFieldD), t)
      .compute(membersD(ms))
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 3)
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)
    }.toMap
  }

  private def floatCandidates(ms: Seq[Member], cutoff: Double): Set[(Long, Long)] = {
    val out = CosineCandidatesF(Literal.create(null, threeFieldD), cutoff)
      .compute(membersF(ms))
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }.toSet
  }

  /** A random unit vector orthogonal to `a` (Gram–Schmidt). */
  private def orthogonal(a: Array[Double], rnd: scala.util.Random): Array[Double] = {
    val r = Array.fill(a.length)(rnd.nextGaussian())
    val proj = dot(unit(r), a)
    unit(unit(r).zip(a).map { case (x, y) => x - proj * y })
  }

  test("float candidates never lose a double-path pair; exact re-filter reproduces it") {
    val rnd = new scala.util.Random(0xF10A7)
    for (trial <- 0 until 60) {
      val dim = Seq(3, 8, 64, 768)(trial % 4)
      val t = Seq(0.8, 0.99, 0.9999)(trial % 3)
      val base = unit(Array.fill(dim)(rnd.nextGaussian()))
      val ms = scala.collection.mutable.ArrayBuffer.empty[Member]
      var id = 0L
      def add(v: Array[Double]): Unit = {
        ms += ((id, v, rnd.nextBoolean())); id += 1
      }
      // cluster members at assorted perturbation scales around base
      for (_ <- 0 until 10)
        add(unit(base.map(_ + math.pow(10, -rnd.nextInt(5)) * rnd.nextGaussian())))
      // ADVERSARIAL: exact rotations of base landing the true cosine at
      // threshold ± {0, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3} — the band where a
      // wrong margin would lose or fabricate pairs
      for (eps <- Seq(0.0, 1e-7, -1e-7, 1e-6, -1e-6, 1e-5, -1e-5, 1e-4,
                      -1e-4, 1e-3, -1e-3)) {
        val c = t + eps
        if (c < 1.0 && c > -1.0) {
          val o = orthogonal(base, rnd)
          add(unit(base.zip(o).map { case (x, y) =>
            c * x + math.sqrt(1 - c * c) * y }))
        }
      }
      // far-off members and one duplicate id (must never self-pair)
      for (_ <- 0 until 3) add(unit(Array.fill(dim)(rnd.nextGaussian())))
      ms += ((0L, ms.head._2, rnd.nextBoolean()))

      val exact = doublePairs(ms.toSeq, t)
      val cand = floatCandidates(ms.toSeq, t - Margin)
      val lost = exact.keySet -- cand
      assert(lost.isEmpty,
        s"trial $trial (dim=$dim, t=$t): margin lost true pairs $lost")

      // the float path's final output: candidates re-verified exactly
      val byId = ms.groupBy(_._1).map { case (k, v) => k -> v.head._2 }
      val refiltered = cand.flatMap { case (a, b) =>
        val c = dot(byId(a), byId(b))
        if (c >= t) Some((a, b) -> c) else None
      }.toMap
      assert(refiltered.keySet == exact.keySet,
        s"trial $trial (dim=$dim, t=$t): refiltered set diverged")
      refiltered.foreach { case (k, c) =>
        assert(java.lang.Double.doubleToLongBits(c) ==
          java.lang.Double.doubleToLongBits(exact(k)),
          s"trial $trial: cos bits diverged for $k")
      }
    }
  }

  test("neither-fresh pairs are skipped identically on both paths") {
    val rnd = new scala.util.Random(0xFEE7)
    val dim = 16
    val base = unit(Array.fill(dim)(rnd.nextGaussian()))
    // all members near-identical → every cross pair is above threshold;
    // freshness alone decides which survive
    val ms: Seq[Member] = (0 until 8).map { i =>
      (i.toLong,
        unit(base.map(_ + 1e-4 * rnd.nextGaussian())),
        i % 3 == 0) // ids 0,3,6 fresh
    }
    val t = 0.99
    val exact = doublePairs(ms, t)
    val cand = floatCandidates(ms, t - Margin)
    assert(exact.nonEmpty)
    assert(exact.keySet == cand, "freshness semantics must match")
    val stale = Set(1L, 2L, 4L, 5L, 7L)
    assert(!exact.keySet.exists { case (a, b) => stale(a) && stale(b) },
      "corpus-corpus pairs must be skipped")
    assert(exact.keySet.forall { case (a, b) => !stale(a) || !stale(b) })
  }
}
