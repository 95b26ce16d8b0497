package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DeltaVarintPositions, PhraseTf}

/** Randomized pin of the PhraseTf backward-reachability DP against an
  * exhaustive backtracking reference over arbitrary position lists —
  * the fixture corpus in PhraseIndexSpec covers realistic text; this
  * covers the adversarial combinatorics directly (dense repeats, wide
  * slops, missing and duplicated slots, unsorted input). Inputs pass
  * through the delta-varint ENCODER (r16 layout), so every trial also
  * round-trips the codec against the plain-int-list truth. Pure
  * expression test via compute(), no Spark session. */
class PhraseTfPropertySpec extends AnyFunSuite {

  private val inputType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("posns", BinaryType, nullable = false))),
    containsNull = false)

  private val enc =
    DeltaVarintPositions(Literal.create(null, ArrayType(IntegerType)))

  private def eval(slots: Seq[(Int, Array[Int])], k: Int, slop: Int): Int =
    PhraseTf(Literal.create(null, inputType), Literal(k), slop)
      .compute(new GenericArrayData(slots.map { case (i, p) =>
        InternalRow(i, enc.compute(new GenericArrayData(p))) }.toArray[Any]), k)

  /** Exhaustive truth: count start positions with SOME chain
    * p₀<p₁<…, each step in (prev, prev+1+slop]. */
  private def naive(slots: Array[Array[Int]], slop: Int): Int = {
    def chain(level: Int, prev: Int): Boolean =
      level == slots.length ||
        slots(level).exists(p => p > prev && p <= prev + 1 + slop &&
          chain(level + 1, p))
    if (slots.exists(_ == null)) 0
    else slots(0).distinct.count(p => chain(1, p))
  }

  test("DP count equals exhaustive backtracking over random topologies") {
    val rnd = new scala.util.Random(0xD9)
    for (trial <- 0 until 400) {
      val k = 1 + rnd.nextInt(5)
      val slop = rnd.nextInt(4)
      val span = 4 + rnd.nextInt(20)
      // dense random position lists in a narrow span maximize chain
      // interaction; lists are DISTINCT positions per slot (a term
      // occurs once per token position) fed UNSORTED. Every third trial
      // shifts the span by a random large base so the first varint
      // needs 2-4 bytes — the codec's multi-byte paths ride the same
      // truth pin as the DP.
      val base = if (trial % 3 == 0) rnd.nextInt(1 << 24) else 0
      val slots = Array.fill(k)(
        rnd.shuffle((0 until span).toList).take(1 + rnd.nextInt(8))
          .map(_ + base).toArray)
      val want = naive(slots.map(_.sorted), slop)
      val got = eval(slots.zipWithIndex.map { case (p, i) => (i, p) }.toSeq,
        k, slop)
      assert(got == want,
        s"trial $trial k=$k slop=$slop: got $got want $want " +
          s"slots=${slots.map(_.mkString("[", ",", "]")).mkString(" ")}")
    }
  }

  test("malformed inputs return 0: missing slot, duplicate slot, bad idx") {
    val p = Array(1, 2, 3)
    assert(eval(Seq(0 -> p), 2, 0) == 0, "missing slot 1")
    assert(eval(Seq(0 -> p, 0 -> p), 2, 0) == 0, "duplicate slot 0")
    assert(eval(Seq(0 -> p, 2 -> p), 2, 0) == 0, "idx out of range")
    assert(eval(Seq.empty, 1, 0) == 0, "no slots at all")
  }
}
