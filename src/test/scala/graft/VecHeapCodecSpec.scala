package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DoubleVecCodec, FloatVecCodec, VecMemberHeap}

/** Direct pins for the shared payload-generic member heap (the r15
  * review collapsed the double and float twins into one class + codec):
  * serialization round-trips must preserve the member set exactly for
  * BOTH codecs, capacity growth must respect k, and the kept set must
  * equal the k smallest ids regardless of insertion order — the
  * invariants both BoundedVecMembers aggregates ride on. Pure JVM, no
  * Spark session. */
class VecHeapCodecSpec extends AnyFunSuite {

  private def members[P >: Null <: AnyRef](h: VecMemberHeap[P]): Set[(Long, Boolean)] =
    h.sortedAsc.map { case (id, _, f) => (id, f) }.toSet

  test("write/read round-trips preserve members for both codecs") {
    val rnd = new scala.util.Random(0xC0DEC)
    for (trial <- 0 until 100) {
      val k = 1 + rnd.nextInt(20)
      val n = rnd.nextInt(60)
      val dim = 1 + rnd.nextInt(16)
      val hd = new VecMemberHeap[Array[Double]](k)
      val hf = new VecMemberHeap[Array[Float]](k)
      val fed = (0 until n).map { _ =>
        val id = rnd.nextInt(40).toLong
        val v = Array.fill(dim)(rnd.nextDouble())
        val f = rnd.nextBoolean()
        hd.add(id, v, f); hf.add(id, v.map(_.toFloat), f)
        (id, f)
      }
      val backD = VecMemberHeap.read(
        VecMemberHeap.write(hd, DoubleVecCodec), k, DoubleVecCodec)
      val backF = VecMemberHeap.read(
        VecMemberHeap.write(hf, FloatVecCodec), k, FloatVecCodec)
      assert(members(backD) == members(hd), s"double round-trip, trial $trial")
      assert(members(backF) == members(hf), s"float round-trip, trial $trial")
      // payloads survive bit-for-bit
      backD.sortedAsc.zip(hd.sortedAsc).foreach { case ((_, a, _), (_, b, _)) =>
        assert(java.util.Arrays.equals(a, b))
      }
      backF.sortedAsc.zip(hf.sortedAsc).foreach { case ((_, a, _), (_, b, _)) =>
        assert(java.util.Arrays.equals(a, b))
      }
      // the kept ids are the k smallest of what was fed, with duplicate
      // ids allowed (the heap keeps whichever copy held the slot last;
      // the ID SET must still be the k smallest distinct-or-not feed)
      val wantIds = fed.map(_._1).sorted.take(k)
      assert(hd.sortedAsc.map(_._1).toSeq == wantIds,
        s"double heap kept wrong ids, trial $trial")
      assert(hf.sortedAsc.map(_._1).toSeq == wantIds,
        s"float heap kept wrong ids, trial $trial")
    }
  }

  test("merge equals feeding both streams into one heap") {
    val rnd = new scala.util.Random(0x3E46E)
    for (_ <- 0 until 50) {
      val k = 1 + rnd.nextInt(12)
      def feed(h: VecMemberHeap[Array[Double]], n: Int, seed: Int): Seq[Long] =
        (0 until n).map { i =>
          val id = new scala.util.Random(seed + i).nextInt(50).toLong
          h.add(id, Array(id.toDouble), fresh = false)
          id
        }
      val a = new VecMemberHeap[Array[Double]](k)
      val b = new VecMemberHeap[Array[Double]](k)
      val one = new VecMemberHeap[Array[Double]](k)
      val fedA = feed(a, rnd.nextInt(40), 7)
      val fedB = feed(b, rnd.nextInt(40), 1900)
      (fedA ++ fedB).foreach(id => one.add(id, Array(id.toDouble), fresh = false))
      a.mergeFrom(b)
      assert(a.sortedAsc.map(_._1).toSeq == one.sortedAsc.map(_._1).toSeq)
    }
  }
}
