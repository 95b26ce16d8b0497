package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity top-k heap over (score, id) pairs, ordered by
  * (score DESC, id ASC) — the per-query ranking contract of every
  * similarity path (ties broken by neighbor id for determinism).
  *
  * Array-backed binary min-heap with the WORST kept entry at the root, so
  * an insert against a full heap is one compare (reject) or one sift
  * (replace root) — O(log k) worst case, O(1) for the overwhelming
  * majority of corpus rows that don't beat the current k-th best.
  * Scores compare via java.lang.Double.compare — the same total order
  * (NaN greatest, -0.0 < 0.0) Spark's sort-based window ranking used, so
  * the heap result is bit-identical to the window formulation it replaces.
  */
final class TopKHeap(val k: Int) extends Serializable {
  // Lazy capacity, as MemberHeap: per-group buffers must not cost k
  // slots up front when most groups hold a handful of rows (LSH bucket
  // groups are overwhelmingly singletons; query groups are few but pay
  // nothing for the laziness either).
  private[plans] var scores = new Array[Double](math.min(k, 4))
  private[plans] var ids = new Array[Long](math.min(k, 4))
  private[plans] var size = 0

  private def ensureRoom(): Unit =
    if (size == ids.length && ids.length < k) {
      val cap = math.min(k, ids.length * 4)
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

  /** true iff (s1, i1) ranks strictly WORSE than (s2, i2) under
    * (score desc, id asc): lower score, or same score and higher id. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      if (l >= size) return
      val r = l + 1
      var m = l
      if (r < size && worse(scores(r), ids(r), scores(l), ids(l))) m = r
      if (worse(scores(m), ids(m), scores(i), ids(i))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(m); ids(i) = ids(m)
        scores(m) = ts; ids(m) = ti
        i = m
      } else return
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      ensureRoom()
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (id, score) pairs ordered best-first: (score desc, id asc). */
  def sortedDesc: Array[(Long, Double)] = {
    val out = Array.tabulate(size)(i => (ids(i), scores(i)))
    scala.util.Sorting.stableSort(out, (a: (Long, Double), b: (Long, Double)) =>
      worse(b._2, b._1, a._2, a._1))
    out
  }
}

/** Bounded per-group top-k as a typed aggregate:
  * `bounded_top_k(id, score, k)` → array<struct<neighbor_id, score>>
  * sorted (score desc, id asc).
  *
  * This is the scale-correct half of a two-phase top-k. The window
  * formulation (`row_number over (partition by query_id order by score)`)
  * hash-exchanges EVERY scored row to the task owning its query and sorts
  * the query's entire candidate set there — for a full-corpus scan that is
  * an N-row single-task spill-sort per query, the one plan shape that dies
  * at 100× scale. As an aggregate, partial (map-side) update folds each
  * partition's rows into a k-entry heap, so the exchange carries
  * Q·partitions·k heap entries instead of Q·N score rows, and the final
  * merge per query is heap-merge over partitions·k entries. Runs under
  * ObjectHashAggregateExec (one buffer object per group — Q per task). */
case class BoundedTopK(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k >= 1, s"k=$k must be positive")

  private def idExpr = left
  private def scoreExpr = right

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (idExpr.dataType, scoreExpr.dataType) match {
      case (IntegerType | LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (idT, sT) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_top_k needs (int|bigint id, double score), got " +
            s"${idT.simpleString}, ${sT.simpleString}")
    }

  // Output ids keep the input id type so downstream schemas (and the
  // DuckDB oracle's parquet-derived types) are unchanged by the rewrite.
  private lazy val idIsLong = idExpr.dataType == LongType

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", idExpr.dataType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val idV = idExpr.eval(input)
    if (idV != null) {
      val sV = scoreExpr.eval(input)
      if (sV != null) {
        val id = if (idIsLong) idV.asInstanceOf[Long]
        else idV.asInstanceOf[Int].toLong
        buffer.add(sV.asInstanceOf[Double], id)
      }
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (id, score) =>
      InternalRow(if (idIsLong) id else id.toInt, score)
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.ids(i)); bb.putDouble(buffer.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val id = bb.getLong(); val s = bb.getDouble()
      h.add(s, id); i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bounded_top_k"
}

/** Fixed-capacity SMALLEST-ids member collector with a long payload —
  * the aggregate form of the id-ordered LSH bucket cap. A max-heap on
  * id keeps the `k` smallest (root = largest kept, so a row that can't
  * enter costs one compare); ids within a group are unique by
  * construction (one row per (bucket, doc)), so no tie policy is
  * needed. Output is id-ascending, matching the row_number-window
  * formulation it replaces member-for-member — without sorting the
  * full banded key stream. */
final class MemberHeap(val k: Int) extends Serializable {
  // LAZY capacity: LSH bucket groups are overwhelmingly singletons
  // (hash-space keys), so an eager k-sized buffer per group (~16 KB at
  // k=1000) is pure GC churn across hundreds of millions of groups —
  // measured 3× worse than the window formulation before this. Start
  // tiny, grow geometrically to k only for the rare big bucket.
  private[plans] var ids = new Array[Long](math.min(k, 4))
  private[plans] var payloads = new Array[Long](math.min(k, 4))
  private[plans] var size = 0

  private def ensureRoom(): Unit =
    if (size == ids.length && ids.length < k) {
      val cap = math.min(k, ids.length * 4)
      ids = java.util.Arrays.copyOf(ids, cap)
      payloads = java.util.Arrays.copyOf(payloads, cap)
    }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (ids(i) > ids(p)) {
        val ti = ids(i); val tp = payloads(i)
        ids(i) = ids(p); payloads(i) = payloads(p)
        ids(p) = ti; payloads(p) = tp
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      if (l >= size) return
      val r = l + 1
      var m = l
      if (r < size && ids(r) > ids(l)) m = r
      if (ids(m) > ids(i)) {
        val ti = ids(i); val tp = payloads(i)
        ids(i) = ids(m); payloads(i) = payloads(m)
        ids(m) = ti; payloads(m) = tp
        i = m
      } else return
    }
  }

  def add(id: Long, payload: Long): Unit = {
    if (size < k) {
      ensureRoom()
      ids(size) = id; payloads(size) = payload; size += 1
      siftUp(size - 1)
    } else if (id < ids(0)) {
      ids(0) = id; payloads(0) = payload
      siftDown()
    }
  }

  def mergeFrom(other: MemberHeap): Unit = {
    var i = 0
    while (i < other.size) { add(other.ids(i), other.payloads(i)); i += 1 }
  }

  /** (id, payload) pairs in id-ascending order. */
  def sortedAsc: Array[(Long, Long)] = {
    val out = Array.tabulate(size)(i => (ids(i), payloads(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Long, Long), b: (Long, Long)) => a._1 < b._1)
    out
  }
}

/** `bounded_members(id, payload, k)` → array<struct<id, payload>> of
  * the group's k SMALLEST ids with their payloads, id-ascending — the
  * capped-bucket member list as ONE hash aggregate: map-side partials
  * bound every group before the exchange, and nothing sorts the full
  * key stream (the window formulation sorted every banded row just to
  * discard everything past position k). */
case class BoundedMembers(left: Expression, right: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MemberHeap] with BinaryLike[Expression] {

  require(k >= 1, s"k=$k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (idT, pT) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_members needs (bigint id, bigint payload), got " +
            s"${idT.simpleString}, ${pT.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MemberHeap = new MemberHeap(k)

  override def update(buffer: MemberHeap, input: InternalRow): MemberHeap = {
    val idV = left.eval(input)
    if (idV != null) {
      val pV = right.eval(input)
      if (pV != null)
        buffer.add(idV.asInstanceOf[Long], pV.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: MemberHeap, input: MemberHeap): MemberHeap = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: MemberHeap): Any =
    new GenericArrayData(buffer.sortedAsc.map { case (id, p) =>
      InternalRow(id, p)
    })

  override def serialize(buffer: MemberHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.ids(i)); bb.putLong(buffer.payloads(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MemberHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new MemberHeap(k)
    var i = 0
    while (i < n) {
      val id = bb.getLong(); val p = bb.getLong()
      h.add(id, p); i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMembers =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMembers =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedMembers =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bounded_members"
}

/** [[MemberHeap]] with an ARRAY payload and a freshness flag — the
  * unit-vector form for [[graft.store.EmbedIndex]]'s bucket cap, generic
  * over the payload element width so the classic array<double> heap and
  * the float-exchange array<float> twin share ONE copy of the heap
  * invariants (the review lesson: two verbatim copies of
  * siftUp/siftDown/serialize framing silently diverge). Same
  * max-heap-on-id / lazy-geometric-capacity shape as MemberHeap (the
  * r13 lesson: size for the MEDIAN group, not the cap); payload arrays
  * are swapped by reference, copied once on add. The flag rides with
  * each member so the downstream pair expression can skip corpus-corpus
  * pairs. Serialization framing lives once in [[VecMemberHeap.write]] /
  * [[VecMemberHeap.read]], parameterized by a [[VecPayloadCodec]]. */
final class VecMemberHeap[P >: Null <: AnyRef](val k: Int)(
    implicit ct: scala.reflect.ClassTag[P]) extends Serializable {
  private[plans] var ids = new Array[Long](math.min(k, 4))
  private[plans] var payloads = new Array[P](math.min(k, 4))
  private[plans] var flags = new Array[Boolean](math.min(k, 4))
  private[plans] var size = 0

  private def ensureRoom(): Unit =
    if (size == ids.length && ids.length < k) {
      val cap = math.min(k, ids.length * 4)
      ids = java.util.Arrays.copyOf(ids, cap)
      val np = new Array[P](cap)
      System.arraycopy(payloads, 0, np, 0, size)
      payloads = np
      flags = java.util.Arrays.copyOf(flags, cap)
    }

  @inline private def swap(i: Int, p: Int): Unit = {
    val ti = ids(i); val tp = payloads(i); val tf = flags(i)
    ids(i) = ids(p); payloads(i) = payloads(p); flags(i) = flags(p)
    ids(p) = ti; payloads(p) = tp; flags(p) = tf
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (ids(i) > ids(p)) { swap(i, p); i = p } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      if (l >= size) return
      val r = l + 1
      var m = l
      if (r < size && ids(r) > ids(l)) m = r
      if (ids(m) > ids(i)) { swap(i, m); i = m } else return
    }
  }

  def add(id: Long, payload: P, fresh: Boolean): Unit = {
    if (size < k) {
      ensureRoom()
      ids(size) = id; payloads(size) = payload; flags(size) = fresh
      size += 1
      siftUp(size - 1)
    } else if (id < ids(0)) {
      ids(0) = id; payloads(0) = payload; flags(0) = fresh
      siftDown()
    }
  }

  def mergeFrom(other: VecMemberHeap[P]): Unit = {
    var i = 0
    while (i < other.size) {
      add(other.ids(i), other.payloads(i), other.flags(i)); i += 1
    }
  }

  /** (id, payload, fresh) triples in id-ascending order. */
  def sortedAsc: Array[(Long, P, Boolean)] = {
    val out = Array.tabulate(size)(i => (ids(i), payloads(i), flags(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Long, P, Boolean), b: (Long, P, Boolean)) => a._1 < b._1)
    out
  }
}

/** Element codec for [[VecMemberHeap]] serialization — the payload's
  * width and element reads/writes; the member framing (size, id, flag,
  * length) lives once in [[VecMemberHeap.write]]/[[VecMemberHeap.read]]. */
private[graft] sealed trait VecPayloadCodec[P] extends Serializable {
  def elemBytes: Int
  def length(p: P): Int
  def putElems(bb: ByteBuffer, p: P): Unit
  def readElems(bb: ByteBuffer, len: Int): P
}

private[graft] object DoubleVecCodec extends VecPayloadCodec[Array[Double]] {
  val elemBytes = 8
  def length(p: Array[Double]): Int = p.length
  def putElems(bb: ByteBuffer, p: Array[Double]): Unit = {
    var j = 0; while (j < p.length) { bb.putDouble(p(j)); j += 1 }
  }
  def readElems(bb: ByteBuffer, len: Int): Array[Double] = {
    val p = new Array[Double](len)
    var j = 0; while (j < len) { p(j) = bb.getDouble(); j += 1 }
    p
  }
}

private[graft] object FloatVecCodec extends VecPayloadCodec[Array[Float]] {
  val elemBytes = 4
  def length(p: Array[Float]): Int = p.length
  def putElems(bb: ByteBuffer, p: Array[Float]): Unit = {
    var j = 0; while (j < p.length) { bb.putFloat(p(j)); j += 1 }
  }
  def readElems(bb: ByteBuffer, len: Int): Array[Float] = {
    val p = new Array[Float](len)
    var j = 0; while (j < len) { p(j) = bb.getFloat(); j += 1 }
    p
  }
}

private[graft] object VecMemberHeap {
  /** Shared member framing: size, then per member (id:8, flag:1,
    * len:4, elems). */
  def write[P >: Null <: AnyRef](h: VecMemberHeap[P],
                                 c: VecPayloadCodec[P]): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < h.size) { bytes += 13 + c.elemBytes * c.length(h.payloads(i)); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(h.size)
    i = 0
    while (i < h.size) {
      bb.putLong(h.ids(i))
      bb.put(if (h.flags(i)) 1.toByte else 0.toByte)
      bb.putInt(c.length(h.payloads(i)))
      c.putElems(bb, h.payloads(i))
      i += 1
    }
    bb.array()
  }

  def read[P >: Null <: AnyRef : scala.reflect.ClassTag](
      bytes: Array[Byte], k: Int, c: VecPayloadCodec[P]): VecMemberHeap[P] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new VecMemberHeap[P](k)
    var i = 0
    while (i < n) {
      val id = bb.getLong()
      val f = bb.get() == 1.toByte
      val len = bb.getInt()
      h.add(id, c.readElems(bb, len), f)
      i += 1
    }
    h
  }
}

/** `bounded_vec_members(id, uv, fresh, k)` → array<struct<id, uv,
  * fresh>> of the group's k SMALLEST ids with their unit vectors and
  * batch-membership flags, id-ascending — the [[BoundedMembers]] shape
  * for the embedding index's bucket cap (member-identical to the
  * row_number window it replaces, without sorting the full exploded key
  * stream with its ~8·dim-byte payload riding every row). The flag lets
  * [[CosinePairs]] skip corpus-corpus pairs INSIDE the expression —
  * ~(corpus/union)² of the in-bucket dot products, the append's
  * dominant CPU — instead of discarding them after they were computed. */
case class BoundedVecMembers(first: Expression, second: Expression,
                             third: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMemberHeap[Array[Double]]]
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k >= 1, s"k=$k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, ArrayType(DoubleType, _), BooleanType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (idT, pT, fT) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_vec_members needs (bigint id, array<double> uv, boolean fresh), " +
            s"got ${idT.simpleString}, ${pT.simpleString}, ${fT.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("uv", ArrayType(DoubleType, containsNull = false),
        nullable = false),
      StructField("fresh", BooleanType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): VecMemberHeap[Array[Double]] =
    new VecMemberHeap[Array[Double]](k)

  override def update(buffer: VecMemberHeap[Array[Double]],
                      input: InternalRow): VecMemberHeap[Array[Double]] = {
    val idV = first.eval(input)
    if (idV != null) {
      val pV = second.eval(input)
      if (pV != null) {
        val fV = third.eval(input)
        // toDoubleArray copies out of the (reused) unsafe row buffer
        buffer.add(idV.asInstanceOf[Long],
          pV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toDoubleArray(),
          fV != null && fV.asInstanceOf[Boolean])
      }
    }
    buffer
  }

  override def merge(buffer: VecMemberHeap[Array[Double]],
                     input: VecMemberHeap[Array[Double]]): VecMemberHeap[Array[Double]] = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: VecMemberHeap[Array[Double]]): Any =
    new GenericArrayData(buffer.sortedAsc.map { case (id, p, f) =>
      InternalRow(id, new GenericArrayData(p), f)
    })

  override def serialize(buffer: VecMemberHeap[Array[Double]]): Array[Byte] =
    VecMemberHeap.write(buffer, DoubleVecCodec)

  override def deserialize(bytes: Array[Byte]): VecMemberHeap[Array[Double]] =
    VecMemberHeap.read(bytes, k, DoubleVecCodec)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedVecMembers =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedVecMembers =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : BoundedVecMembers =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bounded_vec_members"
}

/** `bounded_vec_members_f(id, uvf, fresh, k)` — [[BoundedVecMembers]]
  * with an array<float> payload (the same [[VecMemberHeap]], float
  * codec): member selection (k smallest ids) is payload-independent, so
  * the kept set is identical to the double heap's; only the shipped
  * vector width changes — the partial-aggregate shuffle carries
  * serialized heaps, so the float payload halves the dominant exchange
  * bytes (4·dim vs 8·dim per member per table) at production embedding
  * dims. Candidate pairs found over the floats are re-verified against
  * the stored doubles (CosineCandidatesF's margin argument), so the
  * precision loss can only widen the candidate set, never the output. */
case class BoundedVecMembersF(first: Expression, second: Expression,
                              third: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMemberHeap[Array[Float]]]
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k >= 1, s"k=$k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, ArrayType(FloatType, _), BooleanType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (idT, pT, fT) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_vec_members_f needs (bigint id, array<float> uvf, boolean fresh), " +
            s"got ${idT.simpleString}, ${pT.simpleString}, ${fT.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("uvf", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("fresh", BooleanType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): VecMemberHeap[Array[Float]] =
    new VecMemberHeap[Array[Float]](k)

  override def update(buffer: VecMemberHeap[Array[Float]],
                      input: InternalRow): VecMemberHeap[Array[Float]] = {
    val idV = first.eval(input)
    if (idV != null) {
      val pV = second.eval(input)
      if (pV != null) {
        val fV = third.eval(input)
        // toFloatArray copies out of the (reused) unsafe row buffer
        buffer.add(idV.asInstanceOf[Long],
          pV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toFloatArray(),
          fV != null && fV.asInstanceOf[Boolean])
      }
    }
    buffer
  }

  override def merge(buffer: VecMemberHeap[Array[Float]],
                     input: VecMemberHeap[Array[Float]]): VecMemberHeap[Array[Float]] = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: VecMemberHeap[Array[Float]]): Any =
    new GenericArrayData(buffer.sortedAsc.map { case (id, p, f) =>
      InternalRow(id, new GenericArrayData(p), f)
    })

  override def serialize(buffer: VecMemberHeap[Array[Float]]): Array[Byte] =
    VecMemberHeap.write(buffer, FloatVecCodec)

  override def deserialize(bytes: Array[Byte]): VecMemberHeap[Array[Float]] =
    VecMemberHeap.read(bytes, k, FloatVecCodec)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedVecMembersF =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedVecMembersF =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : BoundedVecMembersF =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bounded_vec_members_f"
}

object TopKAggregate {
  /** Column wrapper: capped bucket-member list (see BoundedMembers). */
  def boundedMembers(id: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(BoundedMembers(
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(payload), k).toAggregateExpression())

  /** Column wrapper: capped bucket-member list with a unit-vector
    * payload and freshness flag (see BoundedVecMembers). */
  def boundedVecMembers(id: Column, uv: Column, fresh: Column, k: Int): Column =
    GraftColumnBridge.column(BoundedVecMembers(
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(uv),
      GraftColumnBridge.expression(fresh), k).toAggregateExpression())

  /** Column wrapper: the float-payload twin (see BoundedVecMembersF). */
  def boundedVecMembersF(id: Column, uvf: Column, fresh: Column, k: Int): Column =
    GraftColumnBridge.column(BoundedVecMembersF(
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(uvf),
      GraftColumnBridge.expression(fresh), k).toAggregateExpression())

  /** Column wrapper: per-group bounded top-k of (id, score). */
  def boundedTopK(id: Column, score: Column, k: Int): Column =
    GraftColumnBridge.column(BoundedTopK(
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(score), k).toAggregateExpression())
}
