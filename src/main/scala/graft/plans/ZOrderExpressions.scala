package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave keys — the multi-column clustering layout
  * behind [[graft.store.ZoneMap]] rectangle pruning.
  *
  * A table sorted on one key gives that key tight per-file min/max zones
  * and every OTHER column useless ones; interleaving the bits of two or
  * three keys makes files tile a space-filling curve, so per-file zones
  * are tight rectangles in ALL interleaved dimensions at once — a
  * rectangle predicate then prunes files on every dimension it touches
  * (the standard lakehouse Z-ORDER layout, e.g. Delta OPTIMIZE ZORDER).
  *
  * The key is PURELY a layout device: correctness never depends on it
  * (ZoneMap re-applies predicates as ordinary filters), so the value
  * mapping only needs to be order-preserving per dimension, not
  * bijective. Each input is clamped to int range and biased to an
  * unsigned 32-bit value (`v + 2^31`, order-preserving incl. negatives),
  * then the top bits interleave MSB-first: 31 bits/dim for 2 dims (62-bit
  * key), 20 bits/dim for 3 (60-bit) — keys stay non-negative longs.
  *
  * Arity is fixed at 2 or 3 (Binary/TernaryExpression → whole-stage
  * codegen via nullSafeCodeGen like every other graft expression); past
  * 3 dims the per-dimension resolution (62/n bits) erodes the pruning
  * power that justifies the shuffle, so wider interleaves are
  * deliberately unsupported.
  */
object ZOrder {

  /** Order-preserving signed→unsigned-32 bias with clamping. */
  @inline private[plans] def biased(v: Long): Long = {
    val c = if (v < Int.MinValue) Int.MinValue.toLong
            else if (v > Int.MaxValue) Int.MaxValue.toLong else v
    c + 0x80000000L // now in [0, 2^32)
  }

  /** Interleave the top `bits` of each biased value, MSB-first,
    * round-robin across dimensions. */
  private[plans] def interleave(vs: Array[Long], bits: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var d = 0
      while (d < vs.length) {
        out = (out << 1) | ((vs(d) >>> (31 - b)) & 1L)
        d += 1
      }
      b += 1
    }
    out
  }

  def compute2(a: Long, b: Long): Long =
    interleave(Array(biased(a), biased(b)), 31)

  def compute3(a: Long, b: Long, c: Long): Long =
    interleave(Array(biased(a), biased(b), biased(c)), 20)

  /** Column API: `zkey(col("x"), col("y"))` — pass 2 or 3 integral
    * columns. Use as the `repartitionByRange` + `sortWithinPartitions`
    * key when writing ([[graft.store.ZoneMap]] scaladoc shows the full
    * clustering recipe). */
  def zkey(cols: Column*): Column = {
    val es = cols.map(GraftColumnBridge.expression)
    cols.size match {
      case 2 => GraftColumnBridge.column(ZOrderKey2(es(0), es(1)))
      case 3 => GraftColumnBridge.column(ZOrderKey3(es(0), es(1), es(2)))
      case n => throw new IllegalArgumentException(
        s"zkey takes 2 or 3 columns, got $n")
    }
  }

  private[plans] def integralCheck(name: String, dts: Seq[DataType]): TypeCheckResult = {
    val ok = dts.forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name needs integral inputs, got ${dts.map(_.simpleString).mkString(", ")}")
  }

  private[plans] def asLong(v: Any): Long = v match {
    case b: Byte  => b.toLong
    case s: Short => s.toLong
    case i: Int   => i.toLong
    case l: Long  => l
  }
}

/** 2-D Morton key: 31 bits per dimension, 62-bit non-negative long. */
case class ZOrderKey2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    ZOrder.integralCheck("zkey", Seq(left.dataType, right.dataType))

  def compute(a: Any, b: Any): Long =
    ZOrder.compute2(ZOrder.asLong(a), ZOrder.asLong(b))

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zorder2", this, classOf[ZOrderKey2].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 3-D Morton key: 20 bits per dimension, 60-bit non-negative long. */
case class ZOrderKey3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    ZOrder.integralCheck("zkey", children.map(_.dataType))

  def compute(a: Any, b: Any, c: Any): Long =
    ZOrder.compute3(ZOrder.asLong(a), ZOrder.asLong(b), ZOrder.asLong(c))

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = compute(a, b, c)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zorder3", this, classOf[ZOrderKey3].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
