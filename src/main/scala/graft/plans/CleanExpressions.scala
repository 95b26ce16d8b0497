package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for corpus-cleaning stages: corpus-frequency line
  * removal (the C4/RefinedWeb boilerplate filter) and PII redaction.
  * Both are pure per-row maps that stay inside whole-stage codegen —
  * the corpus-level knowledge (which lines are boilerplate) rides in
  * the expression as a broadcast-with-the-task-binary sorted set, the
  * same trade [[SortedLongSetHits]] makes for decontamination.
  */

/** Remove every line of `child` whose exact string is in `dropped`
  * (sorted by UTF8String binary order), re-joining survivors with
  * '\n'. Returns struct<text_clean string, n_dropped int>.
  *
  * Line boundaries are single 0x0A bytes — in UTF-8 no multi-byte
  * sequence contains ASCII bytes, so a byte scan splits safely (same
  * argument as [[WhitespaceTokens]]). A doc whose every line is dropped
  * yields the empty string, not null: the row survives cleaning with
  * empty text, and downstream length gates remove it explicitly.
  *
  * Membership is EXACT string equality (no hash on this side): callers
  * build the dropped set from an exact recount, so a hash collision can
  * never delete an innocent line (see
  * [[graft.functions.Boilerplate.dropFrequentLines]] for the two-phase
  * candidate/verify protocol that keeps the df count cheap anyway). */
case class DropLinesInSet(child: Expression, dropped: Array[UTF8String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"drop_lines_in_set needs string, got ${other.simpleString}")
    }

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes // one copy; line slices are fromBytes views below
    val n = bytes.length
    // collect kept line ranges, count dropped
    val keptStart = new java.util.ArrayList[Integer]()
    val keptLen = new java.util.ArrayList[Integer]()
    var droppedCount = 0
    var keptBytes = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        val len = i - start
        val line = UTF8String.fromBytes(bytes, start, len)
        if (java.util.Arrays.binarySearch(
            dropped.asInstanceOf[Array[AnyRef]], line) >= 0) {
          droppedCount += 1
        } else {
          keptStart.add(start); keptLen.add(len); keptBytes += len
        }
        start = i + 1
      }
      i += 1
    }
    val k = keptStart.size()
    val out =
      if (droppedCount == 0) s // fast path: nothing dropped, no copy
      else if (k == 0) UTF8String.EMPTY_UTF8
      else {
        val buf = new Array[Byte](keptBytes + (k - 1))
        var p = 0
        var j = 0
        while (j < k) {
          if (j > 0) { buf(p) = '\n'; p += 1 }
          System.arraycopy(bytes, keptStart.get(j), buf, p, keptLen.get(j))
          p += keptLen.get(j)
          j += 1
        }
        UTF8String.fromBytes(buf)
      }
    new GenericInternalRow(Array[Any](out, droppedCount))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dropLinesInSet", this, classOf[DropLinesInSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "drop_lines_in_set"
}

/** PII patterns shared by redaction and counting — deliberately written
  * in the common subset of java.util.regex and RE2 (no lookaround, no
  * backreferences) so the DuckDB oracle can run the IDENTICAL pattern
  * strings through its RE2 `regexp_replace(..., 'g')` /
  * `regexp_extract_all`. Replacement ORDER matters and is fixed:
  * email → SSN → phone → IPv4 (the shapes are mutually exclusive on
  * digits-and-separators, but fixing the order makes the composed
  * rewrite deterministic by construction rather than by argument). */
object PiiOps {
  final val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  final val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  final val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  // (pattern, replacement) in application order
  final val Rules: Array[(Pattern, String)] = Array(
    Pattern.compile(EmailPattern) -> "<EMAIL>",
    Pattern.compile(SsnPattern) -> "<SSN>",
    Pattern.compile(PhonePattern) -> "<PHONE>",
    Pattern.compile(Ipv4Pattern) -> "<IP>")

  def redact(s: UTF8String): UTF8String = {
    var t: CharSequence = s.toString
    var changed = false
    var i = 0
    while (i < Rules.length) {
      val m = Rules(i)._1.matcher(t)
      if (m.find()) { t = m.replaceAll(Rules(i)._2); changed = true }
      i += 1
    }
    if (!changed) s else UTF8String.fromString(t.toString)
  }

  /** Non-overlapping leftmost match counts per pattern, each against the
    * ORIGINAL text (mirrors `len(regexp_extract_all(t, pat))` per
    * pattern in DuckDB — counting on the original, not the progressively
    * rewritten text, is what makes the four counts independent). */
  def counts(s: UTF8String): InternalRow = {
    val str = s.toString
    val out = new Array[Any](Rules.length)
    var i = 0
    while (i < Rules.length) {
      val m = Rules(i)._1.matcher(str)
      var c = 0
      while (m.find()) c += 1
      out(i) = c
      i += 1
    }
    new GenericInternalRow(out)
  }
}

/** `pii_redact(text)` — rewrite email/SSN/phone/IPv4 spans to typed
  * placeholder tokens. Codegen calls through to the shared compiled
  * patterns; rows with no PII return the input UTF8String unchanged
  * (zero copies — the dominant case in a clean corpus). */
case class PiiRedact(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pii_redact needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PiiOps.redact(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PiiOps.redact($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pii_redact"
}

/** `pii_counts(text)` — struct<n_email, n_ssn, n_phone, n_ip> match
  * counts on the original text (the audit row a redaction pipeline
  * logs; also the cheap pre-filter: `n_* = 0` rows skip the rewrite). */
case class PiiCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ssn", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pii_counts needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PiiOps.counts(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PiiOps.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pii_counts"
}
