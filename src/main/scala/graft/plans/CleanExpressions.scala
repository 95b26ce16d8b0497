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

/** Shared token-window hashing for the span-dedup expressions: the gram
  * at position i is tokens[i, i+n) joined by single spaces, hashed with
  * the same space-joined-bytes XXH64 recipe (seed 42) as
  * [[graft.plans.TextExpressions]]' WordShingleHashes — so phase-1 hash
  * counting over `word_shingle_hashes` output and the in-expression
  * probes below see identical values for identical grams. */
private[plans] object SpanOps {
  final val Seed = 42L

  private val scratch =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 12))

  def hashWindow(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 start: Int, len: Int): Long = {
    var total = 0
    var j = 0
    while (j < len) {
      val s = arr.getUTF8String(start + j)
      if (s != null) total += s.numBytes() + 1
      j += 1
    }
    var buf = scratch.get()
    if (buf.length < total) {
      buf = new Array[Byte](math.max(total, buf.length * 2))
      scratch.set(buf)
    }
    var pos = 0
    var written = 0
    j = 0
    while (j < len) {
      val s = arr.getUTF8String(start + j)
      if (s != null) {
        if (written > 0) { buf(pos) = ' '; pos += 1 }
        s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
        pos += s.numBytes()
        written += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, Seed)
  }

  def gramString(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                 start: Int, len: Int): UTF8String = {
    val w = new Array[UTF8String](len)
    var j = 0
    while (j < len) { w(j) = arr.getUTF8String(start + j); j += 1 }
    UTF8String.concatWs(UTF8String.fromString(" "), w: _*)
  }

  def tokenArrayType: org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
}

/** The DISTINCT n-gram strings of a token array whose window hash lands
  * in `hashes` (sorted ascending) — the candidate-extraction step of the
  * span-dedup two-phase protocol: only grams already implicated by the
  * cheap hash-df count get their STRINGS pulled out for the exact
  * recount, so the string shuffle is candidate-sized. Hash misses (the
  * overwhelming case) allocate nothing: the window hashes in a reused
  * scratch buffer and the gram string is only built on a set hit.
  * A doc with fewer than n tokens yields no grams. */
case class GramsInHashSet(child: Expression, n: Int, hashes: Array[Long])
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grams_in_hash_set needs array<string>, got ${other.simpleString}")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n || hashes.length == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= nTok - n) {
      if (java.util.Arrays.binarySearch(hashes, SpanOps.hashWindow(arr, i, n)) >= 0)
        seen.add(SpanOps.gramString(arr, i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var t = 0
    while (it.hasNext) { out(t) = it.next(); t += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramsInHashSet", this, classOf[GramsInHashSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "grams_in_hash_set"
}

/** Remove every token covered by an n-gram window whose exact string is
  * in `dropped` (sorted by UTF8String binary order), re-joining the
  * survivors with single spaces. Returns
  * struct<text_clean string, n_dropped int> — n_dropped counts REMOVED
  * TOKENS (union of covering windows, so overlapping frequent grams
  * never double-count).
  *
  * Membership is exact-string, like [[DropLinesInSet]] — but the hot
  * loop probes by window HASH first against the hashes of the dropped
  * grams (precomputed once per task at construction) and only builds
  * the gram string to confirm on a hit, so a scan position on clean
  * text costs one scratch-buffer hash and zero allocations; a hash
  * collision costs one string compare and changes nothing.
  *
  * A doc with fewer than n tokens has no windows and passes through
  * re-joined. The output is TOKEN-NORMALIZED text (single-space
  * joined): span dedup operates on the tokenized view by definition —
  * a removed span's surrounding whitespace has no meaningful survivor. */
case class DropSpansInSet(child: Expression, n: Int, dropped: Array[UTF8String])
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"drop_spans_in_set needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val droppedHashes: Array[Long] = {
    val hs = dropped.map { g =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        g.getBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        g.numBytes(), SpanOps.Seed)
    }
    java.util.Arrays.sort(hs)
    hs
  }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val nTok = arr.numElements()
    val SEP = UTF8String.fromString(" ")
    if (nTok < n || dropped.length == 0) {
      val all = new Array[UTF8String](nTok)
      var i = 0
      while (i < nTok) { all(i) = arr.getUTF8String(i); i += 1 }
      return new GenericInternalRow(
        Array[Any](UTF8String.concatWs(SEP, all: _*), 0))
    }
    val covered = new Array[Boolean](nTok)
    var i = 0
    while (i <= nTok - n) {
      if (java.util.Arrays.binarySearch(droppedHashes,
            SpanOps.hashWindow(arr, i, n)) >= 0 &&
          java.util.Arrays.binarySearch(
            dropped.asInstanceOf[Array[AnyRef]],
            SpanOps.gramString(arr, i, n)) >= 0) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var nDropped = 0
    var k = 0
    while (k < nTok) { if (covered(k)) nDropped += 1; k += 1 }
    val kept = new Array[UTF8String](nTok - nDropped)
    var p = 0
    k = 0
    while (k < nTok) {
      if (!covered(k)) { kept(p) = arr.getUTF8String(k); p += 1 }
      k += 1
    }
    new GenericInternalRow(Array[Any](
      if (kept.isEmpty) UTF8String.EMPTY_UTF8 else UTF8String.concatWs(SEP, kept: _*),
      nDropped))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dropSpansInSet", this, classOf[DropSpansInSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "drop_spans_in_set"
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
