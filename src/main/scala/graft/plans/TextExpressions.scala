package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the tokenization hot path.
  *
  * Every text operator (stats, triage, curation, shard packing, chunking,
  * vocabulary, MinHash shingles, SimHash votes) starts from
  * `TextFunctions.tokens`, previously built from
  * `regexp_replace(trim) + split(WS+)` — two java.util.regex passes per
  * document. Correct and codegen'd, but regex state-machine overhead
  * dominates the flagship text suite (~28 s of text_stats at 5M docs is
  * mostly tokenization). The separator class is six ASCII characters, and
  * in UTF-8 no multi-byte sequence contains ASCII bytes (continuations
  * are ≥ 0x80), so a single byte scan tokenizes safely with zero regex
  * work and zero intermediate strings.
  *
  * Semantics are EXACTLY the regex formulation's (and the DuckDB oracle
  * SQL's `regexp_replace` + `string_split_regex` mirror): split on runs
  * of [ \t\n\x0B\f\r], leading/trailing separators trimmed, whitespace-only
  * or empty input → empty array. Pinned by TextExpressionsSpec's
  * equivalence property and every tokens-derived oracle row.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_tokens needs string, got ${other.simpleString}")
    }

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // pre-count tokens so the output array allocates exactly once
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) count += 1
      while (i < n && !isWs(bytes(i))) i += 1
    }
    val out = new Array[Any](count)
    var t = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        out(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsTokens", this, classOf[WhitespaceTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ws_tokens"
}

/** Token COUNT under WhitespaceTokens' exact semantics, without
  * materializing the token array — `size(tokens(text))` allocates one
  * UTF8String per token just to count them; stats columns (n_tokens,
  * mean token length) only need the number. Same single byte scan. */
case class WhitespaceTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_token_count needs string, got ${other.simpleString}")
    }

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) count += 1
      while (i < n && !isWs(bytes(i))) i += 1
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsTokenCount", this, classOf[WhitespaceTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ws_token_count"
}

/** Count of bytes in [lo, hi] → int. The byte-scan replacement for
  * `length(regexp_replace(text, "[^X]", ""))` counting an ASCII class
  * (digits, uppercase): same UTF-8 safety argument as WhitespaceTokens —
  * ASCII bytes never occur inside multi-byte sequences, and non-ASCII
  * characters can never match an ASCII-only class, so counting matching
  * BYTES equals counting matching CHARACTERS. */
case class AsciiRangeCount(child: Expression, lo: Byte, hi: Byte)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ascii_range_count needs string, got ${other.simpleString}")
    }

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= lo && b <= hi) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiRangeCount", this, classOf[AsciiRangeCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ascii_range_count"
}

/** Count of characters in an explicit ASCII set → int. Same byte-scan
  * safety argument as AsciiRangeCount, for classes that aren't a
  * contiguous range (punctuation). The 128-entry membership table is
  * built once per expression instance. */
case class AsciiSetCount(child: Expression, chars: String)
    extends UnaryExpression {

  require(chars.nonEmpty && chars.forall(_ < 0x80),
    "ascii_set_count needs a non-empty ASCII character set")

  @transient private lazy val member: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ascii_set_count needs string, got ${other.simpleString}")
    }

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && member(b)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiSetCount", this, classOf[AsciiSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ascii_set_count"
}

/** Word n-gram shingles of a token array, distinct, first-occurrence
  * order — semantics identical to the Column formulation it replaces
  * (`array_distinct(transform(sequence(0, n-gram), i => concat_ws(" ",
  * slice(tk, i+1, n))))`, with the size<n → single-joined-shingle and
  * empty → [""] edges), pinned equal by TextExpressionsSpec.
  *
  * Why native: the HOF transform evaluates INTERPRETED and each window
  * allocates a sliced GenericArrayData + concat — jstack of the 5M-doc
  * jaccard run showed the scan pinned in Slice.nullSafeEval. Here each
  * shingle is one UTF8String.concatWs over a reused window array. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got ${other.simpleString}")
    }

  private val SEP = UTF8String.fromString(" ")

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) {
      val all = new Array[UTF8String](nTok)
      var i = 0
      while (i < nTok) { all(i) = arr.getUTF8String(i); i += 1 }
      return new GenericArrayData(Array[Any](UTF8String.concatWs(SEP, all: _*)))
    }
    val window = new Array[UTF8String](n)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= nTok - n) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SEP, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var t = 0
    while (it.hasNext) { out(t) = it.next(); t += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Distinct xxhash64 values of word n-gram shingles, ascending —
  * `sort(array_distinct(xxhash64(shingle)))` without ever materializing
  * a shingle string: window bytes accumulate in a reused scratch buffer
  * and hash via the same XXH64 primitive Spark's `xxhash64` uses
  * (seed 42), so values are bit-equal to hashing the WordShingles
  * strings. The candidate phases of the jaccard join and MinHash LSH
  * consume ONLY these hashes (exact string verification is
  * candidate-sized), so the corpus scan allocates nothing per window.
  *
  * Accepts EITHER a token array OR the raw text string. The string path
  * fuses WhitespaceTokens in: token boundaries land in two int arrays
  * and window bytes copy straight from the text bytes — profiled at 5M
  * docs, materializing the intermediate token array costs ~80 s by
  * itself (250M UTF8String allocations), which the fused path skips
  * entirely. Both paths produce bit-identical hashes
  * (TextExpressionsSpec pins them equal on the adversarial corpus). */
case class WordShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingle_hashes needs array<string> or string, got ${other.simpleString}")
    }

  @transient private lazy val fromText: Boolean = child.dataType == StringType

  @transient private lazy val scratch =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 12))

  private def hashWindow(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                         start: Int, len: Int): Long = {
    // Null elements are SKIPPED, matching the concat_ws semantics of the
    // HOF reference formulation (and of WordShingles, whose
    // UTF8String.concatWs drops null inputs) — the type check accepts
    // containsNull=true, so this path must tolerate them.
    var total = 0
    var j = 0
    while (j < len) {
      val s = arr.getUTF8String(start + j)
      if (s != null) total += s.numBytes() + 1
      j += 1
    }
    var buf = scratch.get()
    if (buf.length < total) {
      // max(total, 2×) — highestOneBit(total)·2 overflows negative past
      // 1 GiB; geometric growth without the power-of-two round-up is safe.
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
    // hash the scratch bytes in place — XxHash64Function.hash(UTF8String)
    // reduces to exactly this call, minus the per-window wrapper object
    // (230M windows per 5M-doc scan made that wrapper measurable)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, seed)
  }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n)
      return new GenericArrayData(Array(hashWindow(arr, 0, nTok)))
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hashWindow(arr, i, n); i += 1 }
    sortedDistinct(hs)
  }

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** Copy tokens [start, start+len) of the text into the scratch buffer
    * joined by single spaces and hash — the string-child mirror of
    * [[hashWindow]] (no nulls possible here). */
  private def hashTextWindow(bytes: Array[Byte], starts: Array[Int],
                             ends: Array[Int], start: Int, len: Int): Long = {
    var total = 0
    var j = 0
    while (j < len) { total += ends(start + j) - starts(start + j) + 1; j += 1 }
    var buf = scratch.get()
    if (buf.length < total) {
      buf = new Array[Byte](math.max(total, buf.length * 2))
      scratch.set(buf)
    }
    var pos = 0
    j = 0
    while (j < len) {
      if (j > 0) { buf(pos) = ' '; pos += 1 }
      val s0 = starts(start + j); val tl = ends(start + j) - s0
      System.arraycopy(bytes, s0, buf, pos, tl)
      pos += tl
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, seed)
  }

  def computeText(str: UTF8String): GenericArrayData = {
    val bytes = str.getBytes
    val len = bytes.length
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) nTok += 1
      while (i < len && !isWs(bytes(i))) i += 1
    }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s0 = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s0) { starts(t) = s0; ends(t) = i; t += 1 }
    }
    if (nTok < n)
      return new GenericArrayData(
        Array(hashTextWindow(bytes, starts, ends, 0, nTok)))
    val m = nTok - n + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) { hs(i) = hashTextWindow(bytes, starts, ends, i, n); i += 1 }
    sortedDistinct(hs)
  }

  private def sortedDistinct(hs: Array[Long]): GenericArrayData = {
    val m = hs.length
    java.util.Arrays.sort(hs)
    var distinct = 1
    var i2 = 1
    while (i2 < m) { if (hs(i2) != hs(i2 - 1)) distinct += 1; i2 += 1 }
    if (distinct == m) return new GenericArrayData(hs)
    val out = new Array[Long](distinct)
    out(0) = hs(0)
    var t = 1
    i2 = 1
    while (i2 < m) {
      if (hs(i2) != hs(i2 - 1)) { out(t) = hs(i2); t += 1 }
      i2 += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    if (fromText) computeText(input.asInstanceOf[UTF8String])
    else compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingleHashes", this, classOf[WordShingleHashes].getName)
    val method = if (fromText) "computeText" else "compute"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.$method($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

/** Count of a long-array column's elements that occur in a fixed sorted
  * long array (binary search per element) — the expression form of a
  * `explode + broadcast semi-join + count` membership probe.
  *
  * Why an expression: profiled at 5M docs, exploding 302M shingle-hash
  * rows just to semi-join them against a 60k-entry benchmark set cost
  * 137 s — the generator + per-row join machinery, not the hashing. A
  * per-row binary-search count over the same sorted set is a pure map
  * with zero extra rows. The set rides in the expression and ships with
  * the (torrent-broadcast) task binary — callers gate its size
  * ([[graft.functions.Dedup.benchmarkOverlap]] falls back to the
  * explode+join plan above ~4M entries). */
case class SortedLongSetHits(child: Expression, set: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_long_set_hits needs array<long>, got ${other.simpleString}")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val m = arr.numElements()
    var c = 0
    var i = 0
    while (i < m) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedLongSetHits", this, classOf[SortedLongSetHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sorted_long_set_hits"
}

/** The prefix-filter index of a SORTED-DISTINCT shingle-hash array under
  * an ESTIMATED document-frequency order: the |S| − ⌈τ·|S|⌉ + 1 rarest
  * elements, rarity = (df̂ asc, hash asc) where df̂ is looked up by
  * binary search in a fixed sorted table (absent → 0, capped at 2³¹−1).
  *
  * Why an estimate is sound: the prefix-filter theorem (Bayardo et al.,
  * WWW'07) holds for ANY fixed total order on the shingle universe —
  * two sets with J ≥ τ share an element inside both prefixes no matter
  * how the order was chosen. Exact df is only the strongest PRUNING
  * heuristic; a sampled estimate keeps recall exactly and trades a few
  * more candidates (all discarded by the exact verify) for removing the
  * full-corpus df shuffle — the dominant cost of the exact jaccard join
  * at 5M docs. The table rides in the expression with the task binary,
  * so the whole prefix computation is a pure map inside whole-stage
  * codegen: candidate generation needs NO corpus-sized exchange at all.
  *
  * Input contract: the child array must be sorted ascending and
  * distinct ([[WordShingleHashes]] output) — the hash tiebreak reuses
  * the array position as the hash rank. */
case class RarityPrefix(child: Expression, dfKeys: Array[Long],
                        dfCounts: Array[Long], tauNum: Int, tauDen: Int)
    extends UnaryExpression {

  require(tauNum > 0 && tauNum <= tauDen, s"need 0 < tau <= 1, got $tauNum/$tauDen")
  require(dfKeys.length == dfCounts.length, "df table arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rarity_prefix needs array<long>, got ${other.simpleString}")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    // prefixLen = m − ⌈τ·m⌉ + 1, exact integer arithmetic
    val pLen = m - ((tauNum.toLong * m + tauDen - 1) / tauDen).toInt + 1
    // composite sort key (df̂ << 32 | position): child is h-sorted, so
    // position IS the hash rank and one primitive sort yields the
    // (df̂ asc, h asc) order with zero boxing
    val keys = new Array[Long](m)
    var i = 0
    while (i < m) {
      val idx = java.util.Arrays.binarySearch(dfKeys, arr.getLong(i))
      val df = if (idx >= 0) math.min(dfCounts(idx), Int.MaxValue.toLong) else 0L
      keys(i) = (df << 32) | i
      i += 1
    }
    java.util.Arrays.sort(keys)
    val out = new Array[Long](pLen)
    i = 0
    while (i < pLen) {
      out(i) = arr.getLong((keys(i) & 0xFFFFFFFFL).toInt)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rarityPrefix", this, classOf[RarityPrefix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rarity_prefix"
}

/** Hashing-trick featurization of a token array: signed md5-nibble
  * counts over `dim` buckets, emitted as array<struct<bucket, weight>>
  * with zero-weight buckets dropped, bucket ascending.
  *
  * Recipe (must stay bit-equal to the `embed_docs` DuckDB oracle, which
  * computes it from `md5(token)` HEX): bucket = (nib1·16 + nib2) mod dim
  * = (first md5 byte, unsigned) mod dim; sign = +1 iff nib3 (high nibble
  * of the second byte) is odd, i.e. bit 4 of byte 1.
  *
  * Why an expression: the Column formulation exploded every token and
  * re-aggregated `groupBy(id, bucket)` — a corpus·tokens-row shuffle
  * into a ~(docs·dim)-group hash map (~235M groups at 5M docs, the same
  * mostly-unique-key aggregate disease the jaccard df count had). Per
  * row the whole vector is computable locally, so featurization is a
  * pure map stage: no shuffle, no aggregate map, one md5 per token. */
case class HashedFeatures(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0 && dim <= 256, s"dim must be in 1..256, got $dim")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_features needs array<string>, got ${other.simpleString}")
    }

  // one digest per thread — MessageDigest is stateful and this expression
  // instance is shared across a stage's tasks via the codegen reference
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val counts = new Array[Long](dim)
    val digest = md.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val hash = digest.digest(arr.getUTF8String(i).getBytes)
      val bucket = (hash(0) & 0xFF) % dim
      counts(bucket) += (if (((hash(1) >> 4) & 1) == 1) 1L else -1L)
      i += 1
    }
    var nnz = 0
    var b = 0
    while (b < dim) { if (counts(b) != 0L) nnz += 1; b += 1 }
    val out = new Array[Any](nnz)
    var j = 0
    b = 0
    while (b < dim) {
      if (counts(b) != 0L) {
        out(j) = org.apache.spark.sql.catalyst.InternalRow(b, counts(b))
        j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedFeatures", this, classOf[HashedFeatures].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hashed_features"
}

/** fastText-style LINEAR CLASSIFIER HEAD over the hashing-trick features
  * (Joulin et al. 2016's model shape: hashed bag-of-words → linear
  * layer), FUSED with the hashing: margin = bias + Σ_token sign(token) ·
  * weights(bucket(token)), with bucket/sign EXACTLY HashedFeatures'
  * md5-nibble recipe — so the margin over integer weights is the exact
  * integer dot product of the signed-count feature vector with the
  * weight vector, reproducible from raw text in any engine that has md5
  * (the `curate_scored` DuckDB oracle recomputes it value-for-value).
  *
  * Integer weights are the fixed-point discipline the rest of the
  * library uses for cross-engine-exact scoring (a float dot would be
  * summation-order-sensitive); a trained float model is used here by
  * scaling to integer milli-units, which changes no decision at any
  * sensible precision. dim = weights.length.
  *
  * Why fused (token child, not the features array): the margin needs no
  * intermediate per-row feature array — one md5 per token, one
  * accumulator, a pure codegen map stage at any corpus size. */
case class LinearMargin(child: Expression, weights: Seq[Long], bias: Long)
    extends UnaryExpression {

  require(weights.nonEmpty && weights.length <= 256,
    s"weights length must be in 1..256, got ${weights.length}")

  private val dim = weights.length
  @transient private lazy val w = weights.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"linear_margin needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val digest = md.get()
    val n = arr.numElements()
    var margin = bias
    var i = 0
    while (i < n) {
      digest.reset()
      val hash = digest.digest(arr.getUTF8String(i).getBytes)
      val bucket = (hash(0) & 0xFF) % dim
      val sign = if (((hash(1) >> 4) & 1) == 1) 1L else -1L
      margin += sign * w(bucket)
      i += 1
    }
    margin
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linearMargin", this, classOf[LinearMargin].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "linear_margin"
}

/** UNSIGNED per-bucket token-occurrence counts over the hashing-trick
  * bucket ([[HashedFeatures]]' md5-nibble recipe, WITHOUT the sign):
  * array<struct<bucket int, c long>>, zero buckets dropped. The
  * count-vector view distribution estimators need — a signed count can
  * be negative and has no probability reading. Emitting the per-row
  * vector (≤ dim entries) instead of per-token rows keeps the train
  * aggregation's explode bounded by dim per document. */
case class BucketCounts(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0 && dim <= 256, s"dim must be in 1..256, got $dim")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_counts needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val counts = new Array[Long](dim)
    val digest = md.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val hash = digest.digest(arr.getUTF8String(i).getBytes)
      counts((hash(0) & 0xFF) % dim) += 1L
      i += 1
    }
    var nnz = 0
    var b = 0
    while (b < dim) { if (counts(b) != 0L) nnz += 1; b += 1 }
    val out = new Array[Any](nnz)
    var j = 0
    b = 0
    while (b < dim) {
      if (counts(b) != 0L) {
        out(j) = org.apache.spark.sql.catalyst.InternalRow(b, counts(b))
        j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketCounts", this, classOf[BucketCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bucket_counts"
}

/** UNSIGNED hashed-bucket weight sum: Σ_token weights(bucket(token))
  * with [[HashedFeatures]]' bucket recipe and no sign — the scoring
  * pass of hashed-feature importance estimators ([[BucketCounts]] is
  * the matching train pass). One fused md5 + accumulate per token,
  * pure codegen map, exact integer result. dim = weights.length. */
case class BucketWeightSum(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  require(weights.nonEmpty && weights.length <= 256,
    s"weights length must be in 1..256, got ${weights.length}")

  private val dim = weights.length
  @transient private lazy val w = weights.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_weight_sum needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val digest = md.get()
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      digest.reset()
      val hash = digest.digest(arr.getUTF8String(i).getBytes)
      s += w((hash(0) & 0xFF) % dim)
      i += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketWeightSum", this, classOf[BucketWeightSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bucket_weight_sum"
}

/** Per-document word n-gram repetition statistics, FUSED from the raw
  * text: {{{ struct(total: int, distinct: int, top: int) }}}
  * over the `windows = max(tokenCount - n + 1, 0)` contiguous n-grams of
  * the WhitespaceTokens tokenization — `total` the window count,
  * `distinct` the distinct-n-gram count, `top` the highest single n-gram
  * frequency (0 when there are no windows). The Gopher-family repetition
  * filters (Rae et al. 2021 §A1.1: "fraction of duplicate n-grams",
  * "fraction in the most common n-gram") are ratios of these integers —
  * emitting raw counts keeps downstream thresholds exact and the
  * cross-engine oracle hashable (no float division on either side).
  *
  * Why fused (string child, not array<string>): the statistics are pure
  * functions of one row's bytes, and the corpus-scale cost of the
  * compose-with-ws_tokens formulation is ALLOCATION, not arithmetic —
  * profiled at 5M docs, `sum(size(ws_tokens(text)))` alone costs ~80 s
  * against a 3.6 s count-only byte scan, i.e. materializing 250M token
  * UTF8Strings dominates everything downstream (a first HashMap-based
  * version of this expression measured 250 s for exactly this reason).
  * Here token BOUNDARIES live in two int arrays, windows are compared
  * byte-wise in place via a sorted index permutation, and the only
  * allocations are four primitive arrays per document. Window equality
  * is token-sequence equality, which equals joined-string equality
  * (tokens contain no separators), so the counts are bit-identical to
  * the DuckDB string-grouping oracle. */
case class NgramRepetition(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("total", IntegerType, nullable = false),
    StructField("distinct", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_repetition needs string, got ${other.simpleString}")
    }

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** Lexicographic-ish total order on windows a and b (window i = tokens
    * i..i+n-1, compared token by token, unsigned bytes then length).
    * ONLY the equivalence classes matter for the counts; any total order
    * groups equal windows adjacently after the sort. */
  private def cmpWindows(bytes: Array[Byte], starts: Array[Int],
                         ends: Array[Int], a: Int, b: Int): Int = {
    var k = 0
    while (k < n) {
      var i = starts(a + k); val ie = ends(a + k)
      var j = starts(b + k); val je = ends(b + k)
      while (i < ie && j < je) {
        val d = (bytes(i) & 0xFF) - (bytes(j) & 0xFF)
        if (d != 0) return d
        i += 1; j += 1
      }
      val d = (ie - starts(a + k)) - (je - starts(b + k))
      if (d != 0) return d
      k += 1
    }
    0
  }

  /** 3-way quicksort of the index array (duplicate-heavy by design —
    * that is what the statistic measures). Insertion sort below 8. */
  private def sortIdx(idx: Array[Int], lo: Int, hi: Int,
                      bytes: Array[Byte], starts: Array[Int], ends: Array[Int]): Unit = {
    if (hi - lo < 8) {
      var i = lo + 1
      while (i <= hi) {
        val v = idx(i); var j = i - 1
        while (j >= lo && cmpWindows(bytes, starts, ends, idx(j), v) > 0) {
          idx(j + 1) = idx(j); j -= 1
        }
        idx(j + 1) = v; i += 1
      }
      return
    }
    val pivot = idx(lo + (hi - lo) / 2)
    var lt = lo; var gt = hi; var i = lo
    while (i <= gt) {
      val c = cmpWindows(bytes, starts, ends, idx(i), pivot)
      if (c < 0) { val t = idx(lt); idx(lt) = idx(i); idx(i) = t; lt += 1; i += 1 }
      else if (c > 0) { val t = idx(gt); idx(gt) = idx(i); idx(i) = t; gt -= 1 }
      else i += 1
    }
    sortIdx(idx, lo, lt - 1, bytes, starts, ends)
    sortIdx(idx, gt + 1, hi, bytes, starts, ends)
  }

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    // pass 1: count tokens; pass 2: record boundaries
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) nTok += 1
      while (i < len && !isWs(bytes(i))) i += 1
    }
    val windows = nTok - n + 1
    if (windows <= 0)
      return org.apache.spark.sql.catalyst.InternalRow(0, 0, 0)
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s0 = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s0) { starts(t) = s0; ends(t) = i; t += 1 }
    }
    val idx = new Array[Int](windows)
    i = 0
    while (i < windows) { idx(i) = i; i += 1 }
    sortIdx(idx, 0, windows - 1, bytes, starts, ends)
    var distinct = 1
    var top = 1
    var run = 1
    i = 1
    while (i < windows) {
      if (cmpWindows(bytes, starts, ends, idx(i - 1), idx(i)) == 0) {
        run += 1
        if (run > top) top = run
      } else { distinct += 1; run = 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(windows, distinct, top)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramRepetition", this, classOf[NgramRepetition].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_repetition"
}

/** Delta-varint position-list codec — the at-rest compression of
  * [[graft.store.PhraseIndex]] (r16): a sorted distinct int position
  * list is stored as LEB128 unsigned varints of its GAPS (first value,
  * then successive differences). Token positions are dense and gaps
  * are small, so most gaps fit one byte where the plain `array<int>`
  * layout paid four plus parquet's per-element repetition overhead —
  * the standard postings-compression move (Manning et al., IIR §5.3,
  * re-expressed columnar: the whole list is ONE binary cell, so parquet
  * stores byte runs instead of int elements). Input is defensively
  * sorted (the index writes sorted lists; a future writer that forgets
  * must not corrupt the decode); gaps are therefore always ≥ 0.
  * [[PhraseTf]] decodes in-expression — the compact form is what
  * crosses the (query, doc) exchange. */
case class DeltaVarintPositions(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"delta_varint_positions needs array<int>, got ${other.simpleString}")
    }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val p = arr.toIntArray()
    java.util.Arrays.sort(p)
    val out = new Array[Byte](p.length * 5) // 5 bytes bounds any uint32
    var o = 0
    var prev = 0
    var i = 0
    while (i < p.length) {
      var g = p(i) - prev
      prev = p(i)
      while ((g & ~0x7F) != 0) {
        out(o) = ((g & 0x7F) | 0x80).toByte; o += 1; g >>>= 7
      }
      out(o) = g.toByte; o += 1
      i += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deltaVarint", this,
      classOf[DeltaVarintPositions].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "delta_varint_positions"
}

/** Phrase term-frequency from per-term position lists — the verify core
  * of [[graft.store.PhraseIndex]]'s positional retrieval: given one
  * (idx, posns) member per phrase slot (idx 0..k−1 = the phrase's token
  * order; posns = that slot's TERM's positions in one document,
  * delta-varint encoded per [[DeltaVarintPositions]] and decoded here,
  * inside the expression, after the compact form crossed the exchange),
  * returns how many start positions open an in-order chain
  * p₀ < p₁ < … < p₍k−1₎ with every step within the slop window:
  * `p_i ∈ (p_{i−1}, p_{i−1} + 1 + slop]`. slop = 0 is the EXACT phrase
  * (each step lands on the adjacent token); slop = s is ordered
  * proximity with up to s interleaving tokens per step (the
  * sloppy-phrase contract). 0 when any slot is missing (the doc lacks
  * a phrase term) or duplicated input is malformed.
  *
  * The chain search is a BACKWARD reachability pass, not greedy
  * matching: ok₍k−1₎ = slots(k−1); ok_i = positions of slots(i) with a
  * successor in ok_{i+1} inside their window; count = |ok₀|. Greedy
  * earliest-successor is WRONG under slop — with slots₁ = {5,6},
  * slots₂ = {8}, slop 1, greedy takes 5 and dies in (5,7] though the
  * chain through 6 exists — and PhraseIndexSpec pins exactly that
  * topology. O(k·m log m) via binary-searched window checks per level.
  *
  * Runs in-expression after a (query, doc) group: k is phrase length
  * (tiny), position lists are per-doc term frequencies (tens). The
  * decoded lists are sorted by construction (delta gaps are ≥ 0 — the
  * ENCODER sorts defensively, so a future writer that forgets cannot
  * miscount here). Repeated-term phrases work: each slot carries its
  * own idx, two slots may hold the same term's positions. */
case class PhraseTf(left: Expression, right: Expression, slop: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(slop >= 0, s"slop=$slop must be non-negative")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(Array(a, b)), _), IntegerType)
        if a.dataType == IntegerType && b.dataType == BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (m, kk) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"phrase_tf needs (array<struct<int,binary>>, int) — binary = " +
            s"delta-varint positions — got ${m.simpleString}, ${kk.simpleString}")
    }

  /** Decode a [[DeltaVarintPositions]] payload back to the sorted
    * absolute position array. */
  private def decode(bytes: Array[Byte]): Array[Int] = {
    var cnt = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0x80) == 0) cnt += 1; i += 1 }
    val p = new Array[Int](cnt)
    var o = 0
    var prev = 0
    var t = 0
    while (o < bytes.length) {
      var v = 0
      var shift = 0
      var b = bytes(o); o += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7F) << shift; shift += 7
        b = bytes(o); o += 1
      }
      v |= (b & 0x7F) << shift
      prev += v
      p(t) = prev; t += 1
    }
    p
  }

  def compute(members: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): Int = {
    if (k < 1) return 0
    val n = members.numElements()
    val slots = new Array[Array[Int]](k)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      val idx = row.getInt(0)
      if (idx < 0 || idx >= k || slots(idx) != null) return 0
      slots(idx) = decode(row.getBinary(1))
      i += 1
    }
    i = 0
    while (i < k) { if (slots(i) == null) return 0; i += 1 }
    // backward reachability: ok holds the level-(j+1) positions from
    // which the chain completes; a level-j position survives iff its
    // window (p, p+1+slop] contains one of them
    var ok = slots(k - 1)
    var j = k - 2
    while (j >= 0) {
      val level = slots(j)
      val kept = new Array[Int](level.length)
      var m = 0
      var s = 0
      while (s < level.length) {
        val p = level(s)
        // smallest ok-position strictly greater than p
        var lo = java.util.Arrays.binarySearch(ok, p + 1)
        if (lo < 0) lo = -lo - 1
        if (lo < ok.length && ok(lo) <= p + 1 + slop) { kept(m) = p; m += 1 }
        s += 1
      }
      ok = java.util.Arrays.copyOf(kept, m)
      if (ok.length == 0) return 0
      j -= 1
    }
    ok.length
  }

  override def nullSafeEval(members: Any, k: Any): Any =
    compute(members.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseTf", this, classOf[PhraseTf].getName)
    nullSafeCodeGen(ctx, ev, (m, k) => s"${ev.value} = $ref.compute($m, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  /** Whitespace tokens (explicit 6-char ASCII class), empty-safe. */
  def wsTokens(text: Column): Column =
    GraftColumnBridge.column(WhitespaceTokens(GraftColumnBridge.expression(text)))

  /** Token count without materializing the token array. */
  def wsTokenCount(text: Column): Column =
    GraftColumnBridge.column(WhitespaceTokenCount(GraftColumnBridge.expression(text)))

  /** Count of characters in the ASCII range [lo, hi]. */
  def asciiRangeCount(text: Column, lo: Char, hi: Char): Column = {
    require(lo <= hi && hi < 0x80, s"[$lo, $hi] must be an ASCII range")
    GraftColumnBridge.column(
      AsciiRangeCount(GraftColumnBridge.expression(text), lo.toByte, hi.toByte))
  }

  /** Count of characters in an explicit ASCII set. */
  def asciiSetCount(text: Column, chars: String): Column =
    GraftColumnBridge.column(
      AsciiSetCount(GraftColumnBridge.expression(text), chars))

  /** Hashing-trick sparse features of a token array (see HashedFeatures). */
  def hashedFeatures(tokens: Column, dim: Int): Column =
    GraftColumnBridge.column(
      HashedFeatures(GraftColumnBridge.expression(tokens), dim))

  /** Linear-classifier margin over hashed features (see LinearMargin). */
  def linearMargin(tokens: Column, weights: Seq[Long], bias: Long): Column =
    GraftColumnBridge.column(
      LinearMargin(GraftColumnBridge.expression(tokens), weights, bias))

  /** Unsigned hashed-bucket counts of a token array (see BucketCounts). */
  def bucketCounts(tokens: Column, dim: Int): Column =
    GraftColumnBridge.column(
      BucketCounts(GraftColumnBridge.expression(tokens), dim))

  /** Unsigned hashed-bucket weight sum (see BucketWeightSum). */
  def bucketWeightSum(tokens: Column, weights: Seq[Long]): Column =
    GraftColumnBridge.column(
      BucketWeightSum(GraftColumnBridge.expression(tokens), weights))

  /** Distinct word n-gram shingles of a token array (see WordShingles). */
  def wordShingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(tokens), n))

  /** Distinct sorted xxhash64 shingle hashes (see WordShingleHashes).
    * Accepts a token array; [[wordShingleHashesOfText]] is the fused
    * string-input twin (bit-identical hashes, no token allocation). */
  def wordShingleHashes(tokens: Column, n: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      WordShingleHashes(GraftColumnBridge.expression(tokens), n, seed))

  /** Fused text→shingle-hashes path of WordShingleHashes: tokenization
    * boundaries stay in int arrays, no token array is materialized. */
  def wordShingleHashesOfText(text: Column, n: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      WordShingleHashes(GraftColumnBridge.expression(text), n, seed))

  /** Per-row membership count against a fixed sorted long set
    * (see SortedLongSetHits). */
  def sortedLongSetHits(arr: Column, set: Array[Long]): Column =
    GraftColumnBridge.column(
      SortedLongSetHits(GraftColumnBridge.expression(arr), set))

  /** Prefix-filter index of a sorted-distinct shingle-hash array under
    * an estimated-df rarity order (see RarityPrefix). */
  def rarityPrefix(hashes: Column, dfKeys: Array[Long], dfCounts: Array[Long],
                   tauNum: Int, tauDen: Int): Column =
    GraftColumnBridge.column(
      RarityPrefix(GraftColumnBridge.expression(hashes), dfKeys, dfCounts,
        tauNum, tauDen))

  /** Per-row n-gram repetition counts, fused from raw text
    * (see NgramRepetition — takes the STRING, not a token array). */
  def ngramRepetition(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      NgramRepetition(GraftColumnBridge.expression(text), n))

  /** Delta-varint compression of an int position list
    * (see DeltaVarintPositions — sorts defensively, gaps ≥ 0). */
  def deltaVarintPositions(posns: Column): Column =
    GraftColumnBridge.column(
      DeltaVarintPositions(GraftColumnBridge.expression(posns)))

  /** Phrase occurrence count from per-slot delta-varint position lists
    * (see PhraseTf; k = the row's phrase length; slop 0 = exact
    * adjacency, slop s = ordered proximity within s extra tokens per
    * step). */
  def phraseTf(members: Column, k: Column, slop: Int = 0): Column =
    GraftColumnBridge.column(
      PhraseTf(GraftColumnBridge.expression(members),
        GraftColumnBridge.expression(k), slop))
}
