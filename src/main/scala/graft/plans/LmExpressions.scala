package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the statistical n-gram language-model quality
  * filter (the CCNet stage — Wenzek et al. 2020, arXiv:1911.00359,
  * score documents by LM fit and drop the worst): the corpus-level
  * knowledge (the trained bigram table) rides in the scoring expression
  * as a task-binary sorted array, the same broadcast-with-the-task
  * trade [[DropLinesInSet]] and [[DropSpansInSet]] make, so scoring is
  * a pure per-row map inside whole-stage codegen — zero exchanges over
  * the corpus being scored. */

/** ALL word n-gram windows of a token array, in position order, WITH
  * multiplicity — the term-frequency sibling of [[WordShingles]]
  * (which is distinct-first-occurrence, the document-frequency view).
  * LM training counts occurrences, so a within-doc repeat must count
  * every time it appears.
  *
  * Edges follow [[WordShingles]]: fewer than n tokens → the single
  * joined-whatever-is-there window (callers filter `size(toks) >= n`
  * when short docs must contribute nothing); empty → [""]. */
case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams_all needs array<string>, got ${other.simpleString}")
    }

  private val SEP = UTF8String.fromString(" ")

  def compute(arr: ArrayData): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) {
      val all = new Array[UTF8String](nTok)
      var i = 0
      while (i < nTok) { all(i) = arr.getUTF8String(i); i += 1 }
      return new GenericArrayData(Array[Any](UTF8String.concatWs(SEP, all: _*)))
    }
    val window = new Array[UTF8String](n)
    val out = new Array[Any](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SEP, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgramsAll", this, classOf[WordNgramsAll].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams_all"
}

/** ALL word n-gram window hashes, position order, WITH multiplicity —
  * the occurrence-count sibling of [[WordShingleHashes]] (distinct,
  * the df view), hashing with the same space-joined-bytes XXH64 recipe
  * ([[SpanOps.hashWindow]], zero allocation per window) so values are
  * bit-equal to hashing the [[WordNgramsAll]] strings. Fewer than n
  * tokens → empty (occurrence counters want no short-doc shingle). */
case class WordNgramHashesAll(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngram_hashes_all needs array<string>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      out(i) = SpanOps.hashWindow(arr, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgramHashesAll", this,
      classOf[WordNgramHashesAll].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes_all"
}

/** The n-gram STRINGS (position order, WITH multiplicity) of the
  * windows whose hash lands in `hashes` (sorted ascending) — the
  * occurrence-count sibling of [[GramsInHashSet]] (distinct, the df
  * view): only candidate grams get their strings built, so the exact
  * occurrence recount shuffles candidate-mass rows instead of the
  * whole corpus's windows. A hash miss allocates nothing. */
case class GramsInHashSetAll(child: Expression, n: Int, hashes: Array[Long])
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"grams_in_hash_set_all needs array<string>, got ${other.simpleString}")
    }

  def compute(arr: ArrayData): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n || hashes.length == 0)
      return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i <= nTok - n) {
      if (java.util.Arrays.binarySearch(hashes, SpanOps.hashWindow(arr, i, n)) >= 0)
        out.add(SpanOps.gramString(arr, i, n))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramsInHashSetAll", this,
      classOf[GramsInHashSetAll].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "grams_in_hash_set_all"
}

/** Sum of quantized bigram log-probabilities over the adjacent token
  * pairs of a token array: each pair probes the trained model —
  * `grams` sorted by UTF8String binary order, `qlp(i)` the quantized
  * conditional log2-probability of `grams(i)` — and a miss (unseen or
  * count-pruned bigram) scores the fixed `penalty`. Returns
  * struct<lm_score long, n_bigrams int>; fewer than 2 tokens → (0, 0).
  *
  * The hot loop probes each pair by window HASH first (the
  * [[SpanOps.hashWindow]] scratch-buffer recipe, zero allocation per
  * position) against the hashes of the model grams, and only builds
  * the pair string to confirm on a hit — a clean-text scan position
  * costs one hash + one binary search; a hash collision costs one
  * string compare and scores the penalty it would have scored anyway.
  *
  * All model values are integers (quantized at train time with
  * floor(log2(count)) = length(bin(count)) - 1, see
  * [[graft.functions.NgramLm]]), so the score is exact integer math —
  * reproducible bit-for-bit by any engine, which is what makes the
  * DuckDB oracle possible. */
case class BigramLogProbSum(child: Expression, grams: Array[UTF8String],
                            qlp: Array[Long], penalty: Long)
    extends UnaryExpression {

  require(grams.length == qlp.length,
    s"model arrays misaligned: ${grams.length} grams vs ${qlp.length} values")

  override def dataType: DataType = StructType(Seq(
    StructField("lm_score", LongType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bigram_logprob_sum needs array<string>, got ${other.simpleString}")
    }

  // gram hashes sorted for the pre-probe; a positive pre-probe falls
  // through to the exact string search, so collisions cannot misscore
  @transient private lazy val gramHashes: Array[Long] = {
    val hs = grams.map { g =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        g.getBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        g.numBytes(), SpanOps.Seed)
    }
    java.util.Arrays.sort(hs)
    hs
  }

  def compute(arr: ArrayData): GenericInternalRow = {
    val nTok = arr.numElements()
    if (nTok < 2)
      return new GenericInternalRow(Array[Any](0L, 0))
    var score = 0L
    var i = 0
    while (i <= nTok - 2) {
      var v = penalty
      if (grams.length > 0 &&
          java.util.Arrays.binarySearch(gramHashes,
            SpanOps.hashWindow(arr, i, 2)) >= 0) {
        val k = java.util.Arrays.binarySearch(
          grams.asInstanceOf[Array[AnyRef]], SpanOps.gramString(arr, i, 2))
        if (k >= 0) v = qlp(k)
      }
      score += v
      i += 1
    }
    new GenericInternalRow(Array[Any](score, nTok - 1))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLogProbSum", this, classOf[BigramLogProbSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bigram_logprob_sum"
}
