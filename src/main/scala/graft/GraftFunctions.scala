package graft

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession,
  SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Dedup, Featurize, Similarity, TextFunctions}

/** The library's SQL surface: every scalar text/hash/vector function the
  * Column API exposes, registered under a `graft_` prefix so pure-SQL
  * users (`spark.sql(...)`, thrift/connect clients) get the SAME native
  * Catalyst expressions — codegen'd byte scans, not UDF wrappers. A
  * builder converts argument expressions to Columns, applies the public
  * Column function, and converts back, so the SQL name and the Scala
  * function can never drift apart.
  *
  * Two registration paths, same function table:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (injected at
  *    session build — survives `newSession()`);
  *  - live session: [[GraftFunctions.register]] (what [[Sessions.local]]
  *    does, so Verify/Bench/test sessions always have the SQL names).
  *
  * Integer parameters (shingle n, minhash k, band count, embedding dim)
  * must be foldable literals — they size generated code and key spaces,
  * which a per-row value cannot. */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  private def toExpr(c: Column): Expression =
    GraftColumnBridge.resolvedExpression(c)

  private def litInt(fn: String, arg: String, e: Expression): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got $other")
    }
  }

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    require(ns.contains(args.length),
      s"$fn expects ${ns.mkString(" or ")} argument(s), got ${args.length}")

  private def fn1(name: String)(f: Column => Column): (String, Builder) =
    name -> { args => arity(name, args, 1); toExpr(f(toCol(args.head))) }

  private def fn2(name: String)(f: (Column, Column) => Column): (String, Builder) =
    name -> { args =>
      arity(name, args, 2); toExpr(f(toCol(args(0)), toCol(args(1))))
    }

  /** (col [, intLit=default]) functions. */
  private def fn1i(name: String, default: Int)(
      f: (Column, Int) => Column): (String, Builder) =
    name -> { args =>
      arity(name, args, 1, 2)
      val n = if (args.length > 1) litInt(name, "arg 2", args(1)) else default
      toExpr(f(toCol(args.head), n))
    }

  /** The full name → builder table (kept data-shaped so both
    * registration paths and the docs enumerate one list). */
  val all: Seq[(String, Builder)] = Seq(
    // text analysis (compiled byte-scan expressions where it matters)
    fn1("graft_tokens")(TextFunctions.tokens),
    fn1("graft_token_count")(TextFunctions.tokenCount),
    fn1("graft_subword_count")(TextFunctions.subwordCount),
    fn1("graft_punct_ratio")(TextFunctions.punctRatio),
    fn1("graft_digit_count")(TextFunctions.digitCount),
    fn1("graft_digit_ratio")(TextFunctions.digitRatio),
    fn1("graft_upper_ratio")(TextFunctions.upperRatio),
    fn1("graft_mean_token_len")(TextFunctions.meanTokenLen),
    fn1("graft_stopword_ratio")(TextFunctions.stopwordRatio),
    fn1("graft_lang_id")(TextFunctions.langId),
    fn1("graft_quality_score")(TextFunctions.qualityScore),
    fn1("graft_fingerprint")(TextFunctions.fingerprint),
    fn1("graft_pii_redact")(TextFunctions.piiRedact),
    fn1("graft_pii_counts")(TextFunctions.piiCounts),
    // fused repetition counts: struct(total, distinct, top) n-gram
    // window stats straight off the text bytes (Gopher filter inputs)
    fn1i("graft_ngram_stats", 2)(graft.plans.TextExpressions.ngramRepetition),
    // dedup hashes
    fn1("graft_simhash64")(Dedup.simhash64),
    fn1("graft_simhash64_md5")(Dedup.simhash64Md5),
    fn2("graft_hamming64")(Dedup.hamming64),
    fn1i("graft_shingles", 3)(Dedup.shingles),
    fn1i("graft_shingle_hashes", 3)(Dedup.shingleHashes),
    fn1i("graft_minhash", 32)(Dedup.minhashSignature),
    "graft_band_keys" -> { args =>
      arity("graft_band_keys", args, 1, 2, 3)
      val k = if (args.length > 1) litInt("graft_band_keys", "k", args(1)) else 32
      val b = if (args.length > 2) litInt("graft_band_keys", "bands", args(2)) else 16
      toExpr(Dedup.lshBandKeys(toCol(args.head), k, b))
    },
    // all-occurrence word n-grams (the term-frequency sibling of the
    // DISTINCT graft_shingles — what LM/count estimators consume)
    fn1i("graft_word_ngrams", 2)((text, n) => GraftColumnBridge.column(
      graft.plans.WordNgramsAll(
        GraftColumnBridge.resolvedExpression(TextFunctions.tokens(text)), n))),
    // unsigned hashed-bucket token counts (the distribution-estimator
    // view of the hashing trick; graft_hash_embedding is the signed one)
    fn1i("graft_bucket_counts", 64)((text, dim) =>
      graft.plans.TextExpressions.bucketCounts(TextFunctions.tokens(text), dim)),
    // vectors
    fn2("graft_dot")(Similarity.dot),
    fn1i("graft_hash_embedding", 64)(Featurize.hashEmbedding),
    // aggregate: per-group bounded top-k heap (the scale-correct two-phase
    // top-k — map-side k-entry heaps, no per-group window sort). Returned
    // BARE: the analyzer wraps an AggregateFunction from a registry
    // builder exactly as it does the built-in ones.
    "graft_topk" -> { args =>
      arity("graft_topk", args, 3)
      graft.plans.BoundedTopK(args(0), args(1),
        litInt("graft_topk", "k", args(2)))
    })

  /** Register everything on a live session (idempotent — re-registration
    * replaces with the identical builder). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, b) =>
      GraftColumnBridge.registerTempFunction(spark, name, b)
    }

  /** The `injectFunction` descriptions for the config path. */
  private[graft] def descriptions
      : Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    all.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name), b)
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — injects the whole
  * [[GraftFunctions]] table at session build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach(extensions.injectFunction)
}
