package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.ExprUtils.let

/** Text-analysis operators for the training-data pipeline extension
  * (builder prompt; SURVEY §7.4 item 6).
  *
  * All pure Column expressions over `functions._` — every op stays inside
  * whole-stage codegen (no UDFs), so at 100 TB these run at parquet-scan
  * speed with no serialization boundary. Each is deterministic, so results
  * hash-compare across engines where the oracle SQL can express the same
  * computation.
  */
object TextFunctions {

  /** Explicit whitespace char class — NOT `\s`: Java regex (Spark) counts
    * vertical tab \x0B in `\s` while RE2 (DuckDB oracle) does not, so `\s`
    * silently diverges across engines on \x0B-bearing documents. This
    * class is identical in both. */
  private val WS = "[ \\t\\n\\r\\f\\x0B]"

  /** Whitespace tokens, empty-safe (`""` → empty array, not `[""]`).
    * Trims with the full whitespace class — Spark's `trim` strips only
    * spaces, so tab/newline-led text would otherwise yield a spurious
    * empty leading token.
    *
    * Compiled byte-scan expression (plans.WhitespaceTokens): the previous
    * `regexp_replace(trim) + split(WS+)` formulation ran two
    * java.util.regex passes per document and dominated the flagship text
    * suite. Semantics are identical (TextExpressionsSpec pins the two
    * formulations equal on adversarial inputs; every tokens-derived
    * DuckDB oracle row pins them cross-engine). */
  def tokens(text: Column): Column =
    graft.plans.TextExpressions.wsTokens(text)

  /** The pre-expression regex formulation of [[tokens]] — kept as the
    * equivalence reference for TextExpressionsSpec (and as the executable
    * definition of the contract both engines implement). */
  private[graft] def tokensRegex(text: Column): Column =
    let(regexp_replace(text, s"^$WS+|$WS+$$", "")) { t =>
      when(length(t) === 0, array().cast("array<string>"))
        .otherwise(split(t, s"$WS+"))
    }

  /** Whitespace token count — count-only byte scan (no token array
    * allocation; TextExpressionsSpec pins it equal to size(tokens)). */
  def tokenCount(text: Column): Column =
    graft.plans.TextExpressions.wsTokenCount(text)

  /** BPE-ish subword-unit estimate: letter runs, digits, and individual
    * punctuation each count as one token — a cheap proxy for byte-pair
    * tokenizers (≈ GPT-style pre-tokenization regex, simplified). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]"), lit(0)))

  /** Punctuation chars / total chars (explicit char set, not \p{Punct},
    * so engines with different Unicode tables agree). Compiled byte scan;
    * the set matches the regex class `[.,;:!?'"()\[\]{}-]` exactly
    * (TextExpressionsSpec pins the equivalence). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(graft.plans.TextExpressions
        .asciiSetCount(text, ".,;:!?'\"()[]{}-").cast("double") / length(text))

  /** Count of digit chars — compiled byte scan (an ASCII class can never
    * match inside a UTF-8 multi-byte sequence, so byte count = char
    * count; see plans.AsciiRangeCount). */
  def digitCount(text: Column): Column =
    graft.plans.TextExpressions.asciiRangeCount(text, '0', '9')

  /** Digit chars / total chars. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(digitCount(text).cast("double") / length(text))

  /** Uppercase chars / total chars. */
  def upperRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(graft.plans.TextExpressions.asciiRangeCount(text, 'A', 'Z')
        .cast("double") / length(text))

  /** Mean whitespace-token length (0.0 for empty).
    *
    * Identity instead of iteration: separators exist only BETWEEN tokens,
    * so sum(token chars) = total chars − whitespace chars, and both terms
    * are compiled byte scans — the previous formulation aggregated
    * `length(t)` over the token array in an INTERPRETED higher-order
    * lambda, the last regex/HOF holdout on the text-stats hot path.
    * Char counts are code points on both sides, so the identity is exact
    * (TextExpressionsSpec pins old ≡ new). */
  def meanTokenLen(text: Column): Column = {
    import graft.functions.ExprUtils.let2
    let2(graft.plans.TextExpressions.asciiSetCount(text, " \t\n\u000B\f\r"),
         tokenCount(text)) { (ws, n) =>
      when(n === 0, lit(0.0))
        .otherwise((length(text) - ws).cast("double") / n)
    }
  }

  // Tiny per-language stopword lists for the n-gram/stopword language-ID
  // heuristic. Sets are disjoint-ish on purpose: shared words (e.g. "a")
  // carry no signal.
  // private[graft] so the DuckDB oracle twin (text_triage_oracle) can emit
  // per-language hit counts from the SAME lists — a drifted copy would
  // silently diverge the engines.
  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "que", "y", "en", "un", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "une", "dans", "pour", "du"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf"),
  )

  /** Count of elements of a token array present in `words`. */
  def hitsIn(toks: Column, words: Seq[String]): Column = {
    val lits = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(lits, t)))
  }

  /** Count of tokens present in `words` (case-insensitive). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    hitsIn(tokens(lower(text)), words)

  /** Stopword tokens / total tokens (English list) — a classic quality
    * signal for web-scraped corpora. */
  def stopwordRatio(text: Column): Column =
    let(tokens(lower(text))) { tk =>
      when(size(tk) === 0, lit(0.0))
        .otherwise(hitsIn(tk, stopwords("en")).cast("double") / size(tk))
    }

  /** Language-ID heuristic: argmax of per-language stopword hit counts;
    * "und" (undetermined) when nothing matches. Latin-script languages
    * only — CJK would key off Unicode ranges instead (`unk` here).
    *
    * Implementation: build an array of (score, tiebreak-lang) structs,
    * `array_max` picks the lexicographically greatest — i.e. highest
    * score, ties broken by language code — still pure codegen. */
  def langId(text: Column): Column =
    let(tokens(lower(text))) { tk =>
      val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
        struct(hitsIn(tk, words).as("score"), lit(lang).as("lang"))
      }
      let(array_max(array(scored: _*))) { best =>
        when(best.getField("score") === 0, lit("und"))
          .otherwise(best.getField("lang"))
      }
    }

  /** Composite quality score in [0,1]: long-enough, low punctuation/digit
    * noise, sane mean token length. Weights are heuristic; the point is the
    * SHAPE (pure-expression scoring usable in a 100 TB filter pushdown). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 5.0)
    val tokLen = meanTokenLen(text)
    val tokScore = when(tokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.4 + punctPenalty * 0.25 + digitPenalty * 0.15 + tokScore * 0.2, 4)
  }

  /** Order-sensitive 64-bit document fingerprint: xxhash64 of the
    * single-space-joined token sequence. Equal iff the token sequences
    * are equal — an exact-dup key that ignores whitespace differences.
    * (xxhash64, not arithmetic folding: Spark 4 ANSI mode rejects
    * deliberately-wrapping multiply.) */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** PII redaction: email/SSN/phone/IPv4 spans → typed placeholders
    * ([[graft.plans.PiiRedact]] — fixed rewrite order, patterns in the
    * java.util.regex ∩ RE2 subset so oracles share them verbatim). */
  def piiRedact(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PiiRedact(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** PII audit counts on the original text:
    * struct<n_email, n_ssn, n_phone, n_ip> ([[graft.plans.PiiCounts]]). */
  def piiCounts(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PiiCounts(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
