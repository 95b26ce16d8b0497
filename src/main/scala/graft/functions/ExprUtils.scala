package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level utilities. */
object ExprUtils {

  /** Let-binding for Column expressions: evaluate `value` ONCE per row and
    * reference it any number of times in `body` via the bound variable.
    *
    * Why this exists: Spark's higher-order functions evaluate their lambda
    * per array element, and any NON-lambda-variable subexpression captured
    * in the lambda body is re-evaluated on every element (and
    * CollapseProject re-inlines `withColumn` stages, so staging through
    * columns doesn't help). A shingling expression that references
    * `split(text)` inside a per-position lambda therefore re-tokenizes the
    * document once per shingle — observed as a 967-second single task at
    * sf0.1. Binding through a single-element `transform` makes the value a
    * lambda VARIABLE, which is evaluated once and then read by reference:
    *
    * {{{ let(tokens(text)) { tk => transform(..., i => slice(tk, i, n)) } }}}
    */
  def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Two-value let-binding (values may have different types). */
  def let2(a: Column, b: Column)(body: (Column, Column) => Column): Column =
    element_at(
      transform(array(struct(a.as("_l1"), b.as("_l2"))),
        s => body(s.getField("_l1"), s.getField("_l2"))), 1)

  /** 2-decimal money column → exact integer cents. THE one formulation of
    * the cents conversion — `sum(double)` is partitioning-order-dependent
    * and Spark rounds HALF_UP where DuckDB rounds half-even, so every
    * money aggregate goes through integer cents and divides back once at
    * the end. Shared so a rounding tweak can't silently diverge between
    * query families. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact sum of a 2-decimal column, reported back in units. */
  def sumMoney(c: Column): Column = sum(cents(c)).cast("double") / 100.0
}
