package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right value whose timestamp
  * is ≤ the left row's timestamp, per key. Spark has no native ASOF
  * operator (DuckDB/kdb do); the naive formulations are a range join
  * (quadratic blowup per key) or a per-key collect (driver-bound). This is
  * the scale-correct composition:
  *
  *   union both sides tagged → ONE shuffle on the key → one linear
  *   window pass carrying the last non-null right value forward.
  *
  * Right rows sort before left rows at equal timestamps (tag ordering), so
  * the semantics are `right.ts <= left.ts` — identical to DuckDB's
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`, which is the
  * oracle for the registered query. Cost: shuffle(|L|+|R|) + linear scan;
  * no range explosion, no driver state, any key cardinality.
  *
  * The right side must be unique per (key, ts) — pre-aggregate it
  * (`max`/`last` per timestamp) or ties become order-dependent. */
object AsofJoin {

  /** `left` columns are preserved; the matched right value is appended as
    * `asof_<rightVal>` (null when no right row precedes). `left` and
    * `right` must both carry `key` and `ts` under the same names. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVal: String): DataFrame = {
    val rvType = right.schema(rightVal).dataType
    val leftExtra = left.columns.filterNot(c => c == key || c == ts).toSeq

    val taggedLeft = left.select(
      (Seq(col(key), col(ts), lit(1).as("__tag"),
        lit(null).cast(rvType).as("__rv")) ++ leftExtra.map(col)): _*)
    val taggedRight = right.select(
      (Seq(col(key), col(ts), lit(0).as("__tag"),
        col(rightVal).as("__rv")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn(s"asof_$rightVal",
        last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__rv")
  }
}
