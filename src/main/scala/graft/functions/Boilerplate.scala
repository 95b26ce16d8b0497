package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{DropLinesInSet, SortedLongSetHits}

/** Corpus-frequency line removal — the C4/RefinedWeb boilerplate filter
  * (Raffel et al. 2020 dedupe repeated spans corpus-wide; Penedo et al.
  * 2023 §4.2 drop duplicated lines): a line that appears verbatim in
  * many documents is navigation chrome / cookie banners / license
  * footers, not content. The policy here is the exact corpus rule:
  * drop every line whose corpus document-frequency exceeds `maxDf`,
  * keeping survivors in original order.
  *
  * Scale shape (the whole point of the design):
  *   1. df counting shuffles 8-byte xxhash64 keys, never line strings —
  *      partial map-side aggregation collapses the heavy boilerplate
  *      keys before the exchange, and the mostly-unique content-line
  *      tail crosses as one narrow row each.
  *   2. candidate hashes (`df > maxDf` groups) are collected and
  *      re-counted by EXACT STRING over only the candidate-hash rows
  *      (an in-expression sorted-set probe at the scan, zero extra
  *      shuffle width) — a hash collision can therefore never drop an
  *      innocent line, it only promotes it into the candidate recount
  *      where the string count exonerates it.
  *   3. the surviving frequent-line STRINGS ride into a per-row
  *      [[graft.plans.DropLinesInSet]] rewrite — the corpus is cleaned
  *      in one exchange-free map pass. Boilerplate sets are small (the
  *      filter exists because few distinct lines repeat massively);
  *      both collects are gated, and above the gates the operator falls
  *      back to the explode + anti-join + re-assemble plan, pinned
  *      equal by BoilerplateSpec.
  *
  * Text is assumed non-null (the documents contract every text op in
  * this engine shares); the fallback path drops null-text rows while
  * the fast path returns null columns for them.
  */
object Boilerplate {

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)

  /** Exact (line, line_df) pairs with `line_df > maxDf`, via the
    * two-phase hash-candidate / string-verify protocol described above.
    * `candGate` bounds the collected candidate-hash set (8 B each;
    * the 4M default ≈ 32 MB in the task binary, the decon gate); above
    * it the recount runs as a direct string groupBy — same result, one
    * fewer pass, string-wide shuffle. */
  def frequentLines(df: DataFrame, textCol: String, maxDf: Long,
                    candGate: Int = 4_000_000): DataFrame = {
    val lines = df.select(explode(split(col(textCol), "\n", -1)).as("line"))
    val stringCounted = lines.groupBy(col("line"))
      .agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") > maxDf)
    val candRows = lines
      .groupBy(xxhash64(col("line")).as("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > maxDf)
      .select(col("h")).take(candGate + 1)
    if (candRows.length > candGate) stringCounted
    else {
      val set = candRows.map(_.getLong(0)).sorted
      val hits = bridged(SortedLongSetHits(
        GraftColumnBridge.expression(array(xxhash64(col("line")))), set))
      lines.filter(hits > 0)
        .groupBy(col("line")).agg(count(lit(1)).as("line_df"))
        .filter(col("line_df") > maxDf)
    }
  }

  /** Clean `textCol` of corpus-frequent lines: returns
    * (`idCol`, text_clean, n_dropped). `lineGate` bounds the collected
    * frequent-line string set for the map-pass rewrite; above it the
    * fallback joins and re-assembles (two corpus-keyed exchanges instead
    * of zero — correctness identical, pinned by BoilerplateSpec). */
  def dropFrequentLines(df: DataFrame, idCol: String, textCol: String,
                        maxDf: Long = 2, lineGate: Int = 1_000_000,
                        candGate: Int = 4_000_000): DataFrame = {
    val freq = frequentLines(df, textCol, maxDf, candGate)
    val freqRows = freq.select(col("line")).take(lineGate + 1)
    if (freqRows.length <= lineGate) {
      val set = freqRows.map(r => UTF8String.fromString(r.getString(0)))
      java.util.Arrays.sort(set.asInstanceOf[Array[AnyRef]])
      val cleaned = bridged(DropLinesInSet(
        GraftColumnBridge.expression(col(textCol)), set))
      df.select(col(idCol), cleaned.as("r"))
        .select(col(idCol), col("r.text_clean").as("text_clean"),
          col("r.n_dropped").as("n_dropped"))
    } else {
      // explode + mark + ordered re-assembly (frequent set recomputed in
      // the join — one extra pass on this rare path beats a never-freed
      // cache pin; see the closeLineage caller-must-unpersist lesson)
      val pos = df.select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      val marked = pos.join(
        freq.select(col("line"), lit(1).as("is_freq")), Seq("line"), "left")
      marked.groupBy(col(idCol)).agg(
        array_join(transform(array_sort(collect_list(
          when(col("is_freq").isNull, struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("text_clean"),
        sum(when(col("is_freq").isNotNull, 1).otherwise(0))
          .cast("int").as("n_dropped"))
    }
  }
}
