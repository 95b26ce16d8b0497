package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — match each point to every interval containing
  * it. Spark plans the naive `ON p.ts BETWEEN i.lo AND i.hi` as a
  * nested-loop join (O(|P|·|I|) — a scale killer past broadcast sizes);
  * this is the bucketed equi-join formulation:
  *
  *   intervals explode to the coarse time buckets they overlap; points
  *   key to their single bucket; the join runs as a hash equi-join on
  *   bucket id; a residual BETWEEN filter removes same-bucket misses.
  *
  * Each (interval, point) pair meets in exactly ONE bucket (the point's),
  * so no post-join dedup is needed. Cost: shuffle on bucket ids +
  * |pairs-per-bucket| comparisons — linear in data for bucketWidth on the
  * order of the interval width. Choose `bucketWidth` ≥ the typical
  * interval span: an interval spanning k buckets replicates k times
  * (sequence explode), so a too-small width inflates the interval side.
  * Skewed buckets (a hot hour) split further via AQE like any hash join. */
object RangeJoin {

  /** `points` must carry numeric `ptsCol`; `intervals` numeric `loCol` /
    * `hiCol` (inclusive bounds, same units). Returns matched pairs with
    * all columns of both inputs (names must not collide). */
  def intervalJoin(points: DataFrame, ptsCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val p = points.withColumn("__bucket", floor(col(ptsCol) / bucketWidth))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .filter(col(ptsCol) >= col(loCol) && col(ptsCol) <= col(hiCol))
      .drop("__bucket")
  }
}
