package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.Schemas

/** Batch ingest: the Spark re-expression of the reference Lambda's
  * extract/transform path (SURVEY.md §2.1 S1-S3, §2.3 M1/M8, §3 E1).
  *
  * The reference parses CSV with Python's `csv` module
  * (lambda_function.py:11) — its sample input has quoted fields with
  * embedded commas, doubled quotes, and embedded NEWLINES
  * (Sample_Input.csv:21-22,29), so the Spark reader needs
  * `multiLine=true` + `escape="` explicitly.
  *
  * Scale note: `multiLine=true` disables input-split parallelism PER FILE
  * (each file is one record stream); at 100 TB ingest the unit of
  * parallelism is the file, which matches the reference's one-Lambda-per-file
  * model (README.md:42). Many small-to-medium files parallelize fine; a
  * single multi-TB multiline CSV would not — that is an input-format
  * constraint, not an engine one.
  */
object Ingest {

  /** S1: CSV source with the reference's parsing corners. Align-by-name:
    * the file's header decides which columns are present (20-col DDL shape
    * vs 27-col live shape, SURVEY §7.4 item 3); missing columns become
    * null, unknown columns are dropped. */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType = Schemas.cspTools): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
    alignByName(raw, schema)
  }

  /** S2: JSON file source (README.md:7). */
  def readJson(spark: SparkSession, path: String,
               schema: StructType = Schemas.cspTools): DataFrame =
    alignByName(spark.read.json(path), schema)

  /** S2 (API-body flavor): one JSON object string → one-row DataFrame,
    * the `json.loads(event['body'])` analog (lambda_function.py:972). */
  def parseJsonBody(spark: SparkSession, body: String,
                    schema: StructType = Schemas.cspTools): DataFrame = {
    import spark.implicits._
    alignByName(
      spark.read.schema(Schemas.cspToolsRaw).json(Seq(body).toDS()), schema)
  }

  /** Project `df` onto `schema` by column NAME (never position), casting to
    * the target type; absent columns are filled with typed nulls. */
  def alignByName(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(schema.fields.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None    => lit(null).cast(f.dataType).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** S3: null normalization — `"NA"`, `""` (and whitespace-only) → null,
    * exactly the sentinels of `escape_sql_value`
    * (lambda_function.py:246-248). `"N/A"` is a VALUE, not a null (it is
    * the DDL default, ddl_create_tables.sql:42-46). Applied to string
    * columns only. */
  def normalizeNulls(df: DataFrame): DataFrame = {
    val out = df.schema.fields.map {
      case f if f.dataType == StringType => nullifySentinels(col(f.name)).as(f.name)
      case f => col(f.name)
    }
    df.select(out.toIndexedSeq: _*)
  }

  def nullifySentinels(c: Column): Column =
    when(c.isNull || trim(c) === "" || trim(c) === "NA", lit(null).cast(StringType))
      .otherwise(c)

  /** `is_display` default TRUE (ddl_create_tables.sql:24): nulls in the
    * flag column become true, matching the column DEFAULT. */
  def applyDisplayDefault(df: DataFrame,
                          flag: String = Schemas.displayFlag): DataFrame =
    if (!df.columns.contains(flag)) df.withColumn(flag, lit(true))
    else df.withColumn(flag, coalesce(col(flag).cast(BooleanType), lit(true)))

  /** M1 (bulk form): assign dense keys `offset+1 … offset+n` to a batch.
    *
    * The reference computes `COALESCE(MAX(s_no),0)+1` per single-row insert
    * (lambda_function.py:269-271); keys are IDENTITIES, not ranks — their
    * assignment order is an implementation detail there too (arrival
    * order). Strategy here:
    *  - single-partition batch with an `orderBy`: one windowed row_number,
    *    keys deterministic in that order (nice for small API appends);
    *  - anything multi-partition: `zipWithIndex` per-partition offsets —
    *    no global `Window.orderBy`, which plans as ONE task holding the
    *    whole batch (the previous code forced that path whenever orderBy
    *    was set, so every bulk append serialized through one task). Key
    *    assignment follows partition layout: dense and unique, stable for
    *    a given input, but not a semantic sort. */
  def denseKeys(df: DataFrame, keyCol: String, offset: Long,
                orderBy: Seq[String] = Seq.empty): DataFrame = {
    if (orderBy.nonEmpty && df.rdd.getNumPartitions <= 1) {
      // Small ordered batch: explicit total order, single window is fine
      // (the partition IS one task already).
      val w = Window.orderBy(orderBy.map(col).toIndexedSeq: _*)
      df.withColumn(keyCol, (row_number().over(w) + offset).cast(IntegerType))
    } else {
      // Scale path: per-partition offsets, no global sort, no 1-task stage.
      val spark = df.sparkSession
      val rdd = df.rdd.zipWithIndex()
      val withKey = rdd.map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (offset + idx + 1).toInt)
      }
      spark.createDataFrame(withKey,
        df.schema.add(StructField(keyCol, IntegerType, nullable = false)))
    }
  }

  /** S3 (typed flavor, SURVEY §7.4 item 4): best-effort parse of the dirty
    * `created_date` column — the real data holds `23-Dec`, `Feb-25`,
    * `2013`, `-` (sample-data/Sample_Input.csv:2-14). A ladder of formats
    * is tried via `try_to_timestamp` (null on mismatch, never an ANSI
    * error); absent fields take Spark's deterministic defaults (year 1970,
    * month/day 1), so `23-Dec` → 1970-12-23, `Feb-25` → 2025-02-01,
    * `2013` → 2013-01-01, `-` → null. Pure codegen Column — runs at scan
    * speed in a 100 TB ingest. */
  def bestEffortDate(c: Column): Column =
    coalesce(
      Seq("yyyy-MM-dd", "dd/MM/yyyy", "MMM-yy", "d-MMM", "yyyy")
        .map(f => try_to_timestamp(c, lit(f)).cast(DateType)) :+
        lit(null).cast(DateType): _*)

  /** Additive typed-date column: parses `rawCol` best-effort into
    * `parsedCol` while RETAINING the raw string (the §7.4.4 contract —
    * dirty originals stay queryable). */
  def withParsedDate(df: DataFrame, rawCol: String = "created_date",
                     parsedCol: String = "created_date_parsed"): DataFrame =
    if (!df.columns.contains(rawCol)) df
    else df.withColumn(parsedCol, bestEffortDate(col(rawCol)))

  /** M8: duplicate-load avoidance — drop batch rows whose `dedupKey`
    * already exists in the target ("simple date check", README.md:56).
    * The existing-keys side is tiny relative to the batch → broadcast
    * anti-join, no shuffle of the batch. */
  def dropAlreadyLoaded(batch: DataFrame, existing: DataFrame,
                        dedupKey: String): DataFrame = {
    val keys = existing.select(dedupKey).distinct()
    batch.join(broadcast(keys), Seq(dedupKey), "left_anti")
  }

  /** Full E1 transform chain for a catalog CSV batch: parse → align →
    * null-normalize → flag default. Key assignment happens in the store
    * transaction (Mutations.appendBatch) where max(s_no) is race-free. */
  def catalogBatch(spark: SparkSession, path: String): DataFrame =
    applyDisplayDefault(normalizeNulls(readCsv(spark, path)))
}
