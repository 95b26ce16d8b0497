package graft

import org.apache.spark.sql.functions._

import graft.schema.Schemas
import graft.sources.Ingest

/** S1-S3 CSV/JSON ingest corners (FIXTURES.md §3, SURVEY §7.4 items 2-4). */
class IngestSpec extends SparkSpec {

  test("S1: quoted field with embedded newline parses as ONE logical row") {
    val df = Ingest.readCsv(spark, fixture("multiline.csv"))
    assert(df.count() === 1)
    val desc = df.select("description").first().getString(0)
    assert(desc.contains("line one\nline two"))
  }

  test("S1: doubled quotes decode to literal quotes") {
    val df = Ingest.readCsv(spark, fixture("doubled_quotes.csv"))
    val desc = df.select("description").first().getString(0)
    assert(desc === "GMS Rank from the \"item\" tab")
  }

  test("S3: NA and empty are null; N/A is a VALUE") {
    val df = Ingest.normalizeNulls(Ingest.readCsv(spark, fixture("null_sentinels.csv")))
      .orderBy("s_no")
    val descs = df.select("description").collect().map(r => Option(r.getString(0)))
    assert(descs.toSeq === Seq(None, None, Some("N/A")))
  }

  test("boolean column parses; null flag defaults to TRUE") {
    val df = Ingest.applyDisplayDefault(
      Ingest.readCsv(spark, fixture("booleans.csv"))).orderBy("s_no")
    val flags = df.select("is_display").collect().map(_.getBoolean(0))
    assert(flags.toSeq === Seq(true, false, true))
  }

  test("M6: 3-column file aligns by NAME into the 27-column schema") {
    val df = Ingest.readCsv(spark, fixture("schema_drift_20col.csv"))
    assert(df.columns.toSeq === Schemas.cspTools.fieldNames.toSeq)
    val row = df.first()
    assert(row.getAs[Int]("s_no") === 10)
    assert(row.getAs[String]("team_name") === "CMS")
    assert(row.getAs[String]("login") === null)
  }

  test("dirty created_date survives as raw string") {
    val df = Ingest.readCsv(spark, fixture("dirty_dates.csv")).orderBy("s_no")
    val dates = df.select("created_date").collect().map(_.getString(0))
    assert(dates.toSeq === Seq("23-Dec", "Feb-25", "2013", "-"))
  }

  test("best-effort typed parse of dirty created_date, raw retained (§7.4.4)") {
    val df = Ingest.withParsedDate(
      Ingest.readCsv(spark, fixture("dirty_dates.csv"))).orderBy("s_no")
    val parsed = df.select(col("created_date_parsed").cast("string"))
      .collect().map(r => Option(r.getString(0)))
    assert(parsed.toSeq === Seq(
      Some("1970-12-23"),  // 23-Dec: day-month, default year
      Some("2025-02-01"),  // Feb-25: month-year, first of month
      Some("2013-01-01"),  // bare year
      None))               // '-' unparseable → null
    // raw strings still present and untouched
    val raw = df.select("created_date").collect().map(_.getString(0))
    assert(raw.toSeq === Seq("23-Dec", "Feb-25", "2013", "-"))
  }

  test("E1: the reference's real Sample_Input.csv ingests — 50 logical rows") {
    // Read-only reference data; 67 physical lines → 50 logical rows
    // (multi-line quoted fields, Sample_Input.csv:21-22).
    val path = "/root/reference/sample-data/Sample_Input.csv"
    assume(new java.io.File(path).exists())
    val df = Ingest.catalogBatch(spark, path)
    assert(df.count() === 50)
    // is_display default applied everywhere
    assert(df.filter(col("is_display").isNull).count() === 0)
  }

  test("S2: JSON body parses into the catalog schema") {
    val df = Ingest.parseJsonBody(spark,
      """{"s_no": 7, "tool_name": "JTool", "team_name": "FCS", "is_display": true}""")
    val row = df.first()
    assert(row.getAs[Int]("s_no") === 7)
    assert(row.getAs[String]("tool_name") === "JTool")
    assert(row.getAs[String]("description") === null)
  }

  test("M8: dropAlreadyLoaded is a broadcast anti-join on the dedup key") {
    import spark.implicits._
    val existing = Seq(("2024-11-01", 1)).toDF("report_date", "x")
    val batch = Seq(("2024-11-01", 2), ("2024-11-02", 3)).toDF("report_date", "x")
    val out = Ingest.dropAlreadyLoaded(batch, existing, "report_date")
    assert(out.select("report_date").collect().map(_.getString(0)).toSeq
      === Seq("2024-11-02"))
  }
}
