package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's domain tables (SURVEY.md §1,
  * FIXTURES.md §1).
  *
  * The live catalog table has 27 columns — the 20-column DDL
  * (ddl_create_tables.sql:3-26) plus seven columns present in the data
  * (Sample_Input.csv:1) and Lambda query paths (lambda_function.py:770-774).
  * Everything is nullable StringType except the key and the soft-delete flag,
  * mirroring the VARCHAR-heavy DDL.
  */
object Schemas {

  /** `csp_tools.csp_tools_data1` live schema — 27 columns.
    * Ref: sql/ddl_create_tables.sql:3-26 ∪ sample-data/Sample_Input.csv:1. */
  val cspTools: StructType = StructType(Seq(
    StructField("s_no", IntegerType, nullable = false),
    StructField("team_name", StringType),
    StructField("tool_name", StringType, nullable = false),
    StructField("description", StringType),
    StructField("tool_code_link", StringType),
    StructField("tool_script", StringType),
    StructField("wiki_link", StringType),
    StructField("impact_ticket_reduced_effort_saving_hc", StringType),
    StructField("impact_ticket_reduced_effort_saving_tat", StringType),
    StructField("created_date", StringType),
    StructField("active_inactive", StringType),
    StructField("reason_for_inactive_or_deprecation", StringType),
    StructField("tool_used_by_csp_external_team", StringType),
    StructField("can_be_reused_across_csp_teams", StringType),
    StructField("eng_team_request_self", StringType),
    StructField("eng_business_team_name", StringType),
    StructField("op_link_from_eng_team", StringType),
    StructField("reason_for_cut", StringType),
    StructField("remarks", StringType),
    StructField("is_display", BooleanType),
    StructField("login", StringType),
    StructField("tool_owner", StringType),
    StructField("catalog_write_read", StringType),
    StructField("reason_for_catalog_access", StringType),
    StructField("who_use_this_tool", StringType),
    StructField("reason_for_catalog", StringType),
    StructField("tool_developed_by", StringType),
  ))

  /** The schema a raw CSV parses to before normalization — everything
    * string-typed; booleans/keys are cast during ingest (Ingest.normalize). */
  val cspToolsRaw: StructType =
    StructType(cspTools.fields.map(f => f.copy(dataType = StringType, nullable = true)))

  /** Primary key column (ddl_create_tables.sql:5, SORTKEY s_no :26). */
  val cspKey = "s_no"

  /** Soft-delete visibility flag (ddl_create_tables.sql:24,
    * lambda_function.py:31). */
  val displayFlag = "is_display"

  /** `tool_usage_metrics` (README.md:67-73). */
  val toolUsageMetrics: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("team_name", StringType),
    StructField("tool_name", StringType),
    StructField("usage_count", IntegerType),
    StructField("report_date", DateType),
  ))

  /** Multimodal asset table — opaque binary payload + typed metadata
    * (extension, SURVEY §7.4). The payload is an opaque `binary` column;
    * decode/resize/frame-sample operate on it via typed Dataset transforms. */
  val mediaAssets: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),  // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType),
    ))),
  ))
}

/** Typed row for the CRUD API layer (SURVEY §1.3: typed Dataset only where
  * type safety helps; analytics stays DataFrame). */
case class CspTool(
  s_no: Int,
  team_name: Option[String],
  tool_name: String,
  description: Option[String],
  is_display: Boolean,
  login: Option[String],
)
