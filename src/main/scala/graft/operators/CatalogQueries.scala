package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas
import graft.store.SnapshotStore

/** E2 read surface (SURVEY.md §3): the HTTP GET routes re-expressed as
  * DataFrame one-liners over the snapshot store, plus the S5 JSON envelope.
  *
  * Every visible-read path filters `is_display = TRUE`, reproducing the
  * reference's soft-delete semantics (lambda_function.py:31,690-694,770-774).
  */
final class CatalogQueries(store: SnapshotStore, spark: SparkSession,
                           table: String = "csp_tools_data") {

  private val key = Schemas.cspKey
  private val flag = Schemas.displayFlag

  private def current: DataFrame = store.load(table)

  /** P1: `SELECT * FROM t WHERE is_display = TRUE`
    * (retrieve_data, lambda_function.py:25-31). */
  def getAllTools: DataFrame = current.filter(col(flag) === true)

  /** P4+P5: point lookup by key, visible rows only
    * (get_tool_by_s_no, lambda_function.py:687-694). */
  def getBySNo(sNo: Int): DataFrame =
    current.filter(col(key) === sNo && col(flag) === true)

  /** P5: lookup by login, visible rows only
    * (get_tools_by_login, lambda_function.py:767-774). */
  def getByLogin(login: String): DataFrame =
    current.filter(col("login") === login && col(flag) === true)

  /** P3: string-equality predicate (ddl_create_tables.sql:31-32). */
  def getByToolName(name: String): DataFrame =
    current.filter(col("tool_name") === name && col(flag) === true)

  /** P6: case-insensitive substring search
    * (ddl_create_tables.sql:69-70). */
  def searchByTeam(fragment: String): DataFrame =
    current.filter(upper(col("team_name")).like(s"%${fragment.toUpperCase}%")
      && col(flag) === true)

  /** P2: single-column projection + point filter + limit
    * (ddl_create_tables.sql:34-36). */
  def descriptionFor(sNo: Int, limit: Int = 150): DataFrame =
    current.filter(col(key) === sNo).select("description").limit(limit)

  /** O1-O3: sorted scan with limit (ddl_create_tables.sql:69-72). */
  def topBySNo(k: Int = 150): DataFrame =
    getAllTools.orderBy(col(key).asc).limit(k)

  /** S6: keyset pagination — the NextToken result-cursor loop
    * (lambda_function.py:64-91) as a stateless relational page: rows with
    * key > cursor, ordered, limited. The returned page's max key is the
    * next cursor. Scales (no OFFSET scan-and-skip). */
  def page(afterKey: Int, pageSize: Int = 100): DataFrame =
    getAllTools.filter(col(key) > afterKey).orderBy(col(key).asc).limit(pageSize)

  /** S5: the `{total_count, records:[…]}` JSON envelope
    * (lambda_function.py:96-102,814-823).
    *
    * NOTE: collects to the driver by design — this is an API response
    * serializer for human-sized result sets (the reference paginates the
    * same way); never use it mid-pipeline. */
  def jsonEnvelope(df: DataFrame): String = {
    val records = df.toJSON.collect()
    s"""{"total_count":${records.length},"records":[${records.mkString(",")}]}"""
  }
}

/** A1-A7 (SURVEY.md §2.4): the QuickSight dashboard workload as named
  * aggregation queries — these ARE the reference's analytics surface
  * (README.md:87-91, quicksight/Quicksight Dashboard.png chart titles).
  * Grouping keys keep RAW values (mixed case and all) because the dashboard
  * groups on raw column values (SURVEY §7.4 item 4). */
final class CatalogAnalytics(source: => DataFrame) {

  private def visible: DataFrame =
    source.filter(col(Schemas.displayFlag) === true)

  /** A1: `SELECT MIN(s_no), MAX(s_no), COUNT(*)` (ddl_create_tables.sql:64). */
  def keyStats: DataFrame = visible.agg(
    min(col("s_no")).as("min_s_no"),
    max(col("s_no")).as("max_s_no"),
    count(lit(1)).as("cnt"))

  /** A5: "Count of Tool_script by Tool_script" (pie). */
  def toolCountByScript: DataFrame =
    visible.groupBy(col("tool_script")).agg(count(lit(1)).as("cnt"))

  /** A5: "Count of Tool_name by Team_name" (pie). */
  def toolCountByTeam: DataFrame =
    visible.groupBy(col("team_name")).agg(count(col("tool_name")).as("cnt"))

  /** A5: "Count of Records by Can_be_reused_across_csp_teams" (pie). */
  def reuseBreakdown: DataFrame =
    visible.groupBy(col("can_be_reused_across_csp_teams"))
      .agg(count(lit(1)).as("cnt"))

  /** A6: "Count of Records by Team_name and Active_inactive" (grouped bar)
    * — pivot form. */
  def recordsByTeamAndStatus: DataFrame =
    visible.groupBy(col("team_name"))
      .pivot("active_inactive", Seq("Active", "Inactive")).count()

  /** A6 plain two-key form (drives the pivot; easier to oracle-check). */
  def recordsByTeamAndStatusFlat: DataFrame =
    visible.groupBy(col("team_name"), col("active_inactive"))
      .agg(count(lit(1)).as("cnt"))
}

/** A7 KPI over the metrics table (README.md:67-73,88-89). */
final class UsageAnalytics(metrics: => DataFrame) {
  /** "Tool usage by team" KPI. */
  def usageByTeam: DataFrame =
    metrics.groupBy(col("team_name")).agg(sum(col("usage_count")).as("total_usage"))

  /** Usage per (team, tool) ranked within team — dashboard drill-down. */
  def topToolsPerTeam(k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("team_name"))
      .orderBy(col("total_usage").desc, col("tool_name").asc)
    metrics.groupBy(col("team_name"), col("tool_name"))
      .agg(sum(col("usage_count")).as("total_usage"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
