package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Mutations
import graft.schema.Schemas
import graft.sources.Ingest

/** ST1/ST2 (SURVEY §2.7): the S3-event-triggered ingest re-expressed as a
  * Structured Streaming file source.
  *
  * One micro-batch ≙ one Lambda invocation (README.md:41-43): each file
  * dropped into `inboxDir` flows through the same normalize → dedup →
  * key-assign → snapshot-append chain as batch E1, via `foreachBatch`.
  * Dedup state lives in the STORE (anti-join against already-loaded keys,
  * the reference's "simple date check", README.md:56) — not in streaming
  * state, so a restart resumes correctly with zero state recovery beyond
  * the checkpoint's file log.
  *
  * Scale: the file source lists incrementally and processes
  * `maxFilesPerTrigger` per batch; parallelism is per-file (multiLine CSV,
  * Ingest scale note). State never grows: the only stateful piece is the
  * source's processed-file log.
  */
object StreamingIngest {

  /** Start the catalog-inbox stream. Caller stops the query.
    *
    * Exactly-once: `foreachBatch` is at-least-once (a crash between the
    * append and the checkpoint commit replays the batch on restart), so
    * the append goes through `appendBatchOnce`, which records the applied
    * batchId in the snapshot metadata atomically with the data and skips
    * replays. `streamId` must be stable across restarts of the same
    * query (it namespaces the batchId watermark in the store). */
  def start(spark: SparkSession, inboxDir: String, checkpointDir: String,
            mutations: Mutations, dedupKey: Option[String] = None,
            maxFilesPerTrigger: Int = 16,
            streamId: String = "catalog-inbox"): StreamingQuery = {
    val raw = spark.readStream
      .schema(Schemas.cspToolsRaw)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inboxDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          mutations.appendBatchOnce(batch, streamId, batchId, dedupKey); ()
        }
      }
      .start()
  }

  /** ST3 (testdata extension): event-time tumbling-window aggregate with a
    * watermark — the streaming twin of EventQueries.hourlyAgg. Late data
    * beyond 10 minutes is dropped; state is bounded by (watermark horizon ×
    * event types). */
  /** Watermarked event-time window agg — tumbling by default, SLIDING
    * (overlapping windows, each event in duration/slide of them) when
    * `slide` is given; the streaming twin of EventQueries.hourlyAgg /
    * slidingActivity. The state store keys on (window, type); sliding
    * multiplies state rows by the overlap factor, which is why the
    * watermark matters: closed windows are evicted, bounding state. */
  def windowedEventAgg(events: DataFrame,
                       window_ : String = "1 hour",
                       watermark: String = "10 minutes",
                       slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        slide.map(sl => window(col("ts"), window_, sl))
          .getOrElse(window(col("ts"), window_)),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stream the events table from parquet files (for tests/demos: drop
    * event parquet files into a dir and watch windows close). */
  def startEventWindowStream(spark: SparkSession, eventsDir: String,
                             schema: StructType, checkpointDir: String,
                             queryName: String,
                             window_ : String = "1 hour",
                             slide: Option[String] = None): StreamingQuery = {
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(eventsDir))
    windowedEventAgg(stream, window_, slide = slide).writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
