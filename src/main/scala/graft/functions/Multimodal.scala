package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (builder prompt; schema in Schemas.mediaAssets).
  *
  * The Spark-side plumbing — schema, partition shape, batched typed
  * transforms over binary columns — is real and tested. The codec layer is
  * a clearly-marked STUB (no image/audio libraries in this container):
  * `decodeStub` derives deterministic fake features from the bytes so the
  * pipeline is end-to-end verifiable; swapping in a real decoder changes
  * ONLY the function body, not the dataflow.
  *
  * Scala note: the PySpark guidance maps `mapInPandas` batches to typed
  * `Dataset.mapPartitions` here — same execution shape (one JVM-side
  * iterator per partition, arrow-free), with case-class Encoders giving
  * columnar-compatible schemas.
  */
object Multimodal {

  /** One media row (matches Schemas.mediaAssets). */
  final case class MediaAsset(
    asset_id: Long,
    media_type: String,           // image | audio | video
    payload: Array[Byte],
    meta: MediaMeta)
  final case class MediaMeta(
    width: Option[Int], height: Option[Int],
    duration_ms: Option[Long], codec: Option[String])

  /** Decoded-feature row produced by the (stubbed) decode stage. */
  final case class MediaFeatures(
    asset_id: Long,
    media_type: String,
    n_bytes: Int,
    byte_entropy: Double,          // real: content feature from bytes
    feature: Array[Float])         // stub: deterministic fake embedding

  /** STUB decode: a real implementation would decode the image/audio frame
    * here (???). The deterministic fake derives a 16-dim feature from byte
    * histograms so tests can assert exact values end-to-end. */
  private[functions] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](16)
    payload.foreach(b => hist((b & 0xFF) % 16) += 1)
    val n = math.max(payload.length, 1)
    hist.map(h => h.toFloat / n)
  }

  private[functions] def byteEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Int](256)
    payload.foreach(b => counts(b & 0xFF) += 1)
    val n = payload.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n; -p * math.log(p) / math.log(2)
    }.sum
  }

  /** Decode / feature-extract stage: one iterator per partition (the
    * `mapInPandas` batch shape). Pure function of the payload →
    * deterministic, re-runnable, no driver involvement. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      MediaFeatures(a.asset_id, a.media_type, a.payload.length,
        byteEntropy(a.payload), decodeStub(a.payload))
    })
  }

  /** "Resize" stage for images: a real implementation re-encodes pixels;
    * the stub truncates/pads the payload deterministically while updating
    * the typed metadata the way a resize would. */
  def resizeStub(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val target = math.max(1, w * h / 8)
      val resized = java.util.Arrays.copyOf(a.payload, target)
      a.copy(payload = resized,
        meta = a.meta.copy(width = Some(w), height = Some(h)))
    })
  }

  /** Frame-sampling stage for videos: emit one row per sampled "frame"
    * (every `everyMs` of the declared duration). Real decoders pull actual
    * frames; the stub slices the payload deterministically. */
  def sampleFramesStub(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video").flatMap { a =>
      val dur = a.meta.duration_ms.getOrElse(0L)
      val n = math.max(1, (dur / math.max(everyMs, 1L)).toInt)
      (0 until n).map { i =>
        val sliceLen = math.max(1, a.payload.length / n)
        val from = math.min(i * sliceLen, math.max(a.payload.length - 1, 0))
        val until = math.min(from + sliceLen, a.payload.length)
        (a.asset_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(a.payload, from, until))
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "frame_payload")
  }

  /** Partition-shape guard used by ingest jobs: binary payloads make rows
    * heavyweight, so repartition by byte budget, not row count. */
  def repartitionByPayloadBytes(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val stats = df.agg(sum(length(col("payload"))).as("total")).first()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(targetBytesPerPartition, 1L)).toInt)
    df.repartition(parts)
  }
}
