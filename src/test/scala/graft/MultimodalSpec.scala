package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.{MediaAsset, MediaMeta}

/** Multimodal plumbing: typed binary columns through partitioned decode /
  * resize / frame-sample stages (decode layer is a deterministic stub). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Seq(
    MediaAsset(1L, "image", Array.tabulate(64)(_.toByte),
      MediaMeta(Some(8), Some(8), None, Some("fakepng"))),
    MediaAsset(2L, "video", Array.tabulate(100)(i => (i % 7).toByte),
      MediaMeta(None, None, Some(1000L), Some("fakemp4"))),
    MediaAsset(3L, "audio", Array.emptyByteArray,
      MediaMeta(None, None, Some(500L), Some("fakewav"))),
  ).toDS()

  test("extractFeatures: deterministic features, correct schema") {
    val feats = Multimodal.extractFeatures(assets)
    val rows = feats.collect().sortBy(_.asset_id)
    assert(rows.map(_.asset_id).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).n_bytes === 64)
    assert(rows(0).feature.length === 16)
    // 64 bytes 0..63 → 4 per 16-bucket histogram → uniform 1/16
    assert(rows(0).feature.forall(f => math.abs(f - 0.0625f) < 1e-6))
    assert(math.abs(rows(0).byte_entropy - 6.0) < 1e-9) // 64 distinct bytes
    assert(rows(2).n_bytes === 0 && rows(2).byte_entropy === 0.0)
    // rerun produces identical results (pure function of payload)
    val again = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(again.map(_.feature.toSeq).toSeq === rows.map(_.feature.toSeq).toSeq)
  }

  test("resizeStub updates payload and typed metadata") {
    val out = Multimodal.resizeStub(assets, 4, 4).collect().sortBy(_.asset_id)
    assert(out.forall(a => a.meta.width.contains(4) && a.meta.height.contains(4)))
    assert(out(0).payload.length === 2) // 4*4/8
  }

  test("sampleFramesStub: one row per sampled frame of each video") {
    val frames = Multimodal.sampleFramesStub(assets, everyMs = 250L)
    val rows = frames.collect()
    assert(rows.length === 4) // 1000ms / 250ms
    assert(rows.map(_.getAs[Long]("asset_id")).forall(_ === 2L))
    assert(rows.map(_.getAs[Long]("ts_ms")).sorted.toSeq === Seq(0L, 250L, 500L, 750L))
  }

  test("repartitionByPayloadBytes sizes partitions by bytes") {
    val df = assets.toDF()
    val out = Multimodal.repartitionByPayloadBytes(df, targetBytesPerPartition = 50L)
    assert(out.rdd.getNumPartitions === 3) // 164 bytes / 50 → 3
    assert(out.count() === 3)
  }
}
