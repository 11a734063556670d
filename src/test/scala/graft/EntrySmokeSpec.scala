package graft

import graft.ops.Multimodal

/** Driver-contract smoke: entry() on sf0.001 returns rows; every query in
  * the registry runs on sf0.001; oracles exist for the SQL-expressible set.
  */
class EntrySmokeSpec extends SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes on sf0.001 and is non-empty") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      assert(n > 0, s"query $name returned no rows on sf0.001")
    }
  }

  test("oracle keys are a subset of query keys with matching names") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert((qs -- os) ==
      Set("dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
        "ann_lsh_topk", "ann_ivf_topk",
        "multimodal_features", "sketch_agg"),
      "rows-only set is exactly the LSH/banding/sketch + stubbed-codec queries")
  }

  test("frame sampling expands each video into stride-spaced feature rows") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, stride = 16).collect()
    val videos = media.collect().filter(_.kind == "video")
    assert(frames.map(_.media_id).distinct.length == videos.length)
    videos.foreach { v =>
      val expected = (v.payload.length + 15) / 16
      assert(frames.count(_.media_id == v.media_id) == expected,
        s"video ${v.media_id}: payload ${v.payload.length}B -> $expected frames")
    }
    assert(frames.forall(f => f.offset_bytes == f.frame_idx.toLong * 16))
  }

  test("multimodal feature extraction preserves batch shape and schema") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val feats = Multimodal.extractFeatures(media, partitions = 4)
    assert(feats.rdd.getNumPartitions == 4)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.feature.length == 8))
    // deterministic stub: same input -> same checksum
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(rows.forall(f => again(f.media_id) == f.checksum))
  }
}
