package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: envelope schema, frame slicing, and the
  * partition-wise batched extraction shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefghij", "en", "s0", 10L),
    (1L, "klmnopqrstuvwx", "en", "s1", 14L),
    (2L, "yz", "en", "s2", 2L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("synthetic media envelope has the contract schema") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema.fieldNames.toSeq == Seq("id", "media", "meta"))
    assert(m.schema("media").dataType.typeName == "binary")
    val meta = m.select("meta.format", "meta.width", "meta.height", "meta.durationMs")
      .as[(String, Int, Int, Long)].collect().toSet
    assert(meta == Set(("img", 64, 64, 100L), ("aud", 65, 65, 140L), ("vid", 66, 66, 20L)))
  }

  test("frame sampling slices the payload without a UDF") {
    val frames = Multimodal
      .sampleFrames(Multimodal.syntheticMedia(docs), 4)
      .select($"id", $"frame_idx", $"frame".cast("string"))
      .as[(Long, Int, String)]
      .collect()
      .toSet
    // doc 0: len 10, flen 2 → ab cd ef gh (ij dropped)
    assert(frames.filter(_._1 == 0L).map(f => f._2 -> f._3) ==
      Set(0 -> "ab", 1 -> "cd", 2 -> "ef", 3 -> "gh"))
    // doc 2: len 2, flen 0 → all frames empty → filtered out
    assert(!frames.exists(_._1 == 2L))
  }

  test("resize emits target-dim payload AND propagates the new metadata") {
    val recs = Multimodal.asRecords(Multimodal.syntheticMedia(docs).repartition(2))
    val resized = Multimodal.resize(recs, dstW = 8, dstH = 4, batchSize = 2).collect()
    assert(resized.length == 3)
    assert(resized.forall(_.media.length == 8 * 4))
    // metadata must reflect the TARGET dims, not the source
    assert(resized.forall(r => r.meta.width == 8 && r.meta.height == 4))
    // format/duration untouched
    val src = recs.collect().map(r => r.id -> r.meta).toMap
    assert(resized.forall(r => r.meta.format == src(r.id).format &&
      r.meta.durationMs == src(r.id).durationMs))
    // deterministic kernel
    val again = Multimodal.resize(recs, dstW = 8, dstH = 4, batchSize = 2).collect()
    assert(resized.map(r => r.id -> r.media.toSeq).toSet ==
      again.map(r => r.id -> r.media.toSeq).toSet)
  }

  test("extractFeatures runs batched per partition with stable output") {
    val recs = Multimodal.asRecords(Multimodal.syntheticMedia(docs).repartition(2))
    val feats = Multimodal.extractFeatures(recs, dim = 8, batchSize = 2).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.features.forall(f => f >= 0.0f && f < 1.0f)))
    // deterministic: same input bytes → same features
    val again = Multimodal.extractFeatures(recs, dim = 8, batchSize = 2).collect()
    assert(feats.map(_.features.toSeq).toSet == again.map(_.features.toSeq).toSet)
  }
}
