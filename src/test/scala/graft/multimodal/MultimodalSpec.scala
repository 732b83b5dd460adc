package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media frame: binary content + typed metadata, 3 modalities") {
    val media = Multimodal.fromDocuments(spark, Sf0001)
    assert(media.schema("content").dataType.typeName == "binary")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("partition-batched feature extraction: fixed-width normalized features") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.fromDocuments(spark, Sf0001))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // normalized histogram
      assert(f.n_bytes > 0)
    }
  }

  test("decode stub is deterministic") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
  }

  test("frame sampling produces overlapping byte windows") {
    val media = Multimodal.fromDocuments(spark, Sf0001).limit(3)
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 16)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 32))
  }

  test("feature summary aggregates per modality") {
    val sum = Multimodal.featureSummary(spark, Sf0001).collect()
    assert(sum.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(sum.map(_.getAs[Long]("n")).sum ==
      graft.core.Tables.load(spark, Sf0001, "documents").count())
  }
}
