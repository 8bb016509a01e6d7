package graft

import graft.operators.{MediaRecord, Multimodal, StubDecoder}

/** Multimodal plumbing (SURVEY.md §2.12 X5): schema, typed batch map,
  * deterministic stub features. */
class MultimodalSpec extends SparkSpec {

  test("media table: binary payload with typed metadata, total over docs") {
    val m = Multimodal.mediaTable(spark, sf0001)
    assert(m.count() == Tables.documents(spark, sf0001).count())
    assert(m.schema("content").dataType.typeName == "binary")
    val types = m.select("media_type").distinct().collect().map(_.getString(0))
    assert(types.toSet == Set("image", "audio", "video"))
  }

  test("feature extraction: 1:1, deterministic, L1-normalized histograms") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, sf0001))
      .collect()
    assert(feats.length == Tables.documents(spark, sf0001).count().toInt)
    feats.foreach { f =>
      assert(f.histogram.length == 8)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.n_bytes > 0)
    }
    val again = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, sf0001))
      .collect().map(f => f.doc_id -> f.histogram.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.histogram.toSeq))
  }

  test("stub decoder is identity on payload bytes (documented stub contract)") {
    val payload = "hello media".getBytes("UTF-8")
    val rec = MediaRecord(1L, "image", payload, 16, 16)
    assert(StubDecoder.instance.decode(payload).sameElements(payload))
    assert(StubDecoder.instance.features(rec).n_bytes == payload.length)
  }

  test("metadata-only query prunes the binary column from the scan") {
    val plan = Multimodal.mediaTable(spark, sf0001)
      .select("media_type", "width").queryExecution.executedPlan.toString
    assert(!plan.contains("content"), "payload column must not be scanned")
  }
}
