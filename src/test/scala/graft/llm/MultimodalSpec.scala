package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table: payload bytes round-trip the source text") {
    val m = Multimodal.mediaTable(spark, sf001).head()
    assert(m.mime == "text/plain")
    assert(m.width >= 0 && m.width < 1920 && m.height >= 0 && m.height < 1080)
    assert(new String(m.payload, "UTF-8").nonEmpty)
  }

  test("decode stub: nFrames features per doc, offsets monotone, values in [0,1]") {
    val media = Multimodal.mediaTable(spark, sf001)
    val frames = Multimodal.decodeStub(media, nFrames = 4).collect()
    assert(frames.length == media.count() * 4)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame)
      assert(sorted.map(_.frame).toSeq == Seq(0, 1, 2, 3))
      assert(sorted.map(_.offset).toSeq == sorted.map(_.offset).sorted.toSeq)
      assert(fs.forall(f => f.feature >= 0.0 && f.feature <= 1.0))
    }
  }

  test("resize stub: constant output size, deterministic, dims clamped") {
    val media = Multimodal.mediaTable(spark, sf001)
    val resized = Multimodal.resizeStub(media, targetBytes = 32).collect()
    assert(resized.nonEmpty)
    resized.foreach { m =>
      assert(m.payload.length <= 32)
      assert(m.width <= 32 && m.height <= 32)
    }
    val again = Multimodal.resizeStub(media, targetBytes = 32).collect()
      .map(m => (m.doc_id, m.payload.toSeq)).sortBy(_._1).toSeq
    assert(again == resized.map(m => (m.doc_id, m.payload.toSeq)).sortBy(_._1).toSeq)
  }

  test("decode stub is deterministic") {
    val media = Multimodal.mediaTable(spark, sf001)
    val a = Multimodal.decodeStub(media).collect().sortBy(f => (f.doc_id, f.frame)).toSeq
    val b = Multimodal.decodeStub(media).collect().sortBy(f => (f.doc_id, f.frame)).toSeq
    assert(a == b)
  }
}
