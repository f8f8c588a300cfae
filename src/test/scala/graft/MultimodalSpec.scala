package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("media pipeline: binary payloads → deterministic features per partition") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    feats.foreach { f =>
      assert(f.feature.length == Multimodal.FakeDecoder.FeatureDim)
      assert(f.n_bytes > 0)
      // L2-normalized fake feature
      val n = math.sqrt(f.feature.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // determinism: same payload → same checksum across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).sorted.toSeq == again.map(_.checksum).sorted.toSeq)
  }

  test("resize decimates image payloads and scales dims; other kinds pass through") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val before = media.collect().map(r => r.media_id -> r).toMap
    val after = Multimodal.resize(media, factor = 4).collect()
    after.foreach { r =>
      val b = before(r.media_id)
      if (b.kind == "image") {
        assert(r.payload.length == (b.payload.length + 3) / 4)
        assert(r.width == b.width / 4 && r.height == b.height / 4)
        // decimation keeps every 4th byte, starting at 0
        assert(r.payload.indices.forall(i => r.payload(i) == b.payload(i * 4)))
      } else {
        assert(r.payload.sameElements(b.payload) && r.width == b.width)
      }
    }
  }

  test("frame sampling yields stride-spaced indices within n_frames") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, Sf))
    val rows = Multimodal.sampleFrames(media, stride = 7).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val idx = r.getSeq[Int](2)
      if (n > 0) {
        assert(idx.head == 0 && idx.last < n)
        assert(idx.sliding(2).forall { case Seq(a, b) => b - a == 7; case _ => true })
      } else assert(idx.isEmpty)
    }
  }
}
