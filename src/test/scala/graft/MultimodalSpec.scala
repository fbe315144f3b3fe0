package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{Decoded, Media}

/** Contract tests for the multimodal plumbing: the decode kernel is a
  * stub, but the schema, determinism and batch behavior are the real
  * deliverable and are what a codec drop-in would inherit.
  */
class MultimodalSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("fake decoder is deterministic and schema-stable") {
    val m = Media(7L, "some payload bytes".getBytes("UTF-8"))
    val d1 = Multimodal.fakeDecode(m)
    val d2 = Multimodal.fakeDecode(Media(7L, "some payload bytes".getBytes("UTF-8")))
    assert(d1.doc_id == 7L)
    assert(d1.width == d2.width && d1.height == d2.height)
    assert(d1.frame_feats.toSeq == d2.frame_feats.toSeq)
    assert(d1.n_frames == d1.frame_feats.length)
    assert(d1.n_frames >= 1 && d1.n_frames <= 8)
    assert(d1.frame_feats.forall(f => f >= 0.0 && f < 1.0))
  }

  test("m02 runs end-to-end, one output row per document, stable across runs") {
    val r1 = Multimodal.m02DecodeBatch(spark, TestSpark.sfTest).collect()
    val r2 = Multimodal.m02DecodeBatch(spark, TestSpark.sfTest, batchSize = 7).collect()
    val nDocs = graft.pipeline.docs(spark, TestSpark.sfTest).count()
    assert(r1.length == nDocs)
    // batch size must not change results — only amortization
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("PPM decoder recovers dimensions and channel means from real bytes") {
    val img = Multimodal.ppmBytes(20, 10, 200, 30, 99)
    val d = Multimodal.decodePpm(1L, img)
    assert(d.width == 20 && d.height == 10)
    assert(d.mean_r == 200.0 && d.mean_g == 30.0 && d.mean_b == 99.0)
    // a corrupted magic number must be rejected, not mis-parsed
    val bad = img.clone(); bad(1) = '5'.toByte
    intercept[IllegalArgumentException](Multimodal.decodePpm(1L, bad))
  }

  test("WAV decoder recovers sample rate, count and RMS from real bytes") {
    val samples = Array.fill[Short](8000)(1000)
    val d = Multimodal.decodeWav(2L, Multimodal.wavBytes(16000, samples))
    assert(d.sample_rate == 16000 && d.n_samples == 8000)
    assert(math.abs(d.rms - 1000.0) < 1e-9)
    // sine-ish alternating signal: rms = amplitude (square wave)
    val sq = Array.tabulate[Short](4000)(i => if (i % 2 == 0) 500 else -500)
    assert(math.abs(Multimodal.decodeWav(3L, Multimodal.wavBytes(8000, sq)).rms - 500.0) < 1e-9)
  }

  test("VID1 frame walk: sampling stride, per-frame colors, and malformed containers") {
    val id = 13L // nf = 4 + 13%5 = 7 frames, w = 8+13%8 = 13, h = 8+13%5 = 11
    val vid = Multimodal.vidBytes(id)
    val half = Multimodal.sampleFrames(id, vid, every = 2)
    assert(half.n_frames == 7 && half.n_sampled == 4) // frames 0,2,4,6
    assert(half.width == 13 && half.height == 11)
    val expR = Seq(0, 2, 4, 6).map(f => ((id + f * 31) % 256).toDouble).sum / 4
    assert(math.abs(half.avg_r - expR) < 1e-9, s"${half.avg_r} vs $expR")
    // every=1 walks ALL frames — any stride desync shifts later frames
    val full = Multimodal.sampleFrames(id, vid, every = 1)
    assert(full.n_sampled == 7)
    val expAllG = (0 until 7).map(f => ((id + f * 31 + 85) % 256).toDouble).sum / 7
    assert(math.abs(full.avg_g - expAllG) < 1e-9)
    // corrupted container magic must be rejected, not mis-walked
    val bad = vid.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.sampleFrames(id, bad, 2))
  }

  test("m01 metadata: ascii corpus has byte_len == char_len and 8-hex header") {
    val rows = Multimodal.m01MultimodalMeta(spark, TestSpark.sfTest).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_ascii"))
      assert(r.getAs[Long]("byte_len") == r.getAs[Long]("char_len"))
      assert(r.getAs[String]("header_hex").matches("[0-9A-F]{8}"))
    }
  }
}
