package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal

/** Contract tests for the multimodal plumbing: real codec kernels
  * (JDK ImageIO for PNG/JPEG/GIF, pure-Scala parsers for PPM/WAV/VID1)
  * plus the batch shape any further codec drop-in would inherit.
  */
class MultimodalSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("PNG kernel: ImageIO decode recovers exact gradient means (lossless)") {
    val id = 37L
    val d = Multimodal.decodeImage(id, Multimodal.pngBytes(id))
    assert(d.format == "png")
    val (w, h) = (16 + (id % 32).toInt, 16 + (id * 7 % 32).toInt)
    assert(d.width == w && d.height == h)
    // gradients: R over rows, G over columns, B constant — exact for PNG
    assert(d.mean_r == (id % 200).toDouble + (h - 1) / 2.0)
    assert(d.mean_g == (id * 3 % 200).toDouble + (w - 1) / 2.0)
    assert(d.mean_b == (id * 7 % 200).toDouble)
    // non-image payloads are rejected, not mis-decoded
    intercept[IllegalArgumentException](Multimodal.decodeImage(1L, "not an image".getBytes))
  }

  test("JPEG kernel: lossy round-trip lands within codec tolerance") {
    // encode the m02 gradient image as JPEG via the same JDK codec path
    val id = 21L
    val png = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(Multimodal.pngBytes(id)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(png, "jpg", bos)
    val d = Multimodal.decodeImage(id, bos.toByteArray)
    assert(d.format == "jpeg")
    assert(d.width == png.getWidth && d.height == png.getHeight)
    val exact = Multimodal.decodeImage(id, Multimodal.pngBytes(id))
    // JPEG is lossy but a smooth gradient reconstructs close to exact
    assert(math.abs(d.mean_r - exact.mean_r) < 2.0, s"${d.mean_r} vs ${exact.mean_r}")
    assert(math.abs(d.mean_g - exact.mean_g) < 2.0)
    assert(math.abs(d.mean_b - exact.mean_b) < 2.0)
  }

  test("m02 runs end-to-end, one output row per document, stable across runs") {
    val r1 = Multimodal.m02DecodeBatch(spark, TestSpark.sfTest).collect()
    val r2 = Multimodal.m02DecodeBatch(spark, TestSpark.sfTest, batchSize = 7).collect()
    val nDocs = graft.pipeline.docs(spark, TestSpark.sfTest).count()
    assert(r1.length == nDocs)
    assert(r1.forall(_.getAs[String]("format") == "png"))
    // batch size must not change results — only amortization
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("resize kernel: 2x area downsample recovers closed-form corners and means") {
    val id = 37L // w = 16+5 = 21 (odd -> crop 20), h = 16+3 = 19 (crop 18)
    val r = Multimodal.resizeHalf(id, Multimodal.pngBytes(id))
    assert(r.out_w == 10 && r.out_h == 9)
    val (rb, gb, bb) = ((id % 200).toDouble, (id * 3 % 200).toDouble, (id * 7 % 200).toDouble)
    // output (0,0) is the mean of the 2x2 input block at the origin:
    // R averages input rows 0,1 -> rb + 0.5; G averages cols 0,1
    assert(r.c00_r == rb + 0.5 && r.c00_g == gb + 0.5 && r.c00_b == bb)
    // the far corner pins the full stride walk (last 2x2 block)
    assert(r.cnn_r == rb + 2 * r.out_h - 1.5)
    assert(r.cnn_g == gb + 2 * r.out_w - 1.5)
    // global means over the resized raster
    assert(r.mean_r == rb + r.out_h - 0.5)
    assert(r.mean_g == gb + r.out_w - 0.5)
    assert(r.mean_b == bb)
  }

  test("GIF kernel: animated frame walk, sampling stride, palette exactness") {
    val id = 13L // nf = 4 + 13%5 = 7 frames, w = 8+13%8 = 13, h = 8+13%5 = 11
    val gif = Multimodal.gifBytes(id)
    val half = Multimodal.sampleGifFrames(id, gif, every = 2)
    assert(half.n_frames == 7 && half.n_sampled == 4) // frames 0,2,4,6
    assert(half.width == 13 && half.height == 11)
    // solid-color frames survive GIF's palette round-trip exactly
    val expR = Seq(0, 2, 4, 6).map(f => ((id + f * 31) % 256).toDouble).sum / 4
    assert(math.abs(half.avg_r - expR) < 1e-9, s"${half.avg_r} vs $expR")
    val full = Multimodal.sampleGifFrames(id, gif, every = 1)
    assert(full.n_sampled == 7)
    val expAllB = (0 until 7).map(f => ((id + f * 31 + 170) % 256).toDouble).sum / 7
    assert(math.abs(full.avg_b - expAllB) < 1e-9)
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

  test("m09 VAD kernel: window RMS classification, run lengths, partial windows excluded") {
    // 3 windows of 100: loud / silent / loud → one isolated run
    val s1 = Array.tabulate[Short](300)(i => if (i / 100 == 1) 0 else 800)
    val v1 = Multimodal.vadWav(1L, Multimodal.wavBytes(8000, s1), 100, 50.0)
    assert(v1.n_windows == 3 && v1.n_silent == 1 && v1.longest_silence == 1)
    assert(math.abs(v1.active_ratio - 2.0 / 3) < 1e-9)
    // adjacent silent windows merge into one run of 2
    val s2 = Array.tabulate[Short](400)(i => if (i / 100 >= 2) 0 else 800)
    val v2 = Multimodal.vadWav(2L, Multimodal.wavBytes(8000, s2), 100, 50.0)
    assert(v2.n_silent == 2 && v2.longest_silence == 2)
    // a trailing PARTIAL window never counts (350 samples → 3 windows)
    val s3 = Array.fill[Short](350)(800)
    val v3 = Multimodal.vadWav(3L, Multimodal.wavBytes(8000, s3), 100, 50.0)
    assert(v3.n_windows == 3 && v3.n_silent == 0 && v3.active_ratio == 1.0)
    // the threshold is RMS, not amplitude: quiet-but-nonzero stays silent
    val s4 = Array.fill[Short](100)(30)
    assert(Multimodal.vadWav(4L, Multimodal.wavBytes(8000, s4), 100, 50.0).n_silent == 1)
  }

  test("m10 dHash: perceptually stable under brightness shift, sensitive to content") {
    // wrap-free gradients: values stay inside 0..255 so a uniform
    // brightness shift changes every sample equally and NO comparison
    // flips — the perceptual property dHash exists for
    def flat(base: Int, xStep: Int): Array[Byte] = {
      val header = "P6\n18 14\n255\n".getBytes("US-ASCII")
      val px = new Array[Byte](18 * 14 * 3)
      var i = 0
      for (y <- 0 until 14; x <- 0 until 18) {
        val v = (base + xStep * (x % 4) + y).toByte
        px(i) = v; px(i + 1) = v; px(i + 2) = v
        i += 3
      }
      header ++ px
    }
    val h1 = Multimodal.dhashPpm(1L, flat(40, 9)).dhash
    val h2 = Multimodal.dhashPpm(2L, flat(45, 9)).dhash // +5 brightness
    assert(h1 == h2, "uniform brightness shift must not change the hash")
    val h3 = Multimodal.dhashPpm(3L, flat(40, -9)).dhash // reversed gradient
    assert(h1 != h3, "different content must change the hash")
    // the real fixture: pixel-identical images hash identically
    val a = Multimodal.dhashPpm(4L, Multimodal.gradientPpm(18, 14, 91)).dhash
    val b = Multimodal.dhashPpm(5L, Multimodal.gradientPpm(18, 14, 91)).dhash
    assert(a == b)
    // malformed payloads refuse loudly
    intercept[IllegalArgumentException](
      Multimodal.dhashPpm(6L, "JUNK".getBytes ++ Multimodal.gradientPpm(18, 14, 1)))
  }

  test("WAV chunk walk skips unknown chunks and rejects non-RIFF payloads") {
    // splice a junk chunk ("LIST", 12 bytes) between fmt and data — a
    // spec-conformant reader must skip it by its declared size, not
    // desync into the sample stream
    val samples = Array.tabulate[Short](100)(i => (i * 3 - 150).toShort)
    val wav = Multimodal.wavBytes(8000, samples)
    val junk = "LIST".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(12).array() ++ new Array[Byte](12)
    val dataAt = 36 // 12 RIFF/WAVE + 8 fmt header + 16 fmt body
    val spliced = wav.take(dataAt) ++ junk ++ wav.drop(dataAt)
    // patch the RIFF size field for the extra bytes
    java.nio.ByteBuffer.wrap(spliced, 4, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(36 + samples.length * 2 + junk.length)
    val d = Multimodal.decodeWav(7L, spliced)
    assert(d.sample_rate == 8000 && d.n_samples == 100)
    val want = math.sqrt(samples.map(s => s.toDouble * s).sum / 100)
    assert(math.abs(d.rms - want) < 1e-9)
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(8L, "JUNKJUNKJUNK".getBytes ++ wav))
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

  test("m12 Goertzel kernel: every candidate detected, mixtures break dominance, silence is never dominant") {
    val cands = Seq(500, 1000, 1500, 2000)
    def tone(f: Int, a: Double, n: Int = 800, sr: Int = 8000): Array[Short] =
      Array.tabulate(n)(i => math.round(a * math.sin(2.0 * math.Pi * f * i / sr)).toShort)
    def mix(x: Array[Short], y: Array[Short]): Array[Short] =
      Array.tabulate(x.length)(i => (x(i) + y(i)).toShort)
    // each clean candidate tone is detected with dominance
    cands.foreach { f =>
      val d = Multimodal.detectTone(1L, Multimodal.wavBytes(8000, tone(f, 4000.0)), cands)
      assert(d.freq_hz == f && d.dominance_ok == 1, s"clean $f Hz")
    }
    // two-tone mix: louder wins, dominance fails (energy ratio ≈ 0.8)
    val two = Multimodal.detectTone(2L,
      Multimodal.wavBytes(8000, mix(tone(1000, 4000.0), tone(2000, 2000.0))), cands)
    assert(two.freq_hz == 1000 && two.dominance_ok == 0)
    // non-candidate integer-cycle tone (750 Hz is orthogonal to all
    // four bins): whatever the argmax picks from rounding leakage, it
    // must not claim dominance
    val off = Multimodal.detectTone(3L,
      Multimodal.wavBytes(8000, tone(750, 4000.0)), cands)
    assert(off.dominance_ok == 0)
    // silence: zero total energy is never dominant, tie resolves first
    val sil = Multimodal.detectTone(4L,
      Multimodal.wavBytes(8000, new Array[Short](800)), cands)
    assert(sil.freq_hz == 500 && sil.dominance_ok == 0)
    // amplitude does not move the decision, only the energy scale
    val quiet = Multimodal.detectTone(5L, Multimodal.wavBytes(8000, tone(1500, 300.0)), cands)
    assert(quiet.freq_hz == 1500 && quiet.dominance_ok == 1)
    // malformed RIFF payloads fail LOUDLY with the doc named, never as
    // a div-by-zero bin or a downstream NPE: (a) data chunk before fmt
    // (RIFF does not mandate chunk order), (b) no data chunk at all
    val good = Multimodal.wavBytes(8000, tone(1000, 4000.0))
    val dataFirst = {
      // wavBytes layout: RIFF(12) | fmt hdr(8)+body(16) | data hdr(8)+pcm
      val out = new Array[Byte](good.length)
      System.arraycopy(good, 0, out, 0, 12)
      val fmtLen = 8 + 16
      val dataLen = good.length - 12 - fmtLen
      System.arraycopy(good, 12 + fmtLen, out, 12, dataLen) // data first
      System.arraycopy(good, 12, out, 12 + dataLen, fmtLen) // fmt after
      out
    }
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.detectTone(6L, dataFirst, cands) }
    assert(e1.getMessage.contains("doc 6") && e1.getMessage.contains("fmt"))
    val noData = good.take(12 + 8 + 16) // RIFF + fmt only
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.detectTone(7L, noData, cands) }
    assert(e2.getMessage.contains("doc 7") && e2.getMessage.contains("no data chunk"))
  }
}
