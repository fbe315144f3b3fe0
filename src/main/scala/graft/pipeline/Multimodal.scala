package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernels

/** Multimodal plumbing (SURVEY §2 C12-C13): opaque binary payload
  * columns with typed metadata, and a batched decode/feature-extract
  * pass.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[Multimodal.fakeDecode]]); the
  * Spark-side contract — binary column schema, batch shape, partition
  * parallelism, typed output — is real and tested (MultimodalSpec).
  */
object Multimodal {

  /** C12: binary payload + typed metadata extraction. The corpus text is
    * encoded as the opaque `binary` payload (stand-in for image/audio
    * bytes); metadata — byte length, char length, header bytes, ascii
    * flag — is computed with native binary expressions (no UDF), so at
    * 100 TB this is a pure scan-side projection.
    */
  def m01MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        length(col("text")).cast("long").as("char_len"),
        // first 4 BYTES of the payload (hex). The oracle slices the hex
        // string (substr(hex(encode(text)),1,8)) so both sides are
        // byte-based — substr on the TEXT would count characters and
        // diverge on multibyte prefixes.
        upper(hex(substring(col("payload"), 1, 4))).as("header_hex"),
        (length(col("payload")) === length(col("text"))).as("is_ascii"))
      .orderBy("doc_id")

  case class Media(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, width: Int, height: Int, n_frames: Int,
                     frame_feats: Array[Double])

  /** STUB decode kernel — stands in for a real image/video codec
    * (libjpeg/ffmpeg are not in this container). Deterministic in the
    * payload bytes so results are reproducible across executors and
    * retries; the real implementation would decode `payload` and emit
    * true (width, height, frames, features) with this exact signature.
    */
  def fakeDecode(m: Media): Decoded = {
    val h = Kernels.hash64(m.payload)
    val width = 16 + ((h & 0xff).toInt * 4)            // 16..1036 px
    val height = 16 + (((h >>> 8) & 0xff).toInt * 4)
    val nFrames = 1 + (((h >>> 16) & 0x7) .toInt)      // 1..8 frames
    val feats = Array.tabulate(nFrames) { f =>
      // per-frame feature in [0, 1): avalanche of (payload hash, frame idx)
      (Kernels.mix64(h + f) >>> 11).toDouble / (1L << 53).toDouble
    }
    Decoded(m.doc_id, width, height, nFrames, feats)
  }

  /** C13: batched decode pass. mapPartitions + grouped(batchSize) is the
    * Scala analog of mapInPandas: the codec amortizes per-batch setup
    * (model load, GPU transfer) over `batchSize` rows while holding at
    * most one batch in memory per task — partition-parallel, bounded
    * memory, no driver involvement. Output is a typed Dataset[Decoded]
    * (full Encoder round-trip for the nested array column).
    */
  def m02DecodeBatch(s: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Media]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a real codec would decode these `batch.size`
          // payloads in one vectorized call.
          batch.iterator.map(fakeDecode)
        }
      }
      .toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        round(aggregate(col("frame_feats"), lit(0.0), (acc, x) => acc + x), 6)
          .as("feat_sum"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- m03
  // A REAL decode kernel: binary PPM (P6) image parsing in pure Scala.
  // Uncompressed formats (PPM/PGM images, WAV audio) need no codec
  // library, so for them the decode step is genuine — header parse,
  // stride math, pixel/sample statistics over the actual payload
  // bytes. The fakeDecode stub above remains only for codec formats
  // (JPEG/PNG/MP4) that need libraries this container lacks.

  case class DecodedImage(doc_id: Long, width: Int, height: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double)
  case class DecodedAudio(doc_id: Long, sample_rate: Int, n_samples: Int, rms: Double)

  /** Binary PPM (P6) encoder — the test-feed generator. */
  def ppmBytes(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](width * height * 3)
    var i = 0
    while (i < px.length) {
      px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte
      i += 3
    }
    header ++ px
  }

  /** Binary PPM (P6) decoder: parses the header (magic, dimensions,
    * maxval), then computes per-channel means over the pixel plane.
    * Any stride/offset mistake shifts channels and breaks the oracle.
    */
  def decodePpm(docId: Long, payload: Array[Byte]): DecodedImage = {
    var pos = 0
    def token(): String = {
      while (payload(pos).toChar.isWhitespace) pos += 1
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
      new String(payload, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM payload")
    val (w, h, maxv) = (token().toInt, token().toInt, token().toInt)
    require(maxv == 255, s"unsupported maxval $maxv")
    pos += 1 // single whitespace after maxval, then raster
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = pos
    while (i + 2 < pos + w * h * 3) {
      sr += payload(i) & 0xff; sg += payload(i + 1) & 0xff; sb += payload(i + 2) & 0xff
      i += 3
    }
    val n = (w * h).toDouble
    DecodedImage(docId, w, h, sr / n, sg / n, sb / n)
  }

  /** Minimal WAV (RIFF/PCM16) encoder for the audio test feed. */
  def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples.length * 2); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** WAV (RIFF/PCM16 mono) decoder: walks the chunk structure to the
    * fmt and data chunks, then computes the RMS amplitude.
    */
  def decodeWav(docId: Long, payload: Array[Byte]): DecodedAudio = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    require(fourcc() == "RIFF", "not a RIFF payload"); bb.getInt()
    require(fourcc() == "WAVE", "not a WAVE payload")
    var sampleRate = 0
    var out: DecodedAudio = null
    while (out == null && bb.remaining() >= 8) {
      val (id, size) = (fourcc(), bb.getInt())
      id match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          require(fmt == 1 && ch == 1, "PCM mono only")
          sampleRate = bb.getInt()
          bb.position(bb.position() + size - 8)
        case "data" =>
          val n = size / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) { val s = bb.getShort().toDouble; sumSq += s * s; i += 1 }
          out = DecodedAudio(docId, sampleRate, n, math.sqrt(sumSq / n))
        case _ => bb.position(bb.position() + size)
      }
    }
    out
  }

  /** C13b `m03_decode_image`: the m02 batch shape with a REAL kernel —
    * synthesize one valid binary PPM per doc (the landing-zone
    * stand-in; dimensions and colors are closed forms of doc_id), then
    * genuinely parse the bytes back in batched partition passes. The
    * DuckDB oracle checks the closed forms, so any header/stride
    * parsing bug hash-mismatches.
    */
  def m03DecodeImage(s: SparkSession, dir: String, batchSize: Int = 64): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = 16 + (id % 32).toInt
        val h = 16 + (id * 7 % 32).toInt
        val c = (id % 256).toInt
        Media(id, ppmBytes(w, h, c, (c + 85) % 256, (c + 170) % 256))
      }
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(m => decodePpm(m.doc_id, m.payload))))
      .toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        round(col("mean_r"), 4).as("mean_r"), round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_meta" -> m01MultimodalMeta _,
    "m02_decode_batch" -> ((s, dir) => m02DecodeBatch(s, dir)),
    "m03_decode_image" -> ((s, dir) => m03DecodeImage(s, dir)))

  /** m02 is rows-only (the stub decode isn't SQL-expressible);
    * MultimodalSpec checks determinism, schema and batch shape.
    * m03's oracle is the closed form of the synthesized images — the
    * Spark side must recover it by actually parsing payload bytes.
    */
  val oracles: Map[String, String] = Map(
    "m03_decode_image" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 32 AS BIGINT) AS width,
        |  CAST(16 + (doc_id * 7) % 32 AS BIGINT) AS height,
        |  round(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_r,
        |  round(CAST((doc_id % 256 + 85) % 256 AS DOUBLE), 4) AS mean_g,
        |  round(CAST((doc_id % 256 + 170) % 256 AS DOUBLE), 4) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m01_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  length(text) AS char_len,
        |  upper(substr(hex(encode(text)), 1, 8)) AS header_hex,
        |  octet_length(encode(text)) = length(text) AS is_ascii
        |FROM documents ORDER BY doc_id""".stripMargin)
}
