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

  // ------------------------------------------------------------- m04
  // Frame sampling over a VIDEO container — the remaining multimodal
  // verb from the build brief ("decode / feature-extract / resize /
  // frame-sample"), with a REAL parser like m03's: the container is a
  // tiny declared format (`VID1\n<nframes> <fps>\n` + that many binary
  // PPM frames back to back), and the sampler must WALK the frames by
  // parsing each frame's own header to learn its byte length (real
  // stride work — an off-by-one desyncs every later frame and the
  // closed-form oracle catches it).

  case class DecodedVideo(doc_id: Long, n_frames: Int, n_sampled: Int,
                          width: Int, height: Int,
                          avg_r: Double, avg_g: Double, avg_b: Double)

  /** VID1 container encoder — the test-feed generator. Frame colors
    * vary per frame index so sampling the wrong frames changes the
    * averages.
    */
  def vidBytes(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 5).toInt
    val nf = 4 + (id % 5).toInt
    val header = s"VID1\n$nf 10\n".getBytes("US-ASCII")
    header ++ (0 until nf).toArray.flatMap { f =>
      val c = ((id + f * 31) % 256).toInt
      ppmBytes(w, h, c, (c + 85) % 256, (c + 170) % 256)
    }
  }

  /** Parse the VID1 container and decode every `every`-th frame: walk
    * the concatenated PPM frames by parsing each frame's own header
    * (dimensions → stride → frame byte length), slice the sampled ones
    * and reuse [[decodePpm]]; feature = per-channel means averaged over
    * the SAMPLED frames.
    */
  def sampleFrames(docId: Long, payload: Array[Byte], every: Int): DecodedVideo = {
    var pos = 0
    def line(): String = {
      val start = pos
      while (payload(pos) != '\n') pos += 1
      pos += 1
      new String(payload, start, pos - 1 - start, "US-ASCII")
    }
    require(line() == "VID1", "not a VID1 container")
    val Array(nf, _) = line().split(" ").map(_.toInt)
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var sampled = 0
    var (w, h) = (0, 0)
    for (f <- 0 until nf) {
      // each frame's length comes from ITS header: "P6\n<w> <h>\n255\n"
      val headEnd = {
        var p = pos; var nl = 0
        while (nl < 3) { if (payload(p) == '\n') nl += 1; p += 1 }
        p
      }
      val head = new String(payload, pos, headEnd - pos, "US-ASCII").split("\\s+")
      require(head(0) == "P6", s"frame $f is not a P6 frame")
      val (fw, fh) = (head(1).toInt, head(2).toInt)
      val frameLen = (headEnd - pos) + fw * fh * 3
      if (f % every == 0) {
        val img = decodePpm(docId, java.util.Arrays.copyOfRange(payload, pos, pos + frameLen))
        sr += img.mean_r; sg += img.mean_g; sb += img.mean_b
        sampled += 1; w = fw; h = fh
      }
      pos += frameLen
    }
    DecodedVideo(docId, nf, sampled, w, h, sr / sampled, sg / sampled, sb / sampled)
  }

  /** C26 `m04_frame_sample`: synthesize one VID1 container per doc
    * (closed forms of doc_id), then frame-sample every 2nd frame in
    * batched partition passes — the m02/m03 batch shape with the
    * container walk done for real. The DuckDB oracle recomputes the
    * sampled-frame averages from the closed forms, so a frame-walk
    * desync or wrong sampling stride hash-mismatches.
    */
  def m04FrameSample(s: SparkSession, dir: String, every: Int = 2,
                     batchSize: Int = 64): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id")).as[Long]
      .map(id => Media(id, vidBytes(id)))
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(m =>
        sampleFrames(m.doc_id, m.payload, every))))
      .toDF()
      .select(col("doc_id"),
        col("n_frames").cast("long").as("n_frames"),
        col("n_sampled").cast("long").as("n_sampled"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        round(col("avg_r"), 4).as("avg_r"), round(col("avg_g"), 4).as("avg_g"),
        round(col("avg_b"), 4).as("avg_b"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_meta" -> m01MultimodalMeta _,
    "m02_decode_batch" -> ((s, dir) => m02DecodeBatch(s, dir)),
    "m03_decode_image" -> ((s, dir) => m03DecodeImage(s, dir)),
    "m04_frame_sample" -> ((s, dir) => m04FrameSample(s, dir)))

  /** m02 is rows-only (the stub decode isn't SQL-expressible);
    * MultimodalSpec checks determinism, schema and batch shape.
    * m03's oracle is the closed form of the synthesized images — the
    * Spark side must recover it by actually parsing payload bytes.
    */
  val oracles: Map[String, String] = Map(
    "m04_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS n_frames FROM documents
        |), s AS (
        |  SELECT d.doc_id, d.n_frames, g.f
        |  FROM f d, UNNEST(generate_series(0, CAST(d.n_frames - 1 AS INT))) AS g(f)
        |  WHERE g.f % 2 = 0
        |)
        |SELECT doc_id, n_frames, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(8 + doc_id % 8 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 5 AS BIGINT) AS height,
        |  round(avg(CAST((doc_id + f * 31) % 256 AS DOUBLE)), 4) AS avg_r,
        |  round(avg(CAST((doc_id + f * 31 + 85) % 256 AS DOUBLE)), 4) AS avg_g,
        |  round(avg(CAST((doc_id + f * 31 + 170) % 256 AS DOUBLE)), 4) AS avg_b
        |FROM s GROUP BY doc_id, n_frames ORDER BY doc_id""".stripMargin,
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
