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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_meta" -> m01MultimodalMeta _,
    "m02_decode_batch" -> ((s, dir) => m02DecodeBatch(s, dir)))

  /** m02 is rows-only (the stub decode isn't SQL-expressible);
    * MultimodalSpec checks determinism, schema and batch shape.
    */
  val oracles: Map[String, String] = Map(
    "m01_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  length(text) AS char_len,
        |  upper(substr(hex(encode(text)), 1, 8)) AS header_hex,
        |  octet_length(encode(text)) = length(text) AS is_ascii
        |FROM documents ORDER BY doc_id""".stripMargin)
}
