package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Portable._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample stages of a media curation
  * pipeline.
  *
  * No media codecs exist in this container, so the DECODE step is stubbed
  * two ways, with the Spark-side plumbing (schema, partitioning, batch
  * shape) fully real:
  *
  *  - expression-based stubs ([[byteStats]], [[frameSample]], [[resize]])
  *    compute deterministic features from the real payload bytes with
  *    codegen'd SQL expressions — these are oracle-checked against DuckDB;
  *  - [[decodeFeatures]] runs a [[MediaDecoder]] through
  *    `Dataset.mapPartitions` — decoder constructed ONCE per partition
  *    (the codec-init-amortization pattern; swap [[StubDecoder]] for a JNI
  *    / javacv implementation without touching the plan). Differentially
  *    tested against the expression path in ScalaTest.
  *
  * The synthetic corpus derives from `documents`: payload = concatenated
  * md5 chunks of the text (1–8 chunks ⇒ 16–128 bytes), media_type by
  * doc_id mod 3, plausible dimensioning metadata. The hex string is kept
  * alongside the binary so derived features stay in the portable lowercase
  * hex domain (no dialect-sensitive blob→hex round trip).
  *
  * Scale shape: everything is per-row narrow work (no shuffle at all until
  * a downstream aggregate); at 100 TB the only physical concern is payload
  * size per row group, handled by writer `maxRecordsPerFile` /
  * `parquet.block.size`, and decoder parallelism = partition count.
  */
object Multimodal {

  val ChunkHexChars = 32 // md5 ⇒ 16 bytes per chunk
  val MaxChunks = 8
  val FrameStride = 2

  /** Synthetic media corpus: real BinaryType payload + typed metadata. */
  def media(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"),
      expr(s"""array_join(transform(sequence(0, CAST(doc_id % $MaxChunks AS INT)),
              |  i -> md5(concat(text, ':', i))), '')""".stripMargin)
        .as("payload_hex"))
      .withColumn("payload", unhex(col("payload_hex")))
      .withColumn("n_bytes", expr(s"CAST(length(payload_hex) / 2 AS BIGINT)"))
      .withColumn("meta", struct(
        expr("CAST(16 * (1 + media_id % 20) AS INT)").as("width"),
        expr("CAST(16 * (1 + media_id % 12) AS INT)").as("height"),
        expr("CAST(8000 * (1 + media_id % 3) AS INT)").as("sample_rate"),
        expr(s"CAST(length(payload_hex) / $ChunkHexChars AS INT)").as("n_frames")))

  /** Flat catalog projection (oracle-checked; struct flattened, payload
    * reported as its md5).
    */
  def catalog(docs: DataFrame): DataFrame =
    catalogFrom(media(docs))

  /** [[catalog]] over an ALREADY-MATERIALIZED media relation — the
    * share-one-synthesis seam: the battery derives [[media]] once and
    * every media row reads it (the materialize-once convention).
    */
  def catalogFrom(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"), col("n_bytes"),
      md5(col("payload_hex")).as("payload_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames"))

  /** Decode-stub feature extraction as pure expressions: per-payload byte
    * statistics (exact integer folds — bit-stable in any engine).
    */
  def byteStats(docs: DataFrame): DataFrame =
    byteStatsFrom(media(docs))

  /** [[byteStats]] over an explicit media relation (see [[catalogFrom]]). */
  def byteStatsFrom(media: DataFrame): DataFrame =
    media
      .withColumn("bytes", expr(
        s"transform(sequence(1, CAST(length(payload_hex) / 2 AS INT)), i -> CAST(conv(substr(payload_hex, 2 * i - 1, 2), 16, 10) AS INT))"))
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        expr("CAST(aggregate(bytes, 0L, (a, b) -> a + b) AS DOUBLE) / n_bytes")
          .as("mean_byte"),
        expr("CAST(array_min(bytes) AS INT)").as("min_byte"),
        expr("CAST(array_max(bytes) AS INT)").as("max_byte"),
        expr("CAST(size(array_distinct(bytes)) AS INT)").as("n_distinct_bytes"))

  /** Frame sampling for video rows: every [[FrameStride]]-th 16-byte frame,
    * fingerprinted.
    */
  def frameSample(docs: DataFrame): DataFrame =
    frameSampleFrom(media(docs))

  /** [[frameSample]] over an explicit media relation (see [[catalogFrom]]). */
  def frameSampleFrom(media: DataFrame): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("payload_hex"),
        explode(expr(s"sequence(0, CAST(length(payload_hex) / $ChunkHexChars AS INT) - 1, $FrameStride)"))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"md5(substr(payload_hex, frame_idx * $ChunkHexChars + 1, $ChunkHexChars))")
          .as("frame_md5"))

  /** Resize stub for image rows: halve dimensions, thumbnail = first half
    * of the payload (whole bytes), fingerprinted.
    */
  def resize(docs: DataFrame): DataFrame =
    resizeFrom(media(docs))

  /** [[resize]] over an explicit media relation (see [[catalogFrom]]). */
  def resizeFrom(media: DataFrame): DataFrame =
    media.filter(col("media_type") === "image")
      .select(col("media_id"),
        expr("CAST(meta.width / 2 AS INT)").as("new_width"),
        expr("CAST(meta.height / 2 AS INT)").as("new_height"),
        expr(s"CAST(n_bytes / 2 AS BIGINT)").as("thumb_bytes"),
        expr(s"md5(substr(payload_hex, 1, CAST(n_bytes / 2 AS INT) * 2))")
          .as("thumb_md5"))

  // ---- mapPartitions decode path (the real plugin point) ----

  /** Decoded-feature row produced by a [[MediaDecoder]]. */
  case class MediaFeatures(media_id: Long, media_type: String,
    n_bytes: Long, mean_byte: Double, min_byte: Int, max_byte: Int,
    n_distinct_bytes: Int)

  /** The decode seam: a real implementation wraps a codec library (JNI /
    * javacv / ffmpeg); constructed once per partition so native init is
    * amortized across the whole batch.
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in: byte statistics straight off the payload —
    * chosen to agree exactly with [[byteStats]] so the two paths are
    * differentially testable.
    */
  object StubDecoder extends MediaDecoder {
    def decode(mediaId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
      val u = payload.map(_ & 0xff)
      MediaFeatures(mediaId, mediaType, payload.length.toLong,
        u.map(_.toLong).sum.toDouble / payload.length, u.min, u.max,
        u.distinct.length)
    }
  }

  /** Partition-batched decode over the binary column. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] =
    decodeFeaturesFrom(spark, media(docs), decoder)

  /** [[decodeFeatures]] over an ALREADY-MATERIALIZED media relation (see
    * [[catalogFrom]]) — the decoder was the one media consumer still
    * re-synthesizing the relation per call.
    */
  def decodeFeaturesFrom(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition init seam
        it.map { case (id, tpe, bytes) => d.decode(id, tpe, bytes) }
      }
  }
}
