package graft.operators

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded in per-partition batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (arithmetic over the raw bytes); the
  * Spark-side plumbing — schema, binary payloads, partition-batched decode
  * via `mapPartitions`, metadata struct output — is real and is what a
  * production decoder (JNI/FFI to a codec, or `mapInPandas`+PIL on a
  * PySpark surface) would plug into.
  *
  * Scale: payload bytes never shuffle — decode is a narrow map over the
  * scan; only the small metadata projection flows on. At 100 TB the table
  * would partition by (media_type, date) and the decode stage is
  * embarrassingly parallel.
  */
object Multimodal extends OpModule {

  /** Raw media row as read from storage. */
  final case class MediaRaw(doc_id: Long, media_type: String, payload: Array[Byte])

  /** One decoded media row (stub kernel output). */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      first_byte: Int)

  /** STUB decode kernel: deterministic arithmetic standing in for a real
    * codec. Runs per partition over iterator batches — the exact shape a
    * real decoder needs (amortized per-partition init, streaming
    * iterator, no per-row driver round-trips). */
  def decodePartition(rows: Iterator[MediaRaw]): Iterator[MediaMeta] = {
    // Real implementation would initialize a codec context here, once per
    // partition (e.g. libjpeg/ffmpeg handle), then decode each payload.
    rows.map { r =>
      val len = r.payload.length
      val fb = if (len > 0) r.payload(0) & 0xff else 0
      MediaMeta(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = len,
        width = len % 1024,             // stub: "decoded" dimensions
        height = fb,
        n_frames = if (r.media_type == "video") 1 + len % 16 else 1,
        first_byte = fb)
    }
  }

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * text (an opaque blob as far as the pipeline is concerned),
    * media_type assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Expression-level binary ops: length, checksum, head bytes — the
    * pushdown-friendly projections you run WITHOUT decoding. */
  val m1BinaryMeta: Op = Op(
    "m1_media_binary_meta",
    Some("""
      SELECT doc_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
             md5(text) AS checksum
      FROM documents
      ORDER BY doc_id
    """))((spark, dir) => {
    mediaTable(spark, dir)
      .select(
        col("doc_id"), col("media_type"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("checksum"))
      .orderBy("doc_id")
  })

  /** Batched stub decode via mapPartitions; because the stub is
    * deterministic byte arithmetic, even the decode output is
    * oracle-checkable (ASCII text ⇒ first byte == ascii of first char). */
  val m2Decode: Op = Op(
    "m2_media_decode",
    Some("""
      SELECT doc_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
             CAST(octet_length(encode(text)) % 1024 AS INTEGER) AS width,
             CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS height,
             CAST(CASE WHEN (doc_id % 3) = 2 THEN 1 + octet_length(encode(text)) % 16 ELSE 1 END AS INTEGER) AS n_frames
      FROM documents
      ORDER BY doc_id
    """))((spark, dir) => {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRaw]
      .mapPartitions(decodePartition)
      .toDF()
      .select("doc_id", "media_type", "byte_len", "width", "height", "n_frames")
      .orderBy("doc_id")
  })

  override def ops: Seq[Op] = Seq(m1BinaryMeta, m2Decode)
}
