package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension, SURVEY.md §7.1 M7).
  *
  * Media (image/audio/video) travels as an opaque `binary` column with typed
  * metadata beside it. The Spark-side machinery — schema, partition-preserving
  * typed `mapPartitions` decode, batch shape, frame sampling — is real and
  * tested; the codec itself is a STUB (this container ships no image/audio
  * libraries): [[Multimodal.decodeStub]] derives deterministic fake
  * dimensions from the byte payload. A production deployment replaces that
  * one function with a real decoder (libjpeg/ffmpeg via JNI or an external
  * process pool); everything around it is unchanged.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Long, height: Long, n_frames: Long)
  final case class Frame(media_id: Long, frame_no: Long, frame: Array[Byte])

  /** Build a media table from documents: payload = UTF-8 text bytes (the
    * deterministic stand-in for image bytes), kind = source. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), col("source").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake header parse (see class doc). The
    * arithmetic is mirrored in the DuckDB oracle via length(text). */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.media.length.toLong
    MediaMeta(r.media_id, r.kind, n,
      width = 64L + n % 576L,
      height = 48L + (n * 7L) % 432L,
      n_frames = 1L + n % 16L)
  }

  /** Partition-preserving typed decode: the shape a real codec needs (batch
    * iteration per partition, no per-row task overhead, no shuffle). */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling: every `stride`-th byte window of the payload becomes a
    * "frame" (stand-in for video frame extraction). Fan-out happens inside
    * the partition iterator — no shuffle, output co-partitioned with input. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameBytes: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      (0 until r.media.length by stride).iterator.zipWithIndex.map {
        case (off, no) =>
          Frame(r.media_id, no.toLong,
            r.media.slice(off, math.min(off + frameBytes, r.media.length)))
      }
    })
  }

  /** Metadata view for the driver contract: decode + project, ordered. */
  def mediaMeta(docs: DataFrame): DataFrame =
    decodeMeta(fromDocuments(docs)).toDF()
      .select("media_id", "kind", "n_bytes", "width", "height", "n_frames")
      .orderBy("media_id")

  /** Frame-sampling view for the driver contract: frame index + byte length
    * per sampled frame (lengths, not payloads, so the arithmetic is
    * oracle-checkable; the binary frames themselves flow in
    * [[sampleFrames]]). */
  def frameIndex(docs: DataFrame, stride: Int = 64, frameBytes: Int = 32): DataFrame =
    sampleFrames(fromDocuments(docs), stride, frameBytes).toDF()
      .select(col("media_id"), col("frame_no"),
        length(col("frame")).cast("long").as("frame_len"))
      .orderBy("media_id", "frame_no")
}
