package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension, SURVEY.md §7.1 M7).
  *
  * Media (image/audio/video) travels as an opaque `binary` column with typed
  * metadata beside it. Both sides of the boundary are REAL public formats:
  * the fixture synthesizes minimal-but-valid PNG containers (8-byte
  * signature + IHDR chunk with a true CRC-32) and JPEG/JFIF streams (SOI +
  * SOF0 segment), and [[decodeHeader]] parses them back the way any codec
  * does — big-endian IHDR field reads for PNG, a marker-segment scan to
  * SOF0 for JPEG. A production deployment swaps the payload decode
  * (pixels/samples) for libjpeg/ffmpeg via JNI or an external process pool;
  * the header parse, schema, partition-preserving `mapPartitions` batch
  * shape, and frame sampling are exactly what it would keep.
  *
  * Layout written/parsed here (public specs: PNG RFC 2083 §3; JPEG ITU-T
  * T.81 §B.2.2):
  *  - PNG: sig(8) | IHDR len=13(4) | "IHDR"(4) | width(4) height(4)
  *    depth=8(1) color=0(1) comp=0(1) filter=0(1) interlace=0(1) | CRC(4)
  *    | raw payload — 33 header bytes.
  *  - JPEG: FFD8 | FFC0 len=11(2) | precision=8(1) height(2) width(2)
  *    ncomp=1(1) comp id/sampling/qtable(3) | raw payload — 15 header bytes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Long, height: Long, n_frames: Long)
  final case class Frame(media_id: Long, frame_no: Long, frame: Array[Byte])

  /** PNG header length (signature + IHDR chunk). */
  val PngHeaderBytes = 33
  /** JPEG header length (SOI + single-component SOF0 segment). */
  val JpegHeaderBytes = 15

  /** Minimal valid PNG prefix: signature + IHDR (true CRC-32 over
    * type+data), payload appended raw. */
  private[graft] def pngBytes(width: Int, height: Int,
                              payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](PngHeaderBytes + payload.length)
    val bb = java.nio.ByteBuffer.wrap(out) // big-endian by default
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(width).putInt(height)
    bb.put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(out, 12, 17) // chunk type + 13 data bytes
    bb.putInt(crc.getValue.toInt)
    System.arraycopy(payload, 0, out, PngHeaderBytes, payload.length)
    out
  }

  /** Minimal valid JPEG prefix: SOI + baseline SOF0 (8-bit, 1 component),
    * payload appended raw. */
  private[graft] def jpegBytes(width: Int, height: Int,
                               payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](JpegHeaderBytes + payload.length)
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.put(0xFF.toByte).put(0xD8.toByte)          // SOI
    bb.put(0xFF.toByte).put(0xC0.toByte)          // SOF0 marker
    bb.putShort(11.toShort)                       // segment length
    bb.put(8.toByte)                              // sample precision
    bb.putShort(height.toShort).putShort(width.toShort)
    bb.put(1.toByte)                              // component count
    bb.put(1.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1 sampling, qtable
    System.arraycopy(payload, 0, out, JpegHeaderBytes, payload.length)
    out
  }

  /** Real header parse: sniff the container from its magic bytes, then read
    * (kind, width, height) the way a codec does. PNG: verify the 8-byte
    * signature and the IHDR chunk type, read width/height big-endian at
    * fixed offsets, and check the IHDR CRC-32 — a corrupted header fails
    * loudly instead of yielding garbage dimensions. JPEG: verify SOI, then
    * walk marker segments (any order, per T.81) to the first SOF0-SOF3
    * frame header and read height/width from its fixed field layout. */
  private[graft] def decodeHeader(m: Array[Byte]): (String, Long, Long) = {
    def u8(i: Int): Int = m(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def i32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xFFFFFFFFL
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    if (m.length >= PngHeaderBytes && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      require(i32(8) == 13L && new String(m, 12, 4, "US-ASCII") == "IHDR",
        s"PNG: first chunk must be IHDR(13), got len=${i32(8)}")
      val crc = new java.util.zip.CRC32
      crc.update(m, 12, 17)
      require(i32(29) == crc.getValue, "PNG: IHDR CRC mismatch")
      ("png", i32(16), i32(20))
    } else if (m.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var off = 2
      while (off + 4 <= m.length && u8(off) == 0xFF) {
        val marker = u8(off + 1)
        val len = u16(off + 2)
        if (marker >= 0xC0 && marker <= 0xC3) { // SOF0-SOF3 frame header
          require(off + 9 <= m.length, "JPEG: truncated SOF segment")
          return ("jpeg", u16(off + 7).toLong, u16(off + 5).toLong)
        }
        off += 2 + len
      }
      throw new IllegalArgumentException("JPEG: no SOF marker before payload")
    } else throw new IllegalArgumentException(
      s"unknown container (${m.length} bytes; first=${if (m.nonEmpty) u8(0) else -1})")
  }

  final case class AudioMeta(media_id: Long, n_bytes: Long, sample_rate: Long,
                             n_channels: Long, bits: Long, n_samples: Long,
                             duration_ms: Long)

  /** WAV header length (RIFF + fmt + data chunk headers). */
  val WavHeaderBytes = 44

  /** Minimal valid PCM WAV container (RIFF spec, all fields little-endian):
    * RIFF | size=36+data(4) | WAVE | "fmt " | 16(4) | fmt=1(2) | ch(2) |
    * rate(4) | byteRate(4) | blockAlign(2) | bits=16(2) | "data" |
    * dataLen(4) | payload. */
  private[graft] def wavBytes(sampleRate: Int, channels: Int,
                              payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](WavHeaderBytes + payload.length)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(payload.length)
    System.arraycopy(payload, 0, out, WavHeaderBytes, payload.length)
    out
  }

  /** Parse a WAV header the way any audio codec does: verify RIFF/WAVE,
    * walk chunks to `fmt ` and `data` (the walk, not fixed offsets — real
    * files carry LIST/INFO chunks between them). Returns
    * (sampleRate, channels, bits, dataLen). */
  private[graft] def decodeWavHeader(m: Array[Byte]): (Int, Int, Int, Long) = {
    def le16(i: Int): Int = (m(i) & 0xFF) | ((m(i + 1) & 0xFF) << 8)
    def le32(i: Int): Long = (m(i) & 0xFFL) | ((m(i + 1) & 0xFFL) << 8) |
      ((m(i + 2) & 0xFFL) << 16) | ((m(i + 3) & 0xFFL) << 24)
    def tag(i: Int): String = new String(m, i, 4, "US-ASCII")
    require(m.length >= WavHeaderBytes && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE container (${m.length} bytes)")
    var off = 12
    var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
    while (off + 8 <= m.length && (rate < 0 || dataLen < 0)) {
      val id = tag(off)
      val sz = le32(off + 4)
      if (id == "fmt ") {
        ch = le16(off + 10); rate = le32(off + 12).toInt
        bits = le16(off + 22)
      } else if (id == "data") dataLen = sz
      // data is the final chunk here; never step past a truncated payload
      off += 8 + sz.toInt
    }
    require(rate > 0 && dataLen >= 0, "WAV: missing fmt or data chunk")
    (rate, ch, bits, dataLen)
  }

  /** Audio fixture: every document's UTF-8 bytes become a PCM WAV payload
    * with rate/channels derived from the byte length (rate 8000+13n%36000,
    * channels 1+n%2 — the arithmetic the oracle replays). */
  def audioFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val n = payload.length.toLong
        val rate = (8000L + (n * 13L) % 36000L).toInt
        val ch = (1L + n % 2L).toInt
        MediaRow(id, "wav", wavBytes(rate, ch, payload))
      })
  }

  /** Typed audio metadata decode — same partition-preserving batch shape as
    * [[decodeMeta]]; sample count and duration come from the PARSED header
    * fields (dataLen/blockAlign, exact integer division), so a writer/parser
    * disagreement breaks the q_audio_meta hash gate. */
  def audioMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    audioFromDocuments(docs).mapPartitions(_.map { r =>
      val (rate, ch, bits, dataLen) = decodeWavHeader(r.media)
      val blockAlign = ch.toLong * (bits / 8)
      val nSamples = dataLen / blockAlign
      AudioMeta(r.media_id, r.media.length.toLong, rate.toLong, ch.toLong,
        bits.toLong, nSamples, nSamples * 1000L / rate)
    }).toDF()
      .select("media_id", "n_bytes", "sample_rate", "n_channels", "bits",
        "n_samples", "duration_ms")
      .orderBy("media_id")
  }

  final case class VideoMeta(media_id: Long, n_bytes: Long, n_boxes: Long,
                             timescale: Long, duration_ticks: Long,
                             duration_ms: Long, mdat_bytes: Long)

  /** Serialize a minimal ISO-BMFF (MP4) container: `ftyp` (brand isom),
    * `moov` wrapping a version-0 `mvhd` carrying timescale+duration, and
    * `mdat` with the payload — all box sizes big-endian u32, the real
    * wire format. The nested moov/mvhd is what distinguishes this walk
    * from WAV's flat chunk list. */
  private[graft] def mp4Bytes(timescale: Int, durationTicks: Int,
                              payload: Array[Byte]): Array[Byte] = {
    val mvhdBody = 100 // v0: flags+times+timescale+duration+rate+vol+mtx+...
    val out = new Array[Byte](16 + (8 + 8 + mvhdBody) + 8 + payload.length)
    val bb = java.nio.ByteBuffer.wrap(out) // BIG endian by default
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(8 + 8 + mvhdBody).put("moov".getBytes("US-ASCII"))
    bb.putInt(8 + mvhdBody).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version+flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(timescale).putInt(durationTicks)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
    bb.position(bb.position() + 8 + 36 + 24) // reserved + matrix + predefined
    bb.putInt(1) // next_track_id
    bb.putInt(8 + payload.length).put("mdat".getBytes("US-ASCII"))
      .put(payload)
    out
  }

  /** Walk an ISO-BMFF box tree the way a demuxer does: top-level boxes by
    * big-endian u32 size, then INTO moov for mvhd's timescale/duration
    * (version-0 layout). Returns (nBoxes, timescale, durationTicks,
    * mdatBytes); requires ftyp first, like real validators. */
  private[graft] def decodeMp4(m: Array[Byte]): (Long, Long, Long, Long) = {
    def be32(i: Int): Long = ((m(i) & 0xFFL) << 24) | ((m(i + 1) & 0xFFL) << 16) |
      ((m(i + 2) & 0xFFL) << 8) | (m(i + 3) & 0xFFL)
    def tag(i: Int): String = new String(m, i, 4, "US-ASCII")
    require(m.length >= 16 && tag(4) == "ftyp", "not an ISO-BMFF file")
    var off = 0; var nBoxes = 0L
    var ts = -1L; var dur = -1L; var mdat = -1L
    while (off + 8 <= m.length) {
      val sz = be32(off); val id = tag(off + 4)
      nBoxes += 1
      if (id == "moov") { // nested walk
        var in = off + 8
        while (in + 8 <= off + sz) {
          val isz = be32(in)
          if (tag(in + 4) == "mvhd") {
            ts = be32(in + 8 + 4 + 8) // after version/flags + 2 timestamps
            dur = be32(in + 8 + 4 + 8 + 4)
          }
          in += isz.toInt
        }
      } else if (id == "mdat") mdat = sz - 8
      off += sz.toInt
    }
    require(ts > 0 && mdat >= 0, "MP4: missing mvhd or mdat")
    (nBoxes, ts, dur, mdat)
  }

  /** Video fixture: every document becomes a minimal MP4 whose
    * timescale/duration derive from the payload length (timescale
    * 600+7n%9000, duration 25n ticks — the arithmetic the oracle
    * replays). */
  def videoFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val n = payload.length.toLong
        val ts = (600L + (n * 7L) % 9000L).toInt
        MediaRow(id, "mp4", mp4Bytes(ts, (n * 25L).toInt, payload))
      })
  }

  /** Typed video metadata decode via the box walk — duration_ms is the
    * PARSED ticks over the PARSED timescale (exact integer division), so
    * a writer/walker disagreement breaks the q_video_meta hash gate. Same
    * partition-preserving batch shape as the other decoders. */
  def videoMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    videoFromDocuments(docs).mapPartitions(_.map { r =>
      val (nBoxes, ts, dur, mdat) = decodeMp4(r.media)
      VideoMeta(r.media_id, r.media.length.toLong, nBoxes, ts, dur,
        dur * 1000L / ts, mdat)
    }).toDF()
      .select("media_id", "n_bytes", "n_boxes", "timescale",
        "duration_ticks", "duration_ms", "mdat_bytes")
      .orderBy("media_id")
  }

  /** Build a media table from documents: deterministic fixture where even
    * doc_ids become PNG and odd become JPEG containers, dimensions derived
    * from the UTF-8 payload length (width 64+n%576, height 48+7n%432 — the
    * arithmetic the oracle replays), payload = the text bytes. The header
    * written here is the header [[decodeHeader]] must parse back — a bug in
    * either the writer or the parser breaks the q_media_meta hash gate. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val n = payload.length.toLong
        val w = (64L + n % 576L).toInt
        val h = (48L + (n * 7L) % 432L).toInt
        if (id % 2 == 0) MediaRow(id, "png", pngBytes(w, h, payload))
        else MediaRow(id, "jpeg", jpegBytes(w, h, payload))
      })
  }

  /** Partition-preserving typed decode: the shape a real codec needs (batch
    * iteration per partition, no per-row task overhead, no shuffle). The
    * kind is SNIFFED from the bytes, not copied from the input column, and
    * both containers are stills — n_frames is honestly 1. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (kind, w, h) = decodeHeader(r.media)
      MediaMeta(r.media_id, kind, r.media.length.toLong, w, h, 1L)
    })
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
