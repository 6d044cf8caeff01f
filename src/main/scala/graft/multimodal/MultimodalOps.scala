package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators (the training-pipeline requirement beyond the
  * reference's surface).
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB: media payloads carry a fake fixed-layout header
  * (magic "GRFT" + big-endian dims/frames) that [[decodeMeta]] parses the
  * way a real decoder would parse a PNG/WAV header. Everything around the
  * stub — the binary schema, the mapPartitions batch shape (the Scala
  * equivalent of an Arrow-batched pandas UDF), per-media-id partitioning,
  * and the frame explode — is real Spark plumbing and is tested.
  *
  * Scale design: decode is a narrow mapPartitions (one pass, no shuffle);
  * only [[frameSample]]'s optional repartition moves data, and it keys by
  * media_id so frames of one asset stay together for downstream encoders.
  */
object MultimodalOps {

  val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
  val HeaderLen: Int = 4 + 4 + 4 + 4 + 4 // magic, kind, width, height, frames

  final case class MediaMeta(kind: String, width: Int, height: Int, n_frames: Int)
  final case class Media(media_id: Long, content: Array[Byte])
  final case class DecodedMedia(media_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, payload_bytes: Long)
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  private val Kinds = Array("imag", "audi", "vide")

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Deterministic fake encoder: wraps a payload in the stub header. The
    * stand-in for "bytes came from object storage". */
  def encodeFake(mediaId: Long, payload: Array[Byte]): Array[Byte] = {
    val kind = Kinds((mediaId % 3).toInt)
    val width = 16 + (mediaId % 64).toInt
    val height = 9 + (mediaId % 32).toInt
    val frames = 1 + (mediaId % 10).toInt
    val out = new Array[Byte](HeaderLen + payload.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    System.arraycopy(kind.getBytes("US-ASCII"), 0, out, 4, 4)
    putInt(out, 8, width); putInt(out, 12, height); putInt(out, 16, frames)
    System.arraycopy(payload, 0, out, HeaderLen, payload.length)
    out
  }

  /** ??? in a real deployment: this is where libpng/ffmpeg would run. The
    * stub parses the fake header with the same failure surface (malformed
    * magic -> None) a real decoder has. */
  def decodeFake(content: Array[Byte]): Option[MediaMeta] =
    if (content.length < HeaderLen || !content.take(4).sameElements(Magic)) None
    else Some(MediaMeta(
      new String(content.slice(4, 8), "US-ASCII"),
      getInt(content, 8), getInt(content, 12), getInt(content, 16)))

  /** Build a media table from the documents testdata: text bytes become the
    * payload (deterministic; no external fixtures needed). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.operators.Tables.documents(spark, dir)
      .filter(col("text").isNotNull) // null text = no media asset (NullInputSpec)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => Media(id, encodeFake(id, text.getBytes("UTF-8"))) }
  }

  /** Decode metadata partition-wise — the mapPartitions batch shape a
    * vectorized decode UDF would use (amortized per-partition setup, e.g.
    * a codec context, happens once per iterator). Malformed rows are
    * dropped, like a tolerant reader's permissive mode. */
  def decodeMeta(media: Dataset[Media]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would go here (once, not per row)
      it.flatMap { m =>
        decodeFake(m.content).map(meta => DecodedMedia(
          m.media_id, meta.kind, meta.width, meta.height, meta.n_frames,
          (m.content.length - HeaderLen).toLong))
      }
    }
  }

  /** Stub resize: rewrite the header dims and decimate the payload by the
    * width ratio (a real implementation swaps only the inner loop). */
  def resize(media: Dataset[Media], newWidth: Int, newHeight: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeFake(m.content).map { meta =>
          val payload = m.content.drop(HeaderLen)
          val ratio = math.max(1, meta.width / math.max(1, newWidth))
          val resized = payload.indices.collect {
            case i if i % ratio == 0 => payload(i)
          }.toArray
          val out = encodeFake(m.media_id, resized)
          putInt(out, 8, newWidth); putInt(out, 12, newHeight)
          Media(m.media_id, out)
        }
      }
    }
  }

  /** Sample every Nth frame: header frame count -> exploded (media_id,
    * frame_idx, frame-payload-slice) rows. The explode multiplies rows
    * without shuffling; the optional repartition co-locates one asset's
    * frames. */
  def frameSample(media: Dataset[Media], everyN: Int,
      repartitionByMedia: Boolean = false): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.flatMap { m =>
      decodeFake(m.content).toSeq.flatMap { meta =>
        val payload = m.content.drop(HeaderLen)
        val per = math.max(1, payload.length / math.max(1, meta.n_frames))
        (0 until meta.n_frames by everyN).map { f =>
          Frame(m.media_id, f, payload.slice(f * per, (f + 1) * per))
        }
      }
    }
    if (repartitionByMedia) frames.repartition(col("media_id")) else frames
  }

  // ---- Real file formats (r4): BMP and WAV are pure byte layouts, so the
  // encode/parse path needs no codec library — the payloads stay synthetic
  // but the CONTAINER format is the real thing a production decoder sees.

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }
  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  final case class BmpMeta(width: Int, height: Int, bpp: Int)
  final case class WavMeta(sample_rate: Int, channels: Int, bits: Int, n_frames: Int)

  /** A valid 24-bit uncompressed BMP: BITMAPFILEHEADER (14 B) +
    * BITMAPINFOHEADER (40 B) + bottom-up pixel rows padded to 4 bytes. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val imageSize = rowBytes * height
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length)
    putIntLE(out, 10, 54) // pixel data offset
    putIntLE(out, 14, 40) // info header size
    putIntLE(out, 18, width)
    putIntLE(out, 22, height)
    putShortLE(out, 26, 1)  // planes
    putShortLE(out, 28, 24) // bits per pixel
    putIntLE(out, 34, imageSize)
    System.arraycopy(pixels, 0, out, 54, math.min(pixels.length, imageSize))
    out
  }

  /** Parse a real BMP header; the same checks a tolerant reader performs. */
  def decodeBmpMeta(b: Array[Byte]): Option[BmpMeta] =
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') None
    else Some(BmpMeta(getIntLE(b, 18), getIntLE(b, 22), getShortLE(b, 28)))

  /** A valid 44-byte PCM WAV (RIFF/WAVE/fmt/data) around 16-bit samples. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + samples.length)
    def tag(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)
    tag(0, "RIFF"); putIntLE(out, 4, 36 + samples.length); tag(8, "WAVE")
    tag(12, "fmt "); putIntLE(out, 16, 16)
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * channels * 2) // byte rate
    putShortLE(out, 32, channels * 2)            // block align
    putShortLE(out, 34, 16)                      // bits per sample
    tag(36, "data"); putIntLE(out, 40, samples.length)
    System.arraycopy(samples, 0, out, 44, samples.length)
    out
  }

  def decodeWavMeta(b: Array[Byte]): Option[WavMeta] = {
    def has(off: Int, s: String) =
      b.length >= off + 4 && new String(b.slice(off, off + 4), "US-ASCII") == s
    if (b.length < 44 || !has(0, "RIFF") || !has(8, "WAVE") || !has(36, "data")) None
    else {
      val channels = getShortLE(b, 22)
      val bits = getShortLE(b, 34)
      val dataLen = getIntLE(b, 40)
      val frameBytes = math.max(1, channels * (bits / 8))
      Some(WavMeta(getIntLE(b, 24), channels, bits, dataLen / frameBytes))
    }
  }

  /** Queries entry: decoded-metadata census over the synthetic media table.
    * r4: oracle-checked — the fake encoder is a deterministic function of
    * (doc_id, text), so DuckDB recomputes the expected metadata directly
    * from the documents table; a hash match pins the whole binary
    * encode -> header-parse -> decode round trip, not just row counts. */
  def q38MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeMeta(mediaFromDocuments(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("payload_bytes")).as("sum_payload"),
        max(col("n_frames")).cast("int").as("max_frames"))
      .orderBy(col("kind").asc)
  }

  /** DuckDB twin of [[q38MediaMeta]]: re-derives kind/frames from doc_id and
    * payload size from the UTF-8 byte length, per [[encodeFake]]. */
  val q38Oracle: String =
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'imag' WHEN 1 THEN 'audi' ELSE 'vide' END AS kind,
      |  COUNT(*) AS n_media,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_payload,
      |  CAST(MAX(1 + doc_id % 10) AS INT) AS max_frames
      |FROM documents GROUP BY kind ORDER BY kind NULLS FIRST""".stripMargin
}
