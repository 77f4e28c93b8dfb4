package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a partition-mapped stage (the
  * batch shape a real decoder needs: per-partition init of the
  * native decoder, then a tight per-record loop).
  *
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK with
  * PNG/GIF/BMP/JPEG/WBMP readers, and [[ImageHeaderDecoder]] reads
  * width/height/channels from the header without decoding pixel data.
  * AUDIO decode is REAL: `javax.sound.sampled` parses WAV/AIFF/AU
  * headers ([[AudioHeaderDecoder]] → [[decodeAudio]]) for sample
  * rate / channels / duration without touching sample data. VIDEO is
  * the one remaining kind with no pure-JDK parser: it — and payloads
  * no reader recognizes — falls back to the clearly-marked
  * DETERMINISTIC STUB that derives fake dimensions from payload
  * bytes; the `decoder` output column says which path produced each
  * row. Everything around the codec seam (schema, encoders, partition
  * batching, null handling) is the same either way.
  */
object Multimodal {

  /** One decoded media record. `width`/`height`/`channels` are decode
    * outputs (channels 0 when the stub produced the row — it knows
    * nothing of color models); `ok` is the decode status; `decoder`
    * is "imageio" or "stub". */
  final case class MediaMeta(doc_id: Long, media_kind: String,
                             n_bytes: Int, width: Int, height: Int,
                             channels: Int, ok: Boolean, decoder: String)

  /** Wrap a text-keyed table into (doc_id, media_kind, payload)
    * binary rows — the ingest shape for opaque media. */
  def asPayload(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_kind"),
      col("text").cast("binary").as("payload"))

  /** Real image-header decode over pure-JDK `javax.imageio`: finds a
    * registered reader for the payload (PNG/GIF/BMP/JPEG/WBMP in any
    * stock JDK) and reads width, height, and the color model's
    * channel count from the HEADER — `ImageReader.getWidth/getHeight/
    * getImageTypes` never touch pixel data, so a 50 MB photo costs a
    * few hundred header bytes of work. One instance per partition:
    * the constructor disables ImageIO's global disk cache (executor
    * tasks must not contend on temp files) — the per-partition-init
    * seam a native codec (libjpeg-turbo, ffmpeg) would use.
    */
  private final class ImageHeaderDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    /** (width, height, channels), or None if no reader recognizes the
      * payload. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      if (payload == null || payload.length < 4) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val types = r.getImageTypes(0)
            val ch =
              if (types.hasNext) types.next().getColorModel.getNumComponents
              else 0
            Some((w, h, ch))
          } catch { case _: Exception => None } // truncated/corrupt header
          finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** One decoded audio record: container-header fields only
    * (`javax.sound.sampled` reads WAV/AIFF/AU headers without decoding
    * samples). `duration_sec` is frames/frameRate, -1.0 when the
    * header doesn't carry a frame count (e.g. streamed WAV with
    * unknown length). */
  final case class AudioMeta(doc_id: Long, n_bytes: Int,
                             sample_rate: Float, channels: Int,
                             duration_sec: Double, ok: Boolean,
                             decoder: String)

  /** Real audio-header decode over pure-JDK `javax.sound.sampled`:
    * `AudioSystem.getAudioFileFormat` parses the container header
    * (WAV/AIFF/AU in any stock JDK) for sample rate, channel count,
    * and frame length — it never decodes sample data, same
    * header-only argument as [[ImageHeaderDecoder]]. One instance per
    * partition (the init seam a native codec — ffmpeg, libsndfile —
    * would use). */
  private final class AudioHeaderDecoder {
    /** (sampleRate, channels, durationSec), or None if no provider
      * recognizes the payload. */
    def decode(payload: Array[Byte]): Option[(Float, Int, Double)] = {
      if (payload == null || payload.length < 12) return None
      try {
        val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val af = fmt.getFormat
        val dur =
          if (fmt.getFrameLength >= 0 && af.getFrameRate > 0)
            fmt.getFrameLength / af.getFrameRate.toDouble
          else -1.0
        Some((af.getSampleRate, af.getChannels, dur))
      } catch {
        // UnsupportedAudioFileException / truncated header
        case _: Exception => None
      }
    }
  }

  /** Decode audio payloads partition-wise through the real
    * [[AudioHeaderDecoder]]; unrecognized payloads report ok = false
    * with zeroed fields (decoder "none") rather than faking numbers —
    * audio is a typed path, not a stub. */
  def decodeAudio(payloads: DataFrame)
                 (implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new AudioHeaderDecoder // per-partition init
        it.map { case (id, payload) =>
          val n = if (payload == null) 0 else payload.length
          dec.decode(payload) match {
            case Some((sr, ch, dur)) =>
              AudioMeta(id, n, sr, ch, dur, ok = true, decoder = "sound")
            case None =>
              AudioMeta(id, n, 0f, 0, -1.0, ok = false, decoder = "none")
          }
        }
      }
  }

  // ======================================================================
  // STUB DECODER — deterministic fake for VIDEO (the one kind the JDK
  // has no header parser for) and for unrecognizable payloads. A real
  // implementation binds a native library here (one init per
  // partition, reused across records). The fake derives "dimensions"
  // from payload bytes so tests are reproducible without codecs.
  // ======================================================================
  private final class StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Boolean) =
      if (payload == null || payload.isEmpty) (0, 0, false)
      else {
        val w = 16 + (payload(0) & 0x7f)
        val h = 16 + (payload(payload.length - 1) & 0x7f)
        (w, h, true)
      }
  }

  /** Decode payloads partition-wise. Image payloads go through the
    * real [[ImageHeaderDecoder]] first; payloads it can't recognize
    * (and the audio/video kinds) take the stub. Decoders are
    * constructed once per partition (models expensive codec init),
    * the iterator is consumed lazily (no partition-sized buffering),
    * and output is a typed Dataset so downstream stages stay
    * columnar.
    */
  def decode(payloads: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("media_kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val img = new ImageHeaderDecoder // per-partition init
        val stub = new StubDecoder
        it.map { case (id, kind, payload) =>
          val n = if (payload == null) 0 else payload.length
          val real = if (kind == "image") img.decode(payload) else None
          real match {
            case Some((w, h, ch)) =>
              MediaMeta(id, kind, n, w, h, ch, ok = true, decoder = "imageio")
            case None =>
              val (w, h, ok) = stub.decode(payload)
              MediaMeta(id, kind, n, w, h, 0, ok, decoder = "stub")
          }
        }
      }
  }

  final case class MediaFeature(doc_id: Long, embedding: Array[Float])

  /** Feature extraction STUB: payload → fixed-`dim` float vector.
    * A real model runs here (batched per partition); the stub folds
    * payload bytes into buckets and L2-normalizes, so outputs are
    * deterministic, non-degenerate, and feed directly into the
    * `Similarity` ANN operators (same `Array[Float]` shape as the
    * embeddings table).
    */
  def extractFeatures(payloads: DataFrame, dim: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val acc = new Array[Float](dim)
          if (payload != null) {
            var i = 0
            while (i < payload.length) {
              acc(i % dim) += ((payload(i) & 0xff) - 128) / 128.0f
              i += 1
            }
          }
          val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x * x))
          val out = if (norm > 0) acc.map(x => (x / norm).toFloat) else acc
          MediaFeature(id, out)
        }
      }
  }

  /** Frame sampling STUB for video-like payloads: split the payload
    * into fixed-size "frames" and keep every `stride`-th one, exploded
    * to one row per sampled frame — the shape a frame-level pipeline
    * (dedup, feature extraction per frame) consumes. Pure column ops:
    * the slicing happens in the scan projection, no UDF.
    */
  def sampleFrames(payloads: DataFrame, frameBytes: Int,
                   stride: Int): DataFrame = {
    require(frameBytes >= 1 && stride >= 1)
    val nFrames = ceil(octet_length(col("payload")) / lit(frameBytes.toDouble))
      .cast("int")
    payloads.select(col("doc_id"), col("payload"), nFrames.as("__nf"))
      .where(col("__nf") > 0)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), col("__nf") - 1, lit(stride)),
          f => struct(f.as("frame_idx"),
            col("payload").substr(f * frameBytes + 1, lit(frameBytes))
              .as("frame")))).as("s"))
      .select(col("doc_id"), col("s.frame_idx"), col("s.frame"))
  }
}
