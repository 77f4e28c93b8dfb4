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
  * PNG/GIF/BMP/JPEG/WBMP readers — [[ImageHeaderDecoder]] reads
  * width/height/channels from the header without decoding pixel data,
  * and [[extractFeatures]] runs a REAL full-pixel decode
  * (`ImageIO.read` via [[PixelDecoder]]) so image embeddings are
  * computed from sRGB pixel values, not container bytes.
  * AUDIO decode is REAL: `javax.sound.sampled` parses WAV/AIFF/AU
  * headers ([[AudioHeaderDecoder]] → [[decodeAudio]]) for sample
  * rate / channels / duration without touching sample data. VIDEO
  * decode is REAL: [[VideoHeaderDecoder]] → [[decodeVideo]] walks
  * ISO-BMFF (MP4/MOV/M4V) box structure for dimensions and duration,
  * header-only. Payloads no parser recognizes fall back to the
  * clearly-marked DETERMINISTIC STUB that derives fake dimensions
  * from payload bytes; the `decoder` output column says which path
  * produced each row. Everything around the codec seam (schema,
  * encoders, partition batching, null handling) is the same either
  * way.
  */
object Multimodal {

  /** One decoded media record. `width`/`height`/`channels` are decode
    * outputs (channels 0 when the stub produced the row — it knows
    * nothing of color models); `ok` is the decode status; `decoder`
    * is "imageio" (real image parse), "isobmff" (real video
    * mvhd/tkhd header parse), or "stub". */
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

  /** MP3 frame-header metadata parse — pure-JDK bit parsing of the
    * published MPEG-1/2/2.5 audio frame header (ISO/IEC 11172-3 /
    * 13818-3), the same header-only pattern as the ISO-BMFF and
    * RIFF walks: 4-byte headers are read and frames are SKIPPED by
    * their computed length; no sample data is ever decoded (no JDK
    * codec exists for that — it stays the declared stub surface).
    *
    * Layout (b1..b4): 11 sync bits (0xFFE0), 2 version bits
    * (00=2.5, 01=reserved, 10=2, 11=1), 2 layer bits (01=III,
    * 10=II, 11=I), then bitrate index (4), sample-rate index (2),
    * padding bit, and channel mode (mono iff 11). Frame length:
    * Layer I = (12·br/sr + pad)·4; Layer II and MPEG-1 Layer III =
    * 144·br/sr + pad; MPEG-2/2.5 Layer III = 72·br/sr + pad
    * (576 samples/frame instead of 1152). Walking successive
    * headers sums exact per-frame samples, so `duration_sec` is
    * right for VBR streams too — not a CBR byte-count estimate.
    *
    * Recognition gate (the [[VideoHeaderDecoder]] `topLevel`
    * argument): the sync must sit at offset 0 — after an optional
    * ID3v2 tag, skipped via its syncsafe size — and the first
    * header must be fully valid. Arbitrary bytes fall through to
    * None instead of being misparsed; a sync APPEARING mid-buffer
    * is not treated as MP3. */
  private object Mp3Frames {
    // kbps by [version V1=0/V2+V2.5=1][layer I=0/II=1/III=2][index 1..14]
    private val kbps: Array[Array[Array[Int]]] = Array(
      Array(
        Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
        Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
        Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
      Array(
        Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
        Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))
    private val srHz: Map[Int, Array[Int]] = Map(
      3 -> Array(44100, 48000, 32000), // MPEG-1
      2 -> Array(22050, 24000, 16000), // MPEG-2
      0 -> Array(11025, 12000, 8000))  // MPEG-2.5

    /** (sampleRateHz, bitrateKbps, channels, samplesPerFrame,
      * frameBytes) of one header at `o`, or None if any field is
      * reserved/invalid. */
    def frameAt(b: Array[Byte], o: Int): Option[(Int, Int, Int, Int, Int)] = {
      if (o + 4 > b.length) return None
      if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return None
      val ver = (b(o + 1) >> 3) & 3   // 0=2.5 1=reserved 2=V2 3=V1
      val layer = (b(o + 1) >> 1) & 3 // 0=reserved 1=III 2=II 3=I
      if (ver == 1 || layer == 0) return None
      val brIdx = (b(o + 2) >> 4) & 15
      val srIdx = (b(o + 2) >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/bad
      val pad = (b(o + 2) >> 1) & 1
      val mono = ((b(o + 3) >> 6) & 3) == 3
      val sr = srHz(ver)(srIdx)
      val br = kbps(if (ver == 3) 0 else 1)(3 - layer)(brIdx)
      val (samples, len) = layer match {
        case 3 => (384, (12 * br * 1000 / sr + pad) * 4)               // I
        case 2 => (1152, 144 * br * 1000 / sr + pad)                   // II
        case _ =>                                                      // III
          if (ver == 3) (1152, 144 * br * 1000 / sr + pad)
          else (576, 72 * br * 1000 / sr + pad)
      }
      Some((sr, br, if (mono) 1 else 2, samples, len))
    }

    /** ID3v2 tag length at offset 0 (header + syncsafe size [+
      * footer]), or 0 when absent. */
    def id3v2Len(b: Array[Byte]): Int = {
      if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = if ((b(5) & 0x10) != 0) 10 else 0
      10 + size + footer
    }

    /** (sampleRate, channels, durationSec) from the first header's
      * rate/mode and the exact per-frame sample sum of the walk. */
    def decode(payload: Array[Byte]): Option[(Float, Int, Double)] = {
      if (payload == null || payload.length < 14) return None
      val start = id3v2Len(payload)
      frameAt(payload, start).map { case (sr0, _, ch0, _, _) =>
        var o = start
        var samples = 0L
        var going = true
        while (going) frameAt(payload, o) match {
          case Some((_, _, _, smp, len)) if len > 0 =>
            samples += smp; o += len
          case _ => going = false
        }
        (sr0.toFloat, ch0, samples.toDouble / sr0)
      }
    }
  }

  /** AAC/ADTS frame-header metadata parse — [[Mp3Frames]]'s pattern
    * applied to the ADTS transport layout (ISO/IEC 13818-7 §6.2 /
    * 14496-3): 12 sync bits 0xFFF, 1 version bit, 2 layer bits
    * (always 00 in ADTS — which is exactly the value the MP3 header
    * RESERVES, so the two parsers are mutually exclusive by
    * construction and the fallback chain cannot misroute), CRC-absent
    * bit, then profile(2)/sampling-frequency index(4)/channel
    * config(3), a 13-bit whole-frame length, and a 2-bit
    * frames-minus-1 count (1024 samples per AAC frame). Headers are
    * read, frames skipped by their declared length; sample data never
    * decodes (still the stub surface). Same recognition gate: sync at
    * offset 0 after an optional ID3v2 skip, first header fully
    * valid. */
  private object AdtsFrames {
    private val srHz = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)

    /** (sampleRateHz, channels, samples, frameBytes) of one ADTS
      * header at `o`, or None on any reserved/invalid field.
      * Channels: config 1-6 map to themselves, 7 to 8, 0 (declared
      * in an in-band PCE this parser never reads) to 0 — honest
      * "unknown", not a guess. */
    def frameAt(b: Array[Byte], o: Int): Option[(Int, Int, Int, Int)] = {
      if (o + 7 > b.length) return None
      if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xf0) != 0xf0) return None
      if (((b(o + 1) >> 1) & 3) != 0) return None // layer must be 00
      val srIdx = (b(o + 2) >> 2) & 0xf
      if (srIdx >= srHz.length) return None
      val cfg = ((b(o + 2) & 1) << 2) | ((b(o + 3) >> 6) & 3)
      val len = ((b(o + 3) & 3) << 11) | ((b(o + 4) & 0xff) << 3) |
        ((b(o + 5) >> 5) & 7)
      if (len < 7) return None // must cover its own header
      val samples = 1024 * ((b(o + 6) & 3) + 1)
      val channels = if (cfg == 7) 8 else cfg
      Some((srHz(srIdx), channels, samples, len))
    }

    /** (sampleRate, channels, durationSec) — first header's
      * rate/config, exact sample sum of the walk. */
    def decode(payload: Array[Byte]): Option[(Float, Int, Double)] = {
      if (payload == null || payload.length < 14) return None
      val start = Mp3Frames.id3v2Len(payload)
      frameAt(payload, start).map { case (sr0, ch0, _, _) =>
        var o = start
        var samples = 0L
        var going = true
        while (going) frameAt(payload, o) match {
          case Some((_, _, smp, len)) => samples += smp; o += len
          case None => going = false
        }
        (sr0.toFloat, ch0, samples.toDouble / sr0)
      }
    }
  }

  /** Decode audio payloads partition-wise: the real
    * [[AudioHeaderDecoder]] first (WAV/AIFF/AU via javax.sound),
    * then the [[Mp3Frames]] frame-header walk (decoder "mp3hdr") and
    * the [[AdtsFrames]] walk (decoder "aachdr") for MPEG audio the
    * JDK providers don't read; payloads none recognizes report
    * ok = false with zeroed fields (decoder "none") rather than
    * faking numbers — audio is a typed path, not a stub. */
  /** FLAC STREAMINFO header metadata ([[Mp3Frames]]'s pattern for
    * the other ubiquitous audio container; the FLAC format spec —
    * RFC 9639 — is published): after the `fLaC` magic, the FIRST
    * metadata block is required to be STREAMINFO (type 0) — 1-byte
    * block header, 3-byte big-endian length, then the fixed 34-byte
    * layout carrying the 20-bit sample rate, 3-bit channels-1 and
    * 36-bit total inter-channel samples this parser reads. Duration
    * is exact (`total / rate`), not estimated — lossless FLAC
    * declares its sample count; a zero sample-count field is legal
    * ("unknown") and reports -1.0. HEADER-only: no frame is ever
    * decoded (FLAC sample decode would be pure-JDK-feasible rice
    * coding, but it is out of metadata scope the same way PCM sample
    * decode lives in [[SampleDecoder]], not here).
    *
    * Recognition gate: the magic plus a type-0 first block with a
    * plausible length and a non-zero sample rate (zero is invalid
    * per spec). */
  private object FlacHeader {
    def decode(payload: Array[Byte]): Option[(Float, Int, Double)] = {
      if (payload == null || payload.length < 4 + 4 + 34) return None
      if (payload(0) != 'f' || payload(1) != 'L' ||
          payload(2) != 'a' || payload(3) != 'C') return None
      if ((payload(4) & 0x7f) != 0) return None // STREAMINFO first
      val len = ((payload(5) & 0xff) << 16) | ((payload(6) & 0xff) << 8) |
        (payload(7) & 0xff)
      if (len < 34) return None
      def b(o: Int): Int = payload(8 + o) & 0xff
      // bytes 10..17 pack sr[19:0] ch[2:0] bps[4:0] total[35:0]
      val sr = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
      if (sr <= 0) return None
      val ch = ((b(12) >> 1) & 7) + 1
      val total = ((b(13).toLong & 0x0f) << 32) |
        (b(14).toLong << 24) | (b(15).toLong << 16) |
        (b(16).toLong << 8) | b(17).toLong
      val dur = if (total > 0) total.toDouble / sr else -1.0
      Some((sr.toFloat, ch, dur))
    }
  }

  def decodeAudio(payloads: DataFrame)
                 (implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new AudioHeaderDecoder // per-partition init
        it.map { case (id, payload) =>
          val n = if (payload == null) 0 else payload.length
          dec.decode(payload)
            .map(r => (r, "sound"))
            .orElse(Mp3Frames.decode(payload).map(r => (r, "mp3hdr")))
            .orElse(AdtsFrames.decode(payload).map(r => (r, "aachdr")))
            .orElse(FlacHeader.decode(payload).map(r => (r, "flachdr"))) match {
            case Some(((sr, ch, dur), d)) =>
              AudioMeta(id, n, sr, ch, dur, ok = true, decoder = d)
            case None =>
              AudioMeta(id, n, 0f, 0, -1.0, ok = false, decoder = "none")
          }
        }
      }
  }

  /** One decoded video record: ISO-BMFF container-header fields only.
    * `width`/`height` come from the first track header with non-zero
    * visual dimensions (audio-only containers report 0×0 but still
    * parse, like an .m4a); `duration_sec` is mvhd duration/timescale,
    * -1.0 when the header carries none. */
  final case class VideoMeta(doc_id: Long, n_bytes: Int,
                             width: Int, height: Int,
                             duration_sec: Double, ok: Boolean,
                             decoder: String)

  /** Real video-header parse for ISO-BMFF containers (MP4/MOV/M4V —
    * ISO/IEC 14496-12, a published spec): a box is [u32 size][4cc
    * type][payload], size 1 → u64 largesize follows, size 0 → to end
    * of file. Walks top-level boxes to `moov`, reads `mvhd` (v0:
    * u32 timescale@12, u32 duration@16; v1: u32 timescale@20, u64
    * duration@24) and each `trak`/`tkhd` (16.16 fixed-point width/
    * height at payload offset 76/80 for v0, 88/92 for v1). Header-only,
    * no sample data touched — same argument as [[ImageHeaderDecoder]].
    * Recognition gate: the FIRST box's 4cc must be a well-known
    * top-level type, so arbitrary bytes fall through to None instead
    * of being misparsed. */
  private final class VideoHeaderDecoder {
    private val topLevel = Set("ftyp", "styp", "moov", "moof", "mdat",
      "free", "skip", "wide", "pdin", "sidx", "meta", "uuid")
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (boxType, payloadStart, boxEnd) for the box at `o`, or None on
      * a malformed/truncated header. */
    private def box(b: Array[Byte], o: Int, limit: Int)
        : Option[(String, Int, Int)] = {
      if (o + 8 > limit) return None
      val size = u32(b, o)
      val tpe = fourcc(b, o + 4)
      val (end, payload) =
        if (size == 0) (limit.toLong, o + 8)
        else if (size == 1) {
          if (o + 16 > limit) return None
          (o + u64(b, o + 8), o + 16)
        } else (o + size, o + 8)
      if (end < payload || end > limit) None
      else Some((tpe, payload, end.toInt))
    }

    /** (width, height, durationSec), or None if the payload is not a
      * parseable ISO-BMFF container. Catch-all like the image/audio
      * decoders: one malformed record must report ok=false, not fail
      * the task. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Double)] =
      try decodeUnsafe(payload) catch { case _: Exception => None }

    private def decodeUnsafe(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      if (payload == null || payload.length < 16) return None
      val n = payload.length
      box(payload, 0, n) match {
        case Some((t, _, _)) if topLevel(t) => ()
        case _ => return None
      }
      var dur = -1.0
      var w = 0
      var h = 0
      var sawMvhd = false
      var o = 0
      while (o < n) {
        box(payload, o, n) match {
          case Some(("moov", p0, moovEnd)) =>
            var p = p0
            while (p < moovEnd) {
              box(payload, p, moovEnd) match {
                case Some(("mvhd", mp, mEnd)) =>
                  val v = payload(mp) & 0xff
                  val (tsOff, durLen) = if (v == 1) (20, 8) else (12, 4)
                  if (mp + tsOff + 4 + durLen <= mEnd) {
                    val ts = u32(payload, mp + tsOff)
                    val d = if (v == 1) u64(payload, mp + tsOff + 4)
                            else u32(payload, mp + tsOff + 4)
                    if (ts > 0) { dur = d.toDouble / ts; sawMvhd = true }
                  }
                  p = mEnd
                case Some(("trak", tp0, trakEnd)) =>
                  var tp = tp0
                  while (tp < trakEnd) {
                    box(payload, tp, trakEnd) match {
                      case Some(("tkhd", kp, kEnd)) =>
                        val v = payload(kp) & 0xff
                        val whOff = if (v == 1) 88 else 76
                        if (kp + whOff + 8 <= kEnd && w == 0 && h == 0) {
                          // 16.16 fixed point: integer part only
                          val tw = (u32(payload, kp + whOff) >> 16).toInt
                          val th = (u32(payload, kp + whOff + 4) >> 16).toInt
                          if (tw > 0 && th > 0) { w = tw; h = th }
                        }
                        tp = kEnd
                      case Some((_, _, end)) => tp = end
                      case None => tp = trakEnd
                    }
                  }
                  p = trakEnd
                case Some((_, _, end)) => p = end
                case None => p = moovEnd
              }
            }
            o = moovEnd
          case Some((_, _, end)) => o = end
          case None => o = n
        }
      }
      if (sawMvhd) Some((w, h, dur)) else None
    }
  }

  /** Annex-B machinery shared by the H.264 and H.265 SPS walks: the
    * MSB-first Exp-Golomb bit reader (identical in both specs, §9.1 /
    * §9.2), the 00 00 03 emulation-prevention unescape, and the
    * start-code NAL scan. Each codec reads its own NAL header off the
    * raw span ([[H264Sps]]: one byte, type = `b & 0x1f`; [[H265Sps]]:
    * two bytes, type = `(b >> 1) & 0x3f`). */
  private object AnnexB {
    /** MSB-first bit reader with Exp-Golomb. */
    final class Bits(b: Array[Byte]) {
      private var pos = 0
      def more: Boolean = pos < b.length * 8
      def u1(): Int = {
        val r = (b(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; r }
      def u(n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
      def ue(): Int = {
        var zeros = 0
        while (more && u1() == 0) zeros += 1
        ((1L << zeros) - 1 + u(zeros)).toInt }
      def se(): Int = {
        val k = ue(); if (k % 2 == 0) -(k / 2) else (k + 1) / 2 }
    }

    def unescape(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(until - from)
      var i = from
      while (i < until) {
        if (i + 2 < until && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 3) {
          out.write(0); out.write(0); i += 3 // drop the 03
        } else { out.write(b(i)); i += 1 }
      }
      out.toByteArray
    }

    /** The byte-stream gate both codecs share: a start code at
      * offset 0 (0x000001 or 0x00000001). */
    def atZero(payload: Array[Byte]): Boolean =
      payload != null && payload.length >= 8 &&
        payload(0) == 0 && payload(1) == 0 &&
        (payload(2) == 1 || (payload(2) == 0 && payload(3) == 1))

    /** Raw NAL spans (start, end) — `start` points at the first
      * NAL-HEADER byte; the next start code's 00 00 (00) prefix is
      * trimmed off `end` as separator, not payload. */
    def units(b: Array[Byte]): Vector[(Int, Int)] = {
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i + 2 < b.length) {
        if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
          starts += i + 3; i += 3
        } else i += 1
      }
      starts.iterator.zipAll(starts.iterator.drop(1), -1, b.length)
        .collect { case (s, e) if s >= 0 && s < b.length =>
          var end = if (e == b.length) e else e - 3
          while (end > s && b(end - 1) == 0) end -= 1
          (s, end)
        }.toVector
    }
  }

  /** H.264 Annex-B SPS header metadata — [[Mp3Frames]]'s pattern for
    * raw video elementary streams (ITU-T H.264 §7.3.2.1, a published
    * spec): walk NAL units by their 0x000001/0x00000001 start codes,
    * strip emulation-prevention bytes from the SPS payload
    * (00 00 03 → 00 00), and read the sequence parameter set with an
    * Exp-Golomb bit reader — profile/level, `pic_width_in_mbs` /
    * `pic_height_in_map_units` with the frame-cropping rectangle
    * applied (so a 1920×1080 stream reports 1080, not its coded
    * 1088), and, when the VUI carries `timing_info`, the frame rate
    * `time_scale / (2·num_units_in_tick)` — multiplied by the
    * stream's coded-slice NAL count (types 1/5) for a duration.
    * HEADER-only, as every parser here: slice payloads are skipped
    * by start-code scan, never entropy-decoded (CABAC/CAVLC frame
    * decode stays the declared stub surface).
    *
    * Recognition gate: the payload must BEGIN with a start code and
    * contain an SPS NAL (type 7) — arbitrary bytes, and the other
    * containers' magic, fall through to None. */
  private object H264Sps {
    import AnnexB.{Bits, unescape}

    /** NAL unit offsets: (payloadStart, payloadEnd, type). */
    private def nals(b: Array[Byte]): Vector[(Int, Int, Int)] =
      AnnexB.units(b).map { case (s, e) => (s + 1, e, b(s) & 0x1f) }

    /** §7.3.2.1 parse of one unescaped SPS payload:
      * (width, height, fps — 0.0 when the VUI has no timing). */
    private def parseSps(rbsp: Array[Byte]): Option[(Int, Int, Double)] = {
      val r = new Bits(rbsp)
      val profile = r.u(8).toInt
      r.u(8) // constraint flags + reserved
      r.u(8) // level_idc
      r.ue() // seq_parameter_set_id
      var chromaFormat = 1 // 4:2:0 unless the high-profile branch says else
      if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profile)) {
        chromaFormat = r.ue()
        if (chromaFormat == 3) r.u1() // separate_colour_plane_flag
        r.ue(); r.ue() // bit_depth_luma/chroma_minus8
        r.u1() // qpprime_y_zero_transform_bypass
        if (r.u1() == 1) { // seq_scaling_matrix_present
          val lists = if (chromaFormat == 3) 12 else 8
          for (i <- 0 until lists if r.u1() == 1) {
            // scaling_list(): skip deltas until nextScale settles
            val size = if (i < 6) 16 else 64
            var last = 8; var next = 8; var j = 0
            while (j < size) {
              if (next != 0) { next = (last + r.se() + 256) % 256 }
              last = if (next == 0) last else next
              j += 1
            }
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match { // pic_order_cnt_type
        case 0 => r.ue()
        case 1 =>
          r.u1(); r.se(); r.se()
          val n = r.ue(); (0 until n).foreach(_ => r.se())
        case _ =>
      }
      r.ue() // max_num_ref_frames
      r.u1() // gaps_in_frame_num_value_allowed
      val widthMbs = r.ue() + 1
      val heightUnits = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field
      r.u1() // direct_8x8_inference
      var w = widthMbs * 16
      var h = (2 - frameMbsOnly) * heightUnits * 16
      if (r.u1() == 1) { // frame_cropping_flag
        val (cl, cr, ct, cb) = (r.ue(), r.ue(), r.ue(), r.ue())
        // §7.4.2.1.1 crop units: SubWidthC/SubHeightC for 4:2:0/4:2:2
        val cw = if (chromaFormat == 1 || chromaFormat == 2) 2 else 1
        val ch0 = if (chromaFormat == 1) 2 else 1
        w -= (cl + cr) * cw
        h -= (ct + cb) * ch0 * (2 - frameMbsOnly)
      }
      var fps = 0.0
      if (r.u1() == 1) { // vui_parameters_present
        if (r.u1() == 1) { // aspect_ratio_info_present
          if (r.u(8) == 255L) r.u(32) // extended SAR w+h
        }
        if (r.u1() == 1) r.u1() // overscan
        if (r.u1() == 1) { // video_signal_type
          r.u(4) // format + full_range
          if (r.u1() == 1) r.u(24) // colour description
        }
        if (r.u1() == 1) { r.ue(); r.ue() } // chroma_sample_loc
        if (r.u1() == 1) { // timing_info_present
          val numUnits = r.u(32)
          val timeScale = r.u(32)
          if (numUnits > 0) fps = timeScale.toDouble / (2.0 * numUnits)
        }
      }
      if (w > 0 && h > 0) Some((w, h, fps)) else None
    }

    /** (width, height, durationSec) — duration from coded-slice NAL
      * count / VUI fps, -1.0 when the stream declares no timing. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      if (!AnnexB.atZero(payload)) return None
      val units = nals(payload)
      units.find(_._3 == 7).flatMap { case (s, e, _) =>
        try parseSps(unescape(payload, s, e)) catch {
          case _: ArrayIndexOutOfBoundsException => None
        }
      }.map { case (w, h, fps) =>
        val frames = units.count(u => u._3 == 1 || u._3 == 5)
        val dur = if (fps > 0 && frames > 0) frames / fps else -1.0
        (w, h, dur)
      }
    }
  }

  /** H.265/HEVC Annex-B SPS header metadata — [[H264Sps]]'s pattern
    * over the H.265 NAL layout (ITU-T H.265 §7.3.2.2, a published
    * spec): two-byte NAL headers (type = `(b >> 1) & 0x3f`, SPS = 33),
    * the profile_tier_level block skipped at its fixed bit widths,
    * `pic_width/height_in_luma_samples` with the conformance window
    * applied at the chroma-format crop units, and — parsing THROUGH
    * the scaling-list / short-term-RPS / long-term sections, each at
    * its published layout — the VUI `vui_time_scale /
    * vui_num_units_in_tick` frame rate (HEVC counts frames, not
    * H.264's field pairs, so no factor of 2). Duration multiplies
    * that by the stream's picture count: VCL NALs (types 0–21) whose
    * first slice-header bit, `first_slice_segment_in_pic_flag`, is
    * set — so multi-slice pictures count once. HEADER-only: slice
    * payloads are never entropy-decoded (CABAC frame decode stays
    * the declared stub surface).
    *
    * Recognition gate: start code at offset 0 plus an SPS NAL (type
    * 33) at nuh_layer_id 0 that parses to positive dimensions.
    * [[decodeVideo]] tries [[H264Sps]] first; the gates are disjoint
    * on real streams (an H.264 SPS byte 0x67 reads as HEVC type 51,
    * an HEVC SPS byte 0x42 as H.264 type 2 — neither passes the
    * other's SPS-type gate). */
  private object H265Sps {
    import AnnexB.{Bits, unescape}

    /** NAL spans with the 2-byte header read: (payloadStart,
      * payloadEnd, type, nuhLayerId). `payloadStart` points past the
      * header; spans shorter than the header are dropped. */
    private def nals(b: Array[Byte]): Vector[(Int, Int, Int, Int)] =
      AnnexB.units(b).collect { case (s, e) if e - s >= 2 =>
        val tpe = (b(s) >> 1) & 0x3f
        val layer = ((b(s) & 1) << 5) | ((b(s + 1) >> 3) & 0x1f)
        (s + 2, e, tpe, layer)
      }

    /** §7.3.3 profile_tier_level(1, maxSubLayersMinus1): fixed-width
      * throughout — 88 general bits + 8 level bits, then the
      * per-sub-layer presence flags, byte alignment, and flagged
      * 88/8-bit sub-layer blocks. */
    private def skipProfileTierLevel(r: Bits, maxSubLayersMinus1: Int): Unit = {
      r.u(88); r.u(8)
      if (maxSubLayersMinus1 > 0) {
        val profPresent = new Array[Boolean](maxSubLayersMinus1)
        val levelPresent = new Array[Boolean](maxSubLayersMinus1)
        for (i <- 0 until maxSubLayersMinus1) {
          profPresent(i) = r.u1() == 1
          levelPresent(i) = r.u1() == 1
        }
        for (_ <- maxSubLayersMinus1 until 8) r.u(2) // reserved_zero_2bits
        for (i <- 0 until maxSubLayersMinus1) {
          if (profPresent(i)) r.u(88)
          if (levelPresent(i)) r.u(8)
        }
      }
    }

    /** §7.3.4 scaling_list_data(): sizeId 0–3 × matrixId 0–5 (step 3
      * at sizeId 3), each either a ue reference delta or an explicit
      * coefficient run. */
    private def skipScalingListData(r: Bits): Unit =
      for (sizeId <- 0 to 3) {
        var matrixId = 0
        while (matrixId < 6) {
          if (r.u1() == 0) r.ue() // scaling_list_pred_matrix_id_delta
          else {
            val coefNum = math.min(64, 1 << (4 + (sizeId << 1)))
            if (sizeId > 1) r.se() // scaling_list_dc_coef_minus8
            for (_ <- 0 until coefNum) r.se()
          }
          matrixId += (if (sizeId == 3) 3 else 1)
        }
      }

    /** §7.3.7 st_ref_pic_set(idx): returns NumDeltaPocs[idx] — the
      * inter-predicted form needs the PREVIOUS set's count, so the
      * caller threads the array through. In an SPS, RefRpsIdx is
      * always idx-1 (delta_idx_minus1 appears only in slice
      * headers). */
    private def skipStRefPicSet(r: Bits, idx: Int,
                                numDeltaPocs: Array[Int]): Int = {
      val interPred = if (idx != 0) r.u1() == 1 else false
      if (interPred) {
        r.u1(); r.ue() // delta_rps_sign, abs_delta_rps_minus1
        var kept = 0
        for (_ <- 0 to numDeltaPocs(idx - 1)) {
          val used = r.u1() == 1
          val useDelta = if (!used) r.u1() == 1 else true
          if (used || useDelta) kept += 1
        }
        kept
      } else {
        val neg = r.ue(); val pos = r.ue()
        for (_ <- 0 until neg + pos) { r.ue(); r.u1() }
        neg + pos
      }
    }

    /** §7.3.2.2.1 parse of one unescaped SPS payload:
      * (width, height, fps — 0.0 when the VUI has no timing). */
    private def parseSps(rbsp: Array[Byte]): Option[(Int, Int, Double)] = {
      val r = new Bits(rbsp)
      r.u(4) // sps_video_parameter_set_id
      val maxSubLayersMinus1 = r.u(3).toInt
      r.u1() // sps_temporal_id_nesting_flag
      skipProfileTierLevel(r, maxSubLayersMinus1)
      r.ue() // sps_seq_parameter_set_id
      val chromaFormat = r.ue()
      if (chromaFormat == 3) r.u1() // separate_colour_plane_flag
      var w = r.ue() // pic_width_in_luma_samples
      var h = r.ue()
      if (r.u1() == 1) { // conformance_window_flag
        val (cl, cr, ct, cb) = (r.ue(), r.ue(), r.ue(), r.ue())
        // §6.2 crop units: SubWidthC 2 for 4:2:0/4:2:2, SubHeightC 2
        // for 4:2:0 only
        val cw = if (chromaFormat == 1 || chromaFormat == 2) 2 else 1
        val ch0 = if (chromaFormat == 1) 2 else 1
        w -= (cl + cr) * cw
        h -= (ct + cb) * ch0
      }
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      val log2MaxPocLsb = r.ue() + 4
      val orderingInfoPresent = r.u1()
      val from = if (orderingInfoPresent == 1) 0 else maxSubLayersMinus1
      for (_ <- from to maxSubLayersMinus1) { r.ue(); r.ue(); r.ue() }
      r.ue(); r.ue(); r.ue(); r.ue() // min/max CB + TB log2 sizes
      r.ue(); r.ue() // max_transform_hierarchy_depth inter/intra
      if (r.u1() == 1 && r.u1() == 1) // scaling list enabled + present
        skipScalingListData(r)
      r.u1(); r.u1() // amp_enabled, sample_adaptive_offset
      if (r.u1() == 1) { // pcm_enabled
        r.u(8); r.ue(); r.ue(); r.u1() // bit depths, CB sizes, filter
      }
      val numStRps = r.ue()
      if (numStRps > 64) return None // §7.4.3.2.1 bound — bad parse
      val numDeltaPocs = new Array[Int](math.max(numStRps, 1))
      for (i <- 0 until numStRps)
        numDeltaPocs(i) = skipStRefPicSet(r, i, numDeltaPocs)
      if (r.u1() == 1) { // long_term_ref_pics_present
        val n = r.ue()
        for (_ <- 0 until n) { r.u(log2MaxPocLsb); r.u1() }
      }
      r.u1(); r.u1() // temporal_mvp, strong_intra_smoothing
      var fps = 0.0
      if (r.u1() == 1) { // vui_parameters_present (E.2.1)
        if (r.u1() == 1) { // aspect_ratio_info_present
          if (r.u(8) == 255L) r.u(32) // extended SAR w+h
        }
        if (r.u1() == 1) r.u1() // overscan
        if (r.u1() == 1) { // video_signal_type
          r.u(4)
          if (r.u1() == 1) r.u(24)
        }
        if (r.u1() == 1) { r.ue(); r.ue() } // chroma_sample_loc
        r.u1(); r.u1(); r.u1() // neutral_chroma, field_seq, frame_field
        if (r.u1() == 1) { r.ue(); r.ue(); r.ue(); r.ue() } // display win
        if (r.u1() == 1) { // vui_timing_info_present
          val numUnits = r.u(32)
          val timeScale = r.u(32)
          if (numUnits > 0) fps = timeScale.toDouble / numUnits
        }
      }
      if (w > 0 && h > 0) Some((w, h, fps)) else None
    }

    /** (width, height, durationSec) — duration from the picture count
      * (VCL NALs with first_slice_segment_in_pic_flag) / VUI fps,
      * -1.0 when the stream declares no timing. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      if (!AnnexB.atZero(payload)) return None
      val units = nals(payload)
      units.find(u => u._3 == 33 && u._4 == 0).flatMap {
        case (s, e, _, _) =>
          try parseSps(unescape(payload, s, e)) catch {
            case _: ArrayIndexOutOfBoundsException => None
          }
      }.map { case (w, h, fps) =>
        val pics = units.count { case (s, _, tpe, layer) =>
          tpe <= 21 && layer == 0 && s < payload.length &&
            ((payload(s) >> 7) & 1) == 1 // first_slice_segment_in_pic
        }
        val dur = if (fps > 0 && pics > 0) pics / fps else -1.0
        (w, h, dur)
      }
    }
  }

  /** Matroska/WebM header metadata (r8) — an EBML walk over the
    * public bit layout (RFC 8794 variable-length framing; element
    * ids from the Matroska registry, which WebM subsets):
    * `Segment → Info` carries TimecodeScale (ns per tick, default
    * 1,000,000) and a float Duration in ticks — seconds =
    * duration · scale / 10⁹; `Segment → Tracks → TrackEntry → Video`
    * carries PixelWidth/PixelHeight. The same three gotchas every
    * real muxer output exercises are handled: element ids keep their
    * length-marker bits (compared as tagged values, 1–4 bytes) while
    * sizes strip them (1–8 bytes); an all-ones size VINT means
    * UNKNOWN (streamed/live Segments — the element then runs to its
    * parent's end and is necessarily last); and a size pointing past
    * the parent is corruption, which stops the walk rather than
    * reading past the buffer. The byte gate (the EBML header id
    * 0x1A45DFA3) is disjoint from every other video gate (`ftyp`,
    * `RIFF`, Annex-B start codes), so decoder order is immaterial. */
  private object EbmlHeader {
    private val SegmentId = 0x18538067L
    private val InfoId = 0x1549A966L
    private val TimecodeScaleId = 0x2AD7B1L
    private val DurationId = 0x4489L
    private val TracksId = 0x1654AE6BL
    private val TrackEntryId = 0xAEL
    private val VideoId = 0xE0L
    private val PixelWidthId = 0xB0L
    private val PixelHeightId = 0xBAL
    private val Unknown = -1L

    private final case class El(id: Long, dataStart: Int, dataEnd: Int)

    /** Element id at `o`: (tagged value incl. marker bits, length). */
    private def readId(b: Array[Byte], o: Int): Option[(Long, Int)] = {
      if (o >= b.length) return None
      val first = b(o) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23
      if (len > 4 || o + len > b.length) return None
      var v = first.toLong
      var i = 1
      while (i < len) { v = v << 8 | (b(o + i) & 0xff); i += 1 }
      Some((v, len))
    }

    /** Size VINT at `o`: (size, length), [[Unknown]] when all value
      * bits are set. */
    private def readSize(b: Array[Byte], o: Int): Option[(Long, Int)] = {
      if (o >= b.length) return None
      val first = b(o) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23
      if (o + len > b.length) return None
      var v = (first & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = v << 8 | (b(o + i) & 0xff); i += 1 }
      Some((if (v == (1L << (7 * len)) - 1) Unknown else v, len))
    }

    /** Child elements of the span [from, limit) in order; a
      * malformed or over-running element ends the walk (truncation
      * tolerance, as [[AviFrames]]). */
    private def children(b: Array[Byte], from: Int, limit: Int)
        : Vector[El] = {
      val out = Vector.newBuilder[El]
      var o = from
      var stop = false
      while (!stop && o < limit) {
        val parsed = for {
          (id, il) <- readId(b, o)
          (sz, sl) <- readSize(b, o + il)
        } yield (id, sz, o + il + sl)
        parsed match {
          case Some((id, Unknown, ds)) =>
            out += El(id, ds, limit); stop = true
          case Some((id, sz, ds)) if ds.toLong + sz <= limit =>
            out += El(id, ds, (ds + sz).toInt); o = (ds + sz).toInt
          case _ => stop = true
        }
      }
      out.result()
    }

    private def uint(b: Array[Byte], e: El): Long = {
      var v = 0L
      var i = e.dataStart
      while (i < e.dataEnd && i - e.dataStart < 8) {
        v = v << 8 | (b(i) & 0xff); i += 1
      }
      v
    }

    private def float(b: Array[Byte], e: El): Option[Double] = {
      def be(n: Int): Long = {
        var v = 0L
        (0 until n).foreach(i => v = v << 8 | (b(e.dataStart + i) & 0xffL))
        v
      }
      e.dataEnd - e.dataStart match {
        case 4 => Some(java.lang.Float.intBitsToFloat(be(4).toInt).toDouble)
        case 8 => Some(java.lang.Double.longBitsToDouble(be(8)))
        case _ => None
      }
    }

    /** (width, height, durationSec); duration −1 when the Segment
      * declares none; None when the payload isn't EBML or carries no
      * video track. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      if (payload == null || payload.length < 8) return None
      if ((payload(0) & 0xff) != 0x1A || (payload(1) & 0xff) != 0x45 ||
          (payload(2) & 0xff) != 0xDF || (payload(3) & 0xff) != 0xA3)
        return None
      val top = children(payload, 0, payload.length)
      top.find(_.id == SegmentId).flatMap { seg =>
        val segKids = children(payload, seg.dataStart, seg.dataEnd)
        var scale = 1000000L
        var durTicks: Option[Double] = None
        segKids.find(_.id == InfoId).foreach { info =>
          val kids = children(payload, info.dataStart, info.dataEnd)
          kids.find(_.id == TimecodeScaleId)
            .foreach(e => scale = uint(payload, e))
          durTicks = kids.find(_.id == DurationId)
            .flatMap(e => float(payload, e))
        }
        segKids.find(_.id == TracksId).toVector
          .flatMap(t => children(payload, t.dataStart, t.dataEnd))
          .filter(_.id == TrackEntryId)
          .flatMap(te => children(payload, te.dataStart, te.dataEnd)
            .find(_.id == VideoId))
          .headOption
          .map { v =>
            val vk = children(payload, v.dataStart, v.dataEnd)
            val w = vk.find(_.id == PixelWidthId)
              .map(uint(payload, _)).getOrElse(0L).toInt
            val h = vk.find(_.id == PixelHeightId)
              .map(uint(payload, _)).getOrElse(0L).toInt
            val dur = durTicks.filter(_ => scale > 0)
              .map(_ * scale / 1e9).getOrElse(-1.0)
            (w, h, dur)
          }
      }
    }
  }

  /** Decode video payloads partition-wise through the real
    * [[VideoHeaderDecoder]] (ISO-BMFF), falling back to the RIFF/AVI
    * `avih` main header (r7, [[AviFrames.header]] — the container
    * [[extractFrameFeatures]] decodes frames from), then to the
    * [[H264Sps]] Annex-B SPS walk (r8, decoder "h264sps") and the
    * [[H265Sps]] HEVC walk (r8, decoder "h265sps") for raw
    * elementary streams, then to the [[EbmlHeader]] Matroska/WebM
    * walk (r8, decoder "ebml"); unrecognized payloads report ok = false
    * with zeroed fields (decoder "none") rather than faking numbers
    * — video, like audio, is a typed path, not a stub. */
  def decodeVideo(payloads: DataFrame)
                 (implicit spark: SparkSession): Dataset[VideoMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new VideoHeaderDecoder // per-partition init
        it.map { case (id, payload) =>
          val n = if (payload == null) 0 else payload.length
          dec.decode(payload) match {
            case Some((w, h, dur)) =>
              VideoMeta(id, n, w, h, dur, ok = true, decoder = "isobmff")
            case None => AviFrames.header(payload)
              .map(r => (r, "riff-avi"))
              .orElse(H264Sps.decode(payload).map(r => (r, "h264sps")))
              .orElse(H265Sps.decode(payload).map(r => (r, "h265sps")))
              .orElse(EbmlHeader.decode(payload).map(r => (r, "ebml"))) match {
              case Some(((w, h, dur), d)) =>
                VideoMeta(id, n, w, h, dur, ok = true, decoder = d)
              case None =>
                VideoMeta(id, n, 0, 0, -1.0, ok = false, decoder = "none")
            }
          }
        }
      }
  }

  // ======================================================================
  // STUB DECODER — deterministic fake for payloads no real header
  // parser recognizes (all three kinds have real header parsers:
  // imageio, javax.sound, ISO-BMFF; image PIXEL decode is real —
  // PixelDecoder — as are PCM audio samples — SampleDecoder — and
  // MJPEG-AVI video frames — AviFrames + extractFrameFeatures; MP3
  // frame-HEADER metadata is parsed by Mp3Frames. The remaining stub
  // surface is SAMPLE/FRAME decode of compressed codecs only —
  // MP3/AAC audio samples, H.264-class video frames — where no JDK
  // decoder exists). A real sample
  // pipeline binds a native library here (one init per partition,
  // reused across records). The fake derives "dimensions" from
  // payload bytes so tests are reproducible without codecs.
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
    * real [[ImageHeaderDecoder]] and video payloads through the real
    * [[VideoHeaderDecoder]]; payloads the real parsers can't recognize
    * (and the audio kind, which has its own typed [[decodeAudio]]
    * path) take the stub. Decoders are constructed once per partition
    * (models expensive codec init), the iterator is consumed lazily
    * (no partition-sized buffering), and output is a typed Dataset so
    * downstream stages stay columnar.
    */
  def decode(payloads: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("media_kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val img = new ImageHeaderDecoder // per-partition init
        val vid = new VideoHeaderDecoder
        val stub = new StubDecoder
        it.map { case (id, kind, payload) =>
          val n = if (payload == null) 0 else payload.length
          val real: Option[(Int, Int, Int, String)] = kind match {
            case "image" =>
              img.decode(payload).map { case (w, h, ch) => (w, h, ch, "imageio") }
            case "video" =>
              vid.decode(payload).map { case (w, h, _) => (w, h, 0, "isobmff") }
            case _ => None
          }
          real match {
            case Some((w, h, ch, dec)) =>
              MediaMeta(id, kind, n, w, h, ch, ok = true, decoder = dec)
            case None =>
              val (w, h, ok) = stub.decode(payload)
              MediaMeta(id, kind, n, w, h, 0, ok, decoder = "stub")
          }
        }
      }
  }

  /** `source` says what the embedding was computed FROM: "pixels"
    * (real decoded image raster), "samples" (real decoded PCM audio
    * samples, r7), or "bytes" (raw-payload fallback). */
  final case class MediaFeature(doc_id: Long, embedding: Array[Float],
                                source: String)

  /** Per-slot centered byte sums of a payload: `sums(j) = Σ (b_i − 128)`
    * over bytes at positions `i ≡ j (mod dim)`. Pure Long arithmetic —
    * exact, order-free, and engine-portable (a SQL engine that can
    * enumerate byte values replays it bit-for-bit). This IS the
    * byte-fold fallback of [[extractFeatures]] before normalization:
    * the embedding equals `(sums(j)/128.0) / ‖·‖₂` rounded once to
    * float32 at the end. */
  private def foldBytes(payload: Array[Byte], dim: Int): Array[Long] = {
    val sums = new Array[Long](dim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        sums(i % dim) += (payload(i) & 0xff) - 128; i += 1
      }
    }
    sums
  }

  /** One byte-fold row: the integer-exact pre-normalization state of
    * the [[extractFeatures]] fallback path, one row per (doc, slot). */
  final case class ByteFold(doc_id: Long, slot: Int, fold_sum: Long,
                            n_bytes: Int)

  /** The byte-fold fallback's integer core as a first-class query
    * surface: per-(doc, slot) centered byte sums, all `dim` slots
    * emitted (zero-filled past payload end) so the output shape is
    * independent of payload length. Because every value is a Long,
    * the result is ORACLE-REPLAYABLE — a SQL engine enumerating byte
    * positions reproduces it hash-exactly, which ties the fallback
    * embedding path (spec: embedding == normalized fold sums,
    * bit-for-bit) to a driver-verifiable integer query. */
  def byteFoldSums(payloads: DataFrame, dim: Int = 64)
                  (implicit spark: SparkSession): Dataset[ByteFold] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val sums = foldBytes(payload, dim)
        val n = if (payload == null) 0 else payload.length
        Iterator.tabulate(dim)(j => ByteFold(id, j, sums(j), n))
      }
  }

  /** Full PCM sample decode over pure-JDK `javax.sound.sampled` (r7) —
    * the audio analog of [[PixelDecoder]]: `AudioSystem.
    * getAudioInputStream` parses the container (WAV/AIFF/AU) and
    * yields the raw sample stream, which is canonicalized to SIGNED
    * 16-BIT values independent of how the container stored them —
    * WAV PCM is little-endian and its 8-bit form unsigned, AIFF is
    * big-endian signed; after canonicalization the same recording
    * embeds identically from either container, the exact
    * container-invariance property the pixel path has for PNG/BMP.
    * Only PCM encodings (8/16-bit) decode; compressed codecs (MP3,
    * AAC, Vorbis — no JDK codec) still fall through to the byte-fold
    * stub. With [[extractFrameFeatures]]'s MJPEG-AVI frame decode,
    * compressed codecs are the ONLY remaining stub surface. One
    * instance per partition (codec-init seam). */
  private final class SampleDecoder {
    /** Fold canonical 16-bit samples into per-slot Long sums
      * (round-robin over `dim`, channel-interleaved order as stored).
      * Returns None when the payload is not a decodable 8/16-bit PCM
      * container — the caller falls back. Exact integer accumulation,
      * same argument as [[foldBytes]]. */
    def foldSamples(payload: Array[Byte], dim: Int): Option[Array[Long]] = {
      if (payload == null || payload.length < 12) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val enc = f.getEncoding
          val pcmSigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val pcmUnsigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = f.getSampleSizeInBits
          if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16))
            return None
          val bytes = ais.readAllBytes()
          val sums = new Array[Long](dim)
          var n = 0
          if (bits == 8) {
            // canonical: signed 16-bit, so 8-bit widens by << 8
            var i = 0
            while (i < bytes.length) {
              val v =
                if (pcmUnsigned) ((bytes(i) & 0xff) - 128) << 8
                else bytes(i).toInt << 8
              sums(n % dim) += v; n += 1; i += 1
            }
          } else {
            val be = f.isBigEndian
            var i = 0
            while (i + 1 < bytes.length) {
              val raw =
                if (be) ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
                else ((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)
              val v =
                if (pcmUnsigned) (raw & 0xffff) - 32768
                else raw.toShort.toInt
              sums(n % dim) += v; n += 1; i += 2
            }
          }
          if (n == 0) None else Some(sums)
        } finally ais.close()
      } catch {
        // UnsupportedAudioFileException / truncated stream → not audio
        case _: Exception => None
      }
    }
  }

  /** Full-pixel image decode over pure-JDK `ImageIO.read` — the same
    * no-external-codec argument as [[ImageHeaderDecoder]], but now the
    * pixel data itself (PNG/GIF/BMP/JPEG/WBMP in any stock JDK). One
    * instance per partition, global disk cache off (executor tasks
    * must not contend on temp files). */
  private final class PixelDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.length < 4) None
      else
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        catch { case _: Exception => None } // corrupt body after a valid header
  }

  /** Feature extraction: payload → fixed-`dim` L2-normalized float
    * vector, same `Array[Float]` shape as the embeddings table so the
    * output feeds the `Similarity` ANN operators directly.
    *
    * Image payloads are REALLY decoded ([[PixelDecoder]],
    * `ImageIO.read`) and embedded from their sRGB pixel values
    * (`getRGB` folds every pixel's R,G,B through the color model), so
    * the embedding depends on what the image SHOWS, not how it is
    * encoded — a PNG and a BMP of the same raster embed identically,
    * which is the property a near-dup/similarity pipeline needs and a
    * byte-fold cannot give. PCM audio payloads are REALLY decoded too
    * (r7, [[SampleDecoder]]): WAV/AIFF/AU sample streams canonicalize
    * to signed 16-bit values, so the same recording embeds identically
    * from either container. Payloads neither path decodes take the
    * byte-fold fallback (a stand-in for a learned encoder; compressed
    * audio codecs / video frames have no JDK codec). `source` records
    * the path per row: "pixels" / "samples" / "bytes".
    *
    * Accumulation is Long-exact (centered values summed as integers,
    * one float32 rounding at the very end), so the result is
    * independent of accumulation order — a float32 running sum would
    * start rounding once a slot's partial sum passes 2^17 (≈ a
    * 4-megapixel image at dim 64), and its value would then depend on
    * byte order. The fallback path therefore equals the normalized
    * [[byteFoldSums]] exactly (spec-pinned), which is what lets the
    * integer core be oracle-verified while the embedding stays
    * rows-only. */
  def extractFeatures(payloads: DataFrame, dim: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val pix = new PixelDecoder // per-partition init
        val snd = new SampleDecoder
        it.map { case (id, payload) =>
          val (sums, source) = pix.decode(payload) match {
            case Some(img) => (pixelSums(img, dim), "pixels")
            case None => snd.foldSamples(payload, dim) match {
              case Some(s) => (s, "samples")
              case None => (foldBytes(payload, dim), "bytes")
            }
          }
          MediaFeature(id, normalizedEmbedding(sums, dim), source)
        }
      }
  }

  /** sRGB pixel fold shared by whole-image and per-frame embedding:
    * every pixel's R,G,B centered and summed into `dim` Long slots in
    * raster order — exact integer accumulation, see
    * [[extractFeatures]]'s ordering note. */
  private def pixelSums(img: java.awt.image.BufferedImage,
                        dim: Int): Array[Long] = {
    val s = new Array[Long](dim)
    var n = 0
    def add(v: Int): Unit = { s(n % dim) += v - 128; n += 1 }
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y) // sRGB, format-independent
        add((rgb >> 16) & 0xff); add((rgb >> 8) & 0xff)
        add(rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Long sums → L2-normalized float32 vector: one exact 2^-7 scale,
    * one double norm, one float rounding at the very end. */
  private def normalizedEmbedding(sums: Array[Long],
                                  dim: Int): Array[Float] = {
    val acc = sums.map(_ / 128.0) // exact: Long scaled by 2^-7
    val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x * x))
    if (norm > 0) acc.map(x => (x / norm).toFloat)
    else new Array[Float](dim)
  }

  final case class FrameFeature(doc_id: Long, frame_idx: Int,
                                embedding: Array[Float], source: String)

  /** RIFF/AVI container walk (r7) — the one video format a stock JDK
    * can fully decode: the container is a plain chunk grammar (no
    * codec involved), and MJPEG frame chunks are ordinary JFIF JPEGs
    * `ImageIO.read` handles. Frames are the `##dc`/`##db` chunks of
    * the `movi` LIST (including those nested in `rec ` LISTs). All
    * sizes little-endian, chunks padded to even offsets — per the
    * public AVI RIFF spec. */
  private object AviFrames {
    private def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
        (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
    private def fcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))

    private def collect(b: Array[Byte], from: Int, limit: Int,
                        out: scala.collection.mutable.ArrayBuffer[Array[Byte]])
        : Unit = {
      var o = from
      while (o + 8 <= limit) {
        val id = fcc(b, o)
        val size = u32le(b, o + 4)
        val dataEnd = o + 8 + size
        if (size < 0 || dataEnd > limit) return // truncated/corrupt: stop
        if (id == "LIST" && size >= 4) {
          val lt = fcc(b, o + 8)
          if (lt == "movi" || lt == "rec ")
            collect(b, o + 12, dataEnd.toInt, out)
        } else if (isFrameId(id) && size > 0) {
          out += java.util.Arrays.copyOfRange(b, o + 8, dataEnd.toInt)
        }
        o = (dataEnd + (size & 1L)).toInt // chunks align to even offsets
      }
    }

    /** The frame chunks of an AVI payload, container order; None when
      * the payload isn't RIFF/AVI or carries no frames. */
    def frames(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
      if (payload == null || payload.length < 12) return None
      if (fcc(payload, 0) != "RIFF" || fcc(payload, 8) != "AVI ") return None
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val end = math.min(payload.length.toLong, 8L + u32le(payload, 4)).toInt
      collect(payload, 12, end, out)
      if (out.isEmpty) None else Some(out.toVector)
    }

    /** (width, height, durationSec) from the `avih` main header
      * (r7): dwMicroSecPerFrame@0, dwTotalFrames@16, dwWidth@32,
      * dwHeight@36 — per the public AVI RIFF spec; duration −1 when
      * frame timing is absent. None when the payload isn't RIFF/AVI
      * or carries no hdrl/avih. */
    def header(payload: Array[Byte]): Option[(Int, Int, Double)] = {
      if (payload == null || payload.length < 12) return None
      if (fcc(payload, 0) != "RIFF" || fcc(payload, 8) != "AVI ") return None
      val end = math.min(payload.length.toLong, 8L + u32le(payload, 4)).toInt
      var o = 12
      while (o + 8 <= end) {
        val id = fcc(payload, o)
        val size = u32le(payload, o + 4)
        val dataEnd = o + 8 + size
        if (dataEnd > end) return None
        if (id == "LIST" && size >= 4 && fcc(payload, o + 8) == "hdrl") {
          var p = o + 12
          while (p + 8 <= dataEnd) {
            val cid = fcc(payload, p)
            val csz = u32le(payload, p + 4)
            val cEnd = p + 8 + csz
            if (cEnd > dataEnd) return None
            if (cid == "avih" && csz >= 40) {
              val usPerFrame = u32le(payload, p + 8)
              val totalFrames = u32le(payload, p + 8 + 16)
              val w = u32le(payload, p + 8 + 32).toInt
              val h = u32le(payload, p + 8 + 36).toInt
              val dur = if (usPerFrame > 0) totalFrames * usPerFrame / 1e6
                        else -1.0
              return Some((w, h, dur))
            }
            p = (cEnd + (csz & 1L)).toInt
          }
          return None
        }
        o = (dataEnd + (size & 1L)).toInt
      }
      None
    }
  }

  /** REAL per-frame feature extraction for MJPEG-in-AVI payloads —
    * one row per sampled frame (every `stride`-th, container order),
    * embedded from DECODED sRGB pixels exactly as [[extractFeatures]]
    * embeds whole images (same fold, same Long-exact accumulation:
    * spec-pinned — frame k of an AVI embeds identically to the same
    * JPEG passed as an image payload). Frames ImageIO cannot decode
    * (a non-MJPEG codec inside a valid container) take the byte-fold
    * fallback with `source = "bytes"`; payloads that are not AVI at
    * all yield NO rows — a frame extractor has nothing to say about
    * them. With this, audio (PCM) and video (MJPEG) each have a real
    * sample/frame decode path, and the declared stub surface shrinks
    * to compressed codecs only (no JDK decoder exists — the honest
    * boundary since r2). Justified `mapPartitions`, as
    * [[extractFeatures]]: codec work is not Catalyst-expressible. */
  def extractFrameFeatures(payloads: DataFrame, dim: Int = 64,
                           stride: Int = 1)
                          (implicit spark: SparkSession)
      : Dataset[FrameFeature] = {
    require(stride >= 1, "stride must be positive")
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val pix = new PixelDecoder // per-partition init
        it.flatMap { case (id, payload) =>
          AviFrames.frames(payload) match {
            case None => Iterator.empty
            case Some(fs) =>
              fs.iterator.zipWithIndex
                .filter { case (_, i) => i % stride == 0 }
                .map { case (bytes, i) =>
                  val (sums, source) = pix.decode(bytes) match {
                    case Some(img) => (pixelSums(img, dim), "pixels")
                    case None => (foldBytes(bytes, dim), "bytes")
                  }
                  FrameFeature(id, i, normalizedEmbedding(sums, dim),
                    source)
                }
          }
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
