package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** ONE metadata filter over a MIXED media corpus — the shape a
  * 100 TB ingest actually has: a binary column holding AVI, animated
  * GIF, ISO-BMFF/MP4, AVIF/HEIF still images, Matroska/WebM, WAV,
  * AIFF, FLAC, MP3, and Ogg payloads side by side. [[mediaMetaScan]] dispatches each row by its magic
  * bytes into the matching container walk (all header-only except the
  * MP3 4-bytes-per-frame sync hop, all honest) and projects the
  * COMMON fields a corpus filter queries — container, duration,
  * dimensions, codec ids, audio rate — so "every video longer than a
  * minute, at least 720p, with a soundtrack" or "all audio above
  * 16 kHz" is one predicate over one scan, whatever the containers.
  * Each payload is read by exactly one walker
  * ([[Video.videoSigsAuto]]'s single-scan contract); unknown
  * containers are `parsed = false`, never guessed.
  */
object Media {

  /** The cross-container metadata row. `container` is `avi` / `gif` /
    * `mp4` / `avif` / `heic` / `webm` / `matroska` / `wav` / `flac` /
    * `mp3` / `ogg`;
    * `videoCodec` is the container's own codec identifier (AVI
    * fourcc — `DIB ` for uncompressed, GIF's LZW, the MP4
    * sample-entry fourcc, the Matroska codec id); `audioCodec`
    * likewise (`wave_<tag>` for WAVEFORMATEX tags, `flac`, `mp3`,
    * Ogg's `vorbis`/`opus`). Absent tracks leave empty codecs and
    * zeroed fields.
    */
  case class MediaMeta(id: Long, container: String, durationMs: Long,
      width: Int, height: Int, videoCodec: String, audioCodec: String,
      audioRate: Int, parsed: Boolean)

  def parseMediaHeader(df: DataFrame, idCol: String,
      binCol: String): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val id = r.getLong(0)
          mediaMeta(r.getAs[Array[Byte]](1)) match {
            case Some(m) => m.copy(id = id)
            case None => MediaMeta(id, "", 0L, 0, 0, "", "", 0,
              parsed = false)
          }
        }
    }
  }

  /** Metadata projection — id + the [[MediaMeta]] fields as columns. */
  def mediaMetaScan(df: DataFrame, idCol: String,
      binCol: String): DataFrame =
    parseMediaHeader(df, idCol, binCol).toDF().select(col("id"),
      col("container"),
      col("durationMs").as("duration_ms"),
      col("width"), col("height"),
      col("videoCodec").as("video_codec"),
      col("audioCodec").as("audio_codec"),
      col("audioRate").as("audio_rate"),
      col("parsed"))

  /** [[mediaMetaScan]] over only the first `prefixBytes` of each
    * payload — the 100 TB form of the mixed filter: persist
    * `substring(bin, 1, prefixBytes)` plus the TRUE payload length as
    * narrow columns at ingest and the filter never touches the media
    * data. Families whose metadata leads the file parse from the
    * prefix (AVI, MP4 faststart, AVIF/HEIF — the meta box
    * leads the file, WebM/Matroska, WAV, FLAC — STREAMINFO is ≤ 42
    * bytes); families whose grammar NEEDS the tail
    * (GIF's full block walk, MP3's to-EOF sync walk, Ogg's last-page
    * granule) are honestly `parsed = false` here — never fabricated
    * fields. Route those to their full scans, or accept the refusal
    * as the filter's answer.
    */
  def mediaMetaScanPrefix(df: DataFrame, idCol: String, binCol: String,
      prefixBytes: Int = 64 * 1024): DataFrame = {
    require(prefixBytes >= 44,
      s"prefixBytes must cover the smallest header, got $prefixBytes")
    implicit val enc = Encoders.product[MediaMeta]
    df.select(col(idCol).cast("long"),
      substring(col(binCol), 1, prefixBytes).as("__media_prefix"),
      length(col(binCol)).cast("long").as("__media_len"))
      .mapPartitions { (rows: Iterator[Row]) =>
        rows.map { r =>
          val id = r.getLong(0)
          mediaMetaPrefix(r.getAs[Array[Byte]](1), r.getLong(2)) match {
            case Some(m) => m.copy(id = id)
            case None => MediaMeta(id, "", 0L, 0, 0, "", "", 0,
              parsed = false)
          }
        }
      }.toDF().select(col("id"), col("container"),
        col("durationMs").as("duration_ms"),
        col("width"), col("height"),
        col("videoCodec").as("video_codec"),
        col("audioCodec").as("audio_codec"),
        col("audioRate").as("audio_rate"),
        col("parsed"))
  }

  /** The MP4 arm's field mapping — shared by the column dispatch and
    * the path-level census's seek route so the two cannot drift.
    */
  private[graft] def mp4ToMedia(m: Mp4.ParsedMp4): MediaMeta =
    MediaMeta(0L, "mp4", m.duration * 1000L / m.timescale,
      m.width, m.height, m.videoCodec, m.audioCodec, m.audioRate,
      parsed = true)

  /** The ADTS arm's field mapping — shared by the column dispatch
    * and the path-level census's stream route.
    */
  private[graft] def adtsToMedia(a: MpegTs.AdtsInfo): MediaMeta =
    MediaMeta(0L, "adts", a.durationMs, 0, 0, "", "aac",
      a.sampleRate, parsed = true)

  /** The MP3 arm's field mapping — shared by the column dispatch
    * and the path-level census's stream route.
    */
  private[graft] def mp3ToMedia(m: Mp3.Mp3Meta): MediaMeta =
    MediaMeta(0L, "mp3", m.durationMs, 0, 0, "", "mp3",
      m.sampleRate, parsed = true)

  /** The GIF arm's field mapping — shared by the column dispatch and
    * the path-level census's stream route.
    */
  private[graft] def gifToMedia(width: Int, height: Int,
      totalDelayCs: Long): MediaMeta =
    MediaMeta(0L, "gif", totalDelayCs * 10L, width, height, "lzw", "",
      0, parsed = true)

  /** The Ogg arm's field mapping — shared by the column dispatch and
    * the path-level census's stream route. Opus granules tick the
    * 48 kHz clock whatever the input rate (RFC 7845 §4); Vorbis
    * granules tick the stream's own rate.
    */
  private[graft] def oggToMedia(codec: String, channels: Int,
      rate: Int, granule: Long): MediaMeta = {
    val clock = if (codec == "opus") 48000 else rate
    MediaMeta(0L, "ogg", granule * 1000L / clock, 0, 0, "", codec,
      rate, parsed = true)
  }

  /** The MPEG-TS arm's field mapping — shared by the column dispatch
    * and the path-level census's stream route.
    */
  private[graft] def tsToMedia(t: MpegTs.TsInfo): MediaMeta = {
    val vc = if (t.videoPid >= 0) MpegTs.tsVideoCodecName(
      t.videoStreamType) else ""
    val ac = if (t.audioPid >= 0) MpegTs.tsAudioCodecName(
      t.audioStreamType) else ""
    MediaMeta(0L, "mpegts", t.durationMs, t.width, t.height, vc,
      ac, t.audioRate, parsed = true)
  }

  /** Path-level routing: which is the CHEAPEST HONEST walk for an
    * on-disk file whose leading bytes are `b` (a sniff of at least
    * 189 bytes when the file has them) and whose true length is
    * `fileLen`? Magic checks and their order mirror [[mediaMeta]]'s
    * column dispatch exactly:
    *  - `"prefix"`: metadata leads the file (AVI, WAV, AIFF, FLAC,
    *    AVIF/HEIF, WebM/Matroska) — one bounded header read answers.
    *  - `"seek"`: indexed grammar (ISO-BMFF — moov may trail) — hop
    *    box headers, fetch only the metadata subtree.
    *  - `"stream"`: chained grammars (MPEG-TS packets, ADTS and MP3
    *    frame hops, Ogg's page hop with every CRC still verified,
    *    GIF's block hop) — the forward walk IS the honest streamed
    *    form, O(packet/frame-header/page/sub-block) residency.
    *  - `""`: unknown container (the census row refuses).
    *
    * Every known family now has a bounded-residency walk — no route
    * ever buffers a whole file.
    */
  private[graft] def routeOf(b: Array[Byte], fileLen: Long): String = {
    if (b == null || b.length < 12 || fileLen < 12) return ""
    def is(o: Int, s: String): Boolean =
      s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    if (is(0, "RIFF") && is(8, "WAVE")) "prefix"
    else if (is(0, "fLaC")) "prefix"
    else if (is(0, "OggS")) "stream" // page hop, one page resident
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xF0) == 0xF0 &&
      (b(1) & 0x06) == 0) "stream" // ADTS (layer 00): O(1) frame hop
    else if (is(0, "ID3") || ((b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xE0) == 0xE0)) "stream" // MP3: O(1) frame hop
    else if (is(0, "RIFF") && is(8, "AVI ")) "prefix"
    else if (is(0, "FORM") && is(8, "AIFF")) "prefix"
    else if (is(0, "GIF8")) "stream" // block hop, one sub-block resident
    else if (Avif.isImageBrand(b)) "prefix"
    else if (is(4, "ftyp")) "seek"
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) "prefix"
    else if ((b(0) & 0xFF) == 0x47 && fileLen % 188 == 0 &&
      fileLen >= 376 && b.length > 188 && (b(188) & 0xFF) == 0x47)
      "stream"
    else ""
  }

  /** The prefix-honest dispatch: walks that are prefix-boundable run
    * with the true length; the rest refuse.
    */
  private[graft] def mediaMetaPrefix(b: Array[Byte],
      trueLen: Long): Option[MediaMeta] = {
    if (b == null || b.length < 12) return None
    def is(o: Int, s: String): Boolean =
      s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    if (is(0, "RIFF") && is(8, "WAVE"))
      Audio.parseWav(b, trueLen).map { m =>
        MediaMeta(0L, "wav", m.durationMs, 0, 0, "",
          "wave_" + m.format, m.sampleRate, parsed = true)
      }
    else if (is(0, "fLaC")) // STREAMINFO sits in the first 42 bytes
      Audio.parseFlacInfo(b).map { case (sr, ch, bits, n) =>
        MediaMeta(0L, "flac", n * 1000L / sr, 0, 0, "", "flac", sr,
          parsed = true)
      }
    else if (is(0, "RIFF") && is(8, "AVI "))
      Video.parseAvi(b, trueLen).map { m =>
        val vc =
          if (m.compression == 0L) "DIB "
          else new String(Array(
            (m.compression & 0xFF).toByte,
            ((m.compression >> 8) & 0xFF).toByte,
            ((m.compression >> 16) & 0xFF).toByte,
            ((m.compression >> 24) & 0xFF).toByte), "US-ASCII")
        val ac =
          if (m.audioStream >= 0) "wave_" + m.audFormat else ""
        MediaMeta(0L, "avi", m.totalFrames * m.microsPerFrame / 1000L,
          m.width, m.height, vc, ac, m.audRate, parsed = true)
      }
    else if (is(0, "FORM") && is(8, "AIFF"))
      Audio.parseAiff(b, trueLen).map { m =>
        MediaMeta(0L, "aiff", m.durationMs, 0, 0, "", "aiff_pcm",
          m.sampleRate, parsed = true)
      }
    else if (Avif.isImageBrand(b)) // the meta box leads the file
      Avif.parseAvif(b, trueLen).map { a =>
        MediaMeta(0L, if (a.brand == "heix") "heic" else a.brand, 0L,
          a.dispWidth.toInt, a.dispHeight.toInt, a.codec, "", 0,
          parsed = true)
      }
    else if (is(4, "ftyp"))
      Mp4.parseMp4(b, trueLen).map { m =>
        MediaMeta(0L, "mp4", m.duration * 1000L / m.timescale,
          m.width, m.height, m.videoCodec, m.audioCodec, m.audioRate,
          parsed = true)
      }
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)
      Webm.parseWebm(b, trueLen).map { w =>
        MediaMeta(0L, w.docType, math.max(w.durationMs, -1L), w.width,
          w.height, w.videoCodec, w.audioCodec, w.audioRate,
          parsed = true)
      }
    else None // GIF/MP3/Ogg grammars need the tail: refuse honestly
  }

  /** Per-payload magic dispatch into the ten container walks. */
  private[graft] def mediaMeta(b: Array[Byte]): Option[MediaMeta] = {
    if (b == null || b.length < 12) return None
    def is(o: Int, s: String): Boolean =
      s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    if (is(0, "RIFF") && is(8, "WAVE"))
      Audio.parseWav(b).map { m =>
        MediaMeta(0L, "wav", m.durationMs, 0, 0, "",
          "wave_" + m.format, m.sampleRate, parsed = true)
      }
    else if (is(0, "fLaC"))
      Audio.parseFlacInfo(b).map { case (sr, ch, bits, n) =>
        MediaMeta(0L, "flac", n * 1000L / sr, 0, 0, "", "flac", sr,
          parsed = true)
      }
    else if (is(0, "OggS"))
      Audio.parseOgg(b).map { case (codec, ch, rate, granule) =>
        oggToMedia(codec, ch, rate, granule)
      }
    // ADTS before MP3: both sync on 0xFF Fx, but ADTS's layer bits
    // are 00 — a value no MPEG-audio frame carries
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xF0) == 0xF0 &&
      (b(1) & 0x06) == 0)
      MpegTs.parseAdts(b).map(adtsToMedia)
    else if (is(0, "ID3") || ((b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xE0) == 0xE0))
      Mp3.parseMp3(b).map(mp3ToMedia)
    else if (is(0, "RIFF") && is(8, "AVI "))
      Video.parseAvi(b).map { m =>
        val vc =
          if (m.compression == 0L) "DIB "
          else new String(Array(
            (m.compression & 0xFF).toByte,
            ((m.compression >> 8) & 0xFF).toByte,
            ((m.compression >> 16) & 0xFF).toByte,
            ((m.compression >> 24) & 0xFF).toByte), "US-ASCII")
        val ac =
          if (m.audioStream >= 0) "wave_" + m.audFormat else ""
        MediaMeta(0L, "avi", m.totalFrames * m.microsPerFrame / 1000L,
          m.width, m.height, vc, ac, m.audRate, parsed = true)
      }
    else if (is(0, "FORM") && is(8, "AIFF"))
      Audio.parseAiff(b).map { m =>
        MediaMeta(0L, "aiff", m.durationMs, 0, 0, "", "aiff_pcm",
          m.sampleRate, parsed = true)
      }
    else if (is(0, "GIF8"))
      Gif.parseGif(b).map(g =>
        gifToMedia(g.width, g.height, g.totalDelayCs))
    else if (Avif.isImageBrand(b))
      Avif.parseAvif(b).map { a =>
        MediaMeta(0L, if (a.brand == "heix") "heic" else a.brand, 0L,
          a.dispWidth.toInt, a.dispHeight.toInt, a.codec, "", 0,
          parsed = true)
      }
    else if (is(4, "ftyp"))
      Mp4.parseMp4(b).map(mp4ToMedia)
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)
      Webm.parseWebm(b).map { w =>
        MediaMeta(0L, w.docType, math.max(w.durationMs, -1L), w.width,
          w.height, w.videoCodec, w.audioCodec, w.audioRate,
          parsed = true)
      }
    // MPEG-TS: 0x47 sync repeating on EVERY 188-byte boundary — one
    // sync byte alone is no signature (it is ASCII 'G')
    else if ((b(0) & 0xFF) == 0x47 && b.length % 188 == 0 &&
      b.length >= 376 && (b(188) & 0xFF) == 0x47)
      MpegTs.parseTs(b).map(tsToMedia)
    else None
  }
}
