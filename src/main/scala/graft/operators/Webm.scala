package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Matroska / WebM (EBML) container metadata — after ISO-BMFF the
  * dominant real-world video container (WebM is the web's). The walk
  * derives entirely from the published EBML grammar (RFC 8794) and
  * the Matroska element registry: variable-length element IDs (stored
  * with their length-descriptor bit) and sizes (descriptor bit
  * stripped; all-value-bits-set = "unknown size"), an EBML header
  * element carrying `DocType`, then one `Segment` whose `Info`
  * (timestamp scale, float duration) and `Tracks` (track entries:
  * type, codec id, video dims, audio rate/channels) children are the
  * metadata a 100 TB filter reads.
  *
  * Design for 100 TB — the same contract as [[Mp4.parseMp4Header]]:
  *  - header-only: `Cluster` payloads (the bulk — VP8/VP9/Opus/
  *    Vorbis frames this library honestly does not decode) are
  *    skipped by declared size, their bytes never touched; once
  *    `Info` and `Tracks` are both seen the walk STOPS at the first
  *    cluster (every muxer writes metadata first).
  *  - prefix-boundable: [[parseWebmHeaderPrefix]] parses from a small
  *    persisted prefix column; metadata beyond the prefix is
  *    `parsed = false`, never fabricated.
  *  - honest: garbage, truncated varints, unknown-size elements the
  *    walk cannot step over, non-finite or negative float durations,
  *    and insane dimensions all refuse. Long cursors everywhere — a
  *    hostile 2⁶²-byte declared size ends the walk instead of
  *    wrapping.
  */
object Webm {

  /** Header-only Matroska/WebM metadata. `timescaleNs` is the
    * segment's timestamp scale in nanoseconds (the published default
    * 1,000,000 when absent); `durationMs` is
    * floor(duration · timescaleNs / 10⁶) from the float `Duration`
    * element, −1 when the segment declares none (live captures).
    * Video fields come from the FIRST video track entry, audio
    * fields from the first audio track entry; `audioRate` is the
    * integer floor of the float sampling frequency. `tracks` counts
    * every track entry.
    */
  case class WebmMeta(id: Long, docType: String, timescaleNs: Long,
      durationMs: Long, tracks: Int, videoCodec: String, width: Int,
      height: Int, audioCodec: String, audioChannels: Int,
      audioRate: Int, parsed: Boolean)

  def parseWebmHeader(df: DataFrame, idCol: String,
      binCol: String): Dataset[WebmMeta] = {
    implicit val enc = Encoders.product[WebmMeta]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          toMeta(r.getLong(0), parseWebm(r.getAs[Array[Byte]](1)))
        }
    }
  }

  /** [[parseWebmHeader]] over only the first `prefixBytes` of each
    * payload — the 100 TB metadata-filter path
    * ([[Mp4.parseMp4HeaderPrefix]] for EBML): every muxer writes the
    * EBML header, `Info` and `Tracks` ahead of the first cluster, so
    * the prefix parse succeeds on real files; metadata that would lie
    * beyond the prefix is honestly `parsed = false`.
    */
  def parseWebmHeaderPrefix(df: DataFrame, idCol: String,
      binCol: String, prefixBytes: Int = 64 * 1024): Dataset[WebmMeta] = {
    require(prefixBytes >= 8,
      s"prefixBytes must cover the EBML magic, got $prefixBytes")
    implicit val enc = Encoders.product[WebmMeta]
    df.select(col(idCol).cast("long"),
      substring(col(binCol), 1, prefixBytes).as("__webm_prefix"),
      length(col(binCol)).cast("long").as("__webm_len")).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          toMeta(r.getLong(0),
            parseWebm(r.getAs[Array[Byte]](1), r.getLong(2)))
        }
    }
  }

  /** [[parseWebmHeader]] over a PERSISTED prefix column — the storage
    * form of the 100 TB metadata-filter path
    * ([[Mp4.parseMp4HeaderPrefixCols]] for EBML): persist
    * `substring(bin, 1, prefixBytes)` plus the TRUE payload length as
    * narrow columns at ingest, and the filter runs without the
    * parquet reader ever materializing cluster data. Same honesty
    * contract as [[parseWebmHeaderPrefix]].
    */
  def parseWebmHeaderPrefixCols(df: DataFrame, idCol: String,
      prefixCol: String, totalLenCol: String): Dataset[WebmMeta] = {
    implicit val enc = Encoders.product[WebmMeta]
    df.select(col(idCol).cast("long"), col(prefixCol),
      col(totalLenCol).cast("long")).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          toMeta(r.getLong(0),
            parseWebm(r.getAs[Array[Byte]](1), r.getLong(2)))
        }
    }
  }

  /** Metadata projection — id + the [[WebmMeta]] fields as columns.
    * `prefixBytes > 0` routes through the prefix parser.
    */
  def webmMetaScan(df: DataFrame, idCol: String, binCol: String,
      prefixBytes: Int = 0): DataFrame = {
    val ds = if (prefixBytes > 0)
      parseWebmHeaderPrefix(df, idCol, binCol, prefixBytes)
    else parseWebmHeader(df, idCol, binCol)
    ds.toDF().select(col("id"),
      col("docType").as("doc_type"),
      col("timescaleNs").as("timescale_ns"),
      col("durationMs").as("duration_ms"),
      col("tracks"),
      col("videoCodec").as("video_codec"),
      col("width"), col("height"),
      col("audioCodec").as("audio_codec"),
      col("audioChannels").as("audio_channels"),
      col("audioRate").as("audio_rate"),
      col("parsed"))
  }

  // ---- imperative internals (the mapPartitions payload walker) -------

  private[graft] final case class ParsedWebm(docType: String,
      timescaleNs: Long, durationMs: Long, tracks: Int,
      videoCodec: String, width: Int, height: Int, audioCodec: String,
      audioChannels: Int, audioRate: Int)

  private def toMeta(id: Long, p: Option[ParsedWebm]): WebmMeta =
    p match {
      case Some(m) => WebmMeta(id, m.docType, m.timescaleNs,
        m.durationMs, m.tracks, m.videoCodec, m.width, m.height,
        m.audioCodec, m.audioChannels, m.audioRate, parsed = true)
      case None => WebmMeta(id, "", 0L, 0L, 0, "", 0, 0, "", 0, 0,
        parsed = false)
    }

  // Matroska element IDs (as stored, length descriptor included)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdTags = 0x1254C367L
  private val IdTag = 0x7373L
  private val IdTargets = 0x63C0L
  private val IdSimpleTag = 0x67C8L
  private val IdTagName = 0x45A3L
  private val IdTagString = 0x4487L

  private val UnknownSize = -2L // sentinel: all value bits set

  /** One EBML varint at `pos`: (value, bytesRead) — the ID form keeps
    * the descriptor bit (`keepMarker = true`), the size form strips
    * it and maps all-value-bits-set to [[UnknownSize]]. None when the
    * first byte is 0 (reserved) or the varint crosses `avail`.
    */
  private def varint(b: Array[Byte], pos: Long, avail: Long,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (pos >= avail) return None
    val first = b(pos.toInt) & 0xFF
    if (first == 0) return None // > 8-byte varints: not in the grammar
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
    if (pos + len > avail) return None
    var v = if (keepMarker) first.toLong
      else (first & (0xFF >>> len)).toLong
    var i = 1
    while (i < len) {
      v = (v << 8) | (b((pos + i).toInt) & 0xFF)
      i += 1
    }
    if (!keepMarker) {
      // all value bits set = "unknown size"
      val maxV = (1L << (7 * len)) - 1L
      if (v == maxV) return Some((UnknownSize, len))
    }
    Some((v, len))
  }

  /** Element header at `pos`: (id, bodyStart, bodyEnd) where bodyEnd
    * is [[UnknownSize]]-marked as `-2`. None on truncation/garbage.
    */
  private def elementAt(b: Array[Byte], pos: Long,
      avail: Long): Option[(Long, Long, Long)] = {
    val (id, idLen) = varint(b, pos, avail, keepMarker = true)
      .getOrElse(return None)
    val (sz, szLen) = varint(b, pos + idLen, avail, keepMarker = false)
      .getOrElse(return None)
    val body = pos + idLen + szLen
    if (sz == UnknownSize) Some((id, body, UnknownSize))
    else if (sz < 0L) None
    else Some((id, body, body + sz))
  }

  private def beUint(b: Array[Byte], start: Long, end: Long): Option[Long] = {
    val n = (end - start).toInt
    if (n < 1 || n > 8) return None
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b((start + i).toInt) & 0xFF); i += 1 }
    if (v < 0L) None else Some(v)
  }

  private def beFloat(b: Array[Byte], start: Long,
      end: Long): Option[Double] = {
    val n = end - start
    if (n == 4L) {
      var v = 0
      var i = 0
      while (i < 4) { v = (v << 8) | (b((start + i).toInt) & 0xFF); i += 1 }
      Some(java.lang.Float.intBitsToFloat(v).toDouble)
    } else if (n == 8L) {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b((start + i).toInt) & 0xFF); i += 1 }
      Some(java.lang.Double.longBitsToDouble(v))
    } else None // the grammar allows only 4- or 8-byte floats
  }

  /** The EBML walk. `trueLen < 0` means `bytes` IS the whole payload;
    * otherwise `bytes` is a prefix of a `trueLen`-byte payload.
    * Identification requires the leading EBML header element with a
    * Matroska-family DocType. The walk stops at the first cluster
    * once `Info` and `Tracks` are both in hand; structure it cannot
    * step over (unknown-size non-segment elements, headers beyond the
    * prefix before the metadata is complete) refuses.
    */
  private[graft] def parseWebm(bytes: Array[Byte],
      trueLen: Long = -1L): Option[ParsedWebm] = {
    if (bytes == null || bytes.length < 8) return None
    val total = if (trueLen < 0) bytes.length.toLong else trueLen
    val avail = bytes.length.toLong

    // ---- EBML header: identification + DocType
    val (id0, hBody, hEnd) =
      elementAt(bytes, 0L, avail).getOrElse(return None)
    if (id0 != IdEbml || hEnd == UnknownSize || hEnd > avail)
      return None
    var docType = ""
    var p = hBody
    while (p < hEnd) {
      val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return None)
      if (e == UnknownSize || e > hEnd) return None
      if (eid == IdDocType) {
        var len = (e - b).toInt
        // the grammar zero-pads strings; trim trailing NULs
        while (len > 0 && bytes((b + len - 1).toInt) == 0) len -= 1
        docType = new String(bytes, b.toInt, len, "US-ASCII")
      }
      p = e
    }
    if (docType != "webm" && docType != "matroska") return None

    // ---- Segment
    val (segId, segBody, segEndRaw) =
      elementAt(bytes, hEnd, avail).getOrElse(return None)
    if (segId != IdSegment) return None
    val segEnd =
      if (segEndRaw == UnknownSize) total // streamed capture: to EOF
      else if (segEndRaw > total) return None
      else segEndRaw

    var timescaleNs = 1000000L // the published default
    var durationF = -1.0
    var sawDuration = false
    var tracks = 0
    var videoCodec = ""
    var width = 0
    var height = 0
    var audioCodec = ""
    var audioChannels = 0
    var audioRate = 0
    var sawInfo = false
    var sawTracks = false

    def walkInfo(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        eid match {
          case IdTimestampScale =>
            timescaleNs = beUint(bytes, b, e).getOrElse(return false)
            if (timescaleNs <= 0L) return false
          case IdDuration =>
            durationF = beFloat(bytes, b, e).getOrElse(return false)
            if (!java.lang.Double.isFinite(durationF) ||
              durationF < 0.0) return false
            sawDuration = true
          case _ => // MuxingApp/WritingApp/SegmentUID/…: not metadata
        }
        p = e
      }
      true
    }

    def walkTrackEntry(start: Long, end: Long): Boolean = {
      var trackType = 0L
      var codecId = ""
      var w = 0L
      var h = 0L
      var ch = 0L
      var rate = -1.0
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        eid match {
          case IdTrackType =>
            trackType = beUint(bytes, b, e).getOrElse(return false)
          case IdCodecId =>
            var len = (e - b).toInt
            while (len > 0 && bytes((b + len - 1).toInt) == 0) len -= 1
            codecId = new String(bytes, b.toInt, len, "US-ASCII")
          case IdVideo =>
            var q = b
            while (q < e) {
              val (vid, vb, ve) =
                elementAt(bytes, q, avail).getOrElse(return false)
              if (ve == UnknownSize || ve > e) return false
              if (vid == IdPixelWidth)
                w = beUint(bytes, vb, ve).getOrElse(return false)
              else if (vid == IdPixelHeight)
                h = beUint(bytes, vb, ve).getOrElse(return false)
              q = ve
            }
          case IdAudio =>
            var q = b
            while (q < e) {
              val (aid, ab, ae) =
                elementAt(bytes, q, avail).getOrElse(return false)
              if (ae == UnknownSize || ae > e) return false
              if (aid == IdChannels)
                ch = beUint(bytes, ab, ae).getOrElse(return false)
              else if (aid == IdSamplingFrequency) {
                rate = beFloat(bytes, ab, ae).getOrElse(return false)
                if (!java.lang.Double.isFinite(rate) || rate <= 0.0 ||
                  rate > Int.MaxValue) return false
              }
              q = ae
            }
          case _ =>
        }
        p = e
      }
      tracks += 1
      if (trackType == 1L && videoCodec.isEmpty && codecId.nonEmpty) {
        if (w <= 0L || h <= 0L || w > 32768L || h > 32768L) return false
        videoCodec = codecId
        width = w.toInt
        height = h.toInt
      } else if (trackType == 2L && audioCodec.isEmpty &&
        codecId.nonEmpty) {
        audioCodec = codecId
        audioChannels = ch.toInt
        audioRate = if (rate > 0.0) math.floor(rate).toInt else 0
      }
      true
    }

    def walkTracks(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == IdTrackEntry) {
          if (!walkTrackEntry(b, e)) return false
        }
        p = e
      }
      true
    }

    // ---- segment children: Info/Tracks must be PRESENT; clusters
    // (and anything after both are in hand) are skippable bulk
    var pos = segBody
    var done = false
    while (!done && pos < segEnd) {
      elementAt(bytes, pos, avail) match {
        case Some((eid, b, e)) =>
          if (eid == IdInfo) {
            if (e == UnknownSize || e > avail) return None
            if (!walkInfo(b, e)) return None
            sawInfo = true
          } else if (eid == IdTracks) {
            if (e == UnknownSize || e > avail) return None
            if (!walkTracks(b, e)) return None
            sawTracks = true
          } else if (eid == IdCluster) {
            if (sawInfo && sawTracks) done = true // metadata complete
            else if (e == UnknownSize || e > total) return None
            // clusters before the metadata: skip by declared size
          } else {
            // SeekHead/Void/Tags/Cues/…: skip by declared size
            if (e == UnknownSize) return None
          }
          if (!done) {
            if (e == UnknownSize || e > total) return None
            pos = e
          }
        case None =>
          // header beyond the prefix: honest only once complete
          if (sawInfo && sawTracks && pos + 1 > avail && pos < total)
            done = true
          else return None
      }
    }
    if (!sawInfo || !sawTracks || tracks == 0) return None
    val durationMs =
      if (!sawDuration) -1L
      else {
        val ms = durationF * timescaleNs.toDouble / 1e6
        if (!(ms >= 0.0 && ms <= Long.MaxValue.toDouble)) return None
        math.floor(ms).toLong
      }
    Some(ParsedWebm(docType, timescaleNs, durationMs, tracks,
      videoCodec, width, height, audioCodec, audioChannels, audioRate))
  }

  /** The Matroska soundtrack walk — the EBML side of the audio
    * bridge ([[Mp4.mp4AudioTrackWav]] for ISO-BMFF, the movi concat
    * for AVI): locate the FIRST audio track entry, require an
    * uncompressed-PCM codec id (`A_PCM/INT/LIT` / `A_PCM/INT/BIG`,
    * 16-bit), then concatenate the track's block payloads in stream
    * order — `SimpleBlock`s and `BlockGroup`-wrapped `Block`s both
    * walk; LACED blocks refuse honestly (no PCM muxer laces, and
    * guessing lace boundaries would corrupt the signal), as do
    * compressed codecs (Opus/Vorbis — fabricating samples is this
    * family's forbidden move), non-16-bit depths, and streams past
    * `maxAudioBytes` (refused, never truncated). Byte-level: the only
    * transform is the big-endian pair swap WAV's canonical layout
    * demands. Returns (wavFormat=1, channels, rate, bits, wavBytes).
    */
  /** Segment-level SimpleTags out of the Tags element (the published
    * Matroska metadata home: Tag -> SimpleTag -> TagName/TagString,
    * both UTF-8). Empty on files without Tags; a malformed Tags
    * structure refuses (empty) per the metadata-scan convention. The
    * file must first pass the container walk — tags from a broken
    * Matroska are not evidence.
    */
  private[graft] def webmSimpleTags(
      bytes: Array[Byte]): Seq[(String, String)] = {
    if (parseWebm(bytes).isEmpty) return Nil
    val avail = bytes.length.toLong
    val (_, _, hEnd) =
      elementAt(bytes, 0L, avail).getOrElse(return Nil)
    val (segId, segBody, segEndRaw) =
      elementAt(bytes, hEnd, avail).getOrElse(return Nil)
    if (segId != IdSegment) return Nil
    val segEnd =
      if (segEndRaw == UnknownSize) avail
      else math.min(segEndRaw, avail)
    val out = Seq.newBuilder[(String, String)]
    var p = segBody
    while (p < segEnd) {
      val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return Nil)
      if (e == UnknownSize) {
        if (eid != IdCluster) return Nil
        return out.result() // unknown-size cluster runs to EOF
      }
      if (e > segEnd) return Nil
      if (eid == IdTags) {
        var t = b
        while (t < e) {
          val (tid, tb, te) =
            elementAt(bytes, t, avail).getOrElse(return Nil)
          if (te == UnknownSize || te > e) return Nil
          if (tid == IdTag) {
            var q = tb
            while (q < te) {
              val (qid, qb, qe) =
                elementAt(bytes, q, avail).getOrElse(return Nil)
              if (qe == UnknownSize || qe > te) return Nil
              if (qid == IdSimpleTag) {
                var name: String = null
                var value: String = null
                var r = qb
                while (r < qe) {
                  val (rid, rb, re) =
                    elementAt(bytes, r, avail).getOrElse(return Nil)
                  if (re == UnknownSize || re > qe) return Nil
                  if (rid == IdTagName)
                    name = new String(bytes, rb.toInt,
                      (re - rb).toInt, "UTF-8")
                  else if (rid == IdTagString)
                    value = new String(bytes, rb.toInt,
                      (re - rb).toInt, "UTF-8")
                  r = re
                }
                if (name == null || value == null) return Nil
                out += ((name, value))
              }
              q = qe
            }
          }
          t = te
        }
      }
      p = e
    }
    out.result()
  }

  private[graft] def webmAudioTrackWav(bytes: Array[Byte],
      maxAudioBytes: Int): Option[(Int, Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) return None
    val avail = bytes.length.toLong
    // EBML header + docType gate (same as the metadata walk)
    val (id0, hBody, hEnd) =
      elementAt(bytes, 0L, avail).getOrElse(return None)
    if (id0 != IdEbml || hEnd == UnknownSize || hEnd > avail)
      return None
    var docType = ""
    var p = hBody
    while (p < hEnd) {
      val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return None)
      if (e == UnknownSize || e > hEnd) return None
      if (eid == IdDocType) {
        var len = (e - b).toInt
        while (len > 0 && bytes((b + len - 1).toInt) == 0) len -= 1
        docType = new String(bytes, b.toInt, len, "US-ASCII")
      }
      p = e
    }
    if (docType != "webm" && docType != "matroska") return None
    val (segId, segBody, segEndRaw) =
      elementAt(bytes, hEnd, avail).getOrElse(return None)
    if (segId != IdSegment) return None
    val segEnd =
      if (segEndRaw == UnknownSize) avail
      else if (segEndRaw > avail) return None
      else segEndRaw

    // ---- pass 1: the first audio track's number + PCM shape
    var pcmTrack = -1L
    var channels = 0
    var rate = 0
    var swapBe = false
    def walkTracksFor(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == IdTrackEntry && pcmTrack < 0L) {
          var num = -1L
          var trackType = 0L
          var codecId = ""
          var ch = 0L
          var rt = -1.0
          var depth = -1L
          var q = b
          while (q < e) {
            val (tid, tb, te) =
              elementAt(bytes, q, avail).getOrElse(return false)
            if (te == UnknownSize || te > e) return false
            tid match {
              case 0xD7L =>
                num = beUint(bytes, tb, te).getOrElse(return false)
              case IdTrackType =>
                trackType = beUint(bytes, tb, te).getOrElse(return false)
              case IdCodecId =>
                var len = (te - tb).toInt
                while (len > 0 && bytes((tb + len - 1).toInt) == 0)
                  len -= 1
                codecId = new String(bytes, tb.toInt, len, "US-ASCII")
              case IdAudio =>
                var a = tb
                while (a < te) {
                  val (aid, ab, ae) =
                    elementAt(bytes, a, avail).getOrElse(return false)
                  if (ae == UnknownSize || ae > te) return false
                  if (aid == IdChannels)
                    ch = beUint(bytes, ab, ae).getOrElse(return false)
                  else if (aid == 0x6264L)
                    depth = beUint(bytes, ab, ae).getOrElse(return false)
                  else if (aid == IdSamplingFrequency) {
                    rt = beFloat(bytes, ab, ae).getOrElse(return false)
                    if (!java.lang.Double.isFinite(rt) || rt <= 0.0 ||
                      rt > Int.MaxValue || rt != math.floor(rt))
                      return false
                  }
                  a = ae
                }
              case _ =>
            }
            q = te
          }
          if (trackType == 2L) { // the FIRST audio track decides
            if (num <= 0L || num > 126L) return false // 1-byte varint
            if (codecId != "A_PCM/INT/LIT" && codecId != "A_PCM/INT/BIG")
              return false // compressed codecs refuse honestly
            if (depth >= 0L && depth != 16L) return false
            if (ch < 1L || ch > 64L || rt <= 0.0) return false
            pcmTrack = num
            channels = ch.toInt
            rate = rt.toInt
            swapBe = codecId.endsWith("BIG")
          }
        }
        p = e
      }
      true
    }

    // ---- block walk: collect (offset, length) of the PCM payloads
    val chunks = Vector.newBuilder[(Int, Int)]
    var total = 0L
    def blockPayload(b: Long, e: Long): Boolean = {
      // track varint (size-coded), s16 timestamp, flags, payload
      val (tn, tnLen) = varint(bytes, b, avail, keepMarker = false)
        .getOrElse(return false)
      val hdr = b + tnLen + 3
      if (hdr > e) return false
      if (tn == pcmTrack) {
        val flags = bytes((b + tnLen + 2).toInt) & 0xFF
        if ((flags & 0x06) != 0) return false // laced: refuse
        val len = (e - hdr).toInt
        total += len
        if (total > maxAudioBytes) return false // refuse, never trim
        chunks += (((hdr).toInt, len))
      }
      true
    }
    def walkCluster(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == 0xA3L) { // SimpleBlock
          if (!blockPayload(b, e)) return false
        } else if (eid == 0xA0L) { // BlockGroup
          var q = b
          while (q < e) {
            val (gid, gb, ge) =
              elementAt(bytes, q, avail).getOrElse(return false)
            if (ge == UnknownSize || ge > e) return false
            if (gid == 0xA1L && !blockPayload(gb, ge)) return false
            q = ge
          }
        }
        p = e
      }
      true
    }

    var pos = segBody
    var sawTracks = false
    while (pos < segEnd) {
      val (eid, b, e) = elementAt(bytes, pos, avail).getOrElse(return None)
      if (e == UnknownSize || e > segEnd) return None
      if (eid == IdTracks) {
        if (!walkTracksFor(b, e)) return None
        sawTracks = true
      } else if (eid == IdCluster) {
        if (!sawTracks || pcmTrack < 0L) return None
        if (!walkCluster(b, e)) return None
      }
      pos = e
    }
    if (pcmTrack < 0L || total == 0L) return None

    // ---- concat behind the canonical 44-byte WAV header
    val n = total.toInt
    val out = new Array[Byte](44 + n)
    var w = 44
    chunks.result().foreach { case (off, len) =>
      System.arraycopy(bytes, off, out, w, len)
      w += len
    }
    if (swapBe) {
      var o = 44
      while (o + 1 < out.length) {
        val t = out(o); out(o) = out(o + 1); out(o + 1) = t
        o += 2
      }
    }
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte
      out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    def w16o(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def tag4o(o: Int, s: String): Unit = {
      var t = 0
      while (t < 4) { out(o + t) = s.charAt(t).toByte; t += 1 }
    }
    val blockAlign = channels * 2
    tag4o(0, "RIFF"); w32(4, 36L + n); tag4o(8, "WAVE")
    tag4o(12, "fmt "); w32(16, 16L)
    w16o(20, 1); w16o(22, channels)
    w32(24, rate.toLong); w32(28, rate.toLong * blockAlign)
    w16o(32, blockAlign); w16o(34, 16)
    tag4o(36, "data"); w32(40, n.toLong)
    Some((1, channels, rate, 16, out))
  }

  // ---- subtitle track extraction (the video→text bridge) -------------

  /** One extracted text cue: times in exact ms (floor of
    * ticks · timescale / 10⁶), `cueIndex` positional in stream order.
    */
  case class WebmCue(id: Long, cueIndex: Long, startMs: Long,
      endMs: Long, text: String)

  /** Extract the FIRST text-subtitle track's cues (`S_TEXT/UTF8` or
    * `S_TEXT/ASS`) from each Matroska/WebM payload — the video→text
    * bridge: caption text is aligned-transcript training data, and
    * it rides the container in CLOSED FORM (text block payloads +
    * exact tick arithmetic; no codec in the way). Start = cluster
    * timestamp + the block's signed relative timestamp; end =
    * start + `BlockDuration` when the cue is BlockGroup-wrapped (the
    * standard subtitle shape), and start itself for a bare
    * SimpleBlock (duration unknown — never invented). ASS payloads
    * carry the Matroska-defined `ReadOrder,Layer,Style,Name,MarginL,
    * MarginR,MarginV,Effect,Text` line — the Text field (commas
    * preserved) is emitted through [[Subtitle.assPlainText]]'s
    * published transform; a payload with fewer than nine fields
    * refuses. Laced blocks, negative start ticks, tick arithmetic
    * that would overflow, and over-cap files (`maxCues`) refuse the
    * whole payload; payloads without a subtitle track emit nothing.
    */
  def webmSubtitleCues(df: DataFrame, idCol: String, binCol: String,
      maxCues: Int = 100000): DataFrame = {
    require(maxCues > 0, "maxCues must be positive")
    implicit val enc = Encoders.product[WebmCue]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          subtitleCuesOf(r.getAs[Array[Byte]](1), maxCues) match {
            case Some(cues) => cues.zipWithIndex.map {
              case ((s, e, t), i) => WebmCue(id, i.toLong, s, e, t)
            }
            case None => Nil
          }
        }
    }.toDF().select(col("id"), col("cueIndex").as("cue_index"),
      col("startMs").as("start_ms"), col("endMs").as("end_ms"),
      col("text"))
  }

  private[graft] def subtitleCuesOf(bytes: Array[Byte],
      maxCues: Int): Option[Vector[(Long, Long, String)]] = {
    if (bytes == null || bytes.length < 8) return None
    val avail = bytes.length.toLong
    val (id0, hBody, hEnd) =
      elementAt(bytes, 0L, avail).getOrElse(return None)
    if (id0 != IdEbml || hEnd == UnknownSize || hEnd > avail)
      return None
    var docType = ""
    var p = hBody
    while (p < hEnd) {
      val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return None)
      if (e == UnknownSize || e > hEnd) return None
      if (eid == IdDocType) {
        var len = (e - b).toInt
        while (len > 0 && bytes((b + len - 1).toInt) == 0) len -= 1
        docType = new String(bytes, b.toInt, len, "US-ASCII")
      }
      p = e
    }
    if (docType != "webm" && docType != "matroska") return None
    val (segId, segBody, segEndRaw) =
      elementAt(bytes, hEnd, avail).getOrElse(return None)
    if (segId != IdSegment) return None
    val segEnd =
      if (segEndRaw == UnknownSize) avail
      else if (segEndRaw > avail) return None
      else segEndRaw

    var timescaleNs = 1000000L // the published default
    var subTrack = -1L
    var subIsAss = false
    var sawTracks = false
    def ticksToMs(t: Long): Option[Long] =
      if (t < 0L || t > Long.MaxValue / timescaleNs) None
      else Some(t * timescaleNs / 1000000L)

    def walkInfoFor(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == IdTimestampScale) {
          val v = beUint(bytes, b, e).getOrElse(return false)
          if (v <= 0L) return false
          timescaleNs = v
        }
        p = e
      }
      true
    }

    def walkTracksSub(start: Long, end: Long): Boolean = {
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == IdTrackEntry && subTrack < 0L) {
          var num = -1L
          var trackType = 0L
          var codecId = ""
          var q = b
          while (q < e) {
            val (tid, tb, te) =
              elementAt(bytes, q, avail).getOrElse(return false)
            if (te == UnknownSize || te > e) return false
            tid match {
              case 0xD7L =>
                num = beUint(bytes, tb, te).getOrElse(return false)
              case IdTrackType =>
                trackType = beUint(bytes, tb, te).getOrElse(return false)
              case IdCodecId =>
                var len = (te - tb).toInt
                while (len > 0 && bytes((tb + len - 1).toInt) == 0)
                  len -= 1
                codecId = new String(bytes, tb.toInt, len, "US-ASCII")
              case _ =>
            }
            q = te
          }
          if (trackType == 17L && (codecId == "S_TEXT/UTF8" ||
            codecId == "S_TEXT/ASS")) {
            if (num <= 0L || num > 126L) return false
            subTrack = num
            subIsAss = codecId == "S_TEXT/ASS"
          }
        }
        p = e
      }
      true
    }

    val cues = Vector.newBuilder[(Long, Long, String)]
    var nCues = 0
    // one block at (b, e): returns false on structural refusal
    def textBlock(b: Long, e: Long, clusterTs: Long,
        durTicks: Long): Boolean = {
      val (tn, tnLen) = varint(bytes, b, avail, keepMarker = false)
        .getOrElse(return false)
      val hdr = b + tnLen + 3
      if (hdr > e) return false
      if (tn == subTrack) {
        val flags = bytes((b + tnLen + 2).toInt) & 0xFF
        if ((flags & 0x06) != 0) return false // laced: refuse
        val rel = (((bytes((b + tnLen).toInt) & 0xFF) << 8) |
          (bytes((b + tnLen + 1).toInt) & 0xFF)).toShort.toLong
        val startTicks = clusterTs + rel
        val startMs = ticksToMs(startTicks).getOrElse(return false)
        val endMs =
          if (durTicks < 0L) startMs
          else ticksToMs(startTicks + durTicks).getOrElse(return false)
        nCues += 1
        if (nCues > maxCues) return false // refuse, never trim
        val payload = new String(bytes, hdr.toInt, (e - hdr).toInt,
          "UTF-8")
        val text =
          if (!subIsAss) payload
          else {
            // Matroska ASS block line: ReadOrder,Layer,Style,Name,
            // MarginL,MarginR,MarginV,Effect,Text (Text keeps commas)
            val parts = payload.split(",", 9)
            if (parts.length < 9) return false
            Subtitle.assPlainText(parts(8))
          }
        cues += ((startMs, endMs, text))
      }
      true
    }
    def walkClusterSub(start: Long, end: Long): Boolean = {
      var clusterTs = 0L
      var p = start
      while (p < end) {
        val (eid, b, e) = elementAt(bytes, p, avail).getOrElse(return false)
        if (e == UnknownSize || e > end) return false
        if (eid == 0xE7L) {
          clusterTs = beUint(bytes, b, e).getOrElse(return false)
        } else if (eid == 0xA3L) { // SimpleBlock: no duration
          if (!textBlock(b, e, clusterTs, -1L)) return false
        } else if (eid == 0xA0L) { // BlockGroup
          var blockB = -1L; var blockE = -1L
          var dur = -1L
          var q = b
          while (q < e) {
            val (gid, gb, ge) =
              elementAt(bytes, q, avail).getOrElse(return false)
            if (ge == UnknownSize || ge > e) return false
            if (gid == 0xA1L) { blockB = gb; blockE = ge }
            else if (gid == 0x9BL) // BlockDuration
              dur = beUint(bytes, gb, ge).getOrElse(return false)
            q = ge
          }
          if (blockB >= 0L && !textBlock(blockB, blockE, clusterTs, dur))
            return false
        }
        p = e
      }
      true
    }

    var pos = segBody
    while (pos < segEnd) {
      val (eid, b, e) = elementAt(bytes, pos, avail).getOrElse(return None)
      if (e == UnknownSize || e > segEnd) return None
      if (eid == IdInfo) {
        if (!walkInfoFor(b, e)) return None
      } else if (eid == IdTracks) {
        if (!walkTracksSub(b, e)) return None
        sawTracks = true
      } else if (eid == IdCluster) {
        if (!sawTracks) return None
        if (subTrack < 0L) return None // no subtitle track: no rows
        if (!walkClusterSub(b, e)) return None
      }
      pos = e
    }
    if (subTrack < 0L) return None
    Some(cues.result())
  }

  // ---- encoder (round-trip twin; also the fixture/smoke builder) -----

  /** Build a minimal valid WebM/Matroska file: EBML header (DocType),
    * one Segment with Info (timestamp scale + optional float
    * duration), Tracks (an optional video entry and an optional audio
    * entry), and `nClusters` clusters of opaque filler — the decode
    * twin of [[parseWebmHeader]]; payload blocks are filler (this
    * library never claims to decode VP8/VP9/Opus/Vorbis).
    * `durationTicks < 0` omits the Duration element (live-capture
    * shape). `unknownSizeSegment` writes the streamed form (segment
    * size all-ones, clusters to EOF).
    */
  def buildWebm(docType: String, timescaleNs: Long,
      durationTicks: Double, videoCodec: String = "V_VP8",
      width: Int = 0, height: Int = 0, audioCodec: String = "",
      audioChannels: Int = 0, audioRate: Double = 0.0,
      nClusters: Int = 1, clusterBytes: Int = 64,
      unknownSizeSegment: Boolean = false,
      floatDuration32: Boolean = false,
      audioPcm: Array[Int] = null, pcmBigEndian: Boolean = false,
      blockSamples: Seq[Int] = Nil,
      useBlockGroups: Boolean = false,
      subCues: Seq[(Long, Long, String)] = Nil,
      subAss: Boolean = false,
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    require(docType == "webm" || docType == "matroska", "docType")
    require(timescaleNs > 0, "timescaleNs")
    require(videoCodec.nonEmpty || audioCodec.nonEmpty ||
      audioPcm != null || subCues.nonEmpty, "at least one track")
    subCues.foreach { case (st, _, t) =>
      require(st >= 0, "cue start ticks must be non-negative")
      require(t.nonEmpty, "cue text must be non-empty")
    }
    if (audioPcm != null) {
      require(audioCodec.isEmpty,
        "audioPcm writes its own A_PCM track; leave audioCodec empty")
      require(audioChannels >= 1 && audioRate > 0, "pcm track shape")
      require(blockSamples.nonEmpty && blockSamples.forall(_ > 0),
        "blockSamples must be positive")
      require(audioPcm.length == blockSamples.sum * audioChannels,
        s"audioPcm ${audioPcm.length} != frames ${blockSamples.sum} " +
          s"x $audioChannels channels")
    }
    // `bos` is the CURRENT buffer; element() pushes a fresh one for
    // its body and appends it to the parent once sized — linear in
    // output size (a single shared buffer re-copied per sibling is
    // quadratic: at 2M smoke fixtures that measured 63 s vs 6 s)
    var bos = new java.io.ByteArrayOutputStream()
    def writeId(id: Long): Unit = {
      var len = 1
      while ((id >>> (8 * len)) != 0L) len += 1
      var i = len - 1
      while (i >= 0) { bos.write(((id >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    def writeSize(sz: Long): Unit = {
      // shortest form with at least one spare value bit (so the
      // all-ones unknown-size pattern is never emitted by accident)
      var len = 1
      while (len < 8 && sz >= (1L << (7 * len)) - 1L) len += 1
      val v = sz | (1L << (7 * len))
      var i = len - 1
      while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    def element(id: Long)(body: => Unit): Unit = {
      val parent = bos
      bos = new java.io.ByteArrayOutputStream()
      body
      val payload = bos.toByteArray
      bos = parent
      writeId(id)
      writeSize(payload.length.toLong)
      bos.write(payload, 0, payload.length)
    }
    def uintEl(id: Long, v: Long): Unit = element(id) {
      var len = 1
      while ((v >>> (8 * len)) != 0L) len += 1
      var i = len - 1
      while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    def strEl(id: Long, s: String): Unit = element(id) {
      bos.write(s.getBytes("US-ASCII"))
    }
    def floatEl(id: Long, d: Double, as32: Boolean): Unit = element(id) {
      if (as32) {
        val v = java.lang.Float.floatToIntBits(d.toFloat)
        var i = 3
        while (i >= 0) { bos.write((v >>> (8 * i)) & 0xFF); i -= 1 }
      } else {
        val v = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { bos.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
      }
    }

    element(IdEbml) {
      uintEl(0x4286L, 1L) // EBMLVersion
      uintEl(0x42F7L, 1L) // EBMLReadVersion
      uintEl(0x42F2L, 4L) // EBMLMaxIDLength
      uintEl(0x42F3L, 8L) // EBMLMaxSizeLength
      strEl(IdDocType, docType)
      uintEl(0x4287L, 2L) // DocTypeVersion
      uintEl(0x4285L, 2L) // DocTypeReadVersion
    }

    def segmentBody(): Unit = {
      element(IdInfo) {
        uintEl(IdTimestampScale, timescaleNs)
        if (durationTicks >= 0.0)
          floatEl(IdDuration, durationTicks, floatDuration32)
        strEl(0x4D80L, "graft") // MuxingApp
        strEl(0x5741L, "graft") // WritingApp
      }
      element(IdTracks) {
        var trackNum = 1L
        if (videoCodec.nonEmpty) {
          element(IdTrackEntry) {
            uintEl(0xD7L, trackNum) // TrackNumber
            uintEl(0x73C5L, trackNum) // TrackUID
            uintEl(IdTrackType, 1L)
            strEl(IdCodecId, videoCodec)
            element(IdVideo) {
              uintEl(IdPixelWidth, width.toLong)
              uintEl(IdPixelHeight, height.toLong)
            }
          }
          trackNum += 1
        }
        if (audioCodec.nonEmpty || audioPcm != null) {
          element(IdTrackEntry) {
            uintEl(0xD7L, trackNum)
            uintEl(0x73C5L, trackNum)
            uintEl(IdTrackType, 2L)
            strEl(IdCodecId,
              if (audioPcm != null)
                "A_PCM/INT/" + (if (pcmBigEndian) "BIG" else "LIT")
              else audioCodec)
            element(IdAudio) {
              floatEl(IdSamplingFrequency, audioRate, as32 = false)
              uintEl(IdChannels, audioChannels.toLong)
              if (audioPcm != null) uintEl(0x6264L, 16L) // BitDepth
            }
          }
        }
        if (subCues.nonEmpty) {
          val subNum = trackNum +
            (if (audioCodec.nonEmpty || audioPcm != null) 1L else 0L)
          element(IdTrackEntry) {
            uintEl(0xD7L, subNum)
            uintEl(0x73C5L, subNum)
            uintEl(IdTrackType, 17L) // subtitle
            strEl(IdCodecId,
              if (subAss) "S_TEXT/ASS" else "S_TEXT/UTF8")
          }
        }
      }
      if (audioPcm != null) {
        // REAL PCM blocks: clusters of up to 3 blocks each, every
        // block a SimpleBlock (or a BlockGroup-wrapped Block) of the
        // audio track — 1-byte track varint, s16 relative timestamp,
        // flags, then the samples in the codec's byte order
        val pcmTrack = if (videoCodec.nonEmpty) 2L else 1L
        var s = 0
        blockSamples.grouped(3).zipWithIndex.foreach { case (grp, c) =>
          element(IdCluster) {
            uintEl(0xE7L, c.toLong * 1000L) // Timestamp
            grp.zipWithIndex.foreach { case (frames, bi) =>
              def blockBody(simple: Boolean): Unit = {
                bos.write((0x80L | pcmTrack).toInt) // 1-byte varint
                bos.write(0); bos.write(bi) // relative timestamp
                bos.write(if (simple) 0x80 else 0x00) // flags, no lacing
                (0 until frames * audioChannels).foreach { _ =>
                  val v = audioPcm(s); s += 1
                  if (pcmBigEndian) {
                    bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF)
                  } else {
                    bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
                  }
                }
              }
              if (useBlockGroups)
                element(0xA0L) { // BlockGroup
                  element(0xA1L) { blockBody(simple = false) } // Block
                }
              else element(0xA3L) { blockBody(simple = true) }
            }
          }
        }
      } else if (subCues.isEmpty) (0 until nClusters).foreach { c =>
        element(IdCluster) {
          uintEl(0xE7L, c.toLong * 1000L) // Timestamp
          element(0xA3L) { // SimpleBlock: opaque filler payload
            (0 until clusterBytes).foreach(i =>
              bos.write((i * 31 + c * 7) & 0xFF))
          }
        }
      }
      if (subCues.nonEmpty) {
        // subtitle clusters: cues paired two per cluster, the second
        // block carrying a REAL positive relative timestamp; a cue
        // with durTicks >= 0 is BlockGroup + BlockDuration (the
        // standard subtitle shape), durTicks < 0 a bare SimpleBlock
        val subNum = 1L + (if (videoCodec.nonEmpty) 1L else 0L) +
          (if (audioCodec.nonEmpty || audioPcm != null) 1L else 0L)
        var readOrder = 0
        subCues.grouped(2).foreach { grp =>
          val clusterTs = grp.head._1
          element(IdCluster) {
            uintEl(0xE7L, clusterTs)
            grp.foreach { case (st, dur, text) =>
              val rel = st - clusterTs
              require(rel >= Short.MinValue && rel <= Short.MaxValue,
                s"cue relative timestamp $rel does not fit s16")
              val line =
                if (subAss) {
                  val l = s"$readOrder,0,Default,,0,0,0,,$text"
                  readOrder += 1
                  l
                } else text
              def blockBody(simple: Boolean): Unit = {
                bos.write((0x80L | subNum).toInt) // 1-byte varint
                bos.write(((rel >> 8) & 0xFF).toInt)
                bos.write((rel & 0xFF).toInt)
                bos.write(if (simple) 0x80 else 0x00) // no lacing
                val tb = line.getBytes("UTF-8")
                bos.write(tb, 0, tb.length)
              }
              if (dur >= 0L)
                element(0xA0L) { // BlockGroup
                  element(0xA1L) { blockBody(simple = false) }
                  uintEl(0x9BL, dur) // BlockDuration
                }
              else element(0xA3L) { blockBody(simple = true) }
            }
          }
        }
      }
      if (tags.nonEmpty) element(IdTags) {
        element(IdTag) {
          element(IdTargets) {} // empty targets = whole segment
          tags.foreach { case (name, value) =>
            element(IdSimpleTag) {
              element(IdTagName) {
                bos.write(name.getBytes("UTF-8"))
              }
              element(IdTagString) {
                bos.write(value.getBytes("UTF-8"))
              }
            }
          }
        }
      }
    }

    if (unknownSizeSegment) {
      val parent = bos
      bos = new java.io.ByteArrayOutputStream()
      segmentBody()
      val payload = bos.toByteArray
      bos = parent
      writeId(IdSegment)
      bos.write(0xFF) // 1-byte all-ones size: unknown
      bos.write(payload, 0, payload.length)
    } else element(IdSegment) { segmentBody() }
    bos.toByteArray
  }
}
