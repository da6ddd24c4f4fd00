package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** MPEG-TS (ISO/IEC 13818-1) and ADTS-AAC (ISO/IEC 14496-3 §1.A.2) —
  * the HLS carrier family: `.ts` segments and raw `.aac` streams are
  * the most common video/audio shapes in a crawl that no ISO-BMFF or
  * EBML walk touches. Both are CHAINED grammars, not indexed ones:
  * a TS is a flat run of 188-byte packets routed by PID (PAT → PMT →
  * PES), an ADTS stream is a run of self-delimiting frames — so the
  * honest walk is a single forward pass, exactly the shape a
  * path-level shard source streams.
  *
  * Honesty contract (the [[Avif]] standard): a length that is not a
  * multiple of 188, a lost 0x47 sync on ANY packet boundary, a lying
  * adaptation-field length, a PAT/PMT whose CRC32 does not verify, a
  * PES start code that is not 00 00 01, an ADTS frame whose sync /
  * layer / frequency-index / channel fields are invalid, a truncated
  * final frame, or a mid-stream parameter drift refuses the WHOLE
  * payload — never a guessed field. Dimensions are never copied from
  * a container claim: a TS has no container dims at all, so
  * width/height come only from the contained H.264/H.265 SPS
  * ([[Mp4.parseSps]] / [[Mp4.parseHevcSps]] — the same exp-Golomb
  * parsers the MP4 cross-check runs), and the audio rate comes from
  * the contained ADTS header via the SAME [[parseAdtsHeader]] the
  * standalone `.aac` walk uses — the two carriers cannot drift.
  *
  * Scale: the TS walk is O(packets) with O(1) state per PID; the ES
  * accumulation that feeds the SPS scan is CAPPED at
  * `maxEsScanBytes` and stops at the first SPS, so a multi-GiB
  * segment costs a bounded prefix of buffering, not the file. ADTS
  * is pure header hopping (frame_length strides), like [[Mp3]].
  */
object MpegTs {

  // ---- MPEG-2 CRC32 (poly 0x04C11DB7, init ~0, no reflection) -------

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[graft] def crc32Mpeg(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    while (i < off + len) {
      c = (c << 8) ^ crcTable(((c >>> 24) ^ (b(i) & 0xFF)) & 0xFF)
      i += 1
    }
    c
  }

  // ---- ADTS ----------------------------------------------------------

  /** MPEG-4 sampling_frequency_index table (index 13/14 reserved). */
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  private val AdtsProfiles = Array("aac_main", "aac_lc", "aac_ssr",
    "aac_ltp")

  /** One ADTS frame header: fields + total frame stride. `None` on
    * any invalid field — sync, layer != 0, reserved frequency index,
    * channel_configuration 0 (PCE-carried configs are refused, not
    * guessed), or a frame_length shorter than its own header.
    *
    * `end` is an explicit read bound: the standalone `.aac` walk
    * passes the whole buffer's length, while the TS audio branch
    * passes the 188-byte packet end — WITHOUT the bound, a PES
    * header leaving fewer than 7 payload bytes in the packet would
    * read the NEXT packet's sync/PID bytes as header fields in the
    * column walk (whole-array) but refuse in the stream walk
    * (one-packet buffer), breaking the byte-equality contract
    * between [[parseTs]] and [[parseTsStream]]. A CRC-protected
    * header needs its 2 CRC bytes inside the bound too.
    */
  private[graft] def parseAdtsHeader(b: Array[Byte], off: Int)
      : Option[(Int, Int, Int, Boolean, Int, Int)] =
    parseAdtsHeader(b, off, b.length)

  private[graft] def parseAdtsHeader(b: Array[Byte], off: Int, end: Int)
      : Option[(Int, Int, Int, Boolean, Int, Int)] = {
    if (off + 7 > end) return None
    if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xF0) != 0xF0)
      return None
    if ((b(off + 1) & 0x06) != 0) return None // layer must be 00
    val crcPresent = (b(off + 1) & 0x01) == 0 // protection_absent = 0
    if (crcPresent && off + 9 > end) return None // CRC outside bound
    val profile = (b(off + 2) >> 6) & 0x3
    val sfIdx = (b(off + 2) >> 2) & 0xF
    if (sfIdx >= AdtsRates.length) return None
    val channels = ((b(off + 2) & 0x1) << 2) | ((b(off + 3) >> 6) & 0x3)
    if (channels == 0) return None
    val frameLen = ((b(off + 3) & 0x3) << 11) |
      ((b(off + 4) & 0xFF) << 3) | ((b(off + 5) >> 5) & 0x7)
    val headerLen = if (crcPresent) 9 else 7
    if (frameLen < headerLen) return None
    val rdb = b(off + 6) & 0x3 // number_of_raw_data_blocks - 1
    Some((profile, sfIdx, channels, crcPresent, frameLen, rdb))
  }

  /** Whole-stream ADTS walk: frames, samples, duration. */
  private[graft] case class AdtsInfo(sampleRate: Int, channels: Int,
      profile: Int, crc: Boolean, frames: Long, samples: Long) {
    def durationMs: Long = samples * 1000L / sampleRate
  }

  /** Chain every frame to EOF. Refuses: any frame boundary that does
    * not resync, a truncated final frame (the declared stride runs
    * past the bytes), or a profile/rate/channel drift mid-stream (a
    * raw ADTS stream has exactly one configuration; drift means the
    * payload is two concatenated streams or corruption — either way
    * the totals would be a lie).
    */
  private[graft] def parseAdts(b: Array[Byte]): Option[AdtsInfo] = {
    if (b == null || b.length < 7) return None
    var pos = 0
    var first: Option[(Int, Int, Int, Boolean)] = None
    var frames = 0L
    var samples = 0L
    while (pos < b.length) {
      val h = parseAdtsHeader(b, pos).getOrElse(return None)
      val (profile, sfIdx, channels, crc, frameLen, rdb) = h
      first match {
        case None => first = Some((profile, sfIdx, channels, crc))
        case Some(f) =>
          if (f != ((profile, sfIdx, channels, crc))) return None
      }
      if (pos + frameLen > b.length) return None // truncated frame
      frames += 1
      samples += 1024L * (rdb + 1)
      pos += frameLen
    }
    first.map { case (profile, sfIdx, channels, crc) =>
      AdtsInfo(AdtsRates(sfIdx), channels, profile, crc, frames,
        samples)
    }
  }

  /** The path-level stream form of [[parseAdts]]: frames consumed one
    * header at a time off an `InputStream` through the SAME
    * [[parseAdtsHeader]] and the same refusal matrix (truncated final
    * frame, config drift, any invalid header) — residency is one
    * 9-byte header buffer whatever the stream length, so a multi-hour
    * radio rip costs the same memory as a jingle. On any byte array
    * `b`, `parseAdtsStream(new ByteArrayInputStream(b))` equals
    * `parseAdts(b)` (spec-pinned, including dribbling reads).
    */
  private[graft] def parseAdtsStream(
      in: java.io.InputStream): Option[AdtsInfo] = {
    val hdr = new Array[Byte](9)
    def readFullyOrEof(off: Int, n: Int): Int = {
      var got = 0
      var r = 0
      while (got < n && r >= 0) {
        r = in.read(hdr, off + got, n - got)
        if (r > 0) got += r
      }
      got
    }
    def skipFully(n0: Long): Boolean = {
      var left = n0
      while (left > 0L) {
        val s = in.skip(left)
        if (s > 0L) left -= s
        else if (in.read() < 0) return false // truncated mid-frame
        else left -= 1
      }
      true
    }
    var first: Option[(Int, Int, Int, Boolean)] = None
    var frames = 0L
    var samples = 0L
    var eof = false
    while (!eof) {
      val got = readFullyOrEof(0, 7)
      if (got == 0 && frames > 0) eof = true // clean frame boundary
      else if (got < 7) return None // empty stream or torn header
      else {
        // a CRC-protected header is 9 bytes — the buffered walk
        // demands all 9 present, so read the 2 CRC bytes before
        // judging the header (a torn CRC refuses, exactly like a
        // buffer ending inside it)
        val headerLen =
          if ((hdr(1) & 0x01) == 0) {
            if (readFullyOrEof(7, 2) < 2) return None
            9
          } else 7
        val h = parseAdtsHeader(hdr, 0, headerLen)
          .getOrElse(return None)
        val (profile, sfIdx, channels, crc, frameLen, rdb) = h
        first match {
          case None => first = Some((profile, sfIdx, channels, crc))
          case Some(f) =>
            if (f != ((profile, sfIdx, channels, crc))) return None
        }
        if (!skipFully(frameLen - headerLen.toLong)) return None
        frames += 1
        samples += 1024L * (rdb + 1)
      }
    }
    first.map { case (profile, sfIdx, channels, crc) =>
      AdtsInfo(AdtsRates(sfIdx), channels, profile, crc, frames,
        samples)
    }
  }

  /** Output row of [[adtsMetaScan]]. */
  case class AdtsMeta(id: Long, sampleRate: Int, channels: Int,
      profile: String, crc: Boolean, frames: Long, samples: Long,
      durationMs: Long, parsed: Boolean)

  /** Metadata scan over a corpus of raw `.aac` payloads. Unparseable
    * rows are `parsed = false` with zeroed fields, never guessed.
    */
  def adtsMetaScan(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    implicit val enc = Encoders.product[AdtsMeta]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val id = r.getLong(0)
          parseAdts(r.getAs[Array[Byte]](1)) match {
            case Some(a) => AdtsMeta(id, a.sampleRate, a.channels,
              AdtsProfiles(a.profile), a.crc, a.frames, a.samples,
              a.durationMs, parsed = true)
            case None => AdtsMeta(id, 0, 0, "", crc = false, 0L, 0L,
              0L, parsed = false)
          }
        }
    }.toDF().select(col("id"),
      col("sampleRate").cast("long").as("sample_rate"),
      col("channels").cast("long").as("channels"),
      col("profile"), col("crc"), col("frames"), col("samples"),
      col("durationMs").as("duration_ms"), col("parsed"))
  }

  /** Encode twin: a raw ADTS stream of `frames` frames. Each frame
    * carries `payloadPerFrame` deterministic filler bytes after the
    * header (content is irrelevant to the header walk). `rdb` is
    * number_of_raw_data_blocks_in_frame - 1.
    */
  def buildAdts(profile: Int, sfIdx: Int, channels: Int, frames: Int,
      payloadPerFrame: Int = 13, crc: Boolean = false,
      rdb: Int = 0): Array[Byte] = {
    require(profile >= 0 && profile <= 3, "profile 0..3")
    require(sfIdx >= 0 && sfIdx < AdtsRates.length, "bad sf index")
    require(channels >= 1 && channels <= 7, "channels 1..7")
    require(rdb >= 0 && rdb <= 3, "rdb 0..3")
    val headerLen = if (crc) 9 else 7
    val frameLen = headerLen + payloadPerFrame
    require(frameLen < (1 << 13), "frame over the 13-bit length")
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      out.write(0xFF)
      out.write(0xF0 | (if (crc) 0 else 1)) // MPEG-4, layer 00
      out.write((profile << 6) | (sfIdx << 2) | ((channels >> 2) & 1))
      out.write(((channels & 0x3) << 6) | ((frameLen >> 11) & 0x3))
      out.write((frameLen >> 3) & 0xFF)
      out.write(((frameLen & 0x7) << 5) | 0x1F) // fullness high
      out.write(0xFC | rdb) // fullness low + rdb
      if (crc) { out.write(0); out.write(0) } // fixture CRC stub
      var i = 0
      while (i < payloadPerFrame) {
        out.write((f * 31 + i * 7) & 0xFF)
        i += 1
      }
      f += 1
    }
    out.toByteArray
  }

  // ---- MPEG-TS -------------------------------------------------------

  private val TsPacket = 188

  private[graft] def tsVideoCodecName(st: Int): String = st match {
    case 0x01 => "mpeg1"
    case 0x02 => "mpeg2"
    case 0x1B => "h264"
    case 0x24 => "h265"
    case n => f"st_0x$n%02x"
  }

  private[graft] def tsAudioCodecName(st: Int): String = st match {
    case 0x03 | 0x04 => "mp2"
    case 0x0F => "adts_aac"
    case 0x11 => "latm_aac"
    case 0x81 => "ac3"
    case n => f"st_0x$n%02x"
  }

  private def isVideoType(st: Int): Boolean =
    st == 0x01 || st == 0x02 || st == 0x1B || st == 0x24
  private def isAudioType(st: Int): Boolean =
    st == 0x03 || st == 0x04 || st == 0x0F || st == 0x11 || st == 0x81

  /** Parsed transport-stream metadata. `width`/`height`/profile/level
    * come from the contained SPS (never a container claim — TS has
    * none); `audioRate`/`audioChannels` from the contained ADTS
    * header; `durationMs` is the video PES PTS span on the 90 kHz
    * clock (min/max, so B-frame reordering cannot shrink it).
    */
  private[graft] case class TsInfo(packets: Long, programs: Int,
      videoPid: Int, videoStreamType: Int, width: Int, height: Int,
      spsProfile: Int, spsLevel: Int, audioPid: Int,
      audioStreamType: Int, audioRate: Int, audioChannels: Int,
      durationMs: Long)

  /** The ONE per-packet state machine behind both the column walk
    * ([[parseTs]]) and the path-level stream walk ([[parseTsStream]])
    * — the [[Tar.streamTarEntries]] sharing pattern, so the two
    * paths cannot drift. `offer` consumes one 188-byte packet and
    * returns false on any structural violation (the caller refuses);
    * `finish` runs the end-of-walk SPS scan and the contract checks.
    * State is O(1) plus the `maxEsScanBytes`-capped ES buffer,
    * whatever the stream length — a TS is a CHAINED grammar, so
    * unlike ZIP the forward walk loses nothing.
    */
  private final class TsAcc(maxEsScanBytes: Int) {
    private var pmtPid = -1
    // real segments REPEAT PAT/PMT every ~100 ms; repeats must be
    // idempotent, not double-counted
    private val programSet = scala.collection.mutable.HashSet.empty[Int]
    private var videoPid = -1; private var videoType = -1
    private var audioPid = -1; private var audioType = -1
    private var audioRate = 0; private var audioChannels = 0
    private var audioDone = false
    private var minPts = Long.MaxValue; private var maxPts = Long.MinValue
    // PTS is a 33-bit counter on the 90 kHz clock — it wraps every
    // ~26.5 h, inside the multi-hour-recording shape this walk
    // advertises. Unwrap each sample to the 2^33-multiple nearest
    // the PREVIOUS video PTS (phase unwrap): monotone ramps and
    // B-frame jitter get k=0 and are byte-identical to the pre-wrap
    // arithmetic; a genuine wrap (delta near ±2^33) continues the
    // timeline instead of exploding the span. A discontinuity-tagged
    // hard reset is indistinguishable from a wrap at this layer and
    // is carried as one — the span stays physical either way.
    private var lastVideoPtsAdj = Long.MinValue
    private val vEs = new java.io.ByteArrayOutputStream()

    // one PSI section out of one packet's payload (pointer_field
    // first on PUSI). Multi-packet sections refuse.
    private def section(p: Array[Byte], off: Int, end: Int,
        tableId: Int): Option[(Int, Int)] = {
      if (off >= end) return None
      val ptr = p(off) & 0xFF
      val s = off + 1 + ptr
      if (s + 3 > end) return None
      if ((p(s) & 0xFF) != tableId) return None
      if ((p(s + 1) & 0x80) == 0) return None // syntax indicator
      val secLen = ((p(s + 1) & 0x0F) << 8) | (p(s + 2) & 0xFF)
      val secEnd = s + 3 + secLen
      if (secEnd > end) return None // section spans packets: refuse
      if (crc32Mpeg(p, s, 3 + secLen) != 0) return None // CRC check
      Some((s, secEnd))
    }

    /** One packet at `b(o until o+188)`; false = refuse the stream. */
    def offer(b: Array[Byte], o: Int): Boolean = {
      if ((b(o) & 0xFF) != 0x47) return false // lost sync
      if ((b(o + 1) & 0x80) != 0) return false // transport error bit
      val pusi = (b(o + 1) & 0x40) != 0
      val pid = ((b(o + 1) & 0x1F) << 8) | (b(o + 2) & 0xFF)
      if ((b(o + 3) & 0xC0) != 0) return false // scrambled: refuse
      val afc = (b(o + 3) >> 4) & 0x3
      if (afc == 0) return false // reserved adaptation_field_control
      var pOff = o + 4
      if (afc >= 2) { // adaptation field present
        val afLen = b(pOff) & 0xFF
        val maxAf = if (afc == 3) 182 else 183
        if (afLen > maxAf) return false // lying adaptation length
        pOff += 1 + afLen
      }
      val pEnd = o + TsPacket
      if (afc == 1 || afc == 3) { // payload present
        if (pid == 0x0000 && pusi) { // PAT
          val (s, secEnd) = section(b, pOff, pEnd, 0x00)
            .getOrElse(return false)
          var q = s + 8
          while (q + 4 <= secEnd - 4) { // entries before the CRC
            val prog = ((b(q) & 0xFF) << 8) | (b(q + 1) & 0xFF)
            val p13 = ((b(q + 2) & 0x1F) << 8) | (b(q + 3) & 0xFF)
            if (prog != 0) { programSet += prog; pmtPid = p13 }
            q += 4
          }
          // stray bytes between the last entry and the CRC are a
          // lying section_length, not padding
          if (q != secEnd - 4) return false
          if (pmtPid < 0) return false // a PAT with no program
          // multi-program: pmtPid is single-valued, so parsing on
          // would report one arbitrary program's streams under a
          // programs=N banner — refuse whole, like multi-packet
          // sections (repeats of the SAME program are idempotent)
          if (programSet.size > 1) return false
        } else if (pid == pmtPid && pusi) { // PMT
          val (s, secEnd) = section(b, pOff, pEnd, 0x02)
            .getOrElse(return false)
          val progInfoLen = ((b(s + 10) & 0x0F) << 8) |
            (b(s + 11) & 0xFF)
          var q = s + 12 + progInfoLen
          if (q > secEnd - 4) return false // program info overruns
          while (q + 5 <= secEnd - 4) {
            val st = b(q) & 0xFF
            val epid = ((b(q + 1) & 0x1F) << 8) | (b(q + 2) & 0xFF)
            val esLen = ((b(q + 3) & 0x0F) << 8) | (b(q + 4) & 0xFF)
            if (isVideoType(st) && videoPid < 0) {
              videoPid = epid; videoType = st
            } else if (isAudioType(st) && audioPid < 0) {
              audioPid = epid; audioType = st
            }
            q += 5 + esLen
          }
          // a stream's ES_info_length overrunning the CRC, or stray
          // bytes before it, are a malformed table — refuse
          if (q != secEnd - 4) return false
        } else if (pid == videoPid || pid == audioPid) {
          var es = pOff
          if (pusi) {
            // PES header: 00 00 01 stream_id len(2) '10'xx flags hdrLen
            if (pOff + 9 > pEnd) return false
            if (b(pOff) != 0 || b(pOff + 1) != 0 || b(pOff + 2) != 1)
              return false
            if ((b(pOff + 6) & 0xC0) != 0x80) return false
            val flags = b(pOff + 7) & 0xFF
            val hdrLen = b(pOff + 8) & 0xFF
            es = pOff + 9 + hdrLen
            if (es > pEnd) return false
            // a declared PTS needs 5 header-data bytes (10 with DTS);
            // a shorter hdrLen would read leading ES bytes as the
            // timestamp AND append them to vEs — refuse the lie
            if ((flags & 0x80) != 0 && hdrLen < 5) return false
            if ((flags & 0xC0) == 0xC0 && hdrLen < 10) return false
            if ((flags & 0x80) != 0) { // PTS present
              if (pOff + 14 > pEnd) return false
              val p0 = b(pOff + 9) & 0xFF
              if ((p0 & 0xF0) != 0x20 && (p0 & 0xF0) != 0x30)
                return false // prefix nibble must be 0010/0011
              val pts = (((p0 >> 1) & 0x7).toLong << 30) |
                ((b(pOff + 10) & 0xFF).toLong << 22) |
                (((b(pOff + 11) & 0xFF) >> 1).toLong << 15) |
                ((b(pOff + 12) & 0xFF).toLong << 7) |
                ((b(pOff + 13) & 0xFF) >> 1).toLong
              if (pid == videoPid) {
                val wrap = 1L << 33
                val adj =
                  if (lastVideoPtsAdj == Long.MinValue) pts
                  else pts + java.lang.Math.floorDiv(
                    lastVideoPtsAdj - pts + wrap / 2, wrap) * wrap
                lastVideoPtsAdj = adj
                if (adj < minPts) minPts = adj
                if (adj > maxPts) maxPts = adj
              }
            }
          }
          if (pid == videoPid && vEs.size() < maxEsScanBytes &&
            es < pEnd)
            vEs.write(b, es, pEnd - es)
          if (pid == audioPid && !audioDone && pusi && es < pEnd &&
            audioType == 0x0F)
            // bound the header read at THIS packet's end — see the
            // parseAdtsHeader(b, off, end) doc for why the whole-array
            // bound would desync the column and stream walks
            parseAdtsHeader(b, es, pEnd).foreach {
              case (_, sfIdx, ch, _, _, _) =>
                audioRate = AdtsRates(sfIdx); audioChannels = ch
                audioDone = true
            }
        }
        // other PIDs (null packets 0x1FFF, unreferenced): skipped
      }
      true
    }

    /** Close the walk: table presence, the one Annex-B SPS pass over
      * the capped ES buffer (done after the walk so a NAL split
      * across packets is whole before it is judged; at end-of-stream
      * a tail NAL IS complete, so a truncated one refuses honestly —
      * O(cap), not O(cap x packets)), and the SPS-evidence contract.
      */
    def finish(nPackets: Long): Option[TsInfo] = {
      if (pmtPid < 0 || programSet.isEmpty) return None // no PAT seen
      if (videoPid < 0 && audioPid < 0) return None // PMT had no stream
      var width = 0; var height = 0
      var spsProfile = 0; var spsLevel = 0
      var spsDone = false
      if (videoType == 0x1B || videoType == 0x24) {
        val es = vEs.toByteArray
        var i = 0
        while (!spsDone && i + 4 < es.length) {
          if (es(i) == 0 && es(i + 1) == 0 && es(i + 2) == 1) {
            val nalStart = i + 3
            var j = nalStart
            var nalEnd = es.length
            var found = false
            while (!found && j + 3 <= es.length) {
              if (es(j) == 0 && es(j + 1) == 0 &&
                (es(j + 2) == 1 || (j + 4 <= es.length &&
                  es(j + 2) == 0 && es(j + 3) == 1))) {
                nalEnd = j; found = true
              } else j += 1
            }
            val nal = java.util.Arrays.copyOfRange(es, nalStart, nalEnd)
            val isSps =
              if (videoType == 0x1B)
                nal.length > 0 && (nal(0) & 0x1F) == 7
              else nal.length > 0 && ((nal(0) >> 1) & 0x3F) == 33
            if (isSps) {
              if (videoType == 0x1B) Mp4.parseSps(nal) match {
                case Right((p, l, w, h)) =>
                  spsProfile = p; spsLevel = l; width = w; height = h
                  spsDone = true
                case Left(_) => return None // a lying SPS refuses
              } else Mp4.parseHevcSps(nal) match {
                case Right((p, _, l, w, h)) =>
                  spsProfile = p; spsLevel = l; width = w; height = h
                  spsDone = true
                case Left(_) => return None
              }
            }
            i = math.max(nalEnd, i + 1)
          } else i += 1
        }
        // declared H.264/H.265 video MUST yield a decoded SPS — dims
        // are this scan's contract; a guess would poison every filter
        if (!spsDone) return None
      }
      val dur =
        if (minPts == Long.MaxValue) 0L else (maxPts - minPts) / 90L
      Some(TsInfo(nPackets, programSet.size, videoPid, videoType,
        width, height, spsProfile, spsLevel, audioPid, audioType,
        audioRate, audioChannels, dur))
    }
  }

  /** Single forward pass over a column-held packet run. Unsupported-
    * but-valid shapes refuse rather than guess: multi-packet PSI
    * sections, scrambled PIDs, and streams whose declared
    * H.264/H.265 video never yields a parseable SPS within
    * `maxEsScanBytes` all return `None` — this scan's contract is
    * "fields a decoder would obey", so absent evidence is a refusal,
    * not a zero.
    */
  private[graft] def parseTs(b: Array[Byte],
      maxEsScanBytes: Int = 1 << 18): Option[TsInfo] = {
    if (b == null || b.length < TsPacket) return None
    if (b.length % TsPacket != 0) return None // truncated packet run
    val acc = new TsAcc(maxEsScanBytes)
    var o = 0
    while (o < b.length) {
      if (!acc.offer(b, o)) return None
      o += TsPacket
    }
    acc.finish((b.length / TsPacket).toLong)
  }

  /** The path-level stream form: packets consumed one at a time off
    * an `InputStream` through the SAME [[TsAcc]] state machine as
    * [[parseTs]] — residency is one packet plus the capped ES
    * buffer, whatever the capture length. A partial tail packet
    * refuses exactly like a non-multiple-of-188 column value.
    */
  private[graft] def parseTsStream(in: java.io.InputStream,
      maxEsScanBytes: Int = 1 << 18): Option[TsInfo] = {
    val acc = new TsAcc(maxEsScanBytes)
    val pkt = new Array[Byte](TsPacket)
    var n = 0L
    var eof = false
    while (!eof) {
      var got = 0
      var r = 0
      while (got < TsPacket && r >= 0) {
        r = in.read(pkt, got, TsPacket - got)
        if (r > 0) got += r
      }
      if (got == 0) eof = true
      else if (got < TsPacket) return None // truncated tail packet
      else {
        if (!acc.offer(pkt, 0)) return None
        n += 1
      }
    }
    if (n == 0) return None // empty stream is no transport stream
    acc.finish(n)
  }

  /** Output row of [[tsMetaScan]]. */
  case class MpegTsMeta(id: Long, packets: Long, programs: Int,
      videoCodec: String, width: Int, height: Int, spsProfile: Int,
      spsLevel: Int, audioCodec: String, audioRate: Int,
      audioChannels: Int, durationMs: Long, parsed: Boolean)

  /** Metadata scan over a corpus of `.ts` segment payloads. */
  def tsMetaScan(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    implicit val enc = Encoders.product[MpegTsMeta]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val id = r.getLong(0)
          parseTs(r.getAs[Array[Byte]](1)) match {
            case Some(t) => MpegTsMeta(id, t.packets, t.programs,
              if (t.videoPid >= 0) tsVideoCodecName(t.videoStreamType) else "",
              t.width, t.height, t.spsProfile, t.spsLevel,
              if (t.audioPid >= 0) tsAudioCodecName(t.audioStreamType) else "",
              t.audioRate, t.audioChannels, t.durationMs,
              parsed = true)
            case None => MpegTsMeta(id, 0L, 0, "", 0, 0, 0, 0, "", 0,
              0, 0L, parsed = false)
          }
        }
    }.toDF().select(col("id"), col("packets"),
      col("programs").cast("long").as("programs"),
      col("videoCodec").as("video_codec"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      col("spsProfile").cast("long").as("sps_profile"),
      col("spsLevel").cast("long").as("sps_level"),
      col("audioCodec").as("audio_codec"),
      col("audioRate").cast("long").as("audio_rate"),
      col("audioChannels").cast("long").as("audio_channels"),
      col("durationMs").as("duration_ms"), col("parsed"))
  }

  // ---- TS encoder (round-trip twin; the fixture/smoke builder) ------

  private final class TsWriter(out: java.io.OutputStream) {
    private val cc = scala.collection.mutable.Map[Int, Int]()
    /** One packet: header + (stuffing adaptation field) + payload. */
    def packet(pid: Int, pusi: Boolean, payload: Array[Byte],
        from: Int, len: Int): Unit = {
      require(len >= 1 && len <= 184, s"payload $len")
      val c = cc.getOrElse(pid, 0)
      out.write(0x47)
      out.write((if (pusi) 0x40 else 0x00) | ((pid >> 8) & 0x1F))
      out.write(pid & 0xFF)
      val stuffing = 184 - len
      if (stuffing == 0) {
        out.write(0x10 | c) // payload only
      } else {
        out.write(0x30 | c) // adaptation + payload
        out.write(stuffing - 1) // adaptation_field_length
        if (stuffing >= 2) {
          out.write(0x00) // flags
          var i = 0
          while (i < stuffing - 2) { out.write(0xFF); i += 1 }
        }
      }
      out.write(payload, from, len)
      cc(pid) = (c + 1) & 0xF
    }
    /** Split one PES packet (or section payload) across packets. */
    def pes(pid: Int, bytes: Array[Byte]): Unit = {
      var off = 0
      var first = true
      while (off < bytes.length) {
        val n = math.min(184, bytes.length - off)
        packet(pid, first, bytes, off, n)
        first = false
        off += n
      }
    }
  }

  private def psiSection(tableId: Int, idExt: Int,
      body: Array[Byte]): Array[Byte] = {
    val secLen = 5 + body.length + 4 // after-length bytes + CRC
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0x00) // pointer_field
    bos.write(tableId)
    bos.write(0xB0 | ((secLen >> 8) & 0x0F))
    bos.write(secLen & 0xFF)
    bos.write((idExt >> 8) & 0xFF); bos.write(idExt & 0xFF)
    bos.write(0xC1) // version 0, current_next 1
    bos.write(0x00); bos.write(0x00) // section 0, last 0
    bos.write(body, 0, body.length)
    val arr = bos.toByteArray
    val crc = crc32Mpeg(arr, 1, arr.length - 1) // pointer excluded
    bos.write((crc >>> 24) & 0xFF); bos.write((crc >>> 16) & 0xFF)
    bos.write((crc >>> 8) & 0xFF); bos.write(crc & 0xFF)
    bos.toByteArray
  }

  private def pesPacket(streamId: Int, pts: Long,
      es: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(0); bos.write(1); bos.write(streamId)
    val bodyLen = 3 + 5 + es.length // flags2/flags/hdrLen + PTS + ES
    val lenField = // video may use the 0 "unbounded" form
      if (streamId >= 0xE0 && streamId <= 0xEF) 0 else bodyLen
    bos.write((lenField >> 8) & 0xFF); bos.write(lenField & 0xFF)
    bos.write(0x80) // '10' + no scrambling/priority/flags
    bos.write(0x80) // PTS only
    bos.write(5) // header data length
    bos.write(0x21 | (((pts >> 30) & 0x7) << 1).toInt)
    bos.write(((pts >> 22) & 0xFF).toInt)
    bos.write((0x01 | (((pts >> 15) & 0x7F) << 1)).toInt)
    bos.write(((pts >> 7) & 0xFF).toInt)
    bos.write((0x01 | ((pts & 0x7F) << 1)).toInt)
    bos.write(es, 0, es.length)
    bos.toByteArray
  }

  /** Build a single-program TS: PAT, PMT (video stream + optional
    * ADTS audio), `videoPts.length` video PES packets (the FIRST
    * carries an Annex-B SPS from [[Mp4.buildSps]] / the HEVC twin,
    * so the scan's dims are decoder-real), one audio PES with real
    * ADTS frames. `h265` flips the video arm to stream_type 0x24.
    */
  def buildTs(spsWidth: Int, spsHeight: Int, profileIdc: Int,
      levelIdc: Int, videoPts: Seq[Long],
      adts: Option[Array[Byte]] = None, h265: Boolean = false,
      tsId: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeTs(out, spsWidth, spsHeight, profileIdc, levelIdc,
      videoPts.iterator, adts, h265, tsId)
    out.toByteArray
  }

  /** [[buildTs]] streamed to an `OutputStream`, PES by PES — the
    * multi-GiB smoke form: the writer holds one PES packet, never
    * the capture, so a synthetic multi-hour recording streams to
    * disk the way the path-level source later reads it back.
    * `videoPts` is an iterator so a billion-tick PTS run never
    * materializes either. Byte-identical to [[buildTs]] on the same
    * arguments (it IS buildTs's body).
    */
  def writeTs(out: java.io.OutputStream, spsWidth: Int, spsHeight: Int,
      profileIdc: Int, levelIdc: Int, videoPts: Iterator[Long],
      adts: Option[Array[Byte]] = None, h265: Boolean = false,
      tsId: Int = 1): Unit = {
    val vPid = 0x100; val aPid = 0x101; val pmtPid = 0x1000
    val w = new TsWriter(out)
    // PAT: program 1 -> pmtPid
    w.pes(0x0000, psiSection(0x00, tsId, Array[Byte](
      0x00, 0x01, (0xE0 | (pmtPid >> 8)).toByte, (pmtPid & 0xFF).toByte)))
    // PMT: PCR = vPid; streams
    val pmtBody = new java.io.ByteArrayOutputStream()
    pmtBody.write(0xE0 | (vPid >> 8)); pmtBody.write(vPid & 0xFF)
    pmtBody.write(0xF0); pmtBody.write(0x00) // program_info_length 0
    pmtBody.write(if (h265) 0x24 else 0x1B)
    pmtBody.write(0xE0 | (vPid >> 8)); pmtBody.write(vPid & 0xFF)
    pmtBody.write(0xF0); pmtBody.write(0x00)
    adts.foreach { _ =>
      pmtBody.write(0x0F)
      pmtBody.write(0xE0 | (aPid >> 8)); pmtBody.write(aPid & 0xFF)
      pmtBody.write(0xF0); pmtBody.write(0x00)
    }
    w.pes(pmtPid, psiSection(0x02, 1, pmtBody.toByteArray))
    // video PES run: SPS rides the first access unit
    val sps =
      if (h265) Mp4.buildHevcSps(spsWidth, spsHeight, profileIdc,
        tier = 0, levelIdc = levelIdc)
      else Mp4.buildSps(spsWidth, spsHeight, profileIdc, levelIdc)
    var k = 0
    var firstPts = 0L
    while (videoPts.hasNext) {
      val pts = videoPts.next()
      if (k == 0) firstPts = pts
      val es = new java.io.ByteArrayOutputStream()
      if (k == 0) {
        es.write(0); es.write(0); es.write(0); es.write(1)
        es.write(sps, 0, sps.length)
      }
      es.write(0); es.write(0); es.write(1)
      es.write(if (h265) (19 << 1) else 0x65) // IDR-ish NAL header
      var i = 0
      while (i < 16) { es.write((k * 29 + i * 11 + 1) & 0xFF); i += 1 }
      w.pes(vPid, pesPacket(0xE0, pts, es.toByteArray))
      k += 1
    }
    require(k > 0, "at least one video PES")
    adts.foreach { a => w.pes(aPid, pesPacket(0xC0, firstPts, a)) }
  }
}
