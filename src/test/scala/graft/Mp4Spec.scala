package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Mp4

/** MP4 / ISO-BMFF container metadata: box-grammar walk (32- and
  * 64-bit sizes, version 0/1 time fields), faststart prefix parses,
  * and the honesty matrix (garbage, truncation, overrunning children,
  * insane fields). Every MP4 here is REAL bytes — the library
  * encoder's output or hand-corrupted variants of it.
  */
class Mp4Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.toDF("id", "content")
  }

  /** First byte offset of a 4CC in raw bytes (corruption helper). */
  private def indexOfTag(b: Array[Byte], t: String): Int = {
    val pat = t.getBytes("US-ASCII")
    (0 to b.length - 4).find(i =>
      pat.indices.forall(j => b(i + j) == pat(j))).get
  }

  test("round trip: encoder fields come back exactly (brand, " +
      "timescale, floor-millis duration, tracks, codec fourcc, " +
      "sample-entry dims, stsz frame count, audio shape)") {
    val bytes = Mp4.buildMp4(timescale = 600, duration = 1501,
      width = 320, height = 240, videoCodec = "avc1", nFrames = 60,
      audioCodec = "mp4a", audioChannels = 2, audioRate = 44100)
    val m = Mp4.parseMp4Header(df((1L, bytes)), "id", "content")
      .collect().head
    assert(m.parsed)
    assert(m.majorBrand == "isom" && m.timescale == 600L &&
      m.duration == 1501L)
    assert(m.durationMs == 1501L * 1000L / 600L) // floor millis = 2501
    assert(m.tracks == 2)
    assert(m.videoCodec == "avc1" && m.width == 320 && m.height == 240)
    assert(m.videoFrames == 60L)
    assert(m.audioCodec == "mp4a" && m.audioChannels == 2 &&
      m.audioRate == 44100)
  }

  test("64-bit form: version-1 mvhd/tkhd/mdhd (64-bit times) and a " +
      "largesize mdat parse to the same metadata as the 32-bit form") {
    val a = Mp4.buildMp4(600, 3000, 64, 48, nFrames = 120,
      use64Bit = false)
    val b = Mp4.buildMp4(600, 3000, 64, 48, nFrames = 120,
      use64Bit = true)
    val rows = Mp4.parseMp4Header(df((1L, a), (2L, b)), "id", "content")
      .collect().map(m => m.id -> m).toMap
    assert(rows(1L).parsed && rows(2L).parsed)
    assert((rows(1L).timescale, rows(1L).duration, rows(1L).width,
      rows(1L).height, rows(1L).videoFrames, rows(1L).durationMs) ==
      (rows(2L).timescale, rows(2L).duration, rows(2L).width,
        rows(2L).height, rows(2L).videoFrames, rows(2L).durationMs))
    // a duration only a 64-bit field can carry
    val big = Mp4.buildMp4(90000, 6_000_000_000L, 64, 48,
      use64Bit = true)
    val mBig = Mp4.parseMp4Header(df((1L, big)), "id", "content")
      .collect().head
    assert(mBig.parsed && mBig.duration == 6_000_000_000L)
    assert(mBig.durationMs == 6_000_000_000L * 1000L / 90000L)
  }

  test("prefix path: faststart (moov-first) files parse from a " +
      "prefix that covers the moov; a moov beyond the prefix is " +
      "parsed=false, never fabricated fields") {
    val bytes = Mp4.buildMp4(1000, 2500, 128, 96, nFrames = 75,
      mdatBytes = 4096)
    val moovEnd = {
      val at = indexOfTag(bytes, "moov") - 4
      at + (((bytes(at) & 0xFF) << 24) | ((bytes(at + 1) & 0xFF) << 16) |
        ((bytes(at + 2) & 0xFF) << 8) | (bytes(at + 3) & 0xFF))
    }
    assert(moovEnd < bytes.length - 4000, "fixture: mdat is the bulk")
    val full = Mp4.parseMp4Header(df((1L, bytes)), "id", "content")
      .collect().head
    val pref = Mp4.parseMp4HeaderPrefix(df((1L, bytes)), "id",
      "content", prefixBytes = moovEnd + 8).collect().head
    assert(pref.parsed)
    assert((pref.majorBrand, pref.timescale, pref.duration,
      pref.durationMs, pref.tracks, pref.videoCodec, pref.width,
      pref.height, pref.videoFrames) ==
      (full.majorBrand, full.timescale, full.duration, full.durationMs,
        full.tracks, full.videoCodec, full.width, full.height,
        full.videoFrames))
    // prefix ending INSIDE the moov: honest failure
    val short = Mp4.parseMp4HeaderPrefix(df((1L, bytes)), "id",
      "content", prefixBytes = moovEnd - 64).collect().head
    assert(!short.parsed && short.timescale == 0L && short.width == 0)
    // mdat-first layout with the moov wholly beyond the prefix
    val ftypEnd = 24 // built ftyp is 24 bytes
    val moovAt = indexOfTag(bytes, "moov") - 4
    val mdatFirst = bytes.slice(0, ftypEnd) ++
      bytes.slice(moovEnd, bytes.length) ++ bytes.slice(moovAt, moovEnd)
    assert(Mp4.parseMp4Header(df((1L, mdatFirst)), "id", "content")
      .collect().head.parsed, "fixture: mdat-first must parse in full")
    assert(!Mp4.parseMp4HeaderPrefix(df((1L, mdatFirst)), "id",
      "content", prefixBytes = 256).collect().head.parsed)
  }

  test("honesty matrix: garbage, non-ftyp lead, truncated moov, a " +
      "child box overrunning its parent, zero timescale, and insane " +
      "dimensions are parsed=false") {
    val good = Mp4.buildMp4(600, 1200, 32, 24, nFrames = 48)
    val garbage = Array.tabulate[Byte](256)(i => (i * 37).toByte)
    val noFtyp = good.clone()
    "free".getBytes("US-ASCII").copyToArray(noFtyp, 4)
    val truncated = java.util.Arrays.copyOf(good,
      indexOfTag(good, "stsd") + 6)
    // child overruns parent: blow up the mvhd's declared size
    val overrun = good.clone()
    val mvhdAt = indexOfTag(good, "mvhd") - 4
    overrun(mvhdAt) = 0x7F.toByte
    // zero timescale
    val zeroTs = good.clone()
    val tsAt = indexOfTag(good, "mvhd") + 4 + 12
    (tsAt until tsAt + 4).foreach(i => zeroTs(i) = 0)
    // insane dims: stsd width u16 is at entry+32; 0 width with
    // nonzero height violates dimsSane
    // the sample entry starts at its size field (4 before the 4CC);
    // width u16 sits at entry offset +32
    val badDims = good.clone()
    val avc1At = indexOfTag(good, "avc1") - 4
    badDims(avc1At + 32) = 0
    badDims(avc1At + 33) = 0
    val rows = Mp4.parseMp4Header(
      df((1L, garbage), (2L, noFtyp), (3L, truncated), (4L, overrun),
        (5L, zeroTs), (6L, badDims), (7L, good)),
      "id", "content").collect().map(m => m.id -> m.parsed).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> true), rows.toString)
  }

  test("persisted prefix columns: parseMp4HeaderPrefixCols over a " +
      "narrow prefix + true length equals the full parse for " +
      "faststart files (the storage form of the metadata filter)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, substring}
    val bytes = Mp4.buildMp4(1000, 2500, 128, 96, nFrames = 75,
      mdatBytes = 4096)
    val src = Seq((1L, bytes)).toDF("id", "content")
      .select(col("id"), substring(col("content"), 1, 1024).as("pfx"),
        length(col("content")).cast("long").as("len"))
    val m = Mp4.parseMp4HeaderPrefixCols(src, "id", "pfx", "len")
      .collect().head
    val full = Mp4.parseMp4Header(Seq((1L, bytes)).toDF("id", "content"),
      "id", "content").collect().head
    assert(m.parsed && m == full)
  }

  test("audio-only MP4 (M4A): no video trak — empty video codec, " +
      "zero dims/frames, the audio shape intact") {
    val bytes = Mp4.buildMp4(timescale = 44100, duration = 441000,
      width = 0, height = 0, videoCodec = "", audioCodec = "mp4a",
      audioChannels = 2, audioRate = 44100)
    val m = Mp4.parseMp4Header(df((1L, bytes)), "id", "content")
      .collect().head
    assert(m.parsed && m.tracks == 1)
    assert(m.videoCodec == "" && m.width == 0 && m.height == 0 &&
      m.videoFrames == 0L)
    assert(m.audioCodec == "mp4a" && m.audioChannels == 2 &&
      m.audioRate == 44100)
    assert(m.durationMs == 10000L)
  }

  test("fragmented MP4 honesty: unknown top-level boxes (moof/mfra) " +
      "are skipped by size and the reported duration is the mvhd's " +
      "DECLARED one — zero for fMP4, never fabricated from fragments") {
    val base = Mp4.buildMp4(timescale = 90000, duration = 0, width = 64,
      height = 48, nFrames = 0, mdatBytes = 32)
    // append a fake moof + mfra after the mdat (opaque payloads —
    // this library does not walk fragment boxes)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(base, 0, base.length)
    def box(typ: String, payload: Int): Unit = {
      val sz = 8 + payload
      bos.write((sz >> 24) & 0xFF); bos.write((sz >> 16) & 0xFF)
      bos.write((sz >> 8) & 0xFF); bos.write(sz & 0xFF)
      bos.write(typ.getBytes("US-ASCII"))
      (0 until payload).foreach(i => bos.write(i & 0xFF))
    }
    box("moof", 120); box("mdat", 256); box("mfra", 40)
    val m = Mp4.parseMp4Header(df((1L, bos.toByteArray)), "id",
      "content").collect().head
    assert(m.parsed, "fragmented layout must still parse the moov")
    assert(m.duration == 0L && m.durationMs == 0L,
      "duration must be the DECLARED zero, not invented from moofs")
    assert(m.videoCodec == "avc1" && m.width == 64 && m.height == 48)
  }

  test("hostile version-1 mvhd duration above Long.MaxValue/1000 " +
      "refuses (parsed=false) instead of overflowing duration_ms " +
      "negative") {
    val ok = Long.MaxValue / 1000L        // largest honest value
    val hostile = Long.MaxValue / 1000L + 1L
    val rows = Mp4.parseMp4Header(
      df((1L, Mp4.buildMp4(1L, hostile, 16, 16, use64Bit = true)),
        (2L, Mp4.buildMp4(1L, ok, 16, 16, use64Bit = true))),
      "id", "content").collect().map(m => m.id -> m).toMap
    assert(!rows(1L).parsed,
      s"overflowing duration must refuse: ${rows(1L)}")
    assert(rows(2L).parsed && rows(2L).durationMs == ok * 1000L &&
      rows(2L).durationMs > 0L, rows(2L).toString)
  }

  test("mp4MetaScan projection: one row per payload, the columns the " +
      "100 TB metadata filter reads, prefix routing on") {
    val rows = Mp4.mp4MetaScan(
      df((1L, Mp4.buildMp4(600, 600, 16, 16, nFrames = 24,
        mdatBytes = 2048)),
        (2L, Array[Byte](1, 2, 3))),
      "id", "content", prefixBytes = 1024).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(13) && !rows(2L).getBoolean(13))
    assert(rows(1L).getString(1) == "isom")
    assert(rows(1L).getLong(4) == 1000L) // duration_ms
    assert(rows(1L).getString(6) == "avc1")
  }

  // ---- soundtrack extraction (the ISO-BMFF side of the bridge) ------

  test("MP4 soundtrack round trip: sowt/twos/lpcm(LE+BE)/raw sample " +
      "entries extract to canonical WAVs whose decoded samples equal " +
      "the planted stream exactly — byte order normalized, 8-bit " +
      "scaled by the published (b-128)<<8") {
    import graft.operators.{Audio, Video}
    val s16 = Array.tabulate(500)(k => ((k * 371 + 17) % 65536) - 32768)
    val s8 = Array.tabulate(300)(k => (k * 37 + 5) % 256)
    val fixtures = Seq(
      1L -> Mp4.buildMp4Pcm(600L, 500L, "sowt", 1, 8000, s16,
        Seq(200, 150, 150)),
      2L -> Mp4.buildMp4Pcm(600L, 500L, "twos", 1, 8000, s16, Seq(500)),
      3L -> Mp4.buildMp4Pcm(600L, 500L, "lpcm", 1, 8000, s16,
        Seq(100, 400), perSampleStsz = true),
      4L -> Mp4.buildMp4Pcm(600L, 500L, "lpcm", 1, 8000, s16,
        Seq(250, 250), gapBytes = 16, use64BitOffsets = true,
        lpcmBigEndian = true),
      5L -> Mp4.buildMp4Pcm(600L, 300L, "raw ", 1, 8000, s8, Seq(300)))
    val tracks = Video.extractAudioTracks(df(fixtures: _*), "id",
      "content").collect().map(t => t.id -> t).toMap
    fixtures.foreach { case (id, _) =>
      val t = tracks(id)
      assert(t.decoded && t.format == 1 && t.channels == 1 &&
        t.sampleRate == 8000, s"$id: $t")
      assert(t.bitsPerSample == (if (id == 5L) 8 else 16), s"$id: $t")
    }
    val wavs = fixtures.map { case (id, _) => id -> tracks(id).wav }
    val dec = Audio.decodePcm16(df(wavs: _*), "id", "content")
      .collect().map(d => d.id -> d).toMap
    (1L to 4L).foreach { id =>
      assert(dec(id).decoded && dec(id).samples.toSeq == s16.toSeq,
        s"$id decoded samples differ")
    }
    assert(dec(5L).samples.toSeq == s8.map(b => (b - 128) << 8).toSeq)
  }

  test("MP4 soundtrack layout invariance: multi-chunk with gaps, " +
      "co64, per-sample stsz, and a leading video track all extract " +
      "byte-identical WAVs to the single-chunk baseline; stereo " +
      "mixes down by the audio family's floorDiv") {
    import graft.operators.{Audio, Video}
    val s16 = Array.tabulate(400)(k => ((k * 907 + 3) % 65536) - 32768)
    val base = Mp4.buildMp4Pcm(600L, 400L, "sowt", 1, 8000, s16,
      Seq(400))
    val fancy = Mp4.buildMp4Pcm(600L, 400L, "sowt", 1, 8000, s16,
      Seq(64, 64, 128, 144), gapBytes = 9, use64BitOffsets = true,
      perSampleStsz = true, withVideoTrack = true)
    val w = Video.extractAudioTracks(df(1L -> base, 2L -> fancy),
      "id", "content").collect().map(t => t.id -> t.wav).toMap
    assert(java.util.Arrays.equals(w(1L), w(2L)),
      "layout must not change the extracted WAV bytes")
    // stereo: interleaved L/R decodes to floorDiv(L+R, 2)
    val st = Array.tabulate(300)(k => ((k * 119 + 7) % 65536) - 32768)
    val mp4 = Mp4.buildMp4Pcm(600L, 150L, "twos", 2, 16000, st,
      Seq(100, 50))
    val tr = Video.extractAudioTracks(df(1L -> mp4), "id", "content")
      .collect().head
    assert(tr.decoded && tr.channels == 2 && tr.sampleRate == 16000)
    val d = Audio.decodePcm16(df(1L -> tr.wav), "id", "content")
      .collect().head
    val want = (0 until 150).map(f =>
      math.floorDiv(st(2 * f) + st(2 * f + 1), 2))
    assert(d.samples.toSeq == want, "stereo mixdown mismatch")
  }

  test("MP4 soundtrack honesty: compressed codecs, hostile chunk " +
      "offsets, and over-cap tracks refuse (decoded=false) — never " +
      "truncated or fabricated samples") {
    import graft.operators.Video
    val s16 = Array.tabulate(200)(k => (k * 13) % 100 - 50)
    // mp4a (declared-only AAC) through the metadata builder
    val aac = Mp4.buildMp4(600L, 600L, 16, 16, audioCodec = "mp4a",
      audioChannels = 2, audioRate = 44100)
    // hostile stco: point the first chunk past EOF
    val hostile = Mp4.buildMp4Pcm(600L, 200L, "sowt", 1, 8000, s16,
      Seq(200))
    val stco = indexOfTag(hostile, "stco")
    val off = stco + 12 // size+type, version+flags, count
    hostile(off) = 0x7F.toByte; hostile(off + 1) = 0xFF.toByte
    hostile(off + 2) = 0xFF.toByte; hostile(off + 3) = 0.toByte
    // over-cap: 400 bytes of samples against a 100-byte cap
    val big = Mp4.buildMp4Pcm(600L, 200L, "sowt", 1, 8000, s16,
      Seq(200))
    val rows = Video.extractAudioTracks(
      df(1L -> aac, 2L -> hostile, 3L -> "garbage".getBytes("UTF-8")),
      "id", "content").collect().map(t => t.id -> t.decoded).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false), rows)
    val capped = Video.extractAudioTracks(df(1L -> big), "id",
      "content", maxAudioBytes = 100).collect().head
    assert(!capped.decoded && capped.wav.isEmpty,
      "over-cap must refuse entirely, never truncate")
  }

  test("H.264 SPS: profile/level and crop-derived dims parse from " +
      "the avcC config; a lying stsd is DETECTED, not believed; " +
      "baseline and FRExt profiles; emulation-prevention bytes " +
      "round-trip") {
    import org.apache.spark.sql.functions.col
    def mp4(stsdW: Int, stsdH: Int, spsW: Int, spsH: Int,
        profile: Int, level: Int) =
      Mp4.buildMp4(timescale = 600L, duration = 1200L,
        width = stsdW, height = stsdH,
        videoExtra = Mp4.buildAvcC(Mp4.buildSps(spsW, spsH, profile,
          level)))
    val rows = Mp4.h264SpsScan(df(
        1L -> mp4(1920, 1080, 1920, 1080, 66, 40),  // honest, cropB=4
        2L -> mp4(1280, 720, 1280, 720, 100, 31),   // FRExt chroma blk
        3L -> mp4(626, 468, 626, 468, 66, 30),      // honest w/ crops
        4L -> mp4(640, 480, 320, 240, 77, 30)),     // stsd LIES
      "id", "content").orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("parsed")))
    assert(rows(0).getAs[Int]("sps_width") === 1920)
    assert(rows(0).getAs[Int]("sps_height") === 1080)
    assert(rows(0).getAs[Int]("profile_idc") === 66)
    assert(rows(0).getAs[Int]("level_idc") === 40)
    assert(rows(0).getAs[Boolean]("dims_match"))
    assert(rows(1).getAs[Int]("profile_idc") === 100)
    assert(rows(1).getAs[Boolean]("dims_match"))
    assert(rows(2).getAs[Int]("sps_width") === 626)
    assert(rows(2).getAs[Int]("sps_height") === 468)
    assert(rows(2).getAs[Boolean]("dims_match"))
    assert(rows(3).getAs[Int]("stsd_width") === 640)
    assert(rows(3).getAs[Int]("sps_width") === 320)
    assert(!rows(3).getAs[Boolean]("dims_match"))
    // emulation prevention: level 0 + a 7-leading-zero golomb sps_id
    // force a 00 00 0x run the writer must escape with 0x03
    val spsZeros = Mp4.buildSps(64, 64, 66, 0, spsId = 254)
    assert((0 until spsZeros.length - 2).exists(i =>
      spsZeros(i) == 0 && spsZeros(i + 1) == 0 && spsZeros(i + 2) == 3))
    assert(Mp4.parseSps(spsZeros) === Right((66, 0, 64, 64)))
  }

  test("H.264 SPS honesty: no avc track, truncated avcC, and a " +
      "corrupted SPS all refuse with a reason — never guessed dims") {
    val noAvc = Mp4.buildMp4(600L, 1200L, 320, 240,
      videoCodec = "hvc1")
    val good = Mp4.buildMp4(600L, 1200L, 320, 240,
      videoExtra = Mp4.buildAvcC(Mp4.buildSps(320, 240)))
    // truncate INSIDE the avcC payload but keep box sizes coherent:
    // declare numSps = 0 instead
    val noSps = {
      val c = good.clone()
      val at = (0 until c.length - 4).find(o =>
        new String(c, o, 4, "US-ASCII") == "avcC").get
      c(at + 4 + 5) = 0xE0.toByte // 0 sps
      c
    }
    val badSps = {
      val c = good.clone()
      val at = (0 until c.length - 4).find(o =>
        new String(c, o, 4, "US-ASCII") == "avcC").get
      c(at + 4 + 8) = 0x1F.toByte // NAL type no longer 7
      c
    }
    val rows = Mp4.h264SpsScan(df(1L -> noAvc, 2L -> noSps,
        3L -> badSps, 4L -> "garbage".getBytes("UTF-8")),
      "id", "content").orderBy("id").collect()
    assert(rows.forall(!_.getAs[Boolean]("parsed")))
    assert(rows(0).getAs[String]("reason") === "no avc track")
    assert(rows(1).getAs[String]("reason") === "avcC without sps")
    assert(rows(2).getAs[String]("reason") === "not an sps nal")
    assert(rows(3).getAs[String]("reason") === "not iso-bmff")
  }

  test("H.265 SPS: profile/tier/level and conformance-window dims " +
      "parse from the hvcC config; a lying stsd is DETECTED; " +
      "emulation-prevention bytes round-trip") {
    def mp4(stsdW: Int, stsdH: Int, spsW: Int, spsH: Int,
        profile: Int, tier: Int, level: Int) =
      Mp4.buildMp4(timescale = 600L, duration = 1200L,
        width = stsdW, height = stsdH, videoCodec = "hvc1",
        videoExtra = Mp4.buildHvcC(Mp4.buildHevcSps(spsW, spsH,
          profile, tier, level)))
    val rows = Mp4.h265SpsScan(df(
        1L -> mp4(1920, 1080, 1920, 1080, 1, 0, 120),  // honest, 1080%8!=0
        2L -> mp4(1280, 720, 1280, 720, 2, 1, 153),    // Main10, high tier
        3L -> mp4(850, 478, 850, 478, 1, 0, 90),       // window both axes
        4L -> mp4(3840, 2160, 1920, 1080, 1, 0, 120)), // stsd LIES
      "id", "content").orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("parsed")))
    assert(rows(0).getAs[Int]("sps_width") === 1920)
    assert(rows(0).getAs[Int]("sps_height") === 1080)
    assert(rows(0).getAs[Int]("profile_idc") === 1)
    assert(rows(0).getAs[Int]("tier") === 0)
    assert(rows(0).getAs[Int]("level_idc") === 120)
    assert(rows(0).getAs[Boolean]("dims_match"))
    assert(rows(1).getAs[Int]("profile_idc") === 2)
    assert(rows(1).getAs[Int]("tier") === 1)
    assert(rows(1).getAs[Int]("level_idc") === 153)
    assert(rows(1).getAs[Boolean]("dims_match"))
    assert(rows(2).getAs[Int]("sps_width") === 850)
    assert(rows(2).getAs[Int]("sps_height") === 478)
    assert(rows(2).getAs[Boolean]("dims_match"))
    assert(rows(3).getAs[Int]("stsd_width") === 3840)
    assert(rows(3).getAs[Int]("sps_width") === 1920)
    assert(!rows(3).getAs[Boolean]("dims_match"))
    // the zeroed compatibility+constraint run in the PTL forces 00 00
    // sequences the writer must escape
    val sps = Mp4.buildHevcSps(64, 64, 0, 0, 0)
    assert((0 until sps.length - 2).exists(i =>
      sps(i) == 0 && sps(i + 1) == 0 && sps(i + 2) == 3))
    assert(Mp4.parseHevcSps(sps) === Right((0, 0, 0, 64, 64)))
  }

  test("H.265 SPS honesty: no hevc track, an hvcC without an SPS " +
      "array, and a corrupted NAL type all refuse with a reason") {
    val noHevc = Mp4.buildMp4(600L, 1200L, 320, 240,
      videoCodec = "avc1")
    val good = Mp4.buildMp4(600L, 1200L, 320, 240,
      videoCodec = "hvc1",
      videoExtra = Mp4.buildHvcC(Mp4.buildHevcSps(320, 240)))
    val noSps = {
      val c = good.clone()
      val at = (0 until c.length - 4).find(o =>
        new String(c, o, 4, "US-ASCII") == "hvcC").get
      c(at + 4 + 23) = (0x20 | 34).toByte // SPS array -> PPS array
      c
    }
    val badNal = {
      val c = good.clone()
      val at = (0 until c.length - 4).find(o =>
        new String(c, o, 4, "US-ASCII") == "hvcC").get
      // first NAL byte: after 23 fixed + 3 array header + 2 len
      c(at + 4 + 23 + 3 + 2) = (20 << 1).toByte
      c
    }
    val rows = Mp4.h265SpsScan(df(1L -> noHevc, 2L -> noSps,
        3L -> badNal), "id", "content").orderBy("id").collect()
    assert(rows.forall(!_.getAs[Boolean]("parsed")))
    assert(rows(0).getAs[String]("reason") === "no hevc track")
    assert(rows(1).getAs[String]("reason") === "hvcC without sps")
    assert(rows(2).getAs[String]("reason") === "not an hevc sps nal")
  }

  test("tx3g timed text: cues round trip with exact stts timing, " +
      "gap samples (empty text) are skipped, multi-chunk stsc " +
      "layouts walk identically, and structural lies refuse") {
    val samples = Seq(
      (600L, "First cue"),
      (300L, ""),                // gap: nothing on screen
      (900L, "Second cue \u2014 caf\u00e9"),
      (600L, "Third"))
    val one = Mp4.buildMp4Tx3g(600L, samples)
    val multi = Mp4.buildMp4Tx3g(600L, samples,
      chunkSamples = Seq(1, 2, 1), handler = "text")
    def cues(b: Array[Byte]) =
      Mp4.mp4SubtitleCues(df(1L -> b), "id", "content")
        .orderBy("cue_index").collect()
        .map(r => (r.getAs[Long]("cue_index"),
          r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
          r.getAs[String]("text")))
    val expected = Seq(
      (0L, 0L, 1000L, "First cue"),
      (1L, 1500L, 3000L, "Second cue \u2014 caf\u00e9"),
      (2L, 3000L, 4000L, "Third"))
    assert(cues(one).toSeq === expected)
    assert(cues(multi).toSeq === expected)
    // no text track -> emits nothing (not an error)
    val plain = Mp4.buildMp4(600L, 1200L, 320, 240)
    assert(Mp4.mp4SubtitleCues(df(1L -> plain), "id", "content")
      .count() === 0L)
    // text length lying past its sample refuses the FILE
    val lied = one.clone()
    val mdatAt = indexOfTag(lied, "mdat") - 4
    lied(mdatAt + 8) = 0x7F.toByte // first sample's u16 len -> huge
    assert(Mp4.mp4SubtitleCues(df(1L -> lied), "id", "content")
      .count() === 0L)
    // over-cap text refuses, never trims
    assert(Mp4.mp4SubtitleCues(df(1L -> one), "id", "content",
      maxTextBytes = 4).count() === 0L)
  }
}
