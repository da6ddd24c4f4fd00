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
}
