package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Webm

/** Matroska/WebM EBML metadata: varint grammar, Info/Tracks walk,
  * prefix parses, and the honesty matrix (garbage, truncated varints,
  * unknown sizes, hostile floats, insane dims). Every payload is REAL
  * bytes — the library encoder's output or hand-corrupted variants.
  */
class WebmMetaSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** First offset of a byte pattern (corruption helper). */
  private def indexOfBytes(b: Array[Byte], pat: Array[Byte]): Int =
    (0 to b.length - pat.length).find(i =>
      pat.indices.forall(j => b(i + j) == pat(j))).get

  test("round trip: docType, timescale, float duration (64- and " +
      "32-bit), track codecs, dims, audio rate/channels walk back " +
      "exactly; absent duration reports -1; unknown-size segments " +
      "(the streamed form) parse") {
    val rows = Webm.parseWebmHeader(df(
      1L -> Webm.buildWebm("webm", 1000000L, 2500.0,
        videoCodec = "V_VP9", width = 640, height = 360,
        audioCodec = "A_OPUS", audioChannels = 2, audioRate = 48000.0,
        nClusters = 3),
      2L -> Webm.buildWebm("matroska", 500000L, 2500.0,
        videoCodec = "", audioCodec = "A_VORBIS", audioChannels = 1,
        audioRate = 44100.0),
      3L -> Webm.buildWebm("webm", 1000000L, -1.0,
        videoCodec = "V_VP8", width = 320, height = 240,
        unknownSizeSegment = true),
      4L -> Webm.buildWebm("webm", 1000000L, 1234.0,
        videoCodec = "V_AV1", width = 1920, height = 1080,
        floatDuration32 = true)),
      "id", "content").collect().map(m => m.id -> m).toMap
    val m1 = rows(1L)
    assert(m1.parsed && m1.docType == "webm" &&
      m1.timescaleNs == 1000000L && m1.durationMs == 2500L &&
      m1.tracks == 2 && m1.videoCodec == "V_VP9" && m1.width == 640 &&
      m1.height == 360 && m1.audioCodec == "A_OPUS" &&
      m1.audioChannels == 2 && m1.audioRate == 48000, m1.toString)
    val m2 = rows(2L)
    assert(m2.parsed && m2.docType == "matroska" &&
      m2.timescaleNs == 500000L && m2.durationMs == 1250L &&
      m2.tracks == 1 && m2.videoCodec == "" &&
      m2.audioCodec == "A_VORBIS" && m2.audioRate == 44100,
      m2.toString)
    val m3 = rows(3L)
    assert(m3.parsed && m3.durationMs == -1L &&
      m3.videoCodec == "V_VP8" && m3.width == 320, m3.toString)
    val m4 = rows(4L)
    assert(m4.parsed && m4.durationMs == 1234L &&
      m4.videoCodec == "V_AV1" && m4.width == 1920, m4.toString)
  }

  test("prefix parse: metadata ahead of bulky clusters parses from a " +
      "4 KiB prefix; a prefix that cuts the metadata refuses " +
      "(parsed=false), never fabricates") {
    val big = Webm.buildWebm("webm", 1000000L, 9000.0,
      videoCodec = "V_VP9", width = 1280, height = 720,
      audioCodec = "A_OPUS", audioChannels = 2, audioRate = 48000.0,
      nClusters = 8, clusterBytes = 64 * 1024)
    assert(big.length > 4096, s"fixture must outgrow the prefix")
    val ok = Webm.parseWebmHeaderPrefix(df(1L -> big), "id", "content",
      prefixBytes = 4096).collect().head
    assert(ok.parsed && ok.durationMs == 9000L && ok.width == 1280 &&
      ok.audioRate == 48000, ok.toString)
    val cut = Webm.parseWebmHeaderPrefix(df(1L -> big), "id", "content",
      prefixBytes = 64).collect().head
    assert(!cut.parsed, s"metadata beyond the prefix must refuse: $cut")
    // the persisted-prefix-column form parses identically
    import org.apache.spark.sql.functions.{col, length, substring}
    val cols = df(1L -> big).select(col("id"),
      substring(col("content"), 1, 4096).as("prefix"),
      length(col("content")).cast("long").as("total_len"))
    val pc = Webm.parseWebmHeaderPrefixCols(cols, "id", "prefix",
      "total_len").collect().head
    assert(pc == ok.copy(id = pc.id),
      s"prefix-cols must equal the inline prefix parse: $pc vs $ok")
  }

  test("honesty matrix: garbage, truncation mid-structure, a foreign " +
      "DocType, a NaN duration, a wrong-width duration float, and " +
      "insane dimensions all refuse") {
    val good = Webm.buildWebm("webm", 1000000L, 100.0,
      videoCodec = "V_VP8", width = 64, height = 48)
    // truncate inside the Tracks element (before any cluster)
    val truncated = good.take(
      indexOfBytes(good, "V_VP8".getBytes("US-ASCII")) + 2)
    // DocType byte-swap: "webm" -> "wxbm"
    val foreign = good.clone()
    foreign(indexOfBytes(foreign, "webm".getBytes("US-ASCII")) + 1) =
      'x'.toByte
    // NaN duration: Duration element is id 0x44 0x89, size 0x88, then
    // 8 big-endian float64 bytes
    val nan = good.clone()
    val dOff = indexOfBytes(nan,
      Array(0x44.toByte, 0x89.toByte, 0x88.toByte)) + 3
    val nanBits = java.lang.Double.doubleToLongBits(Double.NaN)
    (0 until 8).foreach(i =>
      nan(dOff + i) = ((nanBits >>> (8 * (7 - i))) & 0xFF).toByte)
    // wrong-width float: declare the duration 6 bytes long
    val badWidth = good.clone()
    badWidth(indexOfBytes(badWidth,
      Array(0x44.toByte, 0x89.toByte, 0x88.toByte)) + 2) = 0x86.toByte
    val insane = Webm.buildWebm("webm", 1000000L, 100.0,
      videoCodec = "V_VP8", width = 40000, height = 48)
    val rows = Webm.parseWebmHeader(df(
      1L -> "not ebml at all".getBytes("UTF-8"),
      2L -> truncated, 3L -> foreign, 4L -> nan, 5L -> badWidth,
      6L -> insane, 7L -> good),
      "id", "content").collect().map(m => m.id -> m.parsed).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> true), rows.toString)
  }

  test("Matroska PCM soundtrack: LIT and BIG byte orders, SimpleBlock " +
      "and BlockGroup forms, multi-cluster layouts, and stereo all " +
      "extract to canonical WAVs whose decoded samples equal the " +
      "planted stream; laced blocks, compressed codecs, and over-cap " +
      "tracks refuse") {
    import graft.operators.{Audio, Video}
    val s16 = Array.tabulate(600)(k => ((k * 371 + 11) % 65536) - 32768)
    val fixtures = Seq(
      1L -> Webm.buildWebm("matroska", 1000000L, 75.0,
        videoCodec = "", audioChannels = 1, audioRate = 8000.0,
        audioPcm = s16, blockSamples = Seq(200, 200, 200)),
      2L -> Webm.buildWebm("webm", 1000000L, 75.0,
        videoCodec = "V_VP8", width = 16, height = 16,
        audioChannels = 1, audioRate = 8000.0, audioPcm = s16,
        blockSamples = Seq(100, 150, 350), pcmBigEndian = true),
      3L -> Webm.buildWebm("matroska", 1000000L, 75.0,
        videoCodec = "", audioChannels = 1, audioRate = 8000.0,
        audioPcm = s16, blockSamples = Seq(600),
        useBlockGroups = true))
    val tracks = Video.extractAudioTracks(df(fixtures: _*), "id",
      "content").collect().map(t => t.id -> t).toMap
    fixtures.foreach { case (id, _) =>
      val t = tracks(id)
      assert(t.decoded && t.format == 1 && t.channels == 1 &&
        t.sampleRate == 8000 && t.bitsPerSample == 16, s"$id: $t")
    }
    val dec = Audio.decodePcm16(
      df(fixtures.map { case (id, _) => id -> tracks(id).wav }: _*),
      "id", "content").collect().map(d => d.id -> d).toMap
    (1L to 3L).foreach(id => assert(dec(id).decoded &&
      dec(id).samples.toSeq == s16.toSeq, s"$id decoded differs"))
    // stereo mixes down by the audio family's floorDiv
    val st = Array.tabulate(400)(k => ((k * 119 + 3) % 65536) - 32768)
    val stw = Webm.buildWebm("webm", 1000000L, 25.0, videoCodec = "",
      audioChannels = 2, audioRate = 16000.0, audioPcm = st,
      blockSamples = Seq(120, 80))
    val std = Audio.decodePcm16(df(1L -> Video.extractAudioTracks(
      df(1L -> stw), "id", "content").collect().head.wav),
      "id", "content").collect().head
    val want = (0 until 200).map(f =>
      math.floorDiv(st(2 * f) + st(2 * f + 1), 2))
    assert(std.samples.toSeq == want, "stereo mixdown mismatch")
    // honesty: laced flag, compressed codec, over-cap
    val laced = fixtures.head._2.clone()
    val blockAt = (0 to laced.length - 4).find(i =>
      (laced(i) & 0xFF) == 0x81 && laced(i + 1) == 0 &&
        (laced(i + 3) & 0xFF) == 0x80).get
    laced(blockAt + 3) = 0x82.toByte // Xiph lacing bits
    val opus = Webm.buildWebm("webm", 1000000L, 75.0,
      videoCodec = "", audioCodec = "A_OPUS", audioChannels = 1,
      audioRate = 48000.0)
    val rows = Video.extractAudioTracks(
      df(1L -> laced, 2L -> opus), "id", "content")
      .collect().map(t => t.id -> t.decoded).toMap
    assert(rows == Map(1L -> false, 2L -> false), rows.toString)
    val capped = Video.extractAudioTracks(df(1L -> fixtures.head._2),
      "id", "content", maxAudioBytes = 100).collect().head
    assert(!capped.decoded && capped.wav.isEmpty,
      "over-cap must refuse entirely, never truncate")
  }

  test("webmMetaScan projection: the metadata-filter columns, prefix " +
      "routing on") {
    val rows = Webm.webmMetaScan(df(
      1L -> Webm.buildWebm("webm", 1000000L, 777.0,
        videoCodec = "V_VP9", width = 640, height = 360,
        nClusters = 2, clusterBytes = 4096),
      2L -> Array[Byte](1, 2, 3)),
      "id", "content", prefixBytes = 2048).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(11) && !rows(2L).getBoolean(11))
    assert(rows(1L).getString(1) == "webm")
    assert(rows(1L).getLong(3) == 777L) // duration_ms
    assert(rows(1L).getString(5) == "V_VP9")
    assert(rows(1L).getInt(6) == 640 && rows(1L).getInt(7) == 360)
  }
}
