package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Audio, Multimodal}

/** FLAC STREAMINFO and TIFF header walks: round trips over the
  * encode twins (both TIFF byte orders, FLAC bit-packing edges),
  * honesty matrices, and sniff integration.
  */
class MediaMetaSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("FLAC round trip: rate/channels/bits/total-samples bit-packing " +
      "walks back exactly, incl. the 20-bit rate and 36-bit sample " +
      "edges; floor-millis duration") {
    val cases = Seq(
      (44100, 2, 16, 1234567L),
      (96000, 8, 24, 0L),
      (1 << 19, 1, 32, (1L << 35) + 17L), // high-bit edges
      (8000, 1, 4, 42L))
    cases.zipWithIndex.foreach { case ((sr, ch, bits, n), i) =>
      val bytes = Audio.buildFlacHeader(sr, ch, bits, n)
      val r = Audio.flacMetaScan(df((i.toLong, bytes)), "id", "content")
        .collect().head
      assert(r.getBoolean(6), s"case $i must parse")
      assert(r.getInt(1) == sr && r.getInt(2) == ch &&
        r.getInt(3) == bits && r.getLong(4) == n, s"case $i: $r")
      assert(r.getLong(5) == n * 1000L / sr)
    }
  }

  test("FLAC honesty: garbage, truncation, a non-STREAMINFO first " +
      "block, and a wrong block length are parsed=false; sniff " +
      "classifies audio/flac") {
    val good = Audio.buildFlacHeader(48000, 2, 16, 1000L)
    val garbage = Array.tabulate[Byte](32)(i => (i * 53).toByte)
    val truncated = java.util.Arrays.copyOf(good, 20)
    val wrongType = good.clone()
    wrongType(4) = (0x80 | 4).toByte // VORBIS_COMMENT first
    val wrongLen = good.clone()
    wrongLen(7) = 20
    val rows = Audio.flacMetaScan(
      df((1L, garbage), (2L, truncated), (3L, wrongType),
        (4L, wrongLen), (5L, good)), "id", "content").collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true), rows.toString)
    val mime = df((1L, good))
      .select(Multimodal.sniffContentType(col("content")))
      .collect().head.getString(0)
    assert(mime == "audio/flac")
  }

  test("Ogg round trip: Vorbis and Opus identification headers walk " +
      "back exactly; duration clocks at the declared rate for Vorbis " +
      "and at 48 kHz for Opus (the codec's fixed clock)") {
    val vorbis = Audio.buildOgg("vorbis", 2, 44100, granule = 441000L)
    val opus = Audio.buildOgg("opus", 1, 16000, granule = 96000L)
    val rows = Audio.oggMetaScan(df((1L, vorbis), (2L, opus)), "id",
      "content").collect().map(r => r.getLong(0) -> r).toMap
    val v = rows(1L)
    assert(v.getBoolean(6) && v.getString(1) == "vorbis" &&
      v.getInt(2) == 2 && v.getInt(3) == 44100 &&
      v.getLong(4) == 441000L && v.getLong(5) == 10000L, v.toString)
    val o = rows(2L)
    assert(o.getBoolean(6) && o.getString(1) == "opus" &&
      o.getInt(2) == 1 && o.getInt(3) == 16000 &&
      o.getLong(4) == 96000L && o.getLong(5) == 2000L,
      s"opus granule clocks at 48 kHz: $o")
  }

  test("Ogg honesty: garbage, truncated pages, a non-BOS first page, " +
      "an unknown first packet, and trailing junk are parsed=false") {
    val good = Audio.buildOgg("vorbis", 2, 44100, granule = 1000L)
    val garbage = Array.tabulate[Byte](64)(i => (i * 61).toByte)
    val truncated = java.util.Arrays.copyOf(good, good.length - 8)
    val noBos = good.clone()
    noBos(5) = 0 // clear the BOS flag
    val unknown = good.clone()
    "xxxxxx".getBytes("US-ASCII").copyToArray(unknown,
      28 + 1 + 1) // overwrite 'vorbis' in the first packet
    val trailing = good ++ Array[Byte](1, 2, 3)
    val rows = Audio.oggMetaScan(
      df((1L, garbage), (2L, truncated), (3L, noBos), (4L, unknown),
        (5L, trailing), (6L, good)), "id", "content").collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> true), rows.toString)
  }

  test("TIFF round trip: both byte orders, SHORT and LONG dimension " +
      "forms; honesty on garbage/truncation/bad version/missing dims; " +
      "sniff classifies image/tiff") {
    val cases = Seq((640L, 480L, true), (99L, 77L, false),
      (100000L, 3L, true)) // LONG width
    cases.zipWithIndex.foreach { case ((w, h, le), i) =>
      val bytes = Multimodal.buildTiffHeader(w, h, littleEndian = le)
      val r = Multimodal.tiffMetaScan(df((i.toLong, bytes)), "id",
        "content").collect().head
      assert(r.getBoolean(5), s"case $i must parse")
      assert(r.getBoolean(1) == le && r.getLong(2) == w &&
        r.getLong(3) == h && r.getInt(4) == 3, s"case $i: $r")
    }
    val good = Multimodal.buildTiffHeader(64, 48)
    val garbage = Array.tabulate[Byte](24)(i => (i * 59).toByte)
    val truncated = java.util.Arrays.copyOf(good, 12)
    val badVersion = good.clone()
    badVersion(2) = 43 // BigTIFF: honestly out of scope
    // IFD whose entries carry no dimension tags
    val noDims = good.clone()
    noDims(10) = 1 // tag 256 -> 257+... flip width tag to 1 (low byte)
    val rows = Multimodal.tiffMetaScan(
      df((1L, garbage), (2L, truncated), (3L, badVersion),
        (4L, noDims), (5L, good)), "id", "content").collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true), rows.toString)
    val mime = df((1L, good))
      .select(Multimodal.sniffContentType(col("content")))
      .collect().head.getString(0)
    assert(mime == "image/tiff")
  }

  test("mediaMetaScan: ONE metadata filter over a MIXED corpus — " +
      "AVI, GIF, MP4, and WebM rows dispatch to their own walks and " +
      "land in the common schema; unknown containers refuse") {
    import graft.operators.{Gif, Media, Mp4, Video, Webm}
    val avi = Video.buildUncompressedAvi(4, 3, (0 until 5).map(f =>
      Array.tabulate[Byte](36)(k => ((f * 31 + k * 7) % 101).toByte)),
      40000L)
    val palette = Array.tabulate(16)(i => i * 0x111111)
    val gif = Gif.buildGif(4, 3, palette, (0 until 3).map(f =>
      Array.tabulate[Byte](12)(p => ((f + p) % 16).toByte)),
      delayCs = 7)
    val mp4 = Mp4.buildMp4(600L, 1500L, 64, 48,
      audioCodec = "mp4a", audioChannels = 2, audioRate = 44100)
    val webm = Webm.buildWebm("webm", 1000000L, 2500.0,
      videoCodec = "V_VP9", width = 640, height = 360,
      audioCodec = "A_OPUS", audioChannels = 2, audioRate = 48000.0)
    val rows = Media.mediaMetaScan(
      df((1L, avi), (2L, gif), (3L, mp4), (4L, webm),
        (5L, "unknown".getBytes("UTF-8"))),
      "id", "content").collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = rows(1L)
    assert(a.getString(1) == "avi" && a.getLong(2) == 200L &&
      a.getInt(3) == 4 && a.getInt(4) == 3 &&
      a.getString(5) == "DIB " && a.getString(6) == "" &&
      a.getBoolean(8), a.toString)
    val g = rows(2L)
    assert(g.getString(1) == "gif" && g.getLong(2) == 210L &&
      g.getString(5) == "lzw" && g.getBoolean(8), g.toString)
    val m = rows(3L)
    assert(m.getString(1) == "mp4" && m.getLong(2) == 2500L &&
      m.getInt(3) == 64 && m.getString(5) == "avc1" &&
      m.getString(6) == "mp4a" && m.getInt(7) == 44100 &&
      m.getBoolean(8), m.toString)
    val w = rows(4L)
    assert(w.getString(1) == "webm" && w.getLong(2) == 2500L &&
      w.getInt(3) == 640 && w.getString(5) == "V_VP9" &&
      w.getString(6) == "A_OPUS" && w.getInt(7) == 48000 &&
      w.getBoolean(8), w.toString)
    assert(!rows(5L).getBoolean(8), rows(5L).toString)
    // an AVI with a PCM soundtrack reports its audio shape
    val aviAud = Video.buildAviWithAudio(4, 3, (0 until 3).map(f =>
      Array.tabulate[Byte](36)(k => ((f + k) % 101).toByte)),
      40000L, Array.tabulate(400)(k => k % 201 - 100), 8000)
    val aa = Media.mediaMetaScan(df((1L, aviAud)), "id", "content")
      .collect().head
    assert(aa.getString(6) == "wave_1" && aa.getInt(7) == 8000,
      aa.toString)
    // the audio containers land in the same schema
    import graft.operators.{Audio, Flac, Mp3}
    val s = Array.tabulate(800)(k => k % 201 - 100)
    val arows = Media.mediaMetaScan(df(
      (1L, Audio.wrapWav(s, 0, 800, 8000)),
      (2L, Flac.buildFlac(16000, Array(s), blockSize = 128)),
      (3L, Mp3.buildMp3(3, 0, Seq.fill(7)(5), mono = true)),
      (4L, Audio.buildOgg("opus", 2, 48000, 960L)),
      (5L, Audio.buildOgg("vorbis", 1, 44100, 4410L))),
      "id", "content").collect().map(r => r.getLong(0) -> r).toMap
    def row(id: Long) = (arows(id).getString(1), arows(id).getLong(2),
      arows(id).getString(6), arows(id).getInt(7),
      arows(id).getBoolean(8))
    assert(row(1L) == ("wav", 100L, "wave_1", 8000, true), arows(1L))
    assert(row(2L) == ("flac", 50L, "flac", 16000, true), arows(2L))
    assert(row(3L) == ("mp3", 7L * 1152 * 1000 / 44100, "mp3", 44100,
      true), arows(3L))
    assert(row(4L) == ("ogg", 960L * 1000 / 48000, "opus", 48000,
      true), arows(4L))
    assert(row(5L) == ("ogg", 4410L * 1000 / 44100, "vorbis", 44100,
      true), arows(5L))
  }

  test("mediaMetaScanPrefix: prefix-boundable families parse from a " +
      "1 KiB prefix with media data beyond it; tail-dependent " +
      "grammars (GIF/MP3/Ogg) refuse in prefix mode but parse whole") {
    import graft.operators.{Audio, Gif, Media, Mp4, Webm}
    // a faststart MP4 with 64 KiB of mdat: genuinely beyond the prefix
    val bigMp4 = Mp4.buildMp4(600L, 3000L, 64, 48,
      mdatBytes = 64 * 1024)
    val bigWebm = Webm.buildWebm("webm", 1000000L, 4000.0,
      videoCodec = "V_VP9", width = 640, height = 360,
      nClusters = 8, clusterBytes = 16 * 1024)
    val palette = Array.tabulate(16)(i => i * 0x111111)
    val gif = Gif.buildGif(4, 3, palette, (0 until 3).map(f =>
      Array.tabulate[Byte](12)(p => ((f + p) % 16).toByte)),
      delayCs = 7)
    val ogg = Audio.buildOgg("opus", 1, 48000, 960L)
    val rows = Media.mediaMetaScanPrefix(
      df((1L, bigMp4), (2L, bigWebm), (3L, gif), (4L, ogg)),
      "id", "content", prefixBytes = 1024).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(8) && rows(1L).getLong(2) == 5000L &&
      rows(1L).getString(1) == "mp4", rows(1L).toString)
    assert(rows(2L).getBoolean(8) && rows(2L).getLong(2) == 4000L,
      rows(2L).toString)
    assert(!rows(3L).getBoolean(8) && !rows(4L).getBoolean(8),
      "tail-dependent grammars must refuse in prefix mode")
    // the same payloads parse through the FULL scan
    val full = Media.mediaMetaScan(df((3L, gif), (4L, ogg)), "id",
      "content").collect().map(r => r.getLong(0) -> r.getBoolean(8))
      .toMap
    assert(full == Map(3L -> true, 4L -> true), full.toString)
  }

  test("AIFF is the ninth family: the common row through the IFF " +
      "walk, prefix-boundable (COMM leads, SSND skipped by size)") {
    import graft.operators.{Audio, Media}
    val aiff = Audio.buildAiff(
      Array.tabulate(4000)(k => (k * 7) % 201 - 100),
      channels = 1, rate = 8000)
    val r = Media.mediaMetaScan(df((1L, aiff)), "id", "content")
      .collect().head
    assert(r.getAs[String]("container") === "aiff")
    assert(r.getAs[Long]("duration_ms") === 500L)
    assert(r.getAs[String]("audio_codec") === "aiff_pcm")
    assert(r.getAs[Int]("audio_rate") === 8000)
    assert(r.getAs[Boolean]("parsed"))
    // prefix mode: 1 KiB prefix of an ~8 KB payload still parses
    val p = Media.mediaMetaScanPrefix(df((1L, aiff)), "id", "content",
      prefixBytes = 1024).collect().head
    assert(p.getAs[Boolean]("parsed") &&
      p.getAs[String]("container") === "aiff" &&
      p.getAs[Long]("duration_ms") === 500L)
  }
}
