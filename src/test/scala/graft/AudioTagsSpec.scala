package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Audio, AudioTags, Mp3, Mp4}

/** Unified audio tag scan: one pass over mixed MP3/FLAC/Ogg payloads
  * normalizing ID3v2 frames, ID3v1 trailers, and Vorbis comments into
  * (container, source, tag, value) rows under the published name
  * conventions — unmapped tags pass through, both MP3 tag grammars
  * coexist, garbage emits nothing.
  */
class AudioTagsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("one scan, three grammars: ID3v2 frames normalize (TIT2 -> " +
      "title, TDRC -> date, unmapped frames verbatim), a v2+v1 MP3 " +
      "emits BOTH sources, vorbis keys lowercase-normalize, opus " +
      "labels its source, and garbage emits nothing") {
    val v2 = Mp3.buildMp3(3, 0, Seq(5, 5), mono = true, id3Bytes = 16,
      id3Frames = Seq("TIT2" -> "Song A", "TPE1" -> "Band B",
        "TDRC" -> "2021", "TPUB" -> "Label C"), id3Major = 4)
    val both = Mp3.withId3v1(
      Mp3.buildMp3(3, 0, Seq(5, 5), mono = true, id3Bytes = 16,
        id3Frames = Seq("TIT2" -> "V2 Title"), id3Major = 3),
      title = "V1 Title", artist = "V1 Artist", album = "",
      year = "1999", comment = "", track = 7, genre = 17)
    val flac = Audio.buildFlacHeader(8000, 1, 16, 4000,
      vendor = "v", comments = Seq("TITLE" -> "Flac T",
        "Artist" -> "Flac A", "CUSTOMKEY" -> "kept"))
    val opus = Audio.buildOgg("opus", 2, 48000, 4800L,
      vendor = "v", comments = Seq("TRACKNUMBER" -> "3",
        "LANGUAGE" -> "eo"))
    val rows = AudioTags.audioTagScan(df(
        1L -> v2, 2L -> both, 3L -> flac, 4L -> opus,
        5L -> "not audio".getBytes("UTF-8")),
      "id", "content").orderBy("id", "source", "tag").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("container"),
        r.getAs[String]("source"), r.getAs[String]("tag"),
        r.getAs[String]("value")))
    assert(rows.filter(_._1 == 1L).toSet === Set(
      (1L, "mp3", "id3v2", "title", "Song A"),
      (1L, "mp3", "id3v2", "artist", "Band B"),
      (1L, "mp3", "id3v2", "date", "2021"),
      (1L, "mp3", "id3v2", "TPUB", "Label C")))
    assert(rows.filter(_._1 == 2L).toSet === Set(
      (2L, "mp3", "id3v2", "title", "V2 Title"),
      (2L, "mp3", "id3v1", "title", "V1 Title"),
      (2L, "mp3", "id3v1", "artist", "V1 Artist"),
      (2L, "mp3", "id3v1", "date", "1999"),
      (2L, "mp3", "id3v1", "track", "7"),
      (2L, "mp3", "id3v1", "genre_id", "17")))
    assert(rows.filter(_._1 == 3L).toSet === Set(
      (3L, "flac", "vorbis", "title", "Flac T"),
      (3L, "flac", "vorbis", "artist", "Flac A"),
      (3L, "flac", "vorbis", "customkey", "kept")))
    assert(rows.filter(_._1 == 4L).toSet === Set(
      (4L, "ogg", "opus", "track", "3"),
      (4L, "ogg", "opus", "language", "eo")))
    assert(rows.count(_._1 == 5L) === 0)
  }

  test("M4A/MP4 ilst: iTunes-style text items normalize through the " +
      "published names, binary data items are skipped, and untagged " +
      "MP4s emit nothing") {
    val m4a = Mp4.withIlstTags(
      Mp4.buildMp4(timescale = 44100L, duration = 441000L,
        width = 0, height = 0, videoCodec = "",
        audioCodec = "mp4a", audioChannels = 2, audioRate = 44100),
      Seq("\u00A9nam" -> "M4A Title", "\u00A9ART" -> "M4A Artist",
        "\u00A9day" -> "2020", "cust" -> "kept-verbatim"))
    val bare = Mp4.buildMp4(600L, 1200L, 320, 240)
    val rows = AudioTags.audioTagScan(df(1L -> m4a, 2L -> bare),
      "id", "content").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("container"),
        r.getAs[String]("source"), r.getAs[String]("tag"),
        r.getAs[String]("value")))
    assert(rows.filter(_._1 == 1L).toSet === Set(
      (1L, "mp4", "ilst", "title", "M4A Title"),
      (1L, "mp4", "ilst", "artist", "M4A Artist"),
      (1L, "mp4", "ilst", "date", "2020"),
      (1L, "mp4", "ilst", "cust", "kept-verbatim")))
    assert(rows.count(_._1 == 2L) === 0)
    // the tagged file still parses as a normal MP4 (moov size grown
    // correctly)
    val m = graft.operators.Mp4.parseMp4Header(df(1L -> m4a), "id",
      "content").collect().head
    assert(m.parsed && m.audioCodec == "mp4a")
  }

  test("WAV RIFF INFO and AIFF text chunks: the IFF-world metadata " +
      "normalizes through the published ids; tagged files still " +
      "decode as plain PCM; untagged files emit nothing") {
    val wav = Audio.withRiffInfo(
      Audio.wrapWav(Array.tabulate(200)(k => k % 100), 0, 200, 8000),
      Seq("INAM" -> "Wav Title", "IART" -> "Wav Artist",
        "ICRD" -> "1987", "IXXX" -> "kept"))
    val aiff = Audio.withAiffText(
      Audio.buildAiff(Array.tabulate(200)(k => k % 100 - 50),
        channels = 1, rate = 8000),
      Seq("NAME" -> "Aiff Title", "AUTH" -> "Aiff Author",
        "ANNO" -> "a note"))
    val bare = Audio.wrapWav(Array.tabulate(8)(identity), 0, 8, 8000)
    val rows = AudioTags.audioTagScan(df(1L -> wav, 2L -> aiff,
        3L -> bare), "id", "content").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("container"),
        r.getAs[String]("source"), r.getAs[String]("tag"),
        r.getAs[String]("value")))
    assert(rows.filter(_._1 == 1L).toSet === Set(
      (1L, "wav", "riff_info", "title", "Wav Title"),
      (1L, "wav", "riff_info", "artist", "Wav Artist"),
      (1L, "wav", "riff_info", "date", "1987"),
      (1L, "wav", "riff_info", "IXXX", "kept")))
    assert(rows.filter(_._1 == 2L).toSet === Set(
      (2L, "aiff", "iff_text", "title", "Aiff Title"),
      (2L, "aiff", "iff_text", "artist", "Aiff Author"),
      (2L, "aiff", "iff_text", "comment", "a note")))
    assert(rows.count(_._1 == 3L) === 0)
    // the tagged files still decode as plain PCM through the
    // container-auto audio path
    val dec = Audio.decodePcm16(df(1L -> wav, 2L -> aiff), "id",
      "content").toDF().collect()
    assert(dec.forall(_.getAs[Boolean]("decoded")))
  }

  test("Matroska/WebM SimpleTags: segment-level Tags normalize " +
      "through the published names; untagged files emit nothing") {
    import graft.operators.Webm
    val tagged = Webm.buildWebm(docType = "matroska",
      timescaleNs = 1000000L, durationTicks = 1000.0,
      videoCodec = "V_VP9", width = 320, height = 240,
      tags = Seq("TITLE" -> "MKV Title", "ARTIST" -> "MKV Artist",
        "ENCODER_SETTINGS" -> "kept"))
    val bare = Webm.buildWebm(docType = "webm",
      timescaleNs = 1000000L, durationTicks = 1000.0,
      videoCodec = "V_VP8", width = 320, height = 240)
    val rows = AudioTags.audioTagScan(df(1L -> tagged, 2L -> bare),
      "id", "content").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("container"),
        r.getAs[String]("source"), r.getAs[String]("tag"),
        r.getAs[String]("value")))
    assert(rows.filter(_._1 == 1L).toSet === Set(
      (1L, "matroska", "simple_tag", "title", "MKV Title"),
      (1L, "matroska", "simple_tag", "artist", "MKV Artist"),
      (1L, "matroska", "simple_tag", "ENCODER_SETTINGS", "kept")))
    assert(rows.count(_._1 == 2L) === 0)
    // the tagged file still parses as a normal Matroska
    val m = Webm.webmMetaScan(df(1L -> tagged), "id", "content")
      .collect().head
    assert(m.getAs[Boolean]("parsed"))
  }
}
