package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Subtitle, Webm}

/** Subtitles — the video→text bridge: SRT and WebVTT grammar walks
  * (exact ms arithmetic, strict per-file honesty), the transcript
  * statistics projection, and Matroska/WebM `S_TEXT/UTF8` track
  * extraction (BlockGroup + BlockDuration, bare SimpleBlocks, real
  * relative timestamps, timestamp scales, coexistence with the PCM
  * soundtrack bridge on one file).
  */
class SubtitleSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def s(text: String): Array[Byte] = text.getBytes("UTF-8")

  test("SRT round trip: times, multi-line text, ordering; BOM " +
      "tolerated; hour overflow-free arithmetic") {
    val cues = Seq(
      (0L, 1500L, "hello world"),
      (90061001L, 90061999L, "line one\nline two"), // 25:01:01.001
      (359999999L, 360000000L, "edge"))
    val b = Subtitle.buildSrt(cues)
    val withBom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ b
    Seq(b, withBom).foreach { payload =>
      val rows = Subtitle.subtitleCues(df(1L -> payload), "id",
        "content").orderBy("cue_index").collect()
      assert(rows.length === 3)
      rows.zip(cues).zipWithIndex.foreach { case ((r, (st, en, t)), i) =>
        assert(r.getAs[Long]("cue_index") === i.toLong)
        assert(r.getAs[Long]("start_ms") === st)
        assert(r.getAs[Long]("end_ms") === en)
        assert(r.getAs[String]("text") === t)
        assert(r.getAs[String]("format") === "srt")
      }
    }
  }

  test("WebVTT round trip: header variants, NOTE blocks, identifier " +
      "lines, cue settings, MM:SS.mmm short times") {
    val cues = Seq((1000L, 2000L, "first"), (3000L, 4500L, "second"))
    val built = Subtitle.buildVtt(cues, withIds = true,
      settings = "line:0 position:50%", note = "generated fixture")
    val rows = Subtitle.subtitleCues(df(1L -> built), "id", "content")
      .orderBy("cue_index").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("start_ms") === 1000L)
    assert(rows(1).getAs[Long]("end_ms") === 4500L)
    assert(rows(0).getAs[String]("format") === "vtt")
    // hand-written: short MM:SS.mmm form + header text after WEBVTT
    val hand = s("WEBVTT some header text\n\n01:02.500 --> 01:03.000\n" +
      "short form\n")
    val hr = Subtitle.subtitleCues(df(1L -> hand), "id", "content")
      .collect()
    assert(hr.length === 1)
    assert(hr(0).getAs[Long]("start_ms") === 62500L)
    assert(hr(0).getAs[Long]("end_ms") === 63000L)
  }

  test("honesty: malformed files emit NOTHING — bad minutes/seconds, " +
      "end before start, missing text, non-numeric counter, " +
      "malformed arrow, empty, settings on an SRT line") {
    val bad = Seq(
      s("1\n00:61:00,000 --> 00:62:00,000\nx\n"), // minutes >= 60
      s("1\n00:00:61,000 --> 00:00:62,000\nx\n"), // seconds >= 60
      s("1\n00:00:02,000 --> 00:00:01,000\nx\n"), // end < start
      s("1\n00:00:01,000 --> 00:00:02,000\n\n"), // no text
      s("one\n00:00:01,000 --> 00:00:02,000\nx\n"), // bad counter
      s("1\n00:00:01,000 -> 00:00:02,000\nx\n"), // bad arrow
      s("1\n00:00:01,000 --> 00:00:02,000 line:0\nx\n"), // SRT settings
      s("99999999999\n00:00:01,000 --> 00:00:02,000\nx\n"), // counter overflow
      s(""),
      s("WEBVTT\n\n00:00:01.000 --> xx\nbroken\n"),
      s("WEBVTT\n\nid-line\nanother-non-timing-line\ntext\n"))
    val rows = Subtitle.subtitleCues(
      df(bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }: _*),
      "id", "content").collect()
    assert(rows.isEmpty)
    // maxCues refuses the whole file, never truncates
    val many = Subtitle.buildSrt((0 until 10).map(k =>
      (k * 1000L, k * 1000L + 500L, s"c$k")))
    assert(Subtitle.subtitleCues(df(1L -> many), "id", "content",
      maxCues = 5).count() === 0L)
  }

  test("subtitleStats: exact census over a mixed SRT/VTT corpus") {
    val cues = Seq((0L, 1000L, "a b c"), (5000L, 6500L, "d e"))
    val rows = Subtitle.subtitleStats(df(
      2L -> Subtitle.buildSrt(cues),
      3L -> Subtitle.buildVtt(cues)), "id", "content")
      .orderBy("id").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cues") === 2L)
      assert(r.getAs[Long]("first_start_ms") === 0L)
      assert(r.getAs[Long]("last_end_ms") === 6500L)
      assert(r.getAs[Long]("speech_ms") === 2500L)
      assert(r.getAs[Long]("chars") === 8L)
      assert(r.getAs[Long]("words") === 5L)
    }
    assert(rows(0).getAs[String]("format") === "srt")
    assert(rows(1).getAs[String]("format") === "vtt")
  }

  test("WebM S_TEXT/UTF8 extraction: BlockGroup + BlockDuration " +
      "cues, bare SimpleBlocks (end = start), relative timestamps, " +
      "a 2 ms timestamp scale, UTF-8 text") {
    val cues = Seq(
      (0L, 500L, "première"), (1000L, 400L, "second cue"),
      (2500L, -1L, "no duration"), (4000L, 800L, "final"))
    val b = Webm.buildWebm("webm", 2000000L, 5000.0,
      videoCodec = "V_VP9", width = 64, height = 48, subCues = cues)
    val rows = Webm.webmSubtitleCues(df(1L -> b), "id", "content")
      .orderBy("cue_index").collect()
    assert(rows.length === 4)
    val expect = Seq((0L, 1000L, "première"), (2000L, 2800L, "second cue"),
      (5000L, 5000L, "no duration"), (8000L, 9600L, "final"))
    rows.zip(expect).foreach { case (r, (st, en, t)) =>
      assert(r.getAs[Long]("start_ms") === st)
      assert(r.getAs[Long]("end_ms") === en)
      assert(r.getAs[String]("text") === t)
    }
  }

  test("WebM honesty: no subtitle track emits nothing; compressed " +
      "subtitle codecs stay invisible; maxCues refuses; subtitle " +
      "and PCM tracks coexist — both bridges read one file") {
    val noSub = Webm.buildWebm("webm", 1000000L, 1000.0,
      videoCodec = "V_VP8", width = 8, height = 8)
    assert(Webm.webmSubtitleCues(df(1L -> noSub), "id", "content")
      .count() === 0L)
    val sub = Webm.buildWebm("webm", 1000000L, 1000.0,
      subCues = Seq((0L, 100L, "a"), (200L, 100L, "b")))
    assert(Webm.webmSubtitleCues(df(1L -> sub), "id", "content",
      maxCues = 1).count() === 0L)
    // PCM audio + subtitles in one file: the soundtrack bridge sees
    // the audio track, the subtitle walk sees the text track
    val samples = Array.tabulate(64)(k => (k * 37) % 201 - 100)
    val both = Webm.buildWebm("matroska", 1000000L, 1000.0,
      audioChannels = 1, audioRate = 8000.0,
      audioPcm = samples, blockSamples = Seq(32, 32),
      subCues = Seq((10L, 90L, "caption")))
    val cues = Webm.webmSubtitleCues(df(1L -> both), "id", "content")
      .collect()
    assert(cues.length === 1)
    assert(cues(0).getAs[String]("text") === "caption")
    assert(cues(0).getAs[Long]("start_ms") === 10L)
    import graft.operators.Video
    val tracks = Video.extractAudioTracks(df(1L -> both), "id",
      "content").collect()
    assert(tracks.length === 1 && tracks.head.decoded)
  }

  test("ASS round trip: Format-declared field order, centisecond " +
      "times, commas inside Text survive, override blocks strip, " +
      "\\N breaks, \\h spaces") {
    val cues = Seq(
      (0L, 1500L, "{\\b1}bold{\\b0} and, with commas"),
      (2000L, 3210L, "line one\\Nline two"),
      (4000L, 4500L, "hard\\hspace"))
    val b = Subtitle.buildAss(cues)
    val rows = Subtitle.subtitleCues(df(1L -> b), "id", "content")
      .orderBy("cue_index").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[String]("format") === "ass"))
    assert(rows(0).getAs[String]("text") === "bold and, with commas")
    assert(rows(0).getAs[Long]("start_ms") === 0L &&
      rows(0).getAs[Long]("end_ms") === 1500L)
    assert(rows(1).getAs[String]("text") === "line one\nline two")
    assert(rows(1).getAs[Long]("end_ms") === 3210L)
    assert(rows(2).getAs[String]("text") === "hard space")
    // a NON-canonical field order: Start/End positions come from the
    // Format line, never assumed
    val reordered = s(
      "[Script Info]\nTitle: t\n\n[Events]\n" +
        "Format: Start, End, Layer, Text\n" +
        "Dialogue: 0:00:01.00,0:00:02.00,0,reordered ok\n")
    val rr = Subtitle.subtitleCues(df(1L -> reordered), "id",
      "content").collect()
    assert(rr.length === 1 &&
      rr(0).getAs[String]("text") === "reordered ok" &&
      rr(0).getAs[Long]("start_ms") === 1000L)
  }

  test("ASS honesty: Dialogue before Format, Text not last, too few " +
      "fields, bad time fields, unclosed override braces stay " +
      "literal; Comment lines are skipped") {
    val bad = Seq(
      s("[Script Info]\n\n[Events]\n" +
        "Dialogue: 0,0:00:01.00,0:00:02.00,S,,0,0,0,,x\n"), // no Format
      s("[Script Info]\n\n[Events]\nFormat: Text, Start, End\n" +
        "Dialogue: x,0:00:01.00,0:00:02.00\n"), // Text not last
      s("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n" +
        "Dialogue: 0:00:01.00,0:00:02.00\n"), // too few fields
      s("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n" +
        "Dialogue: 0:00:61.00,0:01:02.00,x\n"), // seconds >= 60
      s("[Script Info]\n\n[Events]\nFormat: Start, End, Text\n" +
        "Dialogue: 0:00:02.00,0:00:01.00,x\n")) // end < start
    val rows = Subtitle.subtitleCues(
      df(bad.zipWithIndex.map { case (b, i) => (i.toLong, b) }: _*),
      "id", "content").collect()
    assert(rows.isEmpty)
    val mixed = s("[Script Info]\n\n[Events]\n" +
      "Format: Start, End, Text\n" +
      "Comment: 0:00:00.00,0:00:01.00,a note\n" +
      "Dialogue: 0:00:01.00,0:00:02.00,{unclosed brace\n")
    val mr = Subtitle.subtitleCues(df(1L -> mixed), "id", "content")
      .collect()
    assert(mr.length === 1)
    assert(mr(0).getAs[String]("text") === "{unclosed brace")
  }

  test("Matroska S_TEXT/ASS tracks: block lines carry the " +
      "ReadOrder,...,Text grammar — commas in Text survive, override " +
      "blocks strip, short lines refuse the payload") {
    val cues = Seq((0L, 400L, "{\\i1}styled{\\i0}, with comma"),
      (1000L, 300L, "plain\\Nbreak"))
    val b = Webm.buildWebm("matroska", 1000000L, 2000.0,
      subCues = cues, subAss = true)
    val rows = Webm.webmSubtitleCues(df(1L -> b), "id", "content")
      .orderBy("cue_index").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("text") === "styled, with comma")
    assert(rows(0).getAs[Long]("end_ms") === 400L)
    assert(rows(1).getAs[String]("text") === "plain\nbreak")
    // a hostile ASS block with fewer than nine fields refuses
    val hostile = Webm.buildWebm("matroska", 1000000L, 2000.0,
      subCues = Seq((0L, 100L, "x")), subAss = true)
    // corrupt the block line by shortening the payload text to drop
    // below nine comma-separated fields: rebuild with a raw UTF8
    // track claiming the ASS codec is simpler — hand-craft via the
    // UTF8 builder then patch the codec id bytes
    val utf8 = Webm.buildWebm("matroska", 1000000L, 2000.0,
      subCues = Seq((0L, 100L, "no-commas-here")))
    val patched = {
      val s = "S_TEXT/UTF8".getBytes("US-ASCII")
      val a = "S_TEXT/ASS\u0000".getBytes("ISO-8859-1")
      val raw = utf8.clone()
      val at = (0 to raw.length - s.length).find(i =>
        s.indices.forall(j => raw(i + j) == s(j))).get
      a.indices.foreach(j => raw(at + j) = a(j))
      raw
    }
    assert(Webm.webmSubtitleCues(df(1L -> hostile), "id", "content")
      .count() === 1L) // the builder writes well-formed lines
    assert(Webm.webmSubtitleCues(df(2L -> patched), "id", "content")
      .count() === 0L) // short line refuses the payload
  }

  test("streaming: cue extraction is stateless and runs per " +
      "micro-batch over a live feed — SRT/VTT files and WebM text " +
      "tracks both") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = Subtitle.subtitleCues(mem.toDF().toDF("id", "content"),
        "id", "content")
      .writeStream.format("memory").queryName("sub_stream")
      .outputMode("append").start()
    try {
      mem.addData(1L -> Subtitle.buildSrt(Seq((0L, 900L, "batch one"))))
      q.processAllAvailable()
      assert(spark.table("sub_stream").count() === 1L)
      mem.addData(
        2L -> Subtitle.buildVtt(Seq((100L, 500L, "batch two"))),
        3L -> "garbage".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("sub_stream").orderBy("id").collect()
      assert(rows.length === 2) // garbage emitted nothing
      assert(rows(1).getAs[String]("text") === "batch two")
    } finally q.stop()
    val wmem = MemoryStream[(Long, Array[Byte])]
    val wq = Webm.webmSubtitleCues(wmem.toDF().toDF("id", "content"),
        "id", "content")
      .writeStream.format("memory").queryName("wsub_stream")
      .outputMode("append").start()
    try {
      wmem.addData(9L -> Webm.buildWebm("webm", 1000000L, 1000.0,
        subCues = Seq((50L, 200L, "live caption"))))
      wq.processAllAvailable()
      val rows = spark.table("wsub_stream").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("start_ms") === 50L)
      assert(rows(0).getAs[Long]("end_ms") === 250L)
    } finally wq.stop()
  }
}
