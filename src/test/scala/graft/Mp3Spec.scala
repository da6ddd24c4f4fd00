package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Mp3

/** MP3 frame-header metadata: sync-word walk, version/bitrate/rate
  * tables, Xing/Info VBR frame count, ID3v2 skip, and the honesty
  * matrix (truncation, garbage, free-format, layer gating).
  */
class Mp3Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("round trip over the table grid: every (version, rate index, " +
      "bitrate index, channel mode) combination walks back to its " +
      "encoder parameters with the exact floor-millis duration") {
    val rates = Map(3 -> Array(44100, 48000, 32000),
      2 -> Array(22050, 24000, 16000), 0 -> Array(11025, 12000, 8000))
    val kbpsTab = Map(
      3 -> Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320),
      2 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        144, 160),
      0 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        144, 160))
    for (vb <- Seq(3, 2, 0); ri <- 0 to 2; bi <- Seq(1, 7, 14);
        mono <- Seq(true, false)) {
      val nFrames = 5
      val bytes = Mp3.buildMp3(vb, ri, Seq.fill(nFrames)(bi), mono)
      val m = Mp3.parseMp3Header(df((1L, bytes)), "id", "content")
        .collect().head
      assert(m.parsed, s"vb=$vb ri=$ri bi=$bi mono=$mono")
      val rate = rates(vb)(ri)
      val spf = if (vb == 3) 1152 else 576
      assert(m.version == (vb match {
        case 3 => "1"; case 2 => "2"; case _ => "2.5" }))
      assert(m.sampleRate == rate && m.frames == nFrames &&
        m.channels == (if (mono) 1 else 2) && !m.vbr &&
        m.bitrateKbps == kbpsTab(vb)(bi) && m.xingFrames == -1L)
      assert(m.durationMs == nFrames.toLong * spf * 1000L / rate,
        s"vb=$vb ri=$ri: ${m.durationMs}")
    }
  }

  test("VBR + Xing + ID3v2: varying per-frame bitrates walk as " +
      "vbr=true with bitrate 0, the Xing declared count reads out " +
      "alongside the walked count, and an ID3v2 tag is skipped") {
    val vbrBytes = Mp3.buildMp3(3, 0, Seq(1, 5, 9, 14, 9, 5), mono = false,
      id3Bytes = 300, xingFrames = 6L)
    val m = Mp3.parseMp3Header(df((1L, vbrBytes)), "id", "content")
      .collect().head
    assert(m.parsed && m.vbr && m.bitrateKbps == 0)
    assert(m.frames == 6L && m.xingFrames == 6L)
    assert(m.channels == 2 && m.sampleRate == 44100)
    // a lying Xing count is REPORTED, not believed: walked stays 6
    val lying = Mp3.buildMp3(3, 0, Seq.fill(6)(9), mono = true,
      xingFrames = 999L)
    val m2 = Mp3.parseMp3Header(df((1L, lying)), "id", "content")
      .collect().head
    assert(m2.parsed && m2.frames == 6L && m2.xingFrames == 999L)
  }

  test("honesty matrix: garbage, truncation mid-frame, free-format " +
      "bitrate, a Layer II stream, trailing junk, and a mid-stream " +
      "rate change are parsed=false") {
    val good = Mp3.buildMp3(3, 1, Seq.fill(4)(5), mono = true)
    val garbage = Array.tabulate[Byte](128)(i => (i * 41).toByte)
    val truncated = java.util.Arrays.copyOf(good, good.length - 10)
    val trailing = good ++ Array[Byte](1, 2, 3)
    // free-format: zero the first frame's bitrate index
    val free = good.clone()
    free(2) = (free(2) & 0x0F).toByte
    // Layer II: layer bits 10 instead of 01
    val layer2 = good.clone()
    layer2(1) = ((layer2(1) & ~0x06) | 0x04).toByte
    // mid-stream rate change: patch frame 1's rate index bits from
    // 01 (48 kHz) to 10 (32 kHz); good = vb 3, ri 1, bi 5 -> frame 0
    // is 144 * 64000 / 48000 = 192 bytes
    val frameBytes = 1152 / 8 * 64000 / 48000
    val rateShift = good.clone()
    assert((rateShift(frameBytes) & 0xFF) == 0xFF,
      "fixture: frame 1 header offset")
    rateShift(frameBytes + 2) =
      ((rateShift(frameBytes + 2) & ~0x0C) | 0x08).toByte
    val rows = Mp3.parseMp3Header(
      df((1L, garbage), (2L, truncated), (3L, trailing), (4L, free),
        (5L, layer2), (6L, rateShift), (7L, good)),
      "id", "content").collect().map(m => m.id -> m.parsed).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> true), rows.toString)
  }

  test("ID3v2 text frames: v2.4 UTF-8 and v2.3 ISO-8859-1 tags walk " +
      "back exactly (incl. non-ASCII), non-text frames and padding " +
      "are skipped, the frame walk coexists with the frame-header " +
      "walk, and malformed tags emit no rows") {
    import spark.implicits._
    val v4 = Mp3.buildMp3(3, 0, Seq.fill(3)(5), mono = true,
      id3Bytes = 64,
      id3Frames = Seq("TIT2" -> "Café Étude", "TPE1" -> "Anon Artist",
        "TALB" -> "Album—16"))
    val v3 = Mp3.buildMp3(2, 1, Seq.fill(3)(4), mono = false,
      id3Frames = Seq("TIT2" -> "Plain Title"), id3Major = 3)
    val noTag = Mp3.buildMp3(3, 0, Seq.fill(3)(5), mono = true)
    val rows = Mp3.id3TextFrames(
      Seq(1L -> v4, 2L -> v3, 3L -> noTag,
        4L -> "garbage".getBytes("UTF-8")).toDF("id", "content"),
      "id", "content").collect()
      .map(f => (f.id, f.frameId) -> f.text).toMap
    assert(rows == Map((1L, "TIT2") -> "Café Étude",
      (1L, "TPE1") -> "Anon Artist", (1L, "TALB") -> "Album—16",
      (2L, "TIT2") -> "Plain Title"), rows.toString)
    // the metadata walk still parses the SAME tagged payloads
    val metas = Mp3.parseMp3Header(
      Seq(1L -> v4, 2L -> v3).toDF("id", "content"), "id", "content")
      .collect().map(m => m.id -> m.parsed).toMap
    assert(metas == Map(1L -> true, 2L -> true))
    // UTF-16 with BOM (encoding 1): hand-patch a v2.4 frame
    val utf16Text = "BOM Test".getBytes("UTF-16") // BE BOM + data
    val frame = "TIT2".getBytes("US-ASCII") ++ Array[Byte](
      0, 0, ((1 + utf16Text.length) >> 7).toByte,
      ((1 + utf16Text.length) & 0x7F).toByte, 0, 0, 1) ++ utf16Text
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0,
      0, 0, (frame.length >> 7).toByte, (frame.length & 0x7F).toByte) ++
      frame
    val got = Mp3.parseId3Text(tag)
    assert(got == Seq("TIT2" -> "BOM Test"), got.toString)
  }

  test("hostile ID3v2.3 tags: a frame size near 2^31 and an " +
      "extended-header size near 2^31 must emit no rows instead of " +
      "wrapping the Int bounds check and throwing on the executor") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      (v & 0xFF).toByte)
    // declared tag size 100, one T-frame claiming 0x7FFFFFF0 bytes:
    // pos + 10 + fSize wraps negative in Int and would bypass the
    // tagEnd check, then the String constructor throws
    val hostileFrame = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 0, 0, 100) ++
      "TIT2".getBytes("US-ASCII") ++ be32(0x7FFFFFF0L) ++
      Array[Byte](0, 0, 3) ++ Array.fill[Byte](100)(7)
    assert(Mp3.parseId3Text(hostileFrame) == Nil)
    // v2.3 extended header claiming 0x7FFFFFF4 bytes: 4 + ehSize
    // wraps the cursor negative
    val hostileEh = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0x40, 0, 0, 0, 100) ++ be32(0x7FFFFFF4L) ++
      Array.fill[Byte](100)(7)
    assert(Mp3.parseId3Text(hostileEh) == Nil)
    // a VALID frame before the hostile one still comes back
    val okFrame = "TALB".getBytes("US-ASCII") ++ be32(3L) ++
      Array[Byte](0, 0, 3) ++ "ok".getBytes("UTF-8")
    val mixed = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 0, 1, 0) ++ okFrame ++
      "TIT2".getBytes("US-ASCII") ++ be32(0x7FFFFFF0L) ++
      Array[Byte](0, 0, 3) ++ Array.fill[Byte](100)(7)
    assert(Mp3.parseId3Text(mixed) == Seq("TALB" -> "ok"))
  }

  test("Xing count beyond the first frame's end is not read: a " +
      "24-byte MPEG-2 mono frame fits the tag+flags but not the " +
      "count, so the declared count must stay -1 rather than be " +
      "read from the next frame's bytes") {
    // vb=2, rateIdx=1 (24000 Hz), bi=1 (8 kbps), mono → fb = 24;
    // side = 9 → tag at 13..16, flags 17..20 (fit), count 21..24
    // (byte 24 is the NEXT frame's 0xFF sync byte)
    val b = Mp3.buildMp3(2, 1, Seq(1, 1), mono = true)
    assert(b.length == 48, s"fixture needs two 24-byte frames: ${b.length}")
    "Xing".getBytes("US-ASCII").copyToArray(b, 13)
    b(17) = 0; b(18) = 0; b(19) = 0; b(20) = 1 // flags: FRAMES
    val m = Mp3.parseMp3Header(df((1L, b)), "id", "content")
      .collect().head
    assert(m.parsed && m.frames == 2L, m.toString)
    assert(m.xingFrames == -1L,
      s"count crossing the frame end must not be read: ${m.xingFrames}")
  }

  test("mp3MetaScan projection: the metadata-filter columns") {
    val r = Mp3.mp3MetaScan(
      df((1L, Mp3.buildMp3(2, 2, Seq.fill(8)(3), mono = true))),
      "id", "content").collect().head
    assert(r.getBoolean(9)) // parsed
    assert(r.getString(1) == "2" && r.getInt(2) == 16000 &&
      r.getInt(3) == 1 && r.getLong(4) == 8L && r.getInt(5) == 24)
    assert(r.getLong(8) == 8L * 576 * 1000 / 16000)
  }

  test("ID3v1 trailer: v1.1 (track byte) and plain v1 round trip; " +
      "NUL/space padding trims; payloads without a trailer, short " +
      "payloads, and a mid-file TAG are present = false") {
    import graft.operators.Mp3
    val mp3 = Mp3.buildMp3(3, 0, Seq(5, 5), mono = false)
    val v11 = Mp3.withId3v1(mp3, "My Title", "The Artist", "An Album",
      "1994", "a comment", track = 7, genre = 17)
    val v1 = Mp3.withId3v1(mp3, "T", "A", "B", "2001",
      "thirty-char-comment-padding ok", genre = 255)
    val rows = Mp3.id3v1Scan(df(1L -> v11, 2L -> v1, 3L -> mp3,
      4L -> "short".getBytes("UTF-8")), "id", "content")
      .orderBy("id").collect()
    assert(rows(0).getAs[String]("title") === "My Title")
    assert(rows(0).getAs[String]("artist") === "The Artist")
    assert(rows(0).getAs[String]("year") === "1994")
    assert(rows(0).getAs[String]("comment") === "a comment")
    assert(rows(0).getAs[Int]("track") === 7)
    assert(rows(0).getAs[Int]("genre") === 17)
    assert(rows(0).getAs[Boolean]("present"))
    assert(rows(1).getAs[Int]("track") === -1) // plain v1
    assert(rows(1).getAs[String]("comment") ===
      "thirty-char-comment-padding ok")
    assert(rows(1).getAs[Int]("genre") === 255)
    assert(!rows(2).getAs[Boolean]("present"))
    assert(!rows(3).getAs[Boolean]("present"))
    // TAG anywhere but the last 128 bytes is NOT a trailer
    val midTag = v11 ++ Array.fill[Byte](40)(0x55)
    val mid = Mp3.id3v1Scan(df(9L -> midTag), "id", "content")
      .collect()(0)
    assert(!mid.getAs[Boolean]("present"))
  }

  test("MP3 stream walk: byte-equal to the buffered walk on the " +
      "whole honesty matrix — CBR, VBR, Xing, ID3v2-tagged, " +
      "truncated, drifting, id3v1-trailed, garbage — including a " +
      "dribbling one-byte stream, with one frame resident") {
    val cases = Seq[Array[Byte]](
      Mp3.buildMp3(3, 0, Seq.fill(5)(5), mono = true), // CBR MPEG-1
      Mp3.buildMp3(2, 1, Seq(3, 5, 7, 5), mono = false), // VBR MPEG-2
      Mp3.buildMp3(3, 0, Seq.fill(4)(5), mono = true,
        xingFrames = 4L), // Xing count in frame 0
      Mp3.buildMp3(3, 0, Seq.fill(3)(5), mono = true, id3Bytes = 64,
        id3Frames = Seq("TIT2" -> "t"), id3Major = 4), // ID3v2 skip
      Mp3.buildMp3(0, 2, Seq.fill(3)(8), mono = true), // MPEG-2.5
      Mp3.buildMp3(3, 0, Seq.fill(5)(5), mono = true).dropRight(7),
      Mp3.buildMp3(3, 0, Seq.fill(2)(5), mono = true) ++
        Mp3.buildMp3(2, 1, Seq.fill(2)(5), mono = true), // drift
      Mp3.withId3v1(Mp3.buildMp3(3, 0, Seq.fill(3)(5), mono = true),
        "t", "a", "al", "1999", "", -1, 0), // trailer: both refuse
      Mp3.buildMp3(3, 0, Seq.fill(3)(5), mono = true).take(2),
      "ID3".getBytes("UTF-8"), // shorter than the tag header
      Array[Byte](), Array.fill[Byte](64)(0x11))
    for (b <- cases) {
      val buffered = Mp3.parseMp3(b)
      assert(Mp3.parseMp3Stream(
        new java.io.ByteArrayInputStream(b)) === buffered)
      val dribble = new java.io.InputStream {
        private var i = 0
        override def read(): Int =
          if (i >= b.length) -1
          else { val v = b(i) & 0xFF; i += 1; v }
        override def read(buf: Array[Byte], off: Int, len: Int): Int = {
          if (i >= b.length) return -1
          buf(off) = b(i); i += 1; 1
        }
        override def skip(n: Long): Long = 0L // force the read path
      }
      assert(Mp3.parseMp3Stream(dribble) === buffered)
    }
    // at least the happy paths must actually parse
    assert(Mp3.parseMp3Stream(new java.io.ByteArrayInputStream(
      Mp3.buildMp3(3, 0, Seq.fill(5)(5), mono = true))).isDefined)
    assert(Mp3.parseMp3Stream(new java.io.ByteArrayInputStream(
      Mp3.buildMp3(3, 0, Seq.fill(4)(5), mono = true,
        xingFrames = 4L))).get.xingFrames === 4L)
  }
}
