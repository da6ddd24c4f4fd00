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
}
