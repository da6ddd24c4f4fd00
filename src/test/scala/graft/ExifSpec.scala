package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Multimodal

/** EXIF-in-JPEG: the APP1 locator bridged into the TIFF IFD walk —
  * both byte orders, inline and out-of-line ASCII values, the Exif
  * sub-IFD, splicing into REAL JPEGs, and the honesty matrix.
  */
class ExifSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** A real JPEG via the JVM codec (no EXIF — ImageIO writes JFIF). */
  private def realJpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      bi.setRGB(x, y, (seed * 2654435761L + x * 7919 + y * 104729)
        .toInt & 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    bos.toByteArray
  }

  test("round trip both byte orders: orientation, camera strings " +
      "(inline AND out-of-line ASCII), timestamps, ISO, and the Exif " +
      "sub-IFD pixel dims walk back exactly") {
    val rows = Multimodal.parseJpegExifMeta(df(
      1L -> Multimodal.buildJpegExif(6, "Canon", "Canon EOS R5",
        "2023:07:14 10:30:00", "2023:07:14 10:29:58", 400, 8192L,
        5464L, littleEndian = true),
      2L -> Multimodal.buildJpegExif(1, "OM", "X-1", "2020:01:01 00:00:00",
        "2019:12:31 23:59:59", 64, 640L, 480L, littleEndian = false)),
      "id", "content").collect().map(m => m.id -> m).toMap
    val m1 = rows(1L)
    assert(m1.parsed && m1.littleEndian && m1.orientation == 6 &&
      m1.make == "Canon" && m1.model == "Canon EOS R5" &&
      m1.dateTime == "2023:07:14 10:30:00" &&
      m1.dateTimeOriginal == "2023:07:14 10:29:58" && m1.iso == 400 &&
      m1.exifWidth == 8192L && m1.exifHeight == 5464L, m1.toString)
    val m2 = rows(2L)
    assert(m2.parsed && !m2.littleEndian && m2.orientation == 1 &&
      m2.make == "OM" && m2.model == "X-1" && m2.iso == 64 &&
      m2.exifWidth == 640L && m2.exifHeight == 480L, m2.toString)
  }

  test("splice into a REAL JPEG: the spliced image parses its EXIF " +
      "AND still decodes to the identical pixels; the unspliced " +
      "original honestly has no EXIF") {
    val plain = realJpeg(16, 12, 5)
    val spliced = Multimodal.buildJpegExif(8, "graft", "bridge-cam",
      "2024:02:02 02:02:02", "2024:02:02 02:02:01", 125, 16L, 12L,
      littleEndian = true, into = plain)
    val rows = Multimodal.parseJpegExifMeta(
      df(1L -> plain, 2L -> spliced), "id", "content")
      .collect().map(m => m.id -> m).toMap
    assert(!rows(1L).parsed, "JFIF-only JPEG must refuse")
    val m = rows(2L)
    assert(m.parsed && m.orientation == 8 && m.make == "graft" &&
      m.model == "bridge-cam" && m.iso == 125, m.toString)
    // the spliced payload is still a working JPEG with the SAME pixels
    val a = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(plain))
    val b = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(spliced))
    assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    (0 until a.getHeight).foreach(y => (0 until a.getWidth).foreach(x =>
      assert(a.getRGB(x, y) == b.getRGB(x, y), s"pixel ($x,$y)")))
  }

  test("honesty matrix: garbage, truncated APP1, a hostile " +
      "out-of-line offset, and a truncated IFD all refuse; missing " +
      "optional tags report defaults with parsed=true") {
    val good = Multimodal.buildJpegExif(3, "LongMakeName Industries",
      "Model Q", "2021:05:05 05:05:05", "2021:05:05 05:05:04", 200,
      100L, 50L)
    // cut inside the APP1 segment
    val truncated = good.take(40)
    // hostile pool offset: the Make string is out-of-line; point it
    // past the segment end. Its entry is the first in IFD0 — value
    // slot at tiff0 + 8 + 2 + 8 (tag+type+count)
    val hostile = good.clone()
    val tiff0 = 12 // SOI(2) + FF E1 + len(2) + "Exif\0\0"(6)
    val slot = tiff0 + 8 + 2 + 8
    hostile(slot) = 0xFF.toByte; hostile(slot + 1) = 0xFF.toByte
    hostile(slot + 2) = 0.toByte; hostile(slot + 3) = 0.toByte
    // IFD0 claims more entries than the segment holds
    val overrun = good.clone()
    overrun(tiff0 + 8) = 0xFF.toByte
    val rows = Multimodal.parseJpegExifMeta(df(
      1L -> "not a jpeg".getBytes("UTF-8"),
      2L -> truncated, 3L -> hostile, 4L -> overrun, 5L -> good),
      "id", "content").collect().map(m => m.id -> m.parsed).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true), rows.toString)
    // a minimal EXIF with only orientation: defaults + parsed=true
    val minimal = Multimodal.buildJpegExif(5, "", "", "", "", 0, 0L, 0L)
    val m = Multimodal.parseJpegExifMeta(df(1L -> minimal), "id",
      "content").collect().head
    assert(m.parsed && m.orientation == 5 && m.make == "" &&
      m.iso == 0 && m.exifWidth == 0L, m.toString)
  }

  test("jpegExifScan projection: the metadata-filter columns") {
    val r = Multimodal.jpegExifScan(df(
      1L -> Multimodal.buildJpegExif(2, "A", "B", "c", "d", 100, 7L,
        9L, littleEndian = false)), "id", "content").collect().head
    assert(r.getBoolean(10)) // parsed
    assert(!r.getBoolean(1) && r.getInt(2) == 2 &&
      r.getString(3) == "A" && r.getString(4) == "B" &&
      r.getString(5) == "c" && r.getString(6) == "d" &&
      r.getInt(7) == 100 && r.getLong(8) == 7L && r.getLong(9) == 9L)
  }

  test("EXIF-in-WebP: the RIFF chunk walk finds the EXIF chunk " +
      "(raw TIFF and the in-the-wild Exif\\0\\0-prefixed form), " +
      "odd-sized chunks pad; EXIF-less and truncated payloads " +
      "refuse honestly") {
    val tiff = Multimodal.buildExifTiff(3, "Mk", "Md",
      "2021:02:03 04:05:06", "2021:02:03 04:05:05", 200, 11L, 13L)
    val plain = Multimodal.webpWithExif(
      Multimodal.buildWebp("VP8 ", 64, 48), tiff)
    val prefixed = Multimodal.webpWithExif(
      Multimodal.buildWebp("VP8X", 64, 48),
      Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff)
    Seq(plain, prefixed).foreach { b =>
      val Some(m) = Multimodal.parseWebpExif(b)
      assert(m.orientation === 3 && m.make === "Mk" &&
        m.iso === 200 && m.exifWidth === 11L && m.exifHeight === 13L)
    }
    assert(Multimodal.parseWebpExif(
      Multimodal.buildWebp("VP8 ", 64, 48)).isEmpty) // no EXIF chunk
    assert(Multimodal.parseWebpExif(
      plain.take(plain.length - 10)).isEmpty) // chunk overruns RIFF
    assert(Multimodal.parseWebpExif(Multimodal.webpWithExif(
      Multimodal.buildWebp("VP8 ", 64, 48),
      tiff.take(6))).isEmpty) // truncated TIFF
  }

  test("EXIF-in-PNG: the eXIf chunk rides the CRC-verified PNG walk; " +
      "a corrupted chunk CRC refuses the FILE, not just the field") {
    import graft.operators.Png
    val tiff = Multimodal.buildExifTiff(5, "PMk", "PMd",
      "2022:01:01 00:00:01", "2022:01:01 00:00:00", 400, 21L, 23L,
      littleEndian = false)
    val png = Png.buildPng(4, 4, 0,
      Array.tabulate(16)(p => (p * 7).toByte), exif = tiff)
    val Some(m) = Multimodal.parsePngExif(png)
    assert(m.orientation === 5 && !m.littleEndian &&
      m.make === "PMk" && m.iso === 400)
    // no eXIf chunk -> None
    assert(Multimodal.parsePngExif(Png.buildPng(4, 4, 0,
      Array.tabulate(16)(p => (p * 7).toByte))).isEmpty)
    // flip a byte inside the eXIf data: the chunk CRC breaks, the
    // whole walk refuses (the PNG honesty contract)
    val corrupted = png.clone()
    val at = png.length - 12 - 12 - tiff.length + 8 // inside eXIf data
    corrupted(at) = (corrupted(at) ^ 0x55).toByte
    assert(Multimodal.parsePngExif(corrupted).isEmpty)
  }

  test("exifScanAuto: one container-auto scan over a mixed " +
      "JPEG/WebP/PNG corpus; unknown payloads parsed = false") {
    import graft.operators.Png
    def tiff(le: Boolean) = Multimodal.buildExifTiff(2, "X", "Y",
      "2020:05:06 07:08:09", "2020:05:06 07:08:08", 800, 31L, 33L,
      littleEndian = le)
    val rows = Multimodal.exifScanAuto(df(
      1L -> Multimodal.buildJpegExif(2, "X", "Y",
        "2020:05:06 07:08:09", "2020:05:06 07:08:08", 800, 31L, 33L),
      2L -> Multimodal.webpWithExif(
        Multimodal.buildWebp("VP8L", 10, 10), tiff(le = false)),
      3L -> Png.buildPng(2, 2, 0, Array[Byte](1, 2, 3, 4),
        exif = tiff(le = true)),
      4L -> "not an image".getBytes("UTF-8")), "id", "content")
      .orderBy("id").collect()
    assert(rows.map(_.getAs[String]("container")).toSeq ===
      Seq("jpeg", "webp", "png", ""))
    assert(rows.map(_.getAs[Boolean]("parsed")).toSeq ===
      Seq(true, true, true, false))
    rows.take(3).foreach { r =>
      assert(r.getAs[Int]("orientation") === 2)
      assert(r.getAs[Int]("iso") === 800)
      assert(r.getAs[Long]("exif_width") === 31L)
    }
  }

  test("container sniff: a RIFF/WAVE payload is NOT labeled webp — " +
      "the full WEBP fourcc at offset 8 gates the webp walk") {
    val wav = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ new Array[Byte](20)
    val rows = Multimodal.exifScanAuto(df(1L -> wav), "id", "content")
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("container") === "")
    assert(!rows(0).getAs[Boolean]("parsed"))
  }
}
