package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Multimodal

/** WebP header metadata: the three published chunk forms (VP8 lossy
  * start code + 14-bit dims, VP8L signature + bit-packed dims/alpha,
  * VP8X flags + 24-bit canvas), honest refusal beyond metadata, and
  * the sniff integration.
  */
class WebpSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("round trip over all three chunk forms: dims and flags walk " +
      "back exactly; odd 14-bit and 24-bit sizes included") {
    val cases = Seq(
      ("VP8 ", 320, 240, false, false),
      ("VP8 ", 16383, 1, false, false), // 14-bit edge
      ("VP8L", 101, 77, false, false),
      ("VP8L", 5000, 3000, true, false), // alpha bit in the stream
      ("VP8X", 640, 480, false, false),
      ("VP8X", 123, 457, true, true)) // alpha + animation flags
    cases.zipWithIndex.foreach { case ((v, w, h, a, an), i) =>
      val bytes = Multimodal.buildWebp(v, w, h, a, an)
      val r = Multimodal.webpMetaScan(df((i.toLong, bytes)), "id",
        "content").collect().head
      assert(r.getBoolean(6), s"$v $w x $h must parse")
      assert(r.getString(1) == v && r.getLong(2) == w &&
        r.getLong(3) == h && r.getBoolean(4) == a &&
        r.getBoolean(5) == an, s"case $i: $r")
    }
  }

  test("honesty: garbage, a truncated header, a non-WEBP RIFF, a bad " +
      "VP8 start code, and an unknown first chunk are parsed=false; " +
      "pixel decode stays refused (no VP8 codec in the JVM)") {
    val good = Multimodal.buildWebp("VP8 ", 64, 48)
    val garbage = Array.tabulate[Byte](40)(i => (i * 43).toByte)
    val truncated = java.util.Arrays.copyOf(good, 18)
    val wav = good.clone() // RIFF but not WEBP
    "WAVE".getBytes("US-ASCII").copyToArray(wav, 8)
    val badCode = good.clone()
    badCode(23) = 0 // the 0x9D start-code byte
    val unknown = good.clone()
    "ALPH".getBytes("US-ASCII").copyToArray(unknown, 12)
    val rows = Multimodal.webpMetaScan(
      df((1L, garbage), (2L, truncated), (3L, wav), (4L, badCode),
        (5L, unknown), (6L, good)), "id", "content").collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(rows == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> true), rows.toString)
    // decode honesty: the image family refuses WebP pixels
    val dec = Multimodal.decodeImage(df((1L, good)), "id", "content")
      .collect().head
    assert(!dec.decoded, "WebP pixels must not be fabricated")
    // sniff integration: the binary classifies as image/webp
    import org.apache.spark.sql.functions.col
    val mime = df((1L, good))
      .select(Multimodal.sniffContentType(col("content")))
      .collect().head.getString(0)
    assert(mime == "image/webp")
  }
}
