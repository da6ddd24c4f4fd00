package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Avif, Gif, Media, Mp4}
import graft.operators.Avif.AvifItem

/** AVIF/HEIF item-property walk: primary-item resolution through
  * pitm/ipma (not "first ispe"), irot/imir handling, both ipma index
  * widths, the honesty matrix, and the unified Media dispatch
  * (family #10) including the prefix path.
  */
class AvifSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("round trip: brands, rotations (displayed dims swap on " +
      "90/270), mirror, codec config, pitm v1 and wide ipma indexes") {
    val cases = Seq(
      (1L, "avif", 640L, 480L, 0, -1, "av1C", false, false),
      (2L, "avif", 640L, 480L, 90, -1, "av1C", false, false),
      (3L, "heic", 320L, 200L, 180, 0, "hvcC", false, false),
      (4L, "heic", 320L, 200L, 270, -1, "hvcC", true, false),
      (5L, "avif", 99L, 77L, 90, 1, "av1C", false, true))
    val rows = Avif.avifMetaScan(df(cases.map { c =>
        c._1 -> Avif.buildAvif(c._2,
          Seq(AvifItem(7L, c._3, c._4, c._5, c._6, c._7)), 7L,
          wideIndexes = c._9, pitmV1 = c._8)
      }: _*), "id", "content")
      .orderBy("id").collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getAs[Boolean]("parsed"), s"id ${c._1}")
      assert(r.getAs[String]("brand") === c._2)
      assert(r.getAs[Long]("primary_item") === 7L)
      assert(r.getAs[Long]("width") === c._3)
      assert(r.getAs[Long]("height") === c._4)
      assert(r.getAs[Int]("rotation") === c._5)
      assert(r.getAs[Boolean]("mirrored") === (c._6 >= 0))
      val swap = c._5 == 90 || c._5 == 270
      assert(r.getAs[Long]("disp_width") === (if (swap) c._4 else c._3))
      assert(r.getAs[Long]("disp_height") === (if (swap) c._3 else c._4))
      assert(r.getAs[String]("codec") ===
        (if (c._7 == "av1C") "av1" else "hevc"))
    }
  }

  test("primary-item resolution: a file carrying a thumbnail item " +
      "with its OWN ispe reports the PRIMARY item's extent, not the " +
      "first one in ipco") {
    val b = Avif.buildAvif("avif", Seq(
      AvifItem(1L, 160L, 90L),     // thumbnail, first in ipco
      AvifItem(2L, 3840L, 2160L)), // the actual image
      primary = 2L)
    val r = Avif.avifMetaScan(df(1L -> b), "id", "content")
      .collect().head
    assert(r.getAs[Boolean]("parsed"))
    assert(r.getAs[Long]("width") === 3840L)
    assert(r.getAs[Long]("height") === 2160L)
    assert(r.getAs[Long]("n_items") === 2L)
  }

  test("honesty: garbage, truncation, missing pitm, a primary item " +
      "with no ipma entry, an out-of-range property index, and a " +
      "missing ispe all refuse — never a guessed dimension") {
    val good = Avif.buildAvif("avif",
      Seq(AvifItem(1L, 64L, 48L)), 1L)
    def parsed(b: Array[Byte]) =
      Avif.avifMetaScan(df(1L -> b), "id", "content")
        .collect().head.getAs[Boolean]("parsed")
    assert(parsed(good))
    assert(!parsed("not an avif at all".getBytes("UTF-8")))
    assert(!parsed(good.take(good.length / 2)))
    // primary item that no ipma entry names
    assert(!parsed(Avif.buildAvif("avif",
      Seq(AvifItem(1L, 64L, 48L)), primary = 9L)))
    // out-of-range 1-based property index: item has 2 props (ispe +
    // av1C); patch its second association index to 60
    val twoProp = Avif.buildAvif("avif",
      Seq(AvifItem(1L, 64L, 48L)), 1L)
    val patched = twoProp.clone()
    // find ipma payload: sig then ver/flags(4) count(4) item(2) n(1)
    val ipmaAt = (0 until patched.length - 4).find(o =>
      new String(patched, o, 4, "US-ASCII") == "ipma").get
    patched(ipmaAt + 4 + 4 + 4 + 2 + 1 + 1) = (0x80 | 60).toByte
    assert(!parsed(patched))
    // no ispe among the primary item's properties: re-point both
    // associations at the av1C property
    val a2 = twoProp.clone()
    val at = (0 until a2.length - 4).find(o =>
      new String(a2, o, 4, "US-ASCII") == "ipma").get
    // item 1 has assocs [1=ispe, 2=av1C]; re-point assoc 1 at av1C
    a2(at + 4 + 4 + 4 + 2 + 1) = (0x80 | 2).toByte
    a2(at + 4 + 4 + 4 + 2 + 2) = (0x80 | 2).toByte
    assert(!parsed(a2))
  }

  test("Media dispatch: AVIF/HEIF route to the image walk inside the " +
      "unified 10-family scan — full AND prefix paths — while movie " +
      "ftyp brands still route to the MP4 walk") {
    val avif = Avif.buildAvif("avif",
      Seq(AvifItem(1L, 800L, 600L, rotation = 90)), 1L)
    val heic = Avif.buildAvif("heix",
      Seq(AvifItem(1L, 1024L, 768L)), 1L)
    val mp4 = Mp4.buildMp4(timescale = 600L, duration = 1200L,
      width = 320, height = 240)
    val gif = Gif.buildGif(4, 3, Array.tabulate(16)(i => i * 0x111111),
      Seq(Array.tabulate[Byte](12)(p => (p % 16).toByte)), delayCs = 5)
    val rows = Media.mediaMetaScan(
      df(1L -> avif, 2L -> heic, 3L -> mp4, 4L -> gif),
      "id", "content").orderBy("id").collect()
    assert(rows.map(_.getAs[String]("container")).toSeq ===
      Seq("avif", "heic", "mp4", "gif"))
    assert(rows(0).getAs[Int]("width") === 600) // 90° display swap
    assert(rows(0).getAs[Int]("height") === 800)
    assert(rows(0).getAs[String]("video_codec") === "av1")
    assert(rows(1).getAs[Int]("width") === 1024)
    assert(rows.forall(_.getAs[Boolean]("parsed")))
    // prefix path: metadata leads the file, so a 256-byte prefix with
    // the true length parses identically
    val pre = Media.mediaMetaScanPrefix(df(1L -> avif, 2L -> heic),
      "id", "content", prefixBytes = 256).orderBy("id").collect()
    assert(pre.map(_.getAs[String]("container")).toSeq ===
      Seq("avif", "heic"))
    assert(pre(0).getAs[Int]("width") === 600)
    assert(pre(0).getAs[Boolean]("parsed"))
  }

  test("item extraction: iinf types + iloc extents resolve every " +
      "item's payload bytes exactly, the primary flag follows pitm, " +
      "and lying tables refuse the whole file") {
    val items = Seq(
      AvifItem(1L, 160L, 90L, itemType = "av01",
        payload = "thumb-bytes".getBytes("UTF-8")),
      AvifItem(2L, 3840L, 2160L, itemType = "av01",
        payload = ("main-payload-" + ("x" * 50)).getBytes("UTF-8")),
      AvifItem(3L, 3840L, 2160L, itemType = "mime",
        payload = """{"xmp":1}""".getBytes("UTF-8")))
    val b = Avif.buildAvif("avif", items, primary = 2L)
    val rows = Avif.avifItemScan(df(1L -> b), "id", "content")
      .orderBy("item_id").collect()
    assert(rows.length === 3)
    rows.zip(items).foreach { case (r, it) =>
      assert(r.getAs[Long]("item_id") === it.itemId)
      assert(r.getAs[String]("item_type") === it.itemType)
      assert(r.getAs[Boolean]("is_primary") === (it.itemId == 2L))
      assert(r.getAs[Long]("size") === it.payload.length.toLong)
      assert(r.getAs[Array[Byte]]("bytes").toSeq === it.payload.toSeq)
    }
    // honesty: an iloc offset running past the file refuses WHOLE
    val evil = b.clone()
    val ilocAt = (0 until evil.length - 4).find(o =>
      new String(evil, o, 4, "US-ASCII") == "iloc").get
    // first item's 4-byte extent offset: ver/flags(4) sizes(2)
    // count(2) item_id(2) dri(2) extents(2) -> offset at +14
    evil(ilocAt + 4 + 4 + 2 + 2 + 2 + 2 + 2) = 0x7F.toByte
    assert(Avif.avifItemScan(df(1L -> evil), "id", "content")
      .count() === 0L)
    // over-cap items refuse, never truncate
    assert(Avif.avifItemScan(df(1L -> b), "id", "content",
      maxItemBytes = 8).count() === 0L)
    // payload dedup composition: two files sharing the main payload
    // hash-equal on the primary item
    import org.apache.spark.sql.functions._
    val twin = Avif.buildAvif("heic", items, primary = 2L)
    val hashes = Avif.avifItemScan(df(1L -> b, 2L -> twin), "id",
        "content")
      .filter(col("is_primary"))
      .select(sha2(col("bytes"), 256).as("h"))
      .distinct().count()
    assert(hashes === 1L)
  }

  test("lying iloc tables: a duplicated item id and an offset pair " +
      "whose Long sum wraps back in-bounds both refuse the whole " +
      "file") {
    def findTag(buf: Array[Byte], t: String): Int =
      (0 until buf.length - 4).find(o =>
        new String(buf, o, 4, "US-ASCII") == t).get
    def be32(buf: Array[Byte], o: Int): Long =
      ((buf(o) & 0xFFL) << 24) | ((buf(o + 1) & 0xFFL) << 16) |
        ((buf(o + 2) & 0xFFL) << 8) | (buf(o + 3) & 0xFFL)

    // duplicate: rename the second iloc record to item 1 — the iinf
    // count still equals the iloc count, so a count-only consistency
    // check passes while item 1's id is emitted twice and item 2's
    // payload is silently never located; must refuse the whole file
    val items = Seq(
      AvifItem(1L, 64L, 64L, itemType = "av01",
        payload = "one".getBytes("UTF-8")),
      AvifItem(2L, 64L, 64L, itemType = "av01",
        payload = "two-payload".getBytes("UTF-8")))
    val dup = Avif.buildAvif("avif", items, primary = 1L).clone()
    val ilocAt = findTag(dup, "iloc")
    // records start at tag+12 (verflags 4, sizes 2, count 2); each is
    // id(2) dri(2) extents(2) off(4) len(4) = 14 bytes
    dup(ilocAt + 26) = 0; dup(ilocAt + 27) = 1
    assert(Avif.avifItemScan(df(1L -> dup), "id", "content")
      .count() === 0L)

    // overflow: splice in a hand-rolled iloc with 8-byte base/offset
    // fields where base = 2^63-16 and offset reads as -2^63+32, so
    // the UNGUARDED sum wraps to at = 16 (in-bounds) and len = 8
    // passes an after-the-fact range check — emitting in-bounds
    // garbage as the item payload. The pre-sum bound must refuse.
    val v = Avif.buildAvif("avif", Seq(AvifItem(1L, 64L, 64L,
      itemType = "av01",
      payload = "payload-bytes".getBytes("UTF-8"))), primary = 1L)
    val vIloc = findTag(v, "iloc")
    val boxStart = vIloc - 4
    val oldSize = be32(v, boxStart).toInt
    val nb = new java.io.ByteArrayOutputStream()
    def w16(x: Int): Unit = { nb.write((x >> 8) & 0xFF); nb.write(x & 0xFF) }
    def w32(x: Long): Unit = { w16(((x >> 16) & 0xFFFF).toInt); w16((x & 0xFFFF).toInt) }
    def w64(x: Long): Unit = { w32(x >>> 32); w32(x & 0xFFFFFFFFL) }
    w32(46L); nb.write("iloc".getBytes("US-ASCII"))
    w32(0L)                     // version 0, flags 0
    nb.write(0x88)              // offset_size 8, length_size 8
    nb.write(0x80)              // base_offset_size 8, reserved
    w16(1)                      // item count
    w16(1); w16(0)              // item id 1, data ref 0
    w64(0x7FFFFFFFFFFFFFF0L)    // base offset: 2^63 - 16
    w16(1)                      // extent count
    w64(0x8000000000000020L)    // extent offset: -2^63 + 32 as Long
    w64(8L)                     // extent length
    val body = nb.toByteArray
    assert(body.length === 46)
    val evil = v.take(boxStart) ++ body ++ v.drop(boxStart + oldSize)
    // grow the parent meta box size by the iloc delta
    val metaAt = findTag(evil, "meta")
    val mSz = be32(evil, metaAt - 4) + (46 - oldSize)
    evil(metaAt - 4) = ((mSz >> 24) & 0xFF).toByte
    evil(metaAt - 3) = ((mSz >> 16) & 0xFF).toByte
    evil(metaAt - 2) = ((mSz >> 8) & 0xFF).toByte
    evil(metaAt - 1) = (mSz & 0xFF).toByte
    assert(Avif.avifItemScan(df(1L -> evil), "id", "content")
      .count() === 0L)
  }
}
