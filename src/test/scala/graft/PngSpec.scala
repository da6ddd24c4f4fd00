package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Multimodal, Png}

/** PNG — the bit-exact compressed-image rung: chunk grammar with CRC
  * verification, inflate + all five unfilter branches, the five color
  * types, text-chunk provenance, ImageIO raster parity, and the
  * honesty matrix (bad signature, CRC mismatch, truncation, interlace,
  * non-8-bit depth, wrong inflated size, out-of-palette index,
  * malformed text). Every payload is REAL bytes — the library
  * encoder's output or hand-corrupted/hand-assembled variants.
  */
class PngSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // ---- hand-assembly helpers (hostile / minimal payloads) ------------

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tb = ctype.getBytes("US-ASCII")
    crc.update(tb); crc.update(data)
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write((len >> 24) & 0xFF); out.write((len >> 16) & 0xFF)
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(tb); out.write(data)
    val c = crc.getValue
    out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
    out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, depth: Int, ct: Int,
      interlace: Int): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = ((w >> 24) & 0xFF).toByte; d(1) = ((w >> 16) & 0xFF).toByte
    d(2) = ((w >> 8) & 0xFF).toByte; d(3) = (w & 0xFF).toByte
    d(4) = ((h >> 24) & 0xFF).toByte; d(5) = ((h >> 16) & 0xFF).toByte
    d(6) = ((h >> 8) & 0xFF).toByte; d(7) = (h & 0xFF).toByte
    d(8) = depth.toByte; d(9) = ct.toByte
    d(12) = interlace.toByte
    d
  }

  private val sig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def assemble(chunks: Array[Byte]*): Array[Byte] =
    sig ++ chunks.flatten

  /** Re-find a chunk's data offset by type (first occurrence). */
  private def chunkDataOffset(b: Array[Byte], ctype: String): Int = {
    val pat = ctype.getBytes("US-ASCII")
    var pos = 8
    while (pos + 12 <= b.length) {
      val len = ((b(pos) & 0xFF) << 24) | ((b(pos + 1) & 0xFF) << 16) |
        ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      if (pat.indices.forall(j => b(pos + 4 + j) == pat(j)))
        return pos + 8
      pos += 12 + len
    }
    fail(s"chunk $ctype not found")
  }

  /** Patch one byte inside a chunk's data and FIX its CRC (a valid
    * file carrying the hostile value, not a CRC error).
    */
  private def patchChunk(b: Array[Byte], ctype: String, rel: Int,
      v: Byte): Array[Byte] = {
    val out = b.clone()
    val dataOff = chunkDataOffset(out, ctype)
    val lenOff = dataOff - 8
    val len = ((out(lenOff) & 0xFF) << 24) |
      ((out(lenOff + 1) & 0xFF) << 16) |
      ((out(lenOff + 2) & 0xFF) << 8) | (out(lenOff + 3) & 0xFF)
    out(dataOff + rel) = v
    val crc = new java.util.zip.CRC32()
    crc.update(out, dataOff - 4, 4 + len)
    val c = crc.getValue
    out(dataOff + len) = ((c >> 24) & 0xFF).toByte
    out(dataOff + len + 1) = ((c >> 16) & 0xFF).toByte
    out(dataOff + len + 2) = ((c >> 8) & 0xFF).toByte
    out(dataOff + len + 3) = (c & 0xFF).toByte
    out
  }

  // ---- fixtures -------------------------------------------------------

  private def graySamples(id: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(p => ((id * 7 + p * 13) % 256).toByte)

  private val palette = Array.tabulate(16)(i =>
    (((i * 23) % 256) << 16) | (((i * 47) % 256) << 8) | ((i * 91) % 256))

  test("round trip: all five color types + all five filters decode " +
      "to exactly the planted samples; stats are the closed form") {
    val w = 16; val h = 8; val n = w * h
    // gray, filters cycling 0..4
    val g = Png.buildPng(w, h, 0, graySamples(3L, n),
      filterOf = y => y % 5)
    val Some((gw, gh, grgb)) = Png.decodeRgb(g, 1 << 26)
    assert((gw, gh) === (w, h))
    (0 until n).foreach { p =>
      val v = ((3L * 7 + p * 13) % 256).toInt
      assert((grgb(3 * p) & 0xFF) === v)
      assert((grgb(3 * p + 1) & 0xFF) === v)
      assert((grgb(3 * p + 2) & 0xFF) === v)
    }
    // rgb
    val rgbS = Array.tabulate(3 * n)(i => ((i * 31 + 7) % 256).toByte)
    val c = Png.buildPng(w, h, 2, rgbS, filterOf = y => (y + 2) % 5)
    val Some((_, _, crgb)) = Png.decodeRgb(c, 1 << 26)
    assert(crgb.toSeq === rgbS.toSeq)
    // palette
    val idx = Array.tabulate(n)(p => ((p * p + 5) % 16).toByte)
    val pal = Png.buildPng(w, h, 3, idx, palette = palette,
      filterOf = y => (y + 4) % 5)
    val Some((_, _, prgb)) = Png.decodeRgb(pal, 1 << 26)
    (0 until n).foreach { p =>
      val rgb = palette(idx(p) & 0xFF)
      assert((prgb(3 * p) & 0xFF) === ((rgb >> 16) & 0xFF))
      assert((prgb(3 * p + 1) & 0xFF) === ((rgb >> 8) & 0xFF))
      assert((prgb(3 * p + 2) & 0xFF) === (rgb & 0xFF))
    }
    // gray+alpha: alpha carried, ignored
    val ga = Array.tabulate(2 * n)(i =>
      (if (i % 2 == 0) (i * 13 + 1) % 256 else (i * 3) % 256).toByte)
    val gaP = Png.buildPng(w, h, 4, ga, filterOf = y => (y + 1) % 5)
    val Some((_, _, gargb)) = Png.decodeRgb(gaP, 1 << 26)
    (0 until n).foreach { p =>
      val v = ga(2 * p) & 0xFF
      assert((gargb(3 * p) & 0xFF) === v)
      assert((gargb(3 * p + 2) & 0xFF) === v)
    }
    // rgba
    val rgba = Array.tabulate(4 * n)(i => ((i * 29 + 11) % 256).toByte)
    val rp = Png.buildPng(w, h, 6, rgba, filterOf = y => (y + 3) % 5)
    val Some((_, _, rrgb)) = Png.decodeRgb(rp, 1 << 26)
    (0 until n).foreach { p =>
      assert((rrgb(3 * p) & 0xFF) === (rgba(4 * p) & 0xFF))
      assert((rrgb(3 * p + 1) & 0xFF) === (rgba(4 * p + 1) & 0xFF))
      assert((rrgb(3 * p + 2) & 0xFF) === (rgba(4 * p + 2) & 0xFF))
    }
    // the Spark stats projection over the gray payload
    val stats = Png.pngStats(df(1L -> g), "id", "content").collect()
    assert(stats.length === 1)
    val sums = (0 until n).map(p => 3 * ((3L * 7 + p * 13) % 256))
    val r = stats.head
    assert(r.getAs[Long]("luma_total") === sums.sum)
    assert(r.getAs[Long]("px_max") === sums.max)
    assert(r.getAs[Long]("px_min") === sums.min)
  }

  test("ImageIO raster parity: the hand decoder and the JVM's PNG " +
      "reader return identical pixels for every color type and " +
      "mixed filters") {
    val w = 13; val h = 7; val n = w * h // odd dims: exercise strides
    val payloads = Seq(
      Png.buildPng(w, h, 0, graySamples(9L, n), filterOf = y => y % 5),
      Png.buildPng(w, h, 2,
        Array.tabulate(3 * n)(i => ((i * 17 + 3) % 256).toByte),
        filterOf = y => (y * 2) % 5),
      Png.buildPng(w, h, 3,
        Array.tabulate(n)(p => ((p * 7) % 16).toByte),
        palette = palette, filterOf = y => (y + 1) % 5),
      Png.buildPng(w, h, 4,
        Array.tabulate(2 * n)(i => ((i * 11 + 5) % 256).toByte),
        filterOf = y => (y * 3) % 5),
      Png.buildPng(w, h, 6,
        Array.tabulate(4 * n)(i => ((i * 23 + 9) % 256).toByte),
        filterOf = y => (y * 4 + 2) % 5))
    payloads.zip(Seq(0, 2, 3, 4, 6)).foreach { case (b, ct) =>
      val Some((dw, dh, rgb)) = Png.decodeRgb(b, 1 << 26)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b))
      assert(bi.getWidth === dw && bi.getHeight === dh)
      (0 until dh).foreach { y =>
        (0 until dw).foreach { x =>
          val p = y * dw + x
          if (ct == 0 || ct == 4) {
            // gray rasters: compare the RAW sample — getRGB on
            // TYPE_BYTE_GRAY color-manages linear gray into sRGB
            val v = bi.getRaster.getSample(x, y, 0)
            assert(v === (rgb(3 * p) & 0xFF), s"gray ($x,$y) ct=$ct")
          } else {
            val px = bi.getRGB(x, y)
            assert(((px >> 16) & 0xFF) === (rgb(3 * p) & 0xFF),
              s"red ($x,$y) ct=$ct")
            assert(((px >> 8) & 0xFF) === (rgb(3 * p + 1) & 0xFF),
              s"green ($x,$y) ct=$ct")
            assert((px & 0xFF) === (rgb(3 * p + 2) & 0xFF),
              s"blue ($x,$y) ct=$ct")
          }
        }
      }
    }
  }

  test("meta scan: dims, depth, color type, chunk census, IDAT " +
      "bytes, text count; every CRC verified") {
    val b = Png.buildPng(16, 8, 2,
      Array.tabulate(3 * 128)(i => (i % 251).toByte),
      filterOf = y => y % 5,
      texts = Seq(("Software", "graft", "text"),
        ("parameters", "steps=20", "ztxt")))
    val m = Png.pngMetaScan(df(1L -> b), "id", "content").collect().head
    assert(m.getAs[Long]("width") === 16L)
    assert(m.getAs[Long]("height") === 8L)
    assert(m.getAs[Long]("bit_depth") === 8L)
    assert(m.getAs[Long]("color_type") === 2L)
    assert(!m.getAs[Boolean]("interlaced"))
    assert(m.getAs[Long]("chunks") === 5L) // IHDR IDAT tEXt zTXt IEND
    assert(m.getAs[Long]("text_chunks") === 2L)
    assert(m.getAs[Long]("idat_bytes") > 0L)
    assert(m.getAs[Boolean]("parsed"))
  }

  test("text chunks: tEXt, zTXt (real deflate), iTXt plain and " +
      "compressed all round trip, including non-ASCII UTF-8") {
    val texts = Seq(
      ("Software", "graft 1.0", "text"),
      ("parameters", "steps=30 cfg=7 seed=42", "ztxt"),
      ("Comment", "café ☃ transcript", "itxt"),
      ("Description", "compressed café", "itxtz"))
    val b = Png.buildPng(4, 4, 0, graySamples(1L, 16), texts = texts)
    val rows = Png.pngTextChunks(df(7L -> b), "id", "content")
      .orderBy("keyword").collect()
    assert(rows.length === 4)
    val byKw = rows.map(r => r.getAs[String]("keyword") ->
      (r.getAs[String]("text"), r.getAs[String]("kind"))).toMap
    assert(byKw("Software") === (("graft 1.0", "text")))
    assert(byKw("parameters") === (("steps=30 cfg=7 seed=42", "ztxt")))
    assert(byKw("Comment") === (("café ☃ transcript", "itxt")))
    assert(byKw("Description") === (("compressed café", "itxt")))
  }

  test("honesty: bad signature, CRC mismatch, truncation, missing " +
      "IEND all refuse the parse") {
    val good = Png.buildPng(8, 8, 0, graySamples(2L, 64))
    val badSig = good.clone(); badSig(1) = 'Q'.toByte
    val badCrc = good.clone()
    badCrc(chunkDataOffset(badCrc, "IDAT")) =
      (badCrc(chunkDataOffset(badCrc, "IDAT")) ^ 0x40).toByte
    val truncated = good.take(good.length - 20)
    val noIend = good.take(good.length - 12)
    val rows = Png.pngMetaScan(df(1L -> badSig, 2L -> badCrc,
      3L -> truncated, 4L -> noIend, 5L -> good), "id", "content")
      .orderBy("id").collect()
    assert(rows.map(_.getAs[Boolean]("parsed")).toSeq ===
      Seq(false, false, false, false, true))
  }

  test("honesty: interlace parses as metadata but refuses decode; " +
      "patched depth/height refuse decode (inflated size mismatch); " +
      "out-of-palette index refuses; oversized pixels refuse") {
    val good = Png.buildPng(8, 8, 0, graySamples(4L, 64))
    val interlaced = patchChunk(good, "IHDR", 12, 1.toByte)
    val m = Png.pngMetaScan(df(1L -> interlaced), "id", "content")
      .collect().head
    assert(m.getAs[Boolean]("parsed") && m.getAs[Boolean]("interlaced"))
    assert(Png.decodeRgb(interlaced, 1 << 26).isEmpty)
    val depth16 = patchChunk(good, "IHDR", 8, 16.toByte)
    assert(Png.decodeRgb(depth16, 1 << 26).isEmpty)
    val taller = patchChunk(good, "IHDR", 7, 9.toByte) // h 8 -> 9
    assert(Png.decodeRgb(taller, 1 << 26).isEmpty)
    // 1x1 palette image indexing entry 1 of a 1-entry palette
    val hostile = assemble(
      chunk("IHDR", ihdr(1, 1, 8, 3, 0)),
      chunk("PLTE", Array[Byte](10, 20, 30)),
      chunk("IDAT", deflate(Array[Byte](0, 1))),
      chunk("IEND", Array.emptyByteArray))
    assert(Png.parsePng(hostile).isDefined)
    assert(Png.decodeRgb(hostile, 1 << 26).isEmpty)
    // maxPixelBytes refuses BEFORE allocating
    assert(Png.decodeRgb(good, 100).isEmpty)
  }

  test("honesty: interleaved IDAT (non-consecutive) and an IDAT " +
      "stream inflating to the wrong size refuse; malformed text " +
      "chunks emit nothing without failing the file") {
    val raw = Array.tabulate(8 * (1 + 8))(i =>
      (if (i % 9 == 0) 0 else i % 251).toByte)
    val z = deflate(raw)
    val interleaved = assemble(
      chunk("IHDR", ihdr(8, 8, 8, 0, 0)),
      chunk("IDAT", z.take(4)),
      chunk("tEXt", "k\u0000v".getBytes("ISO-8859-1")),
      chunk("IDAT", z.drop(4)),
      chunk("IEND", Array.emptyByteArray))
    assert(Png.parsePng(interleaved).isEmpty)
    // stream inflates to 71 bytes, 72 expected
    val short = assemble(
      chunk("IHDR", ihdr(8, 8, 8, 0, 0)),
      chunk("IDAT", deflate(raw.take(71))),
      chunk("IEND", Array.emptyByteArray))
    assert(Png.parsePng(short).isDefined)
    assert(Png.decodeRgb(short, 1 << 26).isEmpty)
    // text chunk without a NUL separator: skipped, file fine
    val badText = assemble(
      chunk("IHDR", ihdr(8, 8, 8, 0, 0)),
      chunk("IDAT", z),
      chunk("tEXt", "nonul".getBytes("ISO-8859-1")),
      chunk("IEND", Array.emptyByteArray))
    assert(Png.parsePng(badText).isDefined)
    assert(Png.pngTextChunks(df(1L -> badText), "id", "content")
      .count() === 0L)
    // over-cap zTXt drops the CHUNK, never truncates
    val big = Png.buildPng(4, 4, 0, graySamples(5L, 16),
      texts = Seq(("k", "x" * 4096, "ztxt")))
    assert(Png.pngTextChunks(df(1L -> big), "id", "content",
      maxTextBytes = 64).count() === 0L)
    assert(Png.pngTextChunks(df(1L -> big), "id", "content")
      .count() === 1L)
  }

  test("honesty: a zero-length FIRST IDAT followed by another chunk " +
      "then more IDATs still violates consecutiveness and refuses; " +
      "an empty zTXt payload emits an EMPTY string, not a drop") {
    val raw = Array.tabulate(8 * (1 + 8))(i =>
      (if (i % 9 == 0) 0 else i % 251).toByte)
    val z = deflate(raw)
    val emptyFirst = assemble(
      chunk("IHDR", ihdr(8, 8, 8, 0, 0)),
      chunk("IDAT", Array.emptyByteArray),
      chunk("tEXt", "k v".getBytes("ISO-8859-1")),
      chunk("IDAT", z),
      chunk("IEND", Array.emptyByteArray))
    assert(Png.parsePng(emptyFirst).isEmpty)
    val emptyZtxt = assemble(
      chunk("IHDR", ihdr(8, 8, 8, 0, 0)),
      chunk("IDAT", z),
      chunk("zTXt", "k".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
        deflate(Array.emptyByteArray)),
      chunk("IEND", Array.emptyByteArray))
    val rows = Png.pngTextChunks(df(1L -> emptyZtxt), "id", "content")
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("keyword") === "k")
    assert(rows(0).getAs[String]("text") === "")
    assert(rows(0).getAs[String]("kind") === "ztxt")
  }

  test("image-family bridge: pngFrameImages emits the canonical BMP " +
      "of the decoded pixels — luminance grids (hence every hash) " +
      "match the BMP of the same pixels bit-for-bit") {
    val v = Array.tabulate(72)(i =>
      ((11L * 2654435761L + i.toLong * i * 11 + i * (11L % 251)) % 256)
        .toInt)
    // RGB with equal channels, NOT color type 0: ImageIO hands gray
    // PNGs to the color-managed TYPE_BYTE_GRAY path, where getRGB
    // remaps values — an RGB raster round-trips exactly
    val png = Png.buildPng(9, 8, 2,
      v.flatMap(x => Array(x.toByte, x.toByte, x.toByte)),
      filterOf = y => (y + 3) % 5)
    val bgr = new Array[Byte](3 * 72)
    v.indices.foreach { p =>
      bgr(3 * p) = v(p).toByte; bgr(3 * p + 1) = v(p).toByte
      bgr(3 * p + 2) = v(p).toByte
    }
    val bmp = Multimodal.buildBmp(9, 8, bgr)
    val bridged = Png.pngFrameImages(df(1L -> png), "id", "content")
      .collect().head
    assert(bridged.getAs[Boolean]("decoded"))
    assert(bridged.getAs[Array[Byte]]("bmp").toSeq === bmp.toSeq)
    val grids = Multimodal.luminanceGrids(
      df(1L -> png, 2L -> bmp), "id", "content").collect()
      .map(g => g.id -> g.grid).toMap
    assert(grids(1L) === grids(2L))
    assert(grids(1L).flatten === v.toSeq) // 9x8 image: grid == pixels
  }

  // ---- APNG: the animated rung --------------------------------------

  private def fctl(seq: Long, w: Int, h: Int, x: Int = 0, y: Int = 0,
      delayNum: Int = 4, delayDen: Int = 100, dispose: Int = 0,
      blend: Int = 0): Array[Byte] = {
    val d = new Array[Byte](26)
    def w32(o: Int, v: Long): Unit = {
      d(o) = ((v >> 24) & 0xFF).toByte; d(o + 1) = ((v >> 16) & 0xFF).toByte
      d(o + 2) = ((v >> 8) & 0xFF).toByte; d(o + 3) = (v & 0xFF).toByte
    }
    w32(0, seq); w32(4, w); w32(8, h); w32(12, x); w32(16, y)
    d(20) = ((delayNum >> 8) & 0xFF).toByte; d(21) = (delayNum & 0xFF).toByte
    d(22) = ((delayDen >> 8) & 0xFF).toByte; d(23) = (delayDen & 0xFF).toByte
    d(24) = dispose.toByte; d(25) = blend.toByte
    d
  }

  private def actl(n: Long): Array[Byte] = {
    val d = new Array[Byte](8)
    d(0) = ((n >> 24) & 0xFF).toByte; d(1) = ((n >> 16) & 0xFF).toByte
    d(2) = ((n >> 8) & 0xFF).toByte; d(3) = (n & 0xFF).toByte
    d
  }

  private def fdat(seq: Long, z: Array[Byte]): Array[Byte] = {
    val d = new Array[Byte](4 + z.length)
    d(0) = ((seq >> 24) & 0xFF).toByte; d(1) = ((seq >> 16) & 0xFF).toByte
    d(2) = ((seq >> 8) & 0xFF).toByte; d(3) = (seq & 0xFF).toByte
    System.arraycopy(z, 0, d, 4, z.length)
    d
  }

  private def rawGray(w: Int, h: Int, px: Int => Int): Array[Byte] =
    Array.tabulate(h * (1 + w))(i =>
      (if (i % (1 + w) == 0) 0 else px(
        (i / (1 + w)) * w + i % (1 + w) - 1)).toByte)

  test("APNG round trip: palette and RGB forms decode to exactly the " +
      "planted per-frame luma; filters vary per frame and row; fdAT " +
      "streams are split and re-concatenated; duration is the fcTL " +
      "closed form") {
    val n = 11
    val idxFrames = (0 until n).map(f => Array.tabulate(32)(p =>
      ((5 * 7 + f * 5 + p * p) % 16).toByte))
    val pal = palette
    val expectedLuma = idxFrames.map(_.map { ix =>
      val rgb = pal(ix & 0xFF)
      ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
    }.map(_.toLong).sum)
    val apngPal = Png.buildApng(8, 4, 3, idxFrames, palette = pal,
      filterOf = f => y => (f + y) % 5)
    val rgbFrames = idxFrames.map(_.flatMap { ix =>
      val rgb = pal(ix & 0xFF)
      Array(((rgb >> 16) & 0xFF).toByte, ((rgb >> 8) & 0xFF).toByte,
        (rgb & 0xFF).toByte)
    })
    val apngRgb = Png.buildApng(8, 4, 2, rgbFrames,
      filterOf = f => y => (f + y + 2) % 5)
    Seq(apngPal, apngRgb).foreach { b =>
      val Some(v) = Png.decodeAnimLuma(7L, b, nSamples = n,
        maxFrameBytes = 1 << 20)
      assert(v.nFrames === n.toLong)
      assert(v.durationMs === n * 40L)
      assert(v.lumaSums === expectedLuma)
      assert((v.width, v.height) === ((8, 4)))
    }
    // a still PNG parses as METADATA but is not a video
    val still = Png.buildPng(8, 4, 0, graySamples(1L, 32))
    assert(Png.parsePng(apngPal).isDefined) // APNG is a valid still too
    assert(Png.decodeAnimLuma(1L, still, 11, 1 << 20).isEmpty)
  }

  test("APNG cross-codec: an AVI, a GIF and an APNG of the SAME " +
      "pixels pair at distance 0 through videoSigsAuto") {
    import graft.operators.{Gif, Video}
    val pal = palette
    val n = 66
    val idxFrames = (0 until n).map(f => Array.tabulate(32)(p =>
      ((3 * 7 + f * 5 + p * p) % 16).toByte))
    val bgrFrames = idxFrames.map { ix =>
      val bgr = new Array[Byte](96)
      ix.indices.foreach { p =>
        val rgb = pal(ix(p) & 0xFF)
        bgr(3 * p) = (rgb & 0xFF).toByte
        bgr(3 * p + 1) = ((rgb >> 8) & 0xFF).toByte
        bgr(3 * p + 2) = ((rgb >> 16) & 0xFF).toByte
      }
      bgr
    }
    val avi = Video.buildUncompressedAvi(8, 4, bgrFrames, 40000L)
    val gif = Gif.buildGif(8, 4, pal, idxFrames, delayCs = 4)
    val apng = Png.buildApng(8, 4, 3, idxFrames, palette = pal,
      filterOf = f => y => (f + y) % 5)
    val pairs = Video.videoNearDupPairsAuto(
      df(10L -> avi, 11L -> gif, 12L -> apng), "id", "content",
      maxDistance = 0).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("distance"))).sorted
    assert(pairs === Seq((10L, 11L, 0L), (10L, 12L, 0L),
      (11L, 12L, 0L)))
  }

  test("APNG honesty: offset/partial rects, dispose/blend ops, " +
      "broken sequence numbers, frame-count mismatch, fdAT before " +
      "IDAT all refuse; a default image EXCLUDED from the animation " +
      "decodes only the declared frames") {
    val z = deflate(rawGray(4, 2, p => (p * 17 + 3) % 256))
    val z2 = deflate(rawGray(4, 2, p => (p * 29 + 1) % 256))
    def base(chs: Array[Byte]*): Array[Byte] =
      assemble((Seq(chunk("IHDR", ihdr(4, 2, 8, 0, 0))) ++ chs ++
        Seq(chunk("IEND", Array.emptyByteArray))): _*)
    // well-formed: fcTL before IDAT -> frame 0 is the default image
    val good = base(chunk("acTL", actl(2)), chunk("fcTL", fctl(0, 4, 2)),
      chunk("IDAT", z), chunk("fcTL", fctl(1, 4, 2)),
      chunk("fdAT", fdat(2, z2)))
    assert(Png.decodeAnimLuma(1L, good, 2, 1 << 20).nonEmpty)
    // default image NOT part of the animation: one declared frame
    val skipDefault = base(chunk("acTL", actl(1)), chunk("IDAT", z),
      chunk("fcTL", fctl(0, 4, 2)), chunk("fdAT", fdat(1, z2)))
    val Some(sd) = Png.decodeAnimLuma(1L, skipDefault, 1, 1 << 20)
    assert(sd.nFrames === 1L)
    val z2Luma = rawGray(4, 2, p => (p * 29 + 1) % 256)
      .zipWithIndex.filter(_._2 % 5 != 0).map(x => 3L * (x._1 & 0xFF)).sum
    assert(sd.lumaSums === Seq(z2Luma))
    // honesty matrix
    val offset = base(chunk("acTL", actl(2)), chunk("fcTL", fctl(0, 4, 2)),
      chunk("IDAT", z), chunk("fcTL", fctl(1, 2, 2, x = 1)),
      chunk("fdAT", fdat(2, deflate(rawGray(2, 2, _ => 7)))))
    assert(Png.decodeAnimLuma(1L, offset, 2, 1 << 20).isEmpty)
    val dispose = base(chunk("acTL", actl(2)),
      chunk("fcTL", fctl(0, 4, 2)), chunk("IDAT", z),
      chunk("fcTL", fctl(1, 4, 2, dispose = 1)),
      chunk("fdAT", fdat(2, z2)))
    assert(Png.decodeAnimLuma(1L, dispose, 2, 1 << 20).isEmpty)
    val blend = base(chunk("acTL", actl(2)),
      chunk("fcTL", fctl(0, 4, 2)), chunk("IDAT", z),
      chunk("fcTL", fctl(1, 4, 2, blend = 1)),
      chunk("fdAT", fdat(2, z2)))
    assert(Png.decodeAnimLuma(1L, blend, 2, 1 << 20).isEmpty)
    val badSeq = base(chunk("acTL", actl(2)),
      chunk("fcTL", fctl(0, 4, 2)), chunk("IDAT", z),
      chunk("fcTL", fctl(1, 4, 2)), chunk("fdAT", fdat(3, z2)))
    assert(Png.parseApng(badSeq).isEmpty)
    val countMismatch = base(chunk("acTL", actl(3)),
      chunk("fcTL", fctl(0, 4, 2)), chunk("IDAT", z),
      chunk("fcTL", fctl(1, 4, 2)), chunk("fdAT", fdat(2, z2)))
    assert(Png.parseApng(countMismatch).isEmpty)
    val fdatFirst = base(chunk("acTL", actl(1)),
      chunk("fcTL", fctl(0, 4, 2)), chunk("fdAT", fdat(1, z2)),
      chunk("IDAT", z))
    assert(Png.parseApng(fdatFirst).isEmpty)
    // the metadata walk still reports APNGs as valid stills
    assert(Png.parsePng(good).isDefined)
  }
}
