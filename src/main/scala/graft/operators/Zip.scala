package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** ZIP shards as a COLUMN operator — the other way image/document
  * corpora ship (the [[Tar]] counterpart; the path-level streaming
  * form lives in `sources.GeoJsonZipSource`). The walk derives
  * entirely from the published ZIP APPNOTE format and reads the
  * archive the way a CORRECT reader must: find the end-of-central-
  * directory record (signature `PK\5\6`, scanned back through the
  * ≤64 KiB trailing comment), walk the CENTRAL directory (the
  * authoritative member list — local headers alone lie when bit 3
  * data descriptors are in play), then each member's local header
  * for the data offset.
  *
  * ZIP64 archives (>4 GiB, >65,535 entries) are WALKED, not refused:
  * sentinel EOCD fields route through the ZIP64 EOCD locator/record
  * (APPNOTE 4.4.1) and per-entry `0xFFFFFFFF` fields resolve through
  * the 0x0001 extended-information extra, so production-sized image
  * and document archives read like any other shard.
  *
  * Honesty contract: the declared entry count must match the walk,
  * every member's CRC-32 is VERIFIED against its decompressed bytes,
  * stored members must declare equal sizes, and encrypted members,
  * sentinel fields with no ZIP64 record behind them, truncated ZIP64
  * records, unknown compression methods, overlapping/overrunning
  * offsets, or a corrupt deflate stream refuse the WHOLE shard — a
  * half-read archive silently drops members. Directory entries (name
  * ending `/`) are skipped.
  *
  * Design for 100 TB: one shard in memory at a time inside
  * `mapPartitions`; the CD walk is O(#entries); `maxEntryBytes`
  * refuses oversized members BEFORE inflating; deflate inflates to
  * exactly the declared size (wrong-size streams refuse).
  */
object Zip {

  /** One archive member: `path` as stored, decompressed bytes,
    * method (`stored` | `deflate`), central-directory order index.
    */
  case class ZipEntry(id: Long, entryIndex: Long, path: String,
      bytes: Array[Byte], size: Long, method: String)

  /** Explode every file member of every zip payload. Unparseable
    * shards emit nothing.
    */
  def zipEntries(df: DataFrame, idCol: String, binCol: String,
      maxEntryBytes: Int = 1 << 28): DataFrame = {
    require(maxEntryBytes > 0, "maxEntryBytes must be positive")
    implicit val enc = Encoders.product[ZipEntry]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          parseZip(r.getAs[Array[Byte]](1), maxEntryBytes) match {
            case Some(entries) => entries.zipWithIndex.map {
              case ((p, b, m), i) => ZipEntry(id, i.toLong, p, b,
                b.length.toLong, m)
            }
            case None => Nil
          }
        }
    }.toDF().select(col("id"), col("entryIndex").as("entry_index"),
      col("path"), col("bytes"), col("size"), col("method"))
  }

  // ---- imperative internals -------------------------------------------

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Random-access view of one archive — the column operator wraps a
    * byte array, the path-level source (`sources.ZipShardSource`)
    * wraps a seekable Hadoop stream, and BOTH run [[walkZip]], so the
    * honesty contracts cannot drift.
    */
  private[graft] trait ZipReader {
    def length: Long
    /** Read exactly `len` bytes at absolute `at` — throws on EOF. */
    def readFully(at: Long, buf: Array[Byte], off: Int, len: Int): Unit
  }

  private[graft] final class ArrayZipReader(b: Array[Byte])
      extends ZipReader {
    def length: Long = b.length.toLong
    def readFully(at: Long, buf: Array[Byte], off: Int,
        len: Int): Unit = {
      if (at < 0L || at + len > b.length)
        throw new MalformedShardException("read past the archive")
      System.arraycopy(b, at.toInt, buf, off, len)
    }
  }

  private[graft] def parseZip(bytes: Array[Byte],
      maxEntryBytes: Int): Option[Vector[(String, Array[Byte], String)]] = {
    if (bytes == null || bytes.length < 22) return None
    try Some(walkZip(new ArrayZipReader(bytes), maxEntryBytes,
      1 << 28, "<column>").toVector)
    catch { case _: MalformedShardException => None }
  }

  /** The SINGLE ZIP state machine over random access: locate the
    * EOCD (through ≤64 KiB of trailing comment), follow the ZIP64
    * locator/record when sentinel fields demand it, materialize the
    * CENTRAL directory (≤ `maxCdBytes` — the authoritative member
    * list), then per member seek to its local header, read the
    * compressed bytes, inflate to exactly the declared size, and
    * verify the CRC-32. Residency is the CD plus ONE member.
    * Structural violations throw [[MalformedShardException]]; the
    * column operator maps that to emit-nothing.
    */
  private[graft] def walkZip(in: ZipReader, maxEntryBytes: Int,
      maxCdBytes: Int, shard: String)
      : Iterator[(String, Array[Byte], String)] = {
    def fail(why: String): Nothing =
      throw new MalformedShardException(s"$shard: $why")
    val fileLen = in.length
    if (fileLen < 22L) fail("shorter than an EOCD record")
    // tail window: EOCD + up to 64 KiB of comment
    val tailLen = math.min(fileLen, 22L + 0xFFFF).toInt
    val tailAt = fileLen - tailLen
    val tail = new Array[Byte](tailLen)
    in.readFully(tailAt, tail, 0, tailLen)
    var e = tailLen - 22
    var eocdRel = -1
    while (eocdRel < 0 && e >= 0) {
      if (tail(e) == 'P' && tail(e + 1) == 'K' &&
        (tail(e + 2) & 0xFF) == 5 && (tail(e + 3) & 0xFF) == 6 &&
        tailAt + e + 22 + le16(tail, e + 20) == fileLen) eocdRel = e
      else e -= 1
    }
    if (eocdRel < 0) fail("no end-of-central-directory record")
    val eocdAbs = tailAt + eocdRel
    var nEntries = le16(tail, eocdRel + 10).toLong
    if (nEntries != le16(tail, eocdRel + 8)) fail("multi-disk archive")
    var cdSize = le32(tail, eocdRel + 12)
    var cdOff = le32(tail, eocdRel + 16)
    // ZIP64: any sentinel field sends us through the EOCD locator to
    // the ZIP64 EOCD record (the published APPNOTE 4.4.1 escape for
    // >4 GiB archives / >65,535 entries)
    var cdEndAbs = eocdAbs
    if (nEntries == 0xFFFFL || cdSize == 0xFFFFFFFFL ||
      cdOff == 0xFFFFFFFFL) {
      // locator: 20 bytes directly before the EOCD
      val locAbs = eocdAbs - 20
      if (locAbs < 0) fail("sentinel fields without a ZIP64 locator")
      val loc = new Array[Byte](20)
      in.readFully(locAbs, loc, 0, 20)
      if (le32(loc, 0) != 0x07064b50L)
        fail("sentinel fields without a ZIP64 locator")
      if (le32(loc, 4) != 0L) fail("ZIP64 EOCD on another disk")
      if (le32(loc, 16) != 1L) fail("multi-disk archive")
      val z64 = le64(loc, 8)
      if (z64 < 0L || z64 + 56 > locAbs) fail("ZIP64 EOCD out of range")
      val z = new Array[Byte](56)
      in.readFully(z64, z, 0, 56)
      if (le32(z, 0) != 0x06064b50L) fail("bad ZIP64 EOCD signature")
      // record size counts everything after the first 12 bytes; the
      // record must END at the locator (nothing hides between)
      if (z64 + 12 + le64(z, 4) != locAbs) fail("ZIP64 EOCD size lie")
      if (le32(z, 16) != 0L || le32(z, 20) != 0L)
        fail("multi-disk archive")
      nEntries = le64(z, 24)
      if (nEntries != le64(z, 32)) fail("ZIP64 entry-count mismatch")
      if (nEntries < 0L || nEntries > Int.MaxValue.toLong)
        fail("insane ZIP64 entry count")
      cdSize = le64(z, 40)
      cdOff = le64(z, 48)
      if (cdSize < 0L || cdOff < 0L) fail("negative ZIP64 CD fields")
      cdEndAbs = z64
    }
    if (cdOff + cdSize != cdEndAbs)
      fail("central directory does not end at its terminator")
    if (cdSize > maxCdBytes)
      fail(s"central directory of $cdSize bytes over the " +
        s"$maxCdBytes cap")
    val cd = new Array[Byte](cdSize.toInt)
    in.readFully(cdOff, cd, 0, cdSize.toInt)
    val out = Vector
      .newBuilder[(String, Int, Long, Long, Long, Long)]
    val ranges = Vector.newBuilder[(Long, Long)] // member [lho, dataEnd)
    var pos = 0L
    var i = 0L
    while (i < nEntries) {
      if (pos + 46 > cdSize) fail("central directory truncated")
      val o = pos.toInt
      if (le32(cd, o) != 0x02014b50L) fail("bad CD entry signature")
      val flags = le16(cd, o + 8)
      if ((flags & 0x0001) != 0) fail("encrypted member")
      val method = le16(cd, o + 10)
      val crc = le32(cd, o + 16)
      var compSize = le32(cd, o + 20)
      var uncompSize = le32(cd, o + 24)
      val nameLen = le16(cd, o + 28)
      val extraLen = le16(cd, o + 30)
      val commentLen = le16(cd, o + 32)
      var lho = le32(cd, o + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > cdSize)
        fail("CD entry overruns the directory")
      // sentinel fields resolve through the ZIP64 extended-info extra
      // (header id 0x0001): 8-byte values present ONLY for the fields
      // that are 0xFFFFFFFF, in uncomp/comp/offset order
      if (compSize == 0xFFFFFFFFL || uncompSize == 0xFFFFFFFFL ||
        lho == 0xFFFFFFFFL) {
        var e2 = o + 46 + nameLen
        val eEnd = e2 + extraLen
        var found = false
        while (!found && e2 + 4 <= eEnd) {
          val hid = le16(cd, e2)
          val dsz = le16(cd, e2 + 2)
          if (e2 + 4 + dsz > eEnd) fail("extra field overruns")
          if (hid == 0x0001) {
            var f = e2 + 4
            if (uncompSize == 0xFFFFFFFFL) {
              if (f + 8 > e2 + 4 + dsz) fail("short ZIP64 extra")
              uncompSize = le64(cd, f); f += 8
            }
            if (compSize == 0xFFFFFFFFL) {
              if (f + 8 > e2 + 4 + dsz) fail("short ZIP64 extra")
              compSize = le64(cd, f); f += 8
            }
            if (lho == 0xFFFFFFFFL) {
              if (f + 8 > e2 + 4 + dsz) fail("short ZIP64 extra")
              lho = le64(cd, f); f += 8
            }
            found = true
          } else e2 += 4 + dsz
        }
        if (!found) fail("sentinel fields with no ZIP64 extra")
        if (compSize < 0L || uncompSize < 0L || lho < 0L)
          fail("negative ZIP64 member fields")
      }
      val name = new String(cd, o + 46, nameLen, "UTF-8")
      if (!name.endsWith("/")) {
        if (uncompSize > maxEntryBytes)
          fail(s"member of $uncompSize bytes over the " +
            s"$maxEntryBytes cap")
        // deflate worst-case expansion bound: a compSize far beyond
        // it is a crafted field, not compression
        if (compSize > uncompSize + (uncompSize >> 9) + 4096)
          fail("compressed size exceeds the deflate expansion bound")
        // local header: sig + its OWN name/extra lengths (a 30-byte
        // read per member — structure verified UP FRONT so the
        // overlap check can run before any member data is read)
        if (lho + 30 > fileLen) fail("local header out of range")
        val lh = new Array[Byte](30)
        in.readFully(lho, lh, 0, 30)
        if (le32(lh, 0) != 0x04034b50L)
          fail("bad local header signature")
        val dataOff = lho + 30 + le16(lh, 26) + le16(lh, 28)
        if (dataOff + compSize > fileLen) fail("member data overruns")
        ranges += ((lho, dataOff + compSize))
        out += ((name, method, crc, compSize, uncompSize, dataOff))
      }
      pos += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    if (pos != cdSize) fail("central directory shorter than declared")
    // overlapping members: two CD entries pointing into the same
    // local data are a crafted archive, not a packaging accident
    val sorted = ranges.result().sortBy(_._1)
    var j = 1
    while (j < sorted.length) {
      if (sorted(j)._1 < sorted(j - 1)._2)
        fail("overlapping member data")
      j += 1
    }
    // phase 2, LAZY: member bytes read + verified one at a time —
    // residency stays CD + one member whatever the archive size
    out.result().iterator.map {
      case (name, method, crc, compSize, uncompSize, dataOff) =>
        val comp = new Array[Byte](compSize.toInt)
        in.readFully(dataOff, comp, 0, compSize.toInt)
        if (method == 0) {
          if (compSize != uncompSize)
            fail("stored member with unequal sizes")
          if (!crcOk(comp, crc)) fail("member CRC mismatch")
          (name, comp, "stored")
        } else if (method == 8) {
          val data = inflateRaw(comp, 0, comp.length,
            uncompSize.toInt).getOrElse(fail("corrupt deflate stream"))
          if (!crcOk(data, crc)) fail("member CRC mismatch")
          (name, data, "deflate")
        } else fail(s"unknown compression method $method")
    }
  }

  private def crcOk(data: Array[Byte], declared: Long): Boolean = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue == declared
  }

  /** Raw (nowrap) inflate to EXACTLY `expected` bytes. */
  private def inflateRaw(bytes: Array[Byte], off: Int, len: Int,
      expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, off, len)
      val out = new Array[Byte](expected)
      var pos = 0
      while (!inf.finished()) {
        val n =
          try inf.inflate(out, pos, expected - pos)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (inf.needsDictionary()) return None
        pos += n
        if (n == 0 && !inf.finished()) {
          if (pos == expected) {
            // either exactly done (finished on next probe) or overrun
            val probe = new Array[Byte](1)
            val extra =
              try inf.inflate(probe)
              catch {
                case _: java.util.zip.DataFormatException => return None
              }
            if (extra > 0 || !inf.finished()) return None
          } else return None // starved mid-stream
        }
      }
      if (pos != expected) None else Some(out)
    } finally inf.end()
  }

  // ---- encoder (round-trip twin; also the fixture/smoke builder) -----

  /** Build a ZIP from (path, bytes, deflate?) members — real CRCs,
    * local headers + central directory + EOCD. With `zip64 = true`
    * the archive ships the FULL ZIP64 shape on small fixture bytes:
    * every CD entry carries sentinel size/offset fields resolved by a
    * 0x0001 extended-info extra, and the classic EOCD's sentinel
    * count/size/offset route through a ZIP64 EOCD record + locator —
    * exactly what a >4 GiB writer emits, exercisable without 4 GiB
    * of fixture.
    */
  def buildZip(entries: Seq[(String, Array[Byte], Boolean)],
      comment: String = "", zip64: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
      bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32(v >>> 32) }
    val recs = entries.map { case (path, data, deflated) =>
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val comp =
        if (!deflated) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          d.setInput(data); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          out.toByteArray
        }
      (path, data, comp, crc.getValue, if (deflated) 8 else 0)
    }
    val offsets = recs.map { case (path, data, comp, crc, method) =>
      val off = bos.size()
      val nb = path.getBytes("UTF-8")
      w32(0x04034b50L)
      w16(20); w16(0); w16(method)
      w16(0); w16(0) // time/date
      w32(crc); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      bos.write(nb); bos.write(comp)
      off
    }
    val cdStart = bos.size()
    recs.zip(offsets).foreach {
      case ((path, data, comp, crc, method), off) =>
        val nb = path.getBytes("UTF-8")
        w32(0x02014b50L)
        w16(if (zip64) 45 else 20); w16(if (zip64) 45 else 20)
        w16(0); w16(method)
        w16(0); w16(0)
        w32(crc)
        if (zip64) { w32(0xFFFFFFFFL); w32(0xFFFFFFFFL) }
        else { w32(comp.length.toLong); w32(data.length.toLong) }
        w16(nb.length)
        w16(if (zip64) 28 else 0) // extra: 0x0001 header + 3 x 8 bytes
        w16(0)
        w16(0); w16(0) // disk, internal attrs
        w32(0L) // external attrs
        if (zip64) w32(0xFFFFFFFFL) else w32(off.toLong)
        bos.write(nb)
        if (zip64) {
          w16(0x0001); w16(24)
          w64(data.length.toLong); w64(comp.length.toLong)
          w64(off.toLong)
        }
    }
    val cdSize = bos.size() - cdStart
    val cb = comment.getBytes("UTF-8")
    if (zip64) {
      val z64Off = bos.size()
      w32(0x06064b50L)
      w64(44L) // record size after the first 12 bytes
      w16(45); w16(45)
      w32(0L); w32(0L) // this disk / CD-start disk
      w64(entries.length.toLong); w64(entries.length.toLong)
      w64(cdSize.toLong); w64(cdStart.toLong)
      // locator
      w32(0x07064b50L)
      w32(0L); w64(z64Off.toLong); w32(1L)
      // classic EOCD, all sentinels
      w32(0x06054b50L)
      w16(0); w16(0)
      w16(0xFFFF); w16(0xFFFF)
      w32(0xFFFFFFFFL); w32(0xFFFFFFFFL)
      w16(cb.length)
      bos.write(cb)
    } else {
      w32(0x06054b50L)
      w16(0); w16(0)
      w16(entries.length); w16(entries.length)
      w32(cdSize.toLong); w32(cdStart.toLong)
      w16(cb.length)
      bos.write(cb)
    }
    bos.toByteArray
  }
}
