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

  private[graft] def parseZip(bytes: Array[Byte],
      maxEntryBytes: Int): Option[Vector[(String, Array[Byte], String)]] = {
    if (bytes == null || bytes.length < 22) return None
    // EOCD: scan back through at most 64 KiB of comment
    var eocd = -1
    val lo = math.max(0, bytes.length - 22 - 0xFFFF)
    var p = bytes.length - 22
    while (eocd < 0 && p >= lo) {
      if (bytes(p) == 'P' && bytes(p + 1) == 'K' &&
        (bytes(p + 2) & 0xFF) == 5 && (bytes(p + 3) & 0xFF) == 6 &&
        p + 22 + le16(bytes, p + 20) == bytes.length) eocd = p
      else p -= 1
    }
    if (eocd < 0) return None
    var nEntries = le16(bytes, eocd + 10).toLong
    if (nEntries != le16(bytes, eocd + 8)) return None // multi-disk
    var cdSize = le32(bytes, eocd + 12)
    var cdOff = le32(bytes, eocd + 16)
    // ZIP64: any sentinel field sends us through the EOCD locator to
    // the ZIP64 EOCD record (the published APPNOTE 4.4.1 escape for
    // >4 GiB archives / >65,535 entries)
    var cdEnd = eocd.toLong
    if (nEntries == 0xFFFFL || cdSize == 0xFFFFFFFFL ||
      cdOff == 0xFFFFFFFFL) {
      // locator: 20 bytes directly before the EOCD
      val loc = eocd - 20
      if (loc < 0 || le32(bytes, loc) != 0x07064b50L) return None
      if (le32(bytes, loc + 4) != 0L) return None // zip64 EOCD disk
      if (le32(bytes, loc + 16) != 1L) return None // total disks
      val z64 = le64(bytes, loc + 8)
      if (z64 < 0L || z64 > Int.MaxValue.toLong || z64 + 56 > loc)
        return None
      val z = z64.toInt // JVM arrays are < 2 GiB; bounds-checked above
      if (le32(bytes, z) != 0x06064b50L) return None
      // record size counts everything after the first 12 bytes; the
      // record must END at the locator (nothing hides between)
      if (z64 + 12 + le64(bytes, z + 4) != loc.toLong) return None
      if (le32(bytes, z + 16) != 0L || le32(bytes, z + 20) != 0L)
        return None // this disk / CD-start disk
      nEntries = le64(bytes, z + 24)
      if (nEntries != le64(bytes, z + 32)) return None
      if (nEntries < 0L || nEntries > Int.MaxValue.toLong) return None
      cdSize = le64(bytes, z + 40)
      cdOff = le64(bytes, z + 48)
      if (cdSize < 0L || cdOff < 0L) return None
      cdEnd = z64
    }
    if (cdOff + cdSize != cdEnd) return None
    val out = Vector.newBuilder[(String, Array[Byte], String)]
    val ranges = Vector.newBuilder[(Long, Long)] // member [lho, dataEnd)
    var pos = cdOff
    var i = 0
    while (i < nEntries) {
      if (pos + 46 > cdEnd) return None
      val o = pos.toInt
      if (le32(bytes, o) != 0x02014b50L) return None
      val flags = le16(bytes, o + 8)
      if ((flags & 0x0001) != 0) return None // encrypted: refuse
      val method = le16(bytes, o + 10)
      val crc = le32(bytes, o + 16)
      var compSize = le32(bytes, o + 20)
      var uncompSize = le32(bytes, o + 24)
      val nameLen = le16(bytes, o + 28)
      val extraLen = le16(bytes, o + 30)
      val commentLen = le16(bytes, o + 32)
      var lho = le32(bytes, o + 42)
      if (pos + 46 + nameLen + extraLen + commentLen > cdEnd) return None
      // sentinel fields resolve through the ZIP64 extended-info extra
      // (header id 0x0001): 8-byte values present ONLY for the fields
      // that are 0xFFFFFFFF, in uncomp/comp/offset order
      if (compSize == 0xFFFFFFFFL || uncompSize == 0xFFFFFFFFL ||
        lho == 0xFFFFFFFFL) {
        var e = o + 46 + nameLen
        val eEnd = e + extraLen
        var found = false
        while (!found && e + 4 <= eEnd) {
          val hid = le16(bytes, e)
          val dsz = le16(bytes, e + 2)
          if (e + 4 + dsz > eEnd) return None
          if (hid == 0x0001) {
            var f = e + 4
            if (uncompSize == 0xFFFFFFFFL) {
              if (f + 8 > e + 4 + dsz) return None
              uncompSize = le64(bytes, f); f += 8
            }
            if (compSize == 0xFFFFFFFFL) {
              if (f + 8 > e + 4 + dsz) return None
              compSize = le64(bytes, f); f += 8
            }
            if (lho == 0xFFFFFFFFL) {
              if (f + 8 > e + 4 + dsz) return None
              lho = le64(bytes, f); f += 8
            }
            found = true
          } else e += 4 + dsz
        }
        if (!found) return None // sentinel with no ZIP64 extra: refuse
        if (compSize < 0L || uncompSize < 0L || lho < 0L) return None
      }
      val name = new String(bytes, o + 46, nameLen, "UTF-8")
      if (!name.endsWith("/")) {
        if (uncompSize > maxEntryBytes) return None
        // local header: sig + its OWN name/extra lengths
        if (lho + 30 > bytes.length) return None
        val l = lho.toInt
        if (le32(bytes, l) != 0x04034b50L) return None
        val dataOff = lho + 30 + le16(bytes, l + 26) + le16(bytes, l + 28)
        if (dataOff + compSize > bytes.length) return None
        ranges += ((lho, dataOff + compSize))
        if (method == 0) {
          if (compSize != uncompSize) return None
          val data = new Array[Byte](uncompSize.toInt)
          System.arraycopy(bytes, dataOff.toInt, data, 0, data.length)
          if (!crcOk(data, crc)) return None
          out += ((name, data, "stored"))
        } else if (method == 8) {
          val data = inflateRaw(bytes, dataOff.toInt, compSize.toInt,
            uncompSize.toInt).getOrElse(return None)
          if (!crcOk(data, crc)) return None
          out += ((name, data, "deflate"))
        } else return None // unknown method: refuse honestly
      }
      pos += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    if (pos != cdEnd) return None // CD shorter than declared
    // overlapping members: two CD entries pointing into the same
    // local data are a crafted archive, not a packaging accident
    val sorted = ranges.result().sortBy(_._1)
    var j = 1
    while (j < sorted.length) {
      if (sorted(j)._1 < sorted(j - 1)._2) return None
      j += 1
    }
    Some(out.result())
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
