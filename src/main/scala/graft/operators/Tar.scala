package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** TAR shards and the WebDataset convention — how large multimodal
  * training corpora actually ship: a corpus is millions of `.tar`
  * shards, each holding sample files grouped by BASENAME STEM
  * (`000123.jpg` + `000123.txt` + `000123.json` = one sample). The
  * walk derives entirely from the published POSIX ustar format:
  * 512-byte headers (name, octal size/mtime, checksum over the
  * header with the checksum field blanked, typeflag, ustar magic +
  * name-prefix field), file data padded to 512, an end-of-archive
  * marker of two zero blocks.
  *
  * Honesty contract: every header's checksum is VERIFIED (both the
  * unsigned convention the spec mandates and the signed-byte variant
  * historical writers used); a bad checksum, a malformed size field,
  * or data running past the payload refuses the WHOLE shard — a
  * silently half-read shard drops samples without anyone noticing.
  * Long-path extension records are HONORED, not skipped: a GNU 'L'
  * longname record or a PAX 'x' header carrying `path=` overrides
  * the following entry's 100-byte name field (PAX wins over GNU when
  * both precede one entry, per the pax spec's precedence), so
  * >100-char shard paths keep their true WebDataset stems. A
  * malformed extension record (bad PAX record grammar, empty name)
  * refuses the whole shard, and a PAX GLOBAL header ('g') that
  * carries `path=` refuses too — one global path would mislabel
  * every member. Other non-file entries (directories, links, 'K'
  * long-linkname records) are skipped by declared size.
  *
  * Design for 100 TB: shards stream through `mapPartitions` one in
  * memory at a time; the entry walk is O(#entries) header reads plus
  * slice copies of requested members; `maxEntryBytes` refuses
  * oversized members before allocating; the WebDataset grouping is a
  * per-shard LOCAL fold (stems never straddle shards by convention),
  * so NO shuffle happens — sample assembly is embarrassingly
  * parallel whatever the corpus size.
  */
/** A structurally invalid shard met by a STREAMING walk — members may
  * already have been emitted, so the only honest "refuse whole" left
  * is a loud task failure (the column operators catch it and map to
  * emit-nothing instead).
  */
final class MalformedShardException(msg: String)
  extends java.io.IOException(msg)

object Tar {

  /** One archive member: `path` as stored (prefix field honored),
    * bytes, and the entry index in archive order.
    */
  case class TarEntry(id: Long, entryIndex: Long, path: String,
      bytes: Array[Byte], size: Long)

  /** One WebDataset sample: every member sharing a basename stem,
    * as (extension → bytes) pairs exploded to rows.
    */
  case class WdsMember(id: Long, stem: String, ext: String,
      bytes: Array[Byte], size: Long)

  /** Explode every regular-file member of every tar payload — plain
    * `.tar` or gzipped `.tar.gz` shards, dispatched by the gzip
    * magic (`1F 8B`) per row; inflation is bounded by
    * `maxShardBytes` (an over-cap shard refuses whole, never
    * truncates). Unparseable shards emit nothing (the per-file
    * honesty contract); `maxEntryBytes` refuses the SHARD rather
    * than truncate a member.
    */
  def tarEntries(df: DataFrame, idCol: String, binCol: String,
      maxEntryBytes: Int = 1 << 28,
      maxShardBytes: Int = 1 << 28): DataFrame = {
    require(maxEntryBytes > 0, "maxEntryBytes must be positive")
    require(maxShardBytes > 0, "maxShardBytes must be positive")
    implicit val enc = Encoders.product[TarEntry]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val parsed = for {
            raw <- maybeGunzip(r.getAs[Array[Byte]](1), maxShardBytes)
            entries <- parseTar(raw, maxEntryBytes)
          } yield entries
          parsed match {
            case Some(entries) => entries.zipWithIndex.map {
              case ((p, b), i) => TarEntry(id, i.toLong, p, b,
                b.length.toLong)
            }
            case None => Nil
          }
        }
    }.toDF().select(col("id"), col("entryIndex").as("entry_index"),
      col("path"), col("bytes"), col("size"))
  }

  /** Pass plain payloads through; inflate gzip-magic payloads with a
    * hard output bound — None on corrupt streams or a shard that
    * would exceed `maxShardBytes` inflated.
    */
  private def maybeGunzip(bytes: Array[Byte],
      maxShardBytes: Int): Option[Array[Byte]] = {
    if (bytes == null) return None
    if (bytes.length < 2 || (bytes(0) & 0xFF) != 0x1F ||
      (bytes(1) & 0xFF) != 0x8B) return Some(bytes)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size().toLong + n > maxShardBytes) return None
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  /** WebDataset sample assembly: members grouped by basename stem
    * (the path up to the FIRST dot of the basename — WebDataset
    * extensions may be dotted, e.g. `seg.png`), exploded as
    * (stem, ext, bytes) rows. Grouping is per shard and LOCAL — no
    * shuffle. Members without a dot in their basename refuse the
    * shard (they belong to no sample; silently dropping them would
    * hide corpus damage).
    */
  def webdatasetMembers(df: DataFrame, idCol: String, binCol: String,
      maxEntryBytes: Int = 1 << 28,
      maxShardBytes: Int = 1 << 28): DataFrame = {
    require(maxEntryBytes > 0, "maxEntryBytes must be positive")
    require(maxShardBytes > 0, "maxShardBytes must be positive")
    implicit val enc = Encoders.product[WdsMember]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val members = for {
            raw <- maybeGunzip(r.getAs[Array[Byte]](1), maxShardBytes)
            entries <- parseTar(raw, maxEntryBytes)
            split <- splitStems(entries)
          } yield split
          members match {
            case Some(ms) => ms.map { case (stem, ext, b) =>
              WdsMember(id, stem, ext, b, b.length.toLong)
            }
            case None => Nil
          }
        }
    }.toDF().select(col("id"), col("stem"), col("ext"), col("bytes"),
      col("size"))
  }

  /** Per-sample census — the curation projection over a WebDataset
    * corpus: one row per (shard, stem) with its member extensions
    * (sorted, comma-joined) and total bytes. This is the "is every
    * sample complete?" filter a 100 TB ingest runs first.
    */
  def webdatasetSamples(df: DataFrame, idCol: String, binCol: String,
      maxEntryBytes: Int = 1 << 28,
      maxShardBytes: Int = 1 << 28): DataFrame =
    webdatasetMembers(df, idCol, binCol, maxEntryBytes, maxShardBytes)
      .groupBy(col("id"), col("stem"))
      .agg(count(lit(1)).as("n_members"),
        array_join(array_sort(collect_list(col("ext"))), ",")
          .as("exts"),
        sum(col("size")).as("total_bytes"))

  private def splitStems(entries: Vector[(String, Array[Byte])])
      : Option[Vector[(String, String, Array[Byte])]] = {
    val out = Vector.newBuilder[(String, String, Array[Byte])]
    entries.foreach { case (path, bytes) =>
      val slash = path.lastIndexOf('/')
      val base = path.substring(slash + 1)
      val dot = base.indexOf('.')
      if (dot <= 0) return None // no extension: not a WebDataset member
      val stem = path.substring(0, slash + 1) + base.substring(0, dot)
      out += ((stem, base.substring(dot + 1), bytes))
    }
    Some(out.result())
  }

  // ---- imperative internals (the mapPartitions shard walker) ---------

  /** Parse a POSIX ustar archive: (path, bytes) per regular file,
    * checksums verified on EVERY header, non-file entries skipped by
    * size. None on any structural violation.
    */
  private[graft] def parseTar(bytes: Array[Byte],
      maxEntryBytes: Int): Option[Vector[(String, Array[Byte])]] = {
    if (bytes == null || bytes.length < 1024 ||
      bytes.length % 512 != 0) return None
    try Some(streamTarEntries(
      new java.io.ByteArrayInputStream(bytes), maxEntryBytes,
      "<column>").toVector)
    catch { case _: MalformedShardException => None }
  }

  /** The SINGLE ustar state machine, expressed over a stream — the
    * column operator ([[parseTar]]) and the path-level source
    * (`sources.TarShardSource`) both walk through here, so their
    * honesty contracts can never drift. Residency is ONE member (plus
    * one 512-byte header block), never the shard: multi-GiB shards
    * stream in constant memory. A structural violation throws
    * [[MalformedShardException]] — members may already have been
    * emitted, so in a streamed walk "refuse the whole shard" is only
    * honest as a loud failure; the column path catches it and maps to
    * emit-nothing.
    */
  private[graft] def streamTarEntries(in: java.io.InputStream,
      maxEntryBytes: Int, shard: String)
      : Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val hdr = new Array[Byte](512)
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false
      private var pendingLongName: Option[String] = None
      private var pendingPaxPath: Option[String] = None

      private def fail(why: String): Nothing =
        throw new MalformedShardException(s"$shard: $why")

      private def readFully(buf: Array[Byte], off: Int,
          len: Int): Unit = {
        var p = off
        while (p < off + len) {
          val n = in.read(buf, p, off + len - p)
          if (n < 0) fail("truncated inside a block")
          p += n
        }
      }

      /** One 512-byte block into `hdr`; false on clean EOF at a
        * block boundary, throws on a partial block.
        */
      private def readBlock(): Boolean = {
        val first = in.read(hdr, 0, 512)
        if (first < 0) return false
        readFully(hdr, first, 512 - first)
        true
      }

      private def skipData(size: Long): Unit = {
        var left = ((size + 511L) / 512L) * 512L
        val scratch = new Array[Byte](1 << 16)
        while (left > 0) {
          val n = in.read(scratch, 0,
            math.min(left, scratch.length.toLong).toInt)
          if (n < 0) fail("truncated member data")
          left -= n
        }
      }

      /** `size` data bytes plus the padding to the 512 boundary. */
      private def readData(size: Long): Array[Byte] = {
        val data = new Array[Byte](size.toInt)
        readFully(data, 0, size.toInt)
        val pad = ((512 - (size % 512)) % 512).toInt
        if (pad > 0) readFully(new Array[Byte](pad), 0, pad)
        data
      }

      /** End-of-archive: a second zero block, then nothing but zero
        * padding to EOF (tar blocks archives to a blocking factor).
        */
      private def finish(): Unit = {
        if (!readBlock() || !isZeroBlock(hdr, 0))
          fail("single zero block is not an end-of-archive marker")
        var n = in.read(hdr, 0, 512)
        while (n >= 0) {
          var i = 0
          while (i < n) {
            if (hdr(i) != 0) fail("junk after the end-of-archive marker")
            i += 1
          }
          n = in.read(hdr, 0, 512)
        }
        // a trailing extension record naming an entry that never
        // came is a malformed archive
        if (pendingLongName.isDefined || pendingPaxPath.isDefined)
          fail("trailing extension record with no entry")
        done = true
      }

      private def advance(): Unit = {
        while (nextEntry == null && !done) {
          if (!readBlock()) fail("EOF before the end-of-archive marker")
          if (isZeroBlock(hdr, 0)) { finish(); return }
          // header checksum: sum of header bytes with the checksum
          // field (148..155) read as spaces — unsigned per spec,
          // signed variant tolerated (historical writers)
          var unsigned = 0L
          var signed = 0L
          var i = 0
          while (i < 512) {
            val raw = if (i >= 148 && i < 156) 32.toByte else hdr(i)
            unsigned += raw & 0xFF
            signed += raw
            i += 1
          }
          val declared = octal(hdr, 148, 8)
            .getOrElse(fail("malformed checksum field"))
          if (declared != unsigned && declared != signed)
            fail("header checksum mismatch")
          val size = octal(hdr, 124, 12)
            .getOrElse(fail("malformed size field"))
          if (size < 0L || size > maxEntryBytes)
            fail(s"entry of $size bytes over the $maxEntryBytes cap")
          val typeflag = hdr(156)
          if (typeflag == '0'.toByte || typeflag == 0.toByte) {
            val stored = {
              val name = cstr(hdr, 0, 100)
              // ustar prefix field (345..499) prepends path/
              val magic = cstr(hdr, 257, 6)
              val prefix =
                if (magic == "ustar") cstr(hdr, 345, 155) else ""
              if (prefix.isEmpty) name else prefix + "/" + name
            }
            // PAX path wins over a GNU longname when both precede
            // the entry (pax precedence); either wins over ustar
            val name = pendingPaxPath.orElse(pendingLongName)
              .getOrElse(stored)
            if (name.isEmpty) fail("empty member path")
            nextEntry = (name, readData(size))
            pendingLongName = None; pendingPaxPath = None
          } else if (typeflag == 'L'.toByte) {
            // GNU longname: the next entry's path, NUL-terminated
            if (size == 0L) fail("empty GNU longname record")
            val data = readData(size)
            var e = 0
            while (e < data.length && data(e) != 0) e += 1
            val n = new String(data, 0, e, "UTF-8")
            if (n.isEmpty) fail("empty GNU longname")
            pendingLongName = Some(n)
          } else if (typeflag == 'x'.toByte || typeflag == 'g'.toByte) {
            // PAX extended header: "%d key=value\n" records
            val data = readData(size)
            val recs = parsePaxRecords(data, 0, data.length)
              .getOrElse(fail("malformed pax record grammar"))
            recs.get("path").foreach { p =>
              if (typeflag == 'g'.toByte || p.isEmpty)
                fail("global or empty pax path override")
              pendingPaxPath = Some(p)
            }
            // a PAX size= override would contradict the next header's
            // verified octal field — refuse rather than pick one
            if (recs.contains("size")) fail("pax size= override")
          } else if (typeflag != 'K'.toByte) {
            // dir/link entries: skipped by declared size; any pending
            // name override applied to them is consumed. ('K'
            // long-LINK records leave pendings alone — GNU tar emits
            // K and L as siblings before one entry, in either order.)
            skipData(size)
            pendingLongName = None; pendingPaxPath = None
          } else skipData(size)
        }
      }

      override def hasNext: Boolean = {
        if (nextEntry == null && !done) advance()
        nextEntry != null
      }

      override def next(): (String, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException("exhausted")
        val e = nextEntry
        nextEntry = null
        e
      }
    }

  private def isZeroBlock(b: Array[Byte], pos: Int): Boolean = {
    var i = 0
    while (i < 512) {
      if (b(pos + i) != 0) return false
      i += 1
    }
    true
  }

  /** NUL-terminated (or field-filling) string field. */
  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  /** Octal numeric field: leading spaces/NULs tolerated, digits,
    * terminated by space/NUL/end — the published grammar. None on
    * any other byte.
    */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) | (b(i) - '0')
      if (v < 0L) return None // overflow
      digits += 1
      i += 1
    }
    if (digits == 0) return None
    while (i < end) {
      if (b(i) != ' ' && b(i) != 0) return None
      i += 1
    }
    Some(v)
  }

  /** PAX extended-header records: `"%d key=value\n"` where the
    * decimal length counts the WHOLE record (digits, space, body,
    * newline) — the published pax grammar. None on any deviation.
    */
  private[graft] def parsePaxRecords(b: Array[Byte], off: Int,
      len: Int): Option[Map[String, String]] = {
    val out = Map.newBuilder[String, String]
    var p = off
    val end = off + len
    while (p < end) {
      var q = p
      var recLen = 0
      var digits = 0
      while (q < end && b(q) >= '0' && b(q) <= '9') {
        recLen = recLen * 10 + (b(q) - '0')
        if (recLen > len) return None
        digits += 1; q += 1
      }
      if (digits == 0 || q >= end || b(q) != ' ') return None
      if (recLen < digits + 3 || p + recLen > end) return None
      if (b(p + recLen - 1) != '\n') return None
      val body = new String(b, q + 1, p + recLen - 1 - (q + 1), "UTF-8")
      val eq = body.indexOf('=')
      if (eq <= 0) return None
      out += (body.substring(0, eq) -> body.substring(eq + 1))
      p += recLen
    }
    Some(out.result())
  }

  // ---- encoder (round-trip twin; also the fixture/smoke builder) -----

  /** One checksummed ustar header block. */
  private def header(name: String, prefix: String, size: Long,
      typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      require(b.length <= len, s"field over $len bytes")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      put(("%0" + (len - 1) + "o").format(v), off, len)
    put(name, 0, 100)
    putOctal(420L, 100, 8) // mode 0644
    putOctal(0L, 108, 8); putOctal(0L, 116, 8) // uid/gid
    putOctal(size, 124, 12)
    putOctal(0L, 136, 12) // mtime
    h(156) = typeflag
    put("ustar", 257, 6)
    h(263) = '0'.toByte; h(264) = '0'.toByte // version "00"
    if (prefix.nonEmpty) put(prefix, 345, 155)
    // checksum over the header with the field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += b & 0xFF)
    put("%06o".format(sum), 148, 7)
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  private def writePadded(bos: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    bos.write(data)
    bos.write(new Array[Byte]((512 - data.length % 512) % 512))
  }

  /** Build a POSIX ustar archive from (path, bytes) members — real
    * checksums, the prefix field used when a path exceeds the name
    * field, two zero end blocks.
    */
  def buildTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (path, data) =>
      require(path.nonEmpty && path.length <= 255,
        s"path length ${path.length} out of range")
      val (prefix, name) =
        if (path.length <= 100) ("", path)
        else {
          val cut = path.lastIndexOf('/', 154)
          require(cut > 0 && path.length - cut - 1 <= 100,
            s"path '$path' does not split into prefix/name")
          (path.substring(0, cut), path.substring(cut + 1))
        }
      bos.write(header(name, prefix, data.length.toLong, '0'.toByte))
      writePadded(bos, data)
    }
    bos.write(new Array[Byte](1024)) // end-of-archive marker
    bos.toByteArray
  }

  /** Build a GNU-style archive: every member's path ships in an 'L'
    * longname record (data = path + NUL) ahead of a header whose name
    * field holds only a truncated stand-in — exactly what GNU tar
    * emits for >100-char paths (the round-trip twin of the 'L' walk).
    */
  def buildTarGnuLong(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (path, data) =>
      require(path.nonEmpty, "empty path")
      val nameBytes = path.getBytes("UTF-8") :+ 0.toByte
      bos.write(header("././@LongLink", "", nameBytes.length.toLong,
        'L'.toByte))
      writePadded(bos, nameBytes)
      bos.write(header(path.take(100), "", data.length.toLong,
        '0'.toByte))
      writePadded(bos, data)
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  /** Build a pax-style archive: every member's path ships in an 'x'
    * extended header (`"%d path=...\n"` record) ahead of a header
    * whose name field holds only a truncated stand-in — what
    * `tar --format=pax` emits for long paths.
    */
  def buildTarPax(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (path, data) =>
      require(path.nonEmpty, "empty path")
      bos.write(header("./PaxHeaders/" + path.take(85), "",
        paxRecord("path", path).length.toLong, 'x'.toByte))
      writePadded(bos, paxRecord("path", path))
      bos.write(header(path.take(100), "", data.length.toLong,
        '0'.toByte))
      writePadded(bos, data)
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  /** One pax record with its self-counting decimal length prefix. */
  private[graft] def paxRecord(key: String, value: String): Array[Byte] = {
    val body = s" $key=$value\n".getBytes("UTF-8")
    var total = body.length // fixed point: total = digits(total) + body
    while (total.toString.length + body.length != total)
      total = total.toString.length + body.length
    total.toString.getBytes("US-ASCII") ++ body
  }

  /** Gzip a payload (the `.tar.gz` fixture/smoke composer). */
  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }
}
