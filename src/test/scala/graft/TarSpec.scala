package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Png, Tar}

/** TAR shards / WebDataset: the ustar walk (checksums verified on
  * every header, prefix-field paths, padding), sample assembly by
  * basename stem, the honesty matrix, and the composition that makes
  * it matter — a real PNG member decoding through the image family.
  */
class TarSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("round trip: member paths, bytes, order; 512 padding; the " +
      ">100-char-path prefix field; empty archives are valid") {
    val longPath = ("p" * 120) + "/deep_file.bin"
    val members = Seq(
      "a/0.jpg" -> "alpha".getBytes("UTF-8"),
      "a/0.txt" -> ("x" * 513).getBytes("UTF-8"), // crosses a block
      longPath -> Array[Byte](1, 2, 3))
    val tar = Tar.buildTar(members)
    assert(tar.length % 512 === 0)
    val rows = Tar.tarEntries(df(1L -> tar), "id", "content")
      .orderBy("entry_index").collect()
    assert(rows.length === 3)
    rows.zip(members).foreach { case (r, (p, b)) =>
      assert(r.getAs[String]("path") === p)
      assert(r.getAs[Array[Byte]]("bytes").toSeq === b.toSeq)
      assert(r.getAs[Long]("size") === b.length.toLong)
    }
    assert(Tar.tarEntries(df(2L -> Tar.buildTar(Nil)), "id",
      "content").count() === 0L)
  }

  test("honesty: a flipped checksum, truncation, non-512-multiple " +
      "length, data overrunning the archive, junk after the end " +
      "marker, and over-cap members all refuse the WHOLE shard; " +
      "directory/link entries are skipped by size") {
    val good = Tar.buildTar(Seq("f.txt" -> "hello".getBytes("UTF-8")))
    val badCksum = good.clone()
    badCksum(0) = 'g'.toByte // name change breaks the stored checksum
    val truncated = good.take(good.length - 512)
    val odd = good.take(good.length - 100)
    val junkAfter = good.clone()
    junkAfter(good.length - 1) = 7
    def count(b: Array[Byte]) =
      Tar.tarEntries(df(1L -> b), "id", "content").count()
    assert(count(badCksum) === 0L)
    assert(count(truncated) === 0L)
    assert(count(odd) === 0L)
    assert(count(junkAfter) === 0L)
    assert(Tar.tarEntries(df(1L -> good), "id", "content",
      maxEntryBytes = 4).count() === 0L) // refuse, never truncate
    // a directory entry (typeflag '5') between two files is skipped
    val withDir = {
      val a = Tar.buildTar(Seq("d/a.txt" -> "A".getBytes("UTF-8")))
      val b = Tar.buildTar(Seq("d/b.txt" -> "B".getBytes("UTF-8")))
      val dir = Tar.buildTar(Seq("d/sub" -> Array.emptyByteArray))
      val dirHdr = dir.take(512).clone()
      dirHdr(156) = '5'.toByte
      // re-checksum after the typeflag change
      java.util.Arrays.fill(dirHdr, 148, 156, ' '.toByte)
      var sum = 0L
      dirHdr.foreach(x => sum += x & 0xFF)
      val cs = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(cs, 0, dirHdr, 148, 6)
      dirHdr(154) = 0; dirHdr(155) = ' '.toByte
      a.take(a.length - 1024) ++ dirHdr ++ b
    }
    val rows = Tar.tarEntries(df(1L -> withDir), "id", "content")
      .orderBy("entry_index").collect()
    assert(rows.map(_.getAs[String]("path")).toSeq ===
      Seq("d/a.txt", "d/b.txt"))
  }

  test("WebDataset assembly: members group by basename stem (dotted " +
      "extensions preserved past the FIRST dot), census rows are " +
      "exact, and a dotless member refuses the shard") {
    val tar = Tar.buildTar(Seq(
      "s/1.jpg" -> "i1".getBytes("UTF-8"),
      "s/1.seg.png" -> "p1".getBytes("UTF-8"),
      "s/1.txt" -> "t1".getBytes("UTF-8"),
      "s/2.jpg" -> "i2".getBytes("UTF-8"),
      "s/2.txt" -> "t22".getBytes("UTF-8")))
    val members = Tar.webdatasetMembers(df(1L -> tar), "id",
      "content").collect()
      .map(r => (r.getAs[String]("stem"), r.getAs[String]("ext")))
      .sorted.toSeq
    assert(members === Seq(("s/1", "jpg"), ("s/1", "seg.png"),
      ("s/1", "txt"), ("s/2", "jpg"), ("s/2", "txt")))
    val samples = Tar.webdatasetSamples(df(1L -> tar), "id",
      "content").orderBy("stem").collect()
    assert(samples.length === 2)
    assert(samples(0).getAs[Long]("n_members") === 3L)
    assert(samples(0).getAs[String]("exts") === "jpg,seg.png,txt")
    assert(samples(0).getAs[Long]("total_bytes") === 6L)
    assert(samples(1).getAs[String]("exts") === "jpg,txt")
    assert(samples(1).getAs[Long]("total_bytes") === 5L)
    val dotless = Tar.buildTar(Seq(
      "s/1.jpg" -> "i".getBytes("UTF-8"),
      "s/README" -> "r".getBytes("UTF-8")))
    assert(Tar.webdatasetMembers(df(1L -> dotless), "id", "content")
      .count() === 0L)
  }

  test("gzipped shards: .tar.gz payloads dispatch on the gzip magic " +
      "and walk identically; corrupt gzip and over-cap inflation " +
      "refuse the shard whole") {
    val members = Seq("g/1.jpg" -> "gz-img".getBytes("UTF-8"),
      "g/1.txt" -> "gz-txt".getBytes("UTF-8"))
    val plain = Tar.buildTar(members)
    val gz = Tar.gzipBytes(plain)
    val rows = Tar.tarEntries(df(1L -> plain, 2L -> gz), "id",
      "content").orderBy("id", "entry_index").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("path")).toSeq ===
      Seq("g/1.jpg", "g/1.txt", "g/1.jpg", "g/1.txt"))
    assert(rows(0).getAs[Array[Byte]]("bytes").toSeq ===
      rows(2).getAs[Array[Byte]]("bytes").toSeq)
    val corrupt = gz.clone()
    corrupt(gz.length / 2) = (corrupt(gz.length / 2) ^ 0x7F).toByte
    assert(Tar.tarEntries(df(1L -> corrupt), "id", "content")
      .count() === 0L)
    assert(Tar.tarEntries(df(1L -> gz), "id", "content",
      maxShardBytes = 64).count() === 0L) // refuse, never truncate
    assert(Tar.webdatasetSamples(df(1L -> gz), "id", "content")
      .count() === 1L)
  }

  test("streaming: shard member extraction is stateless and runs " +
      "per micro-batch over a live shard feed — plain and gzipped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = Tar.webdatasetMembers(mem.toDF().toDF("id", "content"),
        "id", "content")
      .writeStream.format("memory").queryName("tar_stream")
      .outputMode("append").start()
    try {
      mem.addData(1L -> Tar.buildTar(Seq(
        "a/1.jpg" -> "i".getBytes("UTF-8"),
        "a/1.txt" -> "t".getBytes("UTF-8"))))
      q.processAllAvailable()
      assert(spark.table("tar_stream").count() === 2L)
      mem.addData(
        2L -> Tar.gzipBytes(Tar.buildTar(Seq(
          "b/2.txt" -> "gz".getBytes("UTF-8")))),
        3L -> "not a tar".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("tar_stream").collect()
      assert(rows.length === 3) // the garbage shard emitted nothing
      assert(rows.map(_.getAs[Long]("id")).toSet === Set(1L, 2L))
    } finally q.stop()
  }

  test("long-path extension records: GNU 'L' longname and PAX 'x' " +
      "path= override the 100-byte name field, and WebDataset stems " +
      "derive from the TRUE path") {
    val long = ("n" * 140) + "/sample_000001.jpg"
    val gnu = Tar.buildTarGnuLong(Seq(long -> "G".getBytes("UTF-8")))
    val gnuRows = Tar.tarEntries(df(1L -> gnu), "id", "content")
      .collect()
    assert(gnuRows.map(_.getAs[String]("path")).toSeq === Seq(long))
    assert(gnuRows.head.getAs[Array[Byte]]("bytes").toSeq ===
      "G".getBytes("UTF-8").toSeq)
    val pax = Tar.buildTarPax(Seq(long -> "P".getBytes("UTF-8")))
    val paxRows = Tar.tarEntries(df(1L -> pax), "id", "content")
      .collect()
    assert(paxRows.map(_.getAs[String]("path")).toSeq === Seq(long))
    val wds = Tar.buildTarPax(Seq(
      (("d" * 120) + "/s1.jpg") -> "i".getBytes("UTF-8"),
      (("d" * 120) + "/s1.txt") -> "t".getBytes("UTF-8")))
    val stems = Tar.webdatasetMembers(df(1L -> wds), "id", "content")
      .collect().map(_.getAs[String]("stem")).distinct.toSeq
    assert(stems === Seq(("d" * 120) + "/s1"))
  }

  test("extension-record precedence and honesty: PAX path wins over " +
      "GNU; 'K' long-link records pass through; a global 'g' path, " +
      "malformed PAX grammar, a PAX size= override, a trailing " +
      "extension record, and a pending name consumed by a dir all " +
      "behave per the contract") {
    def retypeflag(block: Array[Byte], flag: Byte): Array[Byte] = {
      val h = block.clone()
      h(156) = flag
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(x => sum += x & 0xFF)
      val cs = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '.toByte
      h
    }
    def paths(b: Array[Byte]): Seq[String] =
      Tar.tarEntries(df(1L -> b), "id", "content")
        .orderBy("entry_index").collect()
        .map(_.getAs[String]("path")).toSeq
    val gnuPath = ("g" * 110) + "/via_gnu.bin"
    val paxPath = ("p" * 110) + "/via_pax.bin"
    val data = "D".getBytes("UTF-8")
    val gnu = Tar.buildTarGnuLong(Seq(gnuPath -> data))
    val pax = Tar.buildTarPax(Seq(paxPath -> data))
    // both records before one entry: PAX path= wins (pax precedence)
    // in EITHER record order
    assert(paths(gnu.take(1024) ++ pax) === Seq(paxPath))
    assert(paths(pax.take(1024) ++ gnu) === Seq(paxPath))
    // a 'K' long-link record between the 'L' record and its entry
    // leaves the pending longname alone
    val kRec = retypeflag(gnu.take(512), 'K'.toByte) ++
      gnu.slice(512, 1024)
    assert(paths(gnu.take(1024) ++ kRec ++ gnu.drop(1024)) ===
      Seq(gnuPath))
    // 'g' global header carrying path= refuses the shard
    val g = retypeflag(pax.take(512), 'g'.toByte) ++ pax.drop(512)
    assert(paths(g) === Seq.empty)
    // malformed PAX record grammar (length prefix corrupted) refuses
    val badPax = pax.clone()
    badPax(512) = 'A'.toByte
    assert(paths(badPax) === Seq.empty)
    // a PAX size= override contradicting the verified header refuses:
    // rewrite the path= key to size= in place (same record length)
    val short = Tar.buildTarPax(Seq("12345" -> data))
    val sized = {
      val c = short.clone()
      val needle = " path=12345\n".getBytes("UTF-8")
      val at = (512 until 512 + 64).find(o =>
        needle.indices.forall(i => c(o + i) == needle(i))).get
      val repl = "size=".getBytes("UTF-8")
      System.arraycopy(repl, 0, c, at + 1, 5)
      c
    }
    assert(paths(short) === Seq("12345"))
    assert(paths(sized) === Seq.empty)
    // a trailing extension record naming a member that never came
    assert(paths(gnu.take(1024) ++ new Array[Byte](1024)) ===
      Seq.empty)
    // a dir entry consumes the pending override; the NEXT file keeps
    // its own stored name
    val plain = Tar.buildTar(Seq("own_name.txt" -> data))
    val dirBlock = retypeflag(
      Tar.buildTar(Seq("somedir" -> Array.emptyByteArray)).take(512),
      '5'.toByte)
    assert(paths(gnu.take(1024) ++ dirBlock ++ plain) ===
      Seq("own_name.txt"))
  }

  test("composition: a REAL PNG member extracted from a shard " +
      "decodes through the image family bit-exactly") {
    import org.apache.spark.sql.functions._
    val px = Array.tabulate(16)(p => ((p * 31 + 5) % 256).toByte)
    val png = Png.buildPng(4, 4, 0, px, filterOf = y => y % 5)
    val tar = Tar.buildTar(Seq(
      "w/7.png" -> png,
      "w/7.txt" -> "a real caption".getBytes("UTF-8")))
    val pngs = Tar.webdatasetMembers(df(1L -> tar), "id", "content")
      .filter(col("ext") === "png")
      .select(col("id"), col("bytes"))
    val stats = Png.pngStats(pngs, "id", "bytes").collect()
    assert(stats.length === 1)
    val expected = px.map(v => 3L * (v & 0xFF)).sum
    assert(stats(0).getAs[Long]("luma_total") === expected)
  }
}
