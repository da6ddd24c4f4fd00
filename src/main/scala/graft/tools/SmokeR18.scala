package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Png, Tar, Zip}

/** Round-18 dev smoke: drives the shard/image operators end-to-end
  * over /root/testdata documents at the DataFrame surface — long-path
  * tar extension records, ZIP overlap refusal, the WebP sniff gate,
  * and the PNG IDAT/empty-text edges.
  */
object SmokeR18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id")).limit(6)

    // tar shards whose every path exceeds the 100-byte name field:
    // GNU 'L' records on even ids, pax 'x' records on odd ids
    val buildLong = udf((id: Long) => {
      val members = (0 until 2).map { k =>
        ((("p" * 120) + s"/sample_${id}_$k.txt",
          s"m:$id:$k".getBytes("UTF-8")))
      }
      if (id % 2 == 0) Tar.buildTarGnuLong(members)
      else Tar.buildTarPax(members)
    })
    val shards = docs.select(col("doc_id").as("id"),
      buildLong(col("doc_id")).as("content"))
    println("== tarEntries over GNU-L / pax-x long-path shards ==")
    Tar.tarEntries(shards, "id", "content")
      .select(col("id"), col("entry_index"),
        substring(col("path"), 115, 40).as("path_tail"),
        col("bytes").cast("string").as("content_str"))
      .orderBy("id", "entry_index").show(8, truncate = false)
    println("== webdatasetSamples stems derive from the TRUE path ==")
    Tar.webdatasetSamples(shards, "id", "content")
      .select(col("id"), substring(col("stem"), 115, 40).as("stem_tail"),
        col("n_members"), col("exts"))
      .orderBy("id", "stem_tail").show(8, truncate = false)

    // overlapping-member ZIPs refuse whole; honest ones walk
    val zipBuild = udf((id: Long) => {
      val data = s"payload:$id".getBytes("UTF-8")
      val zip = Zip.buildZip(Seq(("a.txt", data, false),
        ("b.txt", data, false)))
      if (id % 2 == 1) {
        val evil = zip.clone()
        val sigs = (0 until evil.length - 4).filter(o =>
          evil(o) == 'P' && evil(o + 1) == 'K' &&
            (evil(o + 2) & 0xFF) == 1 && (evil(o + 3) & 0xFF) == 2)
        System.arraycopy(
          java.util.Arrays.copyOfRange(evil, sigs(0) + 42, sigs(0) + 46),
          0, evil, sigs(1) + 42, 4)
        evil
      } else zip
    })
    println("== zipEntries: even ids honest (2 members), odd ids " +
      "overlapping (refused whole) ==")
    Zip.zipEntries(docs.select(col("doc_id").as("id"),
        zipBuild(col("doc_id")).as("content")), "id", "content")
      .groupBy("id").count().orderBy("id").show(8)

    // exifScanAuto: WAV payloads must NOT be labeled webp
    val wavOrPng = udf((id: Long) => {
      if (id % 2 == 0)
        "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
          "WAVE".getBytes("US-ASCII") ++ new Array[Byte](24)
      else Png.buildPng(4, 4, 0,
        Array.tabulate(16)(p => ((id * 7 + p) % 256).toByte))
    })
    println("== exifScanAuto container labels (wav rows must be '') ==")
    Multimodal.exifScanAuto(docs.select(col("doc_id").as("id"),
        wavOrPng(col("doc_id")).as("content")), "id", "content")
      .groupBy("container").count().orderBy("container").show()

    spark.stop()
  }
}
