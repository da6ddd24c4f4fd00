package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-GiB streaming-shard smoke: proves the path-level tar source
  * walks shards FAR beyond any column-operator byte cap with one
  * member resident. Shards are written to disk member-by-member
  * (never a whole shard in memory on the writer side either), walked
  * via `TarShardSource.members`, and every count / byte sum / planted
  * byte is verified exactly. Standalone main, and a section of
  * [[ScaleSmoke]].
  */
object ShardStreamSmoke {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark,
      nShards = args.headOption.map(_.toInt).getOrElse(4),
      membersPerShard = args.lift(1).map(_.toInt).getOrElse(1536),
      memberBytes = args.lift(2).map(_.toInt).getOrElse(1 << 20))
    spark.stop()
  }

  def run(spark: SparkSession, nShards: Int, membersPerShard: Int,
      memberBytes: Int): Unit = {
    val rt = Runtime.getRuntime
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scale-shards")
    val t0 = System.nanoTime()
    // stream each shard to disk one MEMBER at a time: per-member
    // ustar blocks from the library builder, end marker appended once
    (0 until nShards).foreach { sIdx =>
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(
          dir.resolve(s"big_$sIdx.tar").toFile), 1 << 20)
      (0 until membersPerShard).foreach { m =>
        val data = new Array[Byte](memberBytes)
        var i = 0
        while (i < memberBytes) {
          data(i) = ((sIdx * 131 + m * 31 + i * 7) % 251).toByte
          i += 1
        }
        val one = graft.operators.Tar.buildTar(
          Seq((s"big/${sIdx}_$m.bin", data)))
        out.write(one, 0, one.length - 1024) // defer the end marker
      }
      out.write(new Array[Byte](1024))
      out.close()
    }
    val totalBytes = nShards.toLong * membersPerShard * memberBytes
    val built = (System.nanoTime() - t0) / 1e9
    println(f"shardStream: wrote $nShards shards, " +
      f"${totalBytes / 1e9}%.1f GB of member data in $built%.1f s")

    val t1 = System.nanoTime()
    val members = graft.sources.TarShardSource.members(spark,
      dir.toString + "/big_*.tar", maxEntryBytes = 2 * memberBytes)
    val firstByte = udf((b: Array[Byte]) => (b(0) & 0xFF).toLong)
    val agg = members.toDF()
      .agg(count(lit(1)), sum(col("size")),
        sum(firstByte(col("bytes"))))
      .collect()(0)
    val tWalk = (System.nanoTime() - t1) / 1e9
    val expFirst = (0 until nShards).map { sIdx =>
      (0 until membersPerShard)
        .map(m => ((sIdx * 131 + m * 31) % 251).toLong).sum
    }.sum
    require(agg.getLong(0) == nShards.toLong * membersPerShard,
      s"member count ${agg.getLong(0)}")
    require(agg.getLong(1) == totalBytes, s"byte sum ${agg.getLong(1)}")
    require(agg.getLong(2) == expFirst,
      s"first-byte sum ${agg.getLong(2)} != $expFirst")
    // spot-verify a planted byte deep inside one member
    val probe = members.toDF()
      .filter(col("path") === s"big/${nShards / 2}_77.bin")
      .select(col("bytes")).collect()(0).getAs[Array[Byte]](0)
    require(probe(123456 % memberBytes) ==
      (((nShards / 2) * 131 + 77 * 31 + (123456 % memberBytes) * 7)
        % 251).toByte, "planted byte mismatch")
    println(f"shardStream: ${nShards * membersPerShard}%d members " +
      f"(${totalBytes / 1e9}%.1f GB) streamed off disk in $tWalk%.1f s " +
      f"(${totalBytes / 1e9 / tWalk}%.2f GB/s), counts/sums/planted " +
      f"bytes exact, " +
      f"heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB")
    // cleanup: 6 GiB of fixture must not outlive the smoke
    java.nio.file.Files.walk(dir)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
