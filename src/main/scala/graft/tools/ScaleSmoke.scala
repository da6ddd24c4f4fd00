package graft.tools

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession

/** Dev main: ingest a deliberately large archive (default 1M features
  * across two layers, ~250 MB of GeoJSON) through the full engine to
  * demonstrate the bounded-memory streaming claim — the archive is
  * parsed feature-by-feature off a ZipInputStream, so executor memory
  * stays flat regardless of archive size.
  * Run: `sbt "runMain graft.tools.ScaleSmoke [featuresPerLayer]"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val zipFile = java.nio.file.Files.createTempFile("graft-scale", ".zip").toFile
    val t0 = System.nanoTime()
    val zos = new ZipOutputStream(new FileOutputStream(zipFile))
    def entry(name: String, geom: Int => String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write("""{"type":"FeatureCollection","name":"scale","features":[""".getBytes("UTF-8"))
      var i = 0
      while (i < n) {
        val sep = if (i == 0) "" else ","
        zos.write((sep +
          s"""{"type":"Feature","geometry":${geom(i)},"properties":{"_id":"f$i","idx":$i,"pad":"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}}""")
          .getBytes("UTF-8"))
        i += 1
      }
      zos.write("]}".getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("nodes.geojson",
      i => s"""{"type":"Point","coordinates":[${i * 1e-5}, ${i * 2e-5}, ${i % 9}]}""")
    entry("edges.geojson",
      i => s"""{"type":"LineString","coordinates":[[${i * 1e-5},1.0,5.0],[2.0,${i * 2e-5},6.0]]}""")
    zos.close()
    println(f"archive: ${zipFile.length() / 1e6}%.1f MB, built in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val wh = java.nio.file.Files.createTempDirectory("graft-scale-wh").toString
    val engine = new graft.service.ExtractLoadEngine(spark, wh)
    val t1 = System.nanoTime()
    val resp = engine.processRequest(graft.model.QueueMessage("scale|1", "wf",
      graft.model.ExtractLoadRequest("osw", zipFile.getAbsolutePath, "scale_ds", "smoke")))
    val secs = (System.nanoTime() - t1) / 1e9
    require(resp.success, resp.message)
    val nodes = engine.warehouse.table("node").count()
    val edges = engine.warehouse.table("edge").count()
    val rt = Runtime.getRuntime
    println(f"ingest: $secs%.1f s, ${2L * n / secs}%.0f features/s, " +
      f"nodes=$nodes edges=$edges, heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB")
    require(nodes == n && edges == n)
    zipFile.delete()

    // --- dedup at scale: 1M synthetic docs, planted exact + near dups.
    // Generation is a pure projection over spark.range (distributed, no
    // driver loop). Per group of 10 docs: ids base..base+7 unique,
    // base+8 an exact duplicate of base, base+9 a near-dup of base (last
    // of 30 tokens changed -> word-trigram Jaccard 27/29 ~= 0.931).
    import org.apache.spark.sql.functions._
    val nDocs = args.lift(1).map(_.toInt).getOrElse(1000000)
    val k = col("id") % 10
    val base = col("id") - k
    val tokenSeed = when(k >= 8, base).otherwise(col("id"))
    val toks = (0 until 30).map { j =>
      val s = if (j == 29) when(k === 9, col("id")).otherwise(tokenSeed)
              else tokenSeed
      substring(md5(concat_ws(":", s.cast("string"), lit(j))), 1, 8)
    }
    val docs = spark.range(nDocs)
      .select(col("id"), concat_ws(" ", toks: _*).as("text"))
    val t2 = System.nanoTime()
    val kept = graft.operators.Dedup.exactDedup(docs, "id", "text").count()
    val tExact = (System.nanoTime() - t2) / 1e9
    require(kept == nDocs - nDocs / 10L, s"exactDedup kept $kept")
    val t3 = System.nanoTime()
    val pairsDf = graft.operators.Dedup.minHashNearDupPairs(docs, "id", "text")
    val pairs = pairsDf.count()
    val tMh = (System.nanoTime() - t3) / 1e9
    // 3 planted pairs per group (J=1, .931, .931); band recall at
    // J=.931 with 16 bands x 4 rows is 1-2e-10, so demand near-all.
    val expected = 3L * (nDocs / 10L)
    require(pairs <= expected && pairs >= expected - 5,
      s"minhash pairs $pairs of $expected")
    // connected components over the pairs: each group of 10 docs holds
    // one 3-doc component (base, base+8, base+9) + 7 singletons
    val t4 = System.nanoTime()
    val clusters = graft.operators.Dedup
      .nearDupClusters(docs, "id", pairsDf)
      .groupBy(org.apache.spark.sql.functions.col("cluster")).count().count()
    val tCc = (System.nanoTime() - t4) / 1e9
    val expectedClusters = 8L * (nDocs / 10L)
    require(math.abs(clusters - expectedClusters) <= 5,
      s"clusters $clusters of $expectedClusters")
    println(f"dedup: docs=$nDocs exactKept=$kept in $tExact%.1f s " +
      f"(${nDocs / tExact}%.0f docs/s), minhashPairs=$pairs in $tMh%.1f s " +
      f"(${nDocs / tMh}%.0f docs/s), clusters=$clusters in $tCc%.1f s, " +
      f"heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0f MB")

    // decontamination: bench = the base doc of the first 1000 groups,
    // corpus = all dup/near-dup docs — each bench doc must be hit by
    // exactly its own 2 partners (23/23 and 22/23 shared 8-grams; no
    // cross-group 8-gram can match, tokens are seed-unique)
    val benchN = math.min(nDocs, 10000)
    val t5 = System.nanoTime()
    val contam = graft.operators.CorpusAnalysis.contamination(
      docs.filter(col("id") % 10 >= 8), docs.filter(col("id") % 10 === 0
        && col("id") < benchN), "id", "text").count()
    val tCt = (System.nanoTime() - t5) / 1e9
    require(contam == 2L * (benchN / 10), s"contamination pairs $contam")
    // chunking: 30 tokens at maxTokens=16/stride=12 → exactly 3 windows
    val t6 = System.nanoTime()
    val chunks = graft.operators.CorpusAnalysis
      .chunkDocs(docs, "id", "text", maxTokens = 16, stride = 12).count()
    val tCh = (System.nanoTime() - t6) / 1e9
    require(chunks == 3L * nDocs, s"chunks $chunks")
    println(f"corpus: contamPairs=$contam in $tCt%.1f s, " +
      f"chunks=$chunks in $tCh%.1f s (${nDocs / tCh}%.0f docs/s)")
    spark.stop()
  }
}
