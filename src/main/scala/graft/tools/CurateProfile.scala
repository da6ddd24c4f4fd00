package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusAnalysis

/** Dev profiling scratch: time the composed curate pipeline (the
  * heaviest bench query) and its stages in isolation at sf0.1. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.CurateProfile"`.
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // mirror SparkEntry.docsWithNearDups + the q_curate call exactly
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs0.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
    val docs = docs0.unionByName(planted)
    val bench = docs0.filter(col("doc_id") % 97 === 0)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    time("warmup count")(docs.count())
    for (i <- 1 to 3)
      time(s"curate full #$i")(CorpusAnalysis.curate(
        docs, bench, "doc_id", "text", sampleRate = 0.5, salt = "cur1")
        .count())

    // stages in isolation, chained like curateImpl but timed one by one
    val d0 = docs.select(col("doc_id").cast("long").as("id"),
      col("text").as("text"))
    val b0 = bench.select(col("doc_id").cast("long").as("id"),
      col("text").as("text"))
    // localCheckpoint is EAGER — time it, not the count after it
    var cur = d0.localCheckpoint()
    for ((name, fn) <- CorpusAnalysis.curateStageFnsForProfiling(
        b0, sampleRate = 0.5, salt = "cur1")) {
      var out: org.apache.spark.sql.DataFrame = null
      time(s"stage $name")({ out = fn(cur).localCheckpoint(); out.count() })
      cur = out
    }
    spark.stop()
  }
}
