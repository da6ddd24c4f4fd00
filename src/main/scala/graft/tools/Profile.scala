package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev profiling scratch: time the stages of the minhash pipeline at
  * sf0.1 to find where wall-clock goes. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.Profile"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs0.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
    val docs = docs0.unionByName(planted)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    time("warmup count")(docs.count())
    time("shingle+hash only") {
      docs.select(col("doc_id"),
        transform(array_distinct(graft.functions.TextFunctions.shingles(col("text"))),
          s => pmod(xxhash64(s), lit(2147483647L))).as("hs"))
        .select(sum(size(col("hs")))).collect()(0).getLong(0)
    }
    time("signatures")(
      Dedup.minHashSignatures(docs, "doc_id", "text").count())
    time("signatures again")(
      Dedup.minHashSignatures(docs, "doc_id", "text").count())
    // candidate stage in isolation (mirrors minHashNearDupPairs internals)
    locally {
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 64)
      val banded = sigs.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(15)),
          b => hash(slice(col("sig"), b * 4 + 1, lit(4))))))
        .toDF("id", "band", "band_sig")
        .repartition(col("band"), col("band_sig"))
      val bucketSizes = banded.groupBy(col("band"), col("band_sig"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1 && col("n") <= 1000)
      val inBuckets = banded.join(bucketSizes, Seq("band", "band_sig"))
      val left = inBuckets.select(col("band"), col("band_sig"), col("id").as("a"))
      val right = inBuckets.select(col("band"), col("band_sig"), col("id").as("b"))
      val candidates = left.join(right, Seq("band", "band_sig"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
        .distinct()
      time("banded only")(banded.count())
      time("candidates only")(candidates.count())
    }
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.8)
    time("full near-dup pairs")(pairs.count())
    import spark.implicits._
    val cands = pairs.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("a", "b")
    time("verify only")(
      Dedup.verifyJaccard(docs, "doc_id", "text", cands, 0.8).count())
    spark.stop()
  }
}
