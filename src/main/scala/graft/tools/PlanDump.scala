package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for named SparkEntry
  * queries to `<outDir>/<query>_<tag>.txt` — the evidence files the
  * optimization rounds commit under `plans/`. Run:
  * `sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <q> [q...]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, outDir, tag, rest @ _*) = args.toSeq: @unchecked
    val spark = graft.GraftSession.configure(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    rest.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q}_$tag.txt"), plan)
        println(s"PLANDUMP wrote $outDir/${q}_$tag.txt")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
