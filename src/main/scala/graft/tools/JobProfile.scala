package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiling: run named SparkEntry queries with a job/stage-level
  * listener, printing each Spark job's wall time and each stage's name
  * (callsite) plus the query's total — separates driver/planning/
  * codegen time (gaps between jobs) from executed-job time. Run:
  * `sbt "runMain graft.tools.JobProfile <sfDir> <query> [query...]"`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.configure(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = List.empty[(Int, Long, Long)]
    @volatile var stages = List.empty[(Int, Long, String)] // id, wallMs, name
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = if (starts.containsKey(j.jobId)) starts.get(j.jobId).longValue else j.time
        jobs = (j.jobId, s, j.time) :: jobs
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages = (si.stageId, wall, si.name) :: stages
      }
    })

    // warm the session like Bench does
    try {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100)
        .groupBy(col("l_returnflag")).count().collect()
    } catch { case _: Throwable => () }

    args.drop(1).foreach { q =>
      (1 to 2).foreach { run =>
        jobs = Nil; stages = Nil
        starts.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        val totalMs = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300) // let the listener bus drain
        val js = jobs.sortBy(_._2)
        val jobMs = js.map(j => j._3 - j._2).sum
        println(f"== $q run$run total=${totalMs}%.0fms jobs=${js.size} jobTime=${jobMs}ms gap=${totalMs - jobMs}%.0fms")
        stages.sortBy(_._1).foreach { case (id, w, n) =>
          println(f"   stage $id%4d ${w}%6dms  $n")
        }
      }
    }
    spark.stop()
  }
}
