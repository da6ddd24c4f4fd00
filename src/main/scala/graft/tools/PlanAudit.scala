package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: print the formatted physical plans of the flagship
  * operators — the review loop behind PLANS.md. Run:
  * `sbt "runMain graft.tools.PlanAudit"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.configure(SparkSession.builder()).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== $name ========")
      df.explain("formatted")
    }

    show("q_dyn_join (3-table chain + pushdown)")(
      graft.SparkEntry.queries("q_dyn_join")(spark, sf))
    show("q1_agg (partial agg)")(
      graft.SparkEntry.queries("q1_agg")(spark, sf))
    show("minhash_near_dup (keyed buckets)")(
      graft.SparkEntry.queries("q_minhash_near_dup")(spark, sf))
    show("knn_brute (broadcast + bounded topk)")(
      graft.SparkEntry.queries("q_knn_brute")(spark, sf))
    show("geo_point (native codegen expr)")(
      graft.SparkEntry.queries("q_geo_point")(spark, sf))
    show("repetition (hashed-gram keyed aggs)")(
      graft.SparkEntry.queries("q_repetition")(spark, sf))
    show("contamination (gram-hash equi-join)")(
      graft.SparkEntry.queries("q_contamination")(spark, sf))
    show("quality gate (verdict CASE must appear once)")(
      graft.SparkEntry.queries("q_filter")(spark, sf))
    show("knn_ivf (closure-matrix centroid kernel, narrow assignment)")(
      graft.SparkEntry.queries("q_knn_ivf")(spark, sf))
    show("semantic_dedup_int (kernel argmin + capped clusters + observe)")(
      graft.SparkEntry.queries("q_semantic_dedup_int")(spark, sf))
    spark.stop()
  }
}
