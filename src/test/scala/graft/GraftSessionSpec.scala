package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TopK

/** The library session bootstrap: a user session built through
  * [[GraftSession]] — with otherwise-default confs — must get the
  * engine-tuned settings the committed benchmarks measure, in
  * particular the object-agg hash path for bucket-keyed bounded
  * collects (Spark's default 128-key sort-based fallback demotes them
  * to a per-task external sort).
  */
class GraftSessionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("builder form sets every tuned conf on a default session") {
    GraftSession.tunedConfs.foreach { case (k, v) =>
      assert(spark.conf.get(k) === v, k)
    }
    assert(
      spark.conf.get(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        === "16384")
  }

  test("bucket-keyed bounded collect stays on the hash path at >128 keys") {
    // 5000 grouping keys — far past Spark's default 128-key fallback.
    // The plan must be ObjectHashAggregate (the hash form), the
    // session threshold must clear the key count, and the result must
    // honor the cap contract.
    val df = spark.range(20000).select(
      (col("id") % 5000).as("bucket"), col("id").as("member"))
    val collect2 = TopK.boundedCollect[Long](cap = 2)
    val agg = df.groupBy(col("bucket"))
      .agg(collect2(col("member")).as("members"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt
      > 5000)
    val rows = agg.collect()
    assert(rows.length === 5000)
    // cap+1 truncation: every bucket has 4 members, cap 2 → length 3
    assert(rows.forall(_.getSeq[Long](1).length === 3))
  }

  test("configure(existing session) applies the same confs at runtime") {
    val fresh = spark.newSession()
    // a fresh session inherits the shared conf here (newSession copies
    // it), so reset to Spark's default first to prove configure works
    fresh.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    GraftSession.configure(fresh)
    GraftSession.tunedConfs.foreach { case (k, v) =>
      assert(fresh.conf.get(k) === v, k)
    }
  }
}
