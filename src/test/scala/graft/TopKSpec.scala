package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.TopK

/** Parity between the two top-k forms and the plan-shape guarantee
  * that makes [[TopK.max1PerQuery]] the corpus-cardinality-safe one.
  */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("max1PerQuery is byte-identical to topKPerQuery(k=1), ties included") {
    import spark.implicits._
    // deterministic scores with PLANTED ties: sim depends only on
    // (query, neighbor % 7), so each query has 7-way tie groups and
    // the winner must be the smallest neighbor_id of the best group
    val scored = spark.range(5000).select(
      (col("id") % 50).as("query_id"),
      (col("id") / 50).cast("long").as("neighbor_id"))
      .withColumn("sim",
        (xxhash64(col("query_id"), col("neighbor_id") % 7) % 1000L)
          .cast("double") / 1000.0)
    val viaAgg = TopK.topKPerQuery(scored, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val viaMax = TopK.max1PerQuery(scored)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(viaMax.length == 50)
    assert(viaMax.toSeq == viaAgg.toSeq)
  }

  test("max1PerQuery plans declaratively — never ObjectHashAggregate") {
    import spark.implicits._
    val scored = spark.range(1000).select(
      col("id").as("query_id"), (col("id") * 7L).as("neighbor_id"),
      (col("id") % 3).cast("double").as("sim"))
    // the struct max buffer is not hash-agg mutable, so the expected
    // shape is (codegen) SortAggregate with a partial — the property
    // that matters is the ABSENCE of the typed-buffer object agg and
    // its 128-key sort fallback
    val maxPlan = TopK.max1PerQuery(scored)
      .queryExecution.executedPlan.toString
    assert(!maxPlan.contains("ObjectHashAggregate"),
      s"max1PerQuery must stay declarative:\n$maxPlan")
    assert(maxPlan.contains("partial_max"),
      s"map-side partial missing:\n$maxPlan")
    // …while the typed-aggregator form is the object-agg one — the
    // shape this spec exists to keep OFF corpus-keyed paths
    val aggPlan = TopK.topKPerQuery(scored, 1)
      .queryExecution.executedPlan.toString
    assert(aggPlan.contains("ObjectHashAggregate"), aggPlan)
  }
}
