package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.query.{DynamicQuery, SqlOrder}

/** Q1–Q6 builder semantics, pinned to the reference's
  * `dynamic-query-object.ts:30-66` (page defaults, 50-row cap, skip
  * formula, IN expansion, chainable joins).
  */
class DynamicQuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private def resolve(t: String): DataFrame =
    spark.read.parquet(s"$sf/$t.parquet")
  private def q = new DynamicQuery(resolve)

  test("Q1+Q4+Q5: select, order asc, first page") {
    val rows = q.buildSelect("orders", Seq("o_orderkey", "o_totalprice"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(1, 5)
      .getQuery().collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    assert(rows.map(_.getLong(0)).head ==
      resolve("orders").agg(org.apache.spark.sql.functions.min("o_orderkey"))
        .collect()(0).getLong(0))
  }

  test("Q5: page defaults (page=1, size=10) and hard cap take<=50") {
    val d = q.buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(None, None).getQuery().collect()
    assert(d.length == 10) // default size
    val capped = new DynamicQuery(resolve)
      .buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(1, 500).getQuery().collect()
    assert(capped.length == 50) // cap
    val floor = new DynamicQuery(resolve)
      .buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(0, 3).getQuery().collect()
    assert(floor.length == 3) // page_no < 1 → page 1 (no skip)
  }

  test("Q5: skip = (page-1) * size") {
    val all = q.buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(1, 50).getQuery().collect().map(_.getLong(0))
    val page3 = new DynamicQuery(resolve)
      .buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(3, 10).getQuery().collect().map(_.getLong(0))
    assert(page3.toSeq == all.slice(20, 30).toSeq)
  }

  test("Q3: conditions AND-conjoin; array value expands to IN") {
    val rows = q.buildSelect("orders", Seq("o_orderkey", "o_orderstatus", "o_orderpriority"))
      .condition("o_orderstatus = ?", "O")
      .condition("o_orderpriority IN (?)", Seq("1-URGENT", "2-HIGH"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(1, 50)
      .getQuery().collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "O"))
    assert(rows.forall(r => Set("1-URGENT", "2-HIGH")(r.getString(2))))
  }

  test("Q2: chainable inner equi-join (different key names)") {
    val rows = q.buildSelect("orders", Seq("o_orderkey", "c_name"))
      .buildInnerJoinOn("customer", "o_custkey", "c_custkey")
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(1, 10)
      .getQuery().collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(1).startsWith("Customer#")))
  }

  test("Q4: DESC ordering") {
    val rows = q.buildSelect("orders", Seq("o_orderkey"))
      .buildOrder("o_orderkey", SqlOrder.DESC)
      .buildPagination(1, 5)
      .getQuery().collect().map(_.getLong(0))
    assert(rows.toSeq == rows.toSeq.sortBy(-_))
    assert(rows.head == resolve("orders")
      .agg(org.apache.spark.sql.functions.max("o_orderkey")).collect()(0).getLong(0))
  }

  test("Q6: full assembly — select+join+where+order+pagination") {
    val rows = q.buildSelect("orders", Seq("o_orderkey", "o_totalprice", "c_mktsegment"))
      .buildInnerJoinOn("customer", "o_custkey", "c_custkey")
      .condition("o_totalprice > ?", 1000.0)
      .condition("c_mktsegment IN (?)", Seq("BUILDING", "MACHINERY"))
      .buildOrder("o_orderkey", SqlOrder.ASC)
      .buildPagination(2, 10)
      .getQuery().collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(1) > 1000.0))
    assert(rows.forall(r => Set("BUILDING", "MACHINERY")(r.getString(2))))
  }

  test("string literals escape quotes") {
    val rows = q.buildSelect("customer", Seq("c_custkey"))
      .condition("c_name = ?", "O'Brien")
      .getQuery().collect()
    assert(rows.isEmpty) // no such customer, but no parse error either
  }
}
