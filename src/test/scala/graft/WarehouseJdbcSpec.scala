package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sinks.Warehouse

/** B1 JDBC sink parity: batched append through DataFrameWriter.jdbc
  * round-trips against an embedded Derby database (the same driver-level
  * batching path a Postgres target would use, minus
  * reWriteBatchedInserts which is Postgres-specific).
  */
class WarehouseJdbcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("writeFeaturesJdbc appends in batches and rounds trip") {
    import spark.implicits._
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val rows = (1 to 2500).map(i =>
      (s"""{"type":"Feature","geometry":null,"properties":{"_id":"f$i"}}""",
        "user1", "ds_jdbc"))
    val df = rows.toDF("feature", "requested_by", "tdei_dataset_id")

    // batchsize 1000 → 3 executeBatch rounds on a single partition.
    // Derby maps StringType to CLOB (no equality support), so pin
    // VARCHAR DDL — the same knob a Postgres deploy would use for TEXT.
    val ddl = Map("createTableColumnTypes" ->
      "feature VARCHAR(2000), requested_by VARCHAR(100), tdei_dataset_id VARCHAR(100)")
    wh.writeFeaturesJdbc(url, "content_node", df.coalesce(1),
      batchSize = 1000, writerOptions = ddl)
    val back = wh.readJdbc(url, "content_node")
    assert(back.count() == 2500)
    assert(back.columns.sorted.toSeq ==
      Seq("feature", "requested_by", "tdei_dataset_id"))
    assert(back.filter(col("tdei_dataset_id") === "ds_jdbc").count() == 2500)

    // append semantics (a second load adds, like the reference's INSERTs)
    wh.writeFeaturesJdbc(url, "content_node",
      df.limit(10).coalesce(1), batchSize = 1000)
    assert(wh.readJdbc(url, "content_node").count() == 2510)
  }

  test("connection bound caps partitions at maxConnections") {
    import spark.implicits._
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val df = (1 to 100).map(i => (s"f$i", "u", "ds"))
      .toDF("feature", "requested_by", "tdei_dataset_id")
      .repartition(8)
    wh.writeFeaturesJdbc(url, "content_capped", df, maxConnections = 2)
    assert(wh.readJdbc(url, "content_capped").count() == 100)
  }
}
