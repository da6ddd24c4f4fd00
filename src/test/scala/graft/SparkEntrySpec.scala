package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract-consistency guard for the driver harness: every oracle key
  * must name a registered query, every query must at least ANALYZE
  * against the smallest scale factor (catching renamed/missing columns
  * without paying full execution), and the flagship entry must return
  * rows.
  */
class SparkEntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("every query analyzes at sf0.001 (column/name errors surface here)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema =
        try fn(spark, sf).schema
        catch { case e: Throwable =>
          fail(s"query $name failed analysis: ${e.getMessage}")
        }
      assert(schema.nonEmpty, s"query $name has an empty schema")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
