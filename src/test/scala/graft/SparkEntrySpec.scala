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
  private val allSfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  // Fixture-schema tripwire: the driver regenerates the shared parquet
  // fixtures between rounds and has changed physical types before
  // (events.ts nanos-int64 → timestamp[us]). Analyzing every registered
  // query against EVERY scale factor — not just the smallest — catches a
  // single-SF regeneration that would otherwise slip through half-checked.
  // Analysis reads only footers, so the sf0.1 pass costs no execution.
  allSfDirs.foreach { dir =>
    test(s"every query analyzes at $dir (column/name/type errors surface here)") {
      SparkEntry.queries.foreach { case (name, fn) =>
        val schema =
          try fn(spark, dir).schema
          catch { case e: Throwable =>
            fail(s"query $name failed analysis at $dir: ${e.getMessage}")
          }
        assert(schema.nonEmpty, s"query $name has an empty schema at $dir")
      }
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
