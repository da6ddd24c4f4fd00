package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{CorpusAnalysis, Dedup}

/** Cluster labeling, repetition signals, and decontamination — the
  * corpus-level training-data operators.
  */
class CorpusAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("nearDupClusters: components get min-id labels, singletons label themselves") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    // a 3-chain (diameter 2), a pair, a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L))
  }

  test("nearDupClusters: a long chain converges (multi-iteration propagation)") {
    import spark.implicits._
    // 0-1-2-...-9: diameter 9 forces several propagation rounds
    val docs = (0L to 9L).toDF("doc_id")
    val pairs = (0L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("repetitionScores: hand-computed fractions, short docs score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), // 2-grams: [a a]×2, [a b] → top 2/3, dup 2/3
      (2L, "x"),       // no grams at all
      (3L, "p q r s")  // all grams unique
    ).toDF("doc_id", "text")
    val got = CorpusAnalysis.repetitionScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (t2, d2, t3, d3) = got(1L)
    assert(math.abs(t2 - 2.0 / 3) < 1e-12 && math.abs(d2 - 2.0 / 3) < 1e-12)
    assert(t3 == 0.5 && d3 == 0.0) // [a a a], [a a b] each once
    assert(got(2L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((1.0 / 3, 0.0, 0.5, 0.0)))
  }

  test("contamination: shared 8-grams found, short docs and non-overlaps excluded") {
    import spark.implicits._
    val eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    val bench = Seq((100L, s"$eight tail")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"lead $eight"),      // shares exactly the one 8-gram
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // no overlap
      (3L, "t1 t2 t3")           // too short for any 8-gram
    ).toDF("doc_id", "text")
    val got = CorpusAnalysis.contamination(corpus, bench, "doc_id", "text")
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("id") == 1L && r.getAs[Long]("bench_id") == 100L)
    assert(r.getAs[Long]("shared_ngrams") == 1L)
    assert(r.getAs[Long]("doc_ngrams") == 2L) // "lead t1..t7" and "t1..t8"
    assert(r.getAs[Double]("overlap_frac") == 0.5)
  }
}
