package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.CorpusAnalysis

/** Specs for the Gopher rule filter: hand-computed measurements per
  * rule, each rule's kill shot in isolation, and null/empty handling.
  */
class GopherRulesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(text: String, minWords: Int = 50) = {
    import spark.implicits._
    CorpusAnalysis.gopherRules(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = minWords).collect()(0)
  }

  test("measurements match hand computation") {
    val r = run("the cat sat on # …mat\nnow then...", minWords = 2)
    assert(r.getAs[Long]("n_words") == 8, r.toString)
    // chars: the3 cat3 sat3 on2 #1 …mat4 now3 then...7 = 26
    assert(math.abs(r.getAs[Double]("mean_word_len") - 26.0 / 8) < 1e-15)
    // symbols: one '#', one '…', one literal '...'
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 3.0 / 8) < 1e-15)
    assert(r.getAs[Double]("bullet_frac") == 0.0)
    assert(r.getAs[Double]("ellipsis_frac") == 0.5) // line 2 ends "..."
    // words with an alphabetic char: all but "#" → 7/8
    assert(math.abs(r.getAs[Double]("alpha_frac") - 7.0 / 8) < 1e-15)
    assert(r.getAs[Int]("stopword_hits") == 1) // only "the"
  }

  test("each rule kills in isolation") {
    val goodWords = (1 to 60).map(i => s"word$i").mkString(" ")
    val base = "the words have to be of that with " + goodWords
    assert(run(base).getAs[Boolean]("pass"), run(base).toString)
    // too short
    assert(!run("the of short").getAs[Boolean]("pass"))
    // mean word length too long
    val longWords = (1 to 60).map(_ => "supercalifragilistic").mkString(" ")
    assert(!run("the of " + longWords).getAs[Boolean]("pass"))
    // symbol ratio: 60 words + 10 hashes
    assert(!run(base + " " + "# " * 10).getAs[Boolean]("pass"))
    // bullet lines: every line a bullet
    val bullets = (1 to 60).map(i => s"• the of item$i").mkString("\n")
    assert(!run(bullets).getAs[Boolean]("pass"))
    // ellipsis endings on half the lines
    val ell = (1 to 60).map(i =>
      if (i % 2 == 0) s"the of line$i..." else s"line$i").mkString("\n")
    assert(!run(ell).getAs[Boolean]("pass"))
    // alpha fraction: 60 real words + 40 numerics
    assert(!run(base + " " + (1 to 40).map(_.toString).mkString(" "))
      .getAs[Boolean]("pass"))
    // stopword hits: long doc with zero gopher stopwords
    assert(!run(goodWords).getAs[Boolean]("pass"))
  }

  test("null and empty docs measure zero and fail") {
    import spark.implicits._
    val got = CorpusAnalysis.gopherRules(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_words") == 0)
      assert(!r.getAs[Boolean]("pass"))
    }
  }
}
