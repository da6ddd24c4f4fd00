package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.CorpusAnalysis

/** Hand-computed cases for the C4 line-level cleaner (Raffel et al.
  * 2020 §2.2): every line rule, both doc rules, null/empty text, and
  * the report-then-filter contract.
  */
class C4CleanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(rows: (Long, String)*): Map[Long, (String, Long, Long, Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    CorpusAnalysis.c4Clean(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
  }

  test("line rules: terminal punct, min words, javascript") {
    val good1 = "This sentence has enough words to survive."
    val good2 = "Does it also keep questions with enough words?"
    val good3 = "Quoted sentences are fine per the paper's rule \""
    val noPunct = "this line has no terminal punctuation at all"
    val short = "Too short line."
    val js = "Please enable JavaScript to view this content."
    val doc = Seq(good1, noPunct, short, js, good2, good3).mkString("\n")
    val out = run((1L, doc))(1L)
    assert(out._1 === Seq(good1, good2, good3).mkString("\n"))
    assert(out._2 === 6L && out._3 === 3L)
    assert(!out._4 && !out._5)
    assert(out._6) // 3 kept >= default minLinesKept=3
  }

  test("doc rules: lorem ipsum and brace fail the doc but lines still clean") {
    val keepable = "A perfectly reasonable sentence with many words here."
    val lorem = "Lorem ipsum dolor sit amet our training set regrets."
    val brace = "This sentence smuggles a { brace into the document."
    val base = Seq(keepable, keepable, keepable)
    val out = run(
      (1L, (base :+ lorem).mkString("\n")),
      (2L, (base :+ brace).mkString("\n")),
      (3L, base.mkString("\n")))
    assert(out(1L)._4 && !out(1L)._6) // has_lorem, fails
    assert(out(2L)._5 && !out(2L)._6) // has_brace, fails
    // the offending lines themselves are otherwise keepable sentences
    assert(out(1L)._3 === 4L && out(2L)._3 === 4L)
    assert(out(3L)._6 && out(3L)._1 === base.mkString("\n"))
  }

  test("minLinesKept gates pass; order is preserved") {
    val a = "First retained sentence with plenty of words here."
    val b = "Second retained sentence with plenty of words here."
    import spark.implicits._
    val out = CorpusAnalysis.c4Clean(
      Seq((1L, s"$a\nnoise line\n$b")).toDF("doc_id", "text"),
      "doc_id", "text", minLinesKept = 3).collect()(0)
    assert(out.getString(1) === s"$a\n$b")
    assert(out.getLong(3) === 2L && !out.getBoolean(6))
  }

  test("null and empty text clean to empty and fail") {
    import spark.implicits._
    val out = CorpusAnalysis.c4Clean(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "" && !out(1L).getBoolean(6))
    assert(out(2L).getString(1) === "" && out(2L).getLong(2) === 1L &&
      out(2L).getLong(3) === 0L && !out(2L).getBoolean(6))
  }

  test("word counting is whitespace-token based, case-insensitive matches") {
    // exactly 5 words ending in '!' passes the default threshold;
    // 4 words does not; JAVASCRIPT uppercase still trips the rule
    val five = "one two three four five!"
    val four = "one two three four!"
    val jsUp = "THIS PAGE NEEDS JAVASCRIPT TO RENDER PROPERLY!"
    val out = run((1L, Seq(five, four, jsUp).mkString("\n")))(1L)
    assert(out._1 === five)
  }
}
