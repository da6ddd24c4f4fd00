package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.HtmlExtract

/** Hand-computed cases for HTML text extraction: element removal
  * ordering (a `</p>` INSIDE script must not break lines), block
  * flattening, tag stripping, single-level entity decoding, and the
  * link-density boilerplate rule including its exact boundary.
  */
class HtmlExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(html: String, maxLd: Double = 0.5): (String, Long, Long) = {
    import spark.implicits._
    val r = HtmlExtract.extractText(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html", maxLd)
      .collect()(0)
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("script/style/comment content vanishes, including tags inside") {
    val (text, nLines, nKept) = run(
      "<html><head><title>T</title><style>body{color:red}</style>" +
        "<script type=\"text/javascript\">var x=1; if(x<2)" +
        "{document.write(\"</p>\")}</script></head>" +
        "<body><!-- a comment with <p> inside --><p>Body text.</p></body>")
    assert(text === "T\nBody text.")
    assert(nLines === 2L && nKept === 2L)
  }

  test("nav line of pure links dropped; prose with one link kept") {
    val (text, nLines, nKept) = run(
      "<div><a href=\"/h\">Home</a> <a href=\"/a\">About us</a></div>" +
        "<p>A longer sentence that has one <a href=\"/x\">inline link</a> " +
        "and plenty of other words.</p>")
    assert(text === "A longer sentence that has one inline link and " +
      "plenty of other words.")
    assert(nLines === 2L && nKept === 1L)
  }

  test("link density boundary: exactly maxLinkDensity is kept") {
    // visible "abc defg" = 8 chars, linked "defg" = 4 -> density 0.5
    val html = "<p>abc <a href=\"x\">defg</a></p>"
    assert(run(html, 0.5)._3 === 1L)
    assert(run(html, 0.49)._3 === 0L)
    assert(run(html, 0.49)._2 === 1L)
  }

  test("entities decode one level; &amp;lt; stays literal &lt;") {
    val (text, _, _) = run(
      "<p>&amp;lt; &quot;x&quot; &#39;y&apos; 1&nbsp;&lt;&nbsp;2 a&amp;b</p>")
    assert(text === "&lt; \"x\" 'y' 1 < 2 a&b")
  }

  test("decoded < is text, never a tag; inline tags strip cleanly") {
    val (text, _, _) = run("<p>x &lt;b&gt;not bold&lt;/b&gt; " +
      "but <b>this strips</b> fine</p>")
    assert(text === "x <b>not bold</b> but this strips fine")
  }

  test("block tags (any case, self-closing) break lines; inline do not") {
    val (text, nLines, _) = run(
      "<H1>Head</H1>one two<BR/>three <i>four</i><p>five</p>")
    assert(text === "Head\none two\nthree four\nfive")
    assert(nLines === 4L)
  }

  test("null and plain-text inputs") {
    import spark.implicits._
    val out = HtmlExtract.extractText(
      Seq((1L, null.asInstanceOf[String]), (2L, "Plain text, no markup."))
        .toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("", 0L, 0L)))
    assert(out(2L) === (("Plain text, no markup.", 1L, 1L)))
  }

  test("whitespace runs collapse inside a line") {
    val (text, _, _) = run("<p>a\t b   c</p><p>  </p>")
    assert(text === "a b c")
  }
}
