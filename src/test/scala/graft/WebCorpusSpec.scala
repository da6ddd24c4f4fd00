package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.WebCorpus

/** Hand-computed cases for domain-level accounting and blocklist
  * verdicts: suffix matching depth, exact-domain fallback past
  * maxLabels, unparseable URLs, and the report's exact counts.
  */
class WebCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("domainReport: exact counts, www-stripped grouping, non-URL bucket") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://www.example.com/a", "three words here"),
      (2L, "http://example.com/b", "two words"),
      (3L, "https://api.example.com/c", ""),
      (4L, "not a url", "one"),
      (5L, null.asInstanceOf[String], "x y z w")
    ).toDF("doc_id", "url", "text")
    val rep = WebCorpus.domainReport(docs, "url", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rep("example.com") === ((2L, 5L, 0L, 2.5)))
    assert(rep("api.example.com") === ((1L, 0L, 1L, 0.0)))
    assert(rep("") === ((2L, 5L, 0L, 2.5))) // non-URL + null bucket
  }

  test("blocklist: suffix blocks subdomains, exact match, never 1-label") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://evil.com/x"),
      (2L, "https://tracker.evil.com/y"),
      (3L, "https://deep.a.b.tracker.evil.com/z"),
      (4L, "https://evilcom.net/ok"),       // substring, NOT a suffix
      (5L, "https://good.org/fine"),
      (6L, "garbage"),                      // unparseable -> never blocked
      (7L, "https://com/weird")             // 1-label domain
    ).toDF("doc_id", "url")
    val bl = Seq("evil.com").toDF("domain")
    val got = WebCorpus.blocklistVerdicts(docs, "doc_id", "url", bl)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> false, 7L -> false))
  }

  test("exact domain matches even past maxLabels; parent depth is capped") {
    import spark.implicits._
    val deep = "a.b.c.d.e.f.g.h" // 8 labels
    val docs = Seq(
      (1L, s"https://$deep/x"),
      (2L, s"https://sub.$deep/y") // 9 labels; match needs 8-label suffix
    ).toDF("doc_id", "url")
    val bl = Seq(deep).toDF("domain")
    val got = WebCorpus.blocklistVerdicts(docs, "doc_id", "url", bl,
      maxLabels = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // doc 1: exact-domain candidate matches despite maxLabels=4;
    // doc 2: the 8-label parent suffix is beyond the cap -> unblocked
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("one doc matching several entries stays one row") {
    import spark.implicits._
    val docs = Seq((1L, "https://x.bad.evil.com/p")).toDF("doc_id", "url")
    val bl = Seq("evil.com", "bad.evil.com").toDF("domain")
    val out = WebCorpus.blocklistVerdicts(docs, "doc_id", "url", bl).collect()
    assert(out.length === 1 && out(0).getBoolean(2))
  }

  test("autoBlocklist: rate + floor semantics, exact counts") {
    import spark.implicits._
    val docs = Seq(
      // spam.com: 3 docs, 2 flagged (67% > 15%, >= 3 docs) -> blocked
      ("https://spam.com/1", "buy pills now"),
      ("https://spam.com/2", "cheap pills here"),
      ("https://spam.com/3", "perfectly fine text"),
      // ok.org: 3 docs, 0 flagged -> kept
      ("https://ok.org/1", "clean a"), ("https://ok.org/2", "clean b"),
      ("https://ok.org/3", "clean c"),
      // tiny.net: 1 doc 100% flagged but below the 3-doc floor -> kept
      ("https://tiny.net/1", "pills"),
      // unparseable URL joins the '' bucket
      ("garbage", "pills pills")
    ).toDF("url", "text")
    val got = WebCorpus.autoBlocklist(docs, "url", "text",
      Seq("pills"), minDocs = 3L, maxBadFrac = 0.15)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got("spam.com") === ((3L, 2L, true)))
    assert(got("ok.org") === ((3L, 0L, false)))
    assert(got("tiny.net") === ((1L, 1L, false)))
    assert(got("") === ((1L, 1L, false)))
  }

  test("domainCap: deterministic smallest-hash winners per domain") {
    import spark.implicits._
    val docs = ((1L to 6L).map(i => i -> s"https://big.com/$i") ++
      Seq(7L -> "http://www.small.org/x", 8L -> "https://small.org/y",
        9L -> "garbage not a url")).toDF("doc_id", "url")
    // independent expectation: smallest-2 md5-60(salt:id) per domain
    val hashes = docs.select(col("doc_id"),
      graft.functions.TextFunctions.md5Hash60(
        concat(lit("caps:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def smallest(ids: Seq[Long], k: Int) =
      ids.sortBy(i => (hashes(i), i)).take(k)
    val expected =
      smallest(1L to 6L, 2).map("big.com" -> _) ++
      smallest(Seq(7L, 8L), 2).map("small.org" -> _) ++
      smallest(Seq(9L), 2).map("" -> _)
    val run1 = WebCorpus.domainCap(docs, "doc_id", "url", 2, "caps")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(run1.map(t => t._1 -> t._3).toSet === expected.toSet)
    // ranks are contiguous from 1 inside each domain
    assert(run1.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted === (1 to rows.size).toSeq })
    // deterministic across runs
    val run2 = WebCorpus.domainCap(docs, "doc_id", "url", 2, "caps")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(run1.toSet === run2.toSet)
  }
}
