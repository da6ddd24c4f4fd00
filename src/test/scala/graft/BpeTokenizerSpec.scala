package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.BpeTokenizer

/** Specs for BPE training/encoding against an independent in-memory
  * implementation of Sennrich et al.'s algorithm (plain Scala maps and
  * lists — no Spark code shared with the operator).
  */
class BpeTokenizerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- independent reference implementation ----
  // CODE-POINT split, like substring(word, j, 1) in Spark and DuckDB
  private def refSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp))) :+
      BpeTokenizer.EndOfWord

  private def refMerge(s: Vector[String], l: String, r: String): Vector[String] =
    s.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** (merges, final word table) after n iterations. */
  private def refTrain(wordCnt: Map[String, Long], n: Int)
      : (Vector[(String, String, Long)], Map[String, Vector[String]]) = {
    var words = wordCnt.map { case (w, c) => w -> (refSyms(w), c) }
    var merges = Vector.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val pairs = words.values.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        merges :+= ((l, r, c))
        words = words.map { case (w, (syms, cc)) =>
          w -> (refMerge(syms, l, r), cc)
        }
      }
    }
    (merges, words.map { case (w, (syms, _)) => w -> syms })
  }

  test("trainBpeMerges matches the in-memory reference on a planted corpus") {
    val docs = docsDf(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest newest widest widest"),
      (3L, "low newest"))
    val wordCnt = Map("low" -> 4L, "lower" -> 2L, "newest" -> 5L,
      "widest" -> 2L)
    val (expMerges, _) = refTrain(wordCnt, 10)
    val got = BpeTokenizer.trainBpeMerges(docs, "text", 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toVector
    assert(got === expMerges)
    // sanity on the domain: 'est</w>' or 'st</w>' family must emerge
    // from the est-heavy corpus within 10 merges
    assert(got.exists { case (l, r, _) => (l + r).contains("est") })
  }

  test("greedy merge is left-to-right non-overlapping (aaaa -> aa,aa)") {
    val docs = docsDf((1L, "aaaa aaaa aaa"))
    // first merge must be (a,a); applying it to 'aaaa' gives [aa,aa,</w>]
    // and to 'aaa' gives [aa,a,</w>] — the fold contract, not replace()
    val merges = BpeTokenizer.trainBpeMerges(docs, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.head === (("a", "a")))
    val enc = BpeTokenizer
      .applyBpeMerges(docs, "doc_id", "text", merges.toSeq)
      .collect()(0)
    assert(enc.getSeq[String](3) ===
      Seq("aa", "aa", "</w>", "aa", "aa", "</w>", "aa", "a", "</w>"))
  }

  test("astral-plane words train and encode per CODE POINT (oracle split)") {
    // 𝕒 (U+1D552) and 𝕓 (U+1D553) are surrogate pairs in UTF-16; a
    // code-unit split would produce lone-surrogate symbols and a
    // merge table no SQL engine can replay
    val astral = "𝕒𝕓" // 𝕒𝕓 — 2 code points, 4 chars
    val docs = docsDf((1L, s"$astral $astral $astral ${astral}x"))
    val wordCnt = Map(astral -> 3L, s"${astral}x" -> 1L)
    val (expMerges, table) = refTrain(wordCnt, 4)
    val merges = BpeTokenizer.trainBpeMerges(docs, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toVector
    assert(merges === expMerges)
    // symbols are built from whole code points, so every learned side
    // is well-formed (round-trips through UTF-8 without replacement)
    import java.nio.charset.StandardCharsets.UTF_8
    merges.foreach { case (l, r, _) =>
      assert(new String(l.getBytes(UTF_8), UTF_8) === l)
      assert(new String(r.getBytes(UTF_8), UTF_8) === r)
    }
    val enc = BpeTokenizer
      .applyBpeMerges(docs, "doc_id", "text",
        merges.map { case (l, r, _) => (l, r) })
      .collect()(0)
    assert(enc.getSeq[String](3) ===
      Seq(astral, astral, astral, s"${astral}x").flatMap(table))
  }

  test("applyBpeMerges matches the reference end-to-end incl. composition") {
    val docs = docsDf(
      (1L, "low lower newest"),
      (2L, "widest newest newest"),
      (3L, ""))
    val train = docsDf(
      (10L, "low low low lower lower newest newest newest newest widest widest"))
    val wordCnt = Map("low" -> 3L, "lower" -> 2L, "newest" -> 4L,
      "widest" -> 2L)
    val (refM, table) = refTrain(wordCnt, 6)
    val merges = BpeTokenizer.trainBpeMerges(train, "text", 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges === refM.map { case (l, r, _) => (l, r) })
    val got = BpeTokenizer.applyBpeMerges(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[String](3))).toMap
    assert(got.keySet === Set(1L, 2L))  // empty doc excluded
    def enc(ws: String*): Seq[String] = ws.flatMap(table)
    assert(got(1L)._3 === enc("low", "lower", "newest"))
    assert(got(2L)._3 === enc("widest", "newest", "newest"))
    assert(got(1L)._1 === 3L && got(1L)._2 === enc("low", "lower", "newest").size)
  }
}
