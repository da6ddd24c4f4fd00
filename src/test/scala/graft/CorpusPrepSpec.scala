package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{CorpusPrep, Similarity}

/** Hand-computed cases for the corpus-prep operators: C4 bad-word
  * matching semantics (word boundaries, phrases, case folding),
  * Mikolov phrase scores, deterministic split assignment, and
  * hard-negative mining's label exclusion.
  */
class CorpusPrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("badWords: token boundaries, phrases, case-insensitive, distinct hits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "this GRASS is green"),        // 'ass' is a substring, NOT a token
      (2L, "kick Ass now"),               // 1-word entry, doc-side case
      (3L, "a very Bad Word indeed"),     // 2-word phrase across case
      (4L, "bad word bad word bad"),      // repeated -> still ONE distinct hit
      (5L, "word bad"),                   // reversed order: no phrase match
      (6L, ""),                           // empty text
      (7L, null.asInstanceOf[String])     // null text
    ).toDF("doc_id", "text")
    val got = CorpusPrep.badWordsReport(docs, "doc_id", "text",
      Seq("ASS", "Bad Word"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got === Map(
      1L -> ((0L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((1L, false)), 5L -> ((0L, true)), 6L -> ((0L, true)),
      7L -> ((0L, true))))
  }

  test("badWords: a doc matching entries of BOTH lengths counts each once") {
    import spark.implicits._
    val docs = Seq((1L, "x bad word y ass z")).toDF("doc_id", "text")
    val got = CorpusPrep.badWordsReport(docs, "doc_id", "text",
      Seq("ass", "bad word")).collect()
    assert(got.head.getLong(1) === 2L && !got.head.getBoolean(2))
  }

  test("phraseScores: exact counts and the paper's discounted score") {
    import spark.implicits._
    // "new york" x3 adjacent; unigrams: new=4 (one stray), york=3,
    // city=2; N=9 tokens total
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "new york city"),
      (3L, "new city")
    ).toDF("doc_id", "text")
    val rows = CorpusPrep.phraseScores(docs, "text", minCount = 2,
      delta = 1, topK = 10).collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // c_ab=3, c_a(new)=4, c_b(york)=3, N=9 -> (3-1)*9/(4*3) = 1.5
    assert(byPair(("new", "york")) === ((3L, 4L, 3L, 1.5)))
    // "york new" appears once (doc 1 interior) -> dropped by minCount=2
    assert(!byPair.contains(("york", "new")))
    // "york city" c_ab=1 dropped; "new city" c_ab=1 dropped
    assert(byPair.keySet === Set(("new", "york")))
  }

  test("phraseScores: ordering is (score DESC, w1, w2) and topK bounds") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c d c d")).toDF("doc_id", "text")
    val rows = CorpusPrep.phraseScores(docs, "text", minCount = 1,
      delta = 0, topK = 3).collect()
    assert(rows.length === 3)
    val scores = rows.map(_.getDouble(5))
    assert(scores.sorted.reverse.toSeq === scores.toSeq)
  }

  test("splitAssign: exhaustive, deterministic, fraction-shaped") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val out = CorpusPrep.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    val counts = out.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)            // every row assigned
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 1400L && counts("train") < 1800L)
    assert(counts("val") > 100L && counts("val") < 320L)
    // pure function of (id, salt): rerun matches exactly
    val again = CorpusPrep.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
    // growth-stable: a subset's assignments are unchanged
    val sub = CorpusPrep.splitAssign(df.filter(col("id") < 100), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    assert(sub.except(out.filter(col("id") < 100)).count() === 0)
  }

  test("splitAssign: rejects bad fraction sets") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      CorpusPrep.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.splitAssign(df, "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      CorpusPrep.splitAssign(df, "id", Seq.empty)
    }
  }

  test("hardNegatives: same-label and self excluded, top-k by cosine") {
    import spark.implicits._
    // 2-d integer vectors: query (10,0) label 1.
    // candidates: (10,1) label 1 (same label - excluded even though
    // closest), (9,1) label 2, (0,10) label 2, (10,0) label null
    val corpus = Seq(
      (1L, Seq(10L, 0L), Option(1)),
      (2L, Seq(10L, 1L), Option(1)),
      (3L, Seq(9L, 1L), Option(2)),
      (4L, Seq(0L, 10L), Option(2)),
      (5L, Seq(10L, 0L), Option.empty[Int])
    ).toDF("id", "vec", "label")
    val got = Similarity.hardNegatives(corpus,
      corpus.filter(col("id") === 1L), "id", "vec", "label", 2)
      .orderBy(col("rank")).collect()
    // rank 1: id 5 (identical direction, null label IS a negative);
    // rank 2: id 3; id 2 (same label) and id 4 (k bound) never appear
    assert(got.map(_.getLong(2)).toSeq === Seq(5L, 3L))
    assert(got.head.getDouble(3) === 1.0)
  }

  test("hardNegatives: null-labeled query treats everything as negative") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(10L, 0L), Option.empty[Int]),
      (2L, Seq(10L, 1L), Option(1)),
      (3L, Seq(5L, 5L), Option.empty[Int])
    ).toDF("id", "vec", "label")
    val got = Similarity.hardNegatives(corpus,
      corpus.filter(col("id") === 1L), "id", "vec", "label", 5)
      .collect().map(_.getLong(2)).toSet
    // null <=> null is TRUE: two null-labeled docs count as same-label
    // and are excluded — only the labeled id 2 survives as a negative
    assert(got === Set(2L))
  }

  test("scriptProfile: counts, dominance priority on ties, null text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello мир 123"),       // 5 latin, 3 cyrillic, 3 digit, 2 space
      (2L, "ддд数数数"),            // 3-3 tie -> cyrillic by priority
      (3L, "数数数дд"),             // han wins 3-2
      (4L, "12 34"),               // no script chars -> null dominant
      (5L, null.asInstanceOf[String]),
      (6L, "καλημέρα שלום")         // greek 8, hebrew 4
    ).toDF("doc_id", "text")
    val got = CorpusPrep.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long, c: String) = got(id).getAs[Any](c)
    assert(f(1L, "n_latin") == 5L && f(1L, "n_cyrillic") == 3L &&
      f(1L, "n_digit") == 3L && f(1L, "n_space") == 2L &&
      f(1L, "dominant_script") == "latin" &&
      f(1L, "dominant_frac") == 5.0 / 8.0, got(1L).toString)
    assert(f(2L, "dominant_script") == "cyrillic" &&
      f(2L, "dominant_frac") == 0.5, got(2L).toString)
    assert(f(3L, "dominant_script") == "han", got(3L).toString)
    assert(f(4L, "n_script") == 0L && f(4L, "dominant_script") == null &&
      f(4L, "dominant_frac") == null, got(4L).toString)
    assert(f(5L, "n_chars") == 0L && f(5L, "dominant_script") == null,
      got(5L).toString)
    assert(f(6L, "n_greek") == 8L && f(6L, "n_hebrew") == 4L &&
      f(6L, "dominant_script") == "greek", got(6L).toString)
  }
}
