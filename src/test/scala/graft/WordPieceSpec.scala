package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.WordPieceTokenizer

/** WordPiece greedy longest-match segmentation: per-word contract
  * (longest-first, ## continuation, whole-word [UNK], codepoint
  * slicing) plus the corpus-level vocabulary-table shape.
  */
class WordPieceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hs(vs: String*): java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    vs.foreach(h.add)
    h
  }

  test("greedy longest-match with continuation prefix") {
    val v = hs("un", "##aff", "##able", "##ff", "##a", "##b", "##le",
      "unaffable", "hug", "##s")
    // whole-word entry wins over any segmentation
    assert(WordPieceTokenizer.encodeWord("unaffable", v, "[UNK]").toSeq ==
      Seq("unaffable"))
    // longest CONTINUATION wins at each step: ##aff beats ##a, ##able
    // beats ##ab+... (classic BERT example)
    assert(WordPieceTokenizer.encodeWord("unaffordable",
      hs("un", "##aff", "##ord", "##able", "##a"), "[UNK]").toSeq ==
      Seq("un", "##aff", "##ord", "##able"))
    assert(WordPieceTokenizer.encodeWord("hugs", v, "[UNK]").toSeq ==
      Seq("hug", "##s"))
  }

  test("a dead-end remainder makes the WHOLE word [UNK]") {
    val v = hs("hu", "##g") // "hugs": hu ##g then 's' unmatched
    assert(WordPieceTokenizer.encodeWord("hugs", v, "[UNK]").toSeq ==
      Seq("[UNK]"))
    // no initial match at all
    assert(WordPieceTokenizer.encodeWord("zap", v, "<unk>").toSeq ==
      Seq("<unk>"))
  }

  test("slicing is codepoint-based: astral-plane chars are one symbol") {
    val gClef = new String(Character.toChars(0x1D11E)) // surrogate pair
    val v = hs("a", s"##$gClef", "##b")
    assert(WordPieceTokenizer.encodeWord(s"a${gClef}b", v, "[UNK]").toSeq ==
      Seq("a", s"##$gClef", "##b"))
  }

  test("corpus encode: order preserved, counts exact, empty docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "table win window"),
      (2L, "slow table"), // "slow" dead-ends on ##w -> [UNK]
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val vocab = ('a' to 'z').map(_.toString) ++
      ('a' to 'z').filter(_ != 'w').map("##" + _) ++
      Seq("table", "win", "##dow")
    val out = WordPieceTokenizer.encode(docs, "doc_id", "text", vocab)
      .orderBy("id")
      .select("id", "n_words", "n_subwords", "wp_tokens")
      .as[(Long, Long, Long, Seq[String])].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0) == ((1L, 3L, 4L, Seq("table", "win", "win", "##dow"))))
    assert(out(1) == ((2L, 2L, 2L, Seq("[UNK]", "table"))))
  }

  test("encode matches per-word reference under repartitioning") {
    import spark.implicits._
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ",
        lit("value"), lit("scan"),
        concat(lit("w"), (col("id") % 7).cast("string"))).as("text"))
      .repartition(7)
    val vocab = ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
      ('a' to 'z').map("##" + _) ++ ('0' to '9').map("##" + _) ++
      Seq("val", "##ue", "sc", "##an")
    val out = WordPieceTokenizer.encode(docs, "doc_id", "text", vocab)
      .select("id", "wp_tokens").as[(Long, Seq[String])].collect().toMap
    assert(out.size == 200)
    val h = {
      val s = new java.util.HashSet[String]()
      vocab.foreach(s.add)
      s
    }
    (0L until 200L).foreach { i =>
      val expected = Seq("value", "scan", s"w${i % 7}").flatMap(w =>
        WordPieceTokenizer.encodeWord(w, h, "[UNK]"))
      assert(out(i) == expected, s"doc $i")
    }
  }
}
