package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.UnigramTokenizer

/** Specs for the unigram (SentencePiece-style) tokenizer: Viterbi
  * min-cost segmentation with the cut-mask tie-break checked against
  * exhaustive enumeration, the DataFrame encoder against per-word
  * composition, and the hard-EM trainer's invariants on a planted
  * compositional corpus.
  */
class UnigramTokenizerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def vmap(vs: (String, Long)*): java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    vs.foreach { case (p, c) => m.put(p, c) }
    m
  }

  // exhaustive reference: every cut mask, same (cost, mask) objective
  private def refEncode(word: String, vocab: Map[String, Long],
      unkCost: Long): (Seq[String], Long) = {
    val cps = word.codePoints().toArray.map(cp =>
      new String(Character.toChars(cp)))
    val n = cps.length
    var best: Option[(Long, Long, Seq[String])] = None
    for (mask <- 0L until (1L << math.max(0, n - 1))) {
      val cuts = (1 until n).filter(j => ((mask >> (j - 1)) & 1L) == 1L)
      val bounds = 0 +: cuts :+ n
      val pieces = bounds.sliding(2).map(p =>
        cps.slice(p.head, p.last).mkString).toSeq
      val costs = pieces.map { p =>
        if (vocab.contains(p)) Some(vocab(p))
        else if (p.codePointCount(0, p.length) == 1) Some(unkCost)
        else None
      }
      if (costs.forall(_.isDefined)) {
        val tc = costs.flatten.sum
        if (best.forall(b => tc < b._1 || (tc == b._1 && mask < b._2)))
          best = Some((tc, mask, pieces))
      }
    }
    val b = best.get
    (b._3, b._1)
  }

  test("encodeWord: Viterbi beats greedy, mask breaks cost ties") {
    val singles = "tablescanxy".distinct.map(c => c.toString -> 100L)
    // non-greedy: t + able (190) beats tab-first paths (>= 270)
    val v1 = vmap(singles ++ Seq("tab" -> 80L, "ta" -> 150L,
      "ble" -> 120L, "able" -> 90L): _*)
    val (p1, c1) = UnigramTokenizer.encodeWord("table", v1, 4, 500L)
    assert(p1.toSeq == Seq("t", "able") && c1 == 190L, s"${p1.toSeq} $c1")
    // tie at 350 between sc|an (mask 2) and sc|a|n (mask 6): mask wins
    val v2 = vmap(singles ++ Seq("sc" -> 150L, "an" -> 200L): _*)
    val (p2, c2) = UnigramTokenizer.encodeWord("scan", v2, 4, 500L)
    assert(p2.toSeq == Seq("sc", "an") && c2 == 350L, s"${p2.toSeq} $c2")
    // unk fallback: 'q' absent -> itself at unkCost
    val (p3, c3) = UnigramTokenizer.encodeWord("xq", vmap("x" -> 100L), 4, 500L)
    assert(p3.toSeq == Seq("x", "q") && c3 == 600L, s"${p3.toSeq} $c3")
    assert(UnigramTokenizer.encodeWord("", vmap("x" -> 1L), 4, 5L)
      ._1.isEmpty)
  }

  test("encodeWord equals exhaustive enumeration on random vocab/words") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    for (_ <- 1 to 200) {
      val word = (1 to (1 + rnd.nextInt(8)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = (1 to 6).map { _ =>
        val s = rnd.nextInt(word.length)
        val e = math.min(word.length, s + 1 + rnd.nextInt(3))
        word.substring(s, e) -> (50L + rnd.nextInt(4) * 50L)
      }.distinct.groupBy(_._1).map { case (p, cs) => p -> cs.head._2 }
      val got = UnigramTokenizer.encodeWord(word,
        vmap(pieces.toSeq: _*), 8, 220L)
      val ref = refEncode(word, pieces, 220L)
      assert(got._1.toSeq == ref._1 && got._2 == ref._2,
        s"word=$word vocab=$pieces got=${got._1.toSeq}/${got._2} " +
          s"ref=${ref._1}/${ref._2}")
    }
  }

  test("encode: per-doc composition, cost sums, empty docs excluded") {
    import spark.implicits._
    val docs = Seq((1L, "scan table scan"), (2L, "xq"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = "tablescanx".distinct.map(c => c.toString -> 100L) ++
      Seq("sc" -> 150L, "an" -> 200L, "able" -> 90L)
    val got = UnigramTokenizer.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getSeq[String](4).toSeq)).toMap
    // scan -> sc|an (350), table -> t|able (190)
    assert(got(1L) == ((3L, 6L, 890L,
      Seq("sc", "an", "t", "able", "sc", "an"))), got.toString)
    assert(got(2L)._3 == 100L + 1000000L, got.toString) // q is unk
    assert(!got.contains(3L) && !got.contains(4L), got.toString)
    intercept[IllegalArgumentException] {
      UnigramTokenizer.encode(docs, "doc_id", "text",
        Seq("a" -> 1L, "a" -> 2L))
    }
    intercept[IllegalArgumentException] {
      UnigramTokenizer.encode(docs, "doc_id", "text", Seq("a" -> -1L))
    }
  }

  test("trainUnigram learns compositional pieces; deterministic; " +
      "encode round-trips") {
    import spark.implicits._
    // planted composition: every word is a concatenation of the true
    // pieces {ab, cde, fg}; a trained vocab of 3 multis + singles must
    // recover exactly those three
    val words = Seq("abab", "abcde", "cdefg", "fgab", "cdecde", "fgfg",
      "abcdefg")
    val docs = (1 to 300).map(i =>
      (i.toLong, Seq.fill(4)(words(i % words.length)).mkString(" ")))
      .toDF("doc_id", "text")
    val singles = "abcdefg".distinct.length
    val trained = UnigramTokenizer.trainUnigram(docs, "text",
      vocabSize = singles + 3, maxPieceLen = 3, rounds = 3)
    val rows = trained.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val multis = rows.map(_._1).filter(_.length > 1).toSet
    assert(multis == Set("ab", "cde", "fg"), rows.mkString(", "))
    assert(rows.map(_._1).toSet.size == rows.length)
    // all singles retained (character coverage)
    assert("abcdefg".forall(c => rows.map(_._1).contains(c.toString)))
    // deterministic
    val again = UnigramTokenizer.trainUnigram(docs, "text",
      vocabSize = singles + 3, maxPieceLen = 3, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
    // trained costs feed encode: pieces concatenate back to each word
    val vocab = rows.map(r => r._1 -> r._3).toSeq
    val enc = UnigramTokenizer.encode(docs.limit(7), "doc_id", "text", vocab)
    enc.select(col("id"), col("ug_tokens")).collect().foreach { r =>
      val joined = r.getSeq[String](1).mkString
      val orig = docs.filter(col("doc_id") === r.getLong(0))
        .head().getString(1).replace(" ", "")
      assert(joined == orig, s"doc ${r.getLong(0)}")
    }
  }

  test("encodeWord: a huge unkCost saturates at INF and fails loudly " +
      "instead of silently returning the whole word as one unk piece") {
    val vocab = new java.util.HashMap[String, Long]()
    vocab.put("ab", 5L)
    // word of 3 out-of-vocab codepoints at unkCost near INF: any path
    // saturates, so the result must be an error, not a bogus one-piece
    // fallback
    val huge = Long.MaxValue / 4 - 1
    val e = intercept[IllegalArgumentException] {
      UnigramTokenizer.encodeWord("xyz", vocab, 2, huge)
    }
    assert(e.getMessage.contains("saturated"), e.getMessage)
    // a bounded unkCost on the same word still segments correctly
    val (pieces, cost) = UnigramTokenizer.encodeWord("xyz", vocab, 2, 7L)
    assert(pieces.toSeq == Seq("x", "y", "z") && cost == 21L)
    // and saturation does not disturb reachable-path selection: one unk
    // plus a vocab piece
    val (p2, c2) = UnigramTokenizer.encodeWord("abx", vocab, 2, 7L)
    assert(p2.toSeq == Seq("ab", "x") && c2 == 12L)
  }
}
