package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit specs for BpeTokenizer's package-private kernels: the
  * multi-rank encode (duplicate merge rules — the same (l, r) pair at
  * two ranks — must replay like the sequential fold the oracle runs)
  * and the code-point comparator (total order even on lone
  * surrogates).
  */
class BpeInternalsSpec extends AnyFunSuite {

  private def rankMap(merges: Seq[(String, String)])
      : java.util.HashMap[(String, String), Array[Int]] = {
    val h = new java.util.HashMap[(String, String), Array[Int]]()
    merges.zipWithIndex.foreach { case (p, i) =>
      val old = h.get(p)
      h.put(p, if (old eq null) Array(i + 1) else old :+ (i + 1))
    }
    h
  }

  /** The sequential fold: one greedy pass per rank, in rank order —
    * exactly what the chained-CTE oracle replays.
    */
  private def seqEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var s = BpeTokenizer.initialSyms(word)
    merges.foreach { case (l, r) =>
      s = BpeTokenizer.greedyMerge(s, l, r)
    }
    s.toSeq
  }

  test("encodeWord equals the sequential fold on duplicate-rule lists") {
    // duplicate pair whose FIRST rank is a no-op (pair re-forms later):
    // a first-rank-only map would skip the re-formed pair entirely
    val m1 = Seq(("a", "bc"), ("b", "c"), ("a", "bc"))
    assert(BpeTokenizer.encodeWord("abc", rankMap(m1)).toSeq ===
      seqEncode("abc", m1))
    assert(seqEncode("abc", m1) === Seq("abc", "</w>"))
    // duplicate pair whose LAST rank is the no-op: a last-rank-only
    // map would defer the merge past the rule that consumes its output
    val m2 = Seq(("a", "b"), ("ab", "c"), ("a", "b"))
    assert(BpeTokenizer.encodeWord("abc", rankMap(m2)).toSeq ===
      seqEncode("abc", m2))
    assert(seqEncode("abc", m2) === Seq("abc", "</w>"))
  }

  test("encodeWord equals the sequential fold on random words/rules") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcd"
    for (_ <- 1 to 200) {
      val word = Seq.fill(2 + rng.nextInt(8))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      // random rule list over short symbols, duplicates allowed
      val merges = Seq.fill(1 + rng.nextInt(6)) {
        val l = Seq.fill(1 + rng.nextInt(2))(
          alphabet(rng.nextInt(alphabet.length))).mkString
        val r = Seq.fill(1 + rng.nextInt(2))(
          alphabet(rng.nextInt(alphabet.length))).mkString
        (l, r)
      }
      assert(BpeTokenizer.encodeWord(word, rankMap(merges)).toSeq ===
        seqEncode(word, merges),
        s"word=$word merges=$merges")
    }
  }

  test("initialSyms splits per code point (astral-safe)") {
    assert(BpeTokenizer.initialSyms("ab").toSeq === Seq("a", "b", "</w>"))
    val astral = "𝕒x𝕓" // U+1D552, x, U+1D553 — 3 code points, 5 chars
    assert(BpeTokenizer.initialSyms(astral).toSeq ===
      Seq("𝕒", "x", "𝕓", "</w>"))
  }

  test("utf8Lt is a strict total order, incl. lone surrogates") {
    val lo = "\ud835" // unpaired high surrogate
    val lo2 = "\udd52" // unpaired low surrogate
    val vals = Seq("", "a", "z", "é", "𝕒", "𝕓", lo, lo2, "a" + lo, "a?")
    for (a <- vals; b <- vals) {
      if (a == b)
        assert(!BpeTokenizer.utf8Lt(a, b), s"irreflexive: '$a'")
      else
        assert(BpeTokenizer.utf8Lt(a, b) ^ BpeTokenizer.utf8Lt(b, a),
          s"trichotomy failed on '$a' vs '$b'")
    }
    // agrees with UTF-8 byte order on well-formed strings
    import java.nio.charset.StandardCharsets.UTF_8
    def byteLt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes(UTF_8), b.getBytes(UTF_8))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        if ((x(i) & 0xff) != (y(i) & 0xff)) return (x(i) & 0xff) < (y(i) & 0xff)
        i += 1
      }
      x.length < y.length
    }
    val wellFormed = Seq("", "a", "z", "é", "𝕒", "𝕓", "aé", "a𝕓", "￿")
    for (a <- wellFormed; b <- wellFormed)
      assert(BpeTokenizer.utf8Lt(a, b) === byteLt(a, b), s"'$a' vs '$b'")
  }
}
