package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.LanguageModel

/** Specs for the CCNet-style bigram LM scorer: scores against an
  * independent in-memory reference (plain Scala string-bigram maps —
  * no hashing, no DataFrame code path), edge cases, and the
  * quality-signal direction on a planted corpus.
  */
class LanguageModelSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("bigramLmScores matches an in-memory reference") {
    val target = docsDf(
      (10L, "the quick brown fox jumps"),
      (11L, "the quick red fox sleeps"),
      (12L, "a quick brown dog"))
    val raw = docsDf(
      (1L, "the quick brown fox"),   // all bigrams seen
      (2L, "the quick green fox"),   // one unseen continuation
      (3L, "zebra quagga"),          // unseen context
      (4L, "single"),                // < 2 tokens: excluded
      (5L, ""))                      // empty: excluded
    val alpha = 1.0
    // reference on token STRINGS (md5-60 is injective on this fixture)
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tgtBigrams = Seq("the quick brown fox jumps",
      "the quick red fox sleeps", "a quick brown dog")
      .flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
    val cBig = tgtBigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val cCtx = tgtBigrams.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = Seq("the quick brown fox jumps", "the quick red fox sleeps",
      "a quick brown dog").flatMap(toks).toSet.size // distinct target unigrams
    def p(c: String, w: String) =
      (cBig.getOrElse((c, w), 0) + alpha) /
        (cCtx.getOrElse(c, 0) + alpha * v)
    val expected = Map(
      1L -> toks("the quick brown fox").sliding(2).map(x => p(x(0), x(1))).sum,
      2L -> toks("the quick green fox").sliding(2).map(x => p(x(0), x(1))).sum,
      3L -> toks("zebra quagga").sliding(2).map(x => p(x(0), x(1))).sum)
    val got = LanguageModel.bigramLmScores(raw, target, "doc_id", "text",
      alpha).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), got.keySet.toString)
    for ((id, want) <- expected) {
      val (n, sum, avg, ppl) = got(id)
      assert(math.abs(sum - want) < 1e-12, s"doc $id: $sum vs $want")
      assert(math.abs(avg - want / n) < 1e-12)
      assert(ppl > 0.0) // −Σ ln p / n with every p < 1
    }
    // unseen context scores exactly 1/V per bigram (one bigram here)
    assert(math.abs(got(3L)._2 - 1.0 / v) < 1e-12, got(3L).toString)
    // in-domain text must out-score out-of-domain text
    assert(got(1L)._4 < got(3L)._4, s"ppl ordering: ${got(1L)} vs ${got(3L)}")
  }

  test("mooreLewisScores: in-memory reference, direction, exclusions") {
    val inDom = docsDf(
      (10L, "alpha beta gamma"), (11L, "alpha beta delta"))
    val gen = docsDf(
      (20L, "red green blue"), (21L, "red green yellow"),
      (22L, "alpha red"))
    val raw = docsDf(
      (1L, "alpha beta gamma"), // in-domain phrasing
      (2L, "red green blue"),   // general phrasing
      (3L, "single"))           // < 2 tokens: excluded
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def model(texts: Seq[String]) = {
      val bigs = texts.flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
      val cBig = bigs.groupBy(identity).map { case (k, v) => k -> v.size }
      val cCtx = bigs.groupBy(_._1).map { case (k, v) => k -> v.size }
      val v = texts.flatMap(toks).toSet.size
      (c: String, w: String) =>
        (cBig.getOrElse((c, w), 0) + 1.0) / (cCtx.getOrElse(c, 0) + 1.0 * v)
    }
    val pIn = model(Seq("alpha beta gamma", "alpha beta delta"))
    val pGen = model(Seq("red green blue", "red green yellow", "alpha red"))
    def expect(text: String) = {
      val prefs = toks(text).sliding(2).map { x =>
        val (pi, pg) = (pIn(x(0), x(1)), pGen(x(0), x(1)))
        (pi / (pi + pg), math.log(pg) - math.log(pi))
      }.toSeq
      (prefs.map(_._1).sum, prefs.map(_._2).sum, prefs.size)
    }
    val got = LanguageModel.mooreLewisScores(raw, inDom, gen,
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got.keySet === Set(1L, 2L))
    for ((id, text) <- Seq(1L -> "alpha beta gamma", 2L -> "red green blue")) {
      val (sumP, sumC, n) = expect(text)
      val (gn, gSum, gAvg, gCed, _) = got(id)
      assert(gn === n.toLong)
      assert(math.abs(gSum - sumP) < 1e-12, s"doc $id: $gSum vs $sumP")
      assert(math.abs(gAvg - sumP / n) < 1e-12)
      assert(math.abs(gCed - sumC / n) < 1e-12)
    }
    // direction: in-domain doc preferred (selected, negative ce_diff)
    assert(got(1L)._5 && got(1L)._4 < 0.0)
    assert(!got(2L)._5 && got(2L)._4 > 0.0)
  }

  test("stupidBackoffScores matches an in-memory reference") {
    val target = docsDf(
      (10L, "the quick brown fox jumps"),
      (11L, "the quick red fox sleeps"))
    val raw = docsDf(
      (1L, "the quick brown fox"), // all bigrams seen
      (2L, "the quick green fox"), // "quick green": backoff to f(green)=0
      (3L, "zebra fox"))           // unseen context, seen word
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tgt = Seq("the quick brown fox jumps", "the quick red fox sleeps")
    val bi = tgt.flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
    val cBig = bi.groupBy(identity).map { case (k, v) => k -> v.size }
    val cCtx = bi.groupBy(_._1).map { case (k, v) => k -> v.size }
    val uni = tgt.flatMap(toks).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val n = tgt.flatMap(toks).size
    val v = tgt.flatMap(toks).toSet.size
    def s(c: String, w: String) =
      if (cBig.getOrElse((c, w), 0) > 0)
        cBig((c, w)).toDouble / cCtx(c)
      else 0.4 * ((uni.getOrElse(w, 0) + 1.0) / (n.toDouble + 1.0 * v))
    val expected = Map(
      1L -> Seq(("the", "quick"), ("quick", "brown"), ("brown", "fox"))
        .map((s _).tupled).sum,
      2L -> Seq(("the", "quick"), ("quick", "green"), ("green", "fox"))
        .map((s _).tupled).sum,
      3L -> Seq(("zebra", "fox")).map((s _).tupled).sum)
    val got = LanguageModel.stupidBackoffScores(raw, target, "doc_id",
      "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, want) <- expected)
      assert(math.abs(got(id)._2 - want) < 1e-12,
        s"doc $id: ${got(id)._2} vs $want")
    // seen-bigram scores are pure count ratios: doc 1 = 1 + 1/2 + 1
    assert(math.abs(got(1L)._2 - 2.5) < 1e-12, got(1L).toString)
    // in-domain text out-scores backoff-heavy text
    assert(got(1L)._3 > got(3L)._3)
  }

  test("stupidBackoffTrigramScores matches an in-memory reference") {
    val tgt = Seq("the quick brown fox jumps", "the quick red fox sleeps")
    val target = docsDf(tgt.zipWithIndex.map {
      case (t, i) => (10L + i, t)
    }: _*)
    val raw = docsDf(
      (1L, "the quick brown fox"),  // both trigrams seen
      (2L, "the quick green fox"),  // tri unseen, "quick green" big unseen
      (3L, "quick red fox sleeps"), // all trigrams seen
      (4L, "a b"))                  // <3 tokens: excluded
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val tri = tgt.flatMap(t => toks(t).sliding(3).map(g => (g(0), g(1), g(2))))
    val cTri = tri.groupBy(identity).map { case (k, v) => k -> v.size }
    val cTriCtx = tri.groupBy(g => (g._1, g._2))
      .map { case (k, v) => k -> v.size }
    val bi = tgt.flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
    val cBig = bi.groupBy(identity).map { case (k, v) => k -> v.size }
    val cCtx = bi.groupBy(_._1).map { case (k, v) => k -> v.size }
    val uni = tgt.flatMap(toks).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val n = tgt.flatMap(toks).size
    val v = tgt.flatMap(toks).toSet.size
    def s(a: String, b: String, w: String) =
      if (cTri.getOrElse((a, b, w), 0) > 0)
        cTri((a, b, w)).toDouble / cTriCtx((a, b))
      else if (cBig.getOrElse((b, w), 0) > 0)
        0.4 * (cBig((b, w)).toDouble / cCtx(b))
      else 0.4 * (0.4 * ((uni.getOrElse(w, 0) + 1.0) / (n.toDouble + 1.0 * v)))
    val expected = Map(
      1L -> toks("the quick brown fox").sliding(3)
        .map(g => s(g(0), g(1), g(2))).sum,
      2L -> toks("the quick green fox").sliding(3)
        .map(g => s(g(0), g(1), g(2))).sum,
      3L -> toks("quick red fox sleeps").sliding(3)
        .map(g => s(g(0), g(1), g(2))).sum)
    val got = LanguageModel.stupidBackoffTrigramScores(raw, target,
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet) // doc 4 excluded
    for ((id, want) <- expected)
      assert(math.abs(got(id)._2 - want) < 1e-12,
        s"doc $id: ${got(id)._2} vs $want")
    // the trigram chain discriminates harder than the bigram one:
    // fully-seen docs score pure count ratios
    assert(got(1L)._1 == 2L && got(3L)._1 == 2L)
    assert(got(1L)._3 > got(2L)._3)
    // bit-exact under repartitioning (ordered fold)
    val re = LanguageModel.stupidBackoffTrigramScores(raw.repartition(7),
      target.repartition(5), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == got.map { case (k, x) => k -> x._2 })
  }

  test("kneserNeyScores matches an in-memory reference") {
    val tgt = Seq("san francisco is foggy", "san jose is sunny",
      "the bay is foggy")
    val target = docsDf(tgt.zipWithIndex.map {
      case (t, i) => (10L + i, t)
    }: _*)
    val raw = docsDf(
      (1L, "san francisco is sunny"), // seen bigrams + cross combo
      (2L, "jose francisco"),         // ctx seen, bigram unseen
      (3L, "zebra francisco"),        // ctx unseen -> pure continuation
      (4L, "one"))                    // <2 tokens: excluded
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val bi = tgt.flatMap(t => toks(t).sliding(2).map(p => (p(0), p(1))))
    val cBig = bi.groupBy(identity).map { case (k, v) => k -> v.size }
    val cCtx = bi.groupBy(_._1).map { case (k, v) => k -> v.map(_ => 1).sum }
    val n1f = cBig.keys.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1b = cBig.keys.groupBy(_._2).map { case (k, v) => k -> v.size }
    val b = cBig.size
    val v = tgt.flatMap(toks).toSet.size
    val d = 0.75
    def pcont(w: String) =
      (n1b.getOrElse(w, 0) + 1.0) / (b.toDouble + 1.0 * v)
    def p(c: String, w: String) =
      if (cCtx.contains(c))
        math.max(cBig.getOrElse((c, w), 0) - d, 0.0) / cCtx(c) +
          (d * n1f(c) / cCtx(c)) * pcont(w)
      else pcont(w)
    val expected = Map(
      1L -> toks("san francisco is sunny").sliding(2)
        .map(g => p(g(0), g(1))).sum,
      2L -> p("jose", "francisco"),
      3L -> p("zebra", "francisco"))
    val got = LanguageModel.kneserNeyScores(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((id, want) <- expected)
      assert(math.abs(got(id)._2 - want) < 1e-12,
        s"doc $id: ${got(id)._2} vs $want")
    // the KN effect this fixture encodes: "francisco" completes only
    // ONE context (san), "is" completes three — continuation counts,
    // not unigram frequency, drive the backoff mass
    assert(n1b("francisco") == 1 && n1b("is") == 3)
    assert(got.values.forall(_._2 > 0.0))
    // bit-exact under repartitioning (ordered fold)
    val re = LanguageModel.kneserNeyScores(raw.repartition(7),
      target.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == got.map { case (k, x) => k -> x._2 })
  }

  test("bigramLmScores: empty target stays finite, deterministic across partitionings") {
    val raw = docsDf((1L, "a b c"), (2L, "x y"))
    val empty = docsDf()
    val got = LanguageModel.bigramLmScores(raw, empty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // V clamps to 1, every p = α/(α·1) = 1 → avg_prob 1, log_ppl 0
    assert(got == Map(1L -> 1.0, 2L -> 1.0), got.toString)

    val target = docsDf((10L, "a b c a b"), (11L, "c a b"))
    val base = LanguageModel.bigramLmScores(raw, target, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val re = LanguageModel.bigramLmScores(raw.repartition(7),
      target.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(base == re) // bit-exact under repartitioning (ordered fold)
  }

  test("ccnetBuckets: equal-rank head/middle/tail tiers, best fit first") {
    // target trains on "a b"-family bigrams; doc quality descends with
    // each unseen token — 6 scoreable docs split 3 ways, 2 per tier
    val target = docsDf((100L, "a b a b a b c"), (101L, "a b c a b"))
    val docs = docsDf(
      (1L, "a b a b"),     // all bigrams frequent -> head
      (2L, "a b c"),       // seen, slightly rarer
      (3L, "a b x"),       // one unseen continuation
      (4L, "x y a b"),     // unseen context + unseen pair
      (5L, "x y z"),       // nothing seen
      (6L, "q r s t"),     // nothing seen, longer
      (7L, "solo"))        // no bigrams: excluded
    val got = LanguageModel.ccnetBuckets(docs, target, "doc_id", "text",
        byExactProb = true, histBins = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("bucket"), r.getAs[String]("tier"))).toMap
    assert(got.size == 6, got.toString) // doc 7 has no score
    assert(got.values.count(_._1 == 1) == 2, got.toString)
    assert(got.values.count(_._1 == 2) == 2, got.toString)
    assert(got.values.count(_._1 == 3) == 2, got.toString)
    assert(got(1L) == (1, "head"), got.toString)
    assert(got(5L)._2 == "tail" || got(6L)._2 == "tail", got.toString)
    // tier labels track buckets exactly
    assert(got.values.forall { case (b, t) =>
      t == Seq("head", "middle", "tail")(b - 1) }, got.toString)
  }

  test("ccnetBuckets: log_ppl key orders like the exact-prob key here; " +
      "nBuckets=1 and guards") {
    val target = docsDf((100L, "a b a b"), (101L, "b c"))
    val docs = docsDf((1L, "a b"), (2L, "b c"), (3L, "x y"))
    val exact = LanguageModel.ccnetBuckets(docs, target, "doc_id", "text",
        byExactProb = true)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    val ppl = LanguageModel.ccnetBuckets(docs, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("bucket")).toMap
    // single-bigram docs: avg_prob and log_ppl are both monotone in p
    assert(exact == ppl, s"$exact vs $ppl")
    val one = LanguageModel.ccnetBuckets(docs, target, "doc_id", "text",
      nBuckets = 1).collect()
    assert(one.forall(_.getAs[String]("tier") == "b1"), one.mkString(","))
    intercept[IllegalArgumentException] {
      LanguageModel.ccnetBuckets(docs, target, "doc_id", "text",
        nBuckets = 0)
    }
  }

  test("ccnetBucketsApprox: sketch tiers equal the exact grouped cut " +
      "when bins separate the keys; deterministic; labels; guards") {
    import org.apache.spark.sql.functions.col
    val target = docsDf((100L, "a b a b a b c"), (101L, "a b c a b"))
    val docs = docsDf(
      (1L, "a b a b"), (2L, "a b c"), (3L, "a b x"),
      (4L, "x y a b"), (5L, "x y z"), (6L, "q r s t"),
      (7L, "solo")) // no bigrams: excluded
      .withColumn("grp", (col("doc_id") % 2).cast("string"))
    val exact = LanguageModel.ccnetBuckets(docs, target, "doc_id",
        "text", byExactProb = true, histBins = 8,
        groupCol = Some("grp"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("bucket"), r.getAs[String]("tier"))).toMap
    // fine bins: every distinct −avg_prob key lands in its own bin,
    // so each cut bin holds exactly the boundary doc and the sketch
    // reproduces the exact grouped tiers doc-for-doc
    val approx = LanguageModel.ccnetBucketsApprox(docs, target,
        "doc_id", "text", "grp", keyLo = -1.0, keyHi = 0.0,
        byExactProb = true, nBins = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("bucket"), r.getAs[String]("tier"))).toMap
    assert(approx == exact, s"$approx vs $exact")
    assert(approx.size == 6) // doc 7 has no score
    // deterministic across partitionings (the sketch cut is a pure
    // function of (group, bin))
    val re = LanguageModel.ccnetBucketsApprox(docs.repartition(7),
        target, "doc_id", "text", "grp", keyLo = -1.0, keyHi = 0.0,
        byExactProb = true, nBins = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("bucket"), r.getAs[String]("tier"))).toMap
    assert(re == approx)
    // non-3 bucket counts label b<k>
    val two = LanguageModel.ccnetBucketsApprox(docs, target, "doc_id",
      "text", "grp", keyLo = -1.0, keyHi = 0.0, nBuckets = 2,
      byExactProb = true, nBins = 4096).collect()
    assert(two.forall(r => Set("b1", "b2")(r.getAs[String]("tier"))))
    intercept[IllegalArgumentException] {
      LanguageModel.ccnetBucketsApprox(docs, target, "doc_id", "text",
        "grp", keyLo = 0.0, keyHi = 0.0)
    }
  }
}
