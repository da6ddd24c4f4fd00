package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{DataSelection, QualityClassifier, Similarity}

/** Specs for the classifier-based quality filter (NB log-odds against
  * an in-memory reference), the exact rank-bucket partitioner
  * (sizes, determinism, tie handling, window equivalence), the
  * composed CCNet perplexity split, and embedding-level semantic
  * decontamination.
  */
class QualityClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Independent reference: the NB math over plain Scala token maps —
    * shares no Spark code path with the operator.
    */
  test("nbQualityScores matches an in-memory NB reference") {
    val pos = docsDf((10L, "good clean prose good"), (11L, "clean text"))
    val neg = docsDf((20L, "spam junk spam spam"), (21L, "junk links"))
    val docs = docsDf(
      (1L, "good clean text"),
      (2L, "spam junk junk"),
      (3L, "good spam"),
      (4L, ""))
    val alpha = 1.0
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val pToks = Seq("good clean prose good", "clean text").flatMap(toks)
    val nToks = Seq("spam junk spam spam", "junk links").flatMap(toks)
    val vocab = (pToks ++ nToks).distinct.size.toLong
    val denomP = pToks.size + alpha * vocab
    val denomN = nToks.size + alpha * vocab
    def r(t: String): Double =
      ((pToks.count(_ == t) + alpha) / denomP) /
        ((nToks.count(_ == t) + alpha) / denomN)
    val out = QualityClassifier
      .nbQualityScores(docs, pos, neg, "doc_id", "text", alpha)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(out.keySet === Set(1L, 2L, 3L)) // empty doc 4 excluded
    for ((id, text) <- Seq(1L -> "good clean text", 2L -> "spam junk junk",
        3L -> "good spam")) {
      val ts = toks(text)
      val row = out(id)
      assert(row.getLong(1) === ts.size)
      assert(row.getDouble(2) === ts.map(r).sum) // sum_ratio, same order
      assert(math.abs(row.getDouble(4) - ts.map(t => math.log(r(t))).sum)
        < 1e-12) // log_odds
      assert(row.getBoolean(6) === (ts.map(t => math.log(r(t))).sum > 0))
    }
    // planted verdicts: positive-vocab doc flagged positive, spam not
    assert(out(1L).getBoolean(6))
    assert(!out(2L).getBoolean(6))
  }

  test("rankBuckets matches the window formulation incl. ties") {
    import spark.implicits._
    // deliberate ties: score = id % 4, so rank order inside a tie
    // group falls to id ASC — the part worth pinning
    val n = 103
    val scored = (1L to n.toLong).map(i => (i, (i % 4).toDouble))
      .toDF("id", "score")
    val got = DataSelection
      .rankBuckets(scored, "id", "score", 5, ascending = true, histBins = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // reference: explicit sort + ceil(rank*B/n)
    val ref = (1L to n.toLong).map(i => (i, (i % 4).toDouble))
      .sortBy { case (id, s) => (s, id) }.zipWithIndex
      .map { case ((id, _), i) =>
        id -> ((((i + 1).toLong * 5 + n - 1) / n).toInt) }.toMap
    assert(got === ref)
    // exact bucket sizes: ranks partition into ceil-equal fifths
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes === Map(1 -> 20, 2 -> 21, 3 -> 20, 4 -> 21, 5 -> 21))
  }

  test("rankBuckets descending and small-n edge cases") {
    import spark.implicits._
    val scored = Seq((1L, 1.0), (2L, 3.0), (3L, 2.0)).toDF("id", "score")
    val desc = DataSelection
      .rankBuckets(scored, "id", "score", 3, ascending = false)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(desc === Map(2L -> 1, 3L -> 2, 1L -> 3))
    // n < nBuckets: early buckets empty, every row still placed
    val two = Seq((7L, 5.0), (8L, 4.0)).toDF("id", "score")
    val got = DataSelection.rankBuckets(two, "id", "score", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(8L -> 2, 7L -> 3)) // ceil(1*3/2)=2, ceil(2*3/2)=3
    // empty input: runs, returns the bucket column
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(DataSelection.rankBuckets(empty, "id", "score", 3).count() === 0)
  }

  test("perplexityBuckets: head holds the most target-like docs") {
    val target = docsDf(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox runs over the lazy dog"))
    val docs = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-domain
      (2L, "the quick brown fox"),                         // close
      (3L, "zzz qqq www eee rrr"))                         // far
    val rows = QualityClassifier
      .perplexityBuckets(docs, target, "doc_id", "text", nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    // buckets are the log_ppl ranking: one doc per bucket here, in
    // ascending perplexity order
    assert(rows.sortBy(_._2).map(_._3).toSeq === Seq(1, 2, 3))
    // the all-out-of-domain doc is the tail; the in-domain doc beats it
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert(byId(3L) === 3)
    assert(byId(1L) < byId(3L))
  }

  test("semanticContamination flags near-benchmark docs exactly") {
    import spark.implicits._
    val bench = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f, 0.0f)),  // near bench 1
      (11L, Seq(0.0f, 0.0f, 1.0f)),  // orthogonal to both
      (12L, Seq(0.0f, 2.0f, 0.1f))   // near bench 2 (scale-invariant)
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .semanticContamination(corpus, bench, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(3))))
      .toMap
    assert(out(10L) === ((1L, true)))
    assert(out(11L)._2 === false)
    assert(out(12L) === ((2L, true)))
    // every corpus doc reported exactly once
    assert(out.keySet === Set(10L, 11L, 12L))
  }
}
