package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Retrieval

/** Specs for the lexical-retrieval operators: inverted index, per-term
  * stats, and BM25 top-k — scores checked against an independent
  * in-memory reference computation, plan shape against the broadcast
  * contract.
  */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("invertedIndex: tf per (term, doc); empty/null docs yield no postings") {
    val docs = docsDf(
      (1L, "a b a  c"),
      (2L, "b b b"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
    val got = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", 1L) -> 2L, ("b", 1L) -> 1L, ("c", 1L) -> 1L,
      ("b", 2L) -> 3L), got.toString)
  }

  test("termStats: df counts docs, cf counts occurrences") {
    val docs = docsDf((1L, "a b a"), (2L, "a c"))
    val got = Retrieval.termStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (2L, 3L), "b" -> (1L, 1L), "c" -> (1L, 1L)),
      got.toString)
  }

  test("tokensToIds: order preserved, OOV mapped, empty docs get empty arrays") {
    import spark.implicits._
    val docs = docsDf(
      (1L, "b a zz a"),
      (2L, ""),
      (3L, null.asInstanceOf[String]))
    val vocab = Seq(("a", 1), ("b", 2)).toDF("token", "token_id")
    val got = Retrieval.tokensToIds(docs, "doc_id", "text", vocab, oovId = 0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Int](2).toList)))
      .toMap
    assert(got(1L) == (4L, List(2, 1, 0, 1)), got.toString) // order kept
    assert(got(2L) == (0L, Nil), got.toString)
    assert(got(3L) == (0L, Nil), got.toString)
    // repartitioning must not change the order inside any doc
    val re = Retrieval.tokensToIds(docs.repartition(7), "doc_id", "text",
      vocab).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2).toList).toMap
    assert(re(1L) == List(2, 1, 0, 1))
  }

  test("packTokenIds: conservation, pack-order concatenation, determinism") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 until (i % 5).toInt + 1).map(j => s"w${(i + j) % 7}")
        .mkString(" "))).toDF("doc_id", "text")
    val vocab = (0 until 7).map(j => (s"w$j", j + 1)).toDF("token", "token_id")
    val got = Retrieval.packTokenIds(docs, "doc_id", "text", vocab,
      maxTokens = 6, shards = 4)
    val rows = got.collect()
    // every token lands in exactly one pack: total ids == total tokens
    val totalTokens = docs.select(
      org.apache.spark.sql.functions.sum(
        graft.functions.TextFunctions.tokenCount($"text"))).collect()(0).getLong(0)
    assert(rows.map(r => r.getSeq[Int](r.fieldIndex("input_ids")).size).sum == totalTokens)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    // no pack exceeds the budget; vocab of size 7 covers all → no OOV
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= 6, r.toString)
      assert(!r.getSeq[Int](r.fieldIndex("input_ids")).contains(0), r.toString)
    }
    // driver-side composition of the two independently-specced parts
    val ids = Retrieval.tokensToIds(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    val packs = graft.operators.CorpusAnalysis
      .packSequences(docs, "doc_id", "text", maxTokens = 6, shards = 4)
      .collect()
      .groupBy(r => (r.getAs[Int]("shard"), r.getAs[Long]("pack_id")))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getAs[Long]("pack_pos"))
          .flatMap(r => ids(r.getAs[Long]("id"))).toList }
    val gotMap = rows.map(r =>
      (r.getAs[Int]("shard"), r.getAs[Long]("pack_id")) ->
        r.getSeq[Int](r.fieldIndex("input_ids")).toList).toMap
    assert(gotMap == packs)
    // stable under input repartitioning
    val re = Retrieval.packTokenIds(docs.repartition(9), "doc_id", "text",
      vocab, maxTokens = 6, shards = 4).collect().map(r =>
      (r.getAs[Int]("shard"), r.getAs[Long]("pack_id")) ->
        r.getSeq[Int](r.fieldIndex("input_ids")).toList).toMap
    assert(re == gotMap)
  }

  /** Independent BM25 reference: plain Scala over token maps, same
    * formula — NOT the operator's code path (no hashing, no DataFrame).
    * Sums term scores in token-string order; assertions use a tolerance
    * (the operator folds in hash order), score EXACTNESS is the
    * q_bm25_rational oracle's job.
    */
  private def referenceBm25(corpus: Seq[(Long, String)], query: String,
      k1: Double, b: Double, rationalIdf: Boolean): Map[Long, Double] = {
    def toks(s: String): Seq[String] =
      Option(s).map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    val n = corpus.size
    val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val avgdl = docToks.values.map(_.size).sum.toDouble / n.toDouble
    val dfm = docToks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val qts = toks(query).distinct.filter(dfm.contains)
    docToks.flatMap { case (id, ts) =>
      if (ts.isEmpty) None
      else {
        val dl = ts.size
        val score = qts.sorted.map { t =>
          val tf = ts.count(_ == t)
          if (tf == 0) 0.0
          else {
            val df = dfm(t)
            val rat = (n - df + 0.5) / (df + 0.5)
            val idf = if (rationalIdf) rat else math.log(1.0 + rat)
            idf * ((tf * (k1 + 1.0)) /
              (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
          }
        }.sum
        Some(id -> score)
      }
    }
  }

  test("bm25TopK matches an independent reference (both idf forms)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana date"),
      (3L, "cherry date egg fig"),
      (4L, "apple grape"),
      (5L, "unrelated words entirely here"))
    val docs = docsDf(corpus: _*)
    val queries = Seq((10L, "apple banana")).toDF("query_id", "qtext")
    for (rational <- Seq(true, false)) {
      val got = Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        "query_id", "qtext", k = 3, rationalIdf = rational)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3)))
      val ref = referenceBm25(corpus, "apple banana", 1.2, 0.75, rational)
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(3)
      assert(got.map(_._3).toSeq == ref.map(_._1), s"rational=$rational: " +
        s"got ${got.toSeq} ref $ref")
      got.zip(ref).foreach { case ((_, _, _, s1), (_, s2)) =>
        assert(math.abs(s1 - s2) < 1e-12, s"rational=$rational: $s1 != $s2")
      }
      assert(got.map(_._2).toSeq == Seq(1, 2, 3))
    }
  }

  test("bm25TopK: ties break on id; absent query terms score nothing") {
    import spark.implicits._
    // docs 1 and 2 are identical → identical scores; the tie must break
    // id ASC deterministically
    val docs = docsDf((2L, "x y"), (1L, "x y"), (3L, "z z z"))
    val queries = Seq((1L, "x q_unseen")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "qtext", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L), got.toSeq.toString)
    assert(got(0)._3 == got(1)._3)
    // doc 3 shares no query term: absent entirely (scores only matched)
    assert(!got.exists(_._2 == 3L))
  }

  test("bm25TopK guards: string ids, empty corpus, bad params") {
    import spark.implicits._
    val docs = docsDf((1L, "a"))
    val q = Seq((1L, "a")).toDF("query_id", "qtext")
    val sdocs = Seq(("s1", "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(sdocs, q, "doc_id", "text", "query_id", "qtext", 3)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs.filter(lit(false)), q, "doc_id", "text",
        "query_id", "qtext", 3)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, q, "doc_id", "text", "query_id", "qtext",
        k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, q, "doc_id", "text", "query_id", "qtext",
        k = 3, b = 1.5)
    }
  }

  test("bm25TopK plan: query side broadcasts, no cartesian, no global sort") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val plan = Retrieval.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "qtext", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the only Sort allowed is inside per-group sort_array (an
    // expression, not an operator) — no corpus-wide Sort node below
    // the aggregation
    assert(!plan.contains("Sort ["), plan.take(2000))
  }

  private def rankingDf(rows: (Long, Int, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "rank", "neighbor_id")
      .withColumn("sim", lit(0.0))
  }

  test("reciprocalRankFusion: scores sum 1/(c+rank) across rankers") {
    val r1 = rankingDf((1L, 1, 10L), (1L, 2, 11L))
    val r2 = rankingDf((1L, 1, 11L), (1L, 2, 12L))
    val got = Retrieval.reciprocalRankFusion(Seq(r1, r2), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // 11 appears in both (1/62 + 1/61), 10 only in r1 (1/61),
    // 12 only in r2 (1/62)
    assert(got.toSeq == Seq(
      (1, 11L, (0.0 + 1.0 / 62.0) + 1.0 / 61.0),
      (2, 10L, 0.0 + 1.0 / 61.0),
      (3, 12L, 0.0 + 1.0 / 62.0)), got.mkString(", "))
  }

  test("reciprocalRankFusion: ties break on neighbor_id; k bounds output") {
    // 20 and 21 get identical contributions (rank 1 in exactly one
    // ranker each) -> tie -> smaller id first; k=2 drops the rest
    val r1 = rankingDf((7L, 1, 21L), (7L, 2, 30L))
    val r2 = rankingDf((7L, 1, 20L), (7L, 2, 31L))
    val got = Retrieval.reciprocalRankFusion(Seq(r1, r2), k = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 20L), (2, 21L)), got.mkString(", "))
  }

  test("reciprocalRankFusion: one ranker preserves its order; guards") {
    val r1 = rankingDf((1L, 1, 5L), (1L, 2, 6L), (1L, 3, 7L), (2L, 1, 9L))
    val got = Retrieval.reciprocalRankFusion(Seq(r1), k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq ==
      Seq((1L, 1, 5L), (1L, 2, 6L), (1L, 3, 7L), (2L, 1, 9L)),
      got.mkString(", "))
    intercept[IllegalArgumentException] {
      Retrieval.reciprocalRankFusion(Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Retrieval.reciprocalRankFusion(Seq(r1), k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.reciprocalRankFusion(Seq(r1), k = 3, c = -1.0)
    }
  }

  test("reciprocalRankFusion plan: no corpus-side shuffle beyond the " +
      "result-sized aggregation, no cartesian") {
    val r1 = rankingDf((1L, 1, 10L))
    val r2 = rankingDf((1L, 1, 11L))
    val plan = Retrieval.reciprocalRankFusion(Seq(r1, r2), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
