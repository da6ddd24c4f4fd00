package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.DataSelection

/** Specs for DSIR importance resampling: weights against an
  * independent in-memory reference, selection behavior on a planted
  * two-style corpus, and the histogram top-N selector's exactness.
  */
class DataSelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Independent reference: plain Scala maps, same formula, NO hashing
    * (token-level buckets via the same md5-60 mod derivation computed
    * through Spark once, so the reference shares only the bucket ids,
    * not the aggregation code path).
    */
  test("importanceLogWeights matches an in-memory reference") {
    val raw = docsDf(
      (1L, "alpha beta alpha"),
      (2L, "gamma delta"),
      (3L, "alpha gamma"))
    val target = docsDf((10L, "alpha beta"), (11L, "alpha alpha"))
    val buckets = 50
    val alpha = 1.0
    def feats(df: DataFrame): Map[Long, Map[Int, Long]] =
      DataSelection.hashedNgramFeatures(df, "doc_id", "text", buckets)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    val fRaw = feats(raw)
    val fTgt = feats(target)
    val qTot = fRaw.values.flatMap(_.values).sum.toDouble
    val pTot = fTgt.values.flatMap(_.values).sum.toDouble
    def pCnt(b: Int) = fTgt.values.map(_.getOrElse(b, 0L)).sum.toDouble
    def qCnt(b: Int) = fRaw.values.map(_.getOrElse(b, 0L)).sum.toDouble
    val expected = fRaw.map { case (id, f) =>
      id -> f.toSeq.sortBy(_._1).map { case (b, c) =>
        c * (math.log((pCnt(b) + alpha) / (pTot + alpha * buckets)) -
          math.log((qCnt(b) + alpha) / (qTot + alpha * buckets)))
      }.sum
    }
    val got = DataSelection.importanceLogWeights(raw, target, "doc_id",
      "text", buckets, alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((id, w) <- expected)
      assert(math.abs(got(id) - w) < 1e-12, s"doc $id: ${got(id)} vs $w")
    // docs resembling the target (alpha-heavy) must outweigh the rest
    assert(got(1L) > got(2L), got.toString)
  }

  test("dsirResample prefers target-style docs; deterministic across runs") {
    import spark.implicits._
    // two disjoint styles: docs 0-199 are "code", 200-399 are "prose";
    // the target is a small prose sample — selection should be
    // dominated by prose docs
    val style = (id: Column) =>
      when(id < 200, concat_ws(" ",
        lit("def"), lit("return"), lit("class"), md5(id.cast("string")),
        lit("import"), lit("lambda")))
      .otherwise(concat_ws(" ",
        lit("the"), lit("quick"), lit("brown"), md5(id.cast("string")),
        lit("jumps"), lit("over")))
    val raw = spark.range(400).select(col("id").as("doc_id"),
      style(col("id")).as("text"))
    val target = spark.range(500, 550).select(col("id").as("doc_id"),
      concat_ws(" ", lit("the"), lit("quick"), lit("brown"),
        md5(col("id").cast("string")), lit("jumps"), lit("over")).as("text"))
    val sel = DataSelection.dsirResample(raw, target, "doc_id", "text",
      keepN = 100, buckets = 500)
    val ids = sel.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 100, s"selected ${ids.size}")
    val prose = ids.count(_ >= 200)
    assert(prose >= 90, s"only $prose/100 selected docs are target-style")
    // pure function of (corpora, salt): same selection on a rerun and
    // under repartitioning
    val again = DataSelection.dsirResample(raw.repartition(13), target,
      "doc_id", "text", keepN = 100, buckets = 500)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("sampleTokenBudget: exact vs global cumulative sum; edges") {
    import spark.implicits._
    // varied token counts incl. zero-token docs sprinkled through
    val docs = spark.range(500).select(col("id").as("doc_id"),
      when(col("id") % 7 === 0, lit(""))
        .otherwise(concat_ws(" ", (0 until 12).map(j =>
          when(col("id") % (j + 2) === 0, md5(concat_ws(":",
            col("id").cast("string"), lit(j)))).otherwise(lit(null))): _*))
        .as("text"))
    // independent reference: sort by (h, id), inclusive cumsum <= budget
    val base = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n"),
      graft.functions.TextFunctions.md5Hash60(
        concat(lit("budget:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, h) => (h, id) }
    for (budget <- Seq(0L, 1L, 500L, 2000L, 1000000L)) {
      // the rule: inclusive running total (over ALL docs in (h, id)
      // order, kept or not) stays <= budget — cum is monotone, so this
      // is a clean prefix
      var cum = 0L
      val want = base.flatMap { case (id, n, _) =>
        cum += n
        if (cum <= budget) Some(id) else None
      }.toSet
      val got = graft.operators.DataSelection.sampleTokenBudget(
        docs, "doc_id", "text", budget, log2Bins = 6)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"budget=$budget: ${got.size} vs ${want.size}")
    }
    // stability under repartitioning
    val a = graft.operators.DataSelection.sampleTokenBudget(
      docs, "doc_id", "text", 900, log2Bins = 6)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.operators.DataSelection.sampleTokenBudget(
      docs.repartition(11), "doc_id", "text", 900, log2Bins = 6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("selectTopNByScore: exact vs sort-limit, including boundary-bin ties") {
    import spark.implicits._
    // scores with heavy ties so the boundary bin must split on id
    val scored = spark.range(1000).select(col("id"),
      (col("id") % 10).cast("double").as("score"))
    val got = DataSelection.selectTopNByScore(scored, 250, histBins = 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = scored.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(250).toSet
    assert(got == want)
    // n >= corpus: everything returned
    assert(DataSelection.selectTopNByScore(scored, 5000, 7).count() == 1000)
    // all-identical scores: pure id tie-break, still exact
    val flat = spark.range(100).select(col("id"), lit(1.0).as("score"))
    val gotFlat = DataSelection.selectTopNByScore(flat, 10, 100)
      .collect().map(_.getLong(0)).toSet
    assert(gotFlat == (0L until 10L).toSet, gotFlat.toString)
  }

  test("exactQuantiles equals the sorted reference; refinement rounds; " +
      "ties; guards") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy ties + outliers + negatives; small collectCap forces the
    // histogram-refinement loop to actually run (not one collect)
    val data = (1 to 5000).map(_ => (rnd.nextInt(40) - 20).toDouble) ++
      Seq(1e9, -1e9) ++ (1 to 1000).map(_ => 7.0)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = DataSelection.exactQuantiles(df, "v", qs,
        histBins = 16, collectCap = 50, maxRounds = 64)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = data.sorted
    qs.foreach { q =>
      val r = math.max(1L, math.ceil(q * data.size).toLong).toInt
      assert(got(q) == sorted(r - 1), s"q=$q got=${got(q)} ref=${sorted(r - 1)}")
    }
    // null/NaN excluded; all-equal column; guards
    val withNulls = Seq(Some(3.0), None, Some(Double.NaN), Some(1.0),
      Some(2.0)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val g2 = DataSelection.exactQuantiles(withNulls, "v", Seq(0.5))
      .collect()(0).getDouble(1)
    assert(g2 == 2.0, g2.toString) // median of {1,2,3}
    val same = (1 to 100).map(i => (i.toLong, 5.5)).toDF("id", "v")
    assert(DataSelection.exactQuantiles(same, "v", Seq(0.0, 0.5, 1.0),
        histBins = 4, collectCap = 10)
      .collect().forall(_.getDouble(1) == 5.5))
    intercept[IllegalArgumentException] {
      DataSelection.exactQuantiles(df, "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      DataSelection.exactQuantiles(
        Seq((1L, Double.PositiveInfinity)).toDF("id", "v"), "v", Seq(0.5))
    }
  }

  test("curriculumOrder: stage cut by score rank, contiguous positions " +
      "per (stage, shard), deterministic") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, (i * 37 % 401).toDouble))
      .toDF("id", "score")
    val got = DataSelection.curriculumOrder(docs, "id", "score",
      nStages = 4, shards = 4, histBins = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.length == 400)
    // stages are exact quarters by score rank (scores all distinct)
    val scoreOf = docs.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ranked = scoreOf.toSeq.sortBy { case (id, s) => (s, id) }
      .map(_._1).zipWithIndex.toMap
    got.foreach { case (id, stage, _, _) =>
      val expect = 1 + ranked(id) * 4 / 400
      assert(stage == expect, s"id=$id stage=$stage expect=$expect")
    }
    // positions are 1..k contiguous within each (stage, shard), ordered
    // by the shuffle hash
    got.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = DataSelection.curriculumOrder(docs.repartition(7), "id",
      "score", nStages = 4, shards = 4, histBins = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toSet == again.toSet)
    // auto-sizing (shards = 0): picks ceil(n/(stages*target)) clamped
    // to >= 16, and the output is IDENTICAL to explicitly passing the
    // same shard count
    assert(DataSelection.autoShards(400L, 4, 25L) == 16)   // clamp floor
    assert(DataSelection.autoShards(4000L, 4, 25L) == 40)
    assert(DataSelection.autoShards(1L << 40, 4, 1L) == 65536) // ceiling
    val auto = DataSelection.curriculumOrder(docs, "id", "score",
      nStages = 4, shards = 0, histBins = 16,
      targetShardRows = 25L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val explicit = DataSelection.curriculumOrder(docs, "id", "score",
      nStages = 4, shards = 16, histBins = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(auto.toSet == explicit.toSet)
    // explicit shards too small for the corpus fail loudly
    val eGate = intercept[IllegalArgumentException] {
      DataSelection.curriculumOrder(docs, "id", "score", 4, shards = 2,
        histBins = 16, targetShardRows = 10L, maxShardRows = 10L)
    }
    assert(eGate.getMessage.contains("auto-size"), eGate.getMessage)
    intercept[IllegalArgumentException] {
      DataSelection.curriculumOrder(docs, "id", "score", 4, shards = -1)
    }
  }

  test("groupedExactQuantiles equals per-group sorted references") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // three groups with very different shapes + sizes; small knobs
    // force the shared refinement loop and the leaf window
    val data =
      (1 to 3000).map(_ => ("web", rnd.nextInt(50).toDouble)) ++
      (1 to 500).map(_ => ("books", rnd.nextGaussian() * 100.0)) ++
      (1 to 40).map(i => ("code", i.toDouble)) ++
      Seq(("web", 1e7), ("books", -1e7))
    val df = data.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "src", "v")
    val qs = Seq(0.01, 0.5, 0.99)
    val got = DataSelection.groupedExactQuantiles(df, "src", "v", qs,
        histBins = 8, collectCap = 20, maxGroups = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; q <- qs) {
      val r = math.max(1L, math.ceil(q * vs.size).toLong).toInt
      assert(got((g, q)) == vs(r - 1),
        s"g=$g q=$q got=${got((g, q))} ref=${vs(r - 1)}")
    }
    assert(got.size == byG.size * qs.size)
    // null group and null values excluded; group cardinality gate
    val withNull = df.unionByName(Seq((9999L,
      null.asInstanceOf[String], 1.0)).toDF("id", "src", "v"))
    assert(DataSelection.groupedExactQuantiles(withNull, "src", "v",
      Seq(0.5)).collect().map(_.getString(0)).toSet ==
      Set("web", "books", "code"))
    intercept[IllegalArgumentException] {
      DataSelection.groupedExactQuantiles(df, "src", "v", Seq(0.5),
        maxGroups = 2)
    }
  }

  test("grouped quantile repair/resolve batches: hundreds of groups in " +
      "simultaneous repair still run a constant number of jobs, with " +
      "exact results") {
    import spark.implicits._
    // 150 groups x 40 values at binary-awkward positions (multiples of
    // 0.1 land off bin edges); collectCap=8 keeps every group active
    // through several refinement rounds, and the perturbForTest hook
    // shifts EVERY proposed interval one bin off target each round, so
    // every active key enters the repair path every round — the
    // pre-fix per-key exactCounts loop would run >= 150 driver-loop
    // jobs per round here
    val rows = for {
      g <- 0 until 150
      i <- 0 until 40
    } yield (g.toLong * 1000 + i, s"g$g", (i % 37) * 0.1 + g * 0.01)
    val df = rows.toDF("id", "grp", "v")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val r = DataSelection.groupedExactQuantilesImpl(df, "grp", "v",
          Seq(0.1, 0.5, 0.9), histBins = 4, collectCap = 8,
          maxGroups = 1000, maxRounds = 64, perturbForTest = true)
          .collect()
        Thread.sleep(500) // let queued listener events drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    // job count is O(rounds), never O(groups): with histBins=4 and 40
    // values/group the refinement takes a handful of rounds at <= 4
    // jobs each (histogram, recount, batched repair, batched resolve)
    // plus envelope/leaf — 150 simultaneous repairs must not add jobs
    assert(jobs.get() < 60,
      s"repair/resolve serialized per-key jobs: ${jobs.get()} jobs")
    // and the answers are still exact despite every round being
    // perturbed: compare against per-group sorted references
    val byG = rows.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(_._3).sorted }
    val gotMap = got.map(r => (r.getString(0), r.getDouble(1)) ->
      r.getDouble(2)).toMap
    for ((g, vs) <- byG; q <- Seq(0.1, 0.5, 0.9)) {
      val want = vs(math.max(1, math.ceil(q * vs.size).toInt) - 1)
      assert(gotMap((g, q)) == want,
        s"g=$g q=$q got=${gotMap((g, q))} want=$want")
    }
  }

  test("approxGroupedQuantiles: one-bucket-width error vs the exact " +
      "engine on skewed fixtures; deterministic across partitionings; " +
      "gates") {
    import spark.implicits._
    // heavily skewed per-group distributions inside a [0, 1000]
    // envelope: zipf-ish mass at the bottom, a long thin tail, plus a
    // point-mass group (all ties) and a two-value group
    val rows =
      (1 to 2000).map(i => (i.toLong, "zipf", 1000.0 / i)) ++
      (1 to 500).map(i => (3000L + i, "ties", 250.0)) ++
      Seq((4001L, "two", 10.0), (4002L, "two", 990.0))
    val df = rows.toDF("id", "grp", "v")
    val qs = Seq(0.01, 0.5, 0.9, 0.99)
    val nBins = 64
    val w = 1000.0 / nBins
    val approx = DataSelection.approxGroupedQuantiles(df, "grp", "v",
      qs, lo = 0.0, hi = 1000.0, nBins = nBins)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    val exact = DataSelection.groupedExactQuantiles(df, "grp", "v", qs,
      histBins = 32, collectCap = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, a) <- approx) {
      val e = exact(k)
      assert(a <= e && e - a <= w,
        s"$k: approx=$a exact=$e exceeds one bucket width $w")
    }
    // partitioning-independent (unlike approx_percentile's sketch)
    val re = DataSelection.approxGroupedQuantiles(df.repartition(13),
      "grp", "v", qs, lo = 0.0, hi = 1000.0, nBins = nBins)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getDouble(2)).toMap
    assert(re == approx)
    // null group/value exclusion
    val withNull = df.unionByName(Seq(
      (9998L, null.asInstanceOf[String], 1.0),
      (9999L, "zipf", Double.NaN)).toDF("id", "grp", "v"))
    val nn = DataSelection.approxGroupedQuantiles(withNull, "grp", "v",
      Seq(0.5), 0.0, 1000.0, nBins)
    assert(nn.collect().map(_.getString(0)).toSet ==
      Set("zipf", "ties", "two"))
    // gates
    intercept[IllegalArgumentException] {
      DataSelection.approxGroupedQuantiles(df, "grp", "v", qs, 5.0, 5.0)
    }
    intercept[IllegalArgumentException] {
      DataSelection.approxGroupedQuantiles(df, "grp", "v", Seq(1.5),
        0.0, 1.0)
    }
  }

  test("approxGroupedRankBuckets: exact outside the cut bins, " +
      "misassignment confined to one bin width of a true boundary; " +
      "descending; deterministic across partitionings; gates") {
    import spark.implicits._
    // skewed per-group score shapes inside a [0, 1000] envelope: a
    // zipf group, a point-mass group (every score tied — the exact
    // engine splits it by id, the sketch must keep ALL of it in one
    // bucket side per bin), and a tiny two-row group
    val rows =
      (1 to 2000).map(i => (i.toLong, "zipf", 1000.0 / i)) ++
      (1 to 500).map(i => (3000L + i, "ties", 250.0)) ++
      Seq((4001L, "two", 10.0), (4002L, "two", 990.0))
    val df = rows.toDF("id", "grp", "v")
    val nBins = 64
    val w = 1000.0 / nBins
    val B = 4
    val approx = DataSelection.approxGroupedRankBuckets(df, "grp", "v",
      B, lo = 0.0, hi = 1000.0, nBins = nBins)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getInt(3))).toMap
    // exact reference: window-rank rule ceil(rank_g*B/n_g) on (v, id)
    val byG = rows.groupBy(_._2)
    val exact = byG.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(t => (t._3, t._1))
      val n = sorted.size.toLong
      sorted.zipWithIndex.map { case ((id, _, _), i) =>
        id -> (((i + 1) * B + n - 1) / n).toInt }
    }.toMap
    // per group: the set of cut BINS (bins holding ranks b*n/B)
    def binOf(v: Double) =
      math.min(nBins - 1, math.max(0, math.floor(v / w).toInt))
    val cutBins = byG.map { case (g, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.size.toLong
      g -> (1 until B).flatMap { b =>
        val r = b * n / B
        if (r >= 1) Some(binOf(sorted((r - 1).toInt))) else None
      }.toSet
    }
    var misassigned = 0
    for ((id, (g, v, got)) <- approx) {
      if (!cutBins(g).contains(binOf(v)))
        assert(got == exact(id),
          s"row $id ($g, $v) outside every cut bin: got $got, " +
            s"exact ${exact(id)}")
      else misassigned += (if (got != exact(id)) 1 else 0)
    }
    // ties group: all 500 rows share one bin, so the sketch must give
    // them ONE bucket (the exact engine splits them by id)
    assert((1 to 500).map(i => approx(3000L + i)._3).distinct.size == 1)
    // partitioning-independent
    val re = DataSelection.approxGroupedRankBuckets(df.repartition(13),
      "grp", "v", B, lo = 0.0, hi = 1000.0, nBins = nBins)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getInt(3))).toMap
    assert(re == approx)
    // descending: best-first on high scores — equals the exact rule
    // on (-v, id) order outside the cut bins; spot-check the two-row
    // group fully (990 ranks first)
    val desc = DataSelection.approxGroupedRankBuckets(df, "grp", "v",
      2, lo = 0.0, hi = 1000.0, ascending = false, nBins = nBins)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(desc(4002L) == 1 && desc(4001L) == 2)
    // null group / NaN score exclusion
    val withNull = df.unionByName(Seq(
      (9998L, null.asInstanceOf[String], 1.0),
      (9999L, "zipf", Double.NaN)).toDF("id", "grp", "v"))
    val nn = DataSelection.approxGroupedRankBuckets(withNull, "grp",
      "v", B, 0.0, 1000.0, nBins = nBins)
    assert(!nn.collect().map(_.getLong(0)).toSet
      .exists(Set(9998L, 9999L)))
    // nBuckets = 1: everything is bucket 1
    assert(DataSelection.approxGroupedRankBuckets(df, "grp", "v", 1,
      0.0, 1000.0).select("bucket").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    // gates
    intercept[IllegalArgumentException] {
      DataSelection.approxGroupedRankBuckets(df, "grp", "v", 4, 5.0, 5.0)
    }
    intercept[IllegalArgumentException] {
      DataSelection.approxGroupedRankBuckets(df, "grp", "v", 0, 0.0, 1.0)
    }
  }

  test("RankSelect: exact (s, id) rank selection under massive ties, " +
      "subnormal score gaps, and extreme id magnitudes") {
    import spark.implicits._
    import graft.operators.RankSelect
    // query 0: 50k rows ALL the same score — the distribution that
    // made a bounded top-j quadratic (rank = id-order inside one tie
    // class); ids deliberately include huge magnitudes and negatives
    val tied = (0L until 50000L).map(i =>
      (0L, 0.0, (i - 25000L) * 368934881474191L))
    // query 1: distinct scores, rank in the middle
    val distinct = (0L until 20000L).map(i => (1L, i * 0.001, i))
    // query 2: two scores a few ULPs apart (subnormal interval) with
    // ties inside each
    val base = 1.0
    val up = java.lang.Math.nextUp(base)
    val sub = (0L until 8000L).map(i =>
      (2L, if (i % 2 == 0) base else up, i))
    val rows = (tied ++ distinct ++ sub).toDF("qid", "s", "id")
    val ranks = Map(0L -> 12345L, 1L -> 9999L, 2L -> 4001L)
    val got = RankSelect.selectRankPairs(rows, ranks,
      histBins = 64, collectCap = 500)
    // references: plain in-memory sorts
    def ref(data: Seq[(Long, Double, Long)], r: Long) =
      data.map(t => (t._2, t._3)).sorted.apply((r - 1).toInt)
    assert(got(0L) == ref(tied, 12345L))
    assert(got(1L) == ref(distinct, 9999L))
    assert(got(2L) == ref(sub, 4001L))
    // edge ranks: first and last
    val edges = RankSelect.selectRankPairs(rows,
      Map(0L -> 1L, 1L -> 20000L), histBins = 64, collectCap = 500)
    assert(edges(0L) == ref(tied, 1L))
    assert(edges(1L) == ref(distinct, 20000L))
    // bad rank fails loudly
    intercept[IllegalArgumentException] {
      RankSelect.selectRankPairs(rows, Map(0L -> 50001L))
    }
  }

  test("RankSelect batched rare paths: hundreds of simultaneous " +
      "repairs, tie-class transitions and subnormal resolves run a " +
      "constant number of jobs, with exact results") {
    import spark.implicits._
    import graft.operators.RankSelect
    // group A: 100 tie-heavy queries (90% of rows share score 0.0)
    // whose target rank falls INSIDE the tie class, so every one of
    // them enters the ID phase in the same round — the pre-fix
    // idPhaseInit ran one driver-loop job per query right there.
    // perturbForTest additionally shifts every proposed interval one
    // bin off target each round, forcing the repair path for every
    // active query every round.
    val rowsA = for {
      q <- 0 until 100
      i <- 0 until 1000
    } yield (q.toLong,
      if (i < 900) 0.0 else 1.0 + (i - 900) * 0.001,
      i.toLong * 7 + q)
    // group B: 30 queries whose scores are subnormal doubles so close
    // to zero that the equal-width bin width underflows — the
    // no-shrink path — sending all 30 through the per-value resolve
    // in the same round (pre-fix: one groupBy job per query)
    val mv = java.lang.Double.MIN_VALUE
    val rowsB = for {
      q <- 100 until 130
      i <- 0 until 300
    } yield (q.toLong, mv * (i % 3), i.toLong)
    val df = (rowsA ++ rowsB).toDF("qid", "s", "id")
    val ranks = ((0 until 100).map(q => q.toLong -> 450L) ++
      (100 until 130).map(q => q.toLong -> 150L)).toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got =
      try {
        val r = RankSelect.selectRankPairsImpl(df, ranks,
          histBins = 16, collectCap = 64, maxRounds = 200,
          perturbForTest = true)
        Thread.sleep(500) // let queued listener events drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    // job count is O(rounds), never O(queries): each round is at most
    // histogram + recount + batched repair + batched subnormal +
    // batched tie-init + one shared id-phase pass (+ finishSmall),
    // and the phases take a handful of rounds each — 130 queries
    // transitioning simultaneously must not add jobs (pre-fix this
    // workload ran 130+ serial driver jobs at the transition alone)
    assert(jobs.get() < 70,
      s"rare paths serialized per-query jobs: ${jobs.get()} jobs")
    // and the answers are exact despite every round being perturbed
    def ref(data: Seq[(Long, Double, Long)], r: Long) =
      data.map(t => (t._2, t._3)).sorted.apply((r - 1).toInt)
    val byQ = (rowsA ++ rowsB).groupBy(_._1)
    for ((q, r) <- ranks)
      assert(got(q) == ref(byQ(q), r), s"query $q rank $r")
  }

  test("rankBuckets: a fully-tied score column cuts exact buckets by " +
      "id order (the tie-heavy boundary path) in bounded time") {
    import spark.implicits._
    val n = 40000
    val df = (0 until n).map(i => (i.toLong, 0.0)).toDF("id", "score")
    val t0 = System.nanoTime()
    val got = DataSelection.rankBuckets(df, "id", "score", 4,
      histBins = 64)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    // ranks on (score, id) = id order: exact quarters by id
    (0 until n).foreach { i =>
      val expect = 1 + i * 4 / n
      assert(got(i.toLong) == expect, s"id=$i got=${got(i.toLong)}")
    }
    // the quadratic top-j form needed O(n * n/4) single-threaded work
    // here; the refinement form is a handful of bounded passes
    assert(secs < 60.0, f"tied-boundary resolution took $secs%.1f s")
  }

  test("groupedRankBuckets equals per-group global rankBuckets; ties, " +
      "small groups, null-group exclusion, gates") {
    import spark.implicits._
    // three groups of very different sizes; scores deliberately tied
    // (mod 7) so the (score, id) tie rule decides bucket boundaries;
    // group "tiny" has fewer rows than buckets (empty leading buckets)
    val rows =
      (1L to 200L).map(i => (i, "big", (i % 7).toDouble)) ++
      (1001L to 1030L).map(i => (i, "mid", (i % 7).toDouble)) ++
      (2001L to 2002L).map(i => (i, "tiny", 1.0))
    val df = rows.toDF("id", "grp", "score")
    val got = DataSelection.groupedRankBuckets(df, "grp", "id", "score",
      nBuckets = 4, histBins = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    // reference: the (already oracle-pinned) global partitioner run on
    // each group slice independently
    for (g <- Seq("big", "mid", "tiny")) {
      val ref = DataSelection.rankBuckets(df.filter(col("grp") === g),
        "id", "score", nBuckets = 4, histBins = 8)
        .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
      ref.foreach { case (id, b) =>
        assert(got(id) == b, s"group $g id $id: got ${got(id)} ref $b")
      }
    }
    // exact sizing within a group: 200 rows over 4 buckets = 50 each
    val bigSizes = got.filter(_._1 <= 200L).groupBy(_._2).map {
      case (b, m) => b -> m.size }
    assert(bigSizes == Map(1 -> 50, 2 -> 50, 3 -> 50, 4 -> 50), bigSizes)
    // descending flips the ordering, still group-local
    val desc = DataSelection.groupedRankBuckets(df, "grp", "id", "score",
      nBuckets = 4, ascending = false, histBins = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    val refD = DataSelection.rankBuckets(df.filter(col("grp") === "big"),
      "id", "score", nBuckets = 4, ascending = false, histBins = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    refD.foreach { case (id, b) => assert(desc(id) == b) }
    // null-group rows are excluded
    val withNull = df.unionByName(
      Seq((9999L, null.asInstanceOf[String], 1.0))
        .toDF("id", "grp", "score"))
    assert(!DataSelection.groupedRankBuckets(withNull, "grp", "id",
      "score", 4, histBins = 8).collect().map(_.getLong(0))
      .contains(9999L))
    // gates fail loudly
    intercept[IllegalArgumentException] {
      DataSelection.groupedRankBuckets(df, "grp", "id", "score", 4,
        maxGroups = 2)
    }
    intercept[IllegalArgumentException] {
      DataSelection.groupedRankBuckets(df, "grp", "id", "score", 4,
        histBins = (1 << 24)) // 3 groups x 2^24 bins > driver bound
    }
  }
}
