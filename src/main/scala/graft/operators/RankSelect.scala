package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched exact selection of the rank-j element of an (s ASC, id ASC)
  * ordering — the boundary-resolution engine behind [[DataSelection]]'s
  * rank-cut operators (rankBuckets / groupedRankBuckets and everything
  * built on them: ccnet tiers, curriculum stages).
  *
  * Why not a bounded top-j? j here is a RANK, not a result size: on a
  * tie-heavy score distribution (quality scores with few distinct
  * values — half a web crawl scoring exactly 0.0) the boundary bin
  * holds a large fraction of the corpus and j grows with it, so a
  * top-j buffer degenerates to an O(n·j) single-reducer insert sort
  * (observed: a 1M-doc corpus with ~90% tied LM scores pinned one
  * task for >35 minutes). This engine replaces it with histogram
  * refinement — the [[DataSelection.groupedExactQuantiles]] recipe
  * generalized to the composite (s, id) key:
  *
  *   - SCORE phase: refine the candidate interval on s, one shared
  *     histogram pass per round for ALL queries (population shrinks
  *     ~histBins× per round);
  *   - a tie class (interval pinched to a single s, population still
  *     large) switches to the ID phase: the remaining rank falls on
  *     the j'-th smallest id among rows with s == s* — refined with
  *     exact integer interval arithmetic (ids are distinct, so once
  *     the interval width ≤ collectCap the population is too);
  *   - a subnormal-width score interval (distinct doubles a few ulps
  *     apart that equal-width bins cannot split) resolves by batched
  *     per-value counts, then enters the ID phase on the crossing
  *     value's tie class;
  *   - any phase whose population ≤ collectCap finishes with one
  *     bounded collect and a driver-side pick.
  *
  * Every pass covers every still-active query — INCLUDING the rare
  * paths: half-ulp invariant repairs recount in one broadcast-interval
  * pass for every repaired query, subnormal intervals resolve their
  * per-value counts in one shared pass, and every query entering the
  * ID phase in a round gets its tie-class envelope (count, min id,
  * max id) from one shared aggregation. Tie-heavy data — the engine's
  * motivating case — pinches MANY queries into their tie classes in
  * the same round; none of the three transitions may serialize into
  * per-query driver jobs (pinned by a SparkListener constant-job-count
  * spec with the fault-injection hook below). All arithmetic is
  * deterministic and driver state is O(queries). Worst-case rounds:
  * ~64 per phase (double exponent range / 64-bit id range over
  * histBins splits).
  */
private[graft] object RankSelect {

  private sealed trait Phase
  /** Candidate interval on s (inclusive); rank is within the
    * CURRENT candidate set (rows with sLo <= s <= sHi).
    */
  private final case class ScoreP(sLo: Double, sHi: Double, n: Long,
    rank: Long) extends Phase
  /** Tie class s == sStar; candidate interval on id (inclusive). */
  private final case class IdP(sStar: Double, idLo: Long, idHi: Long,
    n: Long, rank: Long) extends Phase

  /** `rows` = (qid: long, s: double, id: long) — each query's full
    * candidate set; `ranks(qid)` = 1-based rank within (s ASC, id ASC).
    * Returns qid -> the exact (s, id) at that rank. Ids may be any
    * longs (the integer refinement is overflow-safe via ceil-split
    * midpoints). NaN scores are the caller's to exclude.
    */
  def selectRankPairs(rows: DataFrame, ranks: Map[Long, Long],
      histBins: Int = 1024, collectCap: Int = 10000,
      maxRounds: Int = 200): Map[Long, (Double, Long)] =
    selectRankPairsImpl(rows, ranks, histBins, collectCap, maxRounds,
      perturbForTest = false)

  /** [[selectRankPairs]] with a fault-injection hook: when
    * `perturbForTest` is set, every round's proposed score interval is
    * shifted one bin off target BEFORE the exact recount, so the
    * invariant-repair path fires for (nearly) every active query every
    * round — the only deterministic way to exercise the repair
    * machinery, whose natural trigger is a half-ulp binning accident.
    * Results must still be exact (repair widens the offending edge
    * back); the batching spec asserts that under hundreds of
    * simultaneous repairs / tie-class transitions the round still runs
    * a CONSTANT number of jobs.
    */
  private[graft] def selectRankPairsImpl(rows: DataFrame,
      ranks: Map[Long, Long], histBins: Int, collectCap: Int,
      maxRounds: Int, perturbForTest: Boolean)
      : Map[Long, (Double, Long)] = {
    if (ranks.isEmpty) return Map.empty
    val spark = rows.sparkSession
    import spark.implicits._
    val r0 = rows.select(col("qid").cast("long").as("qid"),
      col("s").cast("double").as("s"), col("id").cast("long").as("id"))
      .localCheckpoint(true)
    val env = r0.groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), min(col("s")), max(col("s")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val state = scala.collection.mutable.LinkedHashMap.empty[Long, Phase]
    for ((qid, r) <- ranks) {
      val (n, mn, mx) = env.getOrElse(qid,
        throw new IllegalArgumentException(
          s"selectRankPairs: no rows for query $qid"))
      require(r >= 1 && r <= n,
        s"selectRankPairs: rank $r outside [1, $n] for query $qid")
      state(qid) = ScoreP(mn, mx, n, r)
    }
    val done = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Double, Long)]

    def activeSmall: Seq[Long] = state.keys.toSeq
      .filterNot(done.contains)
      .filter(q => state(q) match {
        case ScoreP(_, _, n, _) => n <= collectCap
        case IdP(_, _, _, n, _) => n <= collectCap
      })

    // one batched leaf collect for every small query
    def finishSmall(): Unit = {
      val qs = activeSmall
      if (qs.isEmpty) return
      val tags = broadcast(qs.map { q =>
        state(q) match {
          case ScoreP(lo, hi, _, _) =>
            (q, lo, hi, Long.MinValue, Long.MaxValue)
          case IdP(s, ilo, ihi, _, _) => (q, s, s, ilo, ihi)
        }
      }.toDF("qid", "__slo", "__shi", "__ilo", "__ihi"))
      val leaves = r0.join(tags, Seq("qid"))
        .filter(col("s") >= col("__slo") && col("s") <= col("__shi") &&
          col("id") >= col("__ilo") && col("id") <= col("__ihi"))
        .select(col("qid"), col("s"), col("id"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1)
      for (q <- qs) {
        val rank = state(q) match {
          case ScoreP(_, _, _, r) => r
          case IdP(_, _, _, _, r) => r
        }
        val sorted = leaves(q).map(t => (t._2, t._3)).sortBy(identity)
        done(q) = sorted((rank - 1).toInt)
      }
    }

    var rounds = 0
    while (done.size < state.size && rounds < maxRounds) {
      finishSmall()
      val act = state.keys.toSeq.filterNot(done.contains)
      if (act.isEmpty) return done.toMap

      // ---- score-phase round (all score queries in shared passes) --
      val sq = act.filter(q => state(q).isInstanceOf[ScoreP])
      if (sq.nonEmpty) {
        val ivals = broadcast(sq.map { q =>
          val p = state(q).asInstanceOf[ScoreP]
          (q, p.sLo, p.sHi, (p.sHi - p.sLo) / histBins, p.rank)
        }.toDF("qid", "__lo", "__hi", "__w", "__r"))
        val binOf = least(floor((col("s") - col("__lo")) / col("__w"))
          .cast("int"), lit(histBins - 1))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("__b"))
        val crossing = r0.join(ivals, Seq("qid"))
          .filter(col("s") >= col("__lo") && col("s") <= col("__hi"))
          .select(col("qid"), col("__r"),
            when(col("__w") > 0.0, binOf).otherwise(lit(0)).as("__b"))
          .groupBy(col("qid"), col("__r"), col("__b"))
          .agg(count(lit(1)).as("__c"))
          .withColumn("__cum", sum(col("__c")).over(win))
          .filter(col("__cum") >= col("__r") &&
            col("__cum") - col("__c") < col("__r"))
          .select(col("qid"), col("__b"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        // proposed sub-intervals (optionally perturbed one bin off
        // target to force the repair path in tests)
        val props: Map[Long, (Double, Double)] = sq.map { q =>
          val p = state(q).asInstanceOf[ScoreP]
          val w = (p.sHi - p.sLo) / histBins
          val b = crossing(q)
          val nl0 = if (b == 0 || w <= 0.0) p.sLo else p.sLo + b * w
          val nh0 = if (b >= histBins - 1 || w <= 0.0) p.sHi
            else p.sLo + (b + 1) * w
          val (nl, nh) =
            if (!perturbForTest) (nl0, nh0)
            else {
              val d = if (q % 2 == 0) w else -w
              val l2 = math.max(p.sLo, math.min(p.sHi, nl0 + d))
              val h2 = math.max(p.sLo, math.min(p.sHi, nh0 + d))
              if (l2 < h2) (l2, h2) else (nl0, nh0)
            }
          q -> (nl, nh)
        }.toMap
        // exact recount + interval min/max for EVERY proposal in one
        // broadcast-interval pass. mn/mx are null when the proposed
        // interval holds zero rows (the half-ulp misbin case the
        // repair exists for) — guard with isNullAt and let the
        // invariant repair fire; NaN never leaks past the repair
        // because the rank invariant (in > 0) is re-required below.
        def recountPass(entries: Seq[(Long, Double, Double, Double,
            Double)]): Map[Long, (Long, Long, Double, Double)] =
          r0.join(broadcast(entries
              .toDF("qid", "__lo", "__hi", "__nl", "__nh")), Seq("qid"))
            .filter(col("s") >= col("__lo") && col("s") <= col("__hi"))
            .groupBy(col("qid"), col("__nl"), col("__nh"))
            .agg(
              sum(when(col("s") < col("__nl"), 1L).otherwise(0L))
                .as("cl"),
              sum(when(col("s") >= col("__nl") &&
                col("s") <= col("__nh"), 1L).otherwise(0L)).as("in"),
              min(when(col("s") >= col("__nl") &&
                col("s") <= col("__nh"), col("s"))).as("mn"),
              max(when(col("s") >= col("__nl") &&
                col("s") <= col("__nh"), col("s"))).as("mx"))
            .collect().map(r => r.getLong(0) ->
              (r.getLong(3), r.getLong(4),
                if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
                if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))
            .toMap
        val re = recountPass(sq.map { q =>
          val p = state(q).asInstanceOf[ScoreP]
          val (nl, nh) = props(q)
          (q, p.sLo, p.sHi, nl, nh)
        })
        // half-ulp misbin repair (exact counts decide; see
        // groupedExactQuantiles): widen the offending edge one bin.
        // BOTH edge decisions come from the first recount — widening
        // lo moves rows from cl into in, leaving cl + in (= rows <=
        // nh) unchanged, so the hi check is independent of the lo
        // widen — and every repaired query recounts in ONE
        // broadcast-interval pass, the same shape as the main round:
        // tie-heavy data sending hundreds of queries into repair in
        // the same round costs one job, not hundreds of serial
        // driver-loop jobs.
        val widened = sq.map { q =>
          val p = state(q).asInstanceOf[ScoreP]
          val (nl0, nh0) = props(q)
          val (cl, in, _, _) = re(q)
          val w = (p.sHi - p.sLo) / histBins
          val nl = if (cl >= p.rank) math.max(p.sLo, nl0 - w) else nl0
          val nh = if (cl + in < p.rank) math.min(p.sHi, nh0 + w)
            else nh0
          q -> (nl, nh, nl != nl0 || nh != nh0)
        }.toMap
        val toRepair = widened.collect {
          case (q, (nl, nh, true)) =>
            val p = state(q).asInstanceOf[ScoreP]
            (q, p.sLo, p.sHi, nl, nh)
        }.toSeq
        val recounted: Map[Long, (Long, Long, Double, Double)] =
          if (toRepair.isEmpty) Map.empty else recountPass(toRepair)
        // classify every query; batch the two rare-path transitions
        val tieInit = scala.collection.mutable.ListBuffer
          .empty[(Long, Double, Long)] // (qid, sStar, rank within class)
        val subnormal = scala.collection.mutable.ListBuffer
          .empty[(Long, Double, Double, Long)] // (qid, nl, nh, rank2)
        for (q <- sq) {
          val p = state(q).asInstanceOf[ScoreP]
          val (nl, nh, wasRepaired) = widened(q)
          val (cl, in, mn, mx) =
            if (wasRepaired) recounted(q) else re(q)
          require(cl < p.rank && p.rank <= cl + in,
            s"selectRankPairs: rank invariant broken for query $q " +
              s"(rank=${p.rank} cl=$cl in=$in)")
          val rank2 = p.rank - cl
          if (mn == mx) {
            // tie class (or single survivor): switch to the ID phase
            tieInit += ((q, mn, rank2))
          } else if (in == p.n && nl == p.sLo && nh == p.sHi) {
            // no shrink, several distinct doubles a few ulps apart:
            // resolve the crossing VALUE by per-value counts (bounded
            // by the representable doubles in the pinched interval)
            subnormal += ((q, nl, nh, rank2))
          } else {
            state(q) = ScoreP(nl, nh, in, rank2)
          }
        }
        // batched subnormal resolve: one shared per-value count pass
        // for every pinched query, then a driver-side walk over each
        // query's handful of values to find the crossing value
        if (subnormal.nonEmpty) {
          val byVal = r0.join(broadcast(subnormal.toSeq
              .map { case (q, nl, nh, _) => (q, nl, nh) }
              .toDF("qid", "__nl", "__nh")), Seq("qid"))
            .filter(col("s") >= col("__nl") && col("s") <= col("__nh"))
            .groupBy(col("qid"), col("s")).count()
            .collect()
            .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
            .groupBy(_._1)
          for ((q, _, _, rank2) <- subnormal) {
            val vs = byVal(q).map(t => (t._2, t._3)).sortBy(_._1)
            var acc = 0L
            var sStar = vs.last._1
            var rankIn = vs.last._2
            var found = false
            for ((v, c) <- vs if !found) {
              if (acc < rank2 && rank2 <= acc + c) {
                sStar = v; rankIn = rank2 - acc; found = true
              }
              acc += c
            }
            tieInit += ((q, sStar, rankIn))
          }
        }
        // batched ID-phase entry: ONE shared aggregation computes the
        // tie-class envelope (count, min id, max id) for every query
        // transitioning this round — on tie-heavy data that can be
        // every active query at once
        if (tieInit.nonEmpty) {
          val envs = r0.join(broadcast(tieInit.toSeq
              .map { case (q, s, _) => (q, s) }.toDF("qid", "__s")),
              Seq("qid"))
            .filter(col("s") === col("__s"))
            .groupBy(col("qid"))
            .agg(count(lit(1)).as("n"), min(col("id")).as("ilo"),
              max(col("id")).as("ihi"))
            .collect()
            .map(r => r.getLong(0) ->
              (r.getLong(1), r.getLong(2), r.getLong(3)))
            .toMap
          for ((q, sStar, rank2) <- tieInit) {
            val (n, ilo, ihi) = envs(q)
            state(q) = IdP(sStar, ilo, ihi, n, rank2)
          }
        }
      }

      // ---- id-phase round: exact midpoint bisection on the id
      // interval (overflow-safe: midpoints computed in BigInteger on
      // the driver; rows only ever COMPARE against a literal). The
      // VALUE range halves every round (≤ 64 rounds over the full
      // long range), and ids are distinct, so the population is
      // bounded by the range and reaches collectCap quickly; one
      // shared pass serves every active id-phase query.
      val iq = state.keys.toSeq.filterNot(done.contains)
        .filter(q => state(q).isInstanceOf[IdP])
        .filter(q => state(q).asInstanceOf[IdP].n > collectCap)
      if (iq.nonEmpty) {
        val mids = iq.map { q =>
          val p = state(q).asInstanceOf[IdP]
          val mid = java.math.BigInteger.valueOf(p.idLo)
            .add(java.math.BigInteger.valueOf(p.idHi)
              .subtract(java.math.BigInteger.valueOf(p.idLo))
              .shiftRight(1))
            .longValueExact()
          q -> mid
        }.toMap
        val tags = broadcast(iq.map { q =>
          val p = state(q).asInstanceOf[IdP]
          (q, p.sStar, p.idLo, p.idHi, mids(q))
        }.toDF("qid", "__s", "__ilo", "__ihi", "__mid"))
        val cLow = r0.join(tags, Seq("qid"))
          .filter(col("s") === col("__s") &&
            col("id") >= col("__ilo") && col("id") <= col("__ihi"))
          .groupBy(col("qid"))
          .agg(sum(when(col("id") <= col("__mid"), 1L).otherwise(0L))
            .as("cl"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        for (q <- iq) {
          val p = state(q).asInstanceOf[IdP]
          val cl = cLow(q)
          state(q) =
            if (p.rank <= cl) IdP(p.sStar, p.idLo, mids(q), cl, p.rank)
            else IdP(p.sStar, mids(q) + 1, p.idHi, p.n - cl,
              p.rank - cl)
        }
      }
      rounds += 1
    }
    finishSmall()
    require(done.size == state.size,
      s"selectRankPairs: ${state.size - done.size} queries unresolved " +
        s"after $maxRounds rounds — raise histBins/collectCap")
    done.toMap
  }
}
