package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.JsonStr
import graft.functions.TextFunctions
import graft.operators.{DataSelection, Dedup, ProductQuantization, Retrieval, Similarity}

/** Float-twin agreement report: the 8 float-scored query forms are
  * permanent `no_oracle` rows in the driver's DuckDB compare
  * (platform-ULP float folds), each shadowed by a bit-exact
  * integer/rational twin. This tool closes the structural blind spot
  * with two checks per form, written as one JSON report (committed as
  * FLOAT_TWINS_r{N}.json):
  *
  * 1. `determinism` — the committed float form (its exact q_* config)
  *    re-run with inputs repartitioned to a different partition count
  *    must reproduce EVERY column byte-exactly, scores included. This
  *    is the hazard rows-only checks cannot see: a fold-order-
  *    dependent float reduction would differ run to run.
  *
  * 2. `twin` — verdict columns (ids, ranks, pair sets; every
  *    non-floating-point column) must agree with the integer twin on
  *    ALIGNED configurations:
  *    - vector ops run the twin at ×1e6 quantization (the committed
  *      ×1e3 twins stay the DuckDB oracles; 1e3 quantization error
  *      ~1e-3 legitimately flips observed 2e-4 rank ties and PQ
  *      sub-centroid assignments, while at 1e6 the error sits below
  *      every tie gap on this fixture) — then the compare is STRICT;
  *    - bm25's twin scores with the rational idf (a different
  *      formula, not a quantization), which may legitimately reorder
  *      scores within a tie window; its compare is tie-tolerant with
  *      relative eps 2e-3 judged against the float run's extended
  *      (k=25) score table, and any twin member absent from that
  *      table is a hard mismatch;
  *    - dsir has no selection twin by design (q_dsir_feats pins the
  *      integer feature substrate); its structural check is the
  *      determinism one.
  *
  * Usage: `runMain graft.tools.FloatTwins [sfDir] [outPath]`.
  */
object FloatTwins {

  /** Non-floating-point columns, in schema order. */
  private def verdictCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType != DoubleType && f.dataType != FloatType => f.name
    }.toSeq

  private def rows(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(concat_ws(",", cols.map(c => col(c).cast("string")): _*)
        .as("r"))
      .collect().map(_.getString(0)).sorted.toSeq

  private final case class Check(cols: Seq[String], rowsA: Int, rowsB: Int,
      mismatches: Int) {
    def ok: Boolean = mismatches == 0 && rowsA == rowsB
    def json: String =
      s"""{"cols":[${cols.map(JsonStr(_)).mkString(",")}],""" +
        s""""rows_a":$rowsA,"rows_b":$rowsB,""" +
        s""""mismatches":$mismatches,"match":$ok}"""
  }

  /** Strict compare over the given columns (all columns when
    * `cols == null` — the determinism form, scores included).
    */
  private def strict(name: String, a: DataFrame, b: DataFrame,
      allCols: Boolean = false): Check = {
    val cols = if (allCols) a.columns.toSeq else verdictCols(a)
    val (ra, rb) = (rows(a, cols), rows(b, cols))
    val mism = (ra.diff(rb) ++ rb.diff(ra)).size
    if (mism > 0)
      System.err.println(s"$name MISMATCH sample: " +
        (ra.diff(rb).take(3) ++ rb.diff(ra).take(3)).mkString(" | "))
    Check(cols, ra.size, rb.size, mism)
  }

  /** Tie-tolerant top-k compare for bm25: the twin ranking must be a
    * valid ranking of the float scores up to relative eps — rank
    * inversions and boundary membership swaps only within the tie
    * window, judged against the float run's extended score table.
    */
  private def tieTolerant(name: String, floatExtended: DataFrame,
      twin: DataFrame, k: Int, epsRel: Double): Check = {
    val fl = floatExtended
      .select(col("query_id").cast("long"), col("rank").cast("int"),
        col("neighbor_id").cast("long"), col("sim").cast("double"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val tw = twin
      .select(col("query_id").cast("long"), col("rank").cast("int"),
        col("neighbor_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    var mism = 0
    var nRows = 0
    for ((q, twinRanks) <- tw) {
      nRows += twinRanks.size
      val fRanks = fl.getOrElse(q, Array.empty[(Int, Long, Double)])
      val score = fRanks.map { case (_, n, s) => n -> s }.toMap
      def eps(s: Double): Double = epsRel * math.abs(s)
      val twinIds = twinRanks.map(_._2)
      // every twin member must appear in the float extended table
      val missing = twinIds.filterNot(score.contains)
      mism += missing.size
      val present = twinIds.filter(score.contains)
      // twin order must respect float scores up to eps
      for (w <- present.sliding(2) if w.length == 2; a = w(0); b = w(1))
        if (score(a) < score(b) - eps(score(b))) {
          mism += 1
          System.err.println(s"$name q=$q order violation: $a(${score(a)}) " +
            s"ranked above $b(${score(b)})")
        }
      // float top-k members dropped by the twin must sit in the
      // boundary tie window
      if (present.nonEmpty) {
        val weakest = present.map(score).min
        for ((_, n, s) <- fRanks.take(k) if !twinIds.contains(n))
          if (s > weakest + eps(s)) {
            mism += 1
            System.err.println(s"$name q=$q member violation: float has " +
              s"$n($s), twin floor $weakest")
          }
      }
      if (missing.nonEmpty)
        System.err.println(s"$name q=$q twin members missing from float " +
          s"extended table: ${missing.mkString(",")}")
    }
    Check(Seq("query_id", "rank", "neighbor_id"),
      fl.values.map(_.take(k).size).sum, nRows, mism)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outPath = args.lift(1).getOrElse("FLOAT_TWINS_r10.json")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    // ×1e6 quantization for ALIGNED twin runs (strict compare); the
    // committed ×1e3 q_*_int forms remain the DuckDB oracles
    def qz(c: Column): Column =
      transform(c, x => round(x.cast("double") * 1e6).cast("long"))
    val embInt = emb.select(col("vec_id"), qz(col("embedding")).as("embedding"))
    def cents(of: DataFrame): Array[(Int, Array[Double])] =
      of.filter(col("vec_id") < 4).orderBy(col("vec_id")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Any](1).map {
          case d: Double => d
          case f: Float => f.toDouble
          case l: Long => l.toDouble
        }.toArray))

    def planted(of: DataFrame, quantized: Boolean): DataFrame = {
      val p = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
      of.unionByName(
        if (quantized) p.select(col("vec_id"), qz(col("embedding")).as("embedding"))
        else p)
    }

    val queriesF = emb.filter(col("vec_id") < 5)
    val queriesI = embInt.filter(col("vec_id") < 5)
    def bmQ(of: DataFrame) = of.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        array_join(slice(TextFunctions.tokens(col("text")), 1, 8), " ")
          .as("qtext"))

    // ---- determinism runs: the COMMITTED float configs, inputs
    // repartitioned to a different (prime) partition count ------------
    val docsR = docs.repartition(7)
    val embR = emb.repartition(7)
    def q10(of: DataFrame) = of.filter(col("vec_id") < 10)
    def dsirRun(d: DataFrame) = DataSelection.dsirResample(d,
      d.filter(col("doc_id") % 7 === 0), "doc_id", "text",
      keepN = 100, buckets = 1000)
    val determinism: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("bm25",
        () => Retrieval.bm25TopK(docs, bmQ(docs), "doc_id", "text",
          "query_id", "qtext", k = 5),
        () => Retrieval.bm25TopK(docsR, bmQ(docsR), "doc_id", "text",
          "query_id", "qtext", k = 5)),
      ("dsir", () => dsirRun(docs), () => dsirRun(docsR)),
      ("emb_near_dup",
        () => Dedup.embeddingNearDupPairs(planted(emb, false), "vec_id",
          "embedding", threshold = 0.99, planes = 6),
        () => Dedup.embeddingNearDupPairs(planted(embR, false), "vec_id",
          "embedding", threshold = 0.99, planes = 6)),
      ("semantic_dedup",
        () => Dedup.semanticDupPairs(planted(emb, false), "vec_id",
          "embedding", threshold = 0.99, numCentroids = 8),
        () => Dedup.semanticDupPairs(planted(embR, false), "vec_id",
          "embedding", threshold = 0.99, numCentroids = 8)),
      ("knn_brute",
        () => Similarity.bruteForceTopK(emb, q10(emb), "vec_id",
          "embedding", 5),
        () => Similarity.bruteForceTopK(embR, q10(embR), "vec_id",
          "embedding", 5)),
      ("knn_lsh",
        () => Similarity.lshBucketedTopK(emb, q10(emb), "vec_id",
          "embedding", 5, planes = 6),
        () => Similarity.lshBucketedTopK(embR, q10(embR), "vec_id",
          "embedding", 5, planes = 6)),
      ("knn_ivf",
        () => Similarity.ivfTopK(emb, q10(emb), "vec_id", "embedding", 5),
        () => Similarity.ivfTopK(embR, q10(embR), "vec_id", "embedding", 5)),
      ("pq",
        () => ProductQuantization.adcTopK(emb, q10(emb), "vec_id",
          "embedding", 5, ProductQuantization.fitCodebook(emb, "vec_id",
            "embedding", m = 8, k = 8)),
        () => ProductQuantization.adcTopK(embR, q10(embR), "vec_id",
          "embedding", 5, ProductQuantization.fitCodebook(embR, "vec_id",
            "embedding", m = 8, k = 8))))
    val detChecks = determinism.map { case (n, a, b) =>
      n -> strict(s"determinism:$n", a(), b(), allCols = true)
    }.toMap

    // ---- twin runs (aligned configs, see scaladoc) ------------------
    val twinChecks: Map[String, Check] = Map(
      "bm25" -> tieTolerant("twin:bm25",
        Retrieval.bm25TopK(docs, bmQ(docs), "doc_id", "text", "query_id",
          "qtext", k = 25),
        Retrieval.bm25TopK(docs, bmQ(docs), "doc_id", "text", "query_id",
          "qtext", k = 5, rationalIdf = true),
        k = 5, epsRel = 2e-3),
      "emb_near_dup" -> strict("twin:emb_near_dup",
        Dedup.embeddingNearDupPairs(planted(emb, false), "vec_id",
          "embedding", threshold = 0.99, planes = 6),
        Dedup.embeddingNearDupPairs(planted(embInt, true), "vec_id",
          "embedding", threshold = 0.99, planes = 6, integer = true)),
      "semantic_dedup" -> strict("twin:semantic_dedup",
        Dedup.semanticDupPairs(planted(emb, false), "vec_id", "embedding",
          threshold = 0.99, centroids = cents(emb)),
        Dedup.semanticDupPairs(planted(embInt, true), "vec_id", "embedding",
          threshold = 0.99, centroids = cents(embInt))),
      "knn_brute" -> strict("twin:knn_brute",
        Similarity.bruteForceTopK(emb, queriesF, "vec_id", "embedding", 5),
        Similarity.bruteForceTopK(embInt, queriesI, "vec_id", "embedding", 5)),
      "knn_lsh" -> strict("twin:knn_lsh",
        Similarity.lshBucketedTopK(emb, queriesF, "vec_id", "embedding", 5,
          planes = 6),
        Similarity.lshBucketedTopKInt(embInt, queriesI, "vec_id",
          "embedding", 5, planes = 6)),
      "knn_ivf" -> strict("twin:knn_ivf",
        Similarity.ivfTopK(emb, queriesF, "vec_id", "embedding", 5,
          nprobe = 2, centroids = cents(emb)),
        Similarity.ivfTopK(embInt, queriesI, "vec_id", "embedding", 5,
          nprobe = 2, centroids = cents(embInt))),
      "pq" -> strict("twin:pq",
        ProductQuantization.adcTopK(emb, queriesF, "vec_id", "embedding", 5,
          ProductQuantization.sampledCodebook(emb, "vec_id", "embedding",
            m = 8, k = 8)),
        ProductQuantization.adcTopK(embInt, queriesI, "vec_id", "embedding",
          5, ProductQuantization.sampledCodebook(embInt, "vec_id",
            "embedding", m = 8, k = 8))))

    val names = determinism.map(_._1)
    val allMatch = detChecks.values.forall(_.ok) &&
      twinChecks.values.forall(_.ok)
    val pairsJson = names.map { n =>
      val twin = twinChecks.get(n).map(_.json).getOrElse("null")
      s"""${JsonStr(n)}:{"determinism":${detChecks(n).json},"twin":$twin}"""
    }.mkString(",")
    val json =
      s"""{"sf_dir":${JsonStr(sfDir)},"all_match":$allMatch,""" +
        s""""pairs":{$pairsJson}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    if (!allMatch) sys.exit(1)
  }
}
