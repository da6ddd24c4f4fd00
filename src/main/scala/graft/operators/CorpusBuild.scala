package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.WarcSource

/** The COMPLETE corpus build as one restartable run — WARC/WET drop
  * directory in, curriculum-ordered training packs out. Reference: N/A
  * (beyond the reference's surface — LLM-pipeline brief).
  *
  * Every constituent operator already exists in this library; this
  * composes them under the staged-parquet restart contract
  * [[CorpusAnalysis.curatePersisted]] established for its five curate
  * stages, extended across the whole source→curriculum span: each
  * stage lands as parquet under `<stageDir>/<n>_<name>` with a schema
  * sidecar written AFTER the parquet commit (the sidecar — not
  * `_SUCCESS` — gates the resume skip, so a run killed mid-write
  * recomputes instead of resuming onto a half-stage), and a
  * `_graft_params.json` sidecar written once and validated fail-loud
  * on every resume — resuming a multi-day 100 TB build with any knob
  * changed would silently mix regimes across stages, the worst
  * restartable-pipeline failure mode. The caller-supplied `target`
  * DataFrame — the one non-scalar parameter — is covered by a
  * deterministic fingerprint (row count + order-insensitive sum of
  * 60-bit id hashes, one bounded aggregation per run) persisted in the
  * sidecar, so resuming with a DIFFERENT target fails loudly instead
  * of silently mixing tier regimes across stages 4+.
  *
  * Stages are additionally chained by LINEAGE TOKENS: every stage that
  * computes writes a fresh token plus the token of the stage it read
  * from; a resumed stage requires its recorded upstream token to match
  * the upstream's CURRENT token. Deleting or recomputing one
  * mid-pipeline stage therefore fails every later persisted stage
  * loudly ("stale downstream stage") instead of silently resuming onto
  * parquet built from the OLD upstream data. Delete a stage directory
  * AND everything downstream of it to force recomputation.
  *
  * Stages:
  *   - `0_extract`  — [[WarcSource.read]] → HTML responses →
  *     [[HtmlExtract.extractText]] (WET `conversion` records skip the
  *     HTML stage and contribute their plain text directly); doc id =
  *     60-bit hash of (archive path, record seq) — stable across
  *     resumes by construction.
  *   - `1_repair`   — [[TextRepair.repairReport]] mojibake repair.
  *   - `2_gate`     — [[CorpusAnalysis.c4Clean]] line scrub, kept docs
  *     must also pass [[CorpusAnalysis.gopherRules]] on the scrubbed
  *     text.
  *   - `3_dedup`    — exact ([[Dedup.exactDedup]]) then MinHash near
  *     dedup ([[Dedup.minHashNearDupPairs]] → [[Dedup.nearDedup]]).
  *   - `4_tiers`    — CCNet-style quality tiers
  *     ([[LanguageModel.ccnetBuckets]], exact-prob key) against
  *     `target` — or, when none is supplied, a deterministic 10% hash
  *     sample of the corpus itself (self-LM: head = most typical).
  *   - `5_mix`      — [[CorpusAnalysis.upsampleMixture]] by tier
  *     (`tierRates`); each (doc, copy) gets a fresh stable 60-bit id.
  *   - `6_pack`     — [[CorpusAnalysis.packTexts]] into ~`packTokens`
  *     training sequences.
  *   - `7_curriculum` — [[DataSelection.curriculumOrder]] over the
  *     packs (short-first by mean member-doc length, the classic
  *     easy-to-hard schedule), shard-count auto-sized.
  *   - `report`     — per-stage (stage, docs_in, docs_out) attrition.
  *
  * Scale shape: nothing new — each stage is exactly the operator's own
  * audited plan reading the previous stage's parquet (a narrow
  * columnar scan), so the pipeline's cost is the sum of its pinned
  * parts plus one corpus write per stage (the price of restartability,
  * identical to curatePersisted's trade).
  */
object CorpusBuild {

  /** Run (or resume) the full build. Returns the attrition report.
    * The final training artifact is `<stageDir>/7_curriculum`:
    * (id, stage, shard, position, pack_tokens, n_docs, text).
    */
  def buildCorpus(spark: SparkSession, warcDir: String, stageDir: String,
      target: DataFrame = null, minWords: Int = 10,
      minLinesKept: Int = 1, minWordsPerLine: Int = 3,
      nearDupThreshold: Double = 0.8,
      tierRates: Map[String, Double] =
        Map("head" -> 2.0, "middle" -> 1.0, "tail" -> 0.25),
      packTokens: Int = 2048, nStages: Int = 3,
      salt: String = "buildcorpus",
      // observability, not a build parameter (excluded from the
      // sidecar): called with (stage, seconds) after each stage that
      // actually COMPUTED (skipped resume stages don't fire)
      onStage: (String, Double) => Unit = (_, _) => ()): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    def writeFile(p: org.apache.hadoop.fs.Path, content: String): Unit = {
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    def readFile(p: org.apache.hadoop.fs.Path): String = {
      val in = p.getFileSystem(conf).open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    // ---- params sidecar: write once, fail-loud compare on resume ----
    // (the curatePersisted contract). The target DataFrame is covered
    // by a deterministic fingerprint: row count + order-insensitive
    // sum of 60-bit (id, text) CONTENT hashes (longs; wraparound is
    // fine — it stays deterministic and order-free). Hashing the text
    // alongside the id costs nothing extra (same one bounded
    // aggregation) and closes the silent-mix hole: a target with the
    // same ids but different text trains a different LM regime and
    // must fail the resume, not blend tiers across regimes.
    val targetFp =
      if (target == null) "none"
      else {
        val r = target
          .agg(count(lit(1)),
            sum(TextFunctions.md5Hash60(concat(lit("tgtfp:"),
              col("id").cast("string"), lit(":"), col("text")))))
          .collect()(0)
        s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
      }
    val params = Seq(
      "warcDir" -> warcDir, "targetFp" -> targetFp,
      "minWords" -> minWords.toString,
      "minLinesKept" -> minLinesKept.toString,
      "minWordsPerLine" -> minWordsPerLine.toString,
      "nearDupThreshold" -> nearDupThreshold.toString,
      "tierRates" -> tierRates.toSeq.sorted.map {
        case (k, v) => s"$k=$v" }.mkString(","),
      "packTokens" -> packTokens.toString,
      "nStages" -> nStages.toString, "salt" -> salt)
      .map { case (k, v) => s"${graft.JsonStr(k)}:${graft.JsonStr(v)}" }
      .mkString("{", ",", "}")
    val paramsFile =
      new org.apache.hadoop.fs.Path(stageDir, "_graft_params.json")
    val paramsFs = paramsFile.getFileSystem(conf)
    if (paramsFs.exists(paramsFile)) {
      val persistedParams = readFile(paramsFile)
      require(persistedParams == params,
        s"buildCorpus: resume with DIFFERENT parameters than the " +
          s"persisted stages were built with.\n  persisted: " +
          s"$persistedParams\n  current:   $params\nDelete $stageDir " +
          s"to rerun under the new parameters.")
    } else {
      require(!paramsFs.exists(new org.apache.hadoop.fs.Path(
          s"$stageDir/0_extract/_graft_schema.json")),
        s"buildCorpus: $stageDir holds persisted stages but no " +
          s"_graft_params.json — delete $stageDir to rebuild.")
      writeFile(paramsFile, params)
    }

    // Each persisted stage carries a lineage token: a fresh random
    // token written when the stage COMPUTES, alongside the token of
    // the upstream stage it read from. A resumed (skipped) stage
    // fail-loud requires its recorded upstream token to equal the
    // upstream's current token — so deleting/recomputing a
    // mid-pipeline stage invalidates every later persisted stage
    // instead of silently resuming onto parquet built from the OLD
    // upstream data. Write order per stage: parquet → lineage →
    // schema sidecar (the commit gate stays the schema sidecar; a
    // crash anywhere before it triggers recompute, never a
    // half-lineage resume).
    def lineageField(json: String, key: String): String = {
      val m = java.util.regex.Pattern
        .compile(graft.JsonStr(key) + ":\"([^\"]*)\"").matcher(json)
      require(m.find(), s"buildCorpus: malformed lineage file: $json")
      m.group(1)
    }
    def persisted(name: String, upstreamToken: String,
        compute: => DataFrame): (DataFrame, String) = {
      val path = s"$stageDir/$name"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val schemaFile =
        new org.apache.hadoop.fs.Path(p, "_graft_schema.json")
      val lineageFile =
        new org.apache.hadoop.fs.Path(p, "_graft_lineage.json")
      if (!fs.exists(schemaFile) ||
          !fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) {
        val t0 = System.nanoTime()
        val df = compute
        df.write.mode("overwrite").parquet(path)
        val token = java.util.UUID.randomUUID().toString
        writeFile(lineageFile,
          s"""{${graft.JsonStr("token")}:${graft.JsonStr(token)},""" +
            s"""${graft.JsonStr("upstream")}:${
              graft.JsonStr(upstreamToken)}}""")
        writeFile(schemaFile, df.schema.json)
        onStage(name, (System.nanoTime() - t0) / 1e9)
      } else {
        require(fs.exists(lineageFile),
          s"buildCorpus: persisted stage $path has no lineage file " +
            s"(written by an older build, or the stage directory was " +
            s"tampered with) — delete $path and everything downstream " +
            s"of it to recompute.")
        val recorded = lineageField(readFile(lineageFile), "upstream")
        require(recorded == upstreamToken,
          s"buildCorpus: STALE DOWNSTREAM STAGE $path — it was built " +
            s"from an upstream stage (lineage $recorded) that has " +
            s"since been recomputed (now $upstreamToken). Resuming " +
            s"would silently mix old and new data; delete $path and " +
            s"everything downstream of it.")
      }
      val token = lineageField(readFile(lineageFile), "token")
      val schema = org.apache.spark.sql.types.DataType.fromJson(
        readFile(schemaFile))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      (spark.read.schema(schema).parquet(path), token)
    }

    // ---- 0: source → text -------------------------------------------
    // The raw archive record count (response + conversion records —
    // the extract stage's TRUE docs_in, before non-HTML skips) is
    // counted once while the stage computes and persisted in a tiny
    // sidecar, so the attrition report never has to re-scan raw
    // archives on a resumed run. The sidecar lives at the stageDir
    // top level (not inside 0_extract, whose directory the parquet
    // overwrite clears) and is re-written whenever stage 0 recomputes.
    val rawCountFile = new org.apache.hadoop.fs.Path(
      s"$stageDir/_graft_rawcount.json")
    val (extract, tExtract) = persisted("0_extract", "root", {
      val recs = WarcSource.read(spark, warcDir)
      val rawRecords = recs
        .filter(r => r.warc_type == "response" ||
          r.warc_type == "conversion")
        .count()
      writeFile(rawCountFile,
        s"""{${graft.JsonStr("raw_records")}:${
          graft.JsonStr(rawRecords.toString)}}""")
      val html = WarcSource.htmlResponses(recs).toDF()
        .select(TextFunctions.md5Hash60(concat_ws(":",
            col("warc_path"), col("record_seq").cast("string")))
            .as("doc_id"),
          col("url"), col("html"))
      val extracted = HtmlExtract.extractText(html, "doc_id", "html",
          carryCols = Seq("url"))
        .select(col("id"), col("url"), col("text"))
      val wet = WarcSource.wetTexts(recs).toDF()
        .select(TextFunctions.md5Hash60(concat_ws(":",
            col("warc_path"), col("record_seq").cast("string")))
            .as("id"),
          col("url"), col("text"))
      extracted.unionByName(wet)
    })
    // ---- 1: mojibake repair -----------------------------------------
    val (repaired, tRepair) = persisted("1_repair", tExtract,
      TextRepair.repairReport(extract, "id", "text")
        .select(col("id"), col("text"))
        .join(extract.select(col("id"), col("url")), Seq("id")))
    // ---- 2: quality gate (C4 line scrub + Gopher rules) -------------
    val (gated, tGate) = persisted("2_gate", tRepair, {
      val c4 = CorpusAnalysis.c4Clean(repaired, "id", "text",
          minWordsPerLine = minWordsPerLine, minLinesKept = minLinesKept)
        .filter(col("pass"))
        .select(col("id"), col("text"))
      val g = CorpusAnalysis.gopherRules(c4, "id", "text",
          minWords = minWords, minStopwordHits = 0)
        .filter(col("pass"))
        .select(col("id"))
      c4.join(g, Seq("id"), "left_semi")
        .join(repaired.select(col("id"), col("url")), Seq("id"))
    })
    // ---- 3: exact + near dedup --------------------------------------
    val (deduped, tDedup) = persisted("3_dedup", tGate, {
      val exact = Dedup.exactDedup(gated, "id", "text")
        .select(col("id"), col("url"), col("text"))
      val pairs = Dedup.minHashNearDupPairs(exact, "id", "text",
        threshold = nearDupThreshold)
      Dedup.nearDedup(exact, "id", pairs)
    })
    // ---- 4: quality tiers -------------------------------------------
    val (tiered, tTiers) = persisted("4_tiers", tDedup, {
      val tgt =
        if (target != null) target
        else deduped.filter(
          pmod(TextFunctions.md5Hash60(concat(lit(s"$salt:tgt:"),
            col("id").cast("string"))), lit(10L)) === 0L)
      LanguageModel.ccnetBuckets(deduped, tgt, "id", "text",
          nBuckets = 3, byExactProb = true)
        .select(col("id"), col("tier"))
        .join(deduped, Seq("id"))
    })
    // ---- 5: mixture / up-sampling by tier ---------------------------
    val (mixed, tMix) = persisted("5_mix", tTiers,
      CorpusAnalysis.upsampleMixture(tiered, "id", "tier", tierRates,
          salt = s"$salt:mix")
        .select(TextFunctions.md5Hash60(concat_ws(":",
            col("id").cast("string"), col("copy").cast("string")))
            .as("mix_id"),
          col("id").as("src_id"), col("copy"), col("tier"),
          col("text")))
    // ---- 6: pack into training sequences ----------------------------
    val (packed, tPack) = persisted("6_pack", tMix,
      CorpusAnalysis.packTexts(mixed, "mix_id", "text",
          maxTokens = packTokens)
        .select(TextFunctions.md5Hash60(concat_ws(":",
            col("shard").cast("string"), col("pack_id").cast("string")))
            .as("id"),
          col("pack_tokens"), col("n_docs"),
          col("pack_text").as("text")))
    // ---- 7: curriculum order over packs (short-first by mean doc
    //         length; shards auto-sized) -----------------------------
    val (curriculum, tCur) = persisted("7_curriculum", tPack,
      DataSelection.curriculumOrder(
          packed.select(col("id"),
            (col("pack_tokens").cast("double") / col("n_docs"))
              .as("score")),
          "id", "score", nStages = nStages, salt = s"$salt:cur")
        .join(packed, Seq("id")))
    // ---- report ------------------------------------------------------
    // the report reads every stage, so its upstream lineage is the
    // whole token chain (any recomputed stage invalidates it)
    val chain = Seq(tExtract, tRepair, tGate, tDedup, tTiers, tMix,
      tPack, tCur).mkString("|")
    persisted("report", chain, {
      // stage-0 attrition starts from the RAW archive record count
      // (response + conversion records), persisted at extract time —
      // docs_in > docs_out whenever records were skipped (non-HTML
      // content types, non-200 statuses), the yield a data card needs
      val rawRecords =
        lineageField(readFile(rawCountFile), "raw_records").toLong
      val stages = Seq(
        ("0_extract", extract), ("1_repair", repaired),
        ("2_gate", gated), ("3_dedup", deduped), ("4_tiers", tiered),
        ("5_mix", mixed), ("6_pack", packed),
        ("7_curriculum", curriculum))
      val tail = stages.zip(extract +: stages.map(_._2).init).tail.map {
        case ((name, out), in) =>
          in.agg(count(lit(1)).as("docs_in"))
            .crossJoin(out.agg(count(lit(1)).as("docs_out")))
            .select(lit(name).as("stage"), col("docs_in"),
              col("docs_out"))
      }
      val head = extract.agg(count(lit(1)).as("docs_out"))
        .select(lit("0_extract").as("stage"),
          lit(rawRecords).as("docs_in"), col("docs_out"))
      (head +: tail).reduce(_.unionByName(_))
    })._1
  }
}
