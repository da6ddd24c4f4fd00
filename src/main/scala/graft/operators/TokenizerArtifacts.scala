package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer artifacts — the train-once / encode-many
  * lifecycle for all three tokenizer families ([[BpeTokenizer]] merge
  * lists, [[WordPieceTokenizer]] vocabularies, [[UnigramTokenizer]]
  * (piece, cost) tables). Reference: N/A (beyond the reference's
  * surface — LLM-pipeline brief).
  *
  * A production pipeline trains a tokenizer ONCE (a bounded,
  * driver-side table — see the trainers' scale contracts) and then
  * encodes 100 TB of corpus many times, across many sessions; keeping
  * the table as an in-memory return value forces every encode run to
  * re-train or hand-carry it. Each artifact here is a parquet table
  * under `path/table` plus a `_graft_tokenizer_params.json` sidecar
  * (family, row count, and the encode-time parameters baked into the
  * artifact), following the fail-loud sidecar contract
  * [[Dedup.writeNearDupIndex]] established: the sidecar is written
  * LAST, so it doubles as the commit marker — a half-written artifact
  * has no sidecar and every load fails loudly rather than encoding
  * under a truncated vocabulary (which would silently change every
  * token id downstream). Re-writing an EXISTING artifact first deletes
  * the old sidecar, so the no-sidecar-while-uncommitted invariant
  * holds for overwrites too: a crash mid-table-write cannot leave a
  * stale sidecar pointing at a partial new table (where a retrained
  * vocabulary of coincidentally equal size would pass the row-count
  * backstop and silently encode under a mixed artifact). Loads also
  * re-validate the persisted row count against the table; the recorded
  * count is taken from the WRITTEN parquet, not from re-executing the
  * caller's plan — one execution of the training plan per write, and
  * the sidecar always describes exactly what was committed even under
  * a nondeterministic upstream.
  *
  * The `encodeWith*` paths load the table and delegate to the exact
  * in-memory encode functions, so artifact-routed encoding is
  * bit-identical to in-memory encoding by construction (pinned by
  * spec on the oracle fixtures, and the q_bpe_encode / q_wordpiece /
  * q_unigram_encode correctness queries run through a round-trip).
  * Loading collects one vocabulary-sized table to the driver — the
  * same bounded-table contract the trainers already carry; the table
  * then rides to executors as a broadcast inside the encoders.
  */
object TokenizerArtifacts {

  private val Sidecar = "_graft_tokenizer_params.json"

  // ---- BPE ---------------------------------------------------------------

  /** Persist a [[BpeTokenizer.trainBpeMerges]] result — (rank, left,
    * right, cnt) — as an encode-many artifact.
    */
  def writeBpe(merges: DataFrame, path: String): Unit =
    writeBpeImpl(merges, path, crashAfterTableWriteForTest = false)

  /** [[writeBpe]] with a fault-injection hook: when
    * `crashAfterTableWriteForTest` is set, the write throws between
    * the table overwrite and the sidecar write — the crash window the
    * sidecar-last commit contract exists for. Specs use it to pin that
    * an interrupted overwrite leaves NO sidecar (the old one was
    * deleted up front), so every later load fails loudly instead of
    * trusting a stale sidecar against a partial new table.
    */
  private[graft] def writeBpeImpl(merges: DataFrame, path: String,
      crashAfterTableWriteForTest: Boolean): Unit = {
    val cols = Seq("rank", "left", "right", "cnt")
    require(cols.forall(merges.columns.contains),
      s"writeBpe: expected columns $cols, got " +
        merges.columns.mkString("(", ", ", ")"))
    val spark = merges.sparkSession
    deleteSidecar(spark, path)
    val d = merges.select(col("rank").cast("int"), col("left"),
      col("right"), col("cnt").cast("long"))
    d.write.mode("overwrite").parquet(s"$path/table")
    if (crashAfterTableWriteForTest)
      throw new IllegalStateException(
        "writeBpe: injected crash between table write and sidecar")
    // count the COMMITTED table, not the input plan: re-executing the
    // caller's plan would re-run the whole training job and, under a
    // nondeterministic upstream, could bake a count the table doesn't
    // have — bricking every later load
    val written = spark.read.parquet(s"$path/table").count()
    writeSidecar(spark, path,
      Seq("family" -> "bpe", "rows" -> written.toString))
  }

  /** The persisted merge list, rank-ascending — feeds
    * [[BpeTokenizer.applyBpeMerges]] directly.
    */
  def loadBpeMerges(spark: SparkSession,
      path: String): Seq[(String, String)] = {
    val rows = readTable(spark, path, "bpe")
    rows.orderBy(col("rank").asc)
      .select(col("left"), col("right"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
  }

  /** [[BpeTokenizer.applyBpeMerges]] under a persisted merge list. */
  def encodeWithBpe(docs: DataFrame, idCol: String, textCol: String,
      artifactPath: String): DataFrame =
    BpeTokenizer.applyBpeMerges(docs, idCol, textCol,
      loadBpeMerges(docs.sparkSession, artifactPath))

  // ---- WordPiece ---------------------------------------------------------

  /** Persist a WordPiece vocabulary (+ its unknown-token string, an
    * encode-time parameter baked into the artifact so every encode run
    * agrees on it).
    */
  def writeWordPiece(spark: SparkSession, vocab: Seq[String],
      path: String, unk: String = "[UNK]"): Unit = {
    require(vocab.nonEmpty, "writeWordPiece: empty vocab")
    import spark.implicits._
    deleteSidecar(spark, path)
    vocab.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("pos", "piece")
      .write.mode("overwrite").parquet(s"$path/table")
    writeSidecar(spark, path, Seq("family" -> "wordpiece",
      "rows" -> vocab.size.toString, "unk" -> unk))
  }

  /** (vocabulary in written order, unk token). */
  def loadWordPiece(spark: SparkSession,
      path: String): (Seq[String], String) = {
    val rows = readTable(spark, path, "wordpiece")
    val unk = sidecarField(spark, path, "unk")
    (rows.orderBy(col("pos").asc).select(col("piece"))
      .collect().map(_.getString(0)).toSeq, unk)
  }

  /** [[WordPieceTokenizer.encode]] under a persisted vocabulary. */
  def encodeWithWordPiece(docs: DataFrame, idCol: String,
      textCol: String, artifactPath: String): DataFrame = {
    val (vocab, unk) = loadWordPiece(docs.sparkSession, artifactPath)
    WordPieceTokenizer.encode(docs, idCol, textCol, vocab, unk)
  }

  // ---- Unigram -----------------------------------------------------------

  /** Persist a unigram (piece, cost) table (+ the unk fallback cost —
    * part of the scoring objective, so baked into the artifact).
    * Accepts [[UnigramTokenizer.trainUnigram]] output directly (its
    * `cnt` column is informational and not persisted).
    */
  def writeUnigram(spark: SparkSession, vocab: Seq[(String, Long)],
      path: String, unkCost: Long = 1000000L): Unit = {
    require(vocab.nonEmpty, "writeUnigram: empty vocab")
    require(vocab.forall(_._2 >= 0L) && unkCost >= 0L,
      "writeUnigram: costs must be >= 0")
    import spark.implicits._
    deleteSidecar(spark, path)
    vocab.zipWithIndex.map { case ((p, c), i) => (i, p, c) }
      .toDF("pos", "piece", "cost")
      .write.mode("overwrite").parquet(s"$path/table")
    writeSidecar(spark, path, Seq("family" -> "unigram",
      "rows" -> vocab.size.toString, "unkCost" -> unkCost.toString))
  }

  /** ((piece, cost) in written order, unk cost). */
  def loadUnigram(spark: SparkSession,
      path: String): (Seq[(String, Long)], Long) = {
    val rows = readTable(spark, path, "unigram")
    val unkCost = sidecarField(spark, path, "unkCost").toLong
    (rows.orderBy(col("pos").asc).select(col("piece"), col("cost"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      unkCost)
  }

  /** [[UnigramTokenizer.encode]] under a persisted vocabulary. */
  def encodeWithUnigram(docs: DataFrame, idCol: String,
      textCol: String, artifactPath: String): DataFrame = {
    val (vocab, unkCost) = loadUnigram(docs.sparkSession, artifactPath)
    UnigramTokenizer.encode(docs, idCol, textCol, vocab, unkCost)
  }

  // ---- sidecar plumbing --------------------------------------------------

  /** Re-establish the no-sidecar-while-uncommitted invariant before an
    * overwrite: with the old sidecar gone, a crash anywhere before the
    * new sidecar lands leaves an artifact every load rejects.
    */
  private def deleteSidecar(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path, Sidecar)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  private def writeSidecar(spark: SparkSession, path: String,
      fields: Seq[(String, String)]): Unit = {
    val json = fields
      .map { case (k, v) => s"${graft.JsonStr(k)}:${graft.JsonStr(v)}" }
      .mkString("{", ",", "}")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path, Sidecar)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
  }

  private def readSidecarJson(spark: SparkSession,
      path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path, Sidecar)
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"tokenizer artifact at $path has no $Sidecar — not a " +
        "TokenizerArtifacts artifact, or the write never committed " +
        "(the sidecar is written last); re-train and re-write")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Extract one string field from a sidecar written by
    * [[writeSidecar]] (all values pass through [[graft.JsonStr]], so
    * this un-escapes exactly that escaping).
    */
  private def sidecarField(spark: SparkSession, path: String,
      key: String): String = {
    val json = readSidecarJson(spark, path)
    val m = java.util.regex.Pattern
      .compile(graft.JsonStr(key).replace("\\", "\\\\") +
        ":\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(json)
    require(m.find(),
      s"tokenizer artifact at $path: sidecar has no field '$key' " +
        s"(sidecar: $json)")
    unescape(m.group(1))
  }

  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => out += '"'; i += 2
          case '\\' => out += '\\'; i += 2
          case 'n'  => out += '\n'; i += 2
          case 'r'  => out += '\r'; i += 2
          case 't'  => out += '\t'; i += 2
          case 'u'  =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** The artifact's parquet table, after fail-loud validation: sidecar
    * present, family matches, persisted row count matches the table
    * (a partially-written or externally-modified table must not
    * silently encode under a truncated vocabulary).
    */
  private def readTable(spark: SparkSession, path: String,
      family: String): DataFrame = {
    val gotFamily = sidecarField(spark, path, "family")
    require(gotFamily == family,
      s"tokenizer artifact at $path is family '$gotFamily', " +
        s"requested '$family' — point the ${family} encoder at a " +
        s"${family} artifact")
    val rows = spark.read.parquet(s"$path/table")
    val expected = sidecarField(spark, path, "rows").toLong
    val actual = rows.count()
    require(actual == expected,
      s"tokenizer artifact at $path: table has $actual rows, sidecar " +
        s"recorded $expected — the artifact is corrupt; re-write it")
    rows
  }
}
