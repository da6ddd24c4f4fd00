package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BPE tokenizer TRAINING and encoding (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" §3.2) — the
  * learned-merges complement of the one-step pair statistic
  * [[CorpusAnalysis.bpePairs]]. Reference: N/A (beyond the reference's
  * surface — LLM-pipeline brief).
  *
  * The scale design follows the paper's own observation: BPE trains on
  * the WORD-FREQUENCY table, not the corpus. One corpus pass builds
  * (word, cnt) — distinct-word-sized, the quantity that stays bounded
  * while the corpus grows — and every one of the `numMerges`
  * iterations is (a) one vocabulary-sized pair aggregation with a
  * single argmax row to the driver and (b) one NARROW greedy-merge
  * rewrite of the symbol arrays. The corpus is never touched again;
  * encoding is likewise vocabulary-side (merge the distinct words,
  * then one hash join maps every corpus token through the finished
  * word → subwords table).
  *
  * Determinism: the winning pair tie-breaks (count DESC, left ASC,
  * right ASC) and the greedy rewrite merges left-to-right
  * non-overlapping — both engine-replicable, so the whole learned
  * merge table (and therefore every encoding) is bit-exact in the
  * q_bpe_train / q_bpe_encode DuckDB oracles, which replay the
  * identical iterations as chained SQL stages.
  *
  * Lineage: each iteration's rewrite adds one fold layer, so the words
  * frame is localCheckpoint'ed (eager, GC-cleaned — see
  * [[DataSelection.selectTopNByScore]] for why not persist) every
  * `checkpointEvery` merges to keep plan depth bounded.
  */
object BpeTokenizer {

  /** End-of-word marker — a separate terminal symbol (the paper's
    * variant that lets merges distinguish word-final subwords).
    */
  val EndOfWord = "</w>"

  /** (word, cnt) from one tokenize pass — distinct-word-sized. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: its characters plus the
    * end-of-word marker. Codepoint-based in both engines.
    */
  private def initialSyms(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** One greedy left-to-right non-overlapping merge of the adjacent
    * pair (l, r) inside a symbol array — the paper's replacement rule
    * ([a,a,a,a] with (a,a) → [aa,aa], NOT [aa,a,a]); a fixed-order
    * fold, so engine-replicable.
    */
  private def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts of the current symbol table, weighted by
    * word frequency: (l, r, c) — at most (symbol vocabulary)² rows,
    * aggregated with a map-side partial.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(arrays_zip(
        slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
        slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0)))))
        .as("__p"))
      .groupBy(col("__p.0").as("l"), col("__p.1").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** The trained merge table: (rank, left, right, cnt) for `numMerges`
    * iterations (fewer if the pair space exhausts first). One corpus
    * tokenize pass; each iteration is one bounded aggregation + one
    * narrow rewrite of the distinct-word table.
    */
  def trainBpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 8): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = docs.sparkSession
    var words = wordFrequencies(docs, textCol)
      .select(col("word"), col("cnt"), initialSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    var i = 0
    while (i < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((merges.size + 1, l, r, c))
        words = words.withColumn("syms", mergePair(col("syms"), l, r))
        if ((i + 1) % checkpointEvery == 0) words = words.localCheckpoint(true)
      }
      i += 1
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "cnt")
  }

  /** word → merged symbol array after applying `merges` in rank
    * order — the finished tokenizer's lookup table, built from any
    * corpus's distinct words.
    */
  private def encodeWordTable(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)], checkpointEvery: Int): DataFrame = {
    var words = wordFrequencies(docs, textCol)
      .select(col("word"), initialSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      words = words.withColumn("syms", mergePair(col("syms"), l, r))
      if ((i + 1) % checkpointEvery == 0) words = words.localCheckpoint(true)
    }
    words
  }

  /** Encode every doc with a learned merge list: (id, n_words,
    * n_subwords, bpe_tokens) where bpe_tokens is the flattened subword
    * sequence in token order. Vocabulary-side merging + ONE join: the
    * corpus tokens meet the word → subwords table on the 60-bit word
    * hash (8-byte keys; AQE broadcasts small vocabularies), then one
    * per-doc regroup keyed by the doc id restores order positionally.
    * Docs with no tokens are EXCLUDED (same contract as the scoring
    * operators).
    */
  def applyBpeMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    TopK.requireIntegral(docs, idCol, "applyBpeMerges")
    val table = encodeWordTable(docs, textCol, merges, checkpointEvery)
      .select(TextFunctions.md5Hash60(col("word")).as("wh"), col("syms"))
    docs
      .select(col(idCol).cast("long").as("id"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .select(col("id"), col("pos"),
        TextFunctions.md5Hash60(col("col")).as("wh"))
      .join(table, Seq("wh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sort_array(collect_list(struct(col("pos"), col("syms")))).as("__ps"))
      .select(col("id"), col("n_words"),
        flatten(col("__ps.syms")).as("bpe_tokens"))
      .select(col("id"), col("n_words"),
        size(col("bpe_tokens")).cast("long").as("n_subwords"),
        col("bpe_tokens"))
  }
}
