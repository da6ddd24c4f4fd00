package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level text-quality analysis for training-data pipelines:
  * within-document repetition signals (the Gopher-style filters of Rae
  * et al. 2021, "Scaling Language Models", table A1) and train/test
  * decontamination via n-gram overlap (the standard "13-gram collision"
  * check of GPT-3/PaLM appendices, parameterized n).
  *
  * 100 TB shape: both operators explode n-grams and aggregate on keyed
  * shuffles — never a per-row O(tokens²) HOF lambda (a doc's gram
  * frequencies via `transform(distinct, g -> size(filter(...)))` would
  * square on 10k-token docs) and never a cartesian join (contamination
  * candidates meet on the gram hash, so only docs sharing a gram ever
  * pair).
  */
object CorpusAnalysis {

  /** Within-doc repetition fractions per n-gram size: for each doc and
    * each n in `ns`,
    *   - top-n-gram fraction: occurrences of the most frequent n-gram /
    *     total n-grams;
    *   - duplicate-n-gram fraction: occurrences belonging to n-grams
    *     seen more than once / total n-grams.
    * Docs with fewer than n tokens score 0.0 for that n (nothing is
    * repeated). Output: (id, top2gram_frac, dup2gram_frac, ...) one row
    * per input doc.
    *
    * Two keyed aggregations: (id, n, gram) counts — duplicates collapse
    * map-side — then a conditional-aggregate pivot back to one row per
    * doc. Shuffle volume is bounded by the DISTINCT grams per doc, not
    * tokens².
    */
  def repetitionScores(docs: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__text"))
    // grams shuffle as 60-bit md5-derived ints, not strings: the count
    // key is (id, n, 8-byte hash) regardless of gram length. Identity
    // only feeds COUNTING, so a (negligible, deterministic) hash
    // collision shifts a count identically in any engine replicating
    // the same md5 derivation.
    // explode_OUTER + a null filter on the generated attribute, not
    // plain explode: InferFiltersFromGenerate would inject
    // size(expr)>0 AND isnotnull(expr) below the Generate and predicate
    // pushdown substitutes the full gram expression into the filter —
    // evaluating the n-gram pipeline 3x per row. The rule skips outer
    // generators; the cheap attribute filter restores the semantics.
    val grams = ns.map { n =>
      base.select(col("id"), lit(n).as("n"),
        explode_outer(transform(TextFunctions.ngrams(col("__text"), n),
          g => TextFunctions.md5Hash60(g))).as("gh"))
    }.reduce(_ unionByName _).filter(col("gh").isNotNull)
    val counts = grams.groupBy(col("id"), col("n"), col("gh"))
      .agg(count(lit(1)).as("c"))
    val perN = counts.groupBy(col("id"), col("n")).agg(
      sum(col("c")).as("total"),
      max(col("c")).as("top"),
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"))
    val aggs = ns.flatMap { n =>
      Seq(
        coalesce(max(when(col("n") === n,
          col("top").cast("double") / col("total"))), lit(0.0))
          .as(s"top${n}gram_frac"),
        coalesce(max(when(col("n") === n,
          col("dup").cast("double") / col("total"))), lit(0.0))
          .as(s"dup${n}gram_frac"))
    }
    val wide = perN.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    // keep every input doc: short docs have no grams at all
    base.select(col("id")).join(wide, Seq("id"), "left")
      .na.fill(0.0)
  }

  /** Train/test decontamination: which corpus docs share at least
    * `minShared` distinct word n-grams with which benchmark docs.
    * Output: (id, bench_id, shared_ngrams, doc_ngrams, overlap_frac)
    * where overlap_frac = shared / the corpus doc's distinct n-grams.
    *
    * Both sides explode DISTINCT n-grams hashed to 60-bit ints
    * (md5-derived — compact shuffle keys, engine-replicable), meet on a
    * keyed equi-join, and aggregate per (corpus doc, bench doc) pair:
    * candidate pairs are proportional to real collisions, never
    * |corpus| × |bench|. At 100 TB the bench side is small — Spark/AQE
    * broadcasts it and the corpus side never shuffles.
    */
  def contamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Int = 1): DataFrame = {
    // doc_ngrams is a narrow per-row size() computed in the SAME scan
    // that explodes the grams and carried through the join (8 bytes per
    // collision row) — not a second corpus scan + groupBy + keyed join
    // explode_OUTER everywhere (see repetitionScores): the inner-join
    // equi-key drops the null-gh rows of gram-less docs, and the outer
    // generator keeps InferFiltersFromGenerate from re-evaluating the
    // full gram pipeline inside a pushed-down filter.
    val corpusGrams = corpus
      .select(col(idCol).cast("long").as("id"),
        array_distinct(transform(TextFunctions.ngrams(col(textCol), n),
          g => TextFunctions.md5Hash60(g))).as("__ghs"))
      .select(col("id"), size(col("__ghs")).cast("long").as("doc_ngrams"),
        explode_outer(col("__ghs")).as("gh"))
    val benchGrams = bench
      .select(col(idCol).cast("long").as("bench_id"),
        explode_outer(array_distinct(transform(
          TextFunctions.ngrams(col(textCol), n),
          g => TextFunctions.md5Hash60(g)))).as("gh"))
    corpusGrams
      .join(benchGrams, Seq("gh"))
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_ngrams"),
        first(col("doc_ngrams")).as("doc_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .select(col("id"), col("bench_id"), col("shared_ngrams"),
        col("doc_ngrams"),
        (col("shared_ngrams").cast("double") / col("doc_ngrams"))
          .as("overlap_frac"))
  }
}
