package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, UrlFunctions}

/** Domain-level web-corpus accounting and URL blocklist filtering — the
  * RefinedWeb-style "URL filtering" stage (Penedo et al. 2023 §3.1)
  * that runs BEFORE any content-based signal: a crawl is triaged by
  * registered domain first because the domain is the cheapest, most
  * predictive quality key a pipeline owns. Reference: N/A (beyond the
  * reference's surface — LLM-pipeline brief).
  *
  * Scale shapes:
  *   - [[domainReport]] is one keyed aggregation on the extracted
  *     domain (map-side partial collapse first, so the shuffle carries
  *     distinct domains — web corpora have ~10^7 domains against 10^10
  *     docs); every other column derives from the aggregate row.
  *   - [[blocklistVerdicts]] never runs a pattern match per (doc,
  *     block-entry) pair: each doc's domain expands to its ≤`maxLabels`
  *     parent suffixes (a bounded per-row array), which meet the
  *     blocklist in ONE equi-join on the suffix string — AQE broadcasts
  *     real blocklists (10^4–10^6 rows), and the corpus never shuffles
  *     on anything wider than the bounded suffix explode. The verdict
  *     regroup keys on the doc id.
  */
object WebCorpus {

  /** Per-domain corpus accounting: (domain, n_docs, n_tokens,
    * n_empty, mean_tokens) — the table a crawl owner reads first.
    * Docs whose `urlCol` is not a URL (null domain) group under the
    * empty string so the report still closes over the corpus. Counts
    * are exact integers; `mean_tokens` is the single sum/count
    * division (correctly-rounded IEEE — bit-exact cross-engine).
    */
  def domainReport(docs: DataFrame, urlCol: String, textCol: String)
      : DataFrame =
    docs
      .select(
        coalesce(UrlFunctions.domain(col(urlCol)), lit("")).as("domain"),
        TextFunctions.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long").as("__n"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        sum(when(col("__n") === 0, 1L).otherwise(0L)).as("n_empty"))
      .withColumn("mean_tokens",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))

  /** All dot-suffixes of a domain with at least two labels, up to
    * `maxLabels` labels — the match keys for a suffix blocklist
    * ("example.com" blocks "api.example.com"). "a.b.c.d" →
    * ["c.d", "b.c.d", "a.b.c.d"]. Bounded per row; empty for
    * single-label or null domains.
    */
  private def domainSuffixes(domain: org.apache.spark.sql.Column,
      maxLabels: Int) = {
    val labels = split(domain, "\\.")
    filter(
      transform(sequence(lit(2), lit(maxLabels)),
        k => when(size(labels) >= k,
          array_join(slice(labels, size(labels) - k + 1, k), "."))),
      s => s.isNotNull)
  }

  /** Per-doc blocklist verdict: (id, domain, blocked) — blocked iff the
    * doc's domain or ANY parent suffix (≥2 labels, ≤ maxLabels) equals
    * a blocklist entry. `blocklist` is a one-column frame of lowercase
    * suffix entries (`domainCol`); entries match exactly — no globs, so
    * the whole check is equi-joinable. Docs with unparseable URLs get
    * domain "" and are never blocked (triage them via [[domainReport]]
    * instead). Report-then-filter: the caller keeps `!blocked`.
    */
  def blocklistVerdicts(docs: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain",
      maxLabels: Int = 6): DataFrame = {
    require(maxLabels >= 2, s"maxLabels must be >= 2, got $maxLabels")
    val base = docs.select(col(idCol).cast("long").as("id"),
      coalesce(UrlFunctions.domain(col(urlCol)), lit("")).as("domain"))
    // no distinct: the left-semi probe ignores right-side duplicates,
    // so deduping the list would only buy an extra shuffle
    val bl = blocklist.select(col(domainCol).cast("string").as("__suffix"))
    // the exact domain always participates, even past maxLabels labels
    val cands = array_distinct(concat(
      domainSuffixes(col("domain"), maxLabels),
      filter(array(col("domain")),
        d => size(split(d, "\\.")) >= 2)))
    val hits = base
      .select(col("id"), explode(cands).as("__suffix"))
      .join(bl, Seq("__suffix"), "left_semi")
      .select(col("id")).distinct()
      .withColumn("blocked", lit(true))
    base.join(hits, Seq("id"), "left")
      .select(col("id"), col("domain"),
        coalesce(col("blocked"), lit(false)).as("blocked"))
  }

  /** Blocklist DERIVATION from content signals — how production URL
    * blocklists are actually built (RefinedWeb §3.1 scores domains from
    * word-list hits before any model sees the text): per domain, the
    * fraction of docs matching the bad-word list
    * ([[CorpusPrep.badWordsReport]] semantics), with the block verdict
    *
    *   blocked ⇔ n_docs ≥ minDocs ∧ flagged_frac > maxBadFrac
    *
    * (small domains are never auto-blocked — one flagged doc on a
    * 2-doc domain is noise, on a 1000-doc domain it's a signal).
    * Returns (domain, n_docs, n_flagged, flagged_frac, blocked); feed
    * the blocked rows to [[blocklistVerdicts]] as the list. Docs with
    * unparseable URLs aggregate under "" like [[domainReport]].
    *
    * Scale shape: the bad-word scan is the narrow zero-shuffle pass,
    * then ONE domain-keyed aggregation (map-side partial; the shuffle
    * carries distinct domains). `flagged_frac` is a single division of
    * exact counts — the whole row, verdict included, replicates
    * bit-exactly in the q_auto_blocklist oracle.
    */
  /** Per-domain quota capping — the frequency-cap every crawl pipeline
    * applies so mega-domains (forums, wikis, link farms) cannot
    * dominate the training mix (RefinedWeb and Gopher both cap
    * per-source contributions). Keeps a DETERMINISTIC sample of at
    * most `cap` docs per domain: the docs whose md5-60(salt:id) hashes
    * are the domain's smallest — a pure function of (id, salt), stable
    * across runs, partitionings, and corpus growth order. Returns
    * (domain, rank, id) for the kept docs; join back on id for the
    * surviving rows. Unparseable URLs share the `""` domain bucket
    * (capped as one group, same as [[domainReport]]).
    *
    * Scale shape: [[CorpusAnalysis.stratifiedSampleN]]'s bounded
    * smallest-k aggregation keyed by domain — ONE map-side-partial
    * shuffle carrying (domain, hash, id) triples, no window sort, no
    * skew cliff on mega-domains (each group's state is ≤ cap rows).
    */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
      cap: Int, salt: String = "graft"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    CorpusAnalysis.stratifiedSampleN(
      docs.select(col(idCol),
        coalesce(UrlFunctions.domain(col(urlCol)), lit(""))
          .as("__domain")),
      idCol, "__domain", cap, salt)
      .select(col("__domain").as("domain"), col("rank"), col("id"))
  }

  def autoBlocklist(docs: DataFrame, urlCol: String, textCol: String,
      badWords: Seq[String], minDocs: Long = 10L,
      maxBadFrac: Double = 0.1): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    require(maxBadFrac >= 0.0 && maxBadFrac < 1.0,
      s"maxBadFrac must be in [0, 1), got $maxBadFrac")
    val flagged = CorpusPrep.badWordsReport(
      docs.select(
        coalesce(UrlFunctions.domain(col(urlCol)), lit("")).as("__dom"),
        col(textCol)),
      "__dom", textCol, badWords)
    flagged
      .groupBy(col("id").as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 0L).otherwise(1L)).as("n_flagged"))
      .withColumn("flagged_frac",
        col("n_flagged").cast("double") / col("n_docs").cast("double"))
      .withColumn("blocked",
        col("n_docs") >= minDocs && col("flagged_frac") > maxBadFrac)
  }
}
