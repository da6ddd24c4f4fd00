package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the first stage of every web
  * pipeline (raw crawl HTML precedes all the text operators in this
  * library). Implements the deterministic core of the published
  * extractors (jusText, Pomikálek 2011; trafilatura, Barbaresi 2021;
  * the C4/CCNet pipelines run an equivalent step before any filter):
  * drop invisible elements, flatten block structure to lines, strip
  * tags, decode entities, and remove boilerplate lines by LINK DENSITY
  * — the fraction of a line's visible characters that sit inside
  * anchors (navigation/footer lines are mostly links; body prose is
  * not). Reference: N/A (beyond the reference's surface — LLM-pipeline
  * brief).
  *
  * Not a browser: no CSS visibility, no JS evaluation, and entity
  * decoding covers the named set that dominates real corpora
  * (`&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;`) in one level (no
  * double-decode: `&amp;lt;` yields the literal text `&lt;`).
  *
  * Scale shape: one narrow codegen'd projection — regex passes and
  * per-line array lambdas over each row, ZERO shuffles; the enriched
  * line array is projected once so the filter/join consumers never
  * re-run the per-line regexes (CollapseProject keeps non-cheap
  * expressions single-use). Every step is string/integer-deterministic,
  * so the full output row replicates bit-exactly in external SQL
  * (oracle `q_html_extract`).
  */
object HtmlExtract {

  /** Block-level boundaries → newline. Both open and close forms break
    * a line (a fresh `<p>` implies the previous block ended), and
    * head-level containers are included so title/heading text lands on
    * its own line rather than fusing with body prose.
    */
  private val BlockTagPat =
    "(?i)</?(?:br|p|div|li|h[1-6]|tr|td|th|ul|ol|table|blockquote|" +
      "title|head|body|html|header|footer|nav|section|article|form|" +
      "pre|figure|figcaption|aside|main)\\b[^>]*>"

  /** One invisible element dropped wholesale — content INCLUDED (a
    * `<` or `</p>` inside script text must never reach the tag
    * stripper, which is why element removal precedes everything).
    * Lazy `.*?` with (?is): first matching close tag ends the element.
    */
  private def dropElement(x: Column, tag: String): Column =
    regexp_replace(x, s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>", " ")

  /** Single-level named-entity decode; `&amp;` LAST so an escaped
    * entity (`&amp;lt;`) decodes to its literal text, not to `<`. */
  private def decodeEntities(x: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(x) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }

  /** Visible text of a fragment: strip remaining (inline) tags, decode
    * entities on the SURVIVING text (so decoded `<` is literal text,
    * never a tag), collapse whitespace runs, trim. */
  private def visibleText(x: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(x, "<[^>]*>", "")), "\\s+", " "))

  /** Extract per-doc training text from raw HTML.
    *
    * Returns (id, text, n_lines, n_kept): `n_lines` counts lines with
    * any visible text, `n_kept` those that also pass the link-density
    * cap (`linked_chars <= maxLinkDensity * visible_chars`, boundary
    * kept), and `text` joins the kept lines with `\n` in document
    * order. A line's linked chars sum the visible text of its
    * `<a>…</a>` spans.
    */
  /** `carryCols` ride through unchanged (appended after the output
    * columns) — the passthrough a STREAMING pipeline needs to keep its
    * event-time column across the clean stage (all projections here
    * are narrow, so the operator composes onto streaming Datasets).
    */
  def extractText(docs: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double = 0.5,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      s"maxLinkDensity must be in [0, 1], got $maxLinkDensity")
    // carried names must not collide with the output/internal columns
    // of this operator — fail at the API boundary, not as an ambiguous
    // AnalysisException (or a silent shadow) deep in the chained plan
    val reserved = Set("id", "text", "n_lines", "n_kept", "__ls", "__ne")
    val clash = carryCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"extractText: carryCols ${clash.mkString(", ")} collide with " +
        s"output/internal columns (${reserved.mkString(", ")}) — " +
        "rename them upstream")
    val html = coalesce(col(htmlCol), lit(""))
    val noHidden = dropElement(dropElement(
      regexp_replace(html, "(?s)<!--.*?-->", " "), "script"), "style")
    val norm = regexp_replace(noHidden, BlockTagPat, "\n")
    // the regex-heavy work happens HERE, once per line; downstream
    // consumers see only the struct fields
    val enriched = transform(split(norm, "\n", -1), l => {
      val vis = visibleText(l)
      val anchors = regexp_extract_all(l,
        lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1))
      struct(vis.as("t"), length(vis).as("n"),
        aggregate(transform(anchors, a => length(visibleText(a))),
          lit(0), (acc, n) => acc + n).as("ln"))
    })
    val dens = (e: Column) =>
      e("ln").cast("double") <= lit(maxLinkDensity) * e("n").cast("double")
    val carry = carryCols.map(col)
    docs
      .select(col(idCol).cast("long").as("id") +: enriched.as("__ls")
        +: carry: _*)
      .select(col("id") +: filter(col("__ls"), e => e("n") > 0).as("__ne")
        +: carry: _*)
      .select(col("id") +: col("__ne") +: filter(col("__ne"), dens)
        .as("__kept") +: carry: _*)
      .select(col("id")
        +: array_join(transform(col("__kept"), e => e("t")), "\n").as("text")
        +: size(col("__ne")).cast("long").as("n_lines")
        +: size(col("__kept")).cast("long").as("n_kept")
        +: carry: _*)
  }
}
