package graft.operators

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding repair — the ftfy-style cleanup pass every web corpus needs
  * (Speer 2019, "ftfy: fixes text for you"; the CCNet/C4 pipelines
  * normalize encodings before any quality signal is computed). The
  * dominant real-world damage is UTF-8 bytes decoded as
  * Latin-1/Windows-1252 ("mojibake": `Ã©` where `é` was meant, `â€™`
  * for a right quote), plus U+FFFD replacement characters and stray C0
  * controls left by lossy decoders. Reference: N/A (beyond the
  * reference's surface — LLM-pipeline brief).
  *
  * This is deliberately NOT a general transcoder: repair applies a
  * bounded table of the COMMON damaged sequences (the high-frequency
  * subset of ftfy's fixes — curly punctuation, Latin-1 letters, €,
  * guillemets), one pass, longest sequences first so a 3-char sequence
  * is never half-eaten by a 2-char rule. Double-encoded text (mojibake
  * of mojibake) repairs one level per application. Everything is plain
  * string replacement and character-class regex — deterministic, so
  * the full output row replicates bit-exactly in external SQL (oracle
  * `q_mojibake`, which interpolates THIS table into its replace
  * chain).
  *
  * Scale shape: one narrow codegen'd projection per row — a bounded
  * chain of `replace`/`regexp_replace`, ZERO shuffles.
  */
object TextRepair {

  /** The damaged form of `s`: its UTF-8 bytes re-decoded as cp1252 —
    * the exact transformation broken pipelines apply. Computed from
    * the charsets (not typed literals) so every table entry is
    * byte-correct by construction.
    */
  private[graft] def damaged(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8),
      Charset.forName("windows-1252"))

  /** (damaged, intended), longest damaged sequences first (the
    * punctuation rows are 3 chars, the letter/symbol rows 2) so a
    * prefix rule never half-eats a longer sequence. Characters whose
    * UTF-8 tail bytes hit cp1252's five UNDEFINED positions (e.g. `”`,
    * 0x9D) are excluded — their damaged form is decoder-dependent, so
    * repairing them deterministically is not possible at this level.
    * NBSP's damaged form repairs to a plain space (the ftfy default
    * for web text).
    */
  val MojibakeTable: Seq[(String, String)] =
    Seq("’", "“", "–", "—", "…", "€")
      .map(c => damaged(c) -> c) ++
    "áéíóúñäöüßçèêàâîôûïë«»°".map(c => damaged(c.toString) -> c.toString) :+
    (damaged("\u00A0") -> " ")

  /** C0 controls except tab/LF/CR, plus DEL — text that survives a
    * decoder as these is never intentional. */
  private val CtrlPat = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  private def occurrences(x: Column, seq: String): Column =
    ((length(x) - length(replace(x, lit(seq), lit("")))) / seq.length)
      .cast("long")

  /** Per-doc encoding-damage report + repaired text.
    *
    * Returns (id, mojibake_hits, n_bad_chars, text, changed):
    * `mojibake_hits` counts damaged-sequence occurrences in the INPUT
    * (so the signal survives the repair), `n_bad_chars` counts U+FFFD
    * + stray controls, `text` is the repaired and stripped result, and
    * `changed` flags rows the pass rewrote — a pipeline can filter on
    * it or aggregate it as a corpus-health metric.
    */
  def repairReport(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    docs
      // hoist the input ONCE: every count and the repair chain reads
      // the same projected column
      .select(col(idCol).cast("long").as("id"), raw.as("__t"))
      .select(col("id"), col("__t"),
        MojibakeTable.map(e => occurrences(col("__t"), e._1))
          .reduce(_ + _).as("mojibake_hits"),
        (occurrences(col("__t"), "�") +
          regexp_count(col("__t"), lit(CtrlPat)).cast("long"))
          .as("n_bad_chars"),
        regexp_replace(
          MojibakeTable.foldLeft(col("__t")) { case (c, (d, r)) =>
            replace(c, lit(d), lit(r))
          }, "�|" + CtrlPat, "").as("__fixed"))
      .select(col("id"), col("mojibake_hits"), col("n_bad_chars"),
        col("__fixed").as("text"),
        (col("__fixed") =!= col("__t")).as("changed"))
  }
}
