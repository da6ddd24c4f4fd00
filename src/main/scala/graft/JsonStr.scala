package graft

/** JSON string literal (quote + escape) — the ONE escaping used by the
  * Bench output line and the sidecar files CorpusAnalysis writes, so
  * the two formats cannot drift.
  */
private[graft] object JsonStr {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
