package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Subtitle files as TRAINING TEXT: SRT and WebVTT are the two
  * dominant caption formats riding alongside web video, and their
  * cue text is exactly the aligned-transcript corpus a speech/video
  * training pipeline wants. Everything here derives from the
  * published grammars: SubRip's numbered blocks with
  * `HH:MM:SS,mmm --> HH:MM:SS,mmm` timings, and the W3C WebVTT
  * grammar (`WEBVTT` magic, NOTE/STYLE/REGION blocks, optional cue
  * identifiers, `HH:MM:SS.mmm` or `MM:SS.mmm` timings with optional
  * cue settings after the arrow line).
  *
  * Honesty contract (the container-walk one): a file that violates
  * its grammar — bad timing arithmetic (minutes/seconds ≥ 60,
  * end < start), a malformed arrow line, a non-numeric SRT index,
  * text before the first cue — emits NO rows; nothing is skipped,
  * repaired, or truncated, because a silently half-parsed transcript
  * skews every downstream token statistic. Time arithmetic is exact
  * integer milliseconds.
  *
  * Design for 100 TB: each file parses independently inside
  * `mapPartitions` (one in memory at a time), cost linear in file
  * size; `maxCues` bounds the per-file row fan-out by REFUSING
  * over-cap files (never truncating a transcript).
  */
object Subtitle {

  /** One cue: `cueIndex` is the 0-based position in the file (NOT
    * SRT's printed counter — that is validated but not trusted as an
    * index), times in exact ms, `text` the cue's lines joined with
    * `\n`.
    */
  case class SubCue(id: Long, cueIndex: Long, startMs: Long,
      endMs: Long, text: String, format: String)

  /** Explode every cue of every payload: UTF-8 bytes (BOM tolerated)
    * through [[parseSrt]] / [[parseVtt]] / [[parseAss]] by sniff —
    * `WEBVTT` magic → VTT, `[Script Info]` → ASS, else SRT.
    * Unparseable files emit nothing.
    */
  def subtitleCues(df: DataFrame, idCol: String, binCol: String,
      maxCues: Int = 100000): DataFrame = {
    require(maxCues > 0, "maxCues must be positive")
    implicit val enc = Encoders.product[SubCue]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          cuesOf(r.getAs[Array[Byte]](1), maxCues) match {
            case Some((fmt, cues)) => cues.zipWithIndex.map {
              case ((s, e, t), i) => SubCue(id, i.toLong, s, e, t, fmt)
            }
            case None => Nil
          }
        }
    }.toDF().select(col("id"), col("cueIndex").as("cue_index"),
      col("startMs").as("start_ms"), col("endMs").as("end_ms"),
      col("text"), col("format"))
  }

  /** Per-file transcript statistics — the curation projection: cue
    * census, exact span/speech milliseconds, character and
    * whitespace-word totals over the cue text.
    */
  def subtitleStats(df: DataFrame, idCol: String, binCol: String,
      maxCues: Int = 100000): DataFrame = {
    val cues = subtitleCues(df, idCol, binCol, maxCues)
    cues.groupBy(col("id"), col("format")).agg(
      count(lit(1)).as("n_cues"),
      min(col("start_ms")).as("first_start_ms"),
      max(col("end_ms")).as("last_end_ms"),
      sum(col("end_ms") - col("start_ms")).as("speech_ms"),
      sum(length(col("text")).cast("long")).as("chars"),
      sum(size(split(col("text"), "[\\s]+")).cast("long")).as("words"))
  }

  // ---- imperative internals -------------------------------------------

  private def cuesOf(bytes: Array[Byte], maxCues: Int)
      : Option[(String, Vector[(Long, Long, String)])] = {
    if (bytes == null || bytes.length == 0) return None
    var off = 0
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF) off = 3
    val s = new String(bytes, off, bytes.length - off, "UTF-8")
    val r =
      if (s.startsWith("WEBVTT")) parseVtt(s).map(("vtt", _))
      else if (s.startsWith("[Script Info]")) parseAss(s).map(("ass", _))
      else parseSrt(s).map(("srt", _))
    r.filter(_._2.length <= maxCues)
  }

  private def lines(s: String): Array[String] =
    s.split("\r\n|\n|\r", -1)

  /** `HH:MM:SS<sep>mmm` → exact ms; None on any malformed field.
    * WebVTT also allows the hour field to be absent or >2 digits;
    * SRT requires all three fields.
    */
  private def timeMs(t: String, sep: Char,
      hoursOptional: Boolean): Option[Long] = {
    val parts = t.split(':')
    val (hh, mm, rest) = parts.length match {
      case 3 => (parts(0), parts(1), parts(2))
      case 2 if hoursOptional => ("0", parts(0), parts(1))
      case _ => return None
    }
    val di = rest.indexOf(sep)
    if (di < 0) return None
    val ss = rest.substring(0, di)
    val mmm = rest.substring(di + 1)
    def num(v: String, minLen: Int, maxLen: Int): Option[Long] =
      if (v.length < minLen || v.length > maxLen ||
        !v.forall(c => c >= '0' && c <= '9')) None
      else Some(v.toLong)
    for {
      h <- num(hh, if (hoursOptional) 1 else 2, 9)
      m <- num(mm, 2, 2) if m < 60
      sec <- num(ss, 2, 2) if sec < 60
      ms <- num(mmm, 3, 3)
    } yield ((h * 60 + m) * 60 + sec) * 1000 + ms
  }

  /** The cue timing line: `start --> end[ settings]`. */
  private def arrow(line: String, sep: Char, hoursOptional: Boolean)
      : Option[(Long, Long)] = {
    val ai = line.indexOf("-->")
    if (ai < 0) return None
    val startStr = line.substring(0, ai).trim
    var endStr = line.substring(ai + 3).trim
    // WebVTT cue settings follow the end time after whitespace
    val sp = endStr.indexWhere(c => c == ' ' || c == '\t')
    if (sp >= 0) {
      if (!hoursOptional) return None // SRT has no settings
      endStr = endStr.substring(0, sp)
    }
    for {
      st <- timeMs(startStr, sep, hoursOptional)
      en <- timeMs(endStr, sep, hoursOptional) if en >= st
    } yield (st, en)
  }

  /** SubRip: blank-line-separated blocks of
    * `counter / timing / text+`. The printed counter must be a
    * positive integer (its VALUE is validated as numeric but cue
    * order is positional). None on any malformed block.
    */
  private[graft] def parseSrt(
      s: String): Option[Vector[(Long, Long, String)]] = {
    val ls = lines(s)
    val out = Vector.newBuilder[(Long, Long, String)]
    var i = 0
    while (i < ls.length) {
      while (i < ls.length && ls(i).trim.isEmpty) i += 1
      if (i >= ls.length) return Some(out.result())
      // counter line
      val counter = ls(i).trim
      if (counter.isEmpty || counter.length > 9 ||
        !counter.forall(c => c >= '0' && c <= '9') ||
        counter.toLong <= 0L) return None
      i += 1
      if (i >= ls.length) return None
      val (st, en) = arrow(ls(i), ',', hoursOptional = false)
        .getOrElse(return None)
      i += 1
      val text = Vector.newBuilder[String]
      while (i < ls.length && ls(i).trim.nonEmpty) {
        text += ls(i)
        i += 1
      }
      val t = text.result()
      if (t.isEmpty) return None // a cue with no text is malformed
      out += ((st, en, t.mkString("\n")))
    }
    Some(out.result())
  }

  /** WebVTT: `WEBVTT` header block, then cue / NOTE / STYLE / REGION
    * blocks. Cues may carry an identifier line (any line without
    * `-->`); NOTE/STYLE/REGION blocks are skipped whole. None on a
    * malformed timing line or a cue whose identifier is followed by
    * a non-timing line.
    */
  private[graft] def parseVtt(
      s: String): Option[Vector[(Long, Long, String)]] = {
    val ls = lines(s)
    if (ls.isEmpty) return None
    val h = ls(0)
    if (h != "WEBVTT" && !h.startsWith("WEBVTT ") &&
      !h.startsWith("WEBVTT\t")) return None
    var i = 1
    // header block: anything up to the first blank line
    while (i < ls.length && ls(i).trim.nonEmpty) i += 1
    val out = Vector.newBuilder[(Long, Long, String)]
    while (i < ls.length) {
      while (i < ls.length && ls(i).trim.isEmpty) i += 1
      if (i >= ls.length) return Some(out.result())
      val first = ls(i)
      if (first.startsWith("NOTE") || first.startsWith("STYLE") ||
        first.startsWith("REGION")) {
        while (i < ls.length && ls(i).trim.nonEmpty) i += 1
      } else {
        var timing = first
        if (!timing.contains("-->")) { // cue identifier line
          i += 1
          if (i >= ls.length) return None
          timing = ls(i)
        }
        val (st, en) = arrow(timing, '.', hoursOptional = true)
          .getOrElse(return None)
        i += 1
        val text = Vector.newBuilder[String]
        while (i < ls.length && ls(i).trim.nonEmpty) {
          text += ls(i)
          i += 1
        }
        val t = text.result()
        if (t.isEmpty) return None
        out += ((st, en, t.mkString("\n")))
      }
    }
    Some(out.result())
  }

  /** Advanced SubStation Alpha (ASS/SSA v4+): `[Script Info]` header,
    * an `[Events]` section whose `Format:` line DECLARES the field
    * order (Start/End/Text positions are read from it, not assumed),
    * `Dialogue:` lines split into exactly that many fields (commas
    * inside the final Text field survive), `H:MM:SS.cc` centisecond
    * times. The emitted text is the published plain-text transform:
    * `{...}` override blocks stripped, `\N`/`\n` → newline, `\h` →
    * space. Comment/Picture/Sound/Movie/Command event lines are
    * skipped whole. None on a missing/malformed Format line, a
    * Dialogue line with too few fields, bad time arithmetic, or a
    * Dialogue before the Format declaration.
    */
  private[graft] def parseAss(
      s: String): Option[Vector[(Long, Long, String)]] = {
    val ls = lines(s)
    var inEvents = false
    var startIdx = -1; var endIdx = -1; var textIdx = -1; var nFields = 0
    val out = Vector.newBuilder[(Long, Long, String)]
    var i = 0
    while (i < ls.length) {
      val line = ls(i).trim
      if (line.startsWith("[")) {
        inEvents = line.equalsIgnoreCase("[Events]")
      } else if (inEvents && line.startsWith("Format:")) {
        val fields = line.substring(7).split(",").map(_.trim)
        nFields = fields.length
        startIdx = fields.indexWhere(_.equalsIgnoreCase("Start"))
        endIdx = fields.indexWhere(_.equalsIgnoreCase("End"))
        textIdx = fields.indexWhere(_.equalsIgnoreCase("Text"))
        if (startIdx < 0 || endIdx < 0 || textIdx != nFields - 1)
          return None // Text must be last (it may contain commas)
      } else if (inEvents && line.startsWith("Dialogue:")) {
        if (nFields == 0) return None // Dialogue before Format
        val body = line.substring(9).dropWhile(_ == ' ')
        val parts = body.split(",", nFields)
        if (parts.length < nFields) return None
        val st = assTimeMs(parts(startIdx).trim).getOrElse(return None)
        val en = assTimeMs(parts(endIdx).trim).getOrElse(return None)
        if (en < st) return None
        out += ((st, en, assPlainText(parts(textIdx))))
      }
      i += 1
    }
    if (nFields == 0) return None // no [Events] Format at all
    Some(out.result())
  }

  /** `H:MM:SS.cc` (centiseconds) → ms; None on malformed fields. */
  private def assTimeMs(t: String): Option[Long] = {
    val parts = t.split(':')
    if (parts.length != 3) return None
    val di = parts(2).indexOf('.')
    if (di < 0) return None
    val ss = parts(2).substring(0, di)
    val cc = parts(2).substring(di + 1)
    def num(v: String, minLen: Int, maxLen: Int): Option[Long] =
      if (v.length < minLen || v.length > maxLen ||
        !v.forall(c => c >= '0' && c <= '9')) None
      else Some(v.toLong)
    for {
      h <- num(parts(0), 1, 9)
      m <- num(parts(1), 2, 2) if m < 60
      sec <- num(ss, 2, 2) if sec < 60
      c <- num(cc, 2, 2)
    } yield ((h * 60 + m) * 60 + sec) * 1000 + c * 10
  }

  /** The ASS plain-text transform: strip `{...}` override blocks,
    * `\N`/`\n` → newline, `\h` → non-breaking-space-as-space.
    */
  private[graft] def assPlainText(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '{') {
        val close = raw.indexOf('}', i + 1)
        if (close < 0) { sb.append(c); i += 1 } // unclosed: literal
        else i = close + 1
      } else if (c == '\\' && i + 1 < raw.length &&
        (raw.charAt(i + 1) == 'N' || raw.charAt(i + 1) == 'n')) {
        sb.append('\n'); i += 2
      } else if (c == '\\' && i + 1 < raw.length &&
        raw.charAt(i + 1) == 'h') {
        sb.append(' '); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- encoders (round-trip twins; also the fixture builders) ---------

  /** Build an ASS file: Script Info header, a V4+ Styles stub, and an
    * Events section in the CANONICAL field order. Cue text is written
    * raw (callers may include `{\b1}`-style override tags and `\N`
    * line breaks to exercise the plain-text transform).
    */
  def buildAss(cues: Seq[(Long, Long, String)],
      style: String = "Default"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("[Script Info]\nTitle: graft fixture\nScriptType: v4.00+\n\n")
    sb.append("[V4+ Styles]\n")
    sb.append("Format: Name, Fontname, Fontsize\n")
    sb.append(s"Style: $style,Arial,20\n\n")
    sb.append("[Events]\n")
    sb.append("Format: Layer, Start, End, Style, Name, MarginL, " +
      "MarginR, MarginV, Effect, Text\n")
    cues.foreach { case (st, en, t) =>
      require(st >= 0 && en >= st, "cue times must be ordered")
      require(st % 10 == 0 && en % 10 == 0,
        "ASS times are centisecond-precise; ms must be multiples of 10")
      require(t.nonEmpty, "cue text must be non-empty")
      sb.append("Dialogue: 0,").append(fmtAssTime(st)).append(',')
        .append(fmtAssTime(en)).append(',').append(style)
        .append(",,0,0,0,,").append(t).append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }

  private def fmtAssTime(ms: Long): String = {
    val h = ms / 3600000L
    val m = (ms / 60000L) % 60L
    val s = (ms / 1000L) % 60L
    val cc = (ms % 1000L) / 10L
    f"$h%d:$m%02d:$s%02d.$cc%02d"
  }

  /** Build a SubRip file from (startMs, endMs, text) cues. */
  def buildSrt(cues: Seq[(Long, Long, String)]): Array[Byte] = {
    val sb = new StringBuilder
    cues.zipWithIndex.foreach { case ((st, en, t), i) =>
      require(st >= 0 && en >= st, "cue times must be ordered")
      require(t.nonEmpty, "cue text must be non-empty")
      if (i > 0) sb.append("\n")
      sb.append(i + 1).append("\n")
      sb.append(fmtTime(st, ',')).append(" --> ")
        .append(fmtTime(en, ',')).append("\n")
      sb.append(t).append("\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** Build a WebVTT file; `withIds` adds an identifier line per cue,
    * `settings` appends a cue-settings string after the end time.
    */
  def buildVtt(cues: Seq[(Long, Long, String)],
      withIds: Boolean = false, settings: String = "",
      note: String = ""): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WEBVTT\n")
    if (note.nonEmpty) sb.append("\nNOTE ").append(note).append("\n")
    cues.zipWithIndex.foreach { case ((st, en, t), i) =>
      require(st >= 0 && en >= st, "cue times must be ordered")
      require(t.nonEmpty, "cue text must be non-empty")
      sb.append("\n")
      if (withIds) sb.append("cue-").append(i + 1).append("\n")
      sb.append(fmtTime(st, '.')).append(" --> ")
        .append(fmtTime(en, '.'))
      if (settings.nonEmpty) sb.append(' ').append(settings)
      sb.append("\n").append(t).append("\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  private def fmtTime(ms: Long, sep: Char): String = {
    val h = ms / 3600000L
    val m = (ms / 60000L) % 60L
    val s = (ms / 1000L) % 60L
    val f = ms % 1000L
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }
}
