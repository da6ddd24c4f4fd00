package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** ONE tag scan over a MIXED audio corpus — the audio counterpart of
  * [[Multimodal.exifScanAuto]]: title/artist/album metadata lives in
  * THREE unrelated grammars depending on the container (ID3v2 frames
  * and the ID3v1 trailer on MP3, Vorbis comments on FLAC and Ogg),
  * and a curation pipeline wants "the title column" regardless.
  * [[audioTagScan]] dispatches per row by magic, walks the matching
  * grammar(s), and normalizes tag NAMES through the published
  * conventions (TIT2/TITLE → `title`, TPE1/ARTIST → `artist`,
  * TDRC/TYER/DATE → `date`, TRCK/TRACKNUMBER → `track`, …) while
  * keeping the raw source label — unmapped tags pass through
  * verbatim (lowercased for vorbis keys, frame ids as stored for
  * ID3), never dropped and never guessed.
  *
  * MP3 payloads may carry BOTH an ID3v2 header and an ID3v1 trailer;
  * the scan emits both with distinct `source` labels — it is a scan,
  * not a resolver, and which one wins is the caller's curation
  * policy.
  */
object AudioTags { // carriers: MP3 (ID3v2+v1), FLAC/Ogg (Vorbis), MP4 (ilst)

  /** One normalized tag: `container` ∈ mp3|flac|ogg, `source` ∈
    * id3v2|id3v1|vorbis|opus.
    */
  case class AudioTag(id: Long, container: String, source: String,
      tag: String, value: String)

  /** The published name conventions. */
  private val id3Map = Map(
    "TIT2" -> "title", "TPE1" -> "artist", "TALB" -> "album",
    "TDRC" -> "date", "TYER" -> "date", "TCON" -> "genre",
    "TRCK" -> "track", "TLAN" -> "language")

  private val ilstMap = Map(
    "\u00A9nam" -> "title", "\u00A9ART" -> "artist",
    "\u00A9alb" -> "album", "\u00A9day" -> "date",
    "\u00A9gen" -> "genre", "\u00A9lyr" -> "lyrics")

  private val riffInfoMap = Map(
    "INAM" -> "title", "IART" -> "artist", "IPRD" -> "album",
    "ICRD" -> "date", "IGNR" -> "genre", "ICMT" -> "comment")

  private val aiffMap = Map(
    "NAME" -> "title", "AUTH" -> "artist", "ANNO" -> "comment",
    "(c) " -> "copyright")

  private val matroskaMap = Map(
    "TITLE" -> "title", "ARTIST" -> "artist", "ALBUM" -> "album",
    "DATE_RELEASED" -> "date", "GENRE" -> "genre",
    "COMMENT" -> "comment")

  private val vorbisMap = Map(
    "title" -> "title", "artist" -> "artist", "album" -> "album",
    "date" -> "date", "genre" -> "genre", "tracknumber" -> "track",
    "language" -> "language")

  def audioTagScan(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    implicit val enc = Encoders.product[AudioTag]
    df.select(col(idCol).cast("long"), col(binCol)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          tagsOf(r.getAs[Array[Byte]](1)).map { case (c, s, t, v) =>
            AudioTag(id, c, s, t, v)
          }
        }
    }.toDF().select(col("id"), col("container"), col("source"),
      col("tag"), col("value"))
  }

  private def isMp3(b: Array[Byte]): Boolean =
    b.length >= 3 && ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0))

  private[graft] def tagsOf(b: Array[Byte])
      : Seq[(String, String, String, String)] = {
    if (b == null || b.length < 4) return Nil
    if (isMp3(b)) {
      val v2 = Mp3.parseId3Text(b).map { case (frameId, text) =>
        ("mp3", "id3v2", id3Map.getOrElse(frameId, frameId), text)
      }
      val v1 = Mp3.parseId3v1(b).toSeq.flatMap { t =>
        Seq("title" -> t.title, "artist" -> t.artist,
          "album" -> t.album, "date" -> t.year,
          "comment" -> t.comment).filter(_._2.nonEmpty) ++
          (if (t.track >= 0) Seq("track" -> t.track.toString)
           else Nil) ++
          Seq("genre_id" -> t.genre.toString)
      }.map { case (k, v) => ("mp3", "id3v1", k, v) }
      v2 ++ v1
    } else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C') {
      Audio.flacVorbisComment(b).toSeq.flatMap { case (_, cs) =>
        cs.map { case (k, v) =>
          val lk = k.toLowerCase(java.util.Locale.ROOT)
          ("flac", "vorbis", vorbisMap.getOrElse(lk, lk), v)
        }
      }
    } else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
      b(3) == 'S') {
      Audio.oggVorbisComment(b).toSeq.flatMap { case (codec, _, cs) =>
        cs.map { case (k, v) =>
          val lk = k.toLowerCase(java.util.Locale.ROOT)
          ("ogg", codec, vorbisMap.getOrElse(lk, lk), v)
        }
      }
    } else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
      b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' &&
      b(10) == 'V' && b(11) == 'E') {
      Audio.parseRiffInfo(b).map { case (k, v) =>
        ("wav", "riff_info", riffInfoMap.getOrElse(k, k), v)
      }
    } else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' &&
      b(2) == 'R' && b(3) == 'M' && b(8) == 'A' && b(9) == 'I' &&
      b(10) == 'F' && b(11) == 'F') {
      Audio.parseAiffText(b).map { case (k, v) =>
        ("aiff", "iff_text", aiffMap.getOrElse(k, k), v)
      }
    } else if (b.length >= 12 &&
      new String(b, 4, 4, "US-ASCII") == "ftyp") {
      // M4A/MP4: iTunes-style ilst text items
      Mp4.parseIlst(b).map { case (name, v) =>
        ("mp4", "ilst", ilstMap.getOrElse(name, name), v)
      }
    } else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) {
      // Matroska/WebM: segment-level SimpleTags
      Webm.webmSimpleTags(b).map { case (name, v) =>
        ("matroska", "simple_tag",
          matroskaMap.getOrElse(name, name), v)
      }
    } else Nil
  }
}
