package graft.multimodal

import org.apache.spark.sql.Dataset

/** One parsed subtitle cue. `cue_idx` is the file's OWN index line
  * (1-based, per the SubRip grammar), so a parser that renumbers or
  * drops blocks is caught by the oracle. */
final case class SubtitleCue(
    media_id: Long, cue_idx: Int, start_ms: Long, end_ms: Long, text: String)

/**
 * SubRip (.srt) transcript parsing — the text side of the video
 * modality (video + transcript is the standard multimodal training
 * pair). The public grammar: blocks separated by blank lines, each
 * block an index line, a `HH:MM:SS,mmm --> HH:MM:SS,mmm` time line,
 * then one or more text lines (joined back with '\n').
 *
 * Same execution shape as every other media parser here: per-row
 * byte parsing inside `mapPartitions` — map-only, no shuffle, rides
 * the byte-balanced partitioner unchanged.
 */
object Subtitles {

  private val TimeLine =
    """(\d+):(\d{2}):(\d{2}),(\d{3}) --> (\d+):(\d{2}):(\d{2}),(\d{3})""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f.toLong

  /** Parse one SRT payload into (index, startMs, endMs, text) cues.
    * Tolerates \r\n line endings; fails loudly on a malformed block
    * (missing time line, non-numeric index) rather than skipping. */
  def parseSrt(bytes: Array[Byte]): Seq[(Int, Long, Long, String)] = {
    val content = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    content.split("\n").map(_.stripSuffix("\r"))
      .foldLeft(List(List.empty[String])) { (acc, line) =>
        if (line.isEmpty) Nil :: acc else (line :: acc.head) :: acc.tail
      }
      .map(_.reverse).reverse.filter(_.nonEmpty)
      .map { block =>
        require(block.length >= 3, s"malformed SRT block: ${block.mkString("|")}")
        val idx = block.head.trim.toInt
        val (start, end) = block(1) match {
          case TimeLine(h1, m1, s1, f1, h2, m2, s2, f2) =>
            (ms(h1, m1, s1, f1), ms(h2, m2, s2, f2))
          case other => sys.error(s"malformed SRT time line: '$other'")
        }
        (idx, start, end, block.drop(2).mkString("\n"))
      }
  }

  /** Cues of every `text/srt` row, exploded. */
  def cues(media: Dataset[MediaRow]): Dataset[SubtitleCue] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.format == "text/srt").flatMap { m =>
        parseSrt(m.content).map { case (idx, start, end, text) =>
          SubtitleCue(m.media_id, idx, start, end, text)
        }
      }
    }
  }

  /** Fixture-side SRT writer (canonical grammar, \n endings). */
  def writeSrt(cues: Seq[(Int, Long, Long, String)]): Array[Byte] = {
    def fmt(t: Long): String =
      f"${t / 3600000}%02d:${t / 60000 % 60}%02d:${t / 1000 % 60}%02d,${t % 1000}%03d"
    cues.map { case (idx, start, end, text) =>
      s"$idx\n${fmt(start)} --> ${fmt(end)}\n$text\n"
    }.mkString("", "\n", "")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
