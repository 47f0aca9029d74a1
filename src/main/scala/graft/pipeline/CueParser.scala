package graft.pipeline

import graft.model.{RawCue, TimedWord}

/** VTT/autosub cue → timed-word parser (operators S7 + F5 + X5,
  * SURVEY.md §2): the reference's autosub fixup
  * (utils/youtube_downloader.py:86-111) followed by timecode/word
  * alignment. Pure functions — shared verbatim by the engine's
  * executor path, the parity oracle, and the q39 driver-oracle query.
  *
  * Fixup rules (faithful):
  *  - rows = text.split('\n'); keep ONLY the last row ("bugfix" :92-94);
  *  - timecodes = findall `<(\d+:\d+:\d+.\d+)>` over that row (:96-98 —
  *    the '.' is UNescaped in the reference, so it matches any char;
  *    kept as-is for fidelity);
  *  - words = whitespace-split of the tag-stripped row (:99-100),
  *    python re.split semantics (leading/trailing empties preserved);
  *  - drop cues with < 2 rows and 0 timecodes (:102-103);
  *  - drop cues with > 1 word and 0 timecodes (:105-107).
  *
  * Word timing (X5; the reference's timed-word builder module is absent
  * from the snapshot — see SURVEY §0.1 — so the spec is the natural
  * alignment): word i of k gets start = cue.start for i=1 else
  * timecode(i-1), end = timecode(i) for i<k else cue.end.
  */
object CueParser {

  private val TimecodeRe = """<(\d+:\d+:\d+.\d+)>""".r // reference regex, dot-any
  private val TagRe = "<[^>]*>".r
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** `h:m:s.mmm` → milliseconds (pyvtt WebVTTTime.ordinal is ms). */
  def timecodeMs(t: String): Long = {
    val c1 = t.indexOf(':'); val c2 = t.indexOf(':', c1 + 1)
    val h = t.substring(0, c1).toLong
    val m = t.substring(c1 + 1, c2).toLong
    val rest = t.substring(c2 + 1)
    // the separator before ms is any char (dot-any regex) — find the
    // first non-digit. The regex also admits all-digit rests (the
    // dot-any backtracks onto a digit, e.g. "<0:00:0123>"); parse those
    // as seconds with 0 ms instead of crashing the executor task.
    var di = 0
    while (di < rest.length && rest.charAt(di).isDigit) di += 1
    val s = rest.substring(0, di).toLong
    val ms =
      if (di >= rest.length - 1) 0L // no separator, or separator is last
      else {
        // the fractional field is MILLISECONDS with padding semantics
        // (pyvtt WebVTTTime.from_string ordinal): '.2' = 200 ms,
        // '.25' = 250 ms; extra precision truncates to ms ('.2507' =
        // 250). The previous literal parse read '.2' as 2 ms.
        val frac = rest.substring(di + 1)
        val f3 = if (frac.length > 3) frac.substring(0, 3) else frac
        val scale = f3.length match { case 1 => 100L; case 2 => 10L; case _ => 1L }
        f3.toLong * scale
      }
    h * 3600000L + m * 60000L + s * 1000L + ms
  }

  /** A cue that survived fixup, pre-parsed. */
  final case class FixedCue(startMs: Long, endMs: Long,
                            timecodesMs: Seq[Long], words: Seq[String])

  /** The autosub fixup (F5). */
  def fixup(cues: Seq[RawCue]): Seq[FixedCue] = cues.flatMap { c =>
    val rows = c.text.split("\n", -1)
    val last = rows.last // keep last row of multi-row cues
    val timecodes = TimecodeRe.findAllMatchIn(last)
      .map(m => timecodeMs(m.group(1))).toSeq
    val wordsStr = TagRe.replaceAllIn(last, "")
    // python re.split keeps boundary empties — limit -1 mirrors that
    val words = WsPattern.split(wordsStr, -1).toSeq
    if (rows.length < 2 && timecodes.isEmpty) None
    else if (words.length > 1 && timecodes.isEmpty) None
    else Some(FixedCue(c.startMs, c.endMs, timecodes, words))
  }

  /** Fixed cues → timed words (X5 + X6). Empty tokens (boundary
    * whitespace artifacts) are not words. */
  def timedWords(cues: Seq[FixedCue]): Seq[TimedWord] = cues.flatMap { c =>
    val ws = c.words.filter(_.nonEmpty)
    if (ws.isEmpty) Seq.empty[TimedWord]
    else {
      val k = ws.length
      val starts = c.startMs +: c.timecodesMs
      val ends = c.timecodesMs :+ c.endMs
      (0 until k).map { i =>
        val s = if (i < starts.length) starts(i) else starts.last
        val e = if (i < ends.length) ends(i) else c.endMs
        TimedWord(s, e, ws(i))
      }
    }
  }

  /** Full parse: raw cues → timed words. */
  def parse(cues: Seq[RawCue]): Seq[TimedWord] = timedWords(fixup(cues))
}
