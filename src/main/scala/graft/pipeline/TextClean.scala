package graft.pipeline

/** Caption cleaning + quality predicates, JVM side — faithful to
  * utils/text_utils.py:14-45 and utils/audio_utils.py:11-33.
  * Column twins live in graft.queries.Text (X1-X4, F2, F3).
  */
object TextClean {

  // precompiled — String.replaceAll would recompile per call, which
  // dominated allocation in the hot pipeline
  private val Tags     = java.util.regex.Pattern.compile("<[^>]*>")
  private val Brackets = java.util.regex.Pattern.compile("\\[[^\\]]*\\]")
  private val Charset  = java.util.regex.Pattern.compile("[^0-9a-zа-яё\\- ]")
  private val CharsetFull = java.util.regex.Pattern.compile("[^а-яё\\- ]")

  /** clean_transcript_text (text_utils.py:28-45), language=ru path.
    * full=true applies the stricter charset (а-яё, hyphen, space). */
  def clean(transcript: String, full: Boolean = false): String = {
    var t = transcript
    t = Tags.matcher(t).replaceAll("")
    t = Brackets.matcher(t).replaceAll("")
    t = t.replace("\n", " ")
    t = Charset.matcher(t.trim.toLowerCase).replaceAll("").trim
    if (full) t = CharsetFull.matcher(t.trim.toLowerCase).replaceAll("").trim
    t
  }

  /** is_bad_subs (text_utils.py:14-25): empty, any digit, or any Latin
    * letter ⇒ bad. Applied to the CLEANED text, as in the reference. */
  def isBadSubs(s: String): Boolean =
    s.trim.isEmpty || s.exists(c => c >= '0' && c <= '9') ||
      s.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))

  /** is_bad_piece (audio_utils.py:11-33): duration outside [3,20] s,
    * empty transcript, or < 0.03 s per character ⇒ bad. */
  def isBadPiece(durationSec: Double, transcript: String): Boolean = {
    val MaxSecs = 20.0; val MinSecs = 3.0; val MinSecPerSymbol = 0.03
    if (durationSec < MinSecs || durationSec > MaxSecs) true
    else if (transcript.trim.isEmpty) true
    else durationSec / transcript.length < MinSecPerSymbol
  }
}
