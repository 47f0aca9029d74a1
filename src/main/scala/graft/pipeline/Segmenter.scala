package graft.pipeline

import graft.model.{Frame, Segment}

/** Faithful reimplementation of the reference's silence-slicing state
  * machine (utils/slicing_utils.py:8-142) over 10 ms frames — a session
  * window with max-length + backtrack semantics no builtin has
  * (SURVEY.md §2.10).
  *
  * Semantics preserved exactly:
  *  - states: search-silence → search-speech → record (:31-33);
  *  - run timestamps are the END of the first frame of a run
  *    (tell()/rate, :60,:65);
  *  - a piece starts at the preceding SILENCE start, not the speech
  *    start (:87);
  *  - piece ends at a silence frame once length > min (:104-113);
  *  - at length >= max: backtrack to pieceStart+1 s and resume
  *    searching for silence (:128-137), speech/silence run counters
  *    carrying over (they are NOT reset — :56-65 only);
  *  - emitted end = start + accumulated length (:111), faithfully
  *    reproducing the reference's drift between wall positions and
  *    emitted intervals;
  *  - the zero-piece division crash (:142) is fixed per SURVEY §0.1.
  *
  * Frame math uses the reference's sample arithmetic with
  * sps=16000, samples/frame=160 so backtrack rounding is identical.
  */
object Segmenter {

  val FrameSec = 0.01
  val Sps = 16000
  val SamplesPerFrame = 160

  /** Dataset-operator form (§2.10): per-key frames → segments, for use
    * inside groupByKey(...).flatMapGroups. */
  def segmentFrames(frames: Seq[Frame],
                    minLenSec: Double = 5.0,
                    maxLenSec: Double = 10.0): Vector[Segment] = {
    if (frames.isEmpty) return Vector.empty
    // size by max index, not count: sparse inputs (filtered upstream)
    // mean "unlisted frame = silence", never "drop the frame"
    val arr = new Array[Boolean](frames.iterator.map(_.idx).max + 1)
    frames.foreach(f => if (f.idx >= 0) arr(f.idx) = f.isSpeech)
    segment(arr, minLenSec, maxLenSec)
  }

  def segment(frames: Array[Boolean],
              minLenSec: Double = 5.0,
              maxLenSec: Double = 10.0): Vector[Segment] = {
    val n = frames.length
    var pos = 0
    var out = Vector.empty[Segment]

    var pieceStart = 0.0
    var pieceLen = 0.0

    var searchingSpeech = false
    var searchingSilence = true
    var havePiece = false

    var speechRun = 0
    var silenceRun = 0
    var silenceStart = 0.0

    while (pos < n) {
      val isSpeech = frames(pos)
      pos += 1
      val tellSec = pos.toDouble * SamplesPerFrame / Sps // tell()/rate after read

      if (isSpeech) {
        silenceRun = 0
        speechRun += 1
        if (speechRun == 1) { /* speech_start_sec - recorded but unused here */ }
      } else {
        silenceRun += 1
        speechRun = 0
        if (silenceRun == 1) silenceStart = tellSec
      }

      if (!havePiece) {
        if (searchingSilence) {
          if (silenceRun >= 1) {
            searchingSilence = false
            searchingSpeech = true
          }
        } else if (searchingSpeech) {
          if (speechRun >= 1) {
            pieceStart = silenceStart
            pieceLen = 0.0
            havePiece = true
            searchingSilence = false
            searchingSpeech = false
          }
        }
      } else {
        pieceLen += FrameSec
        if (pieceLen > minLenSec) {
          if (pieceLen < maxLenSec) {
            if (silenceRun >= 1) {
              out :+= Segment(pieceStart, pieceStart + pieceLen)
              pieceStart = 0.0; pieceLen = 0.0
              havePiece = false; searchingSpeech = false; searchingSilence = true
            }
          } else {
            // max length reached: seek back to pieceStart + 1 s
            pos = (((pieceStart + 1.0) * Sps).toInt) / SamplesPerFrame
            havePiece = false; searchingSpeech = false; searchingSilence = true
          }
        }
      }
    }
    out
  }
}
