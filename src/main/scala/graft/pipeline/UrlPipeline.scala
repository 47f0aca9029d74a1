package graft.pipeline

import graft.image.ImageCodec
import graft.model._
import graft.synth.Synth

/** The per-item pipeline (vad_first_parser.process_video, §3.2):
  * fetch payload → segment frames → align words→segments (40 % overlap
  * theta join, vad_first_parser.py:105-126) → caption build + clean →
  * quality filters → MediaRow / PieceRow / UrlStats.
  *
  * Pure function of (url, payload) — shared verbatim by the distributed
  * engine (inside mapPartitions) and the single-threaded parity oracle,
  * so per-row outputs are byte-identical by construction and the parity
  * suite checks ORDERING and SET membership, not luck.
  */
object UrlPipeline {

  val WordInclPerc = 0.4 // vad_first_parser.py:109

  final case class Result(
      ok: Boolean,
      error: String,
      media: Option[MediaRow],
      pieces: Seq[PieceRow],
      stats: Option[UrlStats])

  def process(url: String, payload: FetchPayload): Result = {
    if (!payload.ok)
      return Result(ok = false, error = payload.error, None, Seq.empty, None)

    val id = Synth.imageId(url)
    val segments = Segmenter.segment(payload.frames)
    // S7/F5/X5: raw cues → fixup → timed words (the reference parses
    // the downloaded .vtt the same way, youtube_downloader.py:83-111)
    val timedWords = CueParser.parse(payload.cues)

    var speechLen = 0.0
    var good = 0
    val pieceRows = segments.zipWithIndex.flatMap { case (seg, i) =>
      // interval join: word included iff >= 40% of its duration overlaps
      // on both sides (F4, vad_first_parser.py:114-120)
      val words = timedWords.filter { w =>
        val ws = w.startMs / 1000.0; val we = w.endMs / 1000.0
        val dur = we - ws
        (we - seg.startSec > dur * WordInclPerc) &&
          (seg.endSec - ws > dur * WordInclPerc)
      }
      if (words.isEmpty) None // :123-124 continue
      else {
        val sorted = words.sortBy(_.startMs) // :126 stable sort by start
        val joined = sorted.map(_.word).mkString(" ")
        val cleaned = TextClean.clean(joined)
        if (TextClean.isBadSubs(cleaned)) None // :139 continue
        else {
          val dur = seg.endSec - seg.startSec
          val bad = TextClean.isBadPiece(dur, cleaned) // :150
          if (!bad) { speechLen += dur; good += 1 }
          Some(PieceRow(id, i, seg.startSec, seg.endSec, cleaned, good = !bad))
        }
      }
    }

    // NORMALIZE between fetch and phash (the reference normalizes the
    // audio before slicing, vad_first_parser.py:60-80): one decode
    // serves both the canonical re-encode and the phash — the stored
    // payload is the normalized bytes, and the phash is computed over
    // the same (losslessly preserved) pixels. Reused per-thread image +
    // pixel buffer: the encode consumes the image before this thread's
    // next decode, nothing escapes this call.
    val decoded = ImageCodec.decodeReused(payload.bytes)
    val normBytes = ImageCodec.encode(decoded, "png")
    val decodedPixels = ImageCodec.pixelsReused(decoded)
    val phash = ImageCodec.phash64(payload.w, payload.h, decodedPixels)
    val caption = pieceRows.filter(_.good).map(_.caption).mkString(" ")
    val media = MediaRow(id, normBytes, payload.w, payload.h,
      fmt = "png", src_fmt = payload.fmt, caption, phash)
    // A2: total track duration = frame count × 10 ms (reference analog:
    // filtered-wav byte length / rate, vad_first_parser.py:169);
    // utilization = speech/total with the reference's div-0 guard
    // (:171-174); subs_quality is the literal 1 (:185-186)
    val totalDur = payload.frames.length * 0.01
    val utilization = if (totalDur > 0) speechLen / totalDur else 0.0
    val stats = UrlStats(id, speechLen, subs_quality = 1.0,
      utilization_rate = utilization, good, segments.length)
    Result(ok = true, error = null, Some(media), pieceRows, Some(stats))
  }
}
