package graft

import graft.model.{Frame, TimedWord}
import graft.pipeline.{Segmenter, TextClean, UrlPipeline}
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  private def frames(script: String): Array[Boolean] =
    // script char per 0.1 s = 10 frames: 'S' speech, '.' silence
    script.flatMap(c => Seq.fill(10)(c == 'S')).toArray

  private def framesAsObjects(script: String): Seq[Frame] =
    frames(script).zipWithIndex.map { case (s, i) => Frame(i, s) }.toSeq

  test("segmenter: basic piece between silences (5-10 s window)") {
    // 1s silence, 6s speech, 1s silence, tail
    val f = frames("." * 10 + "S" * 60 + "." * 10 + "." * 5)
    val segs = Segmenter.segment(f)
    assert(segs.size === 1)
    // piece starts at the SILENCE start (first silence frame end = 0.01)
    assert(math.abs(segs.head.startSec - 0.01) < 1e-9)
    // length accumulated from the frame after speech-detect
    assert(segs.head.endSec - segs.head.startSec > 5.0)
  }

  test("segmenter: no silence → no pieces (leading speech skipped)") {
    val segs = Segmenter.segment(frames("S" * 80))
    assert(segs.isEmpty)
  }

  test("segmenter: max-length backtrack splits a long speech run") {
    // silence, then 25 s unbroken speech, then silence-speech cycles
    val f = frames("." * 5 + "S" * 250 + "." * 10 + "S" * 60 + "." * 10)
    val segs = Segmenter.segment(f)
    // backtrack must not emit a >=10 s piece and must make progress
    assert(segs.forall(s => s.endSec - s.startSec < 10.0 + 1e-9))
    assert(segs.nonEmpty)
  }

  test("segmenter is deterministic") {
    val pay = Synth.fetch("http://host1.example.com/v/determinism")
    if (pay.ok) {
      val a = Segmenter.segment(pay.frames)
      val b = Segmenter.segment(pay.frames)
      assert(a === b)
      // the Dataset-operator form agrees with the array form
      val c = Segmenter.segmentFrames(
        pay.frames.zipWithIndex.map { case (s, i) => Frame(i, s) }.toSeq)
      assert(a === c)
    }
  }

  test("text clean golden vectors (text_utils.py semantics incl ё)") {
    assert(TextClean.clean("Привет <b>мир</b>") === "привет мир")
    // NB the reference never collapses whitespace: bracket strip leaves
    // the double space (text_utils.py:33-35 only strips charset)
    assert(TextClean.clean("ещё [музыка] текст") === "ещё  текст")
    assert(TextClean.clean("a\nb") === "a b")
    assert(TextClean.clean("Ёжик, колЮчий!") === "ёжик колючий")
    assert(TextClean.clean("abc 123 мир") === "abc 123 мир")
    assert(TextClean.clean("abc 123 мир", full = true) === "мир")
    assert(TextClean.clean("со-единение") === "со-единение")
  }

  test("is_bad_subs: digits or latin or empty → bad") {
    assert(TextClean.isBadSubs(""))
    assert(TextClean.isBadSubs("  "))
    assert(TextClean.isBadSubs("текст 123"))
    assert(TextClean.isBadSubs("text текст"))
    assert(!TextClean.isBadSubs("чистый текст ёлка"))
  }

  test("is_bad_piece boundaries: [3,20] s and 0.03 s/char") {
    val t = "д" * 100 // 100 chars
    assert(TextClean.isBadPiece(2.999, t))
    assert(!TextClean.isBadPiece(3.0, t))
    assert(!TextClean.isBadPiece(20.0, t))
    assert(TextClean.isBadPiece(20.001, t))
    // 0.03*100 = 3.0 s exactly → 3.0/100 = 0.03, NOT < 0.03 → good
    assert(!TextClean.isBadPiece(3.0, t))
    assert(TextClean.isBadPiece(3.0, "д" * 101)) // 3/101 < 0.03
    assert(TextClean.isBadPiece(5.0, "   "))
  }

  test("word-overlap join: exactly-40% boundary excluded (strict >)") {
    // piece [10,20]; word of 1s duration; overlap must be > 0.4 s
    val pay = graft.model.FetchPayload(ok = true, null, Array.emptyByteArray,
      0, 0, "png", Array.emptyBooleanArray, Seq.empty)
    // direct predicate check mirroring UrlPipeline
    def included(seg: (Double, Double), wStartMs: Long, wEndMs: Long): Boolean = {
      val ws = wStartMs / 1000.0; val we = wEndMs / 1000.0; val dur = we - ws
      (we - seg._1 > dur * 0.4) && (seg._2 - ws > dur * 0.4)
    }
    assert(!included((10.0, 20.0), 9000, 10000))   // ends at piece start
    assert(!included((10.0, 20.0), 9100, 10100))   // only 10% of 1 s word in
    assert(included((10.0, 20.0), 9401, 10401))    // 401 ms of a 1 s word in
    assert(included((10.0, 20.0), 9500, 10500))    // 50% in
    // NB exact-boundary (we-start == dur*0.4) is IEEE-representation
    // dependent; engine and oracle share the arithmetic so parity holds
    assert(included((10.0, 20.0), 12000, 13000))   // fully inside
    assert(!included((10.0, 20.0), 20000, 21000))  // starts at piece end
  }

  test("full pipeline produces consistent stats") {
    (0 until 10).foreach { i =>
      val url = s"http://host${i % 5}.example.com/v/pipe$i"
      val pay = Synth.fetch(url)
      if (pay.ok) {
        val r = UrlPipeline.process(url, pay)
        assert(r.ok)
        val st = r.stats.get
        assert(st.good_pieces === r.pieces.count(_.good))
        assert(st.total_pieces >= r.pieces.size)
        assert(r.media.get.caption ===
          r.pieces.filter(_.good).map(_.caption).mkString(" "))
      }
    }
  }
}
