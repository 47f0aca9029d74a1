package graft

import graft.model.{RawCue, TimedWord}
import graft.pipeline.CueParser
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the cue-parser family (S7/F5/X5), mirroring
  * utils/youtube_downloader.py:86-111 rule by rule. */
class CueParserSpec extends AnyFunSuite {

  test("timecode parse: h:m:s.mmm → ms (pyvtt ordinal)") {
    assert(CueParser.timecodeMs("0:00:01.319") === 1319L)
    assert(CueParser.timecodeMs("0:01:02.050") === 62050L)
    assert(CueParser.timecodeMs("1:00:00.000") === 3600000L)
    assert(CueParser.timecodeMs("12:34:56.789") === 45296789L)
  }

  test("well-formed two-row cue parses to aligned timed words") {
    val cue = RawCue(1000, 5000,
      "previous line\nпривет<0:00:02.000><c> мир</c><0:00:03.500><c> снова</c>")
    val got = CueParser.parse(Seq(cue))
    assert(got === Seq(
      TimedWord(1000, 2000, "привет"),   // start = cue start, end = tc1
      TimedWord(2000, 3500, "мир"),      // tc1 .. tc2
      TimedWord(3500, 5000, "снова")))   // tc2 .. cue end
  }

  test("fixup keeps ONLY the last row of a multi-row cue (the reference bugfix)") {
    val cue = RawCue(0, 9000,
      "старый<0:00:01.000><c> хвост</c>\nновый<0:00:05.000><c> ряд</c>")
    val got = CueParser.parse(Seq(cue))
    assert(got.map(_.word) === Seq("новый", "ряд"))
    assert(got.head.startMs === 0 && got.last.endMs === 9000)
  }

  test("rule: single-row cue with no timecodes is dropped (rows<2 && 0 tc)") {
    assert(CueParser.parse(Seq(RawCue(0, 100, "[музыка]"))) === Seq.empty)
    // but a single-row cue WITH a timecode survives
    val kept = CueParser.parse(Seq(RawCue(0, 100, "а<0:00:00.050><c> б</c>")))
    assert(kept.map(_.word) === Seq("а", "б"))
  }

  test("rule: multi-word row with no timecodes is dropped (>1 word && 0 tc)") {
    assert(CueParser.parse(Seq(RawCue(0, 100, "prev\nшум в зале"))) === Seq.empty)
    // single word, two rows, no timecodes → kept, spans the whole cue
    assert(CueParser.parse(Seq(RawCue(10, 90, "prev\nслово"))) ===
      Seq(TimedWord(10, 90, "слово")))
  }

  test("reference regex fidelity: dot-any separator in timecodes is accepted") {
    // the reference pattern <(\d+:\d+:\d+.\d+)> has an UNescaped dot
    assert(CueParser.timecodeMs("0:00:01,500") === 1500L) // comma separator
    // the dot-any can backtrack onto a digit → all-digit rest; must not
    // crash the executor task (parsed as seconds, 0 ms)
    assert(CueParser.timecodeMs("0:00:0123") === 123000L)
    assert(CueParser.parse(Seq(graft.model.RawCue(0, 200000,
      "prev\nа<0:00:0123>б"))).nonEmpty)
  }

  test("synth cue round-trip: single-word cue reconstructs the word exactly; word set preserved") {
    (0 until 20).foreach { i =>
      val fp = graft.util.Hashing.fp(s"http://host$i.example.com/v/cue$i")
      val ws = Synth.words(fp, Synth.DefaultSeed)
      val cs = Synth.cues(fp, Synth.DefaultSeed, ws)
      val parsed = CueParser.parse(cs)
      // the malformed injected cues are dropped: parsed words = original words
      assert(parsed.map(_.word) === ws.map(_.word), s"url $i word sequence")
      // starts survive serialization exactly; first/last timestamps exact
      assert(parsed.map(_.startMs) === ws.map(_.startMs), s"url $i starts")
      assert(parsed.last.endMs === ws.last.endMs, s"url $i last end")
      // ends never shrink (intra-cue gaps are absorbed forward)
      parsed.zip(ws).foreach { case (p, w) => assert(p.endMs >= w.endMs) }
    }
  }

  test("malformed injections are present in the raw stream for some urls") {
    val hit = (0 until 50).exists { i =>
      val fp = graft.util.Hashing.fp(s"http://host$i.example.com/v/mal$i")
      val ws = Synth.words(fp, Synth.DefaultSeed)
      val cs = Synth.cues(fp, Synth.DefaultSeed, ws)
      cs.exists(_.text == "[музыка]")
    }
    assert(hit, "no url ever injected a malformed cue — fixup rules untested in parity")
  }
}
