package graft.queries

import graft.model.RawCue
import graft.pipeline.CueParser
import org.apache.spark.sql.{DataFrame, SparkSession}

/** q39: the cue-parser operator family (S7/F5/X5) under the driver's
  * DuckDB gate. Each document's first ≤8 tokens are serialized into a
  * deterministic two-row autosub cue with inline `<h:mm:ss.mmm>`
  * timecodes; the Spark side parses it with the REAL CueParser (the
  * one the crawl pipeline runs), the DuckDB twin re-derives the parse
  * in SQL (regexp_extract_all + tag strip + whitespace split +
  * timecode arithmetic + positional alignment). A value/hash match
  * proves the parser implements the regex/split/ms spec exactly.
  */
object Cue {

  val CueStartMs = 1000L
  val CueEndMs = 100000L

  def q39CueParse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .flatMap { case (docId, text) =>
        // Locale.ROOT: DuckDB's lower() is locale-independent; default-
        // locale toLowerCase would diverge on e.g. tr/az JVMs ('I'→'ı').
        // Whitespace as an EXPLICIT class (q42's lesson: Java \s has
        // U+000B, RE2's doesn't), empties dropped on both sides, and
        // tokens carrying the one divergent char (VT) excluded on both
        // sides — the inner CueParser split (Java \s) and the SQL twin
        // (RE2 \s) then agree on every reachable input.
        val toks0 = text.trim.toLowerCase(java.util.Locale.ROOT)
          .split(s"[${Text.WsClass}]+")
          .filter(t => t.nonEmpty && !t.contains('\u000B'))
        if (toks0.length < 2) Iterator.empty
        else {
          val w = toks0.take(8)
          // two-row cue; timecode before word i (1-based, i>=2) at
          // i s + 250 ms → '<0:00:0i.250>' (i <= 8, single digit)
          val sb = new StringBuilder("prev\n").append(w(0))
          (1 until w.length).foreach { i =>
            sb.append("<0:00:0").append(i + 1).append(".250><c> ")
              .append(w(i)).append("</c>")
          }
          val parsed = CueParser.parse(Seq(RawCue(CueStartMs, CueEndMs, sb.toString)))
          parsed.iterator.zipWithIndex.map { case (tw, i) =>
            (docId, (i + 1).toLong, tw.word, tw.startMs, tw.endMs)
          }
        }
      }.toDF("doc_id", "idx", "word", "start_ms", "end_ms")
  }

  val q39Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(lower(text)), '[${Text.WsClass}]+'),
      |                t -> len(t) > 0 AND NOT contains(t, chr(11))) AS w0
      |  FROM documents),
      |t AS (SELECT doc_id, w0[1:least(len(w0), 8)] AS w FROM d WHERE len(w0) >= 2),
      |cue AS (
      |  SELECT doc_id,
      |    'prev' || chr(10) || w[1] || array_to_string(
      |      ['<0:00:0' || cast(i as varchar) || '.250><c> ' || w[i] || '</c>'
      |       for i in generate_series(2, len(w))], '') AS txt
      |  FROM t),
      |parsed AS (
      |  SELECT doc_id,
      |    list_transform(regexp_extract_all(lastrow, '<(\\d+:\\d+:\\d+.\\d+)>', 1),
      |      tc -> cast(str_split(tc, ':')[1] as bigint) * 3600000
      |          + cast(str_split(tc, ':')[2] as bigint) * 60000
      |          + cast(str_split(str_split(tc, ':')[3], '.')[1] as bigint) * 1000
      |          -- fraction = ms with pyvtt padding semantics, mirroring
      |          -- CueParser.timecodeMs: '.2' = 200 ms, '.25' = 250,
      |          -- >3 digits truncate ('.2507' = 250) — NOT a literal
      |          -- integer parse (ADVICE r3: the fixture always writes
      |          -- %03d, but the oracle must match the parser on every
      |          -- reachable width). The whole term coalesces to 0 when
      |          -- the timecode has no '.' fraction at all (ADVICE r4:
      |          -- the regex's dot-any admits e.g. '0:00:0123', which
      |          -- the hardened parser reads as seconds + 0 ms; try_cast
      |          -- absorbs the empty-fraction '0:00:05.' shape too)
      |          + coalesce(
      |              try_cast(substr(str_split(tc, '.')[2], 1, 3) as bigint)
      |              * (CASE len(substr(str_split(tc, '.')[2], 1, 3))
      |                 WHEN 1 THEN 100 WHEN 2 THEN 10 ELSE 1 END), 0)) AS tcs,
      |    list_filter(
      |      regexp_split_to_array(regexp_replace(lastrow, '<[^>]*>', '', 'g'),
      |                            '[${Text.WsClass}]+'),
      |      x -> len(x) > 0) AS ws
      |  FROM (SELECT doc_id, str_split(txt, chr(10))[-1] AS lastrow FROM cue)),
      |e AS (
      |  SELECT doc_id, tcs, ws, len(ws) AS k,
      |    unnest(generate_series(1, len(ws))) AS i
      |  FROM parsed)
      |SELECT doc_id, cast(i as bigint) AS idx, ws[i] AS word,
      |  cast(CASE WHEN i = 1 THEN 1000 ELSE tcs[i-1] END as bigint) AS start_ms,
      |  cast(CASE WHEN i < k THEN tcs[i] ELSE 100000 END as bigint) AS end_ms
      |FROM e""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_cue_parse" -> q39CueParse _,
  )

  val oracle: Map[String, String] = Map(
    "q39_cue_parse" -> q39Sql,
  )
}
