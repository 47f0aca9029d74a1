package graft.model

/** Typed data model — SURVEY.md §1.2. One case class per entity; Spark
  * `Encoder`s come from `spark.implicits`. The reference's row-of-strings
  * CSVs (utils/csv_utils.py:20-23) become these typed Datasets.
  */

/** Seed-list row (reference: one video id per line in the seed txt;
  * `seq` = line number = the FIFO parity key, utils/csv_utils.py:286-299). */
final case class SeedUrl(url: String, priority: Int, seq: Long)

/** One frontier row — the 4 CSV queues (const.py:8-11) collapsed into a
  * single `state` column. `fp` = xxhash64(canonical url), the join key
  * everywhere. `discoveredAt` = batch number (lineage). */
final case class FrontierEntry(
    fp: Long,
    url: String,
    host: String,
    priority: Int,
    seq: Long,
    state: String,       // pending | processing | processed | failed
    error: String,        // null unless failed
    discoveredAt: Long,    // batch that enqueued the row
    processedAt: Long)     // batch that reached a terminal state; -1 before.
                           // Doubles as the crawl log: committed order =
                           // (processedAt, priority, seq) over terminal rows

object FrontierState {
  val Pending    = "pending"
  val Processing = "processing"
  val Processed  = "processed"
  val Failed     = "failed"
  /** Recovery priority — strictly less than any normal priority so
    * recovered rows are claimed first (prepend semantics,
    * utils/queue_utils.py:30-32). */
  val RecoveryPriority: Int = -1
}

/** Per-host politeness policy (reference analog: the flat 0.2 s sleep,
  * parse_youtube.py:53, generalized to robots crawl-delay budgets). */
final case class HostPolicy(
    host: String,
    crawlDelayMs: Long,
    disallowPrefixes: Seq[String])

/** A word with in-media timestamps (vad_first_parser.py:114-117). */
final case class TimedWord(startMs: Long, endMs: Long, word: String)

/** A raw caption cue as fetched: header times + (possibly multi-row)
  * text with inline <h:mm:ss.mmm> word timecodes — the WebVTT autosub
  * shape the reference downloads and fixes up
  * (utils/youtube_downloader.py:83-111). */
final case class RawCue(startMs: Long, endMs: Long, text: String)

/** 10 ms speech/silence frame — segmentation input (§2.10). */
final case class Frame(idx: Int, isSpeech: Boolean)

/** Segment emitted by the VAD-style state machine. */
final case class Segment(startSec: Double, endSec: Double)

/** Synthetic fetch outcome (FIXTURES.md §5). `ok=false` → failed with
  * `error`; `cues` is the RAW caption stream — the pipeline runs the
  * CueParser fixup/parse (S7/F5/X5) to get timed words, exactly like
  * the reference parses the downloaded .vtt.
  * `frames(i)` = isSpeech for 10 ms frame i — a primitive array, not
  * 3000 objects/url (GC pressure was the scaling bottleneck). */
final case class FetchPayload(
    ok: Boolean,
    error: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    frames: Array[Boolean],
    cues: Seq[RawCue])

/** Output payload row — BASELINE.json.input_hint's shape plus the
  * source-format lineage column. `bytes` is the NORMALIZED payload
  * (canonical PNG re-encode of the fetched media — the reference
  * stores the ffmpeg-normalized wav, not the downloaded container,
  * utils/audio_utils.py:37-111 → vad_first_parser.py:60-80); `fmt` is
  * therefore always "png" and `src_fmt` records what was fetched. */
final case class MediaRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    src_fmt: String,
    caption: String,
    phash: Long)

/** Per-piece detail row (reference: parts.csv, vad_first_parser.py:180-182). */
final case class PieceRow(
    image_id: String,
    piece_idx: Int,
    start_sec: Double,
    end_sec: Double,
    caption: String,
    good: Boolean)

/** Per-url stats — the reference's 4-field stats.csv row
  * (speech_duration, subs_quality, good_samples, total_samples;
  * vad_first_parser.py:185-186, utils/stats_util.py:12-18) plus the
  * utilization rate it derives (speech/total duration, div-0 guarded,
  * vad_first_parser.py:169-174). subs_quality is the literal 1 the
  * reference always writes. */
final case class UrlStats(
    image_id: String,
    speech_duration_sec: Double,
    subs_quality: Double,
    utilization_rate: Double,
    good_pieces: Int,
    total_pieces: Int)

/** One row of the payload SnapshotTable — media + pieces + per-url
  * stats in a single table (one commit per batch instead of three).
  * Also the typed schema source for the empty-table case: views built
  * on a never-committed payload table must still resolve their columns
  * (a drain where every fetch failed commits nothing). */
final case class PayloadRow(
    image_id: String,
    bytes: Array[Byte],     // normalized (canonical PNG), see MediaRow
    w: Int,
    h: Int,
    fmt: String,            // storage format — "png" after normalize
    src_fmt: String,        // fetched container format ("png" | "jpg")
    caption: String,
    phash: Long,
    // S12 verified-copy checksum: md5 of the UPPERCASE hex of bytes —
    // a form every engine can recompute (DuckDB md5 only takes
    // VARCHAR); the q31 oracle re-derives it from the dumped bytes and
    // hash-compares against this stored value = the copy audit
    bytes_md5: String,
    pieces: Seq[PieceRow],
    speech_duration_sec: Double,
    subs_quality: Double,
    utilization_rate: Double,
    good_pieces: Int,
    total_pieces: Int)

/** Committed crawl-order record — the parity artifact
  * (BASELINE.md: committed (batchNo, priority, seq) order vs oracle). */
final case class CrawlRecord(
    batchNo: Long,
    priority: Int,
    seq: Long,
    fp: Long,
    url: String,
    state: String,
    error: String)
