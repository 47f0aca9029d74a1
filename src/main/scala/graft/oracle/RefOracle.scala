package graft.oracle

import graft.crawl.CrawlConfig
import graft.frontier.Frontier
import graft.model._
import graft.pipeline.UrlPipeline
import graft.synth.Synth
import graft.util.Hashing
import scala.collection.mutable

/** Single-threaded reference-semantics oracle (SURVEY.md §5.2.2): the
  * exact claim/enqueue/process spec of CrawlEngine executed with plain
  * collections, no Spark. Shares Synth + UrlPipeline verbatim, so the
  * parity suite compares ORDER (committed (batchNo, priority, seq)) and
  * the SEEN SET byte-for-byte, as the north rule demands.
  *
  * Reference semantics mirrored: FIFO pop by (priority, seq)
  * (utils/csv_utils.py:286-299), enqueue-side dedup
  * (utils/queue_utils.py:61-66), recovery-prepend via priority
  * (utils/queue_utils.py:23-32), per-host politeness budget
  * (parse_youtube.py:53 generalized).
  */
object RefOracle {

  final case class Result(
      log: Vector[CrawlRecord],
      seen: Vector[Long],            // sorted fps of every enqueued url
      media: Vector[MediaRow],
      stats: Vector[UrlStats],
      batches: Long)

  private final case class Entry(fp: Long, url: String, host: String,
                                 priority: Int, var seq: Long,
                                 var state: String, var error: String,
                                 discoveredAt: Long)

  def run(nSeeds: Int, cfg: CrawlConfig = CrawlConfig(),
          crashAfterBatch: Option[Long] = None): Result = {
    val byFp = mutable.LinkedHashMap.empty[Long, Entry]
    var maxSeq = -1L
    var log = Vector.empty[CrawlRecord]
    var media = Vector.empty[MediaRow]
    var stats = Vector.empty[UrlStats]

    def enqueue(urls: Seq[SeedUrl], batchNo: Long): Unit = {
      // first-occurrence within batch = lowest (priority, seq); then
      // gate vs all existing keys (any state)
      val sorted = urls.sortBy(s => (s.priority, s.seq))
      val seenInBatch = mutable.HashSet.empty[Long]
      sorted.foreach { s =>
        val fp = Hashing.fp(s.url)
        if (!seenInBatch.contains(fp) && !byFp.contains(fp)) {
          seenInBatch += fp
          val host = Hashing.host(s.url)
          val policy = Synth.hostPolicy(host, cfg.seed)
          val dis = Synth.isDisallowed(s.url, policy)
          byFp(fp) = Entry(fp, s.url, host, s.priority, s.seq,
            if (dis) FrontierState.Failed else FrontierState.Pending,
            if (dis) "robots: disallowed" else null, batchNo)
          // maxSeq tracks SURVIVORS only — the engine computes it as
          // max(seq) over the frontier table, where gated dups never land
          maxSeq = math.max(maxSeq, s.seq)
        }
      }
    }

    enqueue(Synth.seedUrls(nSeeds, cfg.nHosts, cfg.seed), batchNo = 0L)

    var batchNo = 1L
    var done = false
    while (!done) {
      val pending = byFp.values.filter(_.state == FrontierState.Pending).toVector
        .sortBy(e => (e.priority, e.seq))
      if (pending.isEmpty) done = true
      else {
        // per-host cap, then global top-batchSize by (priority, seq)
        val hostTaken = mutable.HashMap.empty[String, Long]
        val eligible = pending.filter { e =>
          val cap = math.max(1L,
            cfg.batchMs / Synth.hostPolicy(e.host, cfg.seed).crawlDelayMs)
          val t = hostTaken.getOrElse(e.host, 0L)
          if (t < cap) { hostTaken(e.host) = t + 1; true } else false
        }
        val claimed = eligible.take(cfg.batchSize)
        claimed.foreach(_.state = FrontierState.Processing)

        if (crashAfterBatch.contains(batchNo - 1)) {
          // simulate crash right after the processing checkpoint:
          // stop here; resume() semantics are applied by the caller
          return Result(log, byFp.keys.toVector.sorted, media, stats, batchNo - 1)
        }

        var discovered = Vector.empty[(String, Long, Int)] // url, parentSeq, idx
        claimed.foreach { e =>
          val payload = Synth.fetch(e.url, cfg.seed)
          val r = UrlPipeline.process(e.url, payload)
          e.state = if (r.ok) FrontierState.Processed else FrontierState.Failed
          e.error = r.error
          log :+= CrawlRecord(batchNo, e.priority, e.seq, e.fp, e.url, e.state, e.error)
          r.media.foreach(media :+= _)
          r.stats.foreach(stats :+= _)
          if (r.ok)
            discovered ++= Synth.outlinks(e.url, cfg.universe, cfg.nHosts, cfg.seed)
              .zipWithIndex.map { case (u, i) => (u, e.seq, i) }
        }
        // seq assignment over ALL discovered (dups consume seqs), in
        // (parentSeq, idx) order — mirrors the engine's window exactly
        val ordered = discovered.sortBy(t => (t._2, t._3))
        val base = maxSeq
        val seeds = ordered.zipWithIndex.map { case ((u, _, _), i) =>
          SeedUrl(u, Frontier.NormalPriority, base + i + 1)
        }
        enqueue(seeds, batchNo)
        batchNo += 1
      }
    }
    Result(log, byFp.keys.toVector.sorted, media, stats, batchNo - 1)
  }
}
