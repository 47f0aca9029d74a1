package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Four sections:
  *  1. the query suite at local[SPARK_GRAFT_CPUS] over SPARK_GRAFT_SF_DIR —
  *     with the flagship crawl PRE-BUILT and reported as its own
  *     `engine_build_sec` metric, so q30..q44 timings measure the
  *     queries, not whichever one triggers the shared drain first
  *     (VERDICT r2 next-round #8);
  *  2. frontier-drain: full crawl engine, urls/sec + wall (BASELINE.md
  *     "URLs fetched/sec") — at the standard 30k seeds AND a large-fill
  *     drain (default 100k) proving throughput holds as the frontier
  *     fills (VERDICT r2 next-round #6);
  *  3. scaling evidence (north rule, sandbox proxy for N→4N executors):
  *     the fetch+process stage at two core-count pairs, interleaved
  *     A/B/A/B medians-of-3 so slow machine drift (page cache, thermal,
  *     JIT) hits both levels equally (VERDICT r2 next-round #2);
  *  4. an allocation-free CPU control at the SAME pairs — it separates
  *     the shared-heap/scheduler ceiling of one 32-thread JVM from the
  *     pipeline's own scaling (each executor of a real 4N cluster would
  *     own its heap).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.local.dir (shuffle files, spills, checkpoint disk-backing)
    // follows the work root: on a cluster these are node-local fast
    // disks; this box's default /tmp is the cross-tenant-contended
    // ext4 whose IO bursts were the round-3/4 variance source (the
    // DiagScale c-variant outlier — 23.5 s vs 6.9 s for the identical
    // job — was shuffle/spill on the shared disk)
    val localDir = s"${graft.crawl.Flagship.workRoot}/spark_local"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      // the engine overlaps commit jobs (payload/terminal writes on the
      // commit lane) with the next batch's claim/process/rank jobs; the
      // default FIFO scheduler lets a wide write occupy every task slot
      // and STALL the critical-path chain behind it — FAIR shares slots
      // across the concurrent jobs, which is how any real multi-job
      // cluster runs this engine
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The compute stage: fetch + full per-url pipeline over n urls —
    * one wide map job, the shape that dominates a real crawl. */
  private def processStage(spark: SparkSession, n: Int): Long = {
    import spark.implicits._
    val seed = graft.synth.Synth.DefaultSeed
    // url generation happens ON the executors (spark.range), and with
    // 8 tasks per core: per-url cost varies ~16x (32px..128px images),
    // so a single wave of cores-sized partitions straggles — small
    // tasks let the scheduler balance (same lesson at 100 TB). No
    // shuffle anywhere in this job.
    spark.range(0L, n.toLong, 1L, spark.sparkContext.defaultParallelism * 8)
      .map { i =>
        val s = graft.synth.Synth.seedUrl(i)
        val pay = graft.synth.Synth.fetch(s.url, seed)
        val r = graft.pipeline.UrlPipeline.process(s.url, pay)
        (if (r.ok) 1L else 0L) + r.pieces.size
      }.reduce(_ + _)
  }

  /** Allocation-free control job: same scheduling shape, pure CPU. */
  private def cpuControl(spark: SparkSession, n: Long): Long = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism * 8)
      .map { i =>
        var z = i * 0x9E3779B97F4A7C15L; var k = 0
        while (k < 2000) { z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L; k += 1 }
        z
      }.reduce(_ ^ _)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** One (warmup + timed run) of `job` in a fresh local[cpus] session. */
  private def oneRun(cpus: Int, warm: SparkSession => Unit,
                     job: SparkSession => Unit): Double = {
    val s = session(cpus)
    try {
      warm(s)
      val t0 = System.nanoTime()
      job(s)
      (System.nanoTime() - t0) / 1e9
    } finally s.stop()
  }

  /** Interleaved A/B/A/B measurement of a core-count pair: each rep
    * measures both levels back-to-back so monotone machine drift lands
    * on both sides of the ratio; medians kill one-off outliers. The
    * RATIO of record is the median of per-rep ratios (each rep's pair
    * shares one machine window), not a ratio of independently-medianed
    * walls — the latter can pair a lucky window at one level with an
    * unlucky one at the other. */
  private def timePairMedian(cpusA: Int, cpusB: Int, reps: Int,
                             warm: SparkSession => Unit,
                             job: SparkSession => Unit): (Double, Double, Double) = {
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      as += oneRun(cpusA, warm, job)
      bs += oneRun(cpusB, warm, job)
    }
    val ratios = as.zip(bs).map { case (a, b) => a / b }.toSeq
    (median(as.toSeq), median(bs.toSeq), median(ratios))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "40000").toInt
    val drainSeeds = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS", "30000").toInt
    val drainSeedsLarge =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS_LARGE", "300000").toInt
    // 5 reps: this box's minute-scale load drift swings single runs by
    // ±30%; interleaving bounds the A/B ratio skew and 5-rep medians
    // keep one bad window from deciding the headline ratio
    val scaleReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES") // dev loop
    val skipScaling = sys.env.contains("SPARK_GRAFT_SKIP_SCALING") // dev loop

    // Engine scratch root — tmpfs by default (Flagship.workRoot): the
    // box's ext4 is shared with other tenants whose IO bursts set the
    // r3/r4 reproducibility gaps; a cluster's storage scales with
    // nodes, so the engine numbers are measured on storage the box
    // actually owns. The DISK-backed drain below quantifies the same
    // engine on the contended ext4 in the same artifact.
    val workRoot = graft.crawl.Flagship.workRoot
    val storageKind = if (workRoot.startsWith("/dev/shm")) "tmpfs" else "disk"

    // 1. query suite — flagship crawl pre-built and timed SEPARATELY so
    // q30..q44 measure their reads, not the shared drain. The suite runs
    // TWICE: the first (cold) pass pays per-process JIT + codegen
    // compilation of every query's generated classes and is reported as
    // one number (`suite_cold_sec`); the per-query timings come from the
    // second (warm) pass — the steady state a resident engine serves
    // queries from, and the only state in which per-query numbers
    // compare across rounds instead of measuring JVM warm-up order.
    val s1 = session(cpus)
    var engineBuildSec = 0.0
    var suiteColdSec = 0.0
    val results =
      if (skipQueries) Seq.empty
      else {
        val e0 = System.nanoTime()
        graft.crawl.Flagship.engine(s1, sfDir)
        engineBuildSec = (System.nanoTime() - e0) / 1e9
        val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
        val c0 = System.nanoTime()
        sorted.foreach { case (name, fn) =>
          try fn(s1, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name cold-pass FAILED: ${e.getMessage}")
          }
        }
        suiteColdSec = (System.nanoTime() - c0) / 1e9
        sorted.map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok = try { fn(s1, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
          // failures are visible in the JSON as negative timings, never
          // as a plausible near-zero wall time
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
      }

    s1.stop()
    // free the query-phase engines (cached DataFrames, snapshot state,
    // and their — possibly tmpfs — scratch dirs) before the drain —
    // round-1 ran the drain in the query session and measured 119.8
    // urls/s under its heap/cache debris vs 554 fresh; the drain is a
    // distinct workload and gets a fresh session, same as each scaling
    // level below does
    graft.crawl.Flagship.cleanup()
    System.gc()

    // 2. frontier drains (full engine), each in a fresh local[N]
    // session. The HEADLINE 30k drain is a median of 3 independent runs
    // (VERDICT r3: one bad IO window on this shared box must not set —
    // or inflate — the quoted number), plus a large-fill run showing
    // throughput holds as the frontier/seen set fill toward design
    // scale, plus the bucketed-claim run, plus an interleaved drain
    // scaling pair (the north-rule metric measured on the drain itself,
    // not just the map stage).
    val drainBatch = sys.env.getOrElse("SPARK_GRAFT_DRAIN_BATCH", "8192").toInt
    val seenMode = sys.env.getOrElse("SPARK_GRAFT_SEEN_MODE", "auto")
    val drainReps = sys.env.getOrElse("SPARK_GRAFT_DRAIN_REPS", "3").toInt
    final case class DrainRun(batches: Long, processed: Long, wall: Double,
                              initSec: Double, phases: Map[String, Double])
    val cleanupDirs = scala.collection.mutable.LinkedHashSet.empty[String]
    def runDrain(seeds: Int, claimMode: String = "window",
                 drainCpus: Int = cpus, root: String = workRoot,
                 batch: Int = drainBatch, maxBatches: Int = 1000,
                 batchMs: Long = 600000L): DrainRun = {
      val drainDir = s"$root/drain_${drainCpus}_${seeds}_$claimMode"
      rmrf(drainDir)
      cleanupDirs += drainDir
      val s = session(drainCpus)
      try {
        // warm-up: a tiny throwaway drain in the same session pays the
        // per-process fixed costs — codegen compilation of the
        // claim/gate/commit plans and JIT of the fetch+pipeline path
        // (measured: a ZERO-seed drain alone costs ~8 s cold, ~5 s of
        // it the first gate job) — outside the timed window. The
        // number of record is steady-state throughput of a resident
        // crawler, the state every batch after the first runs in; a
        // cold 256-url drain would otherwise bill identical one-time
        // JVM costs to BOTH levels of the scaling pair, flattening the
        // ratio into a JVM-warmup measurement.
        val warmDir = s"${drainDir}_warm"
        val wEng = new graft.crawl.CrawlEngine(s, warmDir,
          graft.crawl.CrawlConfig(batchSize = 128, seenMode = seenMode,
            claimMode = claimMode))
        wEng.init(256)
        wEng.drain()
        rmrf(warmDir)
        val eng = new graft.crawl.CrawlEngine(s, drainDir,
          graft.crawl.CrawlConfig(batchSize = batch, seenMode = seenMode,
            claimMode = claimMode, batchMs = batchMs))
        // init = the one-time bulk seed-list commit (a different job
        // shape: one append of `seeds` rows); timed and reported
        // separately from the drain loop it feeds
        val i0 = System.nanoTime()
        eng.init(seeds)
        val initSec = (System.nanoTime() - i0) / 1e9
        // phase decomposition reported for the DRAIN only: init's bulk
        // enqueue shares the same phase counters, so subtract its share
        val initPhases = eng.phaseTotals
        val d0 = System.nanoTime()
        val (batches, processed) = eng.drain(maxBatches)
        val drainPhases = eng.phaseTotals
          .map { case (k, v) => k -> (v - initPhases.getOrElse(k, 0.0)) }
          .filter(_._2 >= 0.005)
        DrainRun(batches, processed, (System.nanoTime() - d0) / 1e9,
          initSec, drainPhases)
      } finally {
        s.stop()
        // tmpfs scratch is RAM — drop each drain's tables the moment
        // the measurement is over instead of letting all runs coexist
        rmrf(drainDir)
      }
    }
    val headlineRuns = (1 to math.max(1, drainReps)).map(_ => runDrain(drainSeeds))
    val headline = headlineRuns.sortBy(_.wall).apply(headlineRuns.length / 2)
    // the SAME drain on the shared ext4 (one run): the disk-contention
    // exposure the tmpfs headline deliberately excludes — both belong
    // in the artifact of record
    val diskRoot = sys.env.getOrElse("SPARK_GRAFT_DISK_ROOT", "/tmp/graft_bench_disk")
    val diskDrain =
      if (diskRoot.nonEmpty && diskRoot != workRoot)
        Some(runDrain(drainSeeds, root = diskRoot))
      else None
    val largeDrain =
      if (drainSeedsLarge > 0 && drainSeedsLarge != drainSeeds)
        Some((drainSeedsLarge, runDrain(drainSeedsLarge)))
      else None
    // the exchange-free bucketed claim path (the multi-executor layout):
    // measured at the standard fill so the file-count-vs-shuffle trade is
    // in the artifact of record; 0 disables
    val drainSeedsBucketed =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS_BUCKETED", drainSeeds.toString).toInt
    val bucketedDrain =
      if (drainSeedsBucketed > 0)
        Some((drainSeedsBucketed, runDrain(drainSeedsBucketed, claimMode = "bucketed")))
      else None
    // drain scaling pair (north rule, measured on the DRAIN): the same
    // seeds drained at local[4] and local[16], interleaved A/B/A/B so
    // machine drift lands on both sides, medians over reps. Measured at
    // COMPUTE-BOUND batch sizes (VERDICT r4 #3): the 8,192-url batches
    // the latency-tuned headline uses leave ~half of each batch as
    // fixed per-batch cost (claim job launch, small-shuffle latency,
    // commit round trips) — an Amdahl statement about sandbox batch
    // sizing, not the engine. A 10^10-url frontier claims millions of
    // urls per politeness window, so the scaling question that matters
    // is asked at amortizing sizes: 100k seeds, 32k batches. The
    // headline's 8k-batch pair remains the latency datapoint (its
    // decomposition ships with the headline drain).
    // Design-scale claim shape for the pair: a 10^10-url frontier
    // claims MILLIONS of urls per politeness window, so the scaling
    // question is asked at window sizes where a batch is compute, not
    // driver round trips — 131k-url batches under a 1-hour politeness
    // planning window (the 10-minute default window politeness-caps
    // claims at ~14k regardless of batchSize). The per-batch driver
    // fixed cost (~2 s of plan construction + small-job latency) is
    // measured and flat; at 8k batches it is ~half of every batch — an
    // Amdahl statement about batch SIZING, not engine scaling.
    val drainScaleSeeds =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_SEEDS", "262144").toInt
    val drainScaleBatch =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_BATCH", "131072").toInt
    // 4 h planning window: at 131k-url batches over a 100-host synthetic
    // universe the 1 h window politeness-starves the SECOND batch to
    // ~20k urls (the hottest zipf host hits its cap) — a half-fixed-cost
    // batch that measures batch sizing, not scaling. The caps are still
    // computed and enforced; at this window they simply don't bind, so
    // both batches run at full load — the design-scale claim-wave shape
    // the north-rule question is about. The headline/large drains keep
    // the binding 10-minute window (politeness behavior is their story).
    val drainScaleBatchMs =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_BATCH_MS", "14400000").toLong
    val drainScaleReps = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_REPS", "3").toInt
    // ... and capped at the FULL-LOAD batches (ceil(seeds/batch)): a
    // zipf-skewed seed list ends in a politeness-starved dribble — the
    // hottest slow-delay hosts dribble cap-sized claims for tens of
    // batches — and that tail is bound by crawl-delay POLICY, not by
    // compute: on a real cluster those batches wait on wall-clock
    // politeness windows at any executor count. The claim sequence is
    // deterministic (politeness + top-B by (priority, seq)), so both
    // levels process the IDENTICAL url set. The headline/large drains
    // above still run the full dribble (that is the faithful whole-job
    // number); the scaling pair asks the north-rule question — does
    // full-load throughput scale with cores — where parallel work
    // exists to scale.
    val drainScaleMaxBatches =
      math.max(1, (drainScaleSeeds + drainScaleBatch - 1) / drainScaleBatch)
    val drainScale =
      if (drainScaleSeeds > 0) {
        val lo = scala.collection.mutable.ArrayBuffer.empty[DrainRun]
        val hi = scala.collection.mutable.ArrayBuffer.empty[DrainRun]
        (1 to drainScaleReps).foreach { _ =>
          lo += runDrain(drainScaleSeeds, drainCpus = 4, batch = drainScaleBatch,
            maxBatches = drainScaleMaxBatches, batchMs = drainScaleBatchMs)
          hi += runDrain(drainScaleSeeds, drainCpus = 16, batch = drainScaleBatch,
            maxBatches = drainScaleMaxBatches, batchMs = drainScaleBatchMs)
        }
        Some((lo.toSeq, hi.toSeq))
      } else None

    // feed-path benches (VERDICT r4 #8): the streaming seed-ingestion
    // twin and the executor-parallel keyword expansion, each timed
    // end-to-end in a fresh session so the numbers guard the paths
    // against bit-rot.
    def timeFeed(body: (SparkSession, String) => (Long, Double)): (Long, Double) = {
      val dir = s"$workRoot/feed_${System.nanoTime()}"
      cleanupDirs += dir
      val s = session(cpus)
      try body(s, dir) finally { s.stop(); rmrf(dir) }
    }
    val streamSeedsN = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEEDS", "50000").toInt
    val streamFeed =
      if (streamSeedsN > 0)
        Some(timeFeed { (s, dir) =>
          val watch = java.nio.file.Paths.get(dir, "watch")
          java.nio.file.Files.createDirectories(watch)
          val lines = graft.synth.Synth
            .seedUrls(streamSeedsN, 100, graft.synth.Synth.DefaultSeed)
            .map(_.url).mkString("\n")
          java.nio.file.Files.writeString(watch.resolve("seeds-0.txt"), lines)
          val eng = new graft.crawl.CrawlEngine(s, s"$dir/engine")
          val t0 = System.nanoTime()
          val q = eng.streamSeeds(watch.toString)
          try q.processAllAvailable() finally q.stop()
          val wall = (System.nanoTime() - t0) / 1e9
          val n = eng.seenSet.count()
          (n, wall)
        })
      else None
    val searchKwds = sys.env.getOrElse("SPARK_GRAFT_SEARCH_KWDS", "200").toInt
    val searchFeed =
      if (searchKwds > 0)
        Some(timeFeed { (s, dir) =>
          val eng = new graft.crawl.CrawlEngine(s, s"$dir/engine")
          eng.enqueueSearches((1 to searchKwds).map(i => s"query $i"))
          val t0 = System.nanoTime()
          val (_, urls) = eng.searchBatchParallel(searchKwds)
          (urls, (System.nanoTime() - t0) / 1e9)
        })
      else None

    // 3+4. scaling pairs (interleaved medians) + allocation-free controls
    val warmN = math.min(2000, scaleN)
    def stageWarm(s: SparkSession): Unit = { processStage(s, warmN); () }
    def stageJob(s: SparkSession): Unit = { processStage(s, scaleN); () }
    val ((wall4, wall16, r416), (wall8, wall32, r832),
         (_, _, ctlR416), (_, _, ctlR832)) =
      if (skipScaling)
        ((-1.0, -1.0, 1.0), (-1.0, -1.0, 1.0), (-1.0, -1.0, 1.0), (-1.0, -1.0, 1.0))
      else {
        def ctlWarm(s: SparkSession): Unit = { cpuControl(s, 100000L); () }
        def ctlJob(s: SparkSession): Unit = { cpuControl(s, 2000000L); () }
        (timePairMedian(4, 16, scaleReps, stageWarm, stageJob),
         timePairMedian(8, 32, scaleReps, stageWarm, stageJob),
         timePairMedian(4, 16, scaleReps, ctlWarm, ctlJob),
         timePairMedian(8, 32, scaleReps, ctlWarm, ctlJob))
      }
    val eff416 = r416 / 4.0
    val eff832 = r832 / 4.0
    val ctlEff416 = ctlR416 / 4.0
    val ctlEff832 = ctlR832 / 4.0

    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    def phaseJson(ph: Map[String, Double]): String =
      ph.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.2f""" }
        .mkString("{", ",", "}")
    val headlineRunsJson = headlineRuns
      .map(r => f"${r.processed / r.wall}%.1f").mkString("[", ",", "]")
    val largeJson = largeDrain.map { case (seeds, r) =>
      f""""frontier_drain_large":{"seeds":$seeds,"urls_processed":${r.processed},"batches":${r.batches},"wall_sec":${r.wall}%.3f,"init_sec":${r.initSec}%.3f,"urls_per_sec":${r.processed / r.wall}%.1f,"warm_session":true,"storage":"$storageKind"},"""
    }.getOrElse("")
    val diskJson = diskDrain.map { r =>
      f""""frontier_drain_disk":{"seeds":$drainSeeds,"urls_processed":${r.processed},"batches":${r.batches},"wall_sec":${r.wall}%.3f,"init_sec":${r.initSec}%.3f,"urls_per_sec":${r.processed / r.wall}%.1f,"warm_session":true,"storage":"disk","phase_sec":${phaseJson(r.phases)}},"""
    }.getOrElse("")
    val bucketedJson = bucketedDrain.map { case (seeds, r) =>
      f""""frontier_drain_bucketed":{"seeds":$seeds,"urls_processed":${r.processed},"batches":${r.batches},"wall_sec":${r.wall}%.3f,"init_sec":${r.initSec}%.3f,"urls_per_sec":${r.processed / r.wall}%.1f,"warm_session":true,"claim_mode":"bucketed","storage":"$storageKind"},"""
    }.getOrElse("")
    val drainScaleJson = drainScale.map { case (los, his) =>
      // efficiency = MEDIAN OF PER-REP RATIOS, not a ratio of medians:
      // each rep's local[4] and local[16] runs execute back-to-back in
      // the same machine window, so the per-rep ratio is window-
      // controlled — medianing the walls separately can pair a lucky
      // local[4] window with an unlucky local[16] one (observed ±25%
      // swing on the ratio from exactly that). The per-rep ratio list
      // ships in the artifact so the spread is visible.
      val effs = los.zip(his).map { case (l, h) => (l.wall / h.wall) / 4.0 }
      val eff = median(effs)
      val lo = los.sortBy(_.wall).apply(los.length / 2)
      val hi = his.sortBy(_.wall).apply(his.length / 2)
      val effsJson = effs.map(e => f"$e%.3f").mkString("[", ",", "]")
      f""""drain_scaling":{"job":"frontier drain $drainScaleSeeds seeds","method":"per-rep interleaved ratios, median of $drainScaleReps (each rep's 4/16 pair runs back-to-back in one machine window), warm sessions, init excluded, full-load phase only (max_batches caps off the politeness-starved dribble tail — policy wait, not throughput; identical deterministic claims at both levels)","drain_batch":$drainScaleBatch,"batch_ms":$drainScaleBatchMs,"max_batches":$drainScaleMaxBatches,"urls_processed":${lo.processed},"batches":${lo.batches},"storage":"$storageKind",""" +
      f""""wall_local4":${lo.wall}%.3f,"wall_local16":${hi.wall}%.3f,"init_sec_local4":${lo.initSec}%.3f,"init_sec_local16":${hi.initSec}%.3f,""" +
      f""""urls_per_sec_local4":${lo.processed / lo.wall}%.1f,"urls_per_sec_local16":${hi.processed / hi.wall}%.1f,""" +
      f""""efficiency_4_to_16":$eff%.3f,"efficiency_per_rep":$effsJson,""" +
      s""""phase_sec_local4":${phaseJson(lo.phases)},"phase_sec_local16":${phaseJson(hi.phases)}},"""
    }.getOrElse("")
    val feedsJson = {
      val stream = streamFeed.map { case (n, wall) =>
        f""""stream_seeds":{"urls":$n,"wall_sec":$wall%.3f,"urls_per_sec":${n / wall}%.1f}""" }
      val search = searchFeed.map { case (n, wall) =>
        f""""search_parallel":{"urls":$n,"wall_sec":$wall%.3f,"urls_per_sec":${n / wall}%.1f}""" }
      val parts = (stream.toSeq ++ search.toSeq).mkString(",")
      if (parts.isEmpty) "" else s""""feeds":{$parts},"""
    }
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","engine_build_sec":$engineBuildSec%.3f,"suite_cold_sec":$suiteColdSec%.3f,"cc_rounds":${graft.queries.Dedup.lastCcRounds.get()},""" +
      f""""frontier_drain":{"seeds":$drainSeeds,"urls_processed":${headline.processed},"batches":${headline.batches},"wall_sec":${headline.wall}%.3f,"init_sec":${headline.initSec}%.3f,"urls_per_sec":${headline.processed / headline.wall}%.1f,"method":"median of $drainReps warm-session drains (steady-state: per-session JIT/codegen paid by a 256-url warm-up drain; one-time seed-list init timed separately as init_sec)","runs_urls_per_sec":$headlineRunsJson,"phase_sec":${phaseJson(headline.phases)},"warm_session":true,"seen_mode":"$seenMode","drain_batch":$drainBatch,"storage":"$storageKind","skip_queries":$skipQueries},""" +
      diskJson + largeJson + bucketedJson + drainScaleJson + feedsJson +
      f""""scaling":{"job":"fetch+process $scaleN urls","method":"interleaved median of $scaleReps",""" +
      f""""wall_local4":$wall4%.3f,"wall_local16":$wall16%.3f,"efficiency_4_to_16":$eff416%.3f,""" +
      f""""wall_local8":$wall8%.3f,"wall_local32":$wall32%.3f,"efficiency_8_to_32":$eff832%.3f,""" +
      f""""control_efficiency_4_to_16":$ctlEff416%.3f,"control_efficiency_8_to_32":$ctlEff832%.3f,""" +
      f""""thr_local32":${scaleN / wall32}%.1f}}"""
    // file copy so the driver's parser never depends on sbt log framing
    // (round-1 BENCH had "parsed": null — the JSON line carried an
    // "[info] " prefix); build.sbt also sets run/outputStrategy to
    // StdoutOutput so the println below lands unprefixed
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    println(json)
    // never leave RAM-backed scratch behind: every drain/feed dir this
    // run created, plus any engine dirs and the sessions' local dir
    // (shuffle scratch), goes away with the run
    cleanupDirs.foreach(rmrf)
    graft.crawl.Flagship.cleanup()
    rmrf(s"$workRoot/spark_local")
  }

  private def rmrf(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
