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
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
    * on both sides of the ratio; medians kill one-off outliers. */
  private def timePairMedian(cpusA: Int, cpusB: Int, reps: Int,
                             warm: SparkSession => Unit,
                             job: SparkSession => Unit): (Double, Double) = {
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      as += oneRun(cpusA, warm, job)
      bs += oneRun(cpusB, warm, job)
    }
    (median(as.toSeq), median(bs.toSeq))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "40000").toInt
    val drainSeeds = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS", "30000").toInt
    val drainSeedsLarge =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS_LARGE", "100000").toInt
    // 5 reps: this box's minute-scale load drift swings single runs by
    // ±30%; interleaving bounds the A/B ratio skew and 5-rep medians
    // keep one bad window from deciding the headline ratio
    val scaleReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES") // dev loop

    // 1. query suite — flagship crawl pre-built and timed SEPARATELY so
    // q30..q44 measure their reads, not the shared drain
    val s1 = session(cpus)
    var engineBuildSec = 0.0
    val results =
      if (skipQueries) Seq.empty
      else {
        val e0 = System.nanoTime()
        graft.crawl.Flagship.engine(s1, sfDir)
        engineBuildSec = (System.nanoTime() - e0) / 1e9
        SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    // free the query-phase engines (cached DataFrames, snapshot state)
    // before the drain — round-1 ran the drain in the query session and
    // measured 119.8 urls/s under its heap/cache debris vs 554 fresh;
    // the drain is a distinct workload and gets a fresh session, same
    // as each scaling level below does
    graft.crawl.Flagship.reset()
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
                              phases: Map[String, Double])
    def runDrain(seeds: Int, claimMode: String = "window",
                 drainCpus: Int = cpus): DrainRun = {
      val drainDir = s"/tmp/graft_bench_drain_${drainCpus}_${seeds}_$claimMode"
      rmrf(drainDir)
      val s = session(drainCpus)
      try {
        val eng = new graft.crawl.CrawlEngine(s, drainDir,
          graft.crawl.CrawlConfig(batchSize = drainBatch, seenMode = seenMode,
            claimMode = claimMode))
        val d0 = System.nanoTime()
        eng.init(seeds)
        val (batches, processed) = eng.drain()
        DrainRun(batches, processed, (System.nanoTime() - d0) / 1e9, eng.phaseTotals)
      } finally s.stop()
    }
    val headlineRuns = (1 to math.max(1, drainReps)).map(_ => runDrain(drainSeeds))
    val headline = headlineRuns.sortBy(_.wall).apply(headlineRuns.length / 2)
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
    // machine drift lands on both sides, medians over reps. The drain
    // includes the driver commit loop, whose per-batch fixed cost does
    // not shrink with cores — the phase decomposition quantifies that
    // share, and the allocation-free control + the map-stage pair below
    // bound the machine ceiling.
    val drainScaleSeeds =
      sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_SEEDS", drainSeeds.toString).toInt
    val drainScaleReps = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SCALE_REPS", "3").toInt
    val drainScale =
      if (drainScaleSeeds > 0) {
        val lo = scala.collection.mutable.ArrayBuffer.empty[DrainRun]
        val hi = scala.collection.mutable.ArrayBuffer.empty[DrainRun]
        (1 to drainScaleReps).foreach { _ =>
          lo += runDrain(drainScaleSeeds, drainCpus = 4)
          hi += runDrain(drainScaleSeeds, drainCpus = 16)
        }
        Some((lo.sortBy(_.wall).apply(lo.length / 2),
              hi.sortBy(_.wall).apply(hi.length / 2)))
      } else None

    // 3+4. scaling pairs (interleaved medians) + allocation-free controls
    val warmN = math.min(2000, scaleN)
    def stageWarm(s: SparkSession): Unit = { processStage(s, warmN); () }
    def stageJob(s: SparkSession): Unit = { processStage(s, scaleN); () }
    val (wall4, wall16) = timePairMedian(4, 16, scaleReps, stageWarm, stageJob)
    val (wall8, wall32) = timePairMedian(8, 32, scaleReps, stageWarm, stageJob)
    val eff416 = (wall4 / wall16) / 4.0
    val eff832 = (wall8 / wall32) / 4.0

    def ctlWarm(s: SparkSession): Unit = { cpuControl(s, 100000L); () }
    def ctlJob(s: SparkSession): Unit = { cpuControl(s, 2000000L); () }
    val (ctl4, ctl16) = timePairMedian(4, 16, scaleReps, ctlWarm, ctlJob)
    val (ctl8, ctl32) = timePairMedian(8, 32, scaleReps, ctlWarm, ctlJob)
    val ctlEff416 = (ctl4 / ctl16) / 4.0
    val ctlEff832 = (ctl8 / ctl32) / 4.0

    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    def phaseJson(ph: Map[String, Double]): String =
      ph.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.2f""" }
        .mkString("{", ",", "}")
    val headlineRunsJson = headlineRuns
      .map(r => f"${r.processed / r.wall}%.1f").mkString("[", ",", "]")
    val largeJson = largeDrain.map { case (seeds, r) =>
      f""""frontier_drain_large":{"seeds":$seeds,"urls_processed":${r.processed},"batches":${r.batches},"wall_sec":${r.wall}%.3f,"urls_per_sec":${r.processed / r.wall}%.1f,"fresh_session":true},"""
    }.getOrElse("")
    val bucketedJson = bucketedDrain.map { case (seeds, r) =>
      f""""frontier_drain_bucketed":{"seeds":$seeds,"urls_processed":${r.processed},"batches":${r.batches},"wall_sec":${r.wall}%.3f,"urls_per_sec":${r.processed / r.wall}%.1f,"fresh_session":true,"claim_mode":"bucketed"},"""
    }.getOrElse("")
    val drainScaleJson = drainScale.map { case (lo, hi) =>
      val eff = (lo.wall / hi.wall) / 4.0
      f""""drain_scaling":{"job":"frontier drain $drainScaleSeeds seeds","method":"interleaved median of $drainScaleReps",""" +
      f""""wall_local4":${lo.wall}%.3f,"wall_local16":${hi.wall}%.3f,""" +
      f""""urls_per_sec_local4":${lo.processed / lo.wall}%.1f,"urls_per_sec_local16":${hi.processed / hi.wall}%.1f,""" +
      f""""efficiency_4_to_16":$eff%.3f,""" +
      s""""phase_sec_local4":${phaseJson(lo.phases)},"phase_sec_local16":${phaseJson(hi.phases)}},"""
    }.getOrElse("")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","engine_build_sec":$engineBuildSec%.3f,"cc_rounds":${graft.queries.Dedup.lastCcRounds.get()},""" +
      f""""frontier_drain":{"seeds":$drainSeeds,"urls_processed":${headline.processed},"batches":${headline.batches},"wall_sec":${headline.wall}%.3f,"urls_per_sec":${headline.processed / headline.wall}%.1f,"method":"median of $drainReps fresh-session drains","runs_urls_per_sec":$headlineRunsJson,"phase_sec":${phaseJson(headline.phases)},"fresh_session":true,"seen_mode":"$seenMode","drain_batch":$drainBatch,"skip_queries":$skipQueries},""" +
      largeJson + bucketedJson + drainScaleJson +
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
