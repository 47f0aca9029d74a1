package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Three sections:
  *  1. the query suite at local[SPARK_GRAFT_CPUS] over SPARK_GRAFT_SF_DIR;
  *  2. frontier-drain: full crawl engine, urls/sec + wall (BASELINE.md
  *     "URLs fetched/sec");
  *  3. scaling evidence (north rule, sandbox proxy for N→4N executors):
  *     the fetch+process stage over the same synthetic url set at
  *     local[8] vs local[32]; efficiency = (thr32/thr8)/4.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "40000").toInt
    val drainSeeds = sys.env.getOrElse("SPARK_GRAFT_DRAIN_SEEDS", "30000").toInt

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES") // dev loop

    // 1. query suite
    val s1 = session(cpus)
    val results =
      if (skipQueries) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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

    s1.stop()
    // free the query-phase engines (cached DataFrames, snapshot state)
    // before the drain — round-1 ran the drain in the query session and
    // measured 119.8 urls/s under its heap/cache debris vs 554 fresh;
    // the drain is a distinct workload and gets a fresh session, same
    // as each scaling level below does
    graft.crawl.Flagship.reset()
    System.gc()

    // 2. frontier drain (full engine) in a fresh local[cpus] session
    val drainDir = s"/tmp/graft_bench_drain_$cpus"
    rmrf(drainDir)
    val drainBatch = sys.env.getOrElse("SPARK_GRAFT_DRAIN_BATCH", "8192").toInt
    val seenMode = sys.env.getOrElse("SPARK_GRAFT_SEEN_MODE", "auto")
    val s2 = session(cpus)
    val eng = new graft.crawl.CrawlEngine(s2, drainDir,
      graft.crawl.CrawlConfig(batchSize = drainBatch, seenMode = seenMode))
    val d0 = System.nanoTime()
    eng.init(drainSeeds)
    val (batches, processed) = eng.drain()
    val drainWall = (System.nanoTime() - d0) / 1e9
    s2.stop()

    // 3. scaling: same job, two parallelism levels; best-of-3 per level
    // (single-machine runs have multi-second noise from GC/page cache)
    def timeStage(cpus: Int): Double = {
      val s = session(cpus)
      try {
        processStage(s, math.min(2000, scaleN)) // warm-up JIT/codegen
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          processStage(s, scaleN)
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally s.stop()
    }
    // two N→4N pairs: 4→16 leaves JVM/GC headroom (the closer proxy to
    // 4x independent executors, which would also 4x their heaps);
    // 8→32 saturates every hardware core of this single JVM
    val wall4 = timeStage(4)
    val wall16 = timeStage(16)
    val wall8 = timeStage(8)
    val wall32 = timeStage(32)
    val eff416 = (wall4 / wall16) / 4.0
    val eff832 = (wall8 / wall32) / 4.0

    // allocation-free control at the same pair: separates the scheduler/
    // hardware ceiling from shared-heap allocation pressure (a real
    // cluster's executors would each own their heap; this JVM's 32
    // threads share one young gen)
    def cpuControl(spark: SparkSession, n: Long): Long = {
      import spark.implicits._
      spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism * 8)
        .map { i =>
          var z = i * 0x9E3779B97F4A7C15L; var k = 0
          while (k < 2000) { z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L; k += 1 }
          z
        }.reduce(_ ^ _)
    }
    def timeControl(cpus: Int): Double = {
      val s = session(cpus)
      try {
        cpuControl(s, 100000L)
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); cpuControl(s, 2000000L)
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally s.stop()
    }
    val ctl8 = timeControl(8)
    val ctl32 = timeControl(32)
    val ctlEff832 = (ctl8 / ctl32) / 4.0

    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      f""""frontier_drain":{"seeds":$drainSeeds,"urls_processed":$processed,"batches":$batches,"wall_sec":$drainWall%.3f,"urls_per_sec":${processed / drainWall}%.1f,"fresh_session":true,"seen_mode":"$seenMode","drain_batch":$drainBatch,"skip_queries":$skipQueries},""" +
      f""""scaling":{"job":"fetch+process $scaleN urls",""" +
      f""""wall_local4":$wall4%.3f,"wall_local16":$wall16%.3f,"efficiency_4_to_16":$eff416%.3f,""" +
      f""""wall_local8":$wall8%.3f,"wall_local32":$wall32%.3f,"efficiency_8_to_32":$eff832%.3f,""" +
      f""""control_efficiency_8_to_32":$ctlEff832%.3f,"thr_local32":${scaleN / wall32}%.1f}}"""
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
