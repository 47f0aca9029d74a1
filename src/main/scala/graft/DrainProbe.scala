package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the driver contract): one warm-session drain
  * with an arbitrary claim mode, printing wall + the full phase
  * decomposition — Bench's frozen JSON only carries phases for the
  * window-mode headline. Usage:
  *   sbt "runMain graft.DrainProbe bucketed 30000"
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("window")
    val seeds = args.drop(1).headOption.map(_.toInt).getOrElse(30000)
    val batch = args.drop(2).headOption.map(_.toInt).getOrElse(8192)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val root = s"${graft.crawl.Flagship.workRoot}/drain_probe"
    graft.crawl.Flagship.rmrf(root)
    val localDir = s"$root/spark_local"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      val wEng = new graft.crawl.CrawlEngine(s, s"$root/warm",
        graft.crawl.CrawlConfig(batchSize = 128, claimMode = mode))
      wEng.init(256); wEng.drain()
      val eng = new graft.crawl.CrawlEngine(s, s"$root/main",
        graft.crawl.CrawlConfig(batchSize = batch, claimMode = mode))
      val i0 = System.nanoTime()
      eng.init(seeds)
      val initSec = (System.nanoTime() - i0) / 1e9
      val initPhases = eng.phaseTotals
      val d0 = System.nanoTime()
      val (batches, processed) = eng.drain()
      val wall = (System.nanoTime() - d0) / 1e9
      val phases = eng.phaseTotals
        .map { case (k, v) => k -> (v - initPhases.getOrElse(k, 0.0)) }
        .filter(_._2 >= 0.005).toSeq.sortBy(-_._2)
      println(f"[probe] mode=$mode seeds=$seeds batches=$batches processed=$processed wall=$wall%.2f init=$initSec%.2f urls_per_sec=${processed / wall}%.1f")
      phases.foreach { case (k, v) => println(f"[probe]   $k%-18s $v%.2f s") }
    } finally {
      s.stop()
      graft.crawl.Flagship.rmrf(root)
    }
  }
}
