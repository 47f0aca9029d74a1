package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev diagnostic (not part of the driver contract): isolates the
  * drain's process-phase scaling behavior at compute-bound batch
  * sizes; its measurements set the engine's cache/heap choices (see
  * build.sbt -Xms note and the processed-cache comment in CrawlEngine).
  * The phase = repartition + fetch/pipeline map + CACHE of wide rows
  * (~64 KB PNG bytes each) + column-pruned ok-count. Variants:
  *   b = cache() (current engine behavior, columnar, compressed)
  *   d = cache() with inMemoryColumnarStorage.compressed=false
  *   s = persist(MEMORY_AND_DISK_SER)
  *   e = cache() with bytes stripped (upper bound: no byte-array cache)
  *   a = map+reduce only (no cache at all — pure compute floor)
  */
object DiagScale {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val localDir = s"${graft.crawl.Flagship.workRoot}/spark_local_diag"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(localDir))
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(131072)
    val variants = args.drop(1).headOption.getOrElse("bdse")
    val seed = graft.synth.Synth.DefaultSeed
    def procRow(i: Long): graft.crawl.ProcessedUrl = {
      val sd = graft.synth.Synth.seedUrl(i)
      val pay = graft.synth.Synth.fetch(sd.url, seed)
      val r = graft.pipeline.UrlPipeline.process(sd.url, pay)
      val m = r.media
      graft.crawl.ProcessedUrl(i, sd.url, "h", 0, i, 0L,
        ok = r.ok, error = r.error,
        image_id = m.map(_.image_id).orNull,
        bytes = m.map(_.bytes).getOrElse(Array.emptyByteArray),
        w = m.map(_.w).getOrElse(0), h = m.map(_.h).getOrElse(0),
        fmt = m.map(_.fmt).orNull, src_fmt = m.map(_.src_fmt).orNull,
        caption = m.map(_.caption).orNull,
        phash = m.map(_.phash).getOrElse(0L),
        pieces = r.pieces,
        speech_duration_sec = 0.0, subs_quality = 0.0,
        utilization_rate = 0.0, good_pieces = 0, total_pieces = 0,
        outlinks = Seq.empty)
    }
    Seq(4, 16, 4, 16).foreach { cpus =>
      val s = session(cpus)
      import s.implicits._
      def time(tag: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[diag] cpus=$cpus $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      def src = s.range(0, n, 1, s.sparkContext.defaultParallelism * 8)
        .as[Long].map(procRow)
      // warm JIT
      s.range(0, 2000, 1, cpus * 8).map(i => procRow(i).bytes.length.toLong).reduce(_ + _)
      if (variants.contains('a'))
        time("a_map_reduce") {
          s.range(0, n, 1, cpus * 8).map(i => procRow(i).bytes.length.toLong).reduce(_ + _)
        }
      if (variants.contains('b'))
        time("b_cache") {
          val d = src.cache()
          d.filter(org.apache.spark.sql.functions.col("ok")).count()
          d.unpersist(true)
        }
      if (variants.contains('d'))
        time("d_cache_nocompress") {
          s.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
          val d = src.cache()
          d.filter(org.apache.spark.sql.functions.col("ok")).count()
          d.unpersist(true)
          s.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
        }
      if (variants.contains('s'))
        time("s_persist_ser") {
          val d = src.persist(StorageLevel.MEMORY_AND_DISK_SER)
          d.filter(org.apache.spark.sql.functions.col("ok")).count()
          d.unpersist(true)
        }
      if (variants.contains('e'))
        time("e_cache_nobytes") {
          val d = s.range(0, n, 1, s.sparkContext.defaultParallelism * 8)
            .as[Long].map(i => procRow(i).copy(bytes = Array.emptyByteArray)).cache()
          d.filter(org.apache.spark.sql.functions.col("ok")).count()
          d.unpersist(true)
        }
      if (variants.contains('p'))
        time("p_parquet_scratch") {
          val dir = s"${graft.crawl.Flagship.workRoot}/diag_scratch_$cpus"
          src.write.mode("overwrite").parquet(dir)
          val back = s.read.parquet(dir)
          back.filter(org.apache.spark.sql.functions.col("ok")).count()
          graft.crawl.Flagship.rmrf(dir)
        }
      if (variants.contains('q'))
        time("q_parquet_scratch_uncompressed") {
          val dir = s"${graft.crawl.Flagship.workRoot}/diag_scratch_u$cpus"
          src.write.mode("overwrite")
            .option("compression", "uncompressed").parquet(dir)
          val back = s.read.parquet(dir)
          back.filter(org.apache.spark.sql.functions.col("ok")).count()
          graft.crawl.Flagship.rmrf(dir)
        }
      s.stop()
    }
  }
}
