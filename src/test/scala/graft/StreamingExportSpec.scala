package graft

import graft.export.ExportQuery
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts match the batch twin after drain") {
    import spark.implicits._
    // stream source needs a directory of parquet; sf dir has one file per
    // table, so point at a copy of events.parquet alone
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.windowedCounts(spark, dir.toString)
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    // append mode only emits windows below the watermark; compare those
    val got = spark.table("wc")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    val batch = EventStream.windowedCountsBatch(spark, dir.toString)
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1.getTime, r._2) -> (r._3, r._4)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, v) => assert(batch(k) === v, s"window $k") }
  }

  test("streaming mapGroupsWithState sessionization == batch q41 (which DuckDB checks)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evsess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.sessionCounts(spark, dir.toString)
      .writeStream.format("memory").queryName("sc").outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sc")
      .as[EventStream.SessionAgg].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.n_sessions >= 1 && r.n_sessions <= r.n_events)
    }
    // the final streaming state per user must equal the batch session
    // window q41 — the query the driver's DuckDB oracle verifies, so
    // the streaming operator is transitively oracle-checked
    val streamed = rows.groupBy(_.user_id)
      .map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    val batch = SparkEntry.queries("q41_session_window")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(batch.keySet === streamed.keySet)
    batch.foreach { case (u, (ne, ns)) =>
      val s = streamed(u)
      assert(s.n_events === ne && s.n_sessions === ns, s"user $u")
    }
  }

  test("export split is reproducible across partition counts") {
    import spark.implicits._
    val media = (0 until 500).map { i =>
      (s"v$i", s"каждый документ ${"слово " * (i % 5 + 2)}$i текст")
    }.toDF("image_id", "caption")
    val a = ExportQuery.split(media.repartition(1))
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    val b = ExportQuery.split(media.repartition(13))
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(a === b)
    val counts = a.groupBy(_._3).view.mapValues(_.size).toMap
    val n = a.size
    assert(counts("train") === math.floor(n * 0.8).toInt)
    assert(counts.getOrElse("dev", 0) === math.floor(n * 0.9).toInt - math.floor(n * 0.8).toInt)
  }

  test("export full-clean keeps only Cyrillic/hyphen/space") {
    import spark.implicits._
    val media = Seq(("a", "Привет abc 123 мир-город")).toDF("image_id", "caption")
    val r = ExportQuery.split(media, minWords = 1)
      .as[(String, String, String)].collect()
    assert(r.head._2 === "привет   мир-город")
  }
}
