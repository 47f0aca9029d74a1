package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface. The reference's crawl loop is a
  * drain-and-stop batch loop (SURVEY.md §2.9 C2 — deliberately NOT
  * streaming), but the engine still exposes the streaming operators a
  * training-data pipeline needs over the events feed: windowed
  * aggregation with watermark, and custom sessionization state via
  * mapGroupsWithState. Tested with the memory sink +
  * processAllAvailable (synchronous over bounded input).
  */
object EventStream {

  val eventsSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** readStream → watermark → tumbling-window agg (append mode). */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  final case class SessionAgg(user_id: Long, n_events: Long, n_sessions: Long)

  /** Custom state: per-user session counting with a 30-minute gap rule
    * — the KeyValueGroupedDataset.mapGroupsWithState path (the
    * operator shape of the reference's VAD sessionizer, §2.10, in its
    * streaming form). */
  def sessionCounts(spark: SparkSession, dir: String): Dataset[SessionAgg] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    spark.readStream.schema(eventsSchema).parquet(dir)
      .select(col("user_id"), col("ts").cast("long").as("tsSec"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          // state: (nEvents, nSessions, lastTsMs)
          var (n, sessions, last) = state.getOption.getOrElse((0L, 0L, Long.MinValue))
          rows.map(_._2 * 1000).toSeq.sorted.foreach { t =>
            n += 1
            if (last == Long.MinValue || t - last > gapMs) sessions += 1
            last = t
          }
          state.update((n, sessions, last))
          SessionAgg(uid, n, sessions)
      }
  }

  /** Batch twin of windowedCounts for oracle-style comparison. */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
}
