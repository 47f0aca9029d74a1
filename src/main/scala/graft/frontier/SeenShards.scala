package graft.frontier

import graft.filter.CuckooFilter
import graft.table.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned cuckoo-filter URL-seen set (north rule; SURVEY.md §4.2).
  *
  * State: `nShards` rows of (shard, filterBytes, count) in a
  * SnapshotTable — shard = fp mod nShards. All shard filters share
  * `shardBuckets` so delta filters merge bucket-aligned.
  *
  * probe(): tier-1 membership — false ⇒ DEFINITELY new (skips the
  * exact anti-join at 100 TB); true ⇒ verify against exact state.
  * insert(): distributed — new fps are grouped per shard into delta
  * filters (sorted insertion ⇒ deterministic bytes), merged with the
  * existing shard row, committed as a key-wise upsert. No driver-side
  * collection of filter bytes anywhere.
  */
final class SeenShards(spark: SparkSession, table: SnapshotTable,
                       nShards: Int, shardBuckets: Int) {

  import spark.implicits._

  private def shardOf = pmod(col("fp"), lit(nShards)).cast("int")

  /** Adds a `maybeSeen` boolean to `candidates` (needs an `fp` column). */
  def probe(candidates: DataFrame): DataFrame = {
    if (table.isEmpty || table.currentId.isEmpty)
      return candidates.withColumn("maybeSeen", lit(false))
    val shards = table.read() // (shard, bytes, count) — nShards rows
    val joined = candidates.withColumn("__shard", shardOf)
      .join(broadcast(shards.withColumnRenamed("shard", "__shard")),
        Seq("__shard"), "left")
    val cols = candidates.columns
    joined.mapPartitions { it =>
      val cache = scala.collection.mutable.HashMap.empty[Int, CuckooFilter]
      it.map { row =>
        val shard = row.getAs[Int]("__shard")
        val fp = row.getAs[Long]("fp")
        val maybe = Option(row.getAs[Array[Byte]]("bytes")) match {
          case None => false
          case Some(bytes) =>
            cache.getOrElseUpdate(shard, CuckooFilter.deserialize(bytes))
              .mightContain(fp)
        }
        (fp, maybe)
      }
    }.toDF("fp", "maybeSeen")
      .join(candidates, Seq("fp"))
      .select((cols.map(col) :+ col("maybeSeen")).toSeq: _*)
  }

  /** Merge new fingerprints into the shard filters (upsert commit). */
  def insert(newFps: DataFrame, metrics: Map[String, Double] = Map.empty): Unit = {
    val buckets = shardBuckets
    val deltas = newFps.select(col("fp")).withColumn("shard", shardOf)
      .as[(Long, Int)]
      .groupByKey(_._2)
      .mapGroups { (shard, rows) =>
        val f = CuckooFilter.buildWithBuckets(buckets, rows.map(_._1))
        (shard, f.serialize(), f.count)
      }
      .toDF("shard", "bytes", "count")
    if (table.currentId.isEmpty) {
      table.commitAppend(deltas, metrics)
    } else {
      val existing = table.read()
      val merged = existing.withColumnRenamed("bytes", "oldBytes")
        .withColumnRenamed("count", "oldCount")
        .join(deltas, Seq("shard"), "full_outer")
        .select(col("shard"), col("oldBytes"),
          coalesce(col("oldCount"), lit(0L)).as("oldCount"),
          col("bytes"), coalesce(col("count"), lit(0L)).as("count"))
        .as[(Int, Array[Byte], Long, Array[Byte], Long)]
        .map { case (shard, oldB, oldC, newB, newC) =>
          (Option(oldB), Option(newB)) match {
            case (Some(o), Some(n)) =>
              val f = CuckooFilter.deserialize(o)
              f.mergeFrom(CuckooFilter.deserialize(n))
              (shard, f.serialize(), f.count)
            case (Some(o), None) => (shard, o, oldC)
            case (None, Some(n)) => (shard, n, newC)
            case (None, None) => (shard, Array.emptyByteArray, 0L)
          }
        }.toDF("shard", "bytes", "count")
      table.commitUpsert(merged, metrics)
    }
  }

  /** Exact expected-membership helper for tests. */
  def totalCount: Long =
    if (table.currentId.isEmpty) 0L
    else table.read().agg(sum("count")).head.getLong(0)
}
