package graft.frontier

import graft.filter.CuckooFilter
import graft.table.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned cuckoo-filter URL-seen set (north rule; SURVEY.md §4.2).
  *
  * State: `nShards` rows of (shard, filterBytes, count) in a
  * SnapshotTable — shard = fp mod nShards. All shard filters share
  * `shardBuckets` so delta merges stay bucket-aligned.
  *
  * probe(): tier-1 membership as a broadcast-backed scalar function —
  * zero shuffles, stays inside the candidate scan. false ⇒ DEFINITELY
  * new (skips the exact anti-join); true ⇒ verify against exact state.
  * insert(): one shuffle (groupByKey on shard) that builds the delta
  * filter AND merges it with the broadcast existing shard in a single
  * pass; only touched shards are upserted.
  *
  * Scale note: filters are broadcast while the shard group fits
  * executor memory (16 × 128 KB here; ~GBs before this breaks). At
  * 10^10 urls the same code co-partitions candidates by shard instead
  * of broadcasting — the table layout and two-tier semantics are
  * unchanged, which is why the broadcast stays an implementation
  * detail behind probe().
  */
final class SeenShards(spark: SparkSession, table: SnapshotTable,
                       nShards: Int, shardBuckets: Int) {

  import spark.implicits._

  private def shardOf = pmod(col("fp"), lit(nShards)).cast("int")

  /** Current shard bytes (one driver collect) — callers inside a batch
    * load once and hand the same snapshot to probe() and insert(). */
  def snapshotBytes(): Map[Int, Array[Byte]] =
    if (table.currentId.isEmpty || table.isEmpty) Map.empty
    else table.read().select("shard", "bytes")
      .as[(Int, Array[Byte])].collect().toMap

  /** Adds a `maybeSeen` boolean to `candidates` (needs an `fp` column). */
  def probe(candidates: DataFrame,
            preloaded: Option[Map[Int, Array[Byte]]] = None): DataFrame = {
    val bytes = preloaded.getOrElse(snapshotBytes())
    if (bytes.isEmpty)
      return candidates.withColumn("maybeSeen", lit(false))
    val bc = spark.sparkContext.broadcast(bytes)
    val n = nShards
    val probeUdf = udf(new ProbeFn(bc, n))
    candidates.withColumn("maybeSeen", probeUdf(col("fp")))
  }

  /** Merge new fingerprints into the shard filters (upsert commit). */
  def insert(newFps: DataFrame, metrics: Map[String, Double] = Map.empty,
             preloaded: Option[Map[Int, Array[Byte]]] = None): Unit = {
    val buckets = shardBuckets
    val bc = spark.sparkContext.broadcast(preloaded.getOrElse(snapshotBytes()))
    val merged = newFps.select(col("fp")).withColumn("shard", shardOf)
      .as[(Long, Int)]
      .groupByKey(_._2)
      .mapGroups { (shard, rows) =>
        val f = bc.value.get(shard) match {
          case Some(existing) => CuckooFilter.deserialize(existing)
          case None => CuckooFilter.withBuckets(buckets)
        }
        rows.map(_._1).toArray.sorted.foreach(f.insert)
        (shard, f.serialize(), f.count)
      }
      .toDF("shard", "bytes", "count")
    if (table.currentId.isEmpty) table.commitAppend(merged, metrics)
    else table.commitUpsert(merged, metrics)
  }

  /** Exact expected-membership helper for tests. */
  def totalCount: Long =
    if (table.currentId.isEmpty) 0L
    else table.read().agg(sum("count")).head.getLong(0)
}

/** Serializable probe closure: deserializes each touched shard once
  * per executor (lazy cache), then answers from memory. */
private class ProbeFn(
    bc: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]],
    nShards: Int) extends (Long => Boolean) with Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, CuckooFilter]()
  override def apply(fp: Long): Boolean = {
    val shard = java.lang.Math.floorMod(fp, nShards.toLong).toInt
    bc.value.get(shard) match {
      case None => false
      case Some(bytes) =>
        cache.computeIfAbsent(shard, _ => CuckooFilter.deserialize(bytes))
          .mightContain(fp)
    }
  }
}
