package graft.frontier

import graft.model._
import graft.synth.Synth
import graft.util.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Frontier claim / enqueue / recovery as pure Dataset transformations
  * (SURVEY.md §2.2). The engine composes these with SnapshotTable
  * commits; the parity oracle implements the same spec single-threaded.
  */
object Frontier {

  val NormalPriority = 0

  /** Politeness-budgeted, priority-ordered batch claim (Q3 + C3):
    *  1. per-host rank by (priority, seq) — the FIFO pop order
    *     (utils/csv_utils.py:286-299) within each host lane;
    *  2. cap each host at `batchMs / crawlDelayMs` items (token budget
    *     — the reference's 0.2 s sleep, parse_youtube.py:53, enforced
    *     as claim-rate rather than wall-clock sleeping);
    *  3. global top-`batchSize` by (priority, seq) — planned by Spark
    *     as TakeOrderedAndProject, no single-partition window.
    * Deterministic: ties impossible (seq unique). */
  def claim(pending: DataFrame, policies: DataFrame,
            batchSize: Int, batchMs: Long): DataFrame =
    claimWithDelay(pending,
      p => p.join(broadcast(policies.select("host", "crawlDelayMs")), Seq("host"), "left"),
      batchSize, batchMs)

  /** Claim with the crawl delay computed as a column function of the
    * host instead of a broadcast-joined table — removes a per-batch
    * distinct-hosts job + broadcast (the synthetic policy is
    * deterministic per host, so a table materialization per batch is
    * pure fixed cost; a real deployment would broadcast a slowly-
    * changing robots table once, not per batch). The delay is a pure
    * builtin expression (Synth.crawlDelayMsCol), so the whole claim
    * plan is UDF-free and stays inside whole-stage codegen. */
  def claimBySynthPolicy(pending: DataFrame, seed: Long,
                         batchSize: Int, batchMs: Long): DataFrame =
    claimWithDelay(pending,
      p => p.withColumn("crawlDelayMs", Synth.crawlDelayMsCol(col("host"), seed)),
      batchSize, batchMs)

  private def claimWithDelay(pending: DataFrame,
                             withDelay: DataFrame => DataFrame,
                             batchSize: Int, batchMs: Long): DataFrame = {
    val wHost = Window.partitionBy("host").orderBy("priority", "seq")
    withDelay(pending)
      .withColumn("hostCap",
        greatest(lit(1L), (lit(batchMs) / coalesce(col("crawlDelayMs"), lit(1000L))).cast("long")))
      .withColumn("hrn", row_number().over(wHost))
      .filter(col("hrn") <= col("hostCap"))
      .drop("hrn", "hostCap", "crawlDelayMs")
      .orderBy("priority", "seq")
      .limit(batchSize)
  }

  /** Exchange-free claim over a HOST-BUCKETED frontier table (the
    * 1000-executor layout README.md promises): storage already splits
    * files by `pmod(hash(host), B)`, a key's host never changes, so one
    * task per bucket can do EVERYTHING locally — merge-on-read
    * resolution (latest `__delta_seq` per fp), the pending filter, the
    * per-host politeness budget, and the bucket-local top-`batchSize` —
    * with plain in-memory maps. The per-bucket winners then meet in a
    * single TakeOrderedAndProject. The whole claim plans with ZERO
    * shuffle exchanges (asserted by BucketedClaimSpec), versus the
    * window path's two (resolution by fp + politeness rank by host).
    *
    * Correctness: output is row-identical to
    * `claimBySynthPolicy(readStates(pending))` (equivalence-tested) —
    * per-host rank is bucket-local because hosts never straddle
    * buckets, and the global top-B of per-bucket top-Bs equals the
    * global top-B. Memory: one task holds one bucket's PENDING rows
    * (+ its since-compaction delta shadows); B is chosen so that fits
    * the task budget — at 10^10 pending × ~100 B/row, B = 8192 puts
    * ~120 MB per task. Ordering inside a task sorts the bucket: the
    * same O(n log n) the window path's sort-based exchange pays, minus
    * the network. */
  def claimBucketedBySynthPolicy(tbl: graft.table.SnapshotTable,
                                 spark: SparkSession, seed: Long,
                                 batchSize: Int, batchMs: Long): DataFrame = {
    import spark.implicits._
    val scans = tbl.bucketedStateScan(Set(FrontierState.Pending))
    if (scans.isEmpty) return spark.emptyDataset[FrontierEntry].toDF()
    val cols = Seq("fp", "url", "host", "priority", "seq", "state", "error",
      "discoveredAt", "processedAt", "__delta_seq", "__cand")
    val combined = scans.map(_._2).map(_.select(cols.map(col): _*))
      .reduce(_ unionByName _) // one partition per bucket — no exchange
    val perBucket = combined.mapPartitions { it =>
      // latest version per fp wins (merge-on-read, bucket-closed)
      val latest = new scala.collection.mutable.HashMap[Long, (Long, Boolean, FrontierEntry)]
      it.foreach { r =>
        val fp = r.getLong(0); val ds = r.getLong(9)
        if (!latest.get(fp).exists(_._1 >= ds))
          latest(fp) = (ds, r.getBoolean(10), FrontierEntry(fp, r.getString(1),
            r.getString(2), r.getInt(3), r.getLong(4), r.getString(5),
            r.getString(6), r.getLong(7), r.getLong(8)))
      }
      // politeness budget in claim order, then bucket-local top-B
      val pending = latest.valuesIterator.collect { case (_, true, e) => e }.toArray
      java.util.Arrays.sort(pending, Ordering.by((e: FrontierEntry) => (e.priority, e.seq)))
      val hostUsed = new scala.collection.mutable.HashMap[String, Long]
      val hostCap = new scala.collection.mutable.HashMap[String, Long]
      val out = new scala.collection.mutable.ArrayBuffer[FrontierEntry]
      var i = 0
      while (i < pending.length && out.length < batchSize) {
        val e = pending(i)
        val cap = hostCap.getOrElseUpdate(e.host,
          math.max(1L, batchMs / Synth.hostPolicy(e.host, seed).crawlDelayMs))
        val used = hostUsed.getOrElse(e.host, 0L)
        if (used < cap) { hostUsed(e.host) = used + 1; out += e }
        i += 1
      }
      out.iterator
    }
    // global winners: top-B by (priority, seq) — TakeOrderedAndProject,
    // still no exchange
    perBucket.orderBy("priority", "seq").limit(batchSize).toDF()
  }

  /** Hot-host skew salting for the fetch stage (north rule): hosts with
    * more claimed rows than `targetPerTask` get `ceil(n/target)` salts;
    * repartitioning on (host, salt) spreads them across tasks. */
  def salted(claimed: DataFrame, targetPerTask: Int): DataFrame = {
    val counts = claimed.groupBy("host").agg(count(lit(1)).as("__hn"))
    claimed
      .join(broadcast(counts), Seq("host"))
      .withColumn("salt",
        when(col("__hn") > targetPerTask,
          pmod(col("fp"), ceil(col("__hn") / targetPerTask).cast("int")))
          .otherwise(lit(0)).cast("int"))
      .drop("__hn")
  }

  /** First occurrence within an incoming batch by (priority, seq) —
    * the reference enqueues in pop order, so a dup later in the batch
    * is skipped (T4 first-occurrence semantics). Must run BEFORE the
    * probe so fps are unique downstream. */
  def firstOccurrence(candidates: DataFrame): DataFrame = {
    // min_by aggregation, NOT a row_number window: same row selected
    // (ties impossible — seq unique within a batch), but an aggregate
    // has a map-side PARTIAL: a discovery wave whose outlinks hit a hot
    // key collapses to one row per fp per task BEFORE the exchange,
    // where the window shuffles (and sorts) every candidate row. At a
    // 100 TB discovery wave that is the difference between shuffling
    // O(outlinks) and O(distinct fps × tasks).
    val others = candidates.columns.filterNot(_ == "fp").toSeq
    candidates.groupBy("fp")
      .agg(min_by(struct(others.map(col): _*),
        struct(col("priority"), col("seq"))).as("__r"))
      .select(col("fp") +: others.map(c => col("__r." + c).as(c)): _*)
  }

  /** Enqueue-side dedup gate (Q8, utils/queue_utils.py:61-66): drop
    * candidates already present in the frontier (any state). Expects
    * unique fps. If a `maybeSeen` column is present (cuckoo tier-1
    * verdict), rows flagged false are definitely new and skip the
    * exact anti-join — the 100 TB fast path: only filter-positives
    * pay the big-join toll.
    *
    * `broadcastCandidates`: the exact tier's plan for BOUNDED candidate
    * sets (one batch's outlinks) against a 10^10-key table — a plain
    * anti-join would sort-merge-shuffle the key table every batch.
    * Broadcasting the candidates through a semi-join keeps the key scan
    * map-side (no shuffle of the big side), and the resulting hit set
    * is at most the candidate count, so the final anti-join broadcasts
    * too. Output is byte-identical to the plain plan (equivalence-
    * tested); callers with unbounded candidates (bulk seeding) must
    * leave it off. */
  def dedupGate(candidates: DataFrame, frontierKeys: DataFrame,
                broadcastCandidates: Boolean = false): DataFrame = {
    if (!candidates.columns.contains("maybeSeen"))
      return candidates.join(frontierKeys, Seq("fp"), "left_anti")
    // ONE linear plan, not a definitely-new/verify branch union: a LEFT
    // join against the key set with the filter-positive check folded
    // into the post-join filter. Semantics identical (cuckoo filters
    // have no false negatives, so a maybeSeen=false row can never be in
    // the key table; key fps are unique by the append contract, so the
    // left join never duplicates). The branch-union shape consumed the
    // probed candidates twice — forcing a cache materialization and two
    // extra stages per batch; this shape reads them once, and the join
    // reuses the firstOccurrence agg's hash partitioning on fp (no new
    // candidate-side exchange).
    if (!broadcastCandidates)
      candidates
        .join(frontierKeys.select(col("fp"), lit(true).as("__seen")),
          Seq("fp"), "left")
        .filter(!col("maybeSeen") || col("__seen").isNull)
        .drop("maybeSeen", "__seen")
    else {
      // bounded candidate set vs a 10^10-key table: map-side semi filter
      // of the big side (no shuffle of the key table), then the bounded
      // hit set broadcasts back — candidates never shuffle at all.
      // Caller must cache `candidates`: they are consumed twice here.
      val hits = frontierKeys
        .join(broadcast(candidates.filter(col("maybeSeen")).select("fp")),
          Seq("fp"), "left_semi")
      candidates
        .join(broadcast(hits.select(col("fp"), lit(true).as("__seen"))),
          Seq("fp"), "left")
        .filter(!col("maybeSeen") || col("__seen").isNull)
        .drop("maybeSeen", "__seen")
    }
  }

  /** Crash recovery (Q9, utils/queue_utils.py:6-32): rows stuck in
    * `processing` return to `pending` at RecoveryPriority so they are
    * claimed before all normal rows — prepend semantics. */
  def recover(frontier: DataFrame): DataFrame =
    frontier.filter(col("state") === FrontierState.Processing)
      .withColumn("state", lit(FrontierState.Pending))
      .withColumn("priority", lit(FrontierState.RecoveryPriority))

  /** Candidate URLs → FrontierEntry rows. Robots-disallowed urls enter
    * directly as `failed` (terminal; counted in the seen set).
    *
    * PURE COLUMN expressions (r6): the old typed `.map` forced an
    * object ser/deser boundary in every enqueue — the gate's hot path —
    * breaking whole-stage codegen between the discovery explode and the
    * first-occurrence aggregation. Each scalar has a bit-identical
    * column twin: `Hashing.fpCol`/`hostCol` (pinned by CodecHashSpec),
    * and the robots decision re-derives `Synth.unit(key) < 0.05` as
    * `shiftrightunsigned(xxhash64(key), 11) / 2^53` — the same XXH64
    * kernel and the same IEEE ops (pinned by SourcesOpsSpec's twin
    * test; the single-threaded parity oracle keeps using the scalars,
    * so CrawlParitySpec cross-validates the whole corpus). */
  def toEntries(spark: SparkSession, urls: Dataset[SeedUrl], batchNo: Long,
                seed: Long): DataFrame = {
    val c = Hashing.canonicalizeCol(col("url"))
    // path of the canonical url — scalar twin: Synth.isDisallowed
    // (canonical urls always carry a "/" after the authority, so the
    // scalar's j<0 → "/" branch only fires for "://"-less strings,
    // which keep the whole string as path on both sides)
    val path = when(!col("__c").rlike("(?s)://"),
      col("__c")).otherwise(regexp_replace(col("__c"), "(?s)^.*?://[^/]*", ""))
    // Synth.unit(s"policy:$seed:robots:$host") < 0.05, column form
    val robots =
      shiftrightunsigned(xxhash64(concat(lit(s"policy:$seed:robots:"), col("host"))), 11)
        .cast("double") / lit((1L << 53).toDouble) < 0.05
    val disallowed = robots && path.startsWith("/v/")
    urls.toDF()
      .withColumn("__c", c)
      .withColumn("fp", xxhash64(col("__c")))
      .withColumn("host", regexp_extract(col("__c"), "(?s)^.*?://([^/]*)", 1))
      .withColumn("state",
        when(disallowed, FrontierState.Failed).otherwise(FrontierState.Pending))
      .withColumn("error",
        when(col("state") === FrontierState.Failed, lit("robots: disallowed"))
          .otherwise(lit(null).cast("string")))
      .withColumn("discoveredAt", lit(batchNo))
      .withColumn("processedAt", lit(-1L))
      .select("fp", "url", "host", "priority", "seq", "state", "error",
        "discoveredAt", "processedAt")
  }

  /** Host-policy table for a frontier (distinct hosts; deterministic
    * synth policies — the robots/crawl-delay table, FIXTURES.md §4). */
  def policies(spark: SparkSession, frontier: DataFrame, seed: Long): DataFrame = {
    import spark.implicits._
    frontier.select("host").distinct().as[String]
      .map(h => Synth.hostPolicy(h, seed)).toDF()
  }
}
