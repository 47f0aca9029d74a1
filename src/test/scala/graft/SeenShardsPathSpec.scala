package graft

import graft.frontier.SeenShards
import graft.table.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The broadcast and co-partitioned (join) seen-set paths must be
  * interchangeable: identical serialized shard filters after inserts
  * and identical maybeSeen verdicts on probes — seeded property trials
  * (the offline cache has no scalatestplus bridge). */
class SeenShardsPathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(mode: String, nShards: Int, buckets: Int) = {
    val dir = Files.createTempDirectory(s"seen_$mode").toString
    val tbl = new SnapshotTable(spark, dir, "shard")
    (new SeenShards(spark, tbl, nShards, buckets, mode), tbl)
  }

  private def fps(seed: Long, n: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(r.nextLong())
  }

  test("insert via broadcast and join paths produces byte-identical shard filters (5 trials)") {
    import spark.implicits._
    (0 until 5).foreach { trial =>
      val nShards = 4 + trial
      val (b, bTbl) = mk("broadcast", nShards, 1 << 8)
      val (j, jTbl) = mk("join", nShards, 1 << 8)
      // two insert waves so the join path also exercises merge-into-existing
      Seq(fps(trial * 10 + 1, 200 + trial * 31), fps(trial * 10 + 2, 150)).foreach { wave =>
        val df = wave.toDF("fp")
        b.insert(df); j.insert(df)
      }
      val bBytes = bTbl.read().select("shard", "bytes")
        .as[(Int, Array[Byte])].collect().toMap
      val jBytes = jTbl.read().select("shard", "bytes")
        .as[(Int, Array[Byte])].collect().toMap
      assert(bBytes.keySet === jBytes.keySet, s"trial $trial: shard sets differ")
      bBytes.foreach { case (s, bb) =>
        assert(bb.toSeq === jBytes(s).toSeq, s"trial $trial: shard $s bytes differ")
      }
    }
  }

  test("probe verdicts identical across paths, including never-seen fps (5 trials)") {
    import spark.implicits._
    (0 until 5).foreach { trial =>
      val (b, bTbl) = mk("broadcast", 6, 1 << 8)
      val inserted = fps(500 + trial, 300)
      b.insert(inserted.toDF("fp"))
      // same table read through a join-path instance: same state, two paths
      val j = new SeenShards(spark, bTbl, 6, 1 << 8, "join")
      val candidates = (inserted.take(50) ++ fps(900 + trial, 100)).toDF("fp")
      def verdicts(s: SeenShards) = s.probe(candidates)
        .select("fp", "maybeSeen").as[(Long, Boolean)].collect().toMap
      val vb = verdicts(b)
      val vj = verdicts(j)
      assert(vb === vj, s"trial $trial: verdicts differ")
      // two-tier invariant: no false negatives on either path
      inserted.take(50).foreach(fp => assert(vb(fp), s"false negative $fp"))
    }
  }

  test("duplicate candidate fps probe to the same row count on both paths") {
    import spark.implicits._
    val (b, bTbl) = mk("broadcast", 4, 1 << 8)
    b.insert(fps(77, 100).toDF("fp"))
    val j = new SeenShards(spark, bTbl, 4, 1 << 8, "join")
    // each fp appears 3 times — the rejoin must not fan out k×k
    val dups = fps(78, 40).flatMap(f => Seq(f, f, f)).toDF("fp")
    assert(b.probe(dups).count() === 120)
    assert(j.probe(dups).count() === 120)
  }

  test("auto mode switches to the join path only past the size threshold") {
    val (s, _) = mk("auto", 4, 1 << 8)
    assert(!s.useJoinPath) // empty table: broadcast is fine
    val (forced, _) = mk("join", 4, 1 << 8)
    assert(forced.useJoinPath)
  }
}
