package graft

import graft.table.SnapshotTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SnapshotTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshDir() = Files.createTempDirectory("snaptest").toString

  test("append then read returns the rows; manifest has lineage") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    t.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Map("m" -> 1.0))
    assert(t.read().count() === 2)
    val m = t.currentManifest.get
    assert(m.files.map(_.rows).sum === 2)
    assert(m.metrics("m") === 1.0)
  }

  test("upsert overrides by key, append accumulates") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    t.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    t.commitUpsert(Seq((2L, "B"), (3L, "c")).toDF("k", "v"))
    val rows = t.read().as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("later delta wins over earlier delta") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    t.commitAppend(Seq((1L, "a")).toDF("k", "v"))
    t.commitUpsert(Seq((1L, "x")).toDF("k", "v"))
    t.commitUpsert(Seq((1L, "y")).toDF("k", "v"))
    assert(t.read().as[(Long, String)].collect().toSeq === Seq((1L, "y")))
  }

  test("restore rolls back; expire keeps recent snapshots readable") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    val id0 = t.commitAppend(Seq((1L, "a")).toDF("k", "v"))
    val id1 = t.commitUpsert(Seq((1L, "z")).toDF("k", "v"))
    t.restore(id0)
    assert(t.read().as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    t.restore(id1)
    assert(t.read().as[(Long, String)].collect().toSeq === Seq((1L, "z")))
  }

  test("compaction preserves the resolved view and drops deltas") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    t.commitAppend((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    (1L to 10L).foreach(i => t.commitUpsert(Seq((i, s"u$i")).toDF("k", "v")))
    val before = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    val compacted = t.compactIfNeeded(maxDeltaFiles = 4)
    assert(compacted.isDefined)
    val after = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after === before)
    assert(t.currentManifest.get.files.forall(_.kind == "base"))
  }

  test("empty-table read after schema-bearing commit works") {
    import spark.implicits._
    val t = new SnapshotTable(spark, freshDir(), "k")
    t.commitAppend(Seq.empty[(Long, String)].toDF("k", "v"))
    assert(t.read().count() === 0)
  }
}
