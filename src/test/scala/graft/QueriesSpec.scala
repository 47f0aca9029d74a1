package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Smoke + invariant tests for the driver-contract queries.
  * The authoritative value check is the driver's DuckDB oracle
  * (tools/check_oracle.py replicates it); here we pin row-level
  * invariants that must hold at any scale factor. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // pair-producing queries may legitimately be empty at tiny sf
  val mayBeEmpty = Set("q21_ngram_jaccard", "q23_minhash_lsh", "q04_anti_join")

  test("every query with an oracle has a queries entry and vice-versa names align") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys missing from queries: ${o.diff(q)}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and column names are non-generic") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
      // driver hash-compare requires stable, aliased column names
      df.columns.foreach { c =>
        assert(!c.contains("("), s"$name column '$c' looks unaliased")
      }
    }
  }

  test("q01 sums match a direct computation") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val got = SparkEntry.queries("q01_group_agg")(spark, sf)
      .agg(sum("n_rows")).head.getLong(0)
    assert(got === li.count())
  }

  test("q12 split fractions are 80/10/10 within rounding") {
    val rows = SparkEntry.queries("q12_seeded_split")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.values.sum
    assert(rows("train") === math.floor(n * 0.8).toLong)
    assert(rows("dev") === math.floor(n * 0.9).toLong - math.floor(n * 0.8).toLong)
  }

  test("q27 ranks are 1..3 per query id") {
    val df = SparkEntry.queries("q27_cosine_topk")(spark, sf).collect()
    val byQ = df.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("q21 hot-shingle cap bounds the pair join (no pairs from shingles with df > cap)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 docs share ONLY the hot shingle "aa bb cc" (> MaxShingleDf=50);
    // 2 docs share a rare shingle set → only that pair may survive
    val hot = (0 until 60).map(i => (i.toLong, "s1", s"aa bb cc u$i v$i"))
    val rare = Seq((100L, "s1", "xx yy zz ww"), (101L, "s1", "xx yy zz ww"))
    val dir = java.nio.file.Files.createTempDirectory("q21cap").toString
    (hot ++ rare).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q21_ngram_jaccard")(spark, dir).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)),
      s"hot shingle leaked into pair generation: ${pairs.mkString(",")}")
  }

  test("q20 keep-flag marks exactly one row per content key") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q20_dedup_exact")(spark, sf)
    val bad = df.filter(col("keep")).groupBy("content_key")
      .count().filter(col("count") =!= 1).count()
    assert(bad === 0)
  }

  test("connected components: min-label propagation on a known graph") {
    import spark.implicits._
    // components: {1,2,3,7} (chain 7-3-2-1 exercises multi-round
    // propagation), {4,5}, singleton {6}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (3L, 2L), (7L, 3L), (4L, 5L)).toDF("a", "b")
    val got = graft.queries.Dedup.connectedComponents(nodes, pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connected components: a 512-node chain converges in O(log n) rounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 512L
    val nodes = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.queries.Dedup.connectedComponents(nodes, pairs, "doc_a", "doc_b")
    // one component, min label 0 everywhere
    assert(labels.filter(col("label") =!= 0L).count() === 0)
    assert(labels.count() === n)
    // the adversarial-diameter guarantee: two-hop min-label needs
    // O(log n) rounds where plain propagation would need n-1 (=511)
    val rounds = graft.queries.Dedup.lastCcRounds.get()
    assert(rounds <= 12, s"chain took $rounds rounds — not O(log n)")
  }

  test("q45 clusters are consistent with q23 pairs and keep one doc per cluster") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val cc = SparkEntry.queries("q45_dedup_clusters")(spark, d).cache()
    // exactly one keep per cluster, and it is the cluster id itself
    val keeps = cc.filter(col("keep"))
    assert(keeps.count() === cc.select("cluster_id").distinct().count())
    assert(keeps.filter(col("doc_id") =!= col("cluster_id")).count() === 0)
    // cluster_size matches the actual group size
    val badSize = cc.groupBy("cluster_id", "cluster_size")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= col("cluster_size")).count()
    assert(badSize === 0)
    // every q23 pair ends up in one cluster
    val pairs = SparkEntry.queries("q23_minhash_lsh")(spark, d)
    val split = pairs
      .join(cc.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(cc.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split === 0, "a candidate pair was split across clusters")
    cc.unpersist()
  }
}
