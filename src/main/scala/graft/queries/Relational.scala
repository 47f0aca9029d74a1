package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Relational operator queries over the TPC-H-ish driver tables.
  * Each has an ANSI-SQL twin in `oracle` (run by DuckDB).
  * Reference-operator mapping per SURVEY.md §2 noted on each query.
  */
object Relational {

  /** A1/A4: grouped aggregation with exact decimal-routed double sums.
    * Reference analog: per-video totals, vad_first_parser.py:44-46. */
  def q01GroupAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("disc_price")).as("sum_disc_price"),
        count(lit(1)).as("n_rows"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(18,4))) as double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(18,4))) as double) AS sum_base,
      |  cast(sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(18,4))) as double) AS sum_disc_price,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** F3-style predicate + projection; pushdown-friendly. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity").between(30, 50) &&
        col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice").cast("decimal(18,4)").cast("double").as("price"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  cast(cast(l_extendedprice as decimal(18,4)) as double) AS price
      |FROM lineitem
      |WHERE l_quantity BETWEEN 30 AND 50 AND l_discount > 0.05 AND l_returnflag = 'R'""".stripMargin

  /** J5-style multi-way equi join + agg: revenue per nation. */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))

  val q03Sql: String =
    """SELECT n_name,
      |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Q4/J2: anti join (delete-by-key / seen-set semantics) —
    * customers with no urgent order (non-empty at every sf). */
  def q04AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  val q04Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  /** F8: semi join gate (folder-complete gate analog). */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(lineitem(s, d), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_active_suppliers"))

  val q05Sql: String =
    """SELECT n_name, count(*) AS n_active_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      |GROUP BY n_name""".stripMargin

  /** T1: deterministic top-k (argmin/argmax family). */
  def q06TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,4)").cast("double").as("total"))

  val q06Sql: String =
    """SELECT o_orderkey, cast(cast(o_totalprice as decimal(18,4)) as double) AS total
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Q3: the frontier claim shape — per-key ordered take-k via window.
    * Reference: pop-first per host bucket, utils/csv_utils.py:286-299. */
  def q07WindowClaim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 2""".stripMargin

  /** T4: first-occurrence dedup with explicit seq order
    * (maintenance/export-dataset.py:93 semantics). */
  def q08FirstOccurrence(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_partkey").orderBy(col("l_orderkey"), col("l_linenumber"))
    lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("l_orderkey").as("first_orderkey"),
        col("l_linenumber").as("first_linenumber"))
  }

  val q08Sql: String =
    """SELECT l_partkey, l_orderkey AS first_orderkey, l_linenumber AS first_linenumber
      |FROM (SELECT l_partkey, l_orderkey, l_linenumber,
      |  row_number() OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin

  /** U1/U2: union + distinct then agg (recovery set-union analog). */
  def q09Union(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val hi  = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_orderstatus")
    val big = o.filter(col("o_totalprice") > 400000).select("o_orderkey", "o_orderstatus")
    hi.union(big).distinct()
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
  }

  val q09Sql: String =
    """SELECT o_orderstatus, count(*) AS n FROM (
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
      |) GROUP BY o_orderstatus""".stripMargin

  /** Time-window agg over the event stream (batch twin of the
    * Structured Streaming pipeline in graft.streaming). */
  def q10EventWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  val q10Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, count(*) AS n,
      |  cast(sum(cast(value as decimal(18,4))) as double) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** T1: argmin — cheapest line per order (smallest-stream analog,
    * utils/youtube_downloader.py:25-26). */
  def q11ArgMin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice"), col("l_linenumber"))
    lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber").as("min_linenumber"),
        col("l_extendedprice").cast("decimal(18,4)").cast("double").as("min_price"))
  }

  val q11Sql: String =
    """SELECT l_orderkey, l_linenumber AS min_linenumber,
      |  cast(cast(l_extendedprice as decimal(18,4)) as double) AS min_price
      |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice, l_linenumber) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin

  /** A5/§3.3: deterministic seeded shuffle + 80/10/10 split.
    * Shuffle key = md5(id || seed) — reproducible under any
    * partitioning (export-dataset.py:118-127 semantics, seed 42).
    * Global positions come from Rank.withGlobalRank (range-partition +
    * offset prefix sums) — identical output to the global window, but
    * no single-partition WindowExec at 100 TB. */
  def q12SeededSplit(s: SparkSession, d: String): DataFrame = {
    val keyed = orders(s, d)
      .withColumn("shuffle_key", md5(concat(col("o_orderkey").cast("string"), lit("#42"))))
    val (ranked, n) = graft.util.Rank.withGlobalRank(keyed,
      Seq(col("shuffle_key"), col("o_orderkey")), "rn")
    ranked
      .withColumn("split",
        when(col("rn") <= lit(math.floor(n * 0.8).toLong), "train")
          .when(col("rn") <= lit(math.floor(n * 0.9).toLong), "dev")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_total"))
  }

  val q12Sql: String =
    """SELECT split, count(*) AS n_rows,
      |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS sum_total
      |FROM (
      |  SELECT o_totalprice,
      |    CASE WHEN rn <= floor(n * 0.8) THEN 'train'
      |         WHEN rn <= floor(n * 0.9) THEN 'dev'
      |         ELSE 'test' END AS split
      |  FROM (SELECT o_totalprice,
      |          row_number() OVER (ORDER BY md5(concat(cast(o_orderkey as varchar), '#42')), o_orderkey) AS rn,
      |          count(*) OVER () AS n
      |        FROM orders))
      |GROUP BY split""".stripMargin

  /** Q11: queue-depth stats (state counts). */
  def q13StateCounts(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))

  val q13Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  /** Skew detection + salting assignment (north-rule hot-host salting):
    * hosts (users) above a frequency threshold get hash-derived salts.
    * Counts come from a key-partitioned window, NOT a broadcast of the
    * per-user count table — that table grows with the key cardinality
    * and an unbounded broadcast dies at 100 TB (the engine's own
    * Frontier.salted broadcast is safe because it is batch-bounded). */
  def q14SkewSalt(s: SparkSession, d: String): DataFrame = {
    val wCnt = Window.partitionBy("user_id")
    events(s, d)
      .withColumn("cnt", count(lit(1)).over(wCnt))
      .withColumn("salt",
        when(col("cnt") > 20, pmod(h60(col("event_id").cast("string")), lit(8))).otherwise(lit(0)))
      .groupBy("user_id", "salt").agg(count(lit(1)).as("n"))
  }

  val q14Sql: String =
    s"""SELECT user_id, CASE WHEN cnt > 20 THEN ${h60Sql("cast(event_id as varchar)")} % 8 ELSE 0 END AS salt,
       |  count(*) AS n
       |FROM (SELECT *, count(*) OVER (PARTITION BY user_id) AS cnt FROM events)
       |GROUP BY 1, 2""".stripMargin

  /** X5: regex extraction of repeated patterns (timecode-extraction
    * family, utils/youtube_downloader.py:96-98) — extract-all + count. */
  def q15RegexExtract(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("hits", regexp_extract_all(col("text"), lit("ba[a-z]+"), lit(0)))
      .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"),
        coalesce(try_element_at(col("hits"), lit(1)), lit("")).as("first_hit"))

  val q15Sql: String =
    """SELECT doc_id, cast(len(hits) as bigint) AS n_hits,
      |  coalesce(hits[1], '') AS first_hit
      |FROM (SELECT doc_id, regexp_extract_all(text, 'ba[a-z]+') AS hits
      |      FROM documents)""".stripMargin

  /** Running aggregate: cumulative revenue per customer over order
    * date — the window-frame operator (decimal-exact accumulation). */
  def q38RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "running_total")
  }

  val q38Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  cast(sum(cast(o_totalprice as decimal(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
      |FROM orders""".stripMargin

  /** Sessionization (the §2.10 operator in batch form): per-user
    * 30-minute-gap sessions via a key-partitioned lag window — the
    * exact batch twin of `EventStream.sessionCounts`
    * (mapGroupsWithState); StreamingExportSpec asserts the streaming
    * state machine's final answer equals this query, and DuckDB checks
    * this query — so the streaming operator is transitively
    * oracle-verified. */
  def q41SessionWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tss")
    events(s, d)
      // ts is TIMESTAMP_NTZ in the parquet; route via TIMESTAMP (session
      // tz = UTC) → epoch seconds, matching DuckDB's epoch(ts)
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("tss"))
      .withColumn("prev", lag("tss", 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("tss") - col("prev") > 1800, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("is_new").as("n_sessions"))
  }

  val q41Sql: String =
    """WITH e AS (SELECT user_id, cast(epoch(ts) as bigint) AS tss FROM events),
      |s AS (SELECT user_id,
      |        CASE WHEN lag(tss) OVER (PARTITION BY user_id ORDER BY tss) IS NULL
      |               OR tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss) > 1800
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM e)
      |SELECT user_id, count(*) AS n_events, cast(sum(is_new) as bigint) AS n_sessions
      |FROM s GROUP BY user_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_session_window"   -> q41SessionWindow _,
    "q15_regex_extract"    -> q15RegexExtract _,
    "q38_running_sum"      -> q38RunningSum _,
    "q01_group_agg"        -> q01GroupAgg _,
    "q02_filter_project"   -> q02FilterProject _,
    "q03_join_agg"         -> q03JoinAgg _,
    "q04_anti_join"        -> q04AntiJoin _,
    "q05_semi_join"        -> q05SemiJoin _,
    "q06_topk"             -> q06TopK _,
    "q07_window_claim"     -> q07WindowClaim _,
    "q08_first_occurrence" -> q08FirstOccurrence _,
    "q09_union"            -> q09Union _,
    "q10_event_window"     -> q10EventWindow _,
    "q11_argmin"           -> q11ArgMin _,
    "q12_seeded_split"     -> q12SeededSplit _,
    "q13_state_counts"     -> q13StateCounts _,
    "q14_skew_salt"        -> q14SkewSalt _,
  )

  val oracle: Map[String, String] = Map(
    "q41_session_window"   -> q41Sql,
    "q15_regex_extract"    -> q15Sql,
    "q38_running_sum"      -> q38Sql,
    "q01_group_agg"        -> q01Sql,
    "q02_filter_project"   -> q02Sql,
    "q03_join_agg"         -> q03Sql,
    "q04_anti_join"        -> q04Sql,
    "q05_semi_join"        -> q05Sql,
    "q06_topk"             -> q06Sql,
    "q07_window_claim"     -> q07Sql,
    "q08_first_occurrence" -> q08Sql,
    "q09_union"            -> q09Sql,
    "q10_event_window"     -> q10Sql,
    "q11_argmin"           -> q11Sql,
    "q12_seeded_split"     -> q12Sql,
    "q13_state_counts"     -> q13Sql,
    "q14_skew_salt"        -> q14Sql,
  )
}
