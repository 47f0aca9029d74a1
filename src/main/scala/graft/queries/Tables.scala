package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table loaders + cross-engine deterministic helpers for the
  * driver-contract queries (SURVEY.md §2 / §5.2.5).
  *
  * All float aggregation goes through decimal so the result is
  * order-independent and byte-identical to the DuckDB oracle; all
  * hashing uses md5 (the one hash both engines share bit-for-bit).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def events(s: SparkSession, d: String): DataFrame    = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Exact, order-independent sum of a double column: route through
    * decimal(18,4) per row, sum exactly, cast back. DuckDB twin:
    * `cast(sum(cast(x as decimal(18,4))) as double)`. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** 60-bit deterministic hash shared with DuckDB:
    * Spark  : cast(conv(substring(md5(s),1,15),16,10) as bigint)
    * DuckDB : cast(concat('0x', substr(md5(s),1,15)) as bigint)   */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment for h60 over an expression string. */
  def h60Sql(e: String): String =
    s"cast(concat('0x', substr(md5($e), 1, 15)) as bigint)"
}
