package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flagship entry: drain a small synthetic frontier end-to-end and
  * return the committed crawl order (SURVEY.md §7 step 7).
  * Placeholder until the crawl driver lands this round. */
object Flagship {
  def run(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(1)
}
