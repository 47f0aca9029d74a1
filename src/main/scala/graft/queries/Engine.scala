package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-internal queries (crawl drain, export split over crawl
  * output) — not SQL-expressible over the driver tables, so they get
  * the rows-only check. Populated as the crawl engine lands. */
object Engine {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
}
