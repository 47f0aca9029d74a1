package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-internal queries (crawl drain, export split over crawl
  * output) — not SQL-expressible over the driver tables, so they get
  * the rows-only check. All deterministic: the crawl is a pure
  * function of (seed count, config). */
object Engine {
  import graft.crawl.Flagship
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_crawl_order"     -> (Flagship.crawlOrder _),
    "q31_crawl_media"     -> (Flagship.crawlMedia _),
    "q32_crawl_stats"     -> (Flagship.crawlStats _),
    "q33_frontier_depth"  -> (Flagship.crawlFrontierDepth _),
    "q34_export_split"    -> (Flagship.exportSplit _),
    "q35_phash_neardup"   -> (Flagship.phashNearDup _),
    "q36_media_features"  -> (Flagship.mediaFeatures _),
    "q37_global_stats"    -> (Flagship.globalStats _),
  )
}
