package graft.export

import graft.util.Rank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The export/OLAP query (maintenance/export-dataset.py:31-217,
  * SURVEY.md §3.3): first-occurrence dedup → full-mode clean →
  * min-words filter → seeded shuffle → 80/10/10 positional split.
  *
  * The seeded shuffle is md5(image_id || '#' || seed) + a global row
  * number — reproducible under ANY partitioning (randomSplit is
  * partition-dependent and was rejected, §3.3). Seed 42 mirrors
  * export-dataset.py:118,231-235. The row number comes from
  * Rank.withGlobalRank (range-partition + partition offsets), NOT a
  * global window — the whole table never flows through one task.
  */
object ExportQuery {

  /** The reference raises if the dataset has fewer than 20 samples
    * (export-dataset.py:112-115). */
  val MinSamples = 20

  /** media(image_id, caption, ...) → (image_id, caption_clean, split). */
  def split(media: DataFrame, seed: Long = 42L, minWords: Int = 2): DataFrame = {
    // T4 first-occurrence dedup on the caption content key
    val wDup = Window.partitionBy("caption").orderBy("image_id")
    val deduped = media.select("image_id", "caption")
      .filter(col("caption").isNotNull && length(trim(col("caption"))) > 0)
      .withColumn("__rn", row_number().over(wDup))
      .filter(col("__rn") === 1).drop("__rn")
    // full=True clean (text_utils.py:36-38): а-яё, hyphen, space only
    val cleaned = deduped.withColumn("caption_clean",
      trim(regexp_replace(lower(trim(col("caption"))), "[^а-яё\\- ]", "")))
      .filter(size(org.apache.spark.sql.functions.split(
        trim(col("caption_clean")), "\\s+")) >= minWords) // F7
    val keyed = cleaned.withColumn("__shuffle",
      md5(concat(col("image_id"), lit(s"#$seed"))))
    val (ranked, n) = Rank.withGlobalRank(keyed,
      Seq(col("__shuffle"), col("image_id")), "__rn")
    ranked
      .withColumn("split",
        when(col("__rn") <= lit(math.floor(n * 0.8).toLong), "train")
          .when(col("__rn") <= lit(math.floor(n * 0.9).toLong), "dev")
          .otherwise("test"))
      .select("image_id", "caption_clean", "split")
  }

  /** Vocabulary sink: one caption per line, no dedup (A7 — faithful:
    * export-dataset.py:190-192 writes ALL transcripts). */
  def vocabulary(media: DataFrame): DataFrame =
    media.select(col("caption")).filter(col("caption").isNotNull)

  /** Write all + train/dev/test + vocabulary under `outDir` (S11): CSV
    * with header per split (the reference's all/train/dev/test.csv,
    * export-dataset.py:109,177-186) + one-caption-per-line vocabulary.
    * Enforces the reference's n >= `minSamples` sanity floor
    * (export-dataset.py:112-115) — raises before writing splits. */
  def writeAll(spark: SparkSession, media: DataFrame, outDir: String,
               minSamples: Int = MinSamples): Unit = {
    val s = split(media).cache()
    try {
      val n = s.count()
      // the combined pre-split dataset = the reference's all.csv
      s.select("image_id", "caption_clean").write.mode("overwrite")
        .option("header", "true").csv(s"$outDir/all_csv")
      if (n < minSamples)
        throw new IllegalStateException(
          s"export sanity floor: $n samples < $minSamples (export-dataset.py:112-115)")
      s.write.mode("overwrite").option("header", "true")
        .partitionBy("split").csv(s"$outDir/splits_csv")
      s.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/splits")
      vocabulary(media).write.mode("overwrite").text(s"$outDir/vocabulary")
    } finally s.unpersist()
  }
}
