package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The export/OLAP query (maintenance/export-dataset.py:31-217,
  * SURVEY.md §3.3): first-occurrence dedup → full-mode clean →
  * min-words filter → seeded shuffle → 80/10/10 positional split.
  *
  * The seeded shuffle is md5(image_id || '#' || seed) + global
  * row_number — reproducible under ANY partitioning (randomSplit is
  * partition-dependent and was rejected, §3.3). Seed 42 mirrors
  * export-dataset.py:118,231-235.
  */
object ExportQuery {

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
    val wOrd = Window.orderBy(col("__shuffle"), col("image_id"))
    keyed
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("split",
        when(col("__rn") <= floor(col("__n") * 0.8), "train")
          .when(col("__rn") <= floor(col("__n") * 0.9), "dev")
          .otherwise("test"))
      .select("image_id", "caption_clean", "split")
  }

  /** Vocabulary sink: one caption per line, no dedup (A7 — faithful:
    * export-dataset.py:190-192 writes ALL transcripts). */
  def vocabulary(media: DataFrame): DataFrame =
    media.select(col("caption")).filter(col("caption").isNotNull)

  /** Write train/dev/test + vocabulary under `outDir` (S11): CSV with
    * header per split (the reference's all/train/dev/test.csv,
    * export-dataset.py:177-186) + one-caption-per-line vocabulary. */
  def writeAll(spark: SparkSession, media: DataFrame, outDir: String): Unit = {
    val s = split(media).cache()
    try {
      s.write.mode("overwrite").option("header", "true")
        .partitionBy("split").csv(s"$outDir/splits_csv")
      s.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/splits")
      vocabulary(media).write.mode("overwrite").text(s"$outDir/vocabulary")
    } finally s.unpersist()
  }
}
