package graft.image

import java.awt.image.BufferedImage
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column operators over opaque `binary` payload columns —
  * the decode / feature-extract / resize / frame-sample family a
  * training-data pipeline needs (prompt contract). Image ops are REAL
  * (JDK ImageIO/Graphics2D); video frame-sampling is a clearly-marked
  * deterministic STUB (no video codecs ship in this container) with
  * the Spark-side plumbing — schema, batching, registration — real
  * and tested.
  *
  * All are Scala UDFs over binary: per SURVEY.md §2.11 a custom
  * Expression is only warranted when codegen shows up hot; these are
  * dominated by the codec work itself, so UDF overhead is noise.
  */
object ImageOps {

  final case class Dims(w: Int, h: Int)

  /** Decode → (w, h); null-safe (undecodable → null). */
  def decodeDims(bytes: Array[Byte]): Option[Dims] =
    try {
      val img = ImageCodec.decode(bytes)
      if (img == null) None else Some(Dims(img.getWidth, img.getHeight))
    } catch { case _: Throwable => None }

  /** Bilinear resize re-encoded as PNG (lossless so downstream feature
    * extraction is deterministic). */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val src = ImageCodec.decode(bytes)
      if (src == null) return None
      resizePngFrom(src, w, h)
    } catch { case _: Throwable => None }

  /** `resizePng` over an ALREADY-DECODED image — the single-decode twin
    * (same Graphics2D path, same encoder) for audits that derive several
    * invariants from one decode (q44: the decode was ~3/4 of the per-
    * image cost when dims, raster size and the thumbnail each re-decoded
    * the same payload). */
  def resizePngFrom(src: BufferedImage, w: Int, h: Int): Option[Array[Byte]] =
    try {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      Some(ImageCodec.encode(dst, "png"))
    } catch { case _: Throwable => None }

  /** BT.601 luma of an RGB triple — THE formula the histogram uses;
    * exposed so q49's sampled oracle gates the shipped code path, not a
    * re-derivation. Pure IEEE double ops (two products, two adds), so
    * DuckDB's recomputation over the dumped (r, g, b) is bit-identical. */
  def lumaOf(r: Int, g: Int, b: Int): Double = 0.299 * r + 0.587 * g + 0.114 * b

  /** Histogram bin of a luma value — min(15, floor(y/16)); shared by
    * the histogram loop and q49. */
  def binOf(y: Double): Int = math.min(15, (y / 16).toInt)

  /** 16-bin luma histogram as raw per-bin COUNTS — THE aggregation the
    * feature extractor runs (exact integers, so the q36 oracle can
    * recompute it bit-for-bit from the full-raster pixel dump). */
  def lumaHistCounts(bytes: Array[Byte]): Option[Array[Long]] =
    try {
      val img = ImageCodec.decode(bytes)
      if (img == null) return None
      lumaHistCountsFrom(img)
    } catch { case _: Throwable => None }

  /** `lumaHistCounts` over an already-decoded image (single-decode twin;
    * same pixel extraction, same binning loop). */
  def lumaHistCountsFrom(img: BufferedImage): Option[Array[Long]] =
    try {
      val px = ImageCodec.pixels(img)
      val bins = new Array[Long](16)
      px.foreach { p =>
        val y = lumaOf((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        bins(binOf(y)) += 1
      }
      Some(bins)
    } catch { case _: Throwable => None }

  /** 16-bin normalized luma histogram — the feature-extract op
    * (normalization of `lumaHistCounts`, one shared binning loop). */
  def lumaHist16(bytes: Array[Byte]): Option[Seq[Double]] =
    lumaHistCounts(bytes).map { bins =>
      val n = bins.sum.toDouble
      bins.map(_ / n).toSeq
    }

  /** The FULL decoded raster as (r, g, b) rows — the q36 oracle's
    * evidence dump: DuckDB recomputes the per-image luma binning and
    * 16-bin aggregation from these and must match `lumaHistCounts`.
    * Row order is irrelevant (the histogram is a bag aggregation);
    * undecodable payloads dump empty, mirroring the -1 feature row. */
  def rasterRgb(bytes: Array[Byte]): Seq[(Int, Int, Int)] =
    try {
      val img = ImageCodec.decode(bytes)
      if (img == null) return Seq.empty
      ImageCodec.pixels(img).toSeq
        .map(p => ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
    } catch { case _: Throwable => Seq.empty }

  /** Deterministic n-point sample of the decoded raster (row-major
    * positions i·(npx-1)/(n-1)): (px_idx, r, g, b) rows. Feeds both the
    * q49 pixel dump and the q49 bin computation, so the two are
    * consistent by construction; undecodable payloads sample to empty
    * on both sides. */
  def samplePixels(bytes: Array[Byte], n: Int = 16): Seq[(Long, Int, Int, Int)] =
    try {
      val img = ImageCodec.decode(bytes)
      if (img == null) return Seq.empty
      val px = ImageCodec.pixels(img)
      if (px.isEmpty) return Seq.empty
      (0 until n).map { i =>
        val idx = (i.toLong * (px.length - 1)) / math.max(1, n - 1)
        val p = px(idx.toInt)
        (idx, (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      }
    } catch { case _: Throwable => Seq.empty }

  /** Decoded-pixel count feeding the histogram — q44's invariant input.
    * What this DOES gate: the decode produced a pixel raster, and its
    * size equals the independently stored w·h (a truncated/corrupt
    * decode, wrong-dims decode, or failed pixel extraction all break
    * it). What it CANNOT gate: the luma formula or bin mapping — every
    * loop iteration increments exactly one (clamped) bin, so the bin
    * SUM is the pixel count by construction; no metadata-predictable
    * oracle can see inside the binning. Hence no duplicated histogram
    * loop here — the count is taken where it is defined. */
  def lumaHistPxSum(bytes: Array[Byte]): Option[Long] =
    try {
      val img = ImageCodec.decode(bytes)
      if (img == null) return None
      Some(ImageCodec.pixels(img).length.toLong)
    } catch { case _: Throwable => None }

  /** VIDEO FRAME SAMPLING — STUB. A real implementation would demux n
    * key-frames via a video codec; none ships in this container, so
    * this returns n deterministic pseudo-frames derived from the
    * payload hash (each a real encoded PNG thumbnail), keeping the
    * schema (array<binary>) and partition behavior production-shaped. */
  def sampleFramesStub(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val seed = graft.util.Hashing.xx64(java.util.Base64.getEncoder.encodeToString(
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, 64))))
    (0 until n).map { i =>
      val px = ImageCodec.synthPixels(16, 16, seed + i)
      ImageCodec.encode(ImageCodec.toImage(16, 16, px), "png")
    }
  }

  /** Register all ops for Column/SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("img_dims",
      (b: Array[Byte]) => decodeDims(b).orNull)
    spark.udf.register("img_resize_png",
      (b: Array[Byte], w: Int, h: Int) => resizePng(b, w, h).orNull)
    spark.udf.register("img_luma_hist16",
      (b: Array[Byte]) => lumaHist16(b).orNull)
    spark.udf.register("video_sample_frames",
      (b: Array[Byte], n: Int) => sampleFramesStub(b, n))
  }

  /** Feature table over a media frame: dims + histogram + thumbnail
    * size — the batch multimodal pipeline shape. */
  def features(spark: SparkSession, media: DataFrame): DataFrame = {
    register(spark)
    media
      .withColumn("dims", call_udf("img_dims", col("bytes")))
      .withColumn("hist", call_udf("img_luma_hist16", col("bytes")))
      .withColumn("thumb", call_udf("img_resize_png", col("bytes"), lit(8), lit(8)))
      .select(col("image_id"), col("fmt"),
        col("dims.w").as("dec_w"), col("dims.h").as("dec_h"),
        round(element_at(col("hist"), 1), 6).as("hist_bin0"),
        round(element_at(col("hist"), 16), 6).as("hist_bin15"),
        length(col("thumb")).as("thumb_bytes"))
  }
}
