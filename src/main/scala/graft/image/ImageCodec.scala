package graft.image

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image payload codec — encode/decode/phash/PSNR over in-table binary
  * columns (BASELINE.json.input_hint; reference analog: wav PCM blobs,
  * utils/audio_utils.py:132-152). JDK-builtin ImageIO only (zero deps).
  *
  * Determinism notes: the synthetic pixel field is smooth (sum of
  * low-frequency cosines seeded from the url hash, luma-dominant) so
  * JPEG at q=0.98 clears the PSNR>=40 dB per-row invariant; PNG is
  * lossless/exact.
  */
object ImageCodec {

  // disk-backed stream cache is pure overhead for in-memory payloads
  javax.imageio.ImageIO.setUseCache(false)

  // ---- per-thread buffer pools -----------------------------------------
  // The crawl hot path allocates ~100 KB/url (pixel arrays × 2, encode
  // stream, decoded image) — ~2.5 GB/s churn at 25k urls/s across 32
  // threads sharing ONE young gen in local mode. Real executors would
  // each have their own heap; in-process we reuse buffers per thread.
  // Reuse is OPT-IN (the *Reused variants) — only the single-consumer
  // hot path uses them; tests and the PSNR audit (which needs two live
  // buffers) keep the allocating API.

  private final class IntPool extends ThreadLocal[java.util.HashMap[Integer, Array[Int]]] {
    override def initialValue() = new java.util.HashMap[Integer, Array[Int]]()
    def acquire(n: Int): Array[Int] = {
      val m = get()
      var a = m.get(n)
      if (a == null) { a = new Array[Int](n); m.put(n, a) }
      a
    }
  }
  private val synthPool = new IntPool  // live during synth→encode
  private val decodePool = new IntPool // live during decode→phash
  private val encodeBos = new ThreadLocal[ByteArrayOutputStream] {
    override def initialValue() = new ByteArrayOutputStream(64 * 1024)
  }

  /** Deterministic smooth RGB field into a per-thread reused buffer —
    * hot-path only: the result is invalidated by this thread's next
    * synthPixelsReused call of the same size. */
  def synthPixelsReused(w: Int, h: Int, seed: Long): Array[Int] =
    synthPixelsInto(w, h, seed, synthPool.acquire(w * h))

  /** Deterministic smooth RGB field for (w,h,seed): low-frequency
    * cosines with seed-derived phases/frequencies. Pure function. */
  def synthPixels(w: Int, h: Int, seed: Long): Array[Int] =
    synthPixelsInto(w, h, seed, new Array[Int](w * h))

  private def synthPixelsInto(w: Int, h: Int, seed: Long,
                              out: Array[Int]): Array[Int] = {
    // derive 6 stable params from the seed via an LCG walk
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    }
    val fx1 = 1.0 + next() * 2.0; val fy1 = 1.0 + next() * 2.0
    val ph1 = next() * math.Pi * 2; val ph2 = next() * math.Pi * 2
    val ph3 = next() * math.Pi * 2; val mix = next()
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = x.toDouble / w; val v = y.toDouble / h
        // luma-dominant field with gentle chroma so JPEG 4:2:0
        // subsampling stays within the PSNR>=40 budget
        val base = 0.5 + 0.35 * math.cos(2 * math.Pi * (fx1 * u) + ph1) +
          0.15 * math.cos(2 * math.Pi * (fy1 * v) + ph2)
        val chroma = 0.08 * math.cos(2 * math.Pi * (fx1 * u + fy1 * v) * mix + ph3)
        val r = math.min(1.0, math.max(0.0, base + chroma))
        val g = math.min(1.0, math.max(0.0, base))
        val b = math.min(1.0, math.max(0.0, base - chroma))
        val ri = (r * 255).toInt; val gi = (g * 255).toInt; val bi = (b * 255).toInt
        out(y * w + x) = (ri << 16) | (gi << 8) | bi
        x += 1
      }
      y += 1
    }
    out
  }

  def toImage(w: Int, h: Int, rgb: Array[Int]): BufferedImage = {
    // zero-copy: wrap the pixel array directly (TYPE_INT_RGB layout) —
    // the duplicate raster + setRGB copy were measurable GC churn at
    // 20k images/s
    val db = new java.awt.image.DataBufferInt(rgb, rgb.length)
    val masks = Array(0xff0000, 0x00ff00, 0x0000ff)
    val raster = java.awt.image.Raster.createPackedRaster(db, w, h, w, masks, null)
    val cm = new java.awt.image.DirectColorModel(24, masks(0), masks(1), masks(2))
    new BufferedImage(cm, raster, false, null)
  }

  // ImageIO writers/readers are not thread-safe and registry lookups
  // are costly at 15k+ codecs/s — one instance per executor thread
  private val jpegWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("jpeg").next()
  }
  private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("png").next()
  }
  private val jpegReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("jpeg").next()
  }
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Encode via ImageIO; jpg pinned to quality 0.98 (one encoder path —
    * SURVEY.md §7 hard-part (f)). Output stream is a reused per-thread
    * buffer; toByteArray hands back a right-sized copy. */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = encodeBos.get()
    bos.reset()
    val writer = if (fmt == "jpg") jpegWriter.get() else pngWriter.get()
    val param = writer.getDefaultWriteParam
    if (fmt == "jpg") {
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.98f)
    }
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close()
    bos.toByteArray
  }

  /** Decode via per-thread cached readers (format sniffed from magic
    * bytes; falls back to the registry for anything else). */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val reader =
      if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        jpegReader.get()
      else if (bytes.length > 3 && (bytes(0) & 0xff) == 0x89 &&
               bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        pngReader.get()
      else return ImageIO.read(new ByteArrayInputStream(bytes))
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private val destPool = new ThreadLocal[java.util.HashMap[java.lang.Long, BufferedImage]] {
    override def initialValue() = new java.util.HashMap[java.lang.Long, BufferedImage]()
  }

  /** Hot-path decode writing into a per-thread reused destination image
    * (keyed by dims+type) — the decoded raster is the single largest
    * per-url allocation. Invalidated by this thread's next decodeReused
    * of the same shape; NEVER use where two decoded images must be live
    * at once (e.g. PSNR audits). */
  def decodeReused(bytes: Array[Byte]): BufferedImage = {
    val reader =
      if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        jpegReader.get()
      else if (bytes.length > 3 && (bytes(0) & 0xff) == 0x89 &&
               bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        pngReader.get()
      else return ImageIO.read(new ByteArrayInputStream(bytes))
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      val w = reader.getWidth(0); val h = reader.getHeight(0)
      val spec = reader.getImageTypes(0).next()
      val biType = spec.getBufferedImageType
      val m = destPool.get()
      val key = java.lang.Long.valueOf(
        (w.toLong << 40) | (h.toLong << 16) | (biType.toLong & 0xffff))
      var dest = m.get(key)
      if (dest == null || biType == BufferedImage.TYPE_CUSTOM) {
        dest = spec.createBufferedImage(w, h)
        if (biType != BufferedImage.TYPE_CUSTOM) m.put(key, dest)
      }
      val param = reader.getDefaultReadParam
      param.setDestination(dest)
      reader.read(0, param)
    } finally iis.close()
  }

  /** Payload NORMALIZE (the reference's pre-slicing ffmpeg chain,
    * utils/audio_utils.py:37-111, recast for image payloads): decode
    * whatever container was fetched and re-encode to the pipeline's
    * canonical format — lossless PNG — exactly as the reference decodes
    * m4a/webm downloads to canonical 16 kHz mono s16le wav before any
    * downstream stage. Deterministic (fixed encoder, fixed raster
    * layout) and IDEMPOTENT: normalize(normalize(x)) == normalize(x)
    * byte-for-byte, which q48 hash-gates via DuckDB. Pixel-altering
    * filters (the loudnorm/bandpass analogs) would slot in between
    * decode and encode; the synthetic fixture keeps them identity so
    * the per-row PSNR-vs-source invariant stays exact. */
  def normalizePng(bytes: Array[Byte]): Array[Byte] =
    encode(decode(bytes), "png")

  def pixels(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Hot-path pixels into a per-thread reused buffer — invalidated by
    * this thread's next pixelsReused call of the same size. NEVER use
    * where two buffers must be live at once (e.g. PSNR). */
  def pixelsReused(img: BufferedImage): Array[Int] = {
    val n = img.getWidth * img.getHeight
    img.getRGB(0, 0, img.getWidth, img.getHeight,
      decodePool.acquire(n), 0, img.getWidth)
  }

  /** 64-bit aHash: 8x8 box-downsample of luma, bit = above mean.
    * Bit order fixed (row-major, bit 63 = top-left). */
  def phash64(w: Int, h: Int, rgb: Array[Int]): Long = {
    val gray = new Array[Double](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
        val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = rgb(y * w + x)
            sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        gray(gy * 8 + gx) = sum / n
        gx += 1
      }
      gy += 1
    }
    val mean = gray.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (gray(i) > mean) bits |= (1L << (63 - i))
      i += 1
    }
    bits
  }

  /** PSNR in dB between two same-size RGB buffers (per-channel MSE). */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val pa = a(i); val pb = b(i)
      val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
      val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
      val db = (pa & 0xff) - (pb & 0xff)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.length * 3.0)
    if (mse == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
