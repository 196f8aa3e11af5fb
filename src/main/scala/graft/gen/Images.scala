package graft.gen

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.util.Hashing

/**
 * Deterministic procedural images + perceptual hash, JVM-only
 * (javax.imageio, no native deps).
 *
 * Images are an 8x8 grid of constant-color cells (cell colors seeded).
 * Constant 8px-aligned blocks survive JPEG's 8x8 DCT almost losslessly,
 * which (a) keeps the decoded-pixel PSNR >= 40 dB invariant satisfiable for
 * the lossy format (BASELINE.json input_hint) and (b) makes the perceptual
 * hash stable-but-not-identical under re-encoding — exactly the image
 * near-dup regime the SimHash pass must catch.
 *
 * The phash is a 64-bit average hash: mean gray of each 8x8 cell vs the
 * global mean (reference's FAISS cosine analog on the image side; computed
 * from DECODED bytes so a lossy encode genuinely perturbs it).
 */
object Images {

  val Cells = 8 // 8x8 = 64 phash bits

  /**
   * Seeded grayscale cell values -> BufferedImage of w x h. Grayscale is
   * deliberate: JPEG chroma subsampling caps color PSNR at ~25 dB regardless
   * of quality (measured — JpegProbeSpec), which would make the north rule's
   * "PSNR >= 40 dB for lossy formats" invariant unsatisfiable; the luma
   * channel round-trips near-losslessly. `jitter` adds a deterministic ±j
   * per-cell perturbation (used for the JPEG near-dup variant so re-encoded
   * images land at small-but-nonzero phash Hamming distance).
   */
  def render(pixelSeed: Long, w: Int, h: Int, jitter: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val colors = Array.tabulate(Cells * Cells) { c =>
      val g0 = (Hashing.splitmix64(pixelSeed * 6364136223846793005L + c) & 0xffL).toInt
      val g =
        if (jitter == 0) g0
        else {
          val d = Math.floorMod(Hashing.splitmix64(pixelSeed + 7919L * c), 2L * jitter + 1).toInt - jitter
          math.max(0, math.min(255, g0 + d))
        }
      (g << 16) | (g << 8) | g
    }
    val cw = math.max(1, w / Cells)
    val ch = math.max(1, h / Cells)
    var y = 0
    while (y < h) {
      var x = 0
      val cy = math.min(Cells - 1, y / ch)
      while (x < w) {
        val cx = math.min(Cells - 1, x / cw)
        img.setRGB(x, y, colors(cy * Cells + cx))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(img: BufferedImage, quality: Float = 0.92f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.flush()
    writer.dispose()
    bos.toByteArray
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] =
    if (fmt == "jpg") encodeJpeg(img) else encodePng(img)

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Bilinear resize (real pixels, no stub) — the thumbnail/normalization
    * step of a training-data image pipeline. */
  def resize(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, tw, th, null)
    g.dispose()
    out
  }

  private def gray(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** 64-bit average hash over an 8x8 grid of mean grays. */
  def phash(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](Cells * Cells)
    val counts = new Array[Long](Cells * Cells)
    val cw = math.max(1, w / Cells)
    val ch = math.max(1, h / Cells)
    var y = 0
    while (y < h) {
      val cy = math.min(Cells - 1, y / ch)
      var x = 0
      while (x < w) {
        val cx = math.min(Cells - 1, x / cw)
        val c = cy * Cells + cx
        sums(c) += gray(img.getRGB(x, y))
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(Cells * Cells)(c => if (counts(c) == 0) 0.0 else sums(c) / counts(c))
    val global = means.sum / means.length
    var bits = 0L
    var c = 0
    while (c < Cells * Cells) {
      if (means(c) > global) bits |= (1L << c)
      c += 1
    }
    bits
  }

  /** Peak signal-to-noise ratio between two same-size images (dB). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    var se = 0.0
    var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y)
        val pb = b.getRGB(x, y)
        var shift = 0
        while (shift <= 16) {
          val d = ((pa >> shift) & 0xff) - ((pb >> shift) & 0xff)
          se += d.toDouble * d
          shift += 8
        }
        n += 3
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }
}
