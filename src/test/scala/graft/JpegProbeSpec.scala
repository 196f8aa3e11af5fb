package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.Images

class JpegProbeSpec extends AnyFunSuite {
  test("probe: psnr vs quality") {
    val img = Images.render(12345L, 64, 64)
    for (q <- Seq(0.85f, 0.92f, 0.95f, 0.98f, 1.0f)) {
      val bytes = Images.encodeJpeg(img, q)
      val dec = Images.decode(bytes)
      info(f"q=$q%.2f psnr=${Images.psnr(img, dec)}%.2f size=${bytes.length}")
    }
    // grayscale-ish image (low chroma): does PSNR recover?
    val gimg = {
      val i = Images.render(12345L, 64, 64)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (i.getRGB(x, y) >> 16) & 0xff
        i.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      i
    }
    for (q <- Seq(0.92f, 1.0f)) {
      val bytes = Images.encodeJpeg(gimg, q)
      info(f"gray q=$q%.2f psnr=${Images.psnr(gimg, Images.decode(bytes))}%.2f")
    }
  }
}
