package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{Images, Videos}
import graft.queries.Engine

/**
 * Multimodal operators: resize/thumbnail and video frame sampling.
 * The decode and resize paths are real pixels (javax.imageio +
 * Graphics2D bilinear); the video CONTAINER is the documented stub
 * boundary (gen/Videos.scala).
 */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("thumbnails: real bilinear resize preserves the perceptual hash neighborhood") {
    import spark.implicits._
    val rows = Engine.imageThumbnails(spark, dir)
      .select("image_id", "thumb_phash", "tw", "th", "thumb_bytes")
      .as[(String, Long, Int, Int, Long)].collect()
    assert(rows.length == Engine.synthRows(dir))
    assert(rows.forall { case (_, _, tw, th, tb) => tw == 64 && th == 64 && tb > 0 })

    // the average hash is scale-stable: resizing must keep the thumbnail's
    // phash within a small Hamming radius of the original's — a pixel-level
    // correctness probe, not just a smoke test
    val orig = graft.gen.Synth.corpus(spark, Engine.synthRows(dir))
      .map(r => (r.image_id, r.phash)).collect().toMap
    val hams = rows.map { case (id, tp, _, _, _) =>
      java.lang.Long.bitCount(tp ^ orig(id))
    }
    val meanHam = hams.sum.toDouble / hams.length
    info(f"mean Hamming(phash(orig), phash(thumb64)) = $meanHam%.2f, max=${hams.max}")
    assert(meanHam <= 8.0, f"bilinear thumbnails drifted from originals: mean Hamming $meanHam%.2f")

    // determinism: the PNG re-encode and resize are pure
    val again = Engine.imageThumbnails(spark, dir)
      .select("image_id", "thumb_phash", "thumb_bytes")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(again sameElements rows.map(r => (r._1, r._2, r._5)).sortBy(_._1))
  }

  test("video frame sampling: every k-th frame, real decode, correct timestamps") {
    import spark.implicits._
    val everyK = 2
    val out = Engine.videoFrames(spark, dir, everyK)
    // the sampling cap must be disclosed in the output contract
    assert(out.columns.contains("sampled_videos") && out.columns.contains("video_pool"))
    val frames = out
      .select("video_id", "frame_idx", "ts_sec", "w", "h", "frame_phash")
      .as[(String, Int, Double, Int, Int, Long)].collect()
    val nVideos = math.max(1L, math.min(Engine.synthRows(dir) / 10, 500L))
    val perVideo = (Videos.FramesPerVideo + everyK - 1) / everyK
    assert(frames.length == nVideos * perVideo,
      s"expected $nVideos×$perVideo sampled frames, got ${frames.length}")
    assert(frames.forall { case (_, idx, ts, w, h, _) =>
      idx % everyK == 0 && ts == idx / Videos.Fps && w == Videos.FrameW && h == Videos.FrameH
    })

    // consecutive sampled frames are jittered renders of one base seed —
    // near-dups, like real video motion: their phashes must sit close
    val byVideo = frames.groupBy(_._1).values
    val neighborHams = byVideo.flatMap { fs =>
      fs.sortBy(_._2).sliding(2).collect { case Array(a, b) =>
        java.lang.Long.bitCount(a._6 ^ b._6)
      }
    }
    val meanHam = neighborHams.sum.toDouble / neighborHams.size
    info(f"mean Hamming between consecutive sampled frames = $meanHam%.2f")
    assert(meanHam <= 16.0, "consecutive frames of one video must be perceptual near-dups")

    // demux round-trip: unpack is the exact inverse of pack
    val v = Videos.makeVideo(graft.gen.Synth.DefaultSeed, 7L)
    val fs = Videos.unpack(v.bytes).toSeq
    assert(fs.length == Videos.FramesPerVideo)
    assert(Videos.pack(fs).toSeq == v.bytes.toSeq)
    // frames decode with the expected dimensions (real imageio decode)
    val img = Images.decode(fs.head)
    assert(img.getWidth == Videos.FrameW && img.getHeight == Videos.FrameH)
  }
}
