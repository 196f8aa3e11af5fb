package graft.gen

import java.nio.ByteBuffer

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.Hashing

/** One opaque video blob + typed metadata — the multimodal-column contract:
  * the engine never interprets `bytes` outside the demux step. */
final case class VideoRow(
    video_id: String,
    bytes: Array[Byte],
    n_frames: Int,
    fps: Double,
    w: Int,
    h: Int
)

/**
 * Deterministic synthetic "video" corpus + the container codec the
 * frame-sample operator demuxes.
 *
 * STUB BOUNDARY (clearly marked, per the builder prompt): a real deployment
 * demuxes mp4/webm through a codec library, and none ships in this
 * environment — so the CONTAINER FORMAT is the stand-in: a length-prefixed
 * concatenation of real PNG frames
 * (`[n_frames:int32][len_0:int32][png_0]...[len_k:int32][png_k]`).
 * Everything around that boundary is real and is what the Spark side
 * actually exercises: the opaque binary column with typed metadata, the
 * per-partition demux batch shape, real `javax.imageio` frame decode, and
 * the explode-to-frames output schema. Swapping in a real demuxer changes
 * only `unpack`.
 *
 * Frames are rendered with a per-frame `jitter` over one base seed — the
 * cheap deterministic analog of motion: consecutive frames are near-dups
 * of each other, so sampled frames land in the same perceptual-hash
 * neighborhood exactly like consecutive real video frames do.
 */
object Videos {

  val FramesPerVideo = 8
  val Fps = 4.0
  val FrameW = 48
  val FrameH = 32

  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 4 + frames.map(_.length + 4).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Demux: iterate the container's frames without materializing them all —
    * the per-partition memory bound is one frame, not one video. */
  def unpack(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    Iterator.tabulate(n) { _ =>
      val len = buf.getInt()
      val f = new Array[Byte](len)
      buf.get(f)
      f
    }
  }

  def makeVideo(seed: Long, i: Long): VideoRow = {
    val base = Hashing.splitmix64(seed ^ (0x51dec0deL + i))
    val frames = (0 until FramesPerVideo).map { f =>
      Images.encodePng(Images.render(base, FrameW, FrameH, jitter = f))
    }
    VideoRow(f"vid-$i%08d", pack(frames), FramesPerVideo, Fps, FrameW, FrameH)
  }

  /** Same embarrassingly-parallel generator shape as `Synth.corpus`: pure
    * function of (seed, index), no driver-side materialization. */
  def corpus(spark: SparkSession, n: Long, seed: Long = Synth.DefaultSeed): Dataset[VideoRow] = {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).mapPartitions(_.map(i => makeVideo(seed, i)))
  }
}
