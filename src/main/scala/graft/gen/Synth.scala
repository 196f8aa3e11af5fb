package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.util.Hashing

/** One row of the graft's primary input table (BASELINE.json input_hint). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long
)

/** Ground truth for a generated row (planted group membership). */
final case class TruthRow(image_id: String, group_id: String, kind: String)

/**
 * Deterministic synthetic image+caption corpus with planted duplicate
 * groups (FIXTURES.md §1). Everything is a pure function of (seed, index),
 * so generation runs embarrassingly parallel via `spark.range.mapPartitions`
 * (no driver-side materialization — the same generator shape works at any
 * scale) and tests can re-derive any row locally.
 *
 * Layout: rows come in blocks of 20. In block b (kind = b % 6):
 *   pos 0       anchor of the block's planted group
 *   pos 1..2    variants per kind (see below)
 *   pos 3..17   singletons
 *   pos 18      every 5th block: a low-quality caption (quality-gate food)
 *   pos 19      THE hot row: one caption+image repeated in every block
 *               (giant exact group — skew / salting test)
 *
 * Kinds (reference analogs cited in SURVEY.md §2.3):
 *   0 exact      pos1,2 byte+caption identical to anchor
 *   1 near-dup   pos1 one token replaced (hybrid ≈ 0.80 → flag),
 *                pos2 one token appended (hybrid ≈ 0.96 → block)
 *   2 image      pos1 same pixels JPEG re-encoded, unrelated caption
 *                (caught only by the phash/SimHash pass)
 *   3 substring  pos1 caption = 12 words + anchor caption + 12 words
 *                (caught only by the suffix pass: Jaccard ≈ 0.43 < flag)
 *   4 metadata   pos1 same caption as anchor, jpg instead of png;
 *                pos2 same caption, 48x48 instead of 64x64
 *   5 none       whole block singleton (negative control)
 */
object Synth {

  val Block = 20
  val DefaultSeed = 42L

  // Seeded fixed vocabulary — content-free but word-like.
  val Vocab: Array[String] = {
    val syll = Array("ka", "ro", "mi", "ta", "su", "ne", "lo", "vi", "ze",
      "ba", "du", "fe", "gi", "ho", "ju", "pa", "qu", "ri", "sa", "tu")
    (0 until 160).map { i =>
      val a = syll(i % syll.length)
      val b = syll((i * 7 + 3) % syll.length)
      val c = syll((i * 13 + 5) % syll.length)
      if (i % 3 == 0) a + b else a + b + c
    }.toArray.distinct
  }

  private def rng(seed: Long, parts: Long*): Long = {
    var s = seed
    parts.foreach(p => s = Hashing.splitmix64(s ^ Hashing.splitmix64(p + 0x632be59bd9b4e019L)))
    s
  }

  private def word(r: Long): String = Vocab((r % Vocab.length).toInt.abs)

  /** nTokens words drawn deterministically from the vocab. */
  def makeCaption(seed: Long, tag: Long, nTokens: Int): Array[String] =
    Array.tabulate(nTokens)(t => word(rng(seed, tag, t.toLong)))

  def hotCaption(seed: Long): String = makeCaption(seed, -1L, 20).mkString(" ")

  private val LowQuality = Array(
    "bug", // too short (reference tests/test_duplicate_detector.py:38)
    "THIS IS BROKEN EVERYTHING IS ON FIRE HELP", // all-caps
    "spam spam spam spam spam spam spam spam spam spam spam spam" // low uniqueness
  )

  /** Pure row derivation: everything about row i. */
  def describe(seed: Long, i: Long): (String, String, Int, Int, String, Long, String, String) = {
    val block = i / Block
    val pos = (i % Block).toInt
    val kind = (block % 6).toInt
    val id = f"img-$i%010d"

    val anchorTokens = makeCaption(seed, block, 20)
    // defaults: unique caption, unique pixels, png 64x64
    var caption = makeCaption(seed, rng(seed, block, 1000L + pos), 8 + (rng(seed, block, pos.toLong) % 18).toInt.abs).mkString(" ")
    var pixelSeed = rng(seed, block, 2000L + pos)
    var w = 64; var h = 64; var fmt = "png"
    var group = s"s-$i"
    var kindName = "singleton"

    if (pos == 19) {
      caption = hotCaption(seed); pixelSeed = rng(seed, -2L); group = "hot"; kindName = "hot"
    } else if (pos == 18 && block % 5 == 0) {
      caption = LowQuality((block / 5 % LowQuality.length).toInt)
      group = s"lq-$i"; kindName = "lowquality"
    } else if (pos == 0 && kind != 5) {
      caption = anchorTokens.mkString(" ")
      pixelSeed = rng(seed, block, -10L)
      group = s"g-$block"; kindName = s"anchor$kind"
    } else if (pos >= 1 && pos <= 2 && kind != 5) {
      kind match {
        case 0 => // exact copy
          caption = anchorTokens.mkString(" ")
          pixelSeed = rng(seed, block, -10L)
          group = s"g-$block"; kindName = "exact"
        case 1 =>
          val toks = anchorTokens.clone()
          if (pos == 1) { toks(5) = word(rng(seed, block, -20L)); caption = toks.mkString(" ") }
          else caption = (toks :+ word(rng(seed, block, -21L))).mkString(" ")
          group = s"g-$block"; kindName = "neardup"
        case 2 =>
          if (pos == 1) {
            pixelSeed = rng(seed, block, -10L) // anchor pixels, jpeg re-encode
            fmt = "jpg"
            group = s"g-$block"; kindName = "imagedup"
          }
        case 3 =>
          if (pos == 1) {
            val pre = makeCaption(seed, rng(seed, block, -30L), 12)
            val post = makeCaption(seed, rng(seed, block, -31L), 12)
            caption = (pre ++ anchorTokens ++ post).mkString(" ")
            group = s"g-$block"; kindName = "substring"
          }
        case 4 =>
          caption = anchorTokens.mkString(" ")
          if (pos == 1) fmt = "jpg" else { w = 48; h = 48 }
          group = s"g-$block"; kindName = "metadata"
        case _ => ()
      }
    }
    (id, caption, w, h, fmt, pixelSeed, group, kindName)
  }

  def makeRow(seed: Long, i: Long): ImageRow = {
    val (id, caption, w, h, fmt, pixelSeed, _, kindName) = describe(seed, i)
    // the JPEG near-dup variant is perturbed slightly so its phash lands at
    // small-but-nonzero Hamming distance from the anchor's
    val img = Images.render(pixelSeed, w, h, jitter = if (kindName == "imagedup") 2 else 0)
    val bytes = Images.encode(img, fmt)
    // phash from the DECODED bytes: a lossy encode genuinely perturbs it
    val ph = Images.phash(if (fmt == "jpg") Images.decode(bytes) else img)
    ImageRow(id, bytes, w, h, fmt, caption, ph)
  }

  def makeTruth(seed: Long, i: Long): TruthRow = {
    val (id, _, _, _, _, _, group, kind) = describe(seed, i)
    TruthRow(id, group, kind)
  }

  /** Distributed corpus generation — one task per range partition. */
  def corpus(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
      partitions: Int = 0): Dataset[ImageRow] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).mapPartitions(_.map(i => makeRow(seed, i)))
  }

  def truth(spark: SparkSession, n: Long, seed: Long = DefaultSeed): DataFrame = {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).mapPartitions(_.map(i => makeTruth(seed, i))).toDF()
  }
}
