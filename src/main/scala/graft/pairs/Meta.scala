package graft.pairs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config.DedupConfig

/**
 * Weighted metadata similarity + hybrid scoring — the reference's
 * `app/services/similarity_engine.py:122-233` re-expressed over the graft's
 * image metadata (w, h, fmt, derived orientation/size/aspect).
 *
 * Field mapping (reference field → graft field, weight):
 *   device   → fmt (exact, case-insensitive)           0.20  (:140-143)
 *   build    → dims "w.h" (exact 0.30 / width-only
 *              partial 0.15, the major.minor rule)      0.30  (:144-152,175-186)
 *   region   → orientation (landscape/portrait/square) 0.20  (:153-156)
 *   os       → size bucket floor(log2(w*h))            0.15  (:157-160)
 *   severity → aspect ratio round(16*w/h)              0.15  (:161-164)
 *
 * Normalized by the total weight of PRESENT field pairs (:172-173) — in the
 * graft only `fmt` is nullable; the derived fields always exist.
 *
 * hybrid = 0.7*content + 0.3*metadata (:74,188-207); cross-orientation
 * penalty −0.05 clamped at 0 (region analog, :209-233).
 */
object Meta {

  val WFmt = 0.2
  val WDims = 0.3
  val WOrient = 0.2
  val WSize = 0.15
  val WAspect = 0.15

  // ---- Column side --------------------------------------------------------

  def orientationCol(w: Column, h: Column): Column =
    when(w > h, "landscape").when(w < h, "portrait").otherwise("square")

  def sizeBucketCol(w: Column, h: Column): Column =
    floor(log(2.0, (w * h).cast("double"))).cast("int")

  def aspectCol(w: Column, h: Column): Column =
    round(lit(16.0) * w.cast("double") / h.cast("double")).cast("int")

  /** Weighted metadata similarity between two (w,h,fmt) triples. */
  def metaSimCol(w1: Column, h1: Column, f1: Column,
      w2: Column, h2: Column, f2: Column): Column = {
    val fmtPresent = f1.isNotNull && f2.isNotNull
    val fmtScore = when(fmtPresent && lower(f1) === lower(f2), WFmt).otherwise(0.0)
    val dimsScore = when(w1 === w2 && h1 === h2, WDims)
      .when(w1 === w2, WDims / 2) // major.minor partial-credit rule
      .otherwise(0.0)
    val orientScore = when(orientationCol(w1, h1) === orientationCol(w2, h2), WOrient).otherwise(0.0)
    val sizeScore = when(sizeBucketCol(w1, h1) === sizeBucketCol(w2, h2), WSize).otherwise(0.0)
    val aspectScore = when(aspectCol(w1, h1) === aspectCol(w2, h2), WAspect).otherwise(0.0)
    val present = when(fmtPresent, WFmt).otherwise(0.0) + lit(WDims + WOrient + WSize + WAspect)
    val total = fmtScore + dimsScore + orientScore + sizeScore + aspectScore
    when(present === 0.0, 0.0).otherwise(total / present)
  }

  /** hybrid = wC*content + wM*meta, then cross-orientation penalty, clamped. */
  def hybridCol(content: Column, meta: Column,
      w1: Column, h1: Column, w2: Column, h2: Column, cfg: DedupConfig): Column = {
    val raw = lit(cfg.contentWeight) * content + lit(cfg.metadataWeight) * meta
    when(orientationCol(w1, h1) =!= orientationCol(w2, h2),
      greatest(lit(0.0), raw - cfg.crossOrientationPenalty)).otherwise(raw)
  }

  /** matching/differing field name arrays + confidence bucket (J8,
    * `similarity_engine.py:235-321`). Returns (matching, differing, confidence). */
  def matchDetailCols(w1: Column, h1: Column, f1: Column,
      w2: Column, h2: Column, f2: Column): (Column, Column, Column) = {
    val fields: Seq[(String, Column)] = Seq(
      "fmt" -> (f1.isNotNull && f2.isNotNull && lower(f1) === lower(f2)),
      "dims" -> (w1 === w2 && h1 === h2),
      "orientation" -> (orientationCol(w1, h1) === orientationCol(w2, h2)),
      "size_bucket" -> (sizeBucketCol(w1, h1) === sizeBucketCol(w2, h2)),
      "aspect" -> (aspectCol(w1, h1) === aspectCol(w2, h2))
    )
    val matching = filter(
      array(fields.map { case (n, c) => when(c, lit(n)).otherwise(lit(null: String)) }: _*),
      x => x.isNotNull)
    val differing = filter(
      array(fields.map { case (n, c) => when(!c, lit(n)).otherwise(lit(null: String)) }: _*),
      x => x.isNotNull)
    val confidence = when(size(matching) >= 3, "high")
      .when(size(matching) >= 1, "medium")
      .otherwise("low")
    (matching, differing, confidence)
  }

  // ---- Scala side (oracle) -------------------------------------------------

  def orientation(w: Int, h: Int): String =
    if (w > h) "landscape" else if (w < h) "portrait" else "square"

  def sizeBucket(w: Int, h: Int): Int =
    math.floor(math.log(w.toDouble * h) / math.log(2.0)).toInt

  def aspect(w: Int, h: Int): Int = math.round(16.0 * w / h).toInt

  def metaSim(w1: Int, h1: Int, f1: String, w2: Int, h2: Int, f2: String): Double = {
    val fmtPresent = f1 != null && f2 != null
    var total = 0.0
    var present = WDims + WOrient + WSize + WAspect
    if (fmtPresent) {
      present += WFmt
      if (f1.equalsIgnoreCase(f2)) total += WFmt
    }
    total += (if (w1 == w2 && h1 == h2) WDims else if (w1 == w2) WDims / 2 else 0.0)
    if (orientation(w1, h1) == orientation(w2, h2)) total += WOrient
    if (sizeBucket(w1, h1) == sizeBucket(w2, h2)) total += WSize
    if (aspect(w1, h1) == aspect(w2, h2)) total += WAspect
    if (present == 0.0) 0.0 else total / present
  }

  def hybrid(content: Double, meta: Double,
      w1: Int, h1: Int, w2: Int, h2: Int, cfg: DedupConfig): Double = {
    val raw = cfg.contentWeight * content + cfg.metadataWeight * meta
    if (orientation(w1, h1) != orientation(w2, h2))
      math.max(0.0, raw - cfg.crossOrientationPenalty)
    else raw
  }
}
