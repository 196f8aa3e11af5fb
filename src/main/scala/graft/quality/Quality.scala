package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.config.DedupConfig
import graft.sig.Shingle

/**
 * Rule-based quality gate over captions — the reference's
 * `app/services/quality_checker.py:33-135` predicates mapped onto the
 * caption field (FIXTURES.md §2):
 *
 *   missing_caption    null / whitespace-only
 *   short_caption      normalized length < minCaptionLen (10,
 *                      `quality_checker.py:46-52` / `app/config.py:52`)
 *   generic_caption    whole caption in the generic list
 *                      (`quality_checker.py:94-111`)
 *   low_uniqueness     distinct/total token ratio < 0.3 with >= 5 tokens
 *                      (`quality_checker.py:114-121`)
 *   all_caps           caption uppercase and > 20 chars
 *                      (`quality_checker.py:123-127`)
 *   special_chars      non-alphanumeric/space ratio > 0.3
 *                      (`quality_checker.py:129-135`)
 *
 * Score: 1.0 minus a per-issue penalty, clamped at 0
 * (`quality_checker.py:137-170`); severity buckets critical/major
 * (`quality_checker.py:172-203`). A row with ANY issue is diverted to the
 * low-quality queue and excluded from dedup (reference: rejected bugs never
 * reach the similarity engine, `app/services/duplicate_detector.py:60-72`).
 *
 * Implemented twice with identical semantics: Column expressions (pipeline,
 * codegen-friendly — no UDFs) and plain Scala (oracle).
 */
object Quality {

  val Generic: Set[String] =
    Set("bug", "issue", "error", "problem", "crash", "broken", "help", "test", "fix")

  val CriticalIssues: Set[String] = Set("missing_caption", "short_caption", "generic_caption")

  val Penalties: Map[String, Double] = Map(
    "missing_caption" -> 0.4,
    "short_caption" -> 0.3,
    "generic_caption" -> 0.3,
    "low_uniqueness" -> 0.3,
    "all_caps" -> 0.1,
    "special_chars" -> 0.2
  )

  /** array<string> of issue codes for a caption column. */
  def issuesCol(caption: Column, cfg: DedupConfig): Column = {
    val norm = Shingle.normalizeCol(caption)
    val toks = Shingle.tokensCol(caption)
    val nTok = size(toks).cast("double")
    val uniqRatio = when(nTok === 0, 1.0)
      .otherwise(size(array_distinct(toks)).cast("double") / nTok)
    val stripped = regexp_replace(caption, "[\\p{L}\\p{N}\\s]", "")
    val specialRatio = when(length(caption) === 0, 0.0)
      .otherwise(length(stripped).cast("double") / length(caption).cast("double"))

    val checks: Seq[(String, Column)] = Seq(
      "missing_caption" -> (caption.isNull || length(trim(caption)) === 0),
      "short_caption" -> (caption.isNotNull && length(trim(caption)) > 0 &&
        length(norm) < cfg.minCaptionLen),
      "generic_caption" -> norm.isin(Generic.toSeq: _*),
      "low_uniqueness" -> (size(toks) >= 5 && uniqRatio < cfg.minUniqueTokenRatio),
      "all_caps" -> (caption.isNotNull && length(caption) > 20 &&
        caption === upper(caption) && caption =!= lower(caption)),
      "special_chars" -> (caption.isNotNull && specialRatio > cfg.maxSpecialCharRatio)
    )
    val arr = array(checks.map { case (name, cond) =>
      when(cond, lit(name)).otherwise(lit(null: String))
    }: _*)
    filter(arr, c => c.isNotNull)
  }

  /** Code points, not UTF-16 units — Spark's `length()` counts code points,
    * so the oracle must too or astral characters break bit-parity. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  def issues(caption: String, cfg: DedupConfig): Seq[String] = {
    val cap = Option(caption).getOrElse("")
    val norm = Shingle.normalize(cap)
    val toks = Shingle.tokens(cap)
    val uniqRatio = if (toks.isEmpty) 1.0 else toks.distinct.length.toDouble / toks.length
    // SAME Java regex as the Column side (regexp_replace compiles the same
    // pattern), and code-point lengths on both sides: Character.isWhitespace
    // disagrees with regex \s on e.g. U+2028, and String.length disagrees
    // with Spark length() on astral chars — either quietly broke parity on
    // non-ASCII captions before.
    val specialRatio =
      if (cap.isEmpty) 0.0
      else cpLen(cap.replaceAll("[\\p{L}\\p{N}\\s]", "")).toDouble / cpLen(cap)
    val missing = cap.trim.isEmpty
    Seq(
      "missing_caption" -> missing,
      "short_caption" -> (!missing && cpLen(norm) < cfg.minCaptionLen),
      "generic_caption" -> Generic.contains(norm),
      "low_uniqueness" -> (toks.length >= 5 && uniqRatio < cfg.minUniqueTokenRatio),
      "all_caps" -> (cpLen(cap) > 20 && cap == cap.toUpperCase && cap != cap.toLowerCase),
      "special_chars" -> (cap.nonEmpty && specialRatio > cfg.maxSpecialCharRatio)
    ).collect { case (n, true) => n }
  }

  /** 1.0 minus per-issue penalties, clamped at 0. */
  def scoreCol(issuesC: Column): Column = {
    val penalty = aggregate(
      issuesC,
      lit(0.0),
      (acc, issue) => acc + coalesce(
        element_at(
          map(Penalties.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          issue),
        lit(0.0))
    )
    greatest(lit(0.0), lit(1.0) - penalty)
  }

  def score(is: Seq[String]): Double =
    math.max(0.0, 1.0 - is.map(i => Penalties.getOrElse(i, 0.0)).sum)

  /** critical / major / ok severity bucket. */
  def severityCol(issuesC: Column): Column =
    when(size(filter(issuesC, i => i.isin(CriticalIssues.toSeq: _*))) > 0, "critical")
      .when(size(issuesC) > 0, "major")
      .otherwise("ok")

  def severity(is: Seq[String]): String =
    if (is.exists(CriticalIssues.contains)) "critical"
    else if (is.nonEmpty) "major"
    else "ok"

  /** Gate: any issue at all → low quality (excluded from dedup). */
  def isLowQualityCol(issuesC: Column): Column = size(issuesC) > 0

  def isLowQuality(is: Seq[String]): Boolean = is.nonEmpty
}
