package graft.sig

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.config.DedupConfig

/**
 * Exact-substring duplicate captions (north-rule "suffix-array pass").
 *
 * Semantics: caption A is a token-aligned exact substring of caption B
 * (A != B, |A| >= substringMinLen after normalization). Detected with a
 * distributed generalized-suffix construction expressed as a join — the
 * Spark-native equivalent of a suffix array lookup:
 *
 *   build side:  every token-aligned suffix of every caption, keyed by its
 *                first W characters (W = prefix window);
 *   probe side:  every caption, keyed by its own first min(W, len) chars;
 *   join on key, then verify `contains` (removes prefix-window collisions
 *                and enforces true substring containment).
 *
 * Keying by a fixed-width prefix bounds key cardinality and makes the join
 * a plain shuffle equi-join — at 10^12 rows the explode factor is
 * O(tokens per caption) ≈ 8-25, far cheaper than an actual distributed
 * suffix array, with identical results for token-aligned matches. A probe
 * caption shorter than W uses its full text as key and suffixes emit
 * truncated prefixes of every length? No — equality of the first
 * min(W,|A|) chars of the suffix is required, so the build side emits, per
 * suffix, the single W-char prefix AND the probe side pads its key to the
 * same width by keying on min-width truncation of both sides; see
 * `prefixKey`.
 */
object SuffixDup {

  /** Fixed prefix window for suffix keys. */
  val PrefixWindow = 16

  /** Join key: the first `width` characters. `width = min(PrefixWindow,
    * substringMinLen)`, and both probe captions and build suffixes shorter
    * than `substringMinLen` are dropped, so every key on either side is
    * exactly `width` chars — the equi-join loses no true match. */
  def prefixKey(c: Column, width: Int): Column = substring(c, 1, width)

  /**
   * Candidate (a, b) pairs where normalized caption of `a` is a token-aligned
   * substring of normalized caption of `b`, a != b. Input: DataFrame with
   * (id: long, norm: string) where norm is the normalized caption.
   * Output: (src_id, dst_id) with src_id != dst_id — containment pairs,
   * both orientations possible.
   */
  def substringPairs(captions: DataFrame, cfg: DedupConfig): DataFrame = {
    val w = math.min(PrefixWindow, cfg.substringMinLen)

    // probe side: captions long enough to be meaningful substrings
    val probe = captions
      .where(length(col("norm")) >= cfg.substringMinLen)
      .select(col("id").as("a_id"), col("norm").as("a_norm"),
        prefixKey(col("norm"), w).as("k"))

    // build side: token-aligned suffixes of every caption, keyed by first w chars
    val toks = captions.select(
      col("id").as("b_id"), col("norm").as("b_norm"),
      split(col("norm"), " ").as("toks"))
    val suffixes = toks
      .select(col("b_id"), col("b_norm"),
        explode(
          transform(sequence(lit(1), size(col("toks"))),
            i => concat_ws(" ", slice(col("toks"), i, size(col("toks"))))))
          .as("suffix"))
      .where(length(col("suffix")) >= cfg.substringMinLen)
      .select(col("b_id"), col("b_norm"), prefixKey(col("suffix"), w).as("k"))
      .dropDuplicates("b_id", "k")

    probe
      .join(suffixes, "k")
      .where(col("a_id") =!= col("b_id"))
      // containment starting at a token boundary, verified on full strings
      // (identical rule to `isTokenAlignedSubstring` below)
      .where(concat(lit(" "), col("b_norm")).contains(concat(lit(" "), col("a_norm"))))
      .where(col("a_norm") =!= col("b_norm"))
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .distinct()
  }

  /** Oracle-side containment check — same rule as the Spark verify above:
    * A occurs in B starting at a token boundary, A != B, A long enough. */
  def isTokenAlignedSubstring(aNorm: String, bNorm: String, cfg: DedupConfig): Boolean =
    aNorm.length >= cfg.substringMinLen && aNorm != bNorm &&
      (" " + bNorm).contains(" " + aNorm)
}
