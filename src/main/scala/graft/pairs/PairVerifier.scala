package graft.pairs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.config.DedupConfig
import graft.sig.{Shingle, SimHash}

/**
 * Candidate verification — exact measures over every candidate pair
 * (the reference's per-candidate hydrate + score loop,
 * `app/services/similarity_engine.py:57-104`, as one joined projection).
 *
 * For each (src, dst):
 *   content_sim   exact Jaccard over shingle-hash sets (replaces cosine)
 *   meta_sim      weighted metadata similarity (Meta.scala)
 *   hybrid        0.7*content + 0.3*meta, cross-orientation penalty
 *   phash_hamming Hamming distance of the perceptual hashes
 *   is_substring  token-aligned caption containment (either direction)
 *
 * Edge rule (what links two rows into one cluster):
 *   hybrid >= flagThreshold            (reference decision rule)
 *   OR phash_hamming <= maxHamming     (image near-dup, north rule)
 *   OR is_substring                    (suffix pass, north rule)
 *
 * match_score = the strongest passing evidence; blocked at >= 0.85, flagged
 * at >= 0.70 (`app/services/duplicate_detector.py:89-94`). Pairs below the
 * reference's prefilter (flag*0.8, `similarity_engine.py:81-83`) that pass
 * no other rule are dropped from the verified-pairs table.
 */
object PairVerifier {

  /** Generator names in mask-bit order (sources arrays come out in this
    * order, deterministically). */
  private val SourceNames = Seq("exact", "minhash", "simhash", "substring")

  /** features must carry (image_id, norm, shingles, w, h, fmt, phash). */
  def verify(candidates: DataFrame, features: DataFrame, cfg: DedupConfig): DataFrame = {
    // dedup the generators' pair multiset with a BITMASK bit_or, not
    // collect_set(string): collect_set forces ObjectHashAggregate (outside
    // whole-stage codegen) and shuffles a string per candidate row — over
    // the biggest table in the pipeline. The mask aggregate stays in
    // codegen, partial-aggregates map-side, and decodes to the same
    // array<string> after the shuffle.
    val mask = SourceNames.zipWithIndex.foldLeft(lit(0L)) { case (acc, (n, i)) =>
      acc + when(col("source") === n, lit(1L << i)).otherwise(0L)
    }
    val byPair = candidates
      .select(col("src"), col("dst"), mask.as("src_mask"))
      .groupBy("src", "dst").agg(expr("bit_or(src_mask)").as("src_mask"))
      .withColumn("sources",
        filter(
          array(SourceNames.zipWithIndex.map { case (n, i) =>
            when(col("src_mask").bitwiseAND(lit(1L << i)) =!= 0L, n)
          }: _*),
          x => x.isNotNull))
      .drop("src_mask")

    def side(p: String): DataFrame = features.select(
      col("image_id").as(s"${p}_id"), col("norm").as(s"${p}_norm"),
      col("shingles").as(s"${p}_shingles"), col("w").as(s"${p}_w"),
      col("h").as(s"${p}_h"), col("fmt").as(s"${p}_fmt"), col("phash").as(s"${p}_phash"))

    val hydrated = byPair
      .join(side("a"), col("src") === col("a_id"))
      .join(side("b"), col("dst") === col("b_id"))

    val content = Shingle.jaccardCol(col("a_shingles"), col("b_shingles"))
    val meta = Meta.metaSimCol(col("a_w"), col("a_h"), col("a_fmt"),
      col("b_w"), col("b_h"), col("b_fmt"))
    val hybrid = Meta.hybridCol(col("content_sim"), col("meta_sim"),
      col("a_w"), col("a_h"), col("b_w"), col("b_h"), cfg)
    val hamming = SimHash.hammingCol(col("a_phash"), col("b_phash"))

    // token-aligned at BOTH ends — same rule as SuffixDup.isTokenAlignedSubstring
    def contained(x: String, y: String) =
      length(col(s"${x}_norm")) >= cfg.substringMinLen &&
        col(s"${x}_norm") =!= col(s"${y}_norm") &&
        concat(lit(" "), col(s"${y}_norm"), lit(" "))
          .contains(concat(lit(" "), col(s"${x}_norm"), lit(" ")))

    val (matching, differing, confidence) = Meta.matchDetailCols(
      col("a_w"), col("a_h"), col("a_fmt"), col("b_w"), col("b_h"), col("b_fmt"))

    hydrated
      .withColumn("content_sim", content)
      .withColumn("meta_sim", meta)
      .withColumn("hybrid", hybrid)
      .withColumn("phash_hamming", hamming)
      .withColumn("is_substring", contained("a", "b") || contained("b", "a"))
      .withColumn("passes_hybrid", col("hybrid") >= cfg.flagThreshold)
      .withColumn("passes_image", col("phash_hamming") <= cfg.maxHamming)
      .withColumn("is_edge",
        col("passes_hybrid") || col("passes_image") || col("is_substring"))
      .withColumn("match_score", greatest(
        col("hybrid"),
        when(col("passes_image"),
          SimHash.hammingSimCol(col("a_phash"), col("b_phash"))).otherwise(0.0),
        when(col("is_substring"), cfg.flagThreshold).otherwise(0.0)))
      .withColumn("matching_fields", matching)
      .withColumn("differing_fields", differing)
      .withColumn("confidence", confidence)
      // reference prefilter: keep near-misses for audit, drop noise
      .where(col("is_edge") || col("hybrid") >= cfg.prefilterThreshold)
      .select("src", "dst", "sources", "content_sim", "meta_sim", "hybrid",
        "phash_hamming", "is_substring", "passes_hybrid", "passes_image",
        "is_edge", "match_score", "matching_fields", "differing_fields", "confidence")
  }
}
