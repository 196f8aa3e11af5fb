package graft.pairs

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.config.DedupConfig
import graft.sig.{MinHash, Shingle, SimHash, SuffixDup}

/**
 * Candidate-pair generation (the reference's FAISS top-k ANN search,
 * `app/utils/vector_store.py:71-103`, re-architected as shuffle equi-joins —
 * SURVEY.md §2.3 J3).
 *
 * Scale design:
 *  1. EXACT SHORT-CIRCUIT. Rows identical in every dedup-relevant feature
 *     (normalized caption, w, h, fmt, phash) are collapsed to their
 *     min-image_id representative before any LSH work. Members are linked to
 *     the rep by an unconditional edge (identical features → hybrid = 1.0).
 *     This is lossless — a member behaves identically to its rep in every
 *     downstream measure — and it removes the dominant skew source
 *     (boilerplate/hot captions) from the band join.
 *  2. MINHASH LSH over the reps: explode band keys, self-join on
 *     (band, key). Buckets above `bucketSizeCap` go through a salted
 *     grid join (see `saltedSelfJoin`) so no single reducer sees O(m²) work.
 *  3. SIMHASH over distinct phashes (pigeonhole bands; perfect recall for
 *     Hamming <= bands-1), plus same-phash membership pairs.
 *  4. SUBSTRING pass over distinct normalized captions, expanded back to
 *     members (the substring rule is a caption-level property).
 *
 * All generators emit (src, dst, source) with src < dst lexicographically;
 * union + distinct-by-pair happens in the pipeline.
 */
object Candidates {

  /** Exact-feature key and representative; input must carry
    * (image_id, norm, w, h, fmt, phash). Adds `exact_key` and `rep`. */
  def withExactRep(features: DataFrame): DataFrame = {
    val keyed = features.withColumn("exact_key",
      xxhash64(col("norm"), col("w"), col("h"), col("fmt"), col("phash")))
    keyed.withColumn("rep", min(col("image_id")).over(Window.partitionBy(col("exact_key"))))
  }

  /** Unconditional member→rep pairs from exact groups. */
  def exactPairs(withRep: DataFrame): DataFrame =
    withRep.where(col("image_id") =!= col("rep"))
      .select(col("rep").as("src"), col("image_id").as("dst"), lit("exact").as("source"))

  /**
   * Self-join of (id, band, key) rows on (band, key), producing ordered
   * pairs, with buckets larger than `cap` routed through a salted grid:
   * members of a big bucket are split into g = ceil(m/cap) salt groups;
   * pair (si, sj), si <= sj, is produced by exactly one reducer keyed
   * (band, key, si, sj). Identical pair set to the naive join (asserted in
   * CandidatesSpec), bounded work per reducer.
   */
  def saltedSelfJoin(banded: DataFrame, cap: Int): DataFrame = {
    val sizes = banded.groupBy("band", "bkey").agg(count(lit(1)).as("m"))
    val tagged = banded.join(sizes, Seq("band", "bkey"))

    val small = tagged.where(col("m") <= cap).drop("m")
    val smallPairs = small.as("l").join(small.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("src"), col("r.id").as("dst"))

    val big = tagged.where(col("m") > cap)
      .withColumn("g", ceil(col("m").cast("double") / cap).cast("int"))
      .withColumn("salt", pmod(xxhash64(col("id")), col("g")).cast("int"))
    // left replicated to (salt, sj) for sj in salt..g-1; right to (si, salt) for si in 0..salt
    val bigL = big.select(col("band"), col("bkey"), col("id"), col("salt").as("si"),
      explode(sequence(col("salt"), col("g") - 1)).as("sj"))
    val bigR = big.select(col("band"), col("bkey"), col("id"), col("salt").as("sj2"),
      explode(sequence(lit(0), col("salt"))).as("si2"))
    // cross-group reducers (si < sj) see each unordered pair exactly once
    // (left emits only keys with si = own salt); same-group reducers
    // (si == sj) order by id to avoid double counting.
    val bigPairs = bigL.as("l").join(bigR.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.si") === col("r.si2") && col("l.sj") === col("r.sj2"))
      .where(col("l.si") < col("l.sj") || col("l.id") < col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("src"),
        greatest(col("l.id"), col("r.id")).as("dst"))

    smallPairs.union(bigPairs)
  }

  /** MinHash/LSH candidates over the exact-group representatives. */
  def minhashPairs(reps: DataFrame, cfg: DedupConfig): DataFrame = {
    val banded = reps
      .where(col("shingles").isNotNull && size(col("shingles")) > 0)
      .select(col("image_id").as("id"),
        posexplode(MinHash.bandKeysCol(
          MinHash.signatureCol(col("shingles"), cfg.numHashes, cfg.hashSeed),
          cfg.bands, cfg.hashSeed)).as(Seq("band", "bkey")))
    saltedSelfJoin(banded, cfg.bucketSizeCap)
      .distinct()
      .withColumn("source", lit("minhash"))
  }

  /** SimHash candidates: distinct phashes banded by pigeonhole slices,
    * plus same-phash membership pairs (Hamming 0). */
  def simhashPairs(clean: DataFrame, cfg: DedupConfig): DataFrame = {
    val phRep = clean
      .withColumn("prep", min(col("image_id")).over(Window.partitionBy(col("phash"))))
    val samePhash = phRep.where(col("image_id") =!= col("prep"))
      .select(col("prep").as("src"), col("image_id").as("dst"))

    val distinctPh = phRep.where(col("image_id") === col("prep"))
      .select(col("prep").as("id"), col("phash"))
    val banded = distinctPh.select(col("id"),
      posexplode(SimHash.comboKeysCol(col("phash"), cfg.phashBands)).as(Seq("band", "bkey")))
    val bandPairs = saltedSelfJoin(banded, cfg.bucketSizeCap).distinct()

    samePhash.union(bandPairs).withColumn("source", lit("simhash"))
  }

  /** Substring candidates over distinct normalized captions, expanded back
    * to all member rows (caption-level rule → member-level edges). */
  def substringPairs(clean: DataFrame, cfg: DedupConfig): DataFrame = {
    val normRep = clean
      .withColumn("nrep", min(col("image_id")).over(Window.partitionBy(col("norm"))))
    val membership = normRep.select(col("image_id").as("member"), col("norm"))
    val reps = normRep.where(col("image_id") === col("nrep"))
      .select(col("nrep").as("id"), col("norm"))

    val repPairs = SuffixDup.substringPairs(reps, cfg) // (src=contained, dst=container)
      .join(reps.select(col("id").as("src"), col("norm").as("src_norm")), "src")
      .join(reps.select(col("id").as("dst"), col("norm").as("dst_norm")), "dst")

    // every member of the contained caption ↔ container rep, and vice versa
    val left = repPairs.join(membership, col("norm") === col("src_norm"))
      .select(col("member").as("a"), col("dst").as("b"))
    val right = repPairs.join(membership, col("norm") === col("dst_norm"))
      .select(col("src").as("a"), col("member").as("b"))

    left.union(right)
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"))
      .distinct()
      .withColumn("source", lit("substring"))
  }
}
