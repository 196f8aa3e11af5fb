package graft.sig

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.util.Hashing

/**
 * Caption normalization + word k-shingling.
 *
 * Reference analog: the text that gets embedded is the concatenated
 * title/description/repro/metadata string (`app/services/similarity_engine.py:106-120`);
 * here the caption is the text and the 384-d embedding is replaced by the
 * set of hashed word k-shingles (BASELINE.json north_rule).
 *
 * Both a Column form (used by the distributed pipeline — stays inside
 * Catalyst / whole-stage codegen, no UDFs) and a pure-Scala form (used by
 * the O(n²) oracle) are provided; `ShingleSpec.scala` asserts they agree
 * bit-for-bit on every corpus row.
 */
object Shingle {

  /** lowercase, strip non-alphanumerics, collapse whitespace. */
  def normalizeCol(caption: Column): Column =
    trim(regexp_replace(lower(caption), "[^\\p{L}\\p{N}]+", " "))

  def normalize(caption: String): String =
    "[^\\p{L}\\p{N}]+".r.replaceAllIn(caption.toLowerCase, " ").trim

  /** Non-empty tokens of the normalized caption. */
  def tokensCol(caption: Column): Column = {
    val toks = split(normalizeCol(caption), " ")
    filter(toks, t => length(t) > 0)
  }

  def tokens(caption: String): Array[String] = {
    val n = normalize(caption)
    if (n.isEmpty) Array.empty[String] else n.split(" ")
  }

  /**
   * Distinct word k-shingles as strings. A caption with fewer than k tokens
   * (but at least one) contributes a single whole-caption shingle so short
   * captions still participate in exact-Jaccard comparison.
   */
  def shinglesCol(caption: Column, k: Int): Column = {
    val toks = tokensCol(caption)
    val whole = array(concat_ws(" ", toks))
    val kgrams = transform(
      sequence(lit(1), size(toks) - lit(k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k)))
    )
    array_distinct(
      when(size(toks) === 0, array().cast("array<string>"))
        .when(size(toks) < k, whole)
        .otherwise(kgrams)
    )
  }

  def shingles(caption: String, k: Int): Array[String] = {
    val toks = tokens(caption)
    val raw =
      if (toks.isEmpty) Array.empty[String]
      else if (toks.length < k) Array(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toArray
    raw.distinct
  }

  /** Distinct xxhash64'd shingles — the "embedding" of the graft. */
  def shingleHashesCol(caption: Column, k: Int): Column =
    array_distinct(transform(shinglesCol(caption, k), s => xxhash64(s)))

  def shingleHashes(caption: String, k: Int): Array[Long] =
    shingles(caption, k).map(s => Hashing.xxh64(s)).distinct

  /** Exact Jaccard over two distinct-element hash arrays (oracle side). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) 0.0
    else {
      val sa = a.toSet
      val inter = b.count(sa.contains)
      val union = sa.size + b.length - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
  }

  /** Exact Jaccard as a Column over two array<long> columns. */
  def jaccardCol(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }
}
