package graft.sig

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Distinct xxhash64'd shingles — the "embedding" of the graft.
    *
    * Computed by the fused `NormShingleHashes` expression over the
    * normalized caption: hashing byte SPANS of the normalized string is
    * bit-identical to xxhash64 of the materialized shingle strings (tokens
    * are single-space separated after normalization), but allocates no
    * token/shingle strings — the HOF-chain formulation
    * (split→filter→transform(slice+concat_ws)→xxhash64→array_distinct)
    * allocated ~50 short-lived objects per row and showed up as a 447
    * GC-second stage at 500k rows. `ShingleSpec`-style bit-parity with the
    * Scala twin is asserted in SigSpec. */
  def shingleHashesCol(caption: Column, k: Int): Column =
    GraftBridge.column(
      NormShingleHashes(GraftBridge.expression(normalizeCol(caption)), k))

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

/**
 * Fused shingle hasher: normalized caption string → distinct xxhash64 values
 * of its word k-shingles, hashing byte spans of the input directly (tokens
 * are single-space separated after normalization, so the span bytes ARE the
 * concat_ws(" ") shingle bytes — bit-identical results, zero intermediate
 * strings/arrays). First-occurrence order, matching Scala `.distinct`.
 */
case class NormShingleHashes(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset

    // token start offsets (input is trimmed, single-space separated)
    var m = 1
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) m += 1
      i += 1
    }
    val starts = new Array[Int](m)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) {
        starts(t) = i + 1
        t += 1
      }
      i += 1
    }

    val count = if (m < k) 1 else m - k + 1
    val out = new Array[Long](count)
    var w = 0
    var sh = 0
    while (sh < count) {
      val spanStart = if (m < k) 0 else starts(sh)
      val spanEnd = if (m < k || sh + k >= m) n else starts(sh + k) - 1
      val h = XXH64.hashUnsafeBytes(base, off + spanStart, spanEnd - spanStart, 42L)
      // distinct, first occurrence wins; shingle counts are small (<=~50)
      var dup = false
      var j = 0
      while (j < w && !dup) { if (out(j) == h) dup = true; j += 1 }
      if (!dup) { out(w) = h; w += 1 }
      sh += 1
    }
    new GenericArrayData(if (w == count) out else java.util.Arrays.copyOf(out, w))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): NormShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "norm_shingle_hashes"
}
