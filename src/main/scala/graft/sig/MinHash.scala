package graft.sig

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.util.Hashing

/**
 * MinHash signatures + LSH band keys.
 *
 * Replaces the reference's 384-d sentence embedding + FAISS IndexFlatIP scan
 * (`app/services/embedding_service.py:29-44`, `app/utils/vector_store.py:71-103`)
 * with a similarity sketch whose candidate generation is a plain shuffle
 * equi-join — the Spark-native shape for 10^12-row scale.
 *
 * The hash family is affine over the 2^64 ring: h_i(x) = a_i*x + b_i with
 * odd a_i, minima taken under *unsigned* comparison. All parameters derive
 * deterministically from the config seed (SplitMix64), so the pipeline, the
 * oracle, and any re-run produce bit-identical signatures.
 *
 * Exposed two ways:
 *   - pure-Scala (`signature`, `bandKeys`) for the oracle and unit tests;
 *   - custom Catalyst Expressions (`MinHashSignature`, `BandKeys`) that
 *     compute the whole signature in ONE pass over the shingle array
 *     (vs. numHashes separate higher-order `aggregate` calls).
 */
object MinHash {

  final case class Coeffs(a: Array[Long], b: Array[Long])

  /** Deterministic affine coefficients; a_i forced odd (bijective mod 2^64). */
  def coeffs(numHashes: Int, seed: Long): Coeffs = {
    val s = Hashing.seedStream(seed, 2 * numHashes)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = s(2 * i) | 1L
      b(i) = s(2 * i + 1)
      i += 1
    }
    Coeffs(a, b)
  }

  /** One pass over the element hashes, all minima at once. */
  def signature(hashes: Array[Long], c: Coeffs): Array[Long] = {
    val n = c.a.length
    val sig = Array.fill(n)(-1L) // 0xFFFF... = unsigned max
    var j = 0
    while (j < hashes.length) {
      val x = hashes(j)
      var i = 0
      while (i < n) {
        val h = c.a(i) * x + c.b(i)
        if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Band keys: xxh64-chain of the band's rows, salted with the band index. */
  def bandKeys(sig: Array[Long], bands: Int, seed: Long): Array[Long] = {
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, seed)
      var i = 0
      while (i < r) {
        h = XXH64.hashLong(sig(b * r + i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Estimated Jaccard from two signatures (fraction of equal minima). */
  def estimate(s1: Array[Long], s2: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < s1.length) { if (s1(i) == s2(i)) eq += 1; i += 1 }
    eq.toDouble / s1.length
  }

  // ---- Column API -------------------------------------------------------

  /** MinHash signature of an array<long> shingle-hash column. NULL/empty → NULL. */
  def signatureCol(shingleHashes: Column, numHashes: Int, seed: Long): Column =
    GraftBridge.column(
      MinHashSignature(GraftBridge.expression(shingleHashes), numHashes, seed))

  /** LSH band keys of a signature column. */
  def bandKeysCol(sig: Column, bands: Int, seed: Long): Column =
    GraftBridge.column(BandKeys(GraftBridge.expression(sig), bands, seed))
}

/**
 * Catalyst expression computing the MinHash signature of an array<long>
 * column in a single pass (numHashes minima simultaneously). CodegenFallback:
 * the loop body is already tight JVM code; falling out of whole-stage codegen
 * for this one projection measured cheaper than 128 `aggregate` HOF calls.
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression
    with CodegenFallback {

  private lazy val cs = MinHash.coeffs(numHashes, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val xs = arr.toLongArray()
    new GenericArrayData(MinHash.signature(xs, cs))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** Catalyst expression: LSH band keys from a signature column. */
case class BandKeys(child: Expression, bands: Int, seed: Long)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0 || arr.numElements() % bands != 0) return null
    new GenericArrayData(MinHash.bandKeys(arr.toLongArray(), bands, seed))
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)

  override def prettyName: String = "lsh_band_keys"
}
