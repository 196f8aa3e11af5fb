package graft.sig

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/**
 * Image-side near-duplicate sketching over the 64-bit perceptual hash.
 *
 * Reference analog: vector cosine over image-describing text
 * (`app/utils/vector_store.py:71-103`); north rule replaces it with
 * "perceptual SimHash over phash" — two phashes within Hamming distance r
 * are near-duplicate images.
 *
 * Candidate generation is pigeonhole banding: split the 64-bit phash into
 * `bands` equal bit-slices. Hamming distance d corrupts at most d slices, so
 * a pair at d <= bands - agree shares at least `agree` intact slices —
 * joining on every `agree`-subset of slices has PERFECT recall for
 * d <= bands - agree.
 *
 * Why agree=2 and not the naive agree=1: single 8-bit slices have only 256
 * distinct values, so at web scale every bucket contains n/256 rows and the
 * self-join degenerates to ~n²/256 candidate pairs (measured: 200k pairs for
 * 4k rows). Keys built from PAIRS of slices carry 16 bits + a combo tag →
 * C(8,2)=28 keys per row but ~2^16·28 buckets: the candidate count drops by
 * ~256× while the Hamming <= 8-2 = 6 guarantee exactly matches
 * config.maxHamming. Key encoding is exact (combo·2^2w + bits_i·2^w +
 * bits_j), no hash collisions.
 *
 * Everything is builtin-Column expressible (shiftright / bitwise and /
 * bit_count) — stays in whole-stage codegen; no UDF, no custom expression.
 */
object SimHash {

  def phashBands(phash: Long, bands: Int): Array[Long] = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    Array.tabulate(bands)(b => (phash >>> (b * width)) & mask)
  }

  /** All size-`agree` subsets of band indices, in lexicographic order. */
  def subsets(bands: Int, agree: Int): Seq[Seq[Int]] =
    (0 until bands).combinations(agree).map(_.toSeq).toSeq

  /** All C(bands,agree) `agree`-slice combo keys: perfect recall for
    * Hamming <= bands-agree, FP rate C(bands,agree)/2^(agree*width) per
    * random pair. Exact key encoding (comboIdx then slice values packed),
    * no hash collisions. Larger `agree` trades guarantee radius for
    * selectivity — at web scale the FP floor is n²·rate, so rate must
    * shrink as n grows. */
  def comboKeysCol(phash: Column, bands: Int, agree: Int = 2,
      totalBits: Int = 64): Column = {
    val width = totalBits / bands
    val slices = (0 until bands).map { b =>
      shiftright(phash, b * width).bitwiseAND(lit((1L << width) - 1L))
    }
    array(subsets(bands, agree).zipWithIndex.map { case (idxs, c) =>
      idxs.foldLeft(lit(c.toLong): Column)((acc, i) =>
        shiftleft(acc, width) + slices(i)).cast("long")
    }: _*)
  }

  def comboKeys(phash: Long, bands: Int, agree: Int = 2): Array[Long] = {
    val width = 64 / bands
    val slices = phashBands(phash, bands)
    subsets(bands, agree).zipWithIndex.map { case (idxs, c) =>
      idxs.foldLeft(c.toLong)((acc, i) => (acc << width) + slices(i))
    }.toArray
  }

  /** `comboKeys` as ONE compiled call per row. The builtin `comboKeysCol`
    * tree is the right form under whole-stage codegen (the size-agg pass),
    * but as the child of a non-codegen Generator it would be INTERPRETED
    * per row — a C(bands,agree)-element array built through depth-`agree`
    * folds costs microseconds that a direct Scala loop does in ~100ns.
    * Bit-parity with `comboKeysCol` is pinned in SigSpec. */
  def comboKeysNativeCol(phash: Column, bands: Int, agree: Int,
      totalBits: Int = 64): Column =
    GraftBridge.column(
      ComboKeysNative(GraftBridge.expression(phash), bands, agree, totalBits))

  /** Hamming distance between two 64-bit phashes. */
  def hammingCol(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Similarity in [0,1]: 1 - hamming/64. */
  def hammingSimCol(a: Column, b: Column): Column =
    lit(1.0) - hammingCol(a, b).cast("double") / lit(64.0)

  def hammingSim(a: Long, b: Long): Double = 1.0 - hamming(a, b) / 64.0

  /** Classic 64-bit SimHash of a set of element hashes: bit i is the
    * majority vote of bit i across elements (ties → 0). */
  def simhash64(hashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Column form of `simhash64` over an array<long> column. */
  def simhash64Col(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
}

/** Catalyst expression: all C(bands,agree) pigeonhole combo keys of a
  * 64-bit phash in one compiled call (see `comboKeysNativeCol`). */
case class ComboKeysNative(child: Expression, bands: Int, agree: Int,
    totalBits: Int = 64)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.ArrayType

  // per-instance, not per-row: the combination enumeration allocates
  private lazy val idxs: Array[Array[Int]] =
    SimHash.subsets(bands, agree).map(_.toArray).toArray
  private lazy val width = totalBits / bands
  private lazy val mask = if (width == 64) -1L else (1L << width) - 1L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val phash = input.asInstanceOf[Long]
    val out = new Array[Long](idxs.length)
    var c = 0
    while (c < idxs.length) {
      val combo = idxs(c)
      var acc = c.toLong
      var k = 0
      while (k < combo.length) {
        acc = (acc << width) + ((phash >>> (combo(k) * width)) & mask)
        k += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ComboKeysNative =
    copy(child = newChild)
  override def prettyName: String = "combo_keys"
}

/** Catalyst expression: 64-bit SimHash of an array<long> column
  * (single pass; CodegenFallback like MinHashSignature). */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else java.lang.Long.valueOf(SimHash.simhash64(arr.toLongArray()))
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
