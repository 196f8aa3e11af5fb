package graft.pairs

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.util.LongSet

/**
 * The salted join's tag pass, pushed below the explode: emits (band, bkey)
 * rows for exactly the band keys whose mixed (band, bkey) value is in the
 * broadcast non-singleton set.
 *
 * Why a custom Generator: the tag pass only exists to find which of a row's
 * band keys landed in a shared bucket, and under selective keys that is
 * ~0.2% of them — but `posexplode` + broadcast-join materializes EVERY key
 * as a row first (measured 64M rows / ~14s per pass for 0.92M distinct
 * phashes x 70 combo keys at 8 cores, twice the whole join's remaining
 * cost). Filtering INSIDE the generator means the 99.8% singleton keys
 * never become rows at all; per input row the cost is one child eval plus
 * ~70 open-addressing probes.
 *
 * Mix collisions are correctness-safe by construction: a colliding
 * singleton key passes the filter spuriously, joins the non-singleton size
 * table on the REAL (band, bkey) columns right after, and is dropped
 * there; a genuinely non-singleton key always has its exact mixed value in
 * the set, so there are no false negatives. Parity with the explode+join
 * pass is pinned in CandidatesSpec.
 */
case class FilteredBandKeys(keys: Expression, bset: Broadcast[LongSet])
    extends Expression
    with Generator
    with CodegenFallback {

  override def children: Seq[Expression] = Seq(keys)

  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = keys.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Iterator.empty
    val set = bset.value
    val n = arr.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var band = 0
    while (band < n) {
      val key = arr.getLong(band)
      if (set.contains(FilteredBandKeys.mix(band, key)))
        out += InternalRow(band, key)
      band += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FilteredBandKeys =
    copy(keys = newChildren(0))

  override def prettyName: String = "filtered_band_keys"
}

object FilteredBandKeys {
  /** Deterministic (band, bkey) -> long mix, shared by the driver-side set
    * build and the executor-side probe. Not injective — collisions are
    * false POSITIVES only (see class doc). */
  def mix(band: Int, key: Long): Long =
    java.lang.Long.rotateLeft(key, band & 63) ^ (band.toLong * 0x9E3779B97F4A7C15L)

  def col(keys: Column, bset: Broadcast[LongSet]): Column =
    GraftBridge.column(FilteredBandKeys(GraftBridge.expression(keys), bset))
}
