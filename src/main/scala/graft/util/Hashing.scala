package graft.util

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic 64-bit hashing shared by the distributed pipeline and the
 * in-repo naive oracle. `xxh64` is bit-identical to Spark's builtin
 * `xxhash64(stringCol)` (which hashes the UTF-8 bytes with seed 42), so the
 * oracle can reproduce exactly what a Catalyst plan computes — this is what
 * makes the dup-pair-recall parity test meaningful.
 */
object Hashing {

  /** Bit-identical to Spark SQL `xxhash64(s)` for a non-null string. */
  def xxh64(s: String, seed: Long = 42L): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  /** Same mix for longs as Spark SQL `xxhash64(longCol)`. */
  def xxh64(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)

  /** SplitMix64 — standard seed-expansion generator (public domain). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic stream of seeds derived from a root seed. */
  def seedStream(root: Long, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var s = root
    var i = 0
    while (i < n) { s = splitmix64(s); out(i) = s; i += 1 }
    out
  }
}
