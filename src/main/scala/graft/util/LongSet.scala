package graft.util

/**
 * Minimal immutable open-addressing hash set of longs (linear probing,
 * power-of-two table, load factor <= 0.5). Built once on the driver from
 * the salted join's non-singleton key list and shipped to executors as a
 * `Broadcast`, where the band-key filter generator probes it ~70 times per
 * input row — a probe must be a couple of array reads, not a boxed
 * `java.util.HashSet` lookup or an O(log n) binary search.
 */
final class LongSet private (table: Array[Long], used: Array[Boolean])
    extends Serializable {

  private val mask = table.length - 1

  def contains(x: Long): Boolean = {
    var h = LongSet.scatter(x) & mask
    while (used(h)) {
      if (table(h) == x) return true
      h = (h + 1) & mask
    }
    false
  }

  def size: Int = used.count(identity)
}

object LongSet {

  /** murmur3 fmix64: full-avalanche scatter so linear probing stays O(1)
    * even on structured keys (the mixed band/bkey values are not random). */
  private def scatter(x0: Long): Int = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x.toInt
  }

  def apply(values: Array[Long]): LongSet = {
    var cap = 16
    while (cap < values.length * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var i = 0
    while (i < values.length) {
      val x = values(i)
      var h = scatter(x) & mask
      while (used(h) && table(h) != x) h = (h + 1) & mask
      table(h) = x
      used(h) = true
      i += 1
    }
    new LongSet(table, used)
  }
}
