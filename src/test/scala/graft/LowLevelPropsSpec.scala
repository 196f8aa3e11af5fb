package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.pairs.{CellPairs, FilteredBandKeys}
import graft.util.LongSet

/**
 * Seeded randomized properties for the salted join's low-level primitives —
 * the hand-written iterator/probing arithmetic the pinned example-based
 * parity tests (CandidatesSpec) exercise only at fixed shapes. Deterministic
 * (fixed seed), no Spark jobs except one broadcast.
 */
class LowLevelPropsSpec extends AnyFunSuite {

  private def longArray(xs: Seq[Long]): Literal =
    Literal.create(xs.toArray, ArrayType(LongType))

  test("LongSet is exact membership over random and adversarial key shapes") {
    val rnd = new scala.util.Random(42)
    val shapes: Seq[Array[Long]] = Seq(
      Array.empty[Long],
      Array(0L),
      Array(Long.MinValue, Long.MaxValue, 0L, -1L, 1L),
      // structured keys: low 32 bits all zero (classic weak-hash pathology)
      Array.tabulate(500)(i => (i.toLong + 1) << 32),
      // sequential small ints
      Array.tabulate(1000)(_.toLong),
      // random with duplicates
      Array.fill(2000)(rnd.nextLong() % 512),
      Array.fill(1500)(rnd.nextLong())
    )
    shapes.foreach { values =>
      val set = LongSet(values)
      val ref = values.toSet
      values.foreach(v => assert(set.contains(v), s"false negative for $v"))
      (1 to 2000).foreach { _ =>
        val probe = if (rnd.nextBoolean() && values.nonEmpty)
          values(rnd.nextInt(values.length)) + rnd.nextInt(3) - 1
        else rnd.nextLong()
        assert(set.contains(probe) == ref.contains(probe),
          s"membership mismatch for probe $probe (n=${values.length})")
      }
      assert(set.size == ref.size)
    }
  }

  private def emitted(ls: Seq[Long], rs: Seq[Long], self: Boolean): Seq[(Long, Long)] = {
    val gen = CellPairs(longArray(ls), longArray(rs), Literal.create(self, BooleanType))
    gen.eval(InternalRow.empty).iterator.toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  test("CellPairs self cell: each unordered pair exactly once, src <= dst") {
    val rnd = new scala.util.Random(43)
    (0 to 25).foreach { n =>
      val ls = rnd.shuffle((0 until n).map(_ => rnd.nextLong()).distinct.toList)
      val got = emitted(ls, Nil, self = true)
      val want = ls.combinations(2).map(p => (p.min, p.max)).toSeq
      assert(got.size == ls.size * (ls.size - 1) / 2, s"pair count at n=${ls.size}")
      got.foreach { case (a, b) => assert(a <= b, "orientation") }
      assert(got.groupBy(identity).forall(_._2.size == 1), "no duplicate pairs")
      assert(got.toSet == want.toSet, s"pair set at n=${ls.size}")
    }
  }

  test("CellPairs cross cell: full ls x rs product, oriented per pair") {
    val rnd = new scala.util.Random(44)
    for (nl <- Seq(0, 1, 3, 9); nr <- Seq(0, 1, 4, 7)) {
      val ls = (0 until nl).map(_ => rnd.nextLong())
      val rs = (0 until nr).map(_ => rnd.nextLong())
      val got = emitted(ls, rs, self = false)
      val want = for (a <- ls; b <- rs) yield (a min b, a max b)
      assert(got.size == nl * nr, s"count at $nl x $nr")
      got.foreach { case (a, b) => assert(a <= b, "orientation") }
      // multiset equality (the cross product CAN repeat a pair if ls and rs
      // share values across cells; compare sorted sequences)
      assert(got.sorted == want.sorted, s"pair multiset at $nl x $nr")
    }
  }

  test("FilteredBandKeys emits exactly the keys whose mix is in the set") {
    val spark = SparkTestSession.spark
    val rnd = new scala.util.Random(45)
    (1 to 10).foreach { _ =>
      val bands = 1 + rnd.nextInt(70)
      val keys = (0 until bands).map(_ => rnd.nextLong())
      // survivors: a random subset of this row's (band, key) mixes, plus
      // noise mixes from keys not present at that band
      val chosen = keys.zipWithIndex.filter(_ => rnd.nextBoolean())
      val noise = (0 until 20).map(_ =>
        FilteredBandKeys.mix(rnd.nextInt(bands), rnd.nextLong()))
      val mixes = chosen.map { case (k, b) => FilteredBandKeys.mix(b, k) } ++ noise
      val bset = spark.sparkContext.broadcast(LongSet(mixes.toArray))
      val gen = FilteredBandKeys(longArray(keys), bset)
      val got = gen.eval(InternalRow.empty).iterator.toSeq
        .map(r => (r.getInt(0), r.getLong(1)))
      val want = keys.zipWithIndex.collect {
        case (k, b) if bset.value.contains(FilteredBandKeys.mix(b, k)) => (b, k)
      }
      assert(got == want, s"filtered rows at bands=$bands")
      // contract direction that matters for correctness: no false negatives
      chosen.foreach { case (k, b) =>
        assert(got.contains((b, k)), s"false negative at band $b")
      }
      bset.destroy()
    }
    // empty key array emits nothing
    val empty = FilteredBandKeys(longArray(Nil),
      spark.sparkContext.broadcast(LongSet(Array(1L, 2L))))
    assert(empty.eval(InternalRow.empty).iterator.isEmpty)
  }
}
