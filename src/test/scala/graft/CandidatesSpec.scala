package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pairs.Candidates

class CandidatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted self-join produces exactly the naive pair set (incl. hot buckets)") {
    import spark.implicits._
    // 3 buckets: tiny (3), exactly-cap-sized, and hot (10x cap)
    val cap = 8
    val rows =
      (0 until 3).map(i => (f"a$i%03d", 0, 100L)) ++
        (0 until cap).map(i => (f"b$i%03d", 0, 200L)) ++
        (0 until cap * 10).map(i => (f"c$i%03d", 1, 300L))
    val banded = rows.toDF("id", "band", "bkey")

    val naive = banded.as("l").join(banded.as("r"),
        $"l.band" === $"r.band" && $"l.bkey" === $"r.bkey" && $"l.id" < $"r.id")
      .select($"l.id".as("src"), $"r.id".as("dst"))
      .as[(String, String)].collect().toSet

    val salted = Candidates.saltedSelfJoin(banded, cap)
      .as[(String, String)].collect()

    assert(salted.length == salted.toSet.size, "no duplicate pairs")
    assert(salted.toSet == naive)
    // sanity: the hot bucket alone contributes C(80,2) pairs
    assert(naive.size == 3 + 28 + (80 * 79) / 2)
  }

  test("sketch salted self-join == naive pair set on all three tiers") {
    import spark.implicits._
    // multi-band sketches with a planted hot key in band 2: all three gate
    // tiers — (a) LongSet filter + row-broadcast m-attach, (b) LongSet
    // filter + shuffle m-attach (key set past the row-broadcast cap but
    // under the filter cap), (c) full shuffle (past both) — must reproduce
    // the naive exploded self-join's pair SET (pairs may repeat across
    // bands; the verifier dedups downstream)
    val cap = 8
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (f"s$i%03d", (0 until 5).map(b =>
        rnd.nextInt(if (b == 2) 3 else 40).toLong))
    }
    val sketch = rows.toDF("id", "bks")
    val banded = sketch.select(col("id"),
      posexplode(col("bks")).as(Seq("band", "bkey")))
    val naive = banded.as("l").join(banded.as("r"),
        $"l.band" === $"r.band" && $"l.bkey" === $"r.bkey" && $"l.id" < $"r.id")
      .select($"l.id".as("src"), $"r.id".as("dst"))
      .as[(String, String)].collect().toSet
    assert(naive.size > 1000, "hot band must generate real pair volume")

    val bcast = Candidates.saltedSelfJoinSketch(sketch, cap)
      .as[(String, String)].collect().toSet
    val filterShuffleM = Candidates.saltedSelfJoinSketch(sketch, cap,
        broadcastKeyCap = 0)
      .as[(String, String)].collect().toSet
    val shuffle = Candidates.saltedSelfJoinSketch(sketch, cap,
        broadcastKeyCap = 0, filterKeyCap = 0)
      .as[(String, String)].collect().toSet
    assert(bcast == naive)
    assert(filterShuffleM == naive)
    assert(shuffle == naive)
  }

  test("LongSet contains exactly its members") {
    val rnd = new scala.util.Random(1)
    val vals = Array.fill(5000)(rnd.nextLong())
    val s = graft.util.LongSet(vals)
    vals.foreach(v => assert(s.contains(v)))
    val members = vals.toSet
    (0 until 5000).foreach { _ =>
      val x = rnd.nextLong()
      assert(s.contains(x) == members.contains(x))
    }
    assert(!graft.util.LongSet(Array.empty[Long]).contains(0L))
  }

  test("salted self-join is stable under partitioning") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (f"x$i%03d", i % 3, (i % 5).toLong))
    val a = Candidates.saltedSelfJoin(rows.toDF("id", "band", "bkey").repartition(2), 4)
      .as[(String, String)].collect().toSet
    val b = Candidates.saltedSelfJoin(rows.toDF("id", "band", "bkey").repartition(7), 4)
      .as[(String, String)].collect().toSet
    assert(a == b)
  }
}
