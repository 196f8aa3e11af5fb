package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.DedupConfig
import graft.gen.Synth
import graft.sig.{MinHash, Shingle, SimHash}
import graft.util.Hashing

/** Column-side and Scala-side signature primitives must agree bit-for-bit —
  * that equality is what makes the oracle-parity gate meaningful. */
class SigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val cfg = DedupConfig.default

  test("xxh64 scala matches builtin xxhash64 column") {
    import spark.implicits._
    val captions = (0L until 50L).map(i => Synth.describe(42L, i)._2)
    val got = captions.toDF("c").select(xxhash64(col("c"))).as[Long].collect()
    val want = captions.map(c => Hashing.xxh64(c))
    assert(got.toSeq == want.toSeq)
  }

  test("shingle hashes: column form == scala form on corpus captions") {
    import spark.implicits._
    val captions = (0L until 200L).map(i => Synth.describe(42L, i)._2)
    val got = captions.toDF("c")
      .select(Shingle.shingleHashesCol(col("c"), cfg.shingleSize))
      .as[Seq[Long]].collect()
    captions.zip(got).foreach { case (c, g) =>
      assert(g == Shingle.shingleHashes(c, cfg.shingleSize).toSeq, s"caption: $c")
    }
  }

  test("shingles handle short and empty captions") {
    assert(Shingle.shingles("", 3).isEmpty)
    assert(Shingle.shingles("one two", 3).toSeq == Seq("one two"))
    assert(Shingle.shingles("a b c d", 3).toSeq == Seq("a b c", "b c d"))
  }

  test("minhash expression == scala signature") {
    import spark.implicits._
    val captions = (0L until 100L).map(i => Synth.describe(42L, i)._2)
    val cs = MinHash.coeffs(cfg.numHashes, cfg.hashSeed)
    val got = captions.toDF("c")
      .select(MinHash.signatureCol(
        Shingle.shingleHashesCol(col("c"), cfg.shingleSize), cfg.numHashes, cfg.hashSeed))
      .as[Seq[Long]].collect()
    captions.zip(got).foreach { case (c, g) =>
      val want = MinHash.signature(Shingle.shingleHashes(c, cfg.shingleSize), cs)
      assert(g == want.toSeq)
    }
  }

  test("band keys expression == scala band keys") {
    import spark.implicits._
    val captions = (0L until 100L).map(i => Synth.describe(42L, i)._2)
    val cs = MinHash.coeffs(cfg.numHashes, cfg.hashSeed)
    val got = captions.toDF("c")
      .select(MinHash.bandKeysCol(
        MinHash.signatureCol(Shingle.shingleHashesCol(col("c"), cfg.shingleSize),
          cfg.numHashes, cfg.hashSeed),
        cfg.bands, cfg.hashSeed))
      .as[Seq[Long]].collect()
    captions.zip(got).foreach { case (c, g) =>
      val sig = MinHash.signature(Shingle.shingleHashes(c, cfg.shingleSize), cs)
      assert(g == MinHash.bandKeys(sig, cfg.bands, cfg.hashSeed).toSeq)
    }
  }

  test("minhash estimates Jaccard within tolerance") {
    val cs = MinHash.coeffs(cfg.numHashes, cfg.hashSeed)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val base = Array.fill(40)(rnd.nextLong())
      val keep = rnd.nextInt(30) + 5
      val other = base.take(keep) ++ Array.fill(40 - keep)(rnd.nextLong())
      val exact = Shingle.jaccard(base, other)
      val est = MinHash.estimate(MinHash.signature(base, cs), MinHash.signature(other, cs))
      assert(math.abs(exact - est) < 0.2, s"exact=$exact est=$est")
    }
  }

  test("s-curve: config catches flag-threshold pairs with p >= 0.99") {
    assert(cfg.candidateProbability(cfg.flagThreshold) >= 0.99)
    assert(cfg.candidateProbability(cfg.blockThreshold) >= 0.999)
    assert(cfg.candidateProbability(0.3) <= 0.5)
  }

  test("simhash pigeonhole: combo keys guarantee hamming <= bands-agree collision") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 500) {
      val a = rnd.nextLong()
      var b = a
      val flips = rnd.nextInt(cfg.phashBands - cfg.phashAgree + 1) // 0..bands-agree bit flips
      (0 until flips).foreach(_ => b ^= (1L << rnd.nextInt(64)))
      val ka = SimHash.comboKeys(a, cfg.phashBands, cfg.phashAgree).toSet
      val kb = SimHash.comboKeys(b, cfg.phashBands, cfg.phashAgree).toSet
      assert(ka.intersect(kb).nonEmpty,
        s"hamming=${SimHash.hamming(a, b)} must share a combo key")
    }
  }

  test("simhash combo keys: column == scala") {
    import spark.implicits._
    val phashes = Seq(0L, -1L, 123456789123L, Long.MinValue, 0x5a5a5a5a5a5a5a5aL)
    val got = phashes.toDF("p")
      .select(SimHash.comboKeysCol(col("p"), cfg.phashBands, cfg.phashAgree)).as[Seq[Long]].collect()
    phashes.zip(got).foreach { case (p, g) =>
      assert(g == SimHash.comboKeys(p, cfg.phashBands, cfg.phashAgree).toSeq)
    }
  }

  test("native combo-keys expression == builtin column form == scala") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val phashes = Seq(0L, -1L, 123456789123L, Long.MinValue,
      0x5a5a5a5a5a5a5a5aL) ++ Seq.fill(50)(rnd.nextLong())
    val df = phashes.toDF("p")
    val native = df.select(
      SimHash.comboKeysNativeCol(col("p"), cfg.phashBands, cfg.phashAgree))
      .as[Seq[Long]].collect()
    val builtin = df.select(
      SimHash.comboKeysCol(col("p"), cfg.phashBands, cfg.phashAgree))
      .as[Seq[Long]].collect()
    phashes.indices.foreach { i =>
      assert(native(i) == builtin(i), s"phash=${phashes(i)}")
      assert(native(i) == SimHash.comboKeys(phashes(i), cfg.phashBands, cfg.phashAgree).toSeq)
    }
  }

  test("hamming column == scala hamming") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (-1L, 0L), (0x0fL, 0x1fL), (123456789L, 987654321L))
    val got = pairs.toDF("a", "b")
      .select(SimHash.hammingCol(col("a"), col("b"))).as[Int].collect()
    assert(got.toSeq == pairs.map { case (a, b) => SimHash.hamming(a, b) })
  }
}
