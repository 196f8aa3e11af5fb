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

  test("fused span-hash expression == hashing the HOF shingle strings") {
    // Third witness for NormShingleHashes' span-hash trick: building the
    // shingle STRINGS with the readable HOF composition and hashing them
    // with the builtin xxhash64 must give the same array (values and order).
    import spark.implicits._
    val captions = (0L until 200L).map(i => Synth.describe(42L, i)._2) ++
      Seq("", "one two", "a b c d")
    val viaStrings = captions.toDF("c")
      .select(transform(Shingle.shinglesCol(col("c"), cfg.shingleSize), s => xxhash64(s)))
      .as[Seq[Long]].collect()
    val fused = captions.toDF("c")
      .select(Shingle.shingleHashesCol(col("c"), cfg.shingleSize))
      .as[Seq[Long]].collect()
    captions.indices.foreach { i =>
      assert(viaStrings(i) == fused(i), s"caption: ${captions(i)}")
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

  test("ivf train: k unit-norm centroids, deterministic, lloyd reduces quantization error") {
    import graft.sig.Ivf
    val dim = 8
    val rnd = new scala.util.Random(7)
    def unit() = { val v = Array.fill(dim)(rnd.nextGaussian()); val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 200L).map(i => org.apache.spark.sql.Row(i, unit().toSeq))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
    val k = 4
    val c0 = Ivf.train(df, k, iters = 0)
    val c2 = Ivf.train(df, k, iters = 2)
    assert(c0.length == k && c2.length == k)
    // spherical k-means keeps centroids on the unit sphere
    c2.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
    // deterministic: same data, same seeds, same rounds → same centroids
    val c2b = Ivf.train(df, k, iters = 2)
    assert(c2.zip(c2b).forall { case (a, b) => a.sameElements(b) })
    // Lloyd rounds must not worsen the objective: mean best-cosine (the
    // spherical analog of negative quantization error) rises or holds
    def objective(cents: Array[Array[Double]]): Double = {
      val rows = df.collect().map(_.getSeq[Double](1).toArray)
      rows.map(u => cents.map(c => c.zip(u).map { case (a, b) => a * b }.sum).max).sum / rows.length
    }
    val o0 = objective(c0)
    val o2 = objective(c2)
    info(f"mean best-cosine: seeds $o0%.4f → lloyd-2 $o2%.4f")
    assert(o2 >= o0 - 1e-9, f"lloyd iterations degraded the objective: $o0%.4f -> $o2%.4f")
  }
}
