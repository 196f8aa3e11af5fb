package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.Audio
import graft.queries.Engine

/**
 * Audio modality: real RIFF/WAVE PCM codec, analytic feature oracles,
 * and fingerprint-banded near-dup detection through the SAME salted-join
 * machinery the image pipeline uses (the fingerprint is a 64-bit code,
 * so SimHash banding applies unchanged).
 */
class AudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def sine(freq: Double, amp: Double, n: Int = Audio.ClipSamples,
      sr: Int = Audio.SampleRate): Array[Short] =
    Array.tabulate(n)(t =>
      (amp * math.sin(2 * math.Pi * freq * t / sr) * 32767.0).toShort)

  test("wav codec: real RIFF header, lossless round-trip, chunk-walking parse") {
    val xs = sine(440.0, 0.6)
    val wav = Audio.packWav(xs, Audio.SampleRate)
    // the bytes are a genuine WAV any external tool can play
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (sr, back) = Audio.unpackWav(wav)
    assert(sr == Audio.SampleRate)
    assert(back sameElements xs)

    // parser is a real chunk walker: an interleaved unknown chunk (as real
    // encoders emit LIST/fact chunks) must be skipped, not fatal
    val withJunk = {
      val buf = java.nio.ByteBuffer
        .allocate(wav.length + 14).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(wav, 0, 36) // RIFF..fmt chunk
      buf.put("LIST".getBytes("US-ASCII")).putInt(6)
        .put("junk!?".getBytes("US-ASCII"))
      buf.put(wav, 36, wav.length - 36) // data chunk
      buf.array()
    }
    val (sr2, back2) = Audio.unpackWav(withJunk)
    assert(sr2 == sr && (back2 sameElements xs))
  }

  test("analytic oracles: RMS of a pure sine = A/sqrt(2), ZCR = 2f") {
    val xs = sine(440.0, 0.6)
    val r = Audio.rms(xs)
    assert(math.abs(r - 0.6 / math.sqrt(2)) < 0.005, s"rms=$r")
    val z = Audio.zcrPerSec(xs, Audio.SampleRate)
    assert(math.abs(z - 2 * 440.0) < 10.0, s"zcr=$z")
  }

  test("fingerprint is exactly gain-invariant and locally noise-stable") {
    val clip = Audio.makeClip(42L, 7L)
    val (_, xs) = Audio.unpackWav(clip.bytes)
    val fp = Audio.fingerprint(xs)
    // gain scaling scales every window energy together: zero sign flips
    val half = xs.map(s => (s / 2).toShort)
    assert(Audio.fingerprint(half) == fp)
    // the planted near-dup (same parameters, 0.92 gain, -30 dB noise)
    // stays inside the banding guarantee radius
    val dup = Audio.makeClip(42L, 11L) // dup of 10
    val base = Audio.makeClip(42L, 10L)
    val h = java.lang.Long.bitCount(
      Audio.fingerprint(Audio.unpackWav(dup.bytes)._2) ^
        Audio.fingerprint(Audio.unpackWav(base.bytes)._2))
    info(s"planted-pair fingerprint Hamming = $h")
    assert(h <= 4)
  }

  test("makeClip is deterministic") {
    val a = Audio.makeClip(42L, 3L)
    val b = Audio.makeClip(42L, 3L)
    assert(a.bytes sameElements b.bytes)
  }

  test("audio_features: decode through the real codec, disclosure columns") {
    import spark.implicits._
    val out = Engine.audioFeatures(spark, dir)
    assert(out.columns.contains("decoded_clips") && out.columns.contains("clip_pool"))
    val rows = out.select("audio_id", "duration_sec", "rms", "zcr_per_sec")
      .as[(String, Double, Double, Double)].collect()
    val expected = math.min(math.max(1L, Engine.synthRows(dir) / 10), 500L)
    assert(rows.length == expected)
    // every clip is ~1.02 s of audible-band audio with sane level
    assert(rows.forall { case (_, d, r, z) =>
      math.abs(d - Audio.ClipSamples.toDouble / Audio.SampleRate) < 1e-9 &&
        r > 0.05 && r < 0.9 && z > 100 && z < 8000
    })
  }

  test("audio_dup_pairs: banded fingerprint join finds exactly the planted near-dups") {
    import spark.implicits._
    val n = math.min(math.max(1L, Engine.synthRows(dir) / 10), 500L)
    val planted = (1L until n by 10).filter(_ > 0)
      .map(i => (f"aud-${i - 1}%08d", f"aud-$i%08d")).toSet
    val got = Engine.audioDupPairs(spark, dir)
      .select("a", "b").as[(String, String)].collect().toSet
    val recall = planted.count(got.contains).toDouble / planted.size
    val precision = if (got.isEmpty) 0.0 else got.count(planted.contains).toDouble / got.size
    info(s"planted=${planted.size} got=${got.size} recall=$recall precision=$precision")
    // recall: Hamming <= 4 pairs are GUARANTEED candidates by the 4-of-8
    // pigeonhole; the fingerprint test above pins the planted distance
    assert(recall >= 0.9, s"recall=$recall")
    // precision: independent clips draw continuous modulator frequencies,
    // so their energy profiles are uncorrelated (expected Hamming ~32)
    assert(precision >= 0.95, s"precision=$precision")
  }
}
