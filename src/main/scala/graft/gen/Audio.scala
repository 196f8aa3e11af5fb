package graft.gen

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.Hashing

/** One opaque audio blob + typed metadata — the same multimodal-column
  * contract as `ImageRow`/`VideoRow`: the engine never interprets `bytes`
  * outside the decode step. */
final case class AudioRow(
    audio_id: String,
    bytes: Array[Byte],
    sample_rate: Int,
    n_samples: Int
)

/**
 * Deterministic synthetic audio corpus + a REAL codec boundary.
 *
 * Unlike the video container (where the mp4 demux is a documented stub,
 * `Videos.scala`), nothing here is stubbed: the blobs are genuine RIFF/WAVE
 * PCM-16 files (`packWav`), and `unpackWav` is a real chunk-walking WAV
 * parser — any external tool can play these bytes, and any externally
 * produced 16-bit mono WAV decodes through the same path. WAV-PCM is the
 * one mainstream audio codec that needs no native library, which makes it
 * the honest choice for exercising the full decode path in this container.
 *
 * Clips are sums of sinusoids under a two-modulator amplitude envelope,
 * a pure function of (seed, index) — same embarrassingly-parallel generator
 * shape as `Synth.corpus`/`Videos.corpus`. The envelope is what makes the
 * energy-delta fingerprint informative: modulator frequencies are drawn
 * CONTINUOUSLY (not from a small set), so two independent clips match in
 * envelope shape with negligible probability, while a re-recorded clip
 * (position `i % 10 == 1`: same parameters, 0.92 gain, -30 dB noise — the
 * "same track, different encode chain" analog) keeps almost every
 * energy-delta sign.
 *
 * The fingerprint itself is the classic sign-of-adjacent-band-energy-delta
 * scheme (Haitsma–Kalker, "A Highly Robust Audio Fingerprinting System",
 * ISMIR 2002 — public literature), reduced to its time-axis form: 65
 * equal windows → 64 bits, bit i = [E(i+1) > E(i)]. Two properties the
 * spec pins make it fit the existing machinery: it is EXACTLY invariant
 * to gain (all energies scale together, no sign flips), and it is a
 * 64-bit code — so SimHash's combo-key banding, the salted grid join and
 * the Hamming verify apply to audio unchanged.
 */
object Audio {

  val SampleRate = 8000
  val ClipSamples = 8192 // ~1.02 s
  val FpWindows = 65 // 64 delta bits

  // ---- RIFF/WAVE PCM-16 mono codec (real, both directions) ----

  /** Standard 44-byte RIFF/WAVE header + little-endian PCM-16 samples. */
  def packWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Chunk-walking WAV parser: validates RIFF/WAVE, locates `fmt ` and
    * `data` wherever they sit (real WAVs interleave LIST/fact chunks),
    * accepts PCM-16 mono. Returns (sampleRate, samples). */
  def unpackWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt() // riff size
    require(tag() == "WAVE", "not a WAVE file")
    var rate = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8 && (rate < 0 || data == null)) {
      val id = tag()
      val len = buf.getInt()
      id match {
        case "fmt " =>
          val fmt = buf.getShort(); val ch = buf.getShort()
          require(fmt == 1 && ch == 1, s"unsupported wav: fmt=$fmt ch=$ch")
          rate = buf.getInt()
          buf.getInt(); buf.getShort()
          require(buf.getShort() == 16, "expected 16-bit PCM")
          buf.position(buf.position() + (len - 16))
        case "data" =>
          data = Array.fill(len / 2)(buf.getShort())
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(rate > 0 && data != null, "missing fmt/data chunk")
    (rate, data)
  }

  // ---- features over decoded samples (normalized to [-1, 1]) ----

  def rms(samples: Array[Short]): Double = {
    var acc = 0.0
    var i = 0
    while (i < samples.length) {
      val x = samples(i) / 32768.0; acc += x * x; i += 1
    }
    math.sqrt(acc / math.max(1, samples.length))
  }

  /** Sign changes per second — for a pure f Hz tone this is ~2f. */
  def zcrPerSec(samples: Array[Short], sampleRate: Int): Double = {
    var n = 0
    var i = 1
    while (i < samples.length) {
      if ((samples(i) >= 0) != (samples(i - 1) >= 0)) n += 1
      i += 1
    }
    n.toDouble * sampleRate / math.max(1, samples.length)
  }

  /** 64-bit Haitsma–Kalker-style fingerprint: bit i = [E(i+1) > E(i)] over
    * `FpWindows` equal windows. Gain-invariant by construction. */
  def fingerprint(samples: Array[Short]): Long = {
    val win = math.max(1, samples.length / FpWindows)
    val e = new Array[Double](FpWindows)
    var w = 0
    while (w < FpWindows) {
      var acc = 0.0
      var i = w * win
      val end = math.min(samples.length, i + win)
      while (i < end) { val x = samples(i) / 32768.0; acc += x * x; i += 1 }
      e(w) = acc
      w += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (e(b + 1) > e(b)) fp |= (1L << b)
      b += 1
    }
    fp
  }

  // ---- deterministic clip synthesis ----

  private def unit(r: Long): Double = (r >>> 11) * (1.0 / (1L << 53))

  private def rng(seed: Long, parts: Long*): Long = {
    var s = Hashing.splitmix64(seed ^ 0xa0d10c11b5L)
    parts.foreach(p => s = Hashing.splitmix64(s ^ Hashing.splitmix64(p)))
    s
  }

  /** Clip i. Position `i % 10 == 1` is a planted near-dup of clip i-1:
    * identical synthesis parameters, 0.92 gain, -30 dB deterministic noise
    * — gain cannot flip energy-delta signs and the noise rarely does, so
    * the planted pair sits at small fingerprint Hamming distance while
    * independent clips (continuous modulator frequencies) sit near 32. */
  def makeClip(seed: Long, i: Long): AudioRow = {
    val dup = i % 10 == 1 && i > 0
    val base = if (dup) i - 1 else i
    val f0 = 200.0 + unit(rng(seed, base, 0)) * 1800.0
    val ph0 = unit(rng(seed, base, 1)) * 2 * math.Pi
    val a2 = 0.2 + unit(rng(seed, base, 2)) * 0.4 // 2nd harmonic
    val fm1 = 1.5 + unit(rng(seed, base, 3)) * 6.5 // Hz, continuous
    val fm2 = 0.7 + unit(rng(seed, base, 4)) * 2.0
    val pm1 = unit(rng(seed, base, 5)) * 2 * math.Pi
    val pm2 = unit(rng(seed, base, 6)) * 2 * math.Pi
    val d1 = 0.25 + unit(rng(seed, base, 7)) * 0.25
    val d2 = 0.15 + unit(rng(seed, base, 8)) * 0.15
    val gain = if (dup) 0.92 else 1.0
    val noise = if (dup) 0.018 else 0.0 // ~ -30 dB vs the carrier
    // Per-window "texture" (frame-scale spectral flux): smooth sinusoid
    // envelopes alone give RUN-structured energy-delta signs (blocks of
    // 1s/0s), whose pairwise Hamming has huge variance — independent clips
    // collided below the dup threshold in testing. Real audio varies at
    // frame scale; this iid per-window amplitude term reproduces that, so
    // independent fingerprints land at Hamming ~32 ± 4 while planted dups
    // (same `base`, hence same texture) stay near 0.
    val win = ClipSamples / FpWindows
    val tex = Array.tabulate(FpWindows)(w =>
      1.0 + 0.35 * (unit(rng(seed, base, 300L + w)) * 2 - 1))
    val out = new Array[Short](ClipSamples)
    var t = 0
    while (t < ClipSamples) {
      val ts = t.toDouble / SampleRate
      val env = tex(math.min(FpWindows - 1, t / win)) *
        (1.0 + d1 * math.sin(2 * math.Pi * fm1 * ts + pm1) +
          d2 * math.sin(2 * math.Pi * fm2 * ts + pm2))
      var x = env * (math.sin(2 * math.Pi * f0 * ts + ph0) +
        a2 * math.sin(2 * math.Pi * 2 * f0 * ts + ph0 * 1.7))
      if (noise > 0)
        x += noise * (unit(rng(seed, i, 100L + t)) * 2 - 1)
      // hard limiter at -0.2 dBFS: aligned sinusoid+texture peaks would
      // otherwise wrap the Short (which no real encode chain does)
      val y = math.max(-0.98, math.min(0.98, gain * 0.3 * x))
      out(t) = (y * 32767.0).toShort
      t += 1
    }
    AudioRow(f"aud-$i%08d", packWav(out, SampleRate), SampleRate, ClipSamples)
  }

  /** Same generator shape as `Synth.corpus`: pure function of (seed, index),
    * no driver-side materialization. */
  def corpus(spark: SparkSession, n: Long, seed: Long = Synth.DefaultSeed): Dataset[AudioRow] = {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).mapPartitions(_.map(i => makeClip(seed, i)))
  }
}
