package graft.tools

import graft.audio.{ClipSynth, Wav}

/** Throwaway interleaved A/B micro-benchmark for the round-6 audio kernel
  * changes (LCG noise + bulk short copies): times the per-clip audio chain
  * (synth -> toWav -> fromWav -> snr) against a local re-implementation of
  * the ROUND-5 form (java.util.Random noise, per-sample boxed foreach
  * write, per-sample getShort read) in the same JVM, alternating blocks so
  * machine-window noise hits both sides. Dev-only; not part of the suite.
  */
object AudioMicro {
  private val Amp = 0.8 * Short.MaxValue
  private def noiseAmp(snrDb: Double): Double =
    (Amp / math.sqrt(2.0)) * math.sqrt(3.0) / math.pow(10.0, snrDb / 20.0)

  // round-5 synthSamples: java.util.Random per sample
  private def synthOld(i: Long, srHz: Int, durMs: Int, noiseSeed: Long): Array[Short] = {
    val clean = Wav.cleanSignal(i, srHz, durMs)
    val n = clean.length
    val rng = new java.util.Random(noiseSeed)
    val na = noiseAmp(40.0)
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      val v = clean(t) + (rng.nextDouble() * 2.0 - 1.0) * na
      out(t) = math.max(Short.MinValue.toDouble, math.min(Short.MaxValue.toDouble, math.rint(v))).toShort
      t += 1
    }
    out
  }

  // round-5 toWav: samples.foreach(buf.putShort) — boxes every sample
  private def toWavOld(samples: Array[Short], srHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1); buf.putShort(1); buf.putInt(srHz); buf.putInt(srHz * 2)
    buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def main(args: Array[String]): Unit = {
    val clips = if (args.nonEmpty) args(0).toInt else 20000
    def chainNew(lo: Long, hi: Long): Long = {
      var acc = 0L
      var i = lo
      while (i < hi) {
        val c = ClipSynth.clipAt(i, 42L, includeAudio = true)
        val (sr, samples) = Wav.fromWav(c.bytes)
        val snr = Wav.snrDbVsClean(c.base_idx, sr, c.dur_ms, samples)
        acc += (if (snr >= 30.0) 1 else 0)
        i += 1
      }
      acc
    }
    def chainOld(lo: Long, hi: Long): Long = {
      var acc = 0L
      var i = lo
      while (i < hi) {
        // clipAt's plan without audio, then the old audio chain
        val c = ClipSynth.clipAt(i, 42L, includeAudio = false)
        val samples0 = synthOld(c.base_idx, c.sr_hz, c.dur_ms, 42L ^ (i * 31L))
        val bytes = toWavOld(samples0, c.sr_hz)
        val (sr, samples) = Wav.fromWav(bytes) // same decode (new bulk form)
        val snr = Wav.snrDbVsClean(c.base_idx, sr, c.dur_ms, samples)
        acc += (if (snr >= 30.0) 1 else 0)
        i += 1
      }
      acc
    }
    // warmup both
    chainNew(0, clips / 4); chainOld(0, clips / 4)
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime(); val a = chainOld(0, clips); val t1 = System.nanoTime()
      val b = chainNew(0, clips); val t2 = System.nanoTime()
      println(f"[audiomicro] rep$rep old=${(t1 - t0) / 1e9}%6.3f s  new=${(t2 - t1) / 1e9}%6.3f s  ratio=${(t1 - t0).toDouble / (t2 - t1)}%5.2f  ($a/$b pass)")
      rep += 1
    }
  }
}
