package graft.audio

/** Minimal PCM16/WAV codec + SNR math, pure JVM (the sandbox has no audio
  * libs; the input table's `codec` is fixed to "pcm_s16le", FIXTURES.md §B,
  * so a RIFF/WAVE parser is the entire real decode path — nothing stubbed).
  *
  * Synthesis is deterministic: clip i = sine(440*(1 + i mod 7) Hz) + seeded
  * uniform noise at ~40 dB SNR, so the per-row invariant (decoded PCM
  * allclose at SNR >= 30 dB vs the clean signal, BASELINE.json input_hint)
  * holds by construction and any corruption in the byte path breaks it.
  */
object Wav {

  val CodecName = "pcm_s16le"
  private val Amp = 0.8 * Short.MaxValue
  private val DoubleUnit = 1.0 / (1L << 53) // exactly java.util.Random.DOUBLE_UNIT

  /** Noise amplitude for a target SNR vs a sine of amplitude Amp:
    * sig_rms = Amp/sqrt(2); uniform(+-a) rms = a/sqrt(3);
    * a = sig_rms * sqrt(3) / 10^(snrDb/20).
    */
  private def noiseAmp(snrDb: Double): Double =
    (Amp / math.sqrt(2.0)) * math.sqrt(3.0) / math.pow(10.0, snrDb / 20.0)

  /** Clean sine for clip index i (no noise) — the invariant's reference. */
  def cleanSignal(i: Long, srHz: Int, durMs: Int): Array[Double] = {
    val n = (srHz.toLong * durMs / 1000).toInt
    val freq = 440.0 * (1 + (i % 7))
    Array.tabulate(n)(t => Amp * math.sin(2.0 * math.Pi * freq * t / srHz))
  }

  /** [[cleanSignal]] through a per-JVM cache: the signal depends on i only
    * via i % 7, so at most 7 x |sample rates| x |durations| distinct arrays
    * exist (~140 / ~6 MB for the bench table). math.sin was the dominant
    * CPU of both synthesis and the SNR check (~2 evaluations per sample per
    * row); the cache leaves one table build + one check at ~1/50th the
    * trig. Entries are READ-ONLY by contract. Values bit-identical to the
    * uncached form (same tabulate expression).
    */
  private val cleanCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  def cleanSignalCached(i: Long, srHz: Int, durMs: Int): Array[Double] =
    cleanCache.computeIfAbsent(
      ((i % 7).toInt, srHz, durMs),
      _ => cleanSignal(i, srHz, durMs))

  /** Synthesize clip i's samples: clean sine + seeded noise at `snrDb`.
    * One pass, no intermediate clean array (same per-sample expression as
    * [[cleanSignal]], so values are bit-identical to the two-pass form —
    * the synthesis runs once per row of every bench table and its
    * allocation rate was a measured GC driver).
    *
    * The noise stream replicates java.util.Random's LCG exactly (same seed
    * scramble, same 48-bit step, same two-word nextDouble) in two plain
    * local longs: Random.next() round-trips an AtomicLong CAS per 32-bit
    * word — two CAS per sample on the hottest per-sample loop of the
    * flagship's audio phase — purely to support a thread-safety contract
    * this single-threaded-per-row generator never uses. Values are
    * bit-identical to `new java.util.Random(noiseSeed).nextDouble()`
    * (pinned by WavSpec).
    */
  def synthSamples(i: Long, srHz: Int, durMs: Int, noiseSeed: Long, snrDb: Double = 40.0): Array[Short] = {
    val clean = cleanSignalCached(i, srHz, durMs)
    val n = clean.length
    var s = (noiseSeed ^ 0x5DEECE66DL) & ((1L << 48) - 1) // Random's seed scramble
    val na = noiseAmp(snrDb)
    val out = new Array[Short](n)
    var t = 0
    while (t < n) {
      s = (s * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
      val hi = (s >>> 22).toInt // next(26)
      s = (s * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
      val lo = (s >>> 21).toInt // next(27)
      val d = ((hi.toLong << 27) + lo) * DoubleUnit // Random.DOUBLE_UNIT = 0x1.0p-53
      val v = clean(t) + (d * 2.0 - 1.0) * na
      out(t) = math.max(Short.MinValue.toDouble, math.min(Short.MaxValue.toDouble, math.rint(v))).toShort
      t += 1
    }
    out
  }

  /** RIFF/WAVE container around mono pcm_s16le samples. */
  def toWav(samples: Array[Short], srHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(srHz)
    buf.putInt(srHz * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    // bulk view copy, not samples.foreach(buf.putShort): Function1 is not
    // specialized for Short, so the foreach boxed EVERY sample (billions of
    // allocations per flagship audio pass); the ShortBuffer view writes the
    // same little-endian bytes in one intrinsic copy
    buf.asShortBuffer().put(samples)
    buf.array()
  }

  /** Parse a mono pcm_s16le WAV: returns (sampleRate, samples). Walks the
    * chunk list (fmt may not be adjacent to data in the wild).
    */
  def fromWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44, "truncated WAV")
    val riff = new Array[Byte](4); buf.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not RIFF")
    buf.getInt() // riff size
    val wave = new Array[Byte](4); buf.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not WAVE")
    var srHz = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (srHz < 0 || samples == null)) {
      val id = new Array[Byte](4); buf.get(id)
      val size = buf.getInt()
      // A corrupted header with a negative size would make `next` land at or
      // before this chunk's start and the walk would re-read the same bytes
      // forever; a huge bogus size would allocate a ~2 GiB sample array (or
      // overflow `next`) before any read hits the buffer's end. Bound the
      // size by what the buffer actually holds so corruption surfaces as a
      // decode failure (pcm_ok=false / snr_db=null upstream), not a hung
      // task or an executor OOM.
      require(size >= 0 && size <= buf.remaining(), s"corrupt WAV chunk size $size")
      // RIFF pads odd-sized chunks to 2-byte alignment: the next chunk id
      // starts at size + (size & 1), not size — skipping the pad is what
      // keeps the walk aligned on in-the-wild files with odd LIST/INFO
      // chunks before `data`
      val next = buf.position() + size + (size & 1)
      new String(id, "US-ASCII") match {
        case "fmt " =>
          val fmt = buf.getShort(); val ch = buf.getShort()
          require(fmt == 1 && ch == 1, s"unsupported wav fmt=$fmt channels=$ch")
          srHz = buf.getInt()
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          // bulk view read — same values as n sequential getShort() calls,
          // one intrinsic copy instead of a per-sample bounds-checked read;
          // the view does not advance `buf`, which the chunk walk below
          // repositions absolutely anyway
          buf.asShortBuffer().get(samples, 0, n)
        case _ => ()
      }
      if (srHz < 0 || samples == null) buf.position(math.min(next, buf.limit()))
    }
    require(srHz > 0 && samples != null, "missing fmt/data chunk")
    (srHz, samples)
  }

  /** SNR of decoded samples against the on-the-fly clean sine for clip i,
    * in dB — no intermediate arrays (the array form allocated the clean
    * signal plus a short->double copy per row, ~300 KB x corpus: the
    * invariant phase's measured GC driver). Bit-identical to
    * `snrDb(cleanSignal(i, sr, durMs), test.map(_.toDouble))`: same
    * per-index expressions, same accumulation order.
    */
  def snrDbVsClean(i: Long, srHz: Int, durMs: Int, test: Array[Short]): Double = {
    val clean = cleanSignalCached(i, srHz, durMs)
    val n = clean.length
    require(test.length == n, s"length mismatch $n vs ${test.length}")
    var sig = 0.0
    var err = 0.0
    var t = 0
    while (t < n) {
      val r = clean(t)
      sig += r * r
      val e = test(t).toDouble - r
      err += e * e
      t += 1
    }
    if (err == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / err)
  }

  /** SNR of `test` against reference signal `ref`, in dB. */
  def snrDb(ref: Array[Double], test: Array[Double]): Double = {
    require(ref.length == test.length, s"length mismatch ${ref.length} vs ${test.length}")
    var sig = 0.0
    var err = 0.0
    var k = 0
    while (k < ref.length) {
      sig += ref(k) * ref(k)
      val e = test(k) - ref(k)
      err += e * e
      k += 1
    }
    if (err == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / err)
  }
}
