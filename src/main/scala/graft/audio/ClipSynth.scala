package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the driver-mandated input table
  * (BASELINE.json input_hint: clip_id string, bytes binary, sr_hz int32,
  * dur_ms int32, codec string, transcript string) with planted
  * near-duplicate ground truth (FIXTURES.md §B): a seeded ~20% of base rows
  * get exactly ONE partner derived by (a) exact copy, (b) single-char typo,
  * (c) last-token drop — so ~10% of all rows are planted partners.
  * Duplicate partners share the clean base signal
  * (same base index) with independent noise, so decoded-PCM SNR within a
  * pair stays >= ~37 dB — above the 30 dB invariant.
  *
  * Everything is a pure function of (row index, seed): the table is
  * identical across partitionings, resumes and cluster sizes. Audio bytes
  * can't be built from Catalyst built-ins, so this is a typed Dataset map
  * over `spark.range` (the sanctioned imperative case, SURVEY §2.5).
  */
object ClipSynth {

  /** 5600 deterministic pseudo-words of 5-9 random lowercase letters.
    * A realistic-scale vocabulary matters: with a few dozen long words
    * (e.g. the US-state list) every pair of random transcripts shares
    * whole words and 3-gram Jaccard sits at 0.3-0.5 corpus-wide — the
    * candidate set grows quadratically with corpus size and the benchmark
    * measures pathological all-pairs similarity instead of dedup. Random
    * letter words keep cross-transcript Jaccard near zero except for the
    * PLANTED duplicates.
    */
  private val vocab: IndexedSeq[String] = IndexedSeq.tabulate(5600) { i =>
    val r = new java.util.Random(0xC11B5L ^ (i.toLong * 2654435761L))
    val len = 5 + r.nextInt(5)
    val sb = new java.lang.StringBuilder(len)
    var j = 0
    while (j < len) { sb.append(('a' + r.nextInt(26)).toChar); j += 1 }
    sb.toString
  }

  final case class Clip(
      clip_id: String,
      bytes: Array[Byte],
      sr_hz: Int,
      dur_ms: Int,
      codec: String,
      transcript: String,
      base_idx: Long, // which base row this clip derives from (ground truth)
      dup_kind: String // "base" | "exact" | "typo" | "drop"
  )

  /** Transcript of base row b — a 6-10 word phrase drawn from the 5600
    * pseudo-word [[vocab]]. Vocabulary scale matters (see the vocab doc):
    * a small shared word list would concentrate cross-transcript 3-gram
    * Jaccard around 0.4-0.5, which no LSH threshold can separate from real
    * near-duplicates. Real transcript corpora have Zipfian vocabularies in
    * the 10^4+ range.
    */
  def baseTranscript(b: Long, seed: Long): String = {
    val rng = new java.util.Random(seed * 7919L + b)
    val k = 6 + rng.nextInt(5)
    Seq.fill(k)(vocab(rng.nextInt(vocab.size))).mkString(" ")
  }

  /** Deterministic row plan: row i of the synthesized table. Rows 2b/2b+1
    * pair up: the even row is base b; the odd row is either a planted
    * partner of base b (seeded ~20% of bases) or an independent base.
    */
  def clipAt(i: Long, seed: Long, includeAudio: Boolean = true): Clip = {
    val b = i / 2
    val isPartnerSlot = (i % 2) == 1
    val rng = new java.util.Random(seed * 104729L + b)
    val planted = rng.nextDouble() < 0.2
    val kindRoll = rng.nextInt(3)

    val (baseIdx, kind, transcript) =
      if (!isPartnerSlot) (b * 2, "base", baseTranscript(b * 2, seed))
      else if (!planted) (i, "base", baseTranscript(i, seed))
      else {
        val t = baseTranscript(b * 2, seed)
        kindRoll match {
          case 0 => (b * 2, "exact", t)
          case 1 =>
            val pos = rng.nextInt(t.length)
            (b * 2, "typo", t.updated(pos, if (t(pos) == 'a') 'e' else 'a'))
          case _ =>
            val dropped = t.split(' ').dropRight(1).mkString(" ")
            (b * 2, "drop", if (dropped.nonEmpty) dropped else t)
        }
      }

    val sr = if (baseIdx % 2 == 0) 8000 else 16000
    val dur = 200 + (baseIdx % 10).toInt * 100
    // duplicate partners share the clean signal of baseIdx; the noise seed
    // differs per physical row so pair PCMs differ only by independent noise
    val bytes =
      if (includeAudio)
        Wav.toWav(Wav.synthSamples(baseIdx, sr, dur, noiseSeed = seed ^ (i * 31L)), sr)
      else Array.emptyByteArray
    Clip(f"clip_$i%012d", bytes, sr, dur, Wav.CodecName, transcript, baseIdx, kind)
  }

  /** The synthesized table as a DataFrame with ground-truth columns
    * (base_idx, dup_kind); drop them to get exactly the input_hint schema.
    * `includeAudio = false` leaves `bytes` empty for transcript-only
    * benchmarks (the dedup path never reads audio; on real Iceberg input
    * Catalyst prunes the bytes column at the scan, which synthesis-in-map
    * cannot emulate — so opt out explicitly instead).
    */
  def table(spark: SparkSession, n: Long, seed: Long = 42L, includeAudio: Boolean = true): DataFrame = {
    import spark.implicits._
    spark
      .range(n)
      .mapPartitions(_.map(i => clipAt(i, seed, includeAudio)))
      .toDF()
  }

  /** Planted duplicate pairs (a_idx < b_idx) implied by the row plan. */
  def plantedPairs(n: Long, seed: Long = 42L): Seq[(Long, Long)] =
    // even slots are always dup_kind="base" (clipAt), so only odd partner
    // slots can emit a pair — iterating them alone halves the driver-side
    // transcript synthesis with identical output
    (1L until n by 2).flatMap { i =>
      val c = clipAt(i, seed, includeAudio = false) // pair plan needs no WAV bytes
      if (c.dup_kind != "base" && c.base_idx != i) Some((c.base_idx, i)) else None
    }
}
