package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-row invariant from BASELINE.json input_hint: decoded PCM
  * allclose (SNR >= 30 dB) against the clean reference signal, and
  * transcript byte-equality against the source of truth. Run after any
  * byte-moving step (checkpoint round-trips, repartitions) to prove the
  * binary column survived intact.
  */
object Invariant {

  val MinSnrDb = 30.0

  /** clips must carry (clip_id, bytes, sr_hz, dur_ms, transcript, base_idx).
    * Returns (clip_id, snr_db, pcm_ok, transcript_ok). Decode + SNR is a
    * UDF over BinaryType (SURVEY §2.5 UDF surface (d)); the expected
    * transcript is regenerated from the deterministic row plan.
    */
  def check(clips: DataFrame, seed: Long = 42L): DataFrame = {
    // a corrupted row must SURFACE as pcm_ok=false in the report, not kill
    // the job: this checker exists to identify which rows a byte-moving
    // step damaged, so decode failures (truncated/misaligned bytes, null)
    // map to snr_db=null instead of a task failure
    val snrUdf = udf { (bytes: Array[Byte], baseIdx: Long, durMs: Int) =>
      try {
        val (sr, samples) = Wav.fromWav(bytes)
        Option(Wav.snrDbVsClean(baseIdx, sr, durMs, samples))
      } catch { case scala.util.control.NonFatal(_) => Option.empty[Double] }
    }
    val expectedTranscript = udf { (i: Long) =>
      ClipSynth.clipAt(i, seed, includeAudio = false).transcript
    }
    clips
      // try_cast, not cast: a mangled clip_id extracts '' and an ANSI cast
      // would throw — killing the very job that reports which rows broke
      .withColumn("row_idx",
        expr("try_cast(regexp_extract(clip_id, 'clip_(\\\\d+)', 1) as bigint)"))
      .withColumn("snr_db", snrUdf(col("bytes"), col("base_idx"), col("dur_ms")))
      .withColumn("pcm_ok", coalesce(col("snr_db") >= MinSnrDb, lit(false)))
      // same coalesce treatment as pcm_ok: a corrupted clip_id (row_idx
      // null -> expected null) or a nulled transcript column makes the
      // equality NULL, and a consumer filtering transcript_ok === false
      // would miss exactly the damaged rows this checker exists to surface
      .withColumn("transcript_ok",
        coalesce(col("transcript") === expectedTranscript(col("row_idx")), lit(false)))
      .select("clip_id", "snr_db", "pcm_ok", "transcript_ok")
  }
}
