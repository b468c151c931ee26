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
    val snrUdf = udf { (bytes: Array[Byte], baseIdx: Long, durMs: Int) =>
      val (sr, samples) = Wav.fromWav(bytes)
      Wav.snrDbVsClean(baseIdx, sr, durMs, samples)
    }
    val expectedTranscript = udf { (i: Long) =>
      ClipSynth.clipAt(i, seed, includeAudio = false).transcript
    }
    clips
      .withColumn("row_idx", regexp_extract(col("clip_id"), "clip_(\\d+)", 1).cast("long"))
      .withColumn("snr_db", snrUdf(col("bytes"), col("base_idx"), col("dur_ms")))
      .withColumn("pcm_ok", col("snr_db") >= MinSnrDb)
      .withColumn("transcript_ok",
        col("transcript") === expectedTranscript(col("row_idx")))
      .select("clip_id", "snr_db", "pcm_ok", "transcript_ok")
  }
}
