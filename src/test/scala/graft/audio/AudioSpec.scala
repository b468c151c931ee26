package graft.audio

import graft.SparkTestSession
import graft.api.FuzzyPipeline
import graft.conf.FuzzyConf
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class WavSpec extends AnyFunSuite with Matchers {

  test("WAV round-trip is byte-exact for samples and sample rate") {
    val samples = Wav.synthSamples(3, 8000, 300, noiseSeed = 99L)
    val bytes = Wav.toWav(samples, 8000)
    val (sr, back) = Wav.fromWav(bytes)
    sr shouldBe 8000
    back shouldBe samples
    bytes.length shouldBe 44 + samples.length * 2
    new String(bytes.take(4), "US-ASCII") shouldBe "RIFF"
  }

  test("synthesized clip SNR vs clean signal is ~40 dB (>= 30 dB invariant)") {
    val clean = Wav.cleanSignal(5, 16000, 500)
    val noisy = Wav.synthSamples(5, 16000, 500, noiseSeed = 7L).map(_.toDouble)
    val snr = Wav.snrDb(clean, noisy)
    snr should be >= 35.0
    snr should be <= 45.0
  }

  test("duplicate partners share the clean signal: pairwise SNR >= 30 dB") {
    val a = Wav.synthSamples(8, 8000, 400, noiseSeed = 1L).map(_.toDouble)
    val b = Wav.synthSamples(8, 8000, 400, noiseSeed = 2L).map(_.toDouble)
    Wav.snrDb(a, b) should be >= 30.0
  }

  test("synthesis is deterministic") {
    Wav.synthSamples(4, 8000, 200, 11L) shouldBe Wav.synthSamples(4, 8000, 200, 11L)
    ClipSynth.clipAt(17, 42L).transcript shouldBe ClipSynth.clipAt(17, 42L).transcript
    ClipSynth.clipAt(17, 42L).bytes shouldBe ClipSynth.clipAt(17, 42L).bytes
  }

  test("inlined noise LCG is bit-identical to java.util.Random across seeds") {
    // synthSamples replaced java.util.Random (AtomicLong CAS per 32-bit
    // word) with the same LCG in plain locals; the noise stream — and so
    // every synthesized byte — must stay bit-identical to the Random form
    for (seed <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)) {
      val rng = new java.util.Random(seed)
      val viaRandom = {
        val clean = Wav.cleanSignal(6, 8000, 300)
        val amp = 0.8 * Short.MaxValue
        val na = (amp / math.sqrt(2.0)) * math.sqrt(3.0) / math.pow(10.0, 40.0 / 20.0)
        clean.map { c =>
          val v = c + (rng.nextDouble() * 2.0 - 1.0) * na
          math.max(Short.MinValue.toDouble, math.min(Short.MaxValue.toDouble, math.rint(v))).toShort
        }
      }
      Wav.synthSamples(6, 8000, 300, noiseSeed = seed) shouldBe viaRandom
    }
  }

  test("parser rejects garbage") {
    an[Exception] should be thrownBy Wav.fromWav(Array[Byte](1, 2, 3))
    an[Exception] should be thrownBy Wav.fromWav(("JUNK" + "x" * 60).getBytes)
  }

  test("chunk walk skips the RIFF pad byte after an odd-sized chunk") {
    // splice an odd-length LIST chunk (size 13 + 1 pad byte) between fmt
    // and data: RIFF aligns chunks to 2 bytes, so a walker that advances
    // by `size` alone reads the pad byte as the next chunk id and derails
    val samples = Wav.synthSamples(2, 8000, 200, noiseSeed = 5L)
    val canonical = Wav.toWav(samples, 8000)
    val odd = 13
    val out = java.nio.ByteBuffer
      .allocate(canonical.length + 8 + odd + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(canonical, 0, 36)                  // RIFF..WAVE + fmt chunk
    out.put("LIST".getBytes("US-ASCII"))
    out.putInt(odd)
    out.put(Array.fill[Byte](odd + 1)(0x7f))   // payload + pad byte
    out.put(canonical, 36, canonical.length - 36) // data chunk
    val bytes = out.array()
    // keep the RIFF size field consistent with the larger file
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val (sr, back) = Wav.fromWav(bytes)
    sr shouldBe 8000
    back shouldBe samples
  }

  test("chunk walk throws (not hangs) on a negative chunk size") {
    // a corrupted header whose size field is negative would make `next`
    // land at or before the chunk start — the walk must fail fast so the
    // invariant checker surfaces pcm_ok=false instead of spinning forever
    val samples = Wav.synthSamples(3, 8000, 100, noiseSeed = 7L)
    val bytes = Wav.toWav(samples, 8000)
    val corrupt = bytes.clone()
    // fmt chunk's size field sits at offset 16 in the canonical layout
    java.nio.ByteBuffer.wrap(corrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8)
    val ex = intercept[IllegalArgumentException](Wav.fromWav(corrupt))
    ex.getMessage should include("corrupt WAV chunk size")
  }
}

class InvariantSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-row invariant holds on the synthesized table after a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clips").toString
    ClipSynth.table(spark, 60).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val checked = Invariant.check(back)
    checked.count() shouldBe 60
    checked.filter("not pcm_ok or not transcript_ok").count() shouldBe 0
    val minSnr = checked.agg(org.apache.spark.sql.functions.min("snr_db")).as[Double].head()
    minSnr should be >= 30.0
  }

  test("corrupted audio bytes FAIL the invariant (negative control)") {
    import org.apache.spark.sql.functions._
    val corrupt = udf { (b: Array[Byte]) =>
      // zero out a chunk of PCM data — decodes fine, SNR collapses
      val c = b.clone(); java.util.Arrays.fill(c, 100, c.length, 0.toByte); c
    }
    val clips = ClipSynth.table(spark, 10).withColumn("bytes", corrupt(col("bytes")))
    Invariant.check(clips).filter("pcm_ok").count() shouldBe 0
  }

  test("undecodable bytes surface as pcm_ok=false rows, not a job failure") {
    import org.apache.spark.sql.functions._
    // truncate half the rows below a valid header: the report must still
    // cover EVERY row (identifying which ones are damaged is the checker's
    // purpose), with snr_db null and pcm_ok false on the broken ones
    val truncate = udf { (b: Array[Byte], id: String) =>
      if (id.endsWith("1") || id.endsWith("3")) b.take(20) else b
    }
    val clips = ClipSynth.table(spark, 10).withColumn("bytes", truncate(col("bytes"), col("clip_id")))
    val rep = Invariant.check(clips).collect()
    rep.length shouldBe 10
    val bad = rep.filter(r => { val id = r.getString(0); id.endsWith("1") || id.endsWith("3") })
    bad.length shouldBe 2 // clip_...001 and clip_...003
    bad.foreach { r =>
      r.isNullAt(r.fieldIndex("snr_db")) shouldBe true
      r.getBoolean(r.fieldIndex("pcm_ok")) shouldBe false
    }
    rep.count(r => r.getBoolean(r.fieldIndex("pcm_ok"))) shouldBe 8
  }

  test("transcript mutation FAILS the invariant (negative control)") {
    import org.apache.spark.sql.functions._
    val clips = ClipSynth.table(spark, 10)
      .withColumn("transcript", concat(col("transcript"), lit("X")))
    Invariant.check(clips).filter("transcript_ok").count() shouldBe 0
  }

  test("corrupted clip_id / null transcript read as transcript_ok=false, never NULL") {
    import org.apache.spark.sql.functions._
    // a mangled clip_id makes row_idx (and so the expected transcript)
    // NULL; a consumer filtering transcript_ok = false must still see the
    // damaged row — the very rows this checker exists to surface
    val clips = ClipSynth.table(spark, 6)
      .withColumn("clip_id",
        when(col("clip_id").endsWith("2"), lit("mangled")).otherwise(col("clip_id")))
      .withColumn("transcript",
        when(col("clip_id").endsWith("3"), lit(null: String)).otherwise(col("transcript")))
    val rep = Invariant.check(clips)
    rep.filter("transcript_ok is null").count() shouldBe 0
    rep.filter("not transcript_ok").count() shouldBe 2
    rep.filter("transcript_ok").count() shouldBe 4
  }
}

class ClipDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clip-table dedup: planted pairs land in one component, recall >= 0.99") {
    val n = 2000L
    val clips = ClipSynth.table(spark, n, includeAudio = false)
    val p = FuzzyPipeline(spark, clips, "clip_id", "transcript", FuzzyConf())
    val comp = p.clusters().as[(String, String)].collect().toMap
    val planted = ClipSynth.plantedPairs(n)
    planted should not be empty
    val missed = planted.filterNot { case (a, b) =>
      comp(f"clip_$a%012d") == comp(f"clip_$b%012d")
    }
    val recall = 1.0 - missed.size.toDouble / planted.size
    withClue(s"missed ${missed.take(5)} of ${planted.size}: ") {
      recall should be >= 0.99
    }
  }

  test("index build prunes the audio bytes column at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clips-scan").toString
    ClipSynth.table(spark, 30).write.mode("overwrite").parquet(dir)
    val clips = spark.read.parquet(dir)
    // the raw (pre-materialization) plan shows the parquet scan; pipeline
    // tables themselves are RDD scans after localCheckpoint
    val raw = graft.stage.IndexBuild(clips, "clip_id", "transcript", FuzzyConf())
    val plan = raw.items.queryExecution.executedPlan.toString
    plan should include("ReadSchema")
    plan should not include "bytes"
  }
}
