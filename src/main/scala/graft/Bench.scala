package graft

import graft.api.FuzzyPipeline
import graft.audio.{ClipSynth, Invariant}
import graft.conf.FuzzyConf
import org.apache.spark.sql.SparkSession

/** Round benchmark. Prints ONE JSON line:
  * {"metric":"total","value":S,"unit":"sec","queries":{...},"sf":...,
  *  "dedup":{...},"audio":{...}}
  *
  * The dedup block evidences the north rule's two-cluster-size criterion
  * in-sandbox (BASELINE.md): the identical dedup job (index -> LSH/SimHash
  * candidates -> verify -> connected components) over the identical
  * synthesized clip table at two parallelism levels — local[N] vs
  * local[4N] standing in for N vs 4N executors; efficiency =
  * (throughput_4N / throughput_N) / 4. The audio block times the
  * decode-PCM + SNR invariant over WAV-carrying rows.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The flagship job: dedup clusters over n synthesized clips. */
  private def dedupRows(spark: SparkSession, n: Long): Long =
    FuzzyPipeline(
      spark,
      ClipSynth.table(spark, n, includeAudio = false),
      "clip_id",
      "transcript",
      FuzzyConf()).clusters().count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores4N = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val coresN = math.max(cores4N / 4, 1)
    val nClips = sys.env.getOrElse("SPARK_GRAFT_CLIPS", "100000").toLong
    val nAudio = sys.env.getOrElse("SPARK_GRAFT_AUDIO_CLIPS", "2000").toLong

    // phase 1 at 4N cores: operator inventory, dedup flagship, audio invariant
    val spark4 = session(cores4N)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, secs) = timed(
        try fn(spark4, sfDir).count()
        catch { case _: Throwable => -1L })
      name -> secs
    }
    val (rows, secs4) = timed(dedupRows(spark4, nClips))
    val (audioOk, audioSecs) = timed {
      Invariant
        .check(ClipSynth.table(spark4, nAudio))
        .filter("pcm_ok and transcript_ok")
        .count()
    }
    spark4.stop()

    // phase 2: identical dedup job at N cores (fresh session, same JVM)
    val sparkN = session(coresN)
    val (_, secsN) = timed(dedupRows(sparkN, nClips))
    sparkN.stop()

    val thr4 = rows / secs4
    val thrN = rows / secsN
    val eff = (thr4 / thrN) / (cores4N.toDouble / coresN)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + secs4
    val dedup =
      s"""{"rows":$rows,"clips_per_sec_4N":$thr4,"clips_per_sec_N":$thrN,""" +
        s""""scaling_efficiency":$eff,"cores_N":$coresN,"cores_4N":$cores4N,""" +
        s""""secs_N":$secsN,"secs_4N":$secs4}"""
    val audio =
      s"""{"clips":$nAudio,"invariant_pass":$audioOk,"secs":$audioSecs,""" +
        s""""clips_per_sec":${nAudio / audioSecs}}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","dedup":$dedup,"audio":$audio}""")
  }
}
