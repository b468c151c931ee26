package graft.tools

import graft.audio.ClipSynth
import graft.conf.FuzzyConf
import graft.stage.{Candidates, IndexBuild, Scratch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev-only interleaved A/B of the candidate-generation withN seam at
  * flagship scale (test scope — never ships): builds the 1.6M-clip sigs
  * table once (materialized blocks), then alternates fusedPairs with the
  * pruned keyed-with-size table MATERIALIZED vs RE-DERIVED per branch,
  * timing each arm in the same JVM so machine-window noise hits both.
  * Usage: sbt 'Test/runMain graft.tools.CandProbe <cores> <clips> <reps>'
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val clips = if (args.length > 1) args(1).toLong else 1600000L
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-candprobe-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = FuzzyConf()
    val items = IndexBuild(
      ClipSynth.table(spark, clips, includeAudio = false), "clip_id", "transcript", conf).items
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val sigs = IndexBuild.signatures(items, conf)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    sigs.count() // materialize once, outside the timed arms

    def arm(mode: String): Double = {
      if (mode == "off") sys.props("graft.cand.withn") = "nomat"
      else sys.props.remove("graft.cand.withn") // default arm = materialized
      val scratch = new Scratch
      System.gc()
      val t0 = System.nanoTime()
      val n = Candidates
        .fusedPairs(sigs, 3, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket, scratch)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      scratch.release()
      println(f"[candprobe] $mode%-5s ${secs}%7.2f s  pairs=$n")
      secs
    }
    arm("off"); arm("mat") // warmup both
    for (_ <- 1 to reps) { arm("off"); arm("mat") }
    spark.stop()
  }
}
