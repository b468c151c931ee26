package graft.tools

import graft.audio.ClipSynth
import graft.conf.FuzzyConf
import graft.stage.{Candidates, IndexBuild, Scratch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev-only interleaved A/B of the substring-pass materialization/hint
  * seam at flagship scale (test scope — never ships). Usage:
  *   sbt 'Test/runMain graft.tools.SubstrProbe <cores> <clips> <reps>'
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val clips = if (args.length > 1) args(1).toLong else 1600000L
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-substrprobe-$cores")
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
    items.count()

    def arm(mode: String): Unit = {
      if (mode == "off") sys.props("graft.substr.mat") = "off"
      else sys.props.remove("graft.substr.mat")
      val scratch = new Scratch
      System.gc()
      val t0 = System.nanoTime()
      val n = Candidates
        .substringPairs(items, conf.substringPrefixLen, conf.substringMinRatio,
          conf.maxBandBucket, scratch)
        .count()
      println(f"[substrprobe] $mode%-4s ${(System.nanoTime() - t0) / 1e9}%7.2f s  pairs=$n")
      scratch.release()
    }
    arm("off"); arm("mat")
    for (_ <- 1 to reps) { arm("off"); arm("mat") }
    spark.stop()
  }
}
