package graft.tools

import graft.api.FuzzyPipeline
import graft.audio.ClipSynth
import graft.conf.FuzzyConf
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only job/stage-level decomposition of the flagship DEDUP chain at
  * one width (test scope — never ships): runs `clusters().count()` exactly
  * as the bench's dedup branch does (same session config) with a listener
  * printing every job's wall and every stage's duration/task count, so
  * serial-floor work targets measured stages, not guesses.
  * Usage: sbt 'Test/runMain graft.tools.DedupProbe <cores> <clips>'
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val clips = if (args.length > 1) args(1).toLong else 1600000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-dedupprobe-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (JIT + codegen cache) at small size
    FuzzyPipeline(spark, ClipSynth.table(spark, 20000, includeAudio = false),
      "clip_id", "transcript", FuzzyConf()).clusters().count()

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStarts.put(js.jobId, (System.nanoTime(), desc)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(jobStarts.remove(je.jobId)).foreach { case (t0, desc) =>
          println(f"[djob] job=${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(120)}")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3).getOrElse(-1.0)
        if (dur >= 0.3)
          println(f"[dstage] ${dur}%7.3f s tasks=${si.numTasks}%4d  ${si.name.take(120)}")
      }
    })

    System.gc()
    val t0 = System.nanoTime()
    val p = FuzzyPipeline(spark, ClipSynth.table(spark, clips, includeAudio = false),
      "clip_id", "transcript", FuzzyConf())
    val n = p.clusters().count()
    println(f"[dprobe] clusters=$n wall=${(System.nanoTime() - t0) / 1e9}%8.2f s")
    Thread.sleep(500)
    spark.stop()
  }
}
