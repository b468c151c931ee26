package graft.tools

import graft.api.FuzzyPipeline
import graft.audio.{ClipSynth, Invariant}
import graft.conf.FuzzyConf
import org.apache.spark.sql.SparkSession

/** Dev-only decomposition of the flagship wall at one width (test scope —
  * never ships): times (a) the audio invariant alone, (b) the dedup chain
  * alone, (c) the overlapped flagship exactly as graft.Bench runs it —
  * same session config (FAIR + 8m advisory + tmpfs local dir), full-size
  * warmup, System.gc() between phases. Usage:
  *   sbt 'Test/runMain graft.tools.FlagshipProbe <cores> <clips>'
  */
object FlagshipProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](name: String)(f: => A): A = {
    System.gc()
    val t0 = System.nanoTime()
    val a = f
    println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    a
  }

  private def invariantOnly(spark: SparkSession, n: Long): Long =
    Invariant.check(ClipSynth.table(spark, n)).filter("pcm_ok and transcript_ok").count()

  private def dedupOnly(spark: SparkSession, n: Long): Long =
    FuzzyPipeline(spark, ClipSynth.table(spark, n, includeAudio = false),
      "clip_id", "transcript", FuzzyConf()).clusters().count()

  private def overlapped(spark: SparkSession, n: Long): (Long, Long) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val audioF = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-audio")
        invariantOnly(spark, n)
      }
    })
    try {
      val rows = dedupOnly(spark, n)
      (audioF.get(), rows)
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val clips = if (args.length > 1) args(1).toLong else 1600000L
    val phases =
      if (args.length > 2) args(2).split(',').toSeq
      else Seq("overlapped", "serial", "overlapped", "serial")
    println(s"[probe] === cores=$cores clips=$clips phases=${phases.mkString(",")} ===")
    // full-size warmup on a throwaway session, same as graft.Bench phase 0b
    locally {
      val w = session(cores)
      overlapped(w, clips)
      w.stop()
    }
    for (phase <- phases) {
      val s = session(cores)
      phase match {
        case "invariant"  => timed("invariant-only")(invariantOnly(s, clips))
        case "dedup"      => timed("dedup-only")(dedupOnly(s, clips))
        case "overlapped" => timed("overlapped")(overlapped(s, clips))
        // the no-FAIR-overlap flagship shape: same two jobs, same session,
        // back to back — what the bench would measure without the pools
        case "serial" => timed("serial") {
          invariantOnly(s, clips); dedupOnly(s, clips)
        }
      }
      s.stop()
    }
  }
}
