package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only inventory-query profiler (test scope — never ships). For each
  * named query (or all of them): runs it with the exact inventory-session
  * config graft.Bench phase 3 uses, times `passes` passes, counts the Spark
  * jobs + stages + tasks each pass submits (the serial stage chain is the
  * latency suspect for the small-data queries), and optionally dumps
  * `.explain("formatted")` to a directory.
  *
  * Usage:
  *   sbt 'Test/runMain graft.tools.QueryProfile [--plans <dir>] [--passes k] [q_name ...]'
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    var plansDir: Option[String] = None
    var passes = 2
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--passes" => passes = args(i + 1).toInt; i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-queryprofile")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.get("QPROF_JOBS").contains("1")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          jobStarts.put(js.jobId, (System.nanoTime(), desc)): Unit
        }
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStarts.remove(je.jobId)).foreach { case (t0, desc) =>
          println(f"[qjob] job=${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${desc.take(140)}")
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        if (verbose) {
          val si = sc.stageInfo
          val dur = for (s <- si.submissionTime; c <- si.completionTime) yield (c - s) / 1e3
          println(f"[qstage] ${dur.getOrElse(-1.0)}%7.3f s tasks=${si.numTasks}%4d  ${si.name.take(140)}")
        }
      }
    })

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val selected = if (names.isEmpty) all else all.filter(q => names.contains(q._1))
    for ((name, fn) <- selected) {
      for (pass <- 1 to passes) {
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain before reading counters
        println(f"[qprof] $name%-18s pass$pass ${secs}%7.2f s  jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d")
      }
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$name${sys.env.getOrElse("QPROF_SUFFIX", "")}.txt"),
          txt.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
