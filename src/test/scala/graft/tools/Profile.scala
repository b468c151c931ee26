package graft.tools

import graft.api.FuzzyPipeline
import graft.audio.{ClipSynth, Invariant}
import graft.conf.FuzzyConf
import graft.stage.{Candidates, FindStage}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage profiler for the flagship job (test scope — never
  * ships). Usage:
  *   sbt 'Test/runMain graft.tools.Profile <cores> <clips> [fine]'
  * Prints wall seconds (and cumulative JVM GC millis) per flagship stage so
  * scaling work targets the measured floor, not guesses. `fine` also
  * breaks the dedup section into its branch stages.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val clips = if (args.length > 1) args(1).toLong else 400000L
    val fine = args.contains("fine")
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$cores")
      .config("spark.sql.shuffle.partitions",
        (sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "2").toInt * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val g0 = gcMillis
      val a = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMillis - g0}%6d ms")
      a
    }

    // small warmup for JIT
    locally {
      val p = FuzzyPipeline(spark, ClipSynth.table(spark, 10000, includeAudio = false),
        "clip_id", "transcript", FuzzyConf())
      p.clusters().count()
      Invariant.check(ClipSynth.table(spark, 5000)).filter("pcm_ok").count()
    }
    println(s"[profile] === cores=$cores clips=$clips fine=$fine ===")

    val total0 = System.nanoTime()
    t("invariant") {
      Invariant.check(ClipSynth.table(spark, clips)).filter("pcm_ok and transcript_ok").count()
    }
    val conf = FuzzyConf()
    val p = FuzzyPipeline(spark, ClipSynth.table(spark, clips, includeAudio = false),
      "clip_id", "transcript", conf)
    t("index.items") { p.index.items.count() }
    t("index.members") { p.index.members.count() }
    t("index.sigs") { p.index.sigs.count() }
    if (fine) {
      val idx = p.index
      val cands = t("candidates.fused") {
        // SERIALIZED storage like the pipeline's ckpt: an eager default
        // (deserialized) checkpoint here holds millions of old-gen row
        // objects and bills their full-GC cost to this stage — measured
        // 42 s vs ~10 s for the identical computation through the
        // pipeline's own path
        Candidates.fusedPairs(
          idx.sigs, 3, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket)
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      }
      t("candidates.count") { cands.count() }
      t("edges.exact") { Candidates.exactEdges(idx.members).count() }
      t("edges.verify") { FindStage.verifyPairs(cands, idx, conf.minScore).count() }
      t("edges.substr") {
        Candidates.substringPairs(
          idx.items, conf.substringPrefixLen, conf.substringMinRatio, conf.maxBandBucket).count()
      }
    }
    t("candidates") { p.candidatePairs().count() }
    t("edges") { p.dedupEdges().count() }
    t("clusters") { p.clusters().count() }
    println(f"[profile] TOTAL                  ${(System.nanoTime() - total0) / 1e9}%8.2f s")
    spark.stop()
  }
}
