package graft.tools

import graft.api.FuzzyPipeline
import graft.audio.ClipSynth
import graft.conf.FuzzyConf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: scale-path vs exhaustive-path cluster agreement at a given
  * size, with disagreement examples. Usage:
  *   sbt 'Test/runMain graft.tools.AgreementCheck <cores> <clips>'
  */
object AgreementCheck {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 16
    val n = if (args.length > 1) args(1).toLong else 20000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-agreement")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val clips = ClipSynth.table(spark, n, includeAudio = false)
    val p = FuzzyPipeline(spark, clips, "clip_id", "transcript", FuzzyConf())
    val t0 = System.nanoTime()
    val scale = p.clusters().select(col("clip_id"), col("component").as("c_scale"))
      .localCheckpoint()
    println(f"[agree] scale path  ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val exh = p.clustersExhaustive().select(col("clip_id"), col("component").as("c_exh"))
      .localCheckpoint()
    println(f"[agree] exhaustive  ${(System.nanoTime() - t1) / 1e9}%.1f s")
    val joined = scale.join(exh, Seq("clip_id")).localCheckpoint()
    val total = joined.count()
    val disagree = joined.filter(col("c_scale") =!= col("c_exh"))
    val nd = disagree.count()
    println(s"[agree] n=$total disagree=$nd agreement=${1.0 - nd.toDouble / total}")
    val ex = disagree.limit(10).as[(String, String, String)].collect()
    ex.foreach { case (id, s, e) => println(s"[agree] DIFF clip=$id scale=$s exh=$e") }
    // context for the first few: show the transcript + both components' members
    val txt = clips.select(col("clip_id"), col("transcript")).as[(String, String)]
      .collect().toMap
    ex.take(4).foreach { case (id, s, e) =>
      println(s"[agree]   clip=$id '${txt(id)}'")
      println(s"[agree]   scaleComp=$s '${txt.getOrElse(s, "?")}'  exhComp=$e '${txt.getOrElse(e, "?")}'")
    }
    spark.stop()
  }
}
