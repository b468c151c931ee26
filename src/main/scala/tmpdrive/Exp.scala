import graft.api.FuzzyPipeline
import graft.conf.FuzzyConf
import org.apache.spark.sql.SparkSession
object Exp {
  def sess(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (4*cores).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def dedup(s: SparkSession, n: Long) =
    FuzzyPipeline(s, graft.audio.ClipSynth.table(s, n, includeAudio=false), "clip_id", "transcript", FuzzyConf()).clusters().count()
  def t(f: => Any): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
  def main(a: Array[String]): Unit = {
    val w = sess(8); dedup(w, 20000); w.stop()
    for (rep <- 1 to 2; c <- Seq(8, 32)) {
      val s = sess(c)
      println(f"NOCOAL rep=$rep cores=$c dedup=${t(dedup(s, 400000))}%.1f")
      s.stop()
    }
  }
}
