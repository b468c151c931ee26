import graft.api.FuzzyPipeline
import graft.audio.ClipSynth
import graft.conf.FuzzyConf
import org.apache.spark.sql.SparkSession
object Scale400 {
  def run(cores: Int, n: Long): Double = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled","false").appName(s"scale-$cores").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    FuzzyPipeline(spark, ClipSynth.table(spark, 2000, includeAudio=false),
      "clip_id","transcript", FuzzyConf()).clusters().count() // warmup
    val t0 = System.nanoTime()
    FuzzyPipeline(spark, ClipSynth.table(spark, n, includeAudio=false),
      "clip_id","transcript", FuzzyConf()).clusters().count()
    val secs = (System.nanoTime()-t0)/1e9
    println(f"SCALE cores=$cores n=$n secs=$secs%.1f thr=${n/secs}%.0f")
    spark.stop(); secs
  }
  def main(args: Array[String]): Unit = {
    val n = 400000L
    val s32 = run(32, n); val s8 = run(8, n)
    println(f"SCALE eff8to32=${(n/s32)/(n/s8)/4.0}%.3f")
  }
}
