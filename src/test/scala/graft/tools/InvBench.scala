package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch inventory timer for the round-5 fixed-code A/B (verdict item 2):
  * times every SparkEntry query on sf0.1 with the exact inventory-session
  * config graft.Bench uses (no flagship advisory, no FAIR), two passes per
  * JVM so pass 1 ~ the driver's cold-ish conditions and pass 2 is JIT-warm.
  */
object InvBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-invbench")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (pass <- 1 to 2) {
      val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      println(s"""INVBENCH {"pass":$pass,"total":${results.map(_._2).sum},"queries":$qs}""")
    }
    spark.stop()
  }
}
