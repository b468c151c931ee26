package graft.tools

import graft.api.FuzzyPipeline
import graft.conf.FuzzyConf
import graft.sql.{functions => gf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only decomposition of q_find's cascade cost (test scope). Re-builds
  * the size-3 pass of FindStage.cascade step by step over the sf0.1
  * documents corpus and times each sub-plan's count, so the 1-task 16 s
  * stage the profiler sees can be attributed to an operator.
  */
object FindProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-findprobe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[findprobe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val pipe = FuzzyPipeline(spark, d, "doc_id", "text", FuzzyConf(maxPostingsPerGram = 0))
    val probes = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").cast("string").as("query_id"),
        concat(lower(col("text")), lit(" zz")).as("query"))

    for (pass <- 1 to 2) {
      println(s"[findprobe] === pass $pass ===")
      val idx = pipe.index
      t("items.count")(idx.items.count())
      t("postings.count")(idx.postings.count())
      t("norms.count")(idx.norms.count())

      val p = probes
        .select(col("query_id").cast("string").as("query_id"), col("query"))
        .withColumn("qkey", lower(col("query")))
      val rest = p
        .join(idx.items.select(col("key").as("qkey")), Seq("qkey"), "left_anti")
        .select("query_id", "qkey")
      t("rest.count")(rest.count())

      val qg = rest
        .select(col("query_id"), explode(gf.gramCounts(col("qkey"), 3)).as("e"))
        .select(col("query_id"), col("e.gram").as("gram"), col("e.cnt").as("qcnt"))
      t("qg3.count")(qg.count())
      val qnorm = qg.groupBy("query_id").agg(sqrt(sum(col("qcnt") * col("qcnt"))).as("qmag"))
      val dots = qg.hint("broadcast")
        .join(idx.postings.filter(col("gram_size") === 3).drop("gram_size"), Seq("gram"))
        .groupBy("query_id", "item_id")
        .agg(sum(col("qcnt").cast("long") * col("cnt")).as("dot"))
      t("dots.count")(dots.count())
      val inorm = idx.norms.filter(col("gram_size") === 3).select(col("item_id"), col("magnitude"))
      val cos = dots
        .join(qnorm.hint("broadcast"), Seq("query_id"))
        .join(inorm, Seq("item_id"))
        .filter(col("qmag") > 0 && col("magnitude") > 0)
        .withColumn("cosine", col("dot") / (col("qmag") * col("magnitude")))
      t("cos.count")(cos.count())
      val withKeys = cos
        .join(idx.items.select(col("item_id"), col("key"), col("original")), Seq("item_id"))
        .join(rest.hint("broadcast"), Seq("query_id"))
      t("withKeys.count")(withKeys.count())
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("key").asc)
      val top = withKeys.withColumn("rn", row_number().over(w)).filter(col("rn") <= 50)
      t("top50.count")(top.count())
      val scored = top.withColumn("score", gf.levNormSim(col("qkey"), col("key")))
      t("scored>=0.33.count")(scored.filter(col("score") >= 0.33).count())
      t("full findMin")(pipe.findMin(0.33, probes).count())
    }
    spark.stop()
  }
}
