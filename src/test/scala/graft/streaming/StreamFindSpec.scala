package graft.streaming

import graft.SparkTestSession
import graft.conf.FuzzyConf
import graft.stage.IndexBuild
import graft.text.FuzzySetRef
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamFindSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming findMin over micro-batches == batch/oracle results") {
    val corpus = Seq("Jurassic Park", "Terminator", "The Matrix", "Alaska", "Wyoming")
    val clips = corpus.zipWithIndex.map { case (t, i) => (f"c$i%03d", t) }
      .toDF("clip_id", "transcript")
    val idx = IndexBuild(clips, "clip_id", "transcript", FuzzyConf())
    val oracle = FuzzySetRef.fromList(corpus)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val outDir = java.nio.file.Files.createTempDirectory("stream-find-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("stream-find-ck").toString
    val q = StreamFind.findStream(
      stream.toDF().toDF("query_id", "query"), idx, 0.33, outDir, ckDir)

    stream.addData(("q0", "percolator"), ("q1", "alaska"))
    q.processAllAvailable()
    stream.addData(("q2", "Why-oh-me-ing"), ("q3", "zzzz qqqq"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
      .select("query_id", "score", "matched")
      .as[(String, Double, String)]
      .collect()
      .groupBy(_._1)

    out("q0").map(_._3).toSet shouldBe oracle.find("percolator").map(_._2).toSet
    out("q1").toSeq shouldBe Seq(("q1", 1.0, "Alaska")) // exact short-circuit
    val wy = oracle.find("Why-oh-me-ing")
    out("q2").map(r => (r._3, r._2)).toSet shouldBe wy.map(m => (m._2, m._1)).toSet
    out.get("q3") shouldBe None // no match above threshold

    // at-least-once replay: re-running a micro-batch (same batchId, as a
    // foreachBatch retry would) must not duplicate its output rows
    val before = spark.read.parquet(outDir).count()
    StreamFind.writeBatch(
      Seq(("q0", "percolator"), ("q1", "alaska")).toDF("query_id", "query"),
      batchId = 0L, idx, 0.33, outDir)
    spark.read.parquet(outDir).count() shouldBe before
  }
}
