package graft.io

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the Iceberg seam (north rule: "checkpoints ... to Iceberg with
  * per-partition lineage"): the MERGE INTO text, the dir -> table-ident
  * mapping, the iceberg-mode routing of checkpoint/upsert, and the parquet
  * branch's insert-only merge semantics (the locally-executable side of the
  * shared seam — the sandbox ships no Iceberg runtime jar).
  */
class TableIOSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stage dir maps to catalog.db.table with sanitized segments") {
    TableIO.tableIdent("/ckpt/run-2026.08/items") shouldBe "graft.run_2026_08.items"
    TableIO.tableIdent("edges", "cat") shouldBe "cat.graft_db.edges"
    TableIO.tableIdent("/x/7runs/edges") shouldBe "graft.t_7runs.edges"
  }

  test("mergeSql emits insert-only first-writer-wins MERGE INTO") {
    val sql = TableIO.mergeSql("graft.run1.items", "delta_v", "key", Seq("key", "item_id", "original"))
    sql shouldBe
      """MERGE INTO graft.run1.items t
        |USING delta_v s
        |ON t.`key` = s.`key`
        |WHEN NOT MATCHED THEN
        |  INSERT (`key`, `item_id`, `original`) VALUES (s.`key`, s.`item_id`, s.`original`)""".stripMargin
    // no WHEN MATCHED branch: replaying a delta is a no-op (idempotent),
    // and existing keys keep their first writer (Internal.hs:111)
    sql should not include "WHEN MATCHED"
  }

  test("mergeSql quotes reserved-word and non-identifier column names") {
    // round-3 ADVICE: unquoted `order`/`a b` would misparse on the real
    // Iceberg path
    val sql = TableIO.mergeSql("graft.run1.t", "v", "order", Seq("order", "a b"))
    sql should include("ON t.`order` = s.`order`")
    sql should include("INSERT (`order`, `a b`) VALUES (s.`order`, s.`a b`)")
  }

  test("iceberg-mode checkpoint routes to the v2 catalog write path") {
    TableIO.formatOverride = Some("iceberg")
    try {
      val df = Seq(("a", 1)).toDF("key", "v")
      // no iceberg catalog is configured in the sandbox: reaching catalog
      // resolution (rather than the parquet writer) proves the routing
      val ex = intercept[Exception] {
        TableIO.checkpoint(spark, "/tmp/graft_iceberg_probe/run1/items", "h1", "items")(df)
      }
      ex.getMessage.toLowerCase should (include("catalog") or include("graft"))
      java.nio.file.Files.exists(
        java.nio.file.Paths.get("/tmp/graft_iceberg_probe/run1/items")) shouldBe false
    } finally TableIO.formatOverride = None
  }

  test("iceberg-mode upsert runs mergeSql against the catalog") {
    TableIO.formatOverride = Some("iceberg")
    try {
      val delta = Seq(("k1", "v1")).toDF("key", "value")
      val ex = intercept[Exception] {
        TableIO.upsert(spark, "/ckpt/run1/items", delta, "key")
      }
      // MERGE INTO graft.run1.items ... fails at catalog resolution
      ex.getMessage.toLowerCase should (include("catalog") or include("graft"))
    } finally TableIO.formatOverride = None
  }

  test("parquet upsert is insert-only first-writer-wins and idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/items"
    val base = Seq(("k1", "first"), ("k2", "second")).toDF("key", "value")
    TableIO.upsert(spark, dir, base, "key")
    // overlapping delta: k2 must keep its first writer; k3 inserts
    val delta = Seq(("k2", "usurper"), ("k3", "third")).toDF("key", "value")
    TableIO.upsert(spark, dir, delta, "key")
    // replay the same delta: no change (MERGE idempotence contract)
    TableIO.upsert(spark, dir, delta, "key")
    val got = spark.read.parquet(dir).as[(String, String)].collect().toMap
    got shouldBe Map("k1" -> "first", "k2" -> "second", "k3" -> "third")
  }

  test("upsert dedupes duplicate keys WITHIN a delta (deterministic first writer)") {
    // a distributed batch has no row order, so in-batch "first" is defined
    // as the minimum full row; without the dedupe both duplicate rows
    // would insert and the table would hold two rows for k1 forever
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_dup").toString + "/items"
    val delta = Seq(("k1", "vB"), ("k1", "vA"), ("k2", "w")).toDF("key", "value")
    TableIO.upsert(spark, dir, delta, "key")
    val got = spark.read.parquet(dir).as[(String, String)].collect().toMap
    got shouldBe Map("k1" -> "vA", "k2" -> "w") // min row wins, one row per key
    spark.read.parquet(dir).count() shouldBe 2L
  }

  test("parquet upsert recovers from a crash between the swap moves") {
    // round-3 ADVICE: simulate a crash AFTER move(target -> ._merge_old)
    // and BEFORE move(._merge_tmp -> target): the table exists only at
    // ._merge_old, plus a stale ._merge_tmp — the next upsert must restore
    // it and proceed instead of throwing FileAlreadyExistsException
    import java.nio.file.{Files => JF, Paths => JP}
    val dir = JF.createTempDirectory("graft_upsert_crash").toString + "/items"
    Seq(("k1", "first")).toDF("key", "value").write.parquet(dir + "._merge_old")
    Seq(("junk", "junk")).toDF("key", "value").write.parquet(dir + "._merge_tmp")
    TableIO.upsert(spark, dir, Seq(("k2", "second")).toDF("key", "value"), "key")
    val got = spark.read.parquet(dir).as[(String, String)].collect().toMap
    got shouldBe Map("k1" -> "first", "k2" -> "second")
    JF.exists(JP.get(dir + "._merge_old")) shouldBe false
    JF.exists(JP.get(dir + "._merge_tmp")) shouldBe false
  }

  test("stageMetrics keeps a zero-file stage visible and is empty-safe") {
    import java.nio.file.{Files => JF, Paths => JP}
    val ck = JF.createTempDirectory("graft_metrics_edge").toString
    // no sidecars at all -> empty frame with the documented schema
    TableIO.stageMetrics(spark, ck).count() shouldBe 0L
    TableIO.stageMetrics(spark, ck).columns.toSeq shouldBe Seq(
      "stage", "status", "conf_hash", "rows", "write_secs", "format", "file", "file_rows")
    // a stage whose table wrote ZERO data files (empty result) has
    // "partitions":[] — it must surface as one null-file row, not vanish
    JF.createDirectories(JP.get(ck, "empty_stage"))
    JF.write(JP.get(ck, "empty_stage", "_graft_meta.json"),
      ("""{"stage":"empty_stage","status":"complete","conf_hash":"h","rows":0,""" +
        """"write_secs":0.1,"format":"parquet","partitions":[]}""").getBytes("UTF-8"))
    val rows = TableIO.stageMetrics(spark, ck)
      .select("stage", "rows", "file").as[(String, Long, Option[String])].collect().toSeq
    rows shouldBe Seq(("empty_stage", 0L, None))
  }
}
