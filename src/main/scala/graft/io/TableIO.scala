package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Iceberg-or-Parquet seam with idempotent checkpoint/resume and
  * per-partition lineage metrics (SURVEY.md §1.2, §7.1).
  *
  * On a real cluster the stage tables are Iceberg tables
  * (`spark.write.format("iceberg").saveAsTable(...)` under a configured
  * catalog, MERGE INTO for incremental adds); the sandbox has no Iceberg
  * runtime jar (`/opt/spark/jars`), so the local format is Parquet plus a
  * `_graft_meta.json` sidecar carrying what Iceberg snapshot metadata would:
  * row count, config hash, wall time, and per-file (= per-partition at
  * write time) row counts for lineage. Files starting with `_` are ignored
  * by Spark's Parquet reader, so the sidecar can live inside the table dir.
  *
  * Resume contract: a stage directory whose sidecar exists and matches the
  * requested config hash is simply re-read — `checkpoint` is idempotent and
  * a killed job re-runs only the stages whose sidecar is missing/stale.
  */
object TableIO {

  val format: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  def confHash(conf: Any): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(conf.toString.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  private def metaPath(dir: String) = Paths.get(dir, "_graft_meta.json")

  def isFresh(dir: String, cfgHash: String): Boolean = {
    val p = metaPath(dir)
    Files.exists(p) && {
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      txt.contains(s""""conf_hash":"$cfgHash"""") && txt.contains(""""status":"complete"""")
    }
  }

  /** Write-or-resume `compute` at `dir`. The sidecar is written AFTER the
    * table, so a crash mid-write leaves no sidecar and the stage re-runs.
    */
  def checkpoint(
      spark: SparkSession,
      dir: String,
      cfgHash: String,
      stage: String
  )(compute: => DataFrame): DataFrame = {
    if (!isFresh(dir, cfgHash)) {
      val t0 = System.nanoTime()
      compute.write.mode("overwrite").format(format).save(dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val back = spark.read.format(format).load(dir)
      // per-file lineage in ONE scan: rows per written file (file <-> task
      // partition at write time); the total is the sum of the per-file
      // counts — no second pass over the table
      import org.apache.spark.sql.functions._
      val fileCounts = back
        .groupBy(input_file_name().as("file"))
        .count()
        .collect()
      val perFile = fileCounts
        .map(r => s"""{"file":${jstr(baseName(r.getString(0)))},"rows":${r.getLong(1)}}""")
      val total = fileCounts.map(_.getLong(1)).sum
      val json =
        s"""{"stage":${jstr(stage)},"status":"complete","conf_hash":"$cfgHash","rows":$total,""" +
          s""""write_secs":$secs,"format":"$format","partitions":[${perFile.mkString(",")}]}"""
      Files.write(metaPath(dir), json.getBytes("UTF-8"))
    }
    spark.read.format(format).load(dir)
  }

  private def baseName(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
