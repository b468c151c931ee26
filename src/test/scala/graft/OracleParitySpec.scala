package graft

import graft.sql.{functions => gf}
import graft.text.Gram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The spec Queries.scala's oracle-parity rules promise: the DuckDB oracle
  * normalizes text with the ASCII char class `[^a-z0-9 ,]` (Queries.sqlNorm)
  * while the engine uses the reference's Unicode `normalized`
  * (Internal.hs:204-211, gf.normText). The driver's hash-equal oracle can
  * only be sound if the two agree on every character the driver corpus
  * actually contains — this spec pins that equivalence over the corpus
  * alphabet directly, end to end over the corpus rows through the REAL
  * engine Column path, and documents one non-ASCII divergence so the scope
  * of the equivalence (ASCII corpora only) stays explicit.
  */
class OracleParitySpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Queries.sqlNorm ('-'||regexp_replace(lower(text),'[^a-z0-9 ,]','','g')
    * ||'-') re-expressed in Scala; java.util.regex and DuckDB RE2 agree on
    * this pure-ASCII class.
    */
  private def sqlNormScala(s: String): String =
    "-" + s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9 ,]", "") + "-"

  private lazy val corpus: Array[String] =
    spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text")
      .as[String]
      .collect()

  test("ASCII class keeps exactly the chars normText keeps, over the corpus alphabet") {
    val alphabet = corpus.iterator.flatMap(_.iterator).toSet
    alphabet should not be empty
    alphabet.foreach { ch =>
      val viaSql = sqlNormScala(ch.toString).stripPrefix("-").stripSuffix("-")
      val viaEngine = Gram.normalized(ch.toString)
      withClue(s"char U+${ch.toInt.toHexString} '$ch': ") {
        viaEngine shouldBe viaSql
      }
    }
    // the equivalence silently relies on the corpus containing no control
    // whitespace (normText keeps \t..\r, the ASCII class drops them) and
    // nothing non-ASCII — assert that precondition instead of assuming it
    alphabet.filter(c => c < ' ' || c > '~') shouldBe empty
  }

  test("engine Column path == oracle normalization end to end over the corpus rows") {
    val sqlUdf = udf(sqlNormScala _)
    val mismatches = corpus.toSeq
      .toDF("text")
      .select(
        gf.enclosed(gf.normText(col("text"))).as("engine"),
        sqlUdf(col("text")).as("oracle"))
      .filter(col("engine") =!= col("oracle"))
      .count()
    mismatches shouldBe 0L
  }

  test("non-ASCII input diverges exactly as documented") {
    // Unicode letters survive the engine (reference isAlphaNum) but not the
    // oracle's ASCII class — the documented reason the oracle is only valid
    // on ASCII corpora like the driver's
    Gram.normalized("café") shouldBe "café"
    sqlNormScala("café") shouldBe "-caf-"
    // control whitespace: kept by the engine (Haskell isSpace), dropped by
    // the ASCII class
    Gram.normalized("a\tb") shouldBe "a\tb"
    sqlNormScala("a\tb") shouldBe "-ab-"
  }
}
