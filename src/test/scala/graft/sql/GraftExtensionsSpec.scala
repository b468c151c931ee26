package graft.sql

import graft.SparkTestSession
import graft.text.Gram
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("registered SQL functions match the Column API on every kernel") {
    GraftExtensions.register(spark)
    Seq("alpha beta gamma", "Destroido Corp.", "déjà vu naïve", "")
      .toDF("s").createOrReplaceTempView("gext_t")
    val viaSql = spark.sql(
      """SELECT graft_norm_text(s) n, graft_shingles(s, 3) g,
        |       graft_gram_counts(s, 2) c,
        |       graft_sig_bands_from_key(s, 3, 16, 4, 3) ss
        |FROM gext_t""".stripMargin).collect()
    val viaCols = spark.table("gext_t").select(
      functions.normText($"s").as("n"),
      functions.shingles($"s", 3).as("g"),
      functions.gramCounts($"s", 2).as("c"),
      functions.sigBandsFromKey($"s", 3, 16, 4, 3).as("ss")).collect()
    viaSql should contain theSameElementsAs viaCols

    spark.sql("SELECT graft_est_jaccard(array(1L,2L,3L), array(1L,2L,4L)) j")
      .as[Double].head() shouldBe (2.0 / 3.0) +- 1e-12
    spark.sql("SELECT graft_lev_norm_sim('hello', 'yello') d")
      .as[Double].head() shouldBe Gram.levenshteinNorm("hello", "yello") +- 1e-12
    // fused_keys: 2 band keys (ktype 0) + 4 simhash chunk keys (ktype 1)
    val kinds = spark.sql(
      "SELECT ktype, count(*) n FROM (SELECT inline(graft_fused_keys(array(11L, 22L), 42L)))" +
        " GROUP BY ktype ORDER BY ktype")
      .as[(Int, Long)].collect().toSeq
    kinds shouldBe Seq((0, 2L), (1, 4L))
  }

  test("the extension class applies its descriptions without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("non-literal config arguments are rejected with a named-argument error") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception](
      spark.sql("SELECT graft_shingles('ab', CAST(id AS INT)) FROM range(1)").collect())
    // the builder's message survives inside Spark's analysis wrapper
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    messages(ex).mkString("\n") should include("must be an INT literal")
  }
}
