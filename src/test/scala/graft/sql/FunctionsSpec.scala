package graft.sql

import graft.SparkTestSession
import graft.text.Gram
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity: the codegen'd column compositions must agree exactly with the
  * pure kernels (which are themselves golden-tested against the reference).
  */
class FunctionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fixtures = Seq(
    "charade", "xxx", "xxxx", "xxxxxxx", "bananasananas",
    "aFl1pP!.,nG FL0^ppy+", "XrF,!TNrATaNTNTNT", "Destroido Corp.",
    "Smarty Pants", "trentsauntsrestaurant",
    "buffalo buffalo buffalo buffalo buffalo buffalo",
    "café au lait", "", "!!!", "a", "ab",
    "tab\there", "comma, stays", "North Dakota",
    "math 𝐀 and 𠀡 stay, 😀 drops") // astral: \p{L} regex vs code-point kernel

  test("normText column == Gram.normalized") {
    val out = fixtures.toDF("s").select($"s", functions.normText($"s") as "n")
      .as[(String, String)].collect().toMap
    fixtures.foreach { s => out(s) shouldBe Gram.normalized(s) }
  }

  test("shingles column == Gram.grams for n=2..4") {
    (2 to 4).foreach { n =>
      val out = fixtures.toDF("s")
        .select($"s", functions.shingles($"s", n) as "g")
        .as[(String, Seq[String])].collect().toMap
      fixtures.foreach { s => out(s) shouldBe Gram.grams(s, n) }
    }
  }

  test("levNormSim column == Gram.levenshteinNorm (Spec.hs:758-771 pairs)") {
    val pairs = Seq(
      ("hello", "yello"), ("fellow", "yello"), ("propeller", "teller"),
      ("balloon", "electron"), ("technology", "logic"), ("sawa", "sawa"),
      ("fez", "baz"), ("", ""), ("", "abc"),
      // astral: Spark's levenshtein/length count code points — the kernel
      // must agree (one astral swap = ONE edit over length-3 strings)
      ("a𝐀b", "a𠀡b"), ("𝐀", "𝐀"))
    val out = pairs.toDF("a", "b")
      .select($"a", $"b", functions.levNormSim($"a", $"b") as "d")
      .as[(String, String, Double)].collect()
    out.foreach { case (a, b, d) =>
      d shouldBe Gram.levenshteinNorm(a, b) +- 1e-12
    }
  }

  test("h60 yields 60-bit non-negative longs, stable") {
    val out = fixtures.filter(_.nonEmpty).toDF("s")
      .select(functions.h60($"s", 1) as "h1", functions.h60($"s", 17) as "h2")
      .as[(Long, Long)].collect()
    out.foreach { case (h1, h2) =>
      h1 should be >= 0L; h1 should be < (1L << 60)
      h2 should be >= 0L; h2 should be < (1L << 60)
    }
  }

  test("minhashSig: identical sets agree, disjoint sets almost surely differ") {
    val df = Seq(
      ("a", Seq("ab", "bc", "cd")),
      ("b", Seq("cd", "ab", "bc", "ab")), // same SET as a (multiset differs)
      ("c", Seq("xy", "yz", "zw"))
    ).toDF("id", "grams")
      .select($"id", functions.minhashSig($"grams", 16) as "sig")
      .as[(String, Seq[Long])].collect().toMap
    df("a") shouldBe df("b")
    df("a") should not be df("c")
    df("a").foreach { v => v should be >= 0L; v should be < functions.HashP }
  }

  test("bandKeys: equal signatures give equal band keys; band count right") {
    val df = Seq(("a", Seq("ab", "bc", "cd")), ("b", Seq("ab", "bc", "cd")))
      .toDF("id", "grams")
      .select($"id",
        functions.bandKeys(functions.minhashSig($"grams", 12), 4, 3) as "bands")
      .as[(String, Seq[String])].collect().toMap
    df("a") shouldBe df("b")
    df("a").length shouldBe 4
    df("a").zipWithIndex.foreach { case (k, i) => k should startWith(s"$i:") }
  }

  test("simhash60: near-identical gram multisets land at small hamming distance") {
    val base = Gram.grams("the quick brown fox jumps over the lazy dog", 3)
    val near = Gram.grams("the quick brown fox jumps over the lazy dot", 3)
    val far = Gram.grams("completely unrelated text with other grams entirely", 3)
    val out = Seq(("base", base), ("near", near), ("far", far))
      .toDF("id", "grams")
      .select($"id", functions.simhash60($"grams") as "sh")
      .as[(String, Long)].collect().toMap
    out.values.foreach { v => v should be >= 0L; v should be < (1L << 60) }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    ham(out("base"), out("near")) should be < ham(out("base"), out("far"))
    ham(out("base"), out("near")) should be <= 12
  }

  test("PortableHash.sigAndSimhash == column expressions (minhashSig/simhash60)") {
    // inputs with at least one 3-gram (empty-normalized rows never get
    // signatures: IndexBuild filters them out before the LSH passes)
    val inputs = fixtures.filter(s => Gram.grams(s, 3).nonEmpty)
    val byExpr = inputs.toDF("s")
      .select($"s", functions.minhashSig(functions.shingles($"s", 3), 16) as "sig",
        functions.simhash60(functions.shingles($"s", 3)) as "sh")
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getLong(2))))
      .toMap
    inputs.foreach { s =>
      val grams = Gram.grams(s, 3)
      val (sig, sim) = PortableHash.sigAndSimhash(grams, 16)
      byExpr(s)._1 shouldBe sig.toSeq
      byExpr(s)._2 shouldBe sim
    }
  }

  test("estJaccard tracks true jaccard within sampling error") {
    val a = (1 to 60).map(i => s"g$i")
    val b = (31 to 90).map(i => s"g$i") // true J = 30/90 = 1/3
    val (sa, _) = PortableHash.sigAndSimhash(a, 128)
    val (sb, _) = PortableHash.sigAndSimhash(b, 128)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    est shouldBe (1.0 / 3.0) +- 0.15
    val out = Seq((a, b)).toDF("a", "b")
      .select(functions.estJaccard(
        functions.minhashSig($"a", 128), functions.minhashSig($"b", 128)) as "j")
      .as[Double].head()
    out shouldBe est +- 1e-12
  }

  test("sigBands (native expr) == PortableHash kernels, incl. multibyte and repeated grams") {
    val inputs: Seq[Seq[String]] = Seq(
      Seq("abc", "bcd", "abc", "cde"), // repeats: simhash weights the multiset
      Seq("hél", "wör", "hél"), // 2-byte UTF-8 (bytes-vs-String md5 parity)
      Seq("日本語", "語日本"), // 3-byte UTF-8
      Seq("x"))
    val df = inputs.zipWithIndex.map { case (g, i) => (i, g) }.toDF("i", "g").repartition(2)
    val q = df.select($"i", functions.sigBands($"g", 16, 4, 3).as("ss"))
      .select($"i", $"ss.sig", $"ss.simhash", $"ss.band_hashes")
    q.collect() // finalize AQE on THIS Dataset's QueryExecution
    val out = q.as[(Int, Seq[Long], Long, Seq[Long])].collect().sortBy(_._1)
    out.zip(inputs).foreach { case ((_, sig, sim, bh), grams) =>
      val (eSig, eSim) = PortableHash.sigAndSimhash(grams, 16)
      sig shouldBe eSig.toSeq
      sim shouldBe eSim
      bh shouldBe PortableHash.bandHashes(eSig, 4, 3).toSeq
    }
    // the kernel must stay inside whole-stage codegen
    q.queryExecution.executedPlan.toString should include("*(")
  }

  test("sigBandsFromKey (fused kernel) == sigBands(shingles(key)) on every key shape") {
    val keys = Seq(
      "alpha beta gamma", // plain ascii
      "Alpha, BETA gamma!", // normalization (case, punct drop, comma kept)
      "aaaaaaaa", // heavy repeats (distinct-set vs multiset split)
      "déjà vu naïve café", // 2-byte UTF-8 (per-window substring path)
      "中文字 mixed 字符", // 3-byte UTF-8
      "ab", // exactly one gram at n=3 after '-ab-' enclosure? (len 4 >= 3)
      "", // empty -> no grams -> NULL
      "!!!", // normalizes to empty -> '-'||''||'-' is len 2 < 3 -> NULL
      "x😀y", // astral NON-letter: dropped whole by normalization
      "a𝐀b 𠀡c" // astral LETTERS kept: windows are code points, never split
    )
    val df = keys.zipWithIndex.map { case (k, i) => (i, k) }.toDF("i", "key").repartition(2)
    val fused = df.select($"i",
      functions.sigBandsFromKey($"key", 3, 16, 4, 3).as("ss"))
    fused.collect() // finalize AQE before inspecting the plan
    val viaGrams = df.select($"i", functions.shingles($"key", 3).as("g"))
      .filter(org.apache.spark.sql.functions.size($"g") > 0)
      .select($"i", functions.sigBands($"g", 16, 4, 3).as("ss"))
    def rows(q: org.apache.spark.sql.DataFrame) = q
      .filter($"ss".isNotNull)
      .select($"i", $"ss.sig", $"ss.simhash", $"ss.band_hashes")
      .as[(Int, Seq[Long], Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val f = rows(fused)
    f shouldBe rows(viaGrams)
    // the two gram-less keys ("" and "!!!") are NULL in fused and filtered
    // by size() in the reference composition — same surviving id set
    f.map(_._1) shouldBe keys.indices.filterNot(i => keys(i) == "" || keys(i) == "!!!")
    // and the fused kernel stays inside whole-stage codegen
    fused.queryExecution.executedPlan.toString should include("*(")
  }

  test("gram-less rows: sigBands is NULL, minhash folds to the MaxValue identity") {
    // a constant all-MaxValue signature on every empty row would put all
    // of them in ONE LSH bucket per band (quadratic); the SQL surface
    // reaches sigBands without the index build's size(grams) > 0 guard
    val df = Seq(
      (0, Option.empty[Seq[String]]), // NULL input stays NULL, not identity
      (1, Some(Seq.empty[String])),
      (2, Some(Seq("-ab-", "ab-x")))).toDF("i", "g")
      .repartition(2)
    val out = df.select($"i",
      functions.sigBands($"g", 8, 4, 2).as("ss"),
      functions.minhashFromHashes(functions.gramHashPairs($"g"), 8).as("mh"))
      .collect().sortBy(_.getInt(0))
    out(0).isNullAt(1) shouldBe true
    out(0).isNullAt(2) shouldBe true
    out(1).isNullAt(1) shouldBe true
    // == PortableHash.SigState's fold identity for zero grams
    out(1).getSeq[Long](2) shouldBe Seq.fill(8)(Long.MaxValue)
    out(2).isNullAt(1) shouldBe false
    out(2).getSeq[Long](2).exists(_ != Long.MaxValue) shouldBe true
  }

  test("estJaccard counts a null component as unequal (zip_with null parity)") {
    import org.apache.spark.sql.{functions => F}
    val df = Seq((
      Seq[Option[Long]](Some(1L), None, Some(3L), None),
      Seq[Option[Long]](Some(1L), None, Some(4L), Some(5L)))).toDF("a", "b")
    // idx0 equal; idx1 null-vs-null is UNEQUAL (getLong on a null slot
    // reads garbage-as-0 and would silently over-estimate); idx2/3 unequal
    val out = df.select(functions.estJaccard($"a", $"b").as("native"),
      (F.aggregate(F.zip_with($"a", $"b", (x, y) => F.when(x === y, 1).otherwise(0)),
        F.lit(0), (acc, x) => acc + x).cast("double") / F.size($"a")).as("hof"))
      .as[(Double, Double)].collect()(0)
    out._1 shouldBe 0.25 +- 1e-12
    out._1 shouldBe out._2 +- 1e-12
  }

  test("estJaccard (native expr) matches the HOF column formula it replaced") {
    import org.apache.spark.sql.{functions => F}
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50) {
      val a = Array.fill(128)(rnd.nextLong() % 1000)
      // ~40% shared components + a null-free independent remainder
      val b = a.zipWithIndex.map { case (x, i) => if (i % 5 < 2) x else rnd.nextLong() % 1000 }
      (a.toSeq, b.toSeq)
    }
    val df = rows.toDF("a", "b")
    val hof = F.aggregate(
      F.zip_with($"a", $"b", (x, y) => F.when(x === y, 1).otherwise(0)),
      F.lit(0), (acc, x) => acc + x).cast("double") / F.size($"a")
    val out = df.select(functions.estJaccard($"a", $"b").as("native"), hof.as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => n shouldBe h +- 1e-12 }
    // the whole point of the native form: it must stay inside codegen
    // (repartition first — a pure LocalTableScan constant-folds the
    // projection at the driver and shows no codegen span either way; run
    // the query so AQE finalizes before inspecting the executed plan)
    val q = df.repartition(2).select(functions.estJaccard($"a", $"b"))
    q.collect()
    q.queryExecution.executedPlan.toString should include("*(")
    // defensive semantics on a length mismatch: count over the overlap,
    // divide by the LEFT length (zip_with padded the tail with null=unequal)
    Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(functions.estJaccard($"a", $"b"))
      .as[Double].head() shouldBe 0.5 +- 1e-12
  }

  test("rollingFingerprint: deterministic, order-sensitive, empty -> 0") {
    val out = Seq("abc", "acb", "abc", "").toDF("s")
      .select($"s", functions.rollingFingerprint($"s") as "fp")
      .as[(String, Long)].collect()
    val m = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    m("abc").length shouldBe 1
    m("abc").head should not be m("acb").head
    m("").head shouldBe 0L
    // cross-check the arithmetic against a driver-side fold
    val expected = "abc".foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % functions.HashP)
    m("abc").head shouldBe expected
  }

  test("cosineSim matches driver-side double fold") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(0.5f, -1.0f, 2.0f)
    val out = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(functions.cosineSim($"a", $"b") as "c").as[Double].head()
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
    val exp = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    out shouldBe exp +- 1e-12
  }
}
