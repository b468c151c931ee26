package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Kernel goldens ported from `/root/reference/test/Spec.hs` (layer 1:
  * grams / gramVector / norm / enclosedIn / distance).
  */
class GramSpec extends AnyFunSuite with Matchers {
  private val eps = 1e-9

  test("grams count invariant: len = s - n + 3 for 'charade', n=2..6 (Spec.hs:29-43,256)") {
    val s = "charade".length
    (2 to 6).foreach { n =>
      val g = Gram.grams("charade", n)
      g.length shouldBe (s - n + 3)
      g.foreach(_.length shouldBe n)
    }
  }

  test("grams throws when n < 2 (Spec.hs:257-258, Internal.hs:193)") {
    an[IllegalArgumentException] should be thrownBy Gram.grams("anything", 1)
  }

  test("grams 'charade' 2/3 (Spec.hs:260-262)") {
    Gram.grams("charade", 2) shouldBe Seq("-c", "ch", "ha", "ar", "ra", "ad", "de", "e-")
    Gram.grams("charade", 3) shouldBe Seq("-ch", "cha", "har", "ara", "rad", "ade", "de-")
  }

  test("grams normalization fixture 'aFl1pP!.,nG FL0^ppy+' 2 (Spec.hs:263-283)") {
    Gram.grams("aFl1pP!.,nG FL0^ppy+", 2) shouldBe Seq(
      "-a", "af", "fl", "l1", "1p", "pp", "p,", ",n", "ng", "g ",
      " f", "fl", "l0", "0p", "pp", "py", "y-")
  }

  test("gramVector goldens (Spec.hs:285-310)") {
    Gram.gramVector("xxx", 2) shouldBe Map("-x" -> 1, "xx" -> 2, "x-" -> 1)
    Gram.gramVector("xxx", 3) shouldBe Map("-xx" -> 1, "xx-" -> 1, "xxx" -> 1)
    Gram.gramVector("xxxxxxx", 4) shouldBe Map("-xxx" -> 1, "xxxx" -> 4, "xxx-" -> 1)
    Gram.gramVector("bananasananas", 2) shouldBe Map(
      "-b" -> 1, "ba" -> 1, "an" -> 4, "na" -> 4, "as" -> 2, "sa" -> 1, "s-" -> 1)
    Gram.gramVector("bananasananas", 3) shouldBe Map(
      "-ba" -> 1, "ban" -> 1, "ana" -> 4, "nan" -> 2, "nas" -> 2,
      "asa" -> 1, "san" -> 1, "as-" -> 1)
  }

  test("gramVector key goldens (Spec.hs:312-379)") {
    def k(s: String, n: Int, kvs: (String, Int)*): Unit = {
      val gv = Gram.gramVector(s, n)
      kvs.foreach { case (key, v) => gv.getOrElse(key, 0) shouldBe v }
    }
    k("trentsauntsrestaurant", 2, "nt" -> 3, "au" -> 2, "ts" -> 2, "re" -> 2, "st" -> 1, "en" -> 1)
    k("trentsauntsrestaurant", 3, "res" -> 1, "nts" -> 2)
    k("trentsantwantstorentpants", 3,
      "pan" -> 1, "twa" -> 1, "ant" -> 3, "ren" -> 2, "ent" -> 2, "nts" -> 3)
    k("trentsantwantstorentpantstostartrestaurant", 3,
      "ant" -> 4, "nts" -> 3, "sto" -> 2, "sta" -> 2, "ren" -> 2, "tre" -> 2)
    k("trentsantwantstorentpantstostartrestaurant", 2,
      "an" -> 4, "st" -> 4, "re" -> 3, "ts" -> 3, "en" -> 2, "to" -> 2,
      "tr" -> 2, "or" -> 1, "au" -> 1, "ur" -> 1)
    k("antsintrentspantswanttrentsauntsrestaurant", 3, "nts" -> 5, "ant" -> 4, "ent" -> 2)
    k("asmartantintrentspantswantstorenttrentsauntsrestaurant", 3,
      "nts" -> 5, "ant" -> 4, "ent" -> 3)
    k("buffalo buffalo buffalo buffalo buffalo buffalo", 7, "buffalo" -> 6)
  }

  test("gramVector doc example 'xxxx' 2 (Internal.hs:151-157)") {
    Gram.gramVector("xxxx", 2) shouldBe Map("-x" -> 1, "xx" -> 3, "x-" -> 1)
    Gram.grams("xxxx", 2) shouldBe Seq("-x", "xx", "xx", "xx", "x-")
  }

  test("norm [2,4,3,3,3,3,2,3,2,2,2] == 9 (Spec.hs:247-249)") {
    Gram.norm(Seq(2, 4, 3, 3, 3, 3, 2, 3, 2, 2, 2)) shouldBe 9.0 +- eps
  }

  test("enclosedIn 'covfefe' 'o' (Spec.hs:251-253)") {
    Gram.enclosedIn("covfefe", 'o') shouldBe "ocovfefeo"
  }

  test("levenshteinNorm goldens (Spec.hs:758-771)") {
    val cases = Seq(
      ("hello", "yello", 0.8), ("fellow", "yello", 0.6666666666666667),
      ("fellow", "yellow", 0.8333333333333334), ("propeller", "yellow", 0.33333333333333337),
      ("propeller", "teller", 0.5555555555555556), ("balloon", "spoon", 0.4285714285714286),
      ("balloon", "electron", 0.25), ("spectrum", "electron", 0.5),
      ("spectrum", "techno", 0.25), ("technology", "techno", 0.6),
      ("technology", "logic", 0.19999999999999996), ("toxic", "logic", 0.6),
      ("sawa", "sawa", 1.0), ("fez", "baz", 0.33333333333333337))
    cases.foreach { case (a, b, d) => Gram.levenshteinNorm(a, b) shouldBe d +- eps }
    Gram.levenshteinNorm("", "") shouldBe 1.0
  }

  test("normalized keeps alnum/space/comma, lowercases (Internal.hs:204-211)") {
    Gram.normalized("aFl1pP!.,nG FL0^ppy+") shouldBe "afl1pp,ng fl0ppy"
    Gram.normalized("Destroido Corp.") shouldBe "destroido corp"
  }

  test("normalized iterates by code point (reference Char IS a code point)") {
    // supplementary-plane LETTERS survive: U+1D400 MATHEMATICAL BOLD
    // CAPITAL A (Lu, no lowercase mapping), U+20021 CJK Ext-B (Lo) —
    // GHC's isAlphaNum keeps both; a per-Char loop would classify each
    // surrogate half as category Cs and drop them
    Gram.normalized("a𝐀b") shouldBe "a𝐀b"
    Gram.normalized("x𠀡y") shouldBe "x𠀡y"
    // non-alphanumeric astral (emoji U+1F600, So) dropped whole
    Gram.normalized("x😀y") shouldBe "xy"
    // a LONE surrogate half is category Cs -> dropped, as before
    Gram.normalized("x\uD835y") shouldBe "xy"
    // gram windows are n CODE POINTS and never split a surrogate pair
    Gram.grams("a𝐀b", 3) shouldBe Vector("-a𝐀", "a𝐀b", "𝐀b-")
    // levenshtein edits code points: swapping one astral char is ONE edit
    Gram.levenshtein("a𝐀b", "a𠀡b") shouldBe 1
    Gram.levenshteinNorm("a𝐀b", "a𠀡b") shouldBe (1.0 - 1.0 / 3) +- 1e-12
  }
}

/** Property layer (SURVEY.md §5 engine test plan (b)); seeded random
  * inputs for determinism (scalatestplus bridge is not in the offline
  * cache, so plain loops instead of scalacheck's runner).
  */
class GramPropSpec extends AnyFunSuite with Matchers {
  private val rng = new scala.util.Random(42L)
  private val alphabet = "abcdefghijklmnopqrstuvwxyzABC0123 ,.!+^"
  private def randText(): String =
    Seq.fill(rng.nextInt(30))(alphabet(rng.nextInt(alphabet.length))).mkString

  test("gram count invariant: |grams(s,n)| = |normalized(s)| - n + 3 when non-negative") {
    (1 to 300).foreach { _ =>
      val s = randText(); val n = 2 + rng.nextInt(4)
      val expected = Gram.normalized(s).length - n + 3
      Gram.grams(s, n).length shouldBe math.max(expected, 0)
    }
  }

  test("gramVector total count equals grams length") {
    (1 to 300).foreach { _ =>
      val s = randText(); val n = 2 + rng.nextInt(3)
      Gram.gramVector(s, n).values.sum shouldBe Gram.grams(s, n).length
    }
  }

  test("levenshteinNorm is in [0,1], 1 if equal") {
    (1 to 300).foreach { _ =>
      val a = randText(); val b = randText()
      val d = Gram.levenshteinNorm(a, b)
      d should be >= 0.0
      d should be <= 1.0
      Gram.levenshteinNorm(a, a) shouldBe 1.0
    }
  }
}
