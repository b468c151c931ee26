package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Index-state, dot-product, and end-to-end scoring goldens ported from
  * `/root/reference/test/Spec.hs` (layers 2-5). Floating-point compared at
  * 1e-9 (the reference uses ieee754 ~==, test/Helpers.hs:17-21).
  */
class FuzzySetRefSpec extends AnyFunSuite with Matchers {
  private val eps = 1e-9

  private def mag(set: FuzzySetRef, n: Int, p: Int): Double =
    set.items(n)(p).vectorMagnitude

  private def dictEntry(set: FuzzySetRef, gram: String): List[(Int, Int)] =
    set.matchDict.getOrElse(gram, Nil).map(gi => (gi.itemIndex, gi.gramCount)).sorted

  private def checkScores(actual: List[(Double, String)], expected: List[(Double, String)]): Unit = {
    val scoresOnly = actual.map(_._1)
    scoresOnly.zip(scoresOnly.drop(1)).foreach { case (a, b) => a should be >= b }
    actual.length shouldBe expected.length
    actual.sortBy(_._2).zip(expected.sortBy(_._2)).foreach { case ((s, v), (es, ev)) =>
      v shouldBe ev
      s shouldBe es +- eps
    }
  }

  private val detectives = FuzzySetRef.defaultSet.addMany(Seq(
    "Bruce Wayne", "Charlie Chan", "Frank Columbo", "Hercule Poirot",
    "Jane Marple", "Lisbeth Salander", "Nancy Drew", "Nero Wolfe",
    "Perry Mason", "Philip Marlowe", "Sherlock Holmes"))

  private val states = Seq(
    "Alabama", "Alaska", "American Samoa", "Arizona", "Arkansas",
    "California", "Colorado", "Connecticut", "Delaware", "District of Columbia",
    "Florida", "Georgia", "Guam", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky",
    "Louisiana", "Maine", "Maryland", "Massachusetts", "Michigan",
    "Minnesota", "Mississippi", "Missouri", "Montana", "Nebraska",
    "Nevada", "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Northern Marianas Islands", "Ohio", "Oklahoma",
    "Oregon", "Pennsylvania", "Puerto Rico", "Rhode Island", "South Carolina",
    "South Dakota", "Tennessee", "Texas", "Utah", "Vermont",
    "Virginia", "Virgin Islands", "Washington", "West Virginia", "Wisconsin",
    "Wyoming")

  private val testset1 = FuzzySetRef.defaultSet
    .addMany(Seq("Trent", "restaurant", "aunt", "Smarty Pants"))
  private val testset2 = testset1.add("cat")
  private val testset3 = testset2.add("polymorphic")
  private val testset4 = FuzzySetRef.emptySet(2, 3, useLevenshtein = false)
    .addMany(Seq("Alaska", "Alabama", "Guam"))
  private val testset5 = FuzzySetRef.emptySet(2, 3, useLevenshtein = false).addMany(states)
  private val testset6 = FuzzySetRef.defaultSet.addMany(states)
  private val testset7 = FuzzySetRef.emptySet(2, 4, useLevenshtein = true).addMany(states)

  // --- Layer 2: index-state goldens -------------------------------------

  test("addToSet 'aFl1pP!.,nG FL0^ppy+' (Spec.hs:381-393)") {
    val (changed, set) = FuzzySetRef.defaultSet.addToSet("aFl1pP!.,nG FL0^ppy+")
    changed shouldBe true
    set.exactSet shouldBe Map("afl1pp!.,ng fl0^ppy+" -> "aFl1pP!.,nG FL0^ppy+")
    mag(set, 2, 0) shouldBe 4.58257569495584 +- eps
    mag(set, 3, 0) shouldBe 4.0 +- eps
    dictEntry(set, "-a") shouldBe List((0, 1))
    dictEntry(set, "ng") shouldBe List((0, 1))
    dictEntry(set, "fl") shouldBe List((0, 2))
    dictEntry(set, "pp") shouldBe List((0, 2))
    dictEntry(set, "g ") shouldBe List((0, 1))
    dictEntry(set, "xx") shouldBe Nil
  }

  test("addToSet 'Trent' (Spec.hs:395-402)") {
    val (changed, set) = FuzzySetRef.defaultSet.addToSet("Trent")
    changed shouldBe true
    set.exactSet shouldBe Map("trent" -> "Trent")
    mag(set, 2, 0) shouldBe 2.449489742783178 +- eps
    mag(set, 3, 0) shouldBe 2.23606797749979 +- eps
    dictEntry(set, "en") shouldBe List((0, 1))
  }

  test("add Trent, tent (Spec.hs:404-415)") {
    val set = FuzzySetRef.defaultSet.add("Trent").add("tent")
    set.exactSet shouldBe Map("trent" -> "Trent", "tent" -> "tent")
    mag(set, 2, 0) shouldBe 2.449489742783178 +- eps
    mag(set, 2, 1) shouldBe 2.23606797749979 +- eps
    mag(set, 3, 0) shouldBe 2.23606797749979 +- eps
    mag(set, 3, 1) shouldBe 2.0 +- eps
    dictEntry(set, "en") shouldBe List((0, 1), (1, 1))
    dictEntry(set, "ent") shouldBe List((0, 1), (1, 1))
    dictEntry(set, "ten") shouldBe List((1, 1))
    dictEntry(set, "-t") shouldBe List((0, 1), (1, 1))
  }

  test("add Trent, tent, restaurant (Spec.hs:417-453)") {
    val set = FuzzySetRef.defaultSet.add("Trent").add("tent").add("restaurant")
    set.exactSet shouldBe Map(
      "trent" -> "Trent", "tent" -> "tent", "restaurant" -> "restaurant")
    mag(set, 2, 2) shouldBe 3.3166247903554 +- eps
    mag(set, 3, 2) shouldBe 3.1622776601683795 +- eps
    dictEntry(set, "tau") shouldBe List((2, 1))
    dictEntry(set, "nt-") shouldBe List((0, 1), (1, 1), (2, 1))
    dictEntry(set, "re") shouldBe List((0, 1), (2, 1))
    dictEntry(set, "-tr") shouldBe List((0, 1))
    dictEntry(set, "nt") shouldBe List((0, 1), (1, 1), (2, 1))
    dictEntry(set, "ant") shouldBe List((2, 1))
    dictEntry(set, "ren") shouldBe List((0, 1))
  }

  test("add ... xRftAntnt,!tnRant (Spec.hs:455-524)") {
    val set = FuzzySetRef.defaultSet
      .add("Trent").add("tent").add("restaurant").add("xRftAntnt,!tnRant")
    set.exactSet shouldBe Map(
      "trent" -> "Trent", "tent" -> "tent", "restaurant" -> "restaurant",
      "xrftantnt,!tnrant" -> "xRftAntnt,!tnRant")
    mag(set, 2, 3) shouldBe 5.196152422706632 +- eps
    mag(set, 3, 3) shouldBe 4.242640687119285 +- eps
    dictEntry(set, "ran") shouldBe List((2, 1), (3, 1))
    dictEntry(set, "an") shouldBe List((2, 1), (3, 2))
    dictEntry(set, "ant") shouldBe List((2, 1), (3, 2))
    dictEntry(set, "nt") shouldBe List((0, 1), (1, 1), (2, 1), (3, 3))
    dictEntry(set, "tn") shouldBe List((3, 2))
    dictEntry(set, "nt-") shouldBe List((0, 1), (1, 1), (2, 1), (3, 1))
    dictEntry(set, "t,t") shouldBe List((3, 1))
    dictEntry(set, ",tn") shouldBe List((3, 1))
    dictEntry(set, "t-") shouldBe List((0, 1), (1, 1), (2, 1), (3, 1))
  }

  test("custom gram range 3-4 (Spec.hs:526-570)") {
    val set = FuzzySetRef.emptySet(3, 4, useLevenshtein = true)
      .add("Trent").add("pants").add("restaurant").add("XrF,!TNrATaNTNTNT")
    set.exactSet shouldBe Map(
      "trent" -> "Trent", "pants" -> "pants", "restaurant" -> "restaurant",
      "xrf,!tnratantntnt" -> "XrF,!TNrATaNTNTNT")
    mag(set, 3, 0) shouldBe 2.23606797749979 +- eps
    mag(set, 3, 3) shouldBe 4.47213595499958 +- eps
    mag(set, 4, 2) shouldBe 3.0 +- eps
    mag(set, 4, 3) shouldBe 4.123105625617661 +- eps
    dictEntry(set, "ntnt") shouldBe List((3, 2))
    dictEntry(set, "ant") shouldBe List((1, 1), (2, 1), (3, 1))
    dictEntry(set, "nt-") shouldBe List((0, 1), (2, 1), (3, 1))
    dictEntry(set, "ants") shouldBe List((1, 1))
    dictEntry(set, "-xrf") shouldBe List((3, 1))
    set.items.keySet shouldBe Set(3, 4)
  }

  test("custom gram range 2-5 (Spec.hs:572-630)") {
    val set = FuzzySetRef.emptySet(2, 5, useLevenshtein = true)
      .add("Trent").add("restaurant").add("aunt").add("Smarty Pants")
      .add("XrF,!TNrATaNTNTNT")
    mag(set, 2, 4) shouldBe 5.385164807134504 +- eps
    mag(set, 3, 3) shouldBe 3.4641016151377544 +- eps
    mag(set, 4, 2) shouldBe 1.7320508075688772 +- eps
    mag(set, 5, 0) shouldBe 1.7320508075688772 +- eps
    mag(set, 5, 4) shouldBe 3.7416573867739413 +- eps
    dictEntry(set, "pant") shouldBe List((3, 1))
    dictEntry(set, "ty p") shouldBe List((3, 1))
    dictEntry(set, "tntnt") shouldBe List((4, 1))
    dictEntry(set, "tn") shouldBe List((4, 3))
    dictEntry(set, "nt") shouldBe List((0, 1), (1, 1), (2, 1), (3, 1), (4, 3))
  }

  // --- Layer 3: dot-product goldens --------------------------------------

  private def matchesByEntry(set: FuzzySetRef, probe: String, n: Int): List[(String, Int)] =
    set.matches(Gram.gramVector(probe, n)).toList
      .map { case (i, c) => (set.items(n)(i).normalizedEntry, c) }
      .sortBy(_._1)

  test("matches detectives Watson/Gumshoe (Spec.hs:213-219)") {
    set0(detectives.matches(Gram.gramVector("watson", 2))) shouldBe Map(0 -> 1, 1 -> 1, 8 -> 3)
    set0(detectives.matches(Gram.gramVector("watson", 3))) shouldBe Map(8 -> 2)
    set0(detectives.matches(Gram.gramVector("gumshoe", 2))) shouldBe
      Map(0 -> 1, 2 -> 1, 4 -> 1, 7 -> 1, 9 -> 1, 10 -> 2)
  }
  private def set0(m: Map[Int, Int]): Map[Int, Int] = m

  test("matchDict detectives entries (Spec.hs:221-245)") {
    dictEntry(detectives, "olm") should contain((10, 1))
    dictEntry(detectives, "-n") should (contain((6, 1)) and contain((7, 1)))
    dictEntry(detectives, "y ") should (contain((6, 1)) and contain((8, 1)))
    dictEntry(detectives, "wa") should contain((0, 1))
    dictEntry(detectives, "ne") should (contain((0, 1)) and contain((4, 1)) and contain((7, 1)))
    dictEntry(detectives, "ch") should contain((1, 2))
    dictEntry(detectives, "cha") should contain((1, 2))
  }

  test("matches testsets (Spec.hs:680-704)") {
    matchesByEntry(testset1, "ant", 3) shouldBe
      List(("aunt", 1), ("restaurant", 2), ("smarty pants", 1), ("trent", 1))
    matchesByEntry(testset1, "pant", 3) shouldBe
      List(("aunt", 1), ("restaurant", 2), ("smarty pants", 2), ("trent", 1))
    matchesByEntry(testset1, "pants", 3) shouldBe
      List(("restaurant", 1), ("smarty pants", 4))
    matchesByEntry(testset1, "tre", 3) shouldBe List(("trent", 2))
    matchesByEntry(testset1, "xxx", 3) shouldBe Nil
    matchesByEntry(testset1, "xxx", 2) shouldBe Nil
    matchesByEntry(testset1, "tsap", 3) shouldBe Nil
    matchesByEntry(testset1, "tsap", 2) shouldBe List(("smarty pants", 1), ("trent", 1))
    matchesByEntry(testset2, "hat", 3) shouldBe List(("cat", 1))
    matchesByEntry(testset2, "anthropology", 3) shouldBe
      List(("restaurant", 1), ("smarty pants", 1))
    matchesByEntry(testset2, "spot", 3) shouldBe Nil
    matchesByEntry(testset2, "spot", 2) shouldBe List(
      ("aunt", 1), ("cat", 1), ("restaurant", 1), ("smarty pants", 1), ("trent", 1))
    matchesByEntry(testset2, "axiom", 2) shouldBe List(("aunt", 1))
    matchesByEntry(testset3, "moped", 2) shouldBe List(("polymorphic", 1))
    matchesByEntry(FuzzySetRef.defaultSet.add("bananas"), "ananas", 3) shouldBe
      List(("bananas", 7))
    matchesByEntry(FuzzySetRef.defaultSet.add("banana"), "ananas", 3) shouldBe
      List(("banana", 5))
    matchesByEntry(testset6, "land", 3) shouldBe List(
      ("maryland", 3), ("northern marianas islands", 2), ("rhode island", 3),
      ("virgin islands", 2))
    matchesByEntry(testset6, "new", 3) shouldBe List(
      ("nebraska", 1), ("nevada", 1), ("new hampshire", 2), ("new jersey", 2),
      ("new mexico", 2), ("new york", 2))
  }

  // --- Layer 4: end-to-end scoring goldens --------------------------------

  test("getMatches detectives 'Gumshoe' with Levenshtein (Spec.hs:180-187,204-205)") {
    checkScores(detectives.getMatches("gumshoe", 0, 2), List(
      (0.2142857142857143, "Philip Marlowe"),
      (0.19999999999999996, "Sherlock Holmes"),
      (0.19999999999999996, "Nero Wolfe"),
      (0.18181818181818177, "Bruce Wayne"),
      (0.18181818181818177, "Jane Marple"),
      (0.07692307692307687, "Frank Columbo")))
  }

  test("getMatches detectives 'Gumshoe' without Levenshtein (Spec.hs:171-178,207-211)") {
    val noLev = detectives.copy(useLevenshtein = false)
    checkScores(noLev.getMatches("gumshoe", 0, 2), List(
      (0.17677669529663687, "Sherlock Holmes"),
      (0.10660035817780521, "Nero Wolfe"),
      (0.10206207261596574, "Bruce Wayne"),
      (0.10206207261596574, "Jane Marple"),
      (0.0944911182523068, "Frank Columbo"),
      (0.09128709291752767, "Philip Marlowe")))
  }

  test("find goldens, useLevenshtein=false (Spec.hs:707-756)") {
    checkScores(testset4.find("flask"), List((0.3651483716701107, "Alaska")))
    checkScores(testset4.find("lambda"), List((0.40089186286863654, "Alabama")))
    checkScores(testset4.find("lambada"), List((0.5, "Alabama")))
    checkScores(testset4.find("alabama"), List((1.0, "Alabama")))
    checkScores(testset4.find("al"),
      List((0.4364357804719848, "Alaska"), (0.40824829046386296, "Alabama")))
    checkScores(testset4.find("albama"), List((0.6172133998483676, "Alabama")))
    checkScores(testset4.find("Alabaska"),
      List((0.7216878364870323, "Alaska"), (0.5345224838248487, "Alabama")))
    checkScores(testset5.find("homeland"), List((0.37499999999999994, "Maryland")))
    checkScores(testset5.find("connectedcut"), List((0.6963106238227914, "Connecticut")))
    checkScores(testset5.find("oregano"), List((0.4629100498862757, "Oregon")))
    checkScores(testset5.find("akeloxasas"), List(
      (0.4622501635210243, "Arkansas"), (0.45291081365783836, "Texas"),
      (0.4193139346887673, "Kansas")))
    checkScores(testset5.find("alaskansas"), List(
      (0.6454972243679029, "Kansas"), (0.6454972243679029, "Alaska"),
      (0.5590169943749475, "Arkansas")))
    checkScores(testset5.find("South"), List(
      (0.5163977794943222, "South Dakota"), (0.47809144373375745, "South Carolina")))
    checkScores(testset5.find("penicillivania"), List((0.46291004988627577, "Pennsylvania")))
    checkScores(testset5.find("Michisota"),
      List((0.4714045207910316, "Michigan"), (0.4444444444444444, "Minnesota")))
    checkScores(testset5.find("New Mix"), List(
      (0.47809144373375745, "New Mexico"), (0.40089186286863654, "New York"),
      (0.35856858280031806, "New Jersey")))
    checkScores(testset5.find("Waioming"), List((0.5345224838248487, "Wyoming")))
    checkScores(testset5.find("Landland"),
      List((0.5103103630798287, "Maryland"), (0.41666666666666674, "Rhode Island")))
  }

  test("find goldens, useLevenshtein=true (Spec.hs:779-809)") {
    checkScores(testset6.find("wyome"), List((0.5714285714285714, "Wyoming")))
    checkScores(testset6.find("Louisianaland"), List(
      (0.6923076923076923, "Louisiana"), (0.3846153846153846, "Maryland"),
      (0.3846153846153846, "Rhode Island"), (0.36, "Northern Marianas Islands")))
    checkScores(testset6.find("ia"), List((0.5, "Iowa"), (0.4, "Idaho")))
    checkScores(testset6.find("flaska"), List(
      (0.8333333333333334, "Alaska"), (0.5, "Nebraska"),
      (0.4285714285714286, "Florida")))
    checkScores(testset7.find("Alaskansas"), List(
      (0.7, "Arkansas"), (0.6, "Kansas"), (0.6, "Alaska"), (0.5, "Alabama")))
    checkScores(testset7.find("Transylvania"),
      List((0.75, "Pennsylvania"), (0.33333333333333337, "California")))
  }

  test("README doc examples (Simple.hs:84-140)") {
    val movies = FuzzySetRef.defaultSet.addMany(Seq("Jurassic Park", "Terminator", "The Matrix"))
    movies.closestMatch("percolator") shouldBe Some("Terminator")
    val scooby = FuzzySetRef.defaultSet
      .addMany(Seq("Shaggy Rogers", "Fred Jones", "Daphne Blake", "Velma Dinkley"))
    checkScores(scooby.find("Shaggy Jones"),
      List((0.7692307692307693, "Shaggy Rogers"), (0.5, "Fred Jones")))
    val st = FuzzySetRef.fromList(states)
    checkScores(st.find("Burger Islands"), List(
      (0.7142857142857143, "Virgin Islands"), (0.5714285714285714, "Rhode Island"),
      (0.44, "Northern Marianas Islands"), (0.35714285714285715, "Maryland")))
    checkScores(st.find("Why-oh-me-ing"), List((0.5384615384615384, "Wyoming")))
    checkScores(st.find("Connect a cat"), List((0.6923076923076923, "Connecticut")))
    checkScores(st.find("Transylvania"), List(
      (0.75, "Pennsylvania"), (0.3333333333333333, "California"),
      (0.3333333333333333, "Arkansas"), (0.3333333333333333, "Kansas")))
    checkScores(st.find("CanOfSauce"), List((0.4, "Kansas")))
    checkScores(st.find("Alaska"), List((1.0, "Alaska")))
    checkScores(st.find("Alaskanbraskansas"), List(
      (0.47058823529411764, "Arkansas"), (0.35294117647058826, "Kansas"),
      (0.35294117647058826, "Alaska"), (0.35294117647058826, "Alabama"),
      (0.35294117647058826, "Nebraska")))
  }

  // --- Layer 5: semantics/regression --------------------------------------

  test("crowding regression: 132/133 John Smiths vs take-50 rerank (Spec.hs:190-201)") {
    val names132 = FuzzySetRef.fromList(Seq.fill(132)("John Smith")).add("Joseph Dombrowski")
    names132.findMin(0.72, "Joe Dombrowski").length shouldBe 1
    val names133 = FuzzySetRef.fromList(Seq.fill(133)("John Smith")).add("Joseph Dombrowski")
    names133.findMin(0.72, "Joe Dombrowski").length shouldBe 1
    // The quirk itself: non-lowercase originals re-index every time
    names132.items(2).length shouldBe 133
    names132.size shouldBe 2
  }

  test("duplicate insert returns false (Spec.hs:671-673)") {
    FuzzySetRef.defaultSet.add("again").addToSet("again")._1 shouldBe false
  }

  test("exact match returns [(1.0, ...)] (Spec.hs:675-678)") {
    FuzzySetRef.defaultSet.add("xxx").find("xxx") shouldBe List((1.0, "xxx"))
  }

  test("values/size/isEmpty (Spec.hs:632-669)") {
    val set = FuzzySetRef.defaultSet.addMany(
      Seq("Trent", "restaurant", "aunt", "Smarty Pants", "XrF,!TNrATaNTNTNT"))
    set.values should contain allOf ("Trent", "restaurant", "aunt", "Smarty Pants", "XrF,!TNrATaNTNTNT")
    set.size shouldBe 5
    set.isEmpty shouldBe false
    FuzzySetRef.defaultSet.isEmpty shouldBe true
  }

  test("addManyToSet returns inserted sublist (Internal.hs:140-145)") {
    val (inserted, _) = FuzzySetRef.defaultSet.addManyToSet(Seq("bork", "bork", "cork"))
    inserted shouldBe List("bork", "cork")
  }
}
