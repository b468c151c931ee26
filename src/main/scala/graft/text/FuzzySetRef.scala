package graft.text

/** In-memory, single-node implementation with EXACTLY the reference's
  * semantics (`/root/reference/src/Data/FuzzySet/Internal.hs` +
  * `Simple.hs`), including its dedup quirk. Two jobs:
  *
  *  1. the oracle the distributed pipeline's recall tests compare against
  *     (FIXTURES.md §B: "reference-semantics oracle"), and
  *  2. the carrier of the reference test-suite goldens (Spec.hs), which pin
  *     the kernels before anything is distributed.
  *
  * Immutable: every insert returns a new value, mirroring the reference's
  * purely functional state threading (Internal.hs:108-138).
  */
final case class FuzzySetItem(vectorMagnitude: Double, normalizedEntry: String)
final case class GramInfo(itemIndex: Int, gramCount: Int)

final case class FuzzySetRef(
    exactSet: Map[String, String],
    matchDict: Map[String, List[GramInfo]],
    items: Map[Int, Vector[FuzzySetItem]],
    gramSizeLower: Int,
    gramSizeUpper: Int,
    useLevenshtein: Boolean
) {
  import FuzzySetRef.Match

  /** Insert one string (Internal.hs:108-138). Returns (inserted?, newSet).
    *
    * Bug-compat note (SURVEY.md §2.1): the reference's duplicate check is
    * `key `elem` exactSet` (Internal.hs:111) which — HashMap being Foldable
    * over VALUES — compares the lowercased key against stored ORIGINALS.
    * Reproduced verbatim so the crowding goldens (Spec.hs:190-201) hold.
    */
  def addToSet(str: String): (Boolean, FuzzySetRef) = {
    val key = str.toLowerCase(java.util.Locale.ROOT)
    if (exactSet.valuesIterator.contains(key)) (false, this)
    else {
      var items1 = items
      var dict1 = matchDict
      (gramSizeLower to gramSizeUpper).foreach { size =>
        val itemVector = items1.getOrElse(size, Vector.empty)
        val gv = Gram.gramVector(key, size)
        val idx = itemVector.length
        // Haskell: HashMap.insertWith (<>) gram [info] PREPENDS the new
        // postings list; order is irrelevant downstream (tests sort).
        gv.foreach { case (gram, count) =>
          dict1 = dict1.updated(gram, GramInfo(idx, count) :: dict1.getOrElse(gram, Nil))
        }
        val item = FuzzySetItem(Gram.norm(gv.values), key)
        items1 = items1.updated(size, itemVector :+ item)
      }
      (true, copy(exactSet = exactSet.updated(key, str), matchDict = dict1, items = items1))
    }
  }

  def add(str: String): FuzzySetRef = addToSet(str)._2
  def addMany(strs: Seq[String]): FuzzySetRef = strs.foldLeft(this)(_.add(_))

  /** Which of `strs` were actually inserted (Internal.hs:140-145). */
  def addManyToSet(strs: Seq[String]): (List[String], FuzzySetRef) =
    strs.foldLeft((List.empty[String], this)) { case ((acc, set), s) =>
      val (ins, set1) = set.addToSet(s)
      (if (ins) s :: acc else acc, set1)
    } match { case (acc, set) => (acc.reverse, set) }

  /** Sparse dot product via the inverted index (Internal.hs:67-74). */
  def matches(queryVector: Map[String, Int]): Map[Int, Int] = {
    val acc = scala.collection.mutable.HashMap.empty[Int, Int]
    queryVector.foreach { case (gram, count) =>
      matchDict.get(gram).foreach(_.foreach { gi =>
        acc.update(gi.itemIndex, acc.getOrElse(gi.itemIndex, 0) + gi.gramCount * count)
      })
    }
    acc.toMap
  }

  /** Full scoring for one (query, gramSize) (Internal.hs:76-106).
    * `str` must already be the lowercased key (findMin lowercases,
    * Simple.hs:186). Ties broken by entry for determinism — the reference
    * leaves tie order to HashMap fold order (SURVEY.md §2.5), and its own
    * tests sort by entry before comparing (Spec.hs:136).
    */
  def getMatches(str: String, minScore: Double, gramSize: Int): List[Match] = {
    val queryVector = Gram.gramVector(str, gramSize)
    val queryMagnitude = Gram.norm(queryVector.values)
    val itemsVector = items.getOrElse(gramSize, Vector.empty)
    val cosine = matches(queryVector).toList.flatMap { case (index, score) =>
      itemsVector.lift(index).map { item =>
        (score.toDouble / (queryMagnitude * item.vectorMagnitude), item.normalizedEntry)
      }
    }
    val sorted = cosine.sortBy { case (s, e) => (-s, e) }
    val results =
      if (useLevenshtein)
        sorted
          .take(50)
          .map { case (_, entry) => (Gram.levenshteinNorm(str, entry), entry) }
          .sortBy { case (s, e) => (-s, e) }
      else sorted
    results
      .filter(_._1 >= minScore)
      .map { case (s, entry) => (s, exactSet.getOrElse(entry, "")) }
  }

  /** Exact short-circuit, then gram-size cascade upper -> lower
    * (Simple.hs:176-186).
    */
  def findMin(minScore: Double, str: String): List[Match] = {
    val key = str.toLowerCase(java.util.Locale.ROOT)
    exactSet.get(key) match {
      case Some(exact) => List((1.0, exact))
      case None =>
        gramSizeUpper
          .to(gramSizeLower, -1)
          .iterator
          .map(size => getMatches(key, minScore, size))
          .find(_.nonEmpty)
          .getOrElse(Nil)
    }
  }

  def find(str: String): List[Match] = findMin(0.33, str)
  def findOneMin(minScore: Double, str: String): Option[Match] =
    findMin(minScore, str).headOption
  def findOne(str: String): Option[Match] = findOneMin(0.33, str)
  def closestMatchMin(minScore: Double, str: String): Option[String] =
    findOneMin(minScore, str).map(_._2)
  def closestMatch(str: String): Option[String] = findOne(str).map(_._2)

  def values: List[String] = exactSet.values.toList
  def size: Int = exactSet.size
  def isEmpty: Boolean = exactSet.isEmpty
}

object FuzzySetRef {
  /** (score, matched original) — Internal.hs:65. */
  type Match = (Double, String)

  def emptySet(gramLo: Int, gramHi: Int, useLevenshtein: Boolean): FuzzySetRef =
    FuzzySetRef(Map.empty, Map.empty, Map.empty, gramLo, gramHi, useLevenshtein)

  /** `defaultSet` = emptySet 2 3 True (Simple.hs:160-161). */
  def defaultSet: FuzzySetRef = emptySet(2, 3, useLevenshtein = true)

  def fromList(strs: Seq[String]): FuzzySetRef = defaultSet.addMany(strs)
}
