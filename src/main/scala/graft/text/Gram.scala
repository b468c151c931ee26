package graft.text

/** Pure text kernels, semantics-equal to the reference's
  * `Data.FuzzySet.Internal` / `Data.FuzzySet.Utils`
  * (`/root/reference/src/Data/FuzzySet/Internal.hs:161-232`,
  * `/root/reference/src/Data/FuzzySet/Utils.hs:26-30`).
  *
  * These run driver-side in tests as the in-memory oracle and executor-side
  * inside UDFs where the column-function composition can't express the exact
  * semantics. Everything here is allocation-light and deterministic.
  */
object Gram {

  /** Haskell `Data.Char.isAlphaNum`: Unicode letter or number category
    * (Lu Ll Lt Lm Lo Nd Nl No) — wider than Java's `isLetterOrDigit`
    * (which excludes Nl/No). Cite: Internal.hs:207.
    */
  @inline def isAlphaNumRef(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
    t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
    t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
    t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  /** Haskell `Data.Char.isSpace`: ' ', \t..\r control range, NBSP, and the
    * Unicode Zs (space separator) category ONLY \u2014 GHC's generalCategory
    * check does NOT admit Zl/Zp (U+2028/U+2029), so line/paragraph
    * separators are dropped by `normalized` like any other symbol.
    * Cite: Internal.hs:208.
    */
  @inline def isSpaceRef(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r') || c == '\u00A0' ||
      Character.getType(c) == Character.SPACE_SEPARATOR

  /** Lowercase + keep only alphanumerics, whitespace and ','
    * (Internal.hs:204-211). Note the reference lowercases BEFORE filtering.
    */
  def normalized(input: String): String = {
    val lower = input.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (isAlphaNumRef(c) || isSpaceRef(c) || c == ',') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** `enclosedIn str '-'` (Utils.hs:26-27). */
  def enclosedIn(s: String, c: Char): String = s"$c$s$c"

  /** Character n-grams of the normalized, hyphen-enclosed input; offsets
    * 0..len-n (Internal.hs:191-197). Gram-count invariant for input of
    * normalized length s: count = s - n + 3. Errors when n < 2 like the
    * reference (guard at Internal.hs:193).
    */
  def grams(input: String, n: Int): IndexedSeq[String] = {
    require(n >= 2, "gram size must be at least 2")
    val s = enclosedIn(normalized(input), '-')
    val last = s.length - n
    if (last < 0) Vector.empty
    else (0 to last).map(i => s.substring(i, i + n))
  }

  /** Gram multiset: gram -> occurrence count (Internal.hs:161-164). */
  def gramVector(input: String, n: Int): Map[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    grams(input, n).foreach(g => m.update(g, m.getOrElse(g, 0) + 1))
    m.toMap
  }

  /** Euclidean magnitude sqrt(sum c_i^2) (Internal.hs:225-226). */
  def norm(counts: Iterable[Int]): Double = {
    var acc = 0.0
    counts.foreach(c => acc += c.toDouble * c.toDouble)
    math.sqrt(acc)
  }

  /** Plain Levenshtein edit distance (two-row DP). */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Normalized Levenshtein SIMILARITY, `text-metrics levenshteinNorm`
    * semantics: 1 - d/max(|a|,|b|); 1.0 when both empty
    * (Internal.hs:231-232). Golden values at Spec.hs:758-771.
    */
  def levenshteinNorm(a: String, b: String): Double = {
    val maxLen = math.max(a.length, b.length)
    if (maxLen == 0) 1.0
    else 1.0 - levenshtein(a, b).toDouble / maxLen
  }
}
