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
  @inline def isAlphaNumRef(cp: Int): Boolean = {
    val t = Character.getType(cp)
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
  @inline def isSpaceRef(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r') || cp == 0xA0 ||
      Character.getType(cp) == Character.SPACE_SEPARATOR

  /** Lowercase + keep only alphanumerics, whitespace and ','
    * (Internal.hs:204-211). Note the reference lowercases BEFORE filtering.
    * Iterates by CODE POINT: a supplementary-plane letter (CJK Ext-B, math
    * alphanumerics) survives here like it does in the reference (whose
    * Char IS a code point) and in functions.normText's \p{L} regex — the
    * per-Char loop this replaces saw each surrogate half as category
    * SURROGATE and silently dropped them. Downstream gram windows are
    * code points too ([[cpStartsOrNull]]), so a window never splits a
    * surrogate pair.
    */
  def normalized(input: String): String = {
    val lower = input.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (isAlphaNumRef(cp) || isSpaceRef(cp) || cp == ',') sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** `enclosedIn str '-'` (Utils.hs:26-27). */
  def enclosedIn(s: String, c: Char): String = s"$c$s$c"

  /** UTF-16 start offset of every code point of `s`, plus the terminal
    * offset — or NULL when every code point is one UTF-16 unit (the
    * overwhelmingly common case), so window loops can take the
    * offset==index fast path with zero allocation. Shared by [[grams]]
    * and the native gram expressions: the reference's Char is a code
    * point, so an n-gram is n CODE POINTS and never splits a surrogate
    * pair (a split half cannot round-trip through UTF-8 columns —
    * String.getBytes encodes it as '?').
    */
  private[graft] def cpStartsOrNull(s: String): Array[Int] = {
    val len = s.length
    val cps = s.codePointCount(0, len)
    if (cps == len) return null
    val starts = new Array[Int](cps + 1)
    var i = 0
    var k = 0
    while (i < len) {
      starts(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    starts(cps) = len
    starts
  }

  /** Number of n-code-point windows of `s` (may be <= 0); `starts` is
    * [[cpStartsOrNull]] of `s`. The single definition of the windowing
    * arithmetic shared by [[grams]] and the three native gram expressions
    * — the four paths are parity-pinned, so divergence must be impossible
    * by construction, not merely test-caught.
    */
  @inline private[graft] def windowCount(s: String, starts: Array[Int], n: Int): Int =
    (if (starts == null) s.length else starts.length - 1) - n + 1

  /** The i-th n-code-point window of `s`; see [[windowCount]]. */
  @inline private[graft] def window(s: String, starts: Array[Int], i: Int, n: Int): String =
    if (starts == null) s.substring(i, i + n)
    else s.substring(starts(i), starts(i + n))

  /** Character n-grams of the normalized, hyphen-enclosed input; offsets
    * 0..len-n in CODE POINTS (Internal.hs:191-197 — Haskell Char = code
    * point). Gram-count invariant for input of normalized length s (in
    * code points): count = s - n + 3. Errors when n < 2 like the
    * reference (guard at Internal.hs:193).
    */
  def grams(input: String, n: Int): IndexedSeq[String] = {
    require(n >= 2, "gram size must be at least 2")
    val s = enclosedIn(normalized(input), '-')
    val starts = cpStartsOrNull(s)
    val count = windowCount(s, starts, n)
    if (count <= 0) Vector.empty
    else (0 until count).map(i => window(s, starts, i, n))
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

  /** Plain Levenshtein edit distance (two-row DP) over CODE POINTS — the
    * reference edits [Char] = [code point], and the column form
    * (functions.levNormSim -> Spark's levenshtein/length) also counts code
    * points, so an astral char costs ONE edit in both paths. BMP-only
    * strings (the fast path) never allocate the code-point arrays.
    */
  def levenshtein(a: String, b: String): Int = {
    if (a.length == a.codePointCount(0, a.length) &&
      b.length == b.codePointCount(0, b.length)) return levenshteinChars(a, b)
    levenshteinInts(a.codePoints().toArray, b.codePoints().toArray)
  }

  private def levenshteinChars(a: String, b: String): Int = {
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

  private def levenshteinInts(a: Array[Int], b: Array[Int]): Int = {
    if (a.length == 0) return b.length
    if (b.length == 0) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Normalized Levenshtein SIMILARITY, `text-metrics levenshteinNorm`
    * semantics: 1 - d/max(|a|,|b|) with lengths in CODE POINTS; 1.0 when
    * both empty (Internal.hs:231-232). Golden values at Spec.hs:758-771.
    */
  def levenshteinNorm(a: String, b: String): Double = {
    val maxLen = math.max(
      a.codePointCount(0, a.length), b.codePointCount(0, b.length))
    if (maxLen == 0) 1.0
    else 1.0 - levenshtein(a, b).toDouble / maxLen
  }
}
