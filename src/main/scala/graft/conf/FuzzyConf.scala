package graft.conf

/** Engine configuration.
  *
  * The first four fields mirror the reference's config scalars:
  * gram-size bounds and Levenshtein toggle
  * (`/root/reference/src/Data/FuzzySet/Internal.hs:53-58`), default values
  * (2, 3, true) from `defaultSet`
  * (`/root/reference/src/Data/FuzzySet/Simple.hs:160-161`) and the default
  * minimum score 0.33 (`Simple.hs:226`).
  *
  * The remaining fields configure the scale path (MinHash/LSH, SimHash,
  * skew handling) that the single-node reference does not need: its
  * inverted index (`Internal.hs:51`) is a degenerate LSH with band = one
  * gram, which stops scaling once postings lists grow with corpus size.
  *
  * @param gramLo         inclusive lower bound of gram sizes
  * @param gramHi         inclusive upper bound of gram sizes
  * @param useLevenshtein rerank top-50 cosine candidates by normalized
  *                       Levenshtein similarity (`Internal.hs:87-93`)
  * @param minScore       drop results scoring below this (`Simple.hs:226`)
  * @param topKRerank     cosine candidates kept per query before the
  *                       Levenshtein rerank (`Internal.hs:90` - take 50)
  * @param minhashHashes  number of MinHash permutations (= bands * rowsPerBand)
  * @param minhashBands   LSH band count
  * @param rowsPerBand    MinHash rows per band; candidate-probability curve
  *                       is 1 - (1 - j^r)^b for Jaccard j. Defaults b=21,
  *                       r=6 put the S-curve threshold at (1/21)^(1/6) ~
  *                       0.60: catch probability 0.998 at j = 0.8 (a
  *                       single-char edit of a short transcript keeps
  *                       j >= 0.8), while vocabulary-level similarity
  *                       (j ~ 0.4) collides with probability < 0.09 —
  *                       token-drop/append dups at lower j are covered by
  *                       the exact-substring pass, byte-identical ones by
  *                       the exact pass
  * @param simhashBits    SimHash fingerprint width (64 = one long)
  * @param seed           base seed for all hash families (deterministic)
  * @param maxBandBucket  rows sharing one LSH band value before the bucket
  *                       is declared HOT: hot buckets switch from the
  *                       direct in-bucket self-join to SALTED pair
  *                       generation (north rule: "salted repartitioning
  *                       for skewed shingle bands") — per-task work stays
  *                       bounded by saltChunk x bucket instead of bucket^2
  *                       in a single task
  * @param saltChunk      target members per salt chunk inside a hot bucket
  * @param maxSaltedBucket buckets beyond even the salted regime switch to
  *                       STAR candidates (member -> bucket-min, linear in
  *                       bucket size): all-pairs volume is quadratic no
  *                       matter the partitioning, but a genuine
  *                       near-identical flood is a real duplicate cluster,
  *                       and its spanning star is all that connected
  *                       components needs; degenerate near-constant bands
  *                       are pruned by verification at |bucket| cost
  *                       (Candidates.taggedSelfPairs scaladoc)
  * @param maxPostingsPerGram stop-list threshold: grams whose document
  *                       frequency exceeds this are dropped from the
  *                       candidate join (they only add quadratic pairs);
  *                       verification still uses full gram vectors
  * @param sigGateMinJaccard MinHash-estimated Jaccard below which a
  *                       candidate pair is dropped before the scoring
  *                       joins (FindStage.verifyPairs). The default 0.3
  *                       sits > 5 sigma below any genuinely-near pair at
  *                       the default minScore 0.33 (stderr ~
  *                       sqrt(j(1-j)/H) ~ 0.045 at H=126); a run with a
  *                       LOWER minScore must lower this gate in step or
  *                       low-J pairs are silently lost before scoring
  * @param shufflePartitions value for spark.sql.shuffle.partitions
  * @param substringPrefixLen join-key prefix length for the substring-dup
  *                       pass (suffix-array stand-in, SURVEY §7.4)
  * @param substringMinRatio minimum len(contained)/len(container) for a
  *                       substring pair to count as a duplicate edge
  */
final case class FuzzyConf(
    gramLo: Int = 2,
    gramHi: Int = 3,
    useLevenshtein: Boolean = true,
    minScore: Double = 0.33,
    topKRerank: Int = 50,
    minhashHashes: Int = 126,
    minhashBands: Int = 21,
    rowsPerBand: Int = 6,
    simhashBits: Int = 64,
    seed: Long = 42L,
    maxBandBucket: Int = 100,
    saltChunk: Int = 64,
    maxSaltedBucket: Int = 4096,
    maxPostingsPerGram: Int = 10000,
    sigGateMinJaccard: Double = 0.3,
    shufflePartitions: Int = 32,
    substringPrefixLen: Int = 16,
    substringMinRatio: Double = 0.5
) {
  require(gramLo >= 2, "gram size must be at least 2 (Internal.hs:193)")
  require(gramHi >= gramLo, "gramHi must be >= gramLo")
  require(
    minhashBands * rowsPerBand == minhashHashes,
    "minhashHashes must equal minhashBands * rowsPerBand"
  )
  /** Gram sizes in query-cascade order: upper bound first (Simple.hs:181). */
  def sizesDesc: Seq[Int] = gramHi.to(gramLo, -1)
  def sizes: Seq[Int] = gramLo to gramHi
}

object FuzzyConf {
  /** The reference's `defaultSet` config (Simple.hs:160-161, 226). */
  val default: FuzzyConf = FuzzyConf()
}
