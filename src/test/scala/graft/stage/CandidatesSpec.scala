package graft.stage

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Skew-regime tests for candidate generation (north rule: "salted
  * repartitioning for skewed shingle bands").
  */
class CandidatesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bandsDF(bucketSizes: Map[String, Int]) =
    bucketSizes.toSeq
      .flatMap { case (key, n) => (0 until n).map(i => (key, f"${key}_i$i%06d")) }
      .toDF("bkey", "item_id")

  test("salted hot buckets produce EXACTLY the all-pairs set of the direct join") {
    // 300-member bucket is above cap=100 -> salted regime; 40-member bucket
    // stays direct; the union must equal the unsalted all-pairs ground truth
    val keyed = bandsDF(Map("hot" -> 300, "small" -> 40, "single" -> 1))
    val salted = Candidates
      .bucketSelfPairs(keyed, cap = 100, saltChunk = 32, maxSalted = 4096)
      .as[(String, String)].collect().toSet
    val direct = Candidates
      .bucketSelfPairs(keyed, cap = 1000000, saltChunk = 32, maxSalted = 4096)
      .as[(String, String)].collect().toSet
    salted.size shouldBe (300 * 299 / 2 + 40 * 39 / 2)
    salted shouldBe direct
  }

  test("buckets beyond maxSaltedBucket switch to the star regime; others unaffected") {
    val keyed = bandsDF(Map("flood" -> 600, "ok" -> 5))
    val pairs = Candidates
      .bucketSelfPairs(keyed, cap = 100, saltChunk = 32, maxSalted = 500)
      .as[(String, String)].collect()
    val (floodPairs, okPairs) = pairs.partition(_._1.startsWith("flood"))
    okPairs.length shouldBe 5 * 4 / 2
    // star: exactly one candidate per non-min member, all anchored at the
    // bucket minimum — |bucket| - 1 edges, not |bucket|^2 / 2
    floodPairs.length shouldBe 600 - 1
    all(floodPairs.map(_._1)) shouldBe "flood_i000000"
    floodPairs.map(_._2).distinct.length shouldBe 599
  }

  test("a pair never duplicates across the salted join (a<b once per bucket)") {
    val keyed = bandsDF(Map("hot" -> 150))
    val pairs = Candidates
      .bucketSelfPairs(keyed, cap = 100, saltChunk = 16, maxSalted = 4096)
      .as[(String, String)].collect()
    pairs.length shouldBe pairs.toSet.size
    pairs.length shouldBe 150 * 149 / 2
  }

  test("fusedPairs emits exactly lshPairs UNION simhashPairs") {
    import graft.conf.FuzzyConf
    val conf = FuzzyConf()
    val clips = graft.audio.ClipSynth.table(spark, 3000, includeAudio = false)
    val idx = graft.stage.IndexBuild(clips, "clip_id", "transcript", conf)
    val sigs = idx.sigs.cache()
    val fused = Candidates
      .fusedPairs(sigs, 3, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket)
      .as[(String, String)].collect().toSet
    val separate =
      Candidates.lshPairs(idx.bands, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket)
        .as[(String, String)].collect().toSet ++
        Candidates.simhashPairs(sigs, 3, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket)
          .as[(String, String)].collect().toSet
    fused shouldBe separate
    fused should not be empty // planted dups guarantee collisions
    sigs.unpersist()
  }

  test("union of per-batch incrementalPairs == fusedPairs over the full corpus") {
    import graft.conf.FuzzyConf
    val conf = FuzzyConf()
    // 3000 synthetic clips with planted dups; no bucket approaches the
    // caps, so both paths run their direct regimes and the pair SETS must
    // be exactly equal — the incremental union-over-batches coverage
    // argument (Candidates.incrementalPairs scaladoc) as a concrete check
    val clips = graft.audio.ClipSynth.table(spark, 3000, includeAudio = false)
    val idx = graft.stage.IndexBuild(clips, "clip_id", "transcript", conf)
    val sigs = idx.sigs.cache()
    // "arrival" split by item id hash: batch 1 = ~2/3, batch 2 = the rest
    import org.apache.spark.sql.functions.{abs => fAbs, col, xxhash64}
    val firstBatch = sigs.filter(fAbs(xxhash64(col("item_id"))) % 3 < 2).cache()
    val secondNew = sigs.filter(fAbs(xxhash64(col("item_id"))) % 3 === 2)
    val incremental =
      Candidates.incrementalPairs(firstBatch, firstBatch, 3, conf.maxSaltedBucket)
        .as[(String, String)].collect().toSet ++
        Candidates.incrementalPairs(secondNew, sigs, 3, conf.maxSaltedBucket)
          .as[(String, String)].collect().toSet
    val batch = Candidates
      .fusedPairs(sigs, 3, conf.maxBandBucket, conf.saltChunk, conf.maxSaltedBucket)
      .as[(String, String)].collect().toSet
    incremental shouldBe batch
    incremental should not be empty
    sigs.unpersist(); firstBatch.unpersist()
  }

  test("incremental flood star stays connected when a batch arrival becomes the bucket minimum") {
    // one flooded bucket (maxBucket = 3): old members o4..o9 whose own
    // arrival-time stars all hang off o4; the next batch brings a0 and a1,
    // BOTH smaller than every old id. a1's star edge goes to the new min
    // a0 — and a0 itself gets NO (member -> min) edge, so without the
    // old-hub patch edge (a0, o4) the old members' stars would strand as a
    // second component
    def keys(ids: Seq[String]) =
      ids.map(id => (7L, 0, id, 0L)).toDF("bkey", "ktype", "item_id", "sh")
    val old = Seq("o4", "o5", "o6", "o7", "o8", "o9")
    val pairs = Candidates
      .incrementalPairsFromKeys(keys(Seq("a0", "a1")), keys(old ++ Seq("a0", "a1")),
        maxHamming = 3, maxBucket = 3)
      .as[(String, String)].collect().toSet
    pairs should contain(("a0", "a1")) // star to the new min
    pairs should contain(("a0", "o4")) // patch to the old hub
    pairs.size shouldBe 2 // still linear: no per-member fanout beyond the star
  }

  test("prefixHashes UDF matches the xxhash64 column on ascii and multibyte keys") {
    import org.apache.spark.sql.functions.{col, explode, lit, transform, sequence, xxhash64, length => slen}
    val keys = Seq("alabama arkansas california", "déjà vu naïve café au lait!",
      "mixed ascii and 中文字符 in one key", "0123456789abcdef").toDF("key")
    val L = 7
    val viaUdf = keys
      .select(col("key"), explode(Candidates.prefixHashes(L)(col("key"))).as("h"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val viaCol = keys
      .select(col("key"),
        explode(transform(sequence(lit(1), slen(col("key")) - (L - 1)),
          i => xxhash64(col("key").substr(i, lit(L))))).as("h"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    viaUdf shouldBe viaCol
  }

  test("substring short-key regime: contained keys below prefixLen are found exactly") {
    import org.apache.spark.sql.functions.col
    val items = Seq(
      ("s1", "hello world"), // 11 chars, contained in s2 (ratio 11/18)
      ("s2", "ah hello world yes"), // 18-char container (>= prefixLen: both regimes' container side)
      ("s3", "cat"), // contained in s4 at ratio 3/16 < 0.5 -> excluded
      ("s4", "the cat sat here"),
      ("s5", "a"), // 1-char contained in s6 at exactly minRatio
      ("s6", "ab"),
      ("s7", "exactly15charss"), // 15 chars: last short-regime length
      ("s8", "exactly15charss butmore"), // 23-char container (ratio 15/23)
      ("s9", "héllo wörld"), // multibyte contained (11 chars): whole-key
      ("s10", "aa héllo wörld bb") // xxhash64 vs windowHash UDF parity
    ).toDF("item_id", "key")
    val got = Candidates.substringPairs(items, prefixLen = 16, minRatio = 0.5, maxBucket = 100000)
      .select("a_id", "b_id").as[(String, String)].collect().toSet
    got should contain(("s1", "s2"))
    got should contain(("s5", "s6"))
    got should contain(("s7", "s8"))
    got should contain(("s9", "s10"))
    got.map(_._1) should not contain "s3"
  }

  test("substringPairs equals the brute-force containment oracle across both length regimes") {
    import org.apache.spark.sql.functions.col
    // tiny alphabet + seeded lengths 1..30 straddling prefixLen=16: dense
    // containment relations in BOTH the long (windowed-prefix) and short
    // (sub-L window closure) regimes
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh "
    def randStr(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // bases of length 1..24 plus derived containers (base wrapped in 0..len+5
    // extra chars, straddling the minRatio boundary) — genuine containment in
    // BOTH regimes; short alphabet also yields coincidental containments
    val corpus = (0 until 60).flatMap { i =>
      val len = 1 + rnd.nextInt(24)
      val base = randStr(len)
      val extra = rnd.nextInt(len + 6)
      val front = rnd.nextInt(extra + 1)
      val container = randStr(front) + base + randStr(extra - front)
      Seq((f"k$i%03d", base), (f"c$i%03d", container))
    }
    val minRatio = 0.5
    val oracle = (for {
      (aId, aKey) <- corpus
      (bId, bKey) <- corpus
      if aKey.length < bKey.length && bKey.contains(aKey) &&
        aKey.length.toDouble / bKey.length >= minRatio
    } yield (aId, bId)).toSet
    oracle should not be empty // fixture sanity: both regimes exercised
    oracle.exists { case (a, _) => corpus.toMap.apply(a).length < 16 } shouldBe true
    oracle.exists { case (a, _) => corpus.toMap.apply(a).length >= 16 } shouldBe true
    val got = Candidates
      .substringPairs(corpus.toDF("item_id", "key"), prefixLen = 16, minRatio = minRatio, maxBucket = 100000)
      .select("a_id", "b_id").as[(String, String)].collect().toSet
    got shouldBe oracle
  }

  test("simhashPairs with salting still finds hamming<=3 neighbors in a hot chunk bucket") {
    // 120 fingerprints sharing chunk 0 (low 15 bits identical) -> one hot
    // bucket above cap=50; planted neighbor pair differs in 2 high bits
    val base = 0x1234L
    val sigs = ((0 until 118).map { i =>
      (f"r$i%04d", base | ((i.toLong + 7) << 20)) // far apart in high bits
    } :+ ("pairA0", base | (1L << 50)) :+ ("pairB0", base | (1L << 50) | (1L << 58)))
      .toDF("item_id", "simhash")
    val got = Candidates
      .simhashPairs(sigs, maxHamming = 3, maxBandBucket = 50, saltChunk = 16, maxSaltedBucket = 4096)
      .as[(String, String)].collect().toSet
    got should contain(("pairA0", "pairB0"))
  }
}
