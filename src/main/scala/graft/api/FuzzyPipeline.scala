package graft.api

import graft.conf.FuzzyConf
import graft.io.TableIO
import graft.stage.{Candidates, Cluster, FindStage, IndexBuild, IndexTables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine facade — plays the role of the reference's two API layers
  * (`Data.FuzzySet.Simple` pure API + `Data.FuzzySet` monadic API,
  * Monad.hs:48-56): construct over a corpus, then query or dedup.
  *
  * Construction is lazy (nothing runs until an action); with a
  * `checkpointDir` every derived table is written once and resumed
  * idempotently by config-hash (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * {{{
  * val p = FuzzyPipeline(spark, clips, "clip_id", "transcript", FuzzyConf())
  * p.closestMatch(probes)            // reference find/findOne/closestMatch
  * val edges = p.dedupEdges()        // exact + LSH + SimHash + verify
  * val clusters = p.clusters()       // connected components over edges
  * }}}
  */
final case class FuzzyPipeline(
    spark: SparkSession,
    input: DataFrame,
    idCol: String,
    textCol: String,
    conf: FuzzyConf = FuzzyConf.default,
    checkpointDir: Option[String] = None
) {

  private val hash = TableIO.confHash((conf, idCol, textCol))

  private def ckpt(name: String)(df: => DataFrame): DataFrame =
    checkpointDir match {
      case Some(dir) => TableIO.checkpoint(spark, s"$dir/$name", hash, name)(df)
      case None => df
    }

  /** The six index tables (SURVEY.md §1.2), checkpointed when configured. */
  lazy val index: IndexTables = {
    val raw = IndexBuild(input, idCol, textCol, conf)
    raw.copy(
      items = ckpt("items")(raw.items),
      members = ckpt("members")(raw.members),
      postings = ckpt("postings")(raw.postings),
      norms = ckpt("norms")(raw.norms),
      sigs = ckpt("sigs")(raw.sigs),
      bands = ckpt("bands")(raw.bands))
  }

  // ---- reference query API (Simple.hs) ---------------------------------

  /** findMin (Simple.hs:176): all matches >= minScore per probe. */
  def findMin(minScore: Double, probes: DataFrame): DataFrame =
    FindStage.findMin(probes, index, minScore)

  /** find = findMin 0.33 (Simple.hs:219-226). */
  def find(probes: DataFrame): DataFrame = findMin(0.33, probes)

  /** findOneMin (Simple.hs:190): best match per probe. */
  def findOneMin(minScore: Double, probes: DataFrame): DataFrame =
    FindStage.bestPerQuery(findMin(minScore, probes))

  def findOne(probes: DataFrame): DataFrame = findOneMin(0.33, probes)

  /** closestMatchMin/closestMatch (Simple.hs:204, 244): matched value only. */
  def closestMatchMin(minScore: Double, probes: DataFrame): DataFrame =
    findOneMin(minScore, probes).select("query_id", "matched")

  def closestMatch(probes: DataFrame): DataFrame = closestMatchMin(0.33, probes)

  // ---- reference inspection API (Simple.hs:329-348) ---------------------

  def values: DataFrame = index.items.select("original")
  def size: Long = index.items.count()
  def isEmpty: Boolean = index.items.isEmpty

  // ---- dedup pipeline (the scale generalization) -------------------------

  /** Candidate pairs from all generation passes (LSH + SimHash), distinct. */
  def candidatePairs(): DataFrame = {
    val lsh = Candidates.lshPairs(index.bands, conf.maxBandBucket)
    val sim = Candidates.simhashPairs(index.sigs, maxHamming = 3, conf.maxBandBucket)
    ckpt("candidates")(lsh.unionByName(sim).distinct())
  }

  /** Verified duplicate edges at 10^12 scale:
    * (a_id, b_id, kind in {exact, fuzzy}, score >= conf.minScore).
    * Candidate generation via LSH + SimHash, verification via the
    * pair-restricted reference scoring kernel.
    */
  def dedupEdges(): DataFrame = {
    val exact = Candidates.exactEdges(index.members)
    val fuzzy = FindStage.verifyPairs(candidatePairs(), index, conf.minScore)
    ckpt("edges")(exact.unionByName(fuzzy))
  }

  /** Verified duplicate edges with FULL reference fidelity — every item
    * probes the whole index through the inverted-index join exactly as the
    * reference's `getMatches` would (top-50 crowding, size cascade, self
    * occupying a rank slot). Bit-identical to the in-memory oracle; cost is
    * quadratic in frequent-gram collisions, so this is the validation /
    * small-corpus mode — `dedupEdges` is the scale path.
    */
  def dedupEdgesExhaustive(): DataFrame = {
    val exact = Candidates.exactEdges(index.members)
    val fuzzy = FindStage.selfFindEdges(index, conf.minScore)
    ckpt("edges_exhaustive")(exact.unionByName(fuzzy))
  }

  /** (clip_id, component): every source row labeled with the min clip_id of
    * its duplicate cluster; singleton rows keep their own id.
    */
  def clusters(): DataFrame = {
    val edges = dedupEdges().select("a_id", "b_id")
    val vertices = index.members.select(col("clip_id").as("id"))
    ckpt("clusters")(
      Cluster
        .connectedComponents(vertices, edges)
        .select(col("id").as("clip_id"), col("component")))
  }
}
