package graft.streaming

import graft.conf.FuzzyConf
import graft.io.TableIO
import graft.stage.{Candidates, Cluster, FindStage, IndexBuild, IndexTables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

/** Incremental near-duplicate detection over a STREAM of arriving clips —
  * the continuous-ingestion form of the batch dedup pipeline
  * (FuzzyPipeline.dedupEdges), with per-batch work O(batch + pairs)
  * instead of O(corpus):
  *
  *  - state tables under `stateDir` (`items`, `members`, `sigs`),
  *    maintained by insert-only first-writer-wins upserts
  *    (TableIO.upsert — the Iceberg MERGE seam, so on a real catalog the
  *    state is snapshot-isolated Iceberg tables);
  *  - per micro-batch: the batch's key winners upsert into `items`
  *    (losing rows become `members` of the existing item + EXACT edges),
  *    signatures are computed for genuinely-new items only
  *    (IndexBuild.signatures — the same fused native kernel as batch),
  *    the new items' fused keys land in a `keys` state table (partitioned
  *    by batch_id, replay-idempotent), and candidates come from those keys
  *    probing the accumulated key state pruned to the batch's buckets
  *    (Candidates.incrementalPairsFromKeys — per-batch shuffle is
  *    O(batch x bucket), plus one semi-join-pruned scan of the key state);
  *  - candidate pairs are verified by the batch kernel
  *    (FindStage.verifyPairs over a state-backed IndexTables view), so
  *    streaming and batch scores cannot drift;
  *  - verified edges land partitioned by batch_id with dynamic partition
  *    overwrite — a retried micro-batch REPLACES its own partition, making
  *    the at-least-once foreachBatch effectively-once end to end (every
  *    state derivation above is replay-deterministic: upserts are
  *    insert-only no-ops on replay and "new items" are defined by what the
  *    state says won, which the replayed batch re-computes identically).
  *
  * The substring-containment pass is corpus-shaped (every sub-window of
  * every container), not batch-shaped, so it intentionally stays in the
  * periodic batch pipeline — the standard lambda split: streaming covers
  * exact + LSH/SimHash near-dups as clips arrive; a scheduled
  * FuzzyPipeline run (checkpointed, resumable) compacts and adds the
  * substring edges. Union-over-batches pair coverage vs the batch
  * fusedPairs is argued at [[Candidates.incrementalPairs]]; label
  * equality of the two paths on substring-free corpora is pinned by
  * StreamDedupSpec.
  */
object StreamDedup {

  /** Whether a state path exists at all. State reads below tolerate two
    * distinct "no data yet" shapes: an ABSENT dir (nothing ever written)
    * and a fileless dir (dynamic overwrite of an empty frame leaves only
    * _SUCCESS). The second still needs the AnalysisException catch, but
    * short-circuiting the first here keeps Spark's analyzer from logging
    * a full FileNotFoundException WARN stack trace on every stream's
    * first batch — alarming noise in otherwise-clean driver logs.
    */
  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The one "no data yet" contract for every state read in this file:
    * an ABSENT dir and a fileless dir (dynamic overwrite of an empty frame
    * leaves only _SUCCESS) both mean `fallback`; anything else is
    * `project` over the parquet read.
    */
  private def readState(spark: SparkSession, dir: String)(
      project: DataFrame => DataFrame)(fallback: => DataFrame): DataFrame =
    if (!pathExists(spark, dir)) fallback
    else try project(spark.read.parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => fallback }

  /** Highest batch id ever committed into `stateDir`, from the `_last_batch`
    * marker [[processBatch]] writes after each edges commit. None when the
    * state is fresh (or the marker is a torn write — the guard then stays
    * permissive rather than bricking a recovering stream).
    */
  private def lastCommittedBatch(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_last_batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      Some(new String(bytes, "UTF-8").trim.toLong)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeCommittedBatch(spark: SparkSession, stateDir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_last_batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Start the streaming dedup: `clips` is a streaming DataFrame carrying
    * (idCol, textCol). Edges accumulate under `stateDir/edges`; read them
    * with [[edges]], label the corpus on demand with [[labels]].
    */
  def dedupStream(
      clips: DataFrame,
      idCol: String,
      textCol: String,
      conf: FuzzyConf,
      stateDir: String,
      checkpointDir: String): StreamingQuery =
    clips.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, conf, stateDir)
      }
      .start()

  /** One micro-batch (exposed for replay tests — calling it twice with the
    * same arguments must leave identical state and edges).
    */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      conf: FuzzyConf,
      stateDir: String): Unit = {
    val spark = batch.sparkSession

    // guard the stateDir against a RESTARTED query with a fresh
    // checkpointDir: batch ids restart at 0 there, and the dynamic
    // partition overwrites below would silently REPLACE earlier batches'
    // keys/edges partitions — old items' fused keys vanish from key state
    // (future arrivals can no longer pair with them) and verified edges
    // are deleted, so labels() under-merges with no error. A crash-replay
    // of the last committed batch re-delivers the SAME id (>=), which
    // stays allowed; only a batch id that moves backwards fails loudly.
    lastCommittedBatch(spark, stateDir).foreach { last =>
      require(
        batchId >= last,
        s"state at $stateDir was committed up to batch $last but this query " +
          s"delivered batch $batchId — a new checkpointDir restarts batch ids at 0 " +
          "and its dynamic partition overwrites would corrupt the accumulated " +
          "keys/edges state. Resume with the original checkpointDir, or point " +
          "the stream at a fresh stateDir.")
    }

    // the arriving micro-batch feeds FIVE separate actions below (items
    // upsert, members checkpoint, sigs upsert, keys write, pairs
    // materialization); without a checkpoint each would re-read the
    // batch's offset range from the streaming source — 4-5x source I/O
    // and decode per batch on the hot path
    val keyed = batch
      .select(col(idCol).cast("string").as("clip_id"), col(textCol).as("original"))
      .withColumn("key", lower(col("original")))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)

    // independent state-table actions below overlap from a side thread
    // (guide §2.6: actions are serial only because the driver calls them
    // serially; the members upsert touches only the members dir, which
    // nothing else in this batch reads, so overlapping it with the
    // sigs/keys/pairs chain hides its full serial latency). Joined before
    // the edges commit so a batch never marks itself committed with its
    // members write still in flight.
    val sideErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    var sideThread: Thread = null

    // the batch's per-key winner, deterministically (a distributed batch
    // has no row order — same rule as IndexBuild/TableIO.upsert)
    def label(l: String): Unit =
      spark.sparkContext.setJobDescription(s"stream b$batchId: $l")
    label("items upsert")
    val batchItems = keyed
      .groupBy("key")
      .agg(min("clip_id").as("item_id"), min_by(col("original"), col("clip_id")).as("original"))
      .select("item_id", "key", "original")
    TableIO.upsert(spark, s"$stateDir/items", batchItems, "key")
    val items = spark.read.parquet(s"$stateDir/items")

    // every batch clip maps to the item the STATE says owns its key —
    // replay-stable, since the upsert above is a no-op the second time
    val batchMembers = keyed
      .select("clip_id", "key")
      .join(items.select("key", "item_id"), Seq("key"))
      .select("clip_id", "item_id")
      // EAGER: both the overlapped members upsert and the exact-edge branch
      // below consume it — materializing before the side thread starts
      // keeps the two consumers on blocks instead of racing to compute the
      // same lazy checkpoint
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    sideThread = new Thread(
      () =>
        try {
          spark.sparkContext.setJobDescription(s"stream b$batchId: members upsert")
          TableIO.upsert(spark, s"$stateDir/members", batchMembers, "clip_id")
        } catch { case t: Throwable => sideErr.set(t) },
      "graft-members-upsert")
    sideThread.start()
    // everything below runs under a finally that JOINS the side thread: a
    // mid-batch failure must not leave the members upsert mutating state
    // dirs while the caller replays the batch
    try {

    // genuinely-new items = batch winners that WON their key in state AND
    // whose fused keys are not already in the keys state from an EARLIER
    // batch. The second condition matters under at-least-once delivery: a
    // later batch that re-sends a clip which is already its key's state
    // winner passes the first join (its item_id IS the state winner), and
    // treating it as new would land its fused keys AGAIN under the new
    // batch_id — inflating bucket_n with phantom members (a bucket near
    // maxSaltedBucket flips to star-only edges and real candidate pairs
    // are lost) and growing the keys state without bound. The CURRENT
    // batch_id is excluded from the seen-set so a crash-replay of this
    // batch (same batch_id, keys already written, edges not yet) still
    // regenerates its keys and edges; partition pruning keeps the read to
    // earlier partitions, which the dynamic overwrite below never touches.
    val seenIds = readState(spark, s"$stateDir/keys")(
      _.filter(col("batch_id") =!= lit(batchId)).select("item_id"))(
      items.select("item_id").limit(0))
    val newItems = items
      .join(batchItems.select("item_id"), Seq("item_id"), "left_semi")
      .join(seenIds, Seq("item_id"), "left_anti")
    // the batch's signature delta IS newSigs: newItems are by construction
    // absent from the keys state, and the insert-only sigs upsert writes
    // exactly these deterministic rows (a crash-replay recomputes the same
    // values, and the upsert no-ops) — so re-reading the whole sigs state
    // back and semi-joining it down to newItems (two state scans per
    // micro-batch) reproduced this very frame. Checkpointed: consumed by
    // the upsert AND by fusedKeyed below.
    label("sigs upsert")
    val newSigs = IndexBuild.signatures(newItems, conf)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    TableIO.upsert(spark, s"$stateDir/sigs", newSigs, "item_id")

    // fused-KEY state: this batch's key rows land partitioned by batch_id
    // (dynamic overwrite — a replay rewrites identical rows), so candidate
    // generation reads accumulated 8-byte keys back instead of re-exploding
    // every signature in state on every batch; incrementalPairsFromKeys
    // then prunes that state to the batch's buckets in one semi-join scan
    // checkpointed: consumed by the keys write AND by candidate generation
    // below — without it the whole newSigs derivation (state reads + the
    // signature kernel) re-runs for each
    val newKeys = Candidates.fusedKeyed(newSigs)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    label("keys write")
    newKeys
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$stateDir/keys")
    // accumulated key state = EARLIER batches' partitions (from parquet;
    // the current batch's partition is excluded — after the dynamic
    // overwrite above its content is exactly newKeys) + the batch's own
    // keys straight from their just-materialized blocks, so the state scan
    // never re-reads what this batch just wrote. A keys dir can be absent
    // only while state holds zero items — same fileless-read contract as
    // edges()
    val allKeys = readState(spark, s"$stateDir/keys")(
      _.filter(col("batch_id") =!= lit(batchId))
        .select("bkey", "ktype", "item_id", "sh"))(newKeys.limit(0))
      .unionByName(newKeys.select("bkey", "ktype", "item_id", "sh"))

    label("candidate pairs")
    val scratch = new graft.stage.Scratch()
    val pairs = Candidates
      .incrementalPairsFromKeys(newKeys, allKeys, maxHamming = 3, conf.maxSaltedBucket, scratch)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // the batch scratch rides into verifyPairs too: in cosine mode it
    // localCheckpoints gated pairs + pruned postings internally, and the
    // default noop scratch would pin those blocks forever — one leaked
    // candidate+postings-sized block set per micro-batch.
    // LEAN index view: verification reads items (item_id, key) + sigs (lev
    // mode) or the postings/norms projections of items (cosine mode) —
    // never n_members — so the public stateIndex's members-wide
    // aggregation join would re-scan the WHOLE members state every
    // micro-batch just to build a column the verifier drops: O(|state|)
    // per batch for nothing at 10^12 rows
    label("verify+edges write")
    val fuzzy = FindStage.verifyPairs(
      pairs, stateIndexLean(spark, stateDir, conf), conf.minScore, scratch)

    // exact edges: only for clips whose edge is not already committed by an
    // EARLIER batch. Under at-least-once delivery a loser clip can be
    // re-sent batches later; batchMembers maps it to its state owner again,
    // and without the anti-join its (owner, clip) edge would be re-written
    // under every re-delivering batch_id — edges() then returns duplicate
    // rows and the edge state grows with re-deliveries (the same unbounded-
    // growth class the seenIds anti-join closes for key state). The CURRENT
    // batch_id is excluded from the seen-set so a crash-replay still
    // regenerates its own partition. dropDuplicates: a micro-batch that
    // carries the same clip row twice must not write the edge twice (the
    // owner is unique per clip, so duplicates are full-row identical).
    val exactRaw = batchMembers
      .filter(col("clip_id") =!= col("item_id"))
      .select(col("item_id").as("a_id"), col("clip_id").as("b_id"))
      .dropDuplicates("b_id")
    val priorExact = readState(spark, s"$stateDir/edges")(
      _.filter(col("batch_id") =!= lit(batchId) && col("kind") === lit("exact"))
        .select("b_id"))(exactRaw.select("b_id").limit(0))
    val exact = exactRaw
      .join(priorExact, Seq("b_id"), "left_anti")
      .select(
        col("a_id"), col("b_id"),
        lit("exact").as("kind"), lit(1.0).as("score"))

    exact.unionByName(fuzzy)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$stateDir/edges")
    // the edges write above is the last consumer of pairs AND of the
    // pruned key membership incrementalPairsFromKeys tracked — release
    // them here (batchMembers waits: the side thread's members upsert
    // still reads its blocks)
    scratch.release()
    Seq(pairs, newKeys, newSigs, keyed).foreach { df =>
      org.apache.spark.sql.GraftColumnBridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))
    }
    } finally sideThread.join()
    // the overlapped members upsert must be durably finished (and any
    // failure propagated) before the batch is marked committed
    if (sideErr.get() != null) throw sideErr.get()
    writeCommittedBatch(spark, stateDir, batchId)
    spark.sparkContext.setJobDescription(null)
    org.apache.spark.sql.GraftColumnBridge.checkpointedRdd(batchMembers)
      .foreach(_.unpersist(blocking = false))
  }

  /** The state tables as the batch kernel's IndexTables view, so
    * verification runs the EXACT batch code path. postings/norms/bands are
    * the same recompute-on-read projections the batch pipeline uses
    * (FuzzyPipeline.mapSideStages) — and verifyPairs semi-join-prunes
    * postings to candidate endpoints before the scan, so the cosine-mode
    * projections never materialize corpus-wide here either (lev mode, the
    * default, reads only items + sigs).
    */
  /** [[stateIndex]] minus the n_members aggregation: the per-batch
    * verification path reads items only as (item_id, key) — plus the
    * postings/norms projections OF those columns in cosine mode — so
    * joining the full members state per micro-batch to build n_members
    * would add an O(|state|) scan per batch for a column verifyPairs never
    * reads. items here carries NO n_members column; callers that need it
    * use the public [[stateIndex]].
    */
  private[graft] def stateIndexLean(
      spark: SparkSession, stateDir: String, conf: FuzzyConf): IndexTables = {
    val items = spark.read.parquet(s"$stateDir/items")
    val sigs = spark.read.parquet(s"$stateDir/sigs")
    val (postings, norms) = IndexBuild.gramProjections(items, conf)
    IndexTables(conf, items, spark.read.parquet(s"$stateDir/members"), postings, norms, sigs,
      sigs.select(col("item_id"), explode(col("band_hashes")).as("band_key")))
  }

  def stateIndex(spark: SparkSession, stateDir: String, conf: FuzzyConf): IndexTables = {
    val items = spark.read.parquet(s"$stateDir/items")
    val members = spark.read.parquet(s"$stateDir/members")
    val sigs = spark.read.parquet(s"$stateDir/sigs")
    val (postings, norms) = IndexBuild.gramProjections(items, conf)
    val itemsN = items.join(
      members.groupBy("item_id").agg(count(lit(1)).as("n_members")),
      Seq("item_id"))
    IndexTables(conf, itemsN, members, postings, norms, sigs,
      sigs.select(col("item_id"), explode(col("band_hashes")).as("band_key")))
  }

  /** All verified edges accumulated so far: (a_id, b_id, kind, score).
    * A duplicate-free stream writes no parquet files at all (dynamic
    * partition overwrite of an empty frame emits nothing), so an absent /
    * fileless edge dir reads as the empty edge set, not an error.
    */
  def edges(spark: SparkSession, stateDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a_id", StringType), StructField("b_id", StringType),
      StructField("kind", StringType), StructField("score", DoubleType)))
    def empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    readState(spark, s"$stateDir/edges")(
      _.select("a_id", "b_id", "kind", "score"))(empty)
  }

  /** (clip_id, component) labels over everything ingested so far — CC over
    * the accumulated edge set, same call shape as FuzzyPipeline.clusters.
    * On demand / periodic, NOT per micro-batch: at 10^12 rows relabeling
    * the world every batch would dominate the stream; the edge table is
    * the incrementally-maintained state, labels are a (cheap, sparse)
    * derivation from it.
    *
    * NOTE: the returned frame is an eager local checkpoint whose blocks
    * stay pinned for the session — fine for a one-shot read, but a
    * long-lived streaming driver that relabels PERIODICALLY accumulates
    * one corpus-sized block set per call. Such callers should use
    * [[labelsReleasable]] and release each generation once consumed.
    */
  def labels(spark: SparkSession, stateDir: String): DataFrame =
    labelsReleasable(spark, stateDir)._1

  /** [[labels]] plus a release hook that unpersists the result's blocks;
    * call it once the labels have been written out / consumed.
    */
  def labelsReleasable(spark: SparkSession, stateDir: String): (DataFrame, () => Unit) = {
    val vertices = spark.read.parquet(s"$stateDir/members").select(col("clip_id").as("id"))
    val (labeled, _, release) = Cluster.connectedComponentsReleasable(
      vertices, edges(spark, stateDir).select("a_id", "b_id"))
    val out = labeled
      .select(col("id").as("clip_id"), col("component"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    release()
    (out, () => org.apache.spark.sql.GraftColumnBridge.checkpointedRdd(out)
      .foreach(_.unpersist(blocking = false)))
  }
}
