package graft.stage

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}

/** Collector for INTERMEDIATE checkpointed tables — scratch whose blocks
  * are dead the moment the consuming stage has durably materialized its own
  * result (e.g. the bucket-size directory behind candidate generation, or
  * the gated pair table behind verification). Without a release, every such
  * `localCheckpoint` pins its blocks for the life of the session: noise at
  * bench scale, but the shuffle-regime scratch (`withN`, `containers`) is
  * corpus x key-sized at 10^12 rows — real executor memory.
  *
  * Stage functions `track` what they checkpoint; the pipeline `release`s
  * once the stage results are block- or parquet-materialized (the branch
  * matSer / checkpoint write is the scratch's last consumer). Thread-safe:
  * the edge branches track from concurrent threads.
  *
  * Releasing scratch whose consumer has NOT materialized yet loses data —
  * a locally checkpointed RDD's lineage is truncated and cannot recompute —
  * so `release()` belongs strictly after the forcing call, and callers
  * outside a managed pipeline get [[Scratch.noop]] (track is identity,
  * nothing is ever released) by default.
  */
final class Scratch private (recording: Boolean) {
  def this() = this(true)

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val releasedN = new java.util.concurrent.atomic.AtomicLong(0L)

  def track(df: DataFrame): DataFrame = {
    if (recording) tracked.add(df)
    df
  }

  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      GraftColumnBridge.checkpointedRdd(df).foreach(_.unpersist(blocking = false))
      releasedN.incrementAndGet()
      df = tracked.poll()
    }
  }

  /** Tables tracked but not yet released (test seam). */
  def pending: Int = tracked.size()

  /** Total tables released so far (test seam: proves scratch flowed
    * end-to-end rather than release() running over an empty queue).
    */
  def releasedCount: Long = releasedN.get()
}

object Scratch {
  /** track() is identity and nothing is ever released — the default for
    * direct stage-function callers (tests, ad-hoc queries), which keep the
    * pre-tracking behavior of scratch living until session end.
    */
  val noop = new Scratch(false)
}
