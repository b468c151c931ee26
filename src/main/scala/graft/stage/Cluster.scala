package graft.stage

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over the verified-edge Dataset (north rule:
  * "clusters are formed via iterative connected components over the
  * candidate-edge Dataset").
  *
  * Min-label propagation to fixpoint: every vertex repeatedly adopts the
  * smallest label among itself, its neighbors, AND its current label's
  * current label (pointer jumping — halves tree height each round, so
  * convergence is O(log d) not O(d) even for path-shaped components).
  *
  * Each iteration's labels are localCheckpoint'ed: the checkpoint TRUNCATES
  * the logical plan (a persist would not — the per-iteration plan references
  * the previous labels several times, so without truncation the tree grows
  * ~4^iterations and Catalyst analysis itself becomes the bottleneck).
  * Round-1 leak fix: the SUPERSEDED generation's block-backed RDD is
  * unpersisted as soon as the next generation is materialized (Dataset
  * .unpersist can't reach checkpoint blocks — see
  * GraftColumnBridge.checkpointedRdd), so a run holds at most two
  * generations of label blocks instead of one per iteration.
  */
object Cluster {

  private def freeCheckpoint(df: DataFrame): Unit =
    GraftColumnBridge.checkpointedRdd(df).foreach(_.unpersist(blocking = false))

  /** edges: (a_id, b_id) undirected; vertices: one column `id` (superset of
    * edge endpoints). Returns (id, component) where component = min id in
    * the component.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = vertices
      .select(col("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor minimum
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("component").as("src_comp")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_comp")).as("nbr_comp"))

      // persisted within the iteration: consumed by BOTH branches of the
      // pointer-jump self-join (exchange reuse can't kick in — the branches
      // shuffle on different keys), so without a cache the nbrMin
      // aggregation would run twice
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("nbr_comp"), col("component"))).as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // pointer jumping: component := label(component); eager checkpoint
      // materializes the new generation and truncates its plan
      val jumped = stepped
        .join(
          stepped.select(col("id").as("component"), col("component").as("parent_comp")),
          Seq("component"),
          "left")
        .select(col("id"), coalesce(col("parent_comp"), col("component")).as("component"))
        .localCheckpoint()

      // full count, no limit-1 early exit: both inputs are materialized, so
      // the scan is trivial, and a limit's task CANCELLATION floods the log
      // with late-completion "non-existent accumulator" errors
      val changed = jumped
        .join(labels.withColumnRenamed("component", "old_comp"), Seq("id"))
        .filter(col("component") =!= col("old_comp"))
        .count()
      stepped.unpersist(false)
      freeCheckpoint(labels) // superseded generation — the round-1 leak
      converged = changed == 0
      labels = jumped
      iter += 1
    }
    freeCheckpoint(sym)
    labels
  }
}
