package graft.stage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the verified-edge Dataset (north rule:
  * "clusters are formed via iterative connected components over the
  * candidate-edge Dataset").
  *
  * Min-label propagation to fixpoint: every vertex repeatedly adopts the
  * smallest label among itself, its neighbors, AND its current label's
  * current label (pointer jumping — halves tree height each round, so
  * convergence is O(log d) not O(d) even for path-shaped components).
  * Iterations are localCheckpoint'ed to cut lineage; each round is one
  * shuffle join, DataFrame-only (no RDDs except inside localCheckpoint).
  */
object Cluster {

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

      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("nbr_comp"), col("component"))).as("component"))

      // pointer jumping: component := label(component)
      val jumped = stepped
        .join(
          stepped.select(col("id").as("component"), col("component").as("parent_comp")),
          Seq("component"),
          "left")
        .select(col("id"), coalesce(col("parent_comp"), col("component")).as("component"))
        .localCheckpoint()

      val changed = jumped
        .join(labels.withColumnRenamed("component", "old_comp"), Seq("id"))
        .filter(col("component") =!= col("old_comp"))
        .limit(1)
        .count()
      converged = changed == 0
      labels = jumped
      iter += 1
    }
    labels
  }
}
