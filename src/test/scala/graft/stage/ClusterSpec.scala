package graft.stage

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Deep-component stress for connected components: the pointer-jumping
  * O(log d) convergence claim (Cluster scaladoc) and the two-generation
  * block-manager bound (round-1 leak fix) pinned at adversarial depth —
  * path-shaped components are the worst case for plain min-label
  * propagation (O(d) iterations).
  */
class ClusterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("depth-10^4 chains at 10^5 vertices converge in O(log d) iterations, <= 2 live label generations") {
    val chains = 10
    val depth = 10000 // vertices per chain; diameter = depth - 1
    // vertex id "c<chain>_v<idx>" zero-padded so the chain head is the min
    def vid(c: Int, i: Int) = f"c$c%02d_v$i%05d"
    val edges = (0 until chains)
      .flatMap(c => (0 until depth - 1).map(i => (vid(c, i), vid(c, i + 1))))
      .toDF("a_id", "b_id")
    val vertices = (0 until chains)
      .flatMap(c => (0 until depth).map(i => vid(c, i)))
      .toDF("id")

    val storedBefore = spark.sparkContext.getRDDStorageInfo.length
    val (labels, iters) = Cluster.connectedComponentsWithStats(vertices, edges)
    val rows = labels.collect()

    // correctness: every vertex labeled with its chain head
    rows.length shouldBe chains * depth
    rows.foreach { r =>
      val id = r.getString(0)
      r.getString(1) shouldBe (id.take(3) + "_v00000")
    }

    // O(log d): pointer jumping halves the unresolved tree height per
    // round — allow a small constant over ceil(log2(d)) = 14
    iters should be <= 20

    // block-manager bound: the loop frees each superseded generation, so
    // after the run at most the final labels generation (plus nothing
    // else from this call) still holds blocks. unpersist is async ->
    // bounded retry before asserting.
    def stored() = spark.sparkContext.getRDDStorageInfo.length
    var waited = 0
    while (stored() > storedBefore + 2 && waited < 20) { Thread.sleep(250); waited += 1 }
    stored() should be <= (storedBefore + 2)
  }
}
