package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StarCC (q57) — the O(log n)-round connected components that replaces
  * diameter-bound label propagation at crawl scale. */
class StarCCSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.ops.StarCC

  test("256-node chain: correct labels in O(log n) rounds, not 256") {
    import spark.implicits._
    // the adversarial shape for label propagation: one path component of
    // diameter 255 (q47 would need ~255 rounds and trip its 50-round cap)
    val nodes = (0L until 256L).toDF("doc_id")
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) = StarCC.connectedComponents(nodes, chain)
    assert(rounds <= 15, s"took $rounds rounds — not logarithmic")
    assert(labels.filter(col("cluster_rep") =!= 0L).count() == 0)
  }

  test("mixed forest: pairs, a triangle, singletons, duplicate+reversed edges") {
    import spark.implicits._
    val nodes = (1L to 12L).toDF("doc_id")
    val edges = Seq(
      (2L, 1L), (1L, 2L),           // pair, both orientations
      (4L, 3L), (4L, 3L),           // duplicate edge
      (5L, 6L), (6L, 7L), (7L, 5L), // triangle
      (9L, 9L)                      // self-loop must be ignored
    ).toDF("id1", "id2")
    val (labels, _) = StarCC.connectedComponents(nodes, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L, 10L -> 10L, 11L -> 11L,
      12L -> 12L)
    assert(got == want)
  }

  test("empty edge set: every node is its own singleton") {
    import spark.implicits._
    val nodes = (1L to 5L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val (labels, rounds) = StarCC.connectedComponents(nodes, edges)
    assert(rounds == 1)
    assert(labels.filter(col("cluster_rep") =!= col("doc_id")).count() == 0)
  }

  test("property: random graphs match a sequential union-find exactly") {
    import spark.implicits._
    // 20 random graphs across densities: sparse forests, dense blobs, and
    // everything between — the oracle is a 40-line in-memory union-find,
    // an implementation with nothing in common with the star rounds
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(60)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val (labels, _) = StarCC.connectedComponents(
        (0L until n.toLong).toDF("doc_id"), edges.toDF("id1", "id2"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (n=$n, edges=$edges)")
    }
  }

  test("1000-node chain pins the q47/q57 crossover: log rounds vs diameter cap") {
    import spark.implicits._
    import graft.ops.GovernanceOps
    // the SCALING.md crossover claim, made falsifiable: on one path
    // component of diameter 999 the star rounds stay logarithmic while
    // min-label propagation (q47's engine) is diameter-bound — it MUST
    // hit its round cap loudly, never return half-propagated labels
    val nodes = (0L until 1000L).toDF("doc_id")
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id1", "id2")

    val (labels, starRounds) = StarCC.connectedComponents(nodes, chain)
    assert(starRounds <= 20,
      s"star CC took $starRounds rounds on a 1000-chain — not logarithmic")
    assert(labels.filter(col("cluster_rep") =!= 0L).count() == 0)

    val cap = intercept[IllegalStateException] {
      GovernanceOps.minLabelPropagation(nodes, chain, maxIters = 20)
    }
    assert(cap.getMessage.contains("not converged"))

    // and the positive side of the diameter bound: on a diameter-30 path
    // propagation converges, correctly, in >= diameter rounds — the round
    // count really is Θ(diameter), not an artifact of the cap
    val smallN = 31L
    val smallNodes = (0L until smallN).toDF("doc_id")
    val smallChain = (0L until smallN - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val (propLabels, propRounds) =
      GovernanceOps.minLabelPropagation(smallNodes, smallChain)
    assert(propRounds >= 30,
      s"propagation took only $propRounds rounds on a diameter-30 path")
    assert(propLabels.filter(col("cluster_rep") =!= 0L).count() == 0)
  }

  test("q57 == q47 on the near-dup corpus (same labeling, different algorithm)") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q47_dedup_clusters")(spark, dir)
    val b = SparkEntry.queries("q57_star_clusters")(spark, dir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
