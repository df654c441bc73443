package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kcorePeel (q153) — bounded-horizon k-core peeling on planted graphs
  * where the true core is known by construction. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.ops.GovernanceOps.kcorePeel

  private def core(nodes: Seq[Long], edges: Seq[(Long, Long)],
      k: Int, rounds: Int): Map[Long, (Boolean, Long)] = {
    import spark.implicits._
    kcorePeel(nodes.toDF("doc_id"), edges.toDF("id1", "id2"), k, rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
  }

  test("path graph has an empty 2-core; every node peels") {
    // a path's endpoints have degree 1; removing them exposes the next
    // pair, so the whole path unravels — the shape where a transitive
    // "everything is connected" claim is weakest
    val nodes = 0L until 8L
    val edges = (0L until 7L).map(i => (i, i + 1))
    val got = core(nodes, edges, 2, 8)
    assert(got.values.forall { case (in, deg) => !in && deg == 0L })
  }

  test("cycle survives at every node; attached pendant chain peels") {
    // C5 plus a tail 4-5-6: the cycle is exactly the 2-core, the tail
    // must peel even though node 4's INITIAL degree is 3
    val nodes = 0L until 7L
    val cycle = (0L until 5L).map(i => (i, (i + 1) % 5))
    val tail = Seq((4L, 5L), (5L, 6L))
    val got = core(nodes, cycle ++ tail, 2, 6)
    (0L until 5L).foreach { n =>
      assert(got(n) == ((true, 2L)), s"cycle node $n")
    }
    Seq(5L, 6L).foreach { n =>
      assert(got(n) == ((false, 0L)), s"tail node $n")
    }
  }

  test("clique core degrees equal clique size minus one; k=3 keeps it") {
    val nodes = 0L until 6L
    val k4 = for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)
    val pendant = Seq((3L, 4L), (4L, 5L))
    val got = core(nodes, k4 ++ pendant, 3, 6)
    (0L until 4L).foreach(n => assert(got(n) == ((true, 3L))))
    Seq(4L, 5L).foreach(n => assert(got(n) == ((false, 0L))))
  }

  test("bounded horizon is a cap, not the cost: long path within rounds") {
    // 64-node path: peeling strips both endpoints each round, so full
    // unraveling needs 32 rounds — but the early exit must stop the
    // moment a round removes nothing, so an already-empty alive set
    // does not burn the remaining horizon (this also pins the fixed
    // 4-round production setting as "cap, not chase": a graph whose
    // peel does NOT converge within the horizon reports the partial
    // peel deterministically, same as the oracle's unrolled rounds)
    val nodes = 0L until 64L
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = core(nodes, edges, 2, 64)
    assert(got.values.forall { case (in, _) => !in })
  }

  test("isolated nodes never enter the core and report degree 0") {
    val nodes = 0L until 4L
    val edges = Seq((0L, 1L)) // 2 and 3 isolated, 0-1 a bare pair
    val got = core(nodes, edges, 2, 4)
    assert(got.values.forall { case (in, deg) => !in && deg == 0L })
  }
}
