package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality guards: the physical-plan properties the engine's scale
  * story depends on, asserted so a refactor can't silently regress them.
  * (Results are checked by the oracle gate; this spec checks the PLANS.)
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no accidental cartesian products anywhere") {
    // q31's brute-force cross join is the one INTENDED all-pairs scan
    // (broadcast nested loop against the pruned query side)
    for ((name, fn) <- SparkEntry.queries if name != "q31_cosine_topk") {
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("scans prune columns and push filters") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"filter not pushed:\n$p")
    assert(!p.contains("l_extendedprice"), "unused column not pruned")
  }

  test("star join broadcasts every dimension") {
    val p = plan("q16_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
  }

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("LSH band self-join is a shuffled join, not broadcast") {
    // broadcast would duplicate the signature computation per side
    val p = plan("q27_minhash_lsh")
    assert(p.contains("ShuffledHashJoin"), s"band join shape changed:\n$p")
  }

  test("native expressions appear in plans (not interpreted HOF fallbacks)") {
    assert(plan("q30_embed_neardup").contains("vec_dot"))
    assert(plan("q32_ann_lsh").contains("lsh_bucket"))
    assert(plan("q27_minhash_lsh").contains("hashed_shingles"))
    assert(plan("q23_pyliteral_roundtrip").contains("py_to_json"))
  }
}
