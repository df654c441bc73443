package graft

import org.scalatest.funsuite.AnyFunSuite

/** q86 SemDeDup semantics: the within-cluster drop must remove exactly
  * the planted duplicate generation (every +100000 re-keyed copy, which
  * shares its original's cluster) and nothing else — the synthetic
  * embeddings' natural within-cluster cosine ceiling (~0.49) sits far
  * below the 0.99 threshold, so a false drop means the pair pipeline
  * compared across clusters or the threshold drifted. */
class SemDeDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q86 drops exactly the planted copies, keeps every original") {
    val rows = SparkEntry.queries("q86_semantic_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(2))
      .toMap
    val planted = rows.keySet.filter(_ >= 100000)
    assert(planted.nonEmpty, "corpus did not plant any copies")
    // every planted copy is a drop; every base vector survives
    for ((id, kept) <- rows)
      assert(kept == (id < 100000),
        s"vec $id: kept=$kept (expected ${id < 100000})")
    // and the planted set is exactly the %7==3 re-keying of the base ids
    val base = rows.keySet.filter(_ < 100000)
    assert(planted == base.filter(_ % 7 == 3).map(_ + 100000))
  }
}
