package graft

import org.scalatest.funsuite.AnyFunSuite

/** q101 exact-substring span semantics, checked against the raw texts:
  *
  *  - soundness: every reported (doc1, doc2, start1, start2, span) row
  *    is a REAL verbatim token match — the two slices are identical;
  *  - maximality: no reported span can be extended a token left or right
  *    (gaps-and-islands merged the full diagonal run);
  *  - completeness: every planted near-dup pair (x, x+100000 = x minus
  *    its first token) with ≥ 9 tokens yields its full-length span
  *    (start1=2, start2=1, span = n-1) — at sf0.001 the df>100 stop-gram
  *    guard never fires, so nothing splits the planted diagonals.
  */
class SubstrSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val toks: Map[Long, Array[String]] = {
    import org.apache.spark.sql.functions.col
    val base = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    base ++ base.map { case (id, t) => (id + 100000L) -> t.drop(1) }
  }

  private lazy val spans =
    SparkEntry.queries("q101_substr_spans")(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }

  test("q101 spans are sound and maximal against the raw texts") {
    assert(spans.nonEmpty)
    for ((d1, d2, s1, s2, n) <- spans) {
      val (a, b) = (toks(d1), toks(d2))
      val (i, j, len) = (s1.toInt - 1, s2.toInt - 1, n.toInt)
      assert(a.slice(i, i + len).sameElements(b.slice(j, j + len)),
        s"span ($d1,$d2,$s1,$s2,$n) is not a verbatim match")
      val leftExtend = i > 0 && j > 0 && a(i - 1) == b(j - 1)
      val rightExtend = i + len < a.length && j + len < b.length &&
        a(i + len) == b(j + len)
      assert(!leftExtend && !rightExtend,
        s"span ($d1,$d2,$s1,$s2,$n) is extendable — run not maximal")
    }
  }

  test("q101 finds every planted full-length span") {
    val expected = toks.keys.filter(_ < 100000)
      .filter(id => toks(id).length >= 9)
      .map(id => (id, id + 100000L, 2L, 1L, toks(id).length - 1L))
    val got = spans.toSet
    for (e <- expected)
      assert(got.contains(e), s"planted span $e missing")
  }
}
