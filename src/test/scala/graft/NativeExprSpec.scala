package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions must be BIT-identical to the declarative
  * higher-order-function forms they replaced (that equivalence is what
  * keeps the DuckDB oracles green — see LlmKit's parity contract). */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("vec_dot == aggregate(zip_with(...)) on every vector pair sample") {
    val declarative = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(5).select(col("embedding").as("b")))
    val diffs = pairs.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      declarative.as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise: no tolerance
      .count()
    assert(diffs == 0)
  }

  test("vec_dot is NULL on unequal-length vectors, like the declarative form") {
    val truncated = emb.select(col("embedding").as("a"),
      slice(col("embedding"), 1, 10).as("b"))
    val declarative = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val got = truncated.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      declarative.as("hof"))
    assert(got.filter(col("native").isNotNull || col("hof").isNotNull)
      .count() == 0)
  }

  test("lsh_bucket == declarative hyperplane fold on every vector") {
    val declarative = aggregate(sequence(lit(0), lit(7)), lit(0L), (acc, i) => {
      val proj = aggregate(sequence(lit(1), lit(64)), lit(0.0), (a, j) => {
        val v = ((i * 64 + j - 1) * lit(2654435761L)) % lit(4294967296L)
        a + element_at(col("embedding"), j.cast("int")).cast("double") *
          (v.cast("double") / 4294967296.0 - 0.5)
      })
      acc + when(proj > 0, pow(lit(2), i).cast("long")).otherwise(0L)
    })
    val diffs = emb.select(
      call_function("lsh_bucket", col("embedding")).as("native"),
      declarative.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
    // buckets actually spread (not a constant function)
    assert(emb.select(call_function("lsh_bucket", col("embedding")))
      .distinct().count() > 10)
  }

  test("hashed_shingles == declarative struct-state fold, incl. edge texts") {
    import spark.implicits._
    import graft.ops.LlmKit
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
      .unionByName(Seq("", " ", "a", "a b", "a b c", "a  b c ",
        "x y z w").toDF("text"))
    val diffs = docs.select(
      LlmKit.hashedShingles(col("text")).as("native"),
      LlmKit.hashedShinglesDeclarative(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("minhash_sig == declarative 32-minima fold, incl. empty hash array") {
    import spark.implicits._
    import graft.ops.LlmKit
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
      .unionByName(Seq("", "a", "a b c", "x y z w v").toDF("text"))
    val hs = docs.select(
      array_distinct(LlmKit.hashedShingles(col("text"))).as("ds"))
      // empty array: fold returns the all-P init; native must match
      .unionByName(spark.range(1)
        .select(array().cast("array<bigint>").as("ds")))
    val diffs = hs.select(
      call_function("minhash_sig", col("ds")).as("native"),
      LlmKit.minhashSigDeclarative(col("ds")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("simhash16 (set + weighted) == declarative folds, incl. edge texts") {
    import spark.implicits._
    import graft.ops.LlmKit
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
      .unionByName(Seq("", " ", "a", "a a", "a a b", "a  b c ",
        "é ü é", "x y z w").toDF("text"))
    val diffs = docs.select(
      call_function("simhash16", col("text")).as("ns"),
      LlmKit.simhashSetDeclarative(col("text")).as("ds"),
      call_function("simhash16_weighted", col("text")).as("nw"),
      LlmKit.simhashWeighted(col("text")).as("dw"))
      .filter(col("ns") =!= col("ds") || col("nw") =!= col("dw"))
      .count()
    assert(diffs == 0)
    // the two variants genuinely differ on repeated-token texts
    val differs = docs.select(
      (call_function("simhash16", col("text")) =!=
        call_function("simhash16_weighted", col("text"))).as("d"))
      .filter(col("d")).count()
    assert(differs > 0)
  }

  test("simhash60_weighted: low 16 sign bits coincide with simhash16_weighted") {
    // both widths share the per-bit counters for positions 0..15 (same
    // token hash, same vote rule), so the 16-bit signature must equal
    // the 60-bit signature masked to its low 16 bits — the invariant
    // that makes the widths interchangeable for banding/inspection
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
    val diffs = docs.select(
      call_function("simhash16_weighted", col("text")).as("w16"),
      call_function("simhash60_weighted", col("text"))
        .bitwiseAND(lit(0xffffL)).as("w60lo"))
      .filter(col("w16") =!= col("w60lo"))
      .count()
    assert(diffs == 0)
    // and the high bits genuinely carry information (the 60-bit value
    // exceeds 16 bits for real texts)
    val wide = docs.select(
      call_function("simhash60_weighted", col("text")).as("w"))
      .filter(col("w") > 65535L).count()
    assert(wide > 0)
  }

  test("minhash_sig: a null element updates nothing, like the declarative fold") {
    import graft.ops.LlmKit
    // array_distinct(hashed_shingles(...)) never produces nulls, but the
    // expression's contract covers them: the declarative fold's permuted
    // value is null and `least` skips nulls — the native skip branch must
    // agree. Exercised nowhere else (the property generator is null-free).
    val withNulls = spark.range(1).select(
      array(lit(7L), lit(null).cast("long"), lit(1103515L),
        lit(null).cast("long")).as("ds"))
    val rows = withNulls.select(
      call_function("minhash_sig", col("ds")).as("native"),
      LlmKit.minhashSigDeclarative(col("ds")).as("hof"),
      // null elements dropped entirely must give the same signature
      call_function("minhash_sig",
        array(lit(7L), lit(1103515L))).as("dense"))
    assert(rows.filter(col("native") =!= col("hof")
      || col("native") =!= col("dense")).count() == 0)
    assert(rows.filter(col("native").isNull).count() == 0)
  }

  test("minhash_sig property: random hash arrays match the declarative fold") {
    import spark.implicits._
    import graft.ops.LlmKit
    // 300 random arrays spanning empty → 200 elements, values across the
    // full mod-P range including 0 and P-1 (the permutation boundaries)
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.chooseNum(
      0L, LlmKit.MinhashP - 1, 0L, 1L, LlmKit.MinhashP - 1))
    val seed = org.scalacheck.rng.Seed(20260812L)
    val cases = Iterator.iterate(seed)(_.next).take(300)
      .map(s => gen.pureApply(org.scalacheck.Gen.Parameters.default, s))
      .toSeq
    val diffs = cases.toDF("ds")
      .select(
        call_function("minhash_sig", col("ds")).as("native"),
        LlmKit.minhashSigDeclarative(col("ds")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("simhash16 property: random token strings match the declarative folds") {
    import spark.implicits._
    import graft.ops.LlmKit
    // random texts over a tiny alphabet with repeated/empty tokens and
    // multi-space runs — the shapes that stress tokenization + distinct
    val tokGen = org.scalacheck.Gen.oneOf("a", "b", "ab", "ba", "", "aa")
    val gen = org.scalacheck.Gen.listOf(tokGen).map(_.mkString(" "))
    val seed = org.scalacheck.rng.Seed(20260813L)
    val cases = Iterator.iterate(seed)(_.next).take(300)
      .map(s => gen.pureApply(org.scalacheck.Gen.Parameters.default, s))
      .toSeq
    val diffs = cases.toDF("text")
      .select(
        call_function("simhash16", col("text")).as("ns"),
        LlmKit.simhashSetDeclarative(col("text")).as("ds"),
        call_function("simhash16_weighted", col("text")).as("nw"),
        LlmKit.simhashWeighted(col("text")).as("dw"))
      .filter(col("ns") =!= col("ds") || col("nw") =!= col("dw"))
      .count()
    assert(diffs == 0)
  }

  test("vec_dot property: random float vectors match zip_with bitwise") {
    import spark.implicits._
    // finite floats only: the parity contract is over well-formed
    // embeddings (NaN breaks =!= comparison semantics, not the fold)
    val gen = org.scalacheck.Gen.listOfN(64,
      org.scalacheck.Gen.chooseNum(-100f, 100f, 0f, 1e-7f, -1e-7f))
    val seed = org.scalacheck.rng.Seed(42L)
    val vecs = Iterator.iterate(seed)(_.next).take(200)
      .map(s => gen.pureApply(org.scalacheck.Gen.Parameters.default, s))
      .toSeq
    val pairs = vecs.zip(vecs.reverse).toDF("a", "b")
    val declarative = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diffs = pairs.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      declarative.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("bloom_might_contain == driver-side probes; q65 plan carries no UDF") {
    import spark.implicits._
    val vals = (1L to 500L).toDF("g")
    val bf = vals.filter(col("g") % 3 === 0).stat.bloomFilter("g", 1000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val got = vals.select(col("g"),
      call_function("bloom_might_contain", col("g"), lit(bytes)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 500L).foreach { g =>
      assert(got(g) == bf.mightContainLong(g), s"probe $g diverged")
    }
    // no false negatives — the prefilter contract q65 relies on
    assert((3L to 500L by 3).forall(got))
    // null probe → null result
    val n = Seq[Option[Long]](None).toDF("g")
      .select(call_function("bloom_might_contain", col("g"), lit(bytes)))
      .head()
    assert(n.isNullAt(0))
    // and the registered q65 plan is UDF-free end to end
    val plan = SparkEntry.queries("q65_bloom_contamination")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "q65 still has a Scala UDF node")
    // a NULL filter literal fails analysis cleanly (no NPE at planning)
    val err = intercept[Exception] {
      vals.select(call_function("bloom_might_contain", col("g"),
        lit(null).cast("binary"))).collect()
    }
    assert(err.getMessage.contains("non-NULL serialized filter"),
      s"expected analysis failure, got: ${err.getMessage}")
  }

  test("py_to_json null contract: NULL in, NULL out; junk in, NULL out") {
    import spark.implicits._
    val df = Seq(Some("[1, 2]"), Some("not python"), None).toDF("x")
      .select(call_function("py_to_json", col("x")).as("j"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq
      == Seq(Some("[1,2]"), None, None))
  }

  test("pos_tokens generator == posexplode(split), incl. edge texts") {
    import spark.implicits._
    // corpus rows + the split-semantics edge cases: empty string (ONE
    // empty token at pos 0), consecutive/leading/trailing spaces (empty
    // tokens kept, Spark limit=-1), NULL (zero rows)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, Some("")), (100002L, Some(" ")), (100003L, Some("a  b ")),
        (100004L, Option.empty[String])).toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val native = rows(docs.select(col("doc_id"),
      expr("pos_tokens(text)").as(Seq("pos", "tok"))))
    val declarative = rows(docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok"))))
    assert(native.nonEmpty)
    assert(native == declarative)
    // NULL text emits zero rows on both sides
    assert(!native.exists(_.head == 100004L))
  }
}
