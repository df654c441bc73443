package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.EagerAggregation]]: the rewrite must (a) actually
  * insert a partial aggregate below the join on eligible shapes, and
  * (b) NEVER change a row — every case here compares rule-on vs
  * rule-off collect()s on the driver testdata, including the shapes the
  * rule must refuse (the refusal cases double as the semantics
  * boundary: each names the hazard that makes eager aggregation WRONG
  * or unprofitable there).
  */
class EagerAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // lazy vals, not defs: `li("l_partkey")` must resolve against the
  // SAME plan instance the join receiver was built from
  private lazy val li = spark.read.parquet(s"$dir/lineitem.parquet")
  private lazy val part = spark.read.parquet(s"$dir/part.parquet")
  private lazy val orders = spark.read.parquet(s"$dir/orders.parquet")

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.eageragg", on.toString)
    try f finally spark.conf.unset("spark.graft.eageragg")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def assertParity(build: => DataFrame,
      expectPush: Boolean): Unit = {
    val off = withRule(on = false)(sortedRows(build))
    withRule(on = true) {
      val df = build
      val plan = df.queryExecution.optimizedPlan.toString
      val pushed = plan.contains("_eager_p")
      assert(pushed == expectPush,
        s"expected pushed=$expectPush:\n$plan")
      assert(sortedRows(df) == off, "eager aggregation changed rows")
    }
  }

  test("fact-dim star aggregate: partial agg lands below the join, rows equal") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("q"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi")),
      expectPush = true)
  }

  test("decimal sums keep their exact type and values through the re-sum") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_extendedprice").cast("decimal(28,6)")).as("s")),
      expectPush = true)
  }

  test("grouping by a fact column keeps it as a partial key") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"), col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("q")),
      expectPush = true)
  }

  test("aggregates reading the DIM side push into the right leg") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("p_retailprice")).as("mx")),
      expectPush = true)
  }

  test("avg of a double pushes via its (sum, count) decomposition") {
    // a naive partial MEAN would re-weight under join replication; the
    // rule splits avg into partial sum + partial count, both of which
    // see every raw row through their partial — so the recombined
    // Σsum/Σcount is the raw-row mean exactly
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand")).agg(avg(col("l_quantity")).as("a")),
      expectPush = true)
  }

  test("refusal: avg of a DECIMAL (bespoke precision semantics)") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(avg(col("l_extendedprice").cast("decimal(18,2)")).as("a")),
      expectPush = false)
  }

  test("refusal: DISTINCT aggregates") {
    // count(DISTINCT x) over pre-grouped rows loses cross-key duplicates
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("l_suppkey")).as("d")),
      expectPush = false)
  }

  test("refusal: outer joins") {
    // a left-outer NULL-extends unmatched partials differently than
    // unmatched raw rows (one NULL row vs f of them feeding count)
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"), "left")
        .groupBy(col("l_returnflag"))
        .agg(count(col("p_brand")).as("n")),
      expectPush = false)
  }

  test("refusal: aggregate reading both sides") {
    assertParity(
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity") * col("p_retailprice")).as("rev")),
      expectPush = false)
  }

  test("keyless push over an EMPTY side fabricates no groups") {
    // r11 advisor (medium): when grouping and condition reference only
    // the NON-pushed side, the pushed side's partial aggregate has no
    // keys — and a keyless Aggregate emits one row even on empty input,
    // so the rewritten join would manufacture groups (count=0/sum=null)
    // where the raw plan's empty join emits zero rows. Shape that hits
    // it: runtime-empty LEFT leg (a filter the optimizer can't fold to
    // an empty relation) under an INNER join whose condition references
    // only the RIGHT side (Cross joins are already refused by the
    // joinType guard), grouping on the RIGHT, count(1) as the only
    // aggregate — count references no side, so tryPush tries LEFT
    // first, finds it "contains" the aggregate, and computes an EMPTY
    // partial key set. The keys.isEmpty guard must bail there; the
    // RIGHT push that then fires is keyed (p_brand, p_size) and sound,
    // so rows still match the raw plan: zero.
    val empty = li.filter(col("l_quantity") < lit(-1)) // empty at runtime
    def shape = empty.select(col("l_orderkey"))
      .join(part, part("p_size") >= 0)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    assertParity(shape, expectPush = true) // the sound keyed right push
    // and the ground truth itself: the raw shape yields 0 rows, so the
    // rule-on plan must too (pre-guard, the keyless left push emitted
    // one all-zero partial row and fabricated a group per brand)
    val n = withRule(on = true)(shape.count())
    assert(n == 0L, s"empty-side keyless join fabricated $n groups")
  }

  test("three-way join chain: the rule composes with itself bottom-up") {
    // Aggregate over (li ⋈ orders) ⋈ part: transformUp first rewrites
    // nothing at the inner join (no Aggregate directly above it), then
    // pushes the partial below the OUTER join; fixed-point must not
    // stack a second partial on our own output
    assertParity(
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("q")),
      expectPush = true)
  }

  test("oracle parity battery: q16-style star join under the rule") {
    // the registered star-join query collects identically with the rule
    // forced on — the cheap end-to-end sanity on real query code
    val name = "q16_star_join"
    val off = withRule(on = false)(
      sortedRows(SparkEntry.queries(name)(spark, dir)))
    val on = withRule(on = true)(
      sortedRows(SparkEntry.queries(name)(spark, dir)))
    assert(on == off)
  }
}
