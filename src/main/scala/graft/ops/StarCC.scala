package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components by alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — public algorithm). Each round contracts every node toward
  * the minimum id reachable through its neighborhood, so the component
  * count of rounds is O(log n) for ANY graph shape — unlike min-label
  * propagation (q47), whose round count is the component DIAMETER and
  * which a single long-chain component (mirrored sites, quote chains)
  * stretches into hundreds of shuffles at crawl scale.
  *
  * Edge lists are kept canonical (id1 > id2, distinct, no self-loops);
  * both star steps preserve that orientation, so each round is two
  * groupBy-min + two join shuffles over the current edge set — no
  * per-node state table, no driver-side graph.
  */
object StarCC {

  /** Large-star: symmetrize, then connect every neighbor LARGER than u
    * to m(u) = min(N(u) ∪ {u}). Emitted pairs keep id1 > id2 (v > u ≥ m). */
  private[ops] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("id1").as("u"), col("id2").as("v"))
      .unionAll(e.select(col("id2").as("u"), col("id1").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("id1"), col("m").as("id2"))
      .distinct()
  }

  /** Small-star: orient larger→smaller, then connect every smaller
    * neighbor AND u itself to m(u) = min of the smaller neighborhood.
    * All emitted pairs (a, m) have a > m. */
  private[ops] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("id1"), col("id2")).as("u"),
      least(col("id1"), col("id2")).as("v"))
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    dir.join(mins, Seq("u"))
      .select(col("v").as("a"), col("m"))
      .unionAll(mins.select(col("u").as("a"), col("m")))
      .filter(col("a") =!= col("m"))
      .select(col("a").as("id1"), col("m").as("id2"))
      .distinct()
  }

  /** Cheap per-round convergence witness: (count, Σid1, Σid2) in exact
    * decimal (id·count products overflow BIGINT at crawl scale). Both
    * star steps only move endpoints toward component minima, so a stable
    * triple across a full round means a stable edge set in practice; the
    * star-forest invariant check after the loop makes the result
    * certified, not assumed. */
  private def witness(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
    val r = e.agg(count(lit(1)),
      sum(col("id1").cast(DecimalType(38, 0))),
      sum(col("id2").cast(DecimalType(38, 0)))).head()
    (r.getLong(0),
      Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO),
      Option(r.getDecimal(2)).getOrElse(java.math.BigDecimal.ZERO))
  }

  /** Component label per node: (doc_id, cluster_rep) with cluster_rep =
    * the minimum doc_id in the node's component (itself for singletons).
    * Returns the labels plus the number of alternating rounds executed.
    *
    * `maxRounds` guards a logic bug, not a data shape — 30 rounds covers
    * any graph below 2^30 nodes with margin; hitting it fails LOUDLY
    * rather than returning unconverged labels that look like an answer. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    // Lineage MUST be truncated each round: one star round references its
    // input ~6 times, so an un-checkpointed loop builds a 6^rounds-node
    // logical plan and the driver dies in the analyzer long before any
    // data moves (a cache() alone truncates only the physical plan).
    // localCheckpoint materializes the round's edges and restarts the
    // plan from the stored partitions; on a cluster where executor loss
    // matters, set a checkpoint dir and swap in reliable checkpoint().
    var e = pairs
      .filter(col("id1") =!= col("id2"))
      .select(greatest(col("id1"), col("id2")).as("id1"),
        least(col("id1"), col("id2")).as("id2"))
      .distinct().transform(OpsKit.pinned)
    var w = witness(e)
    var rounds = 0
    var converged = false
    while (!converged) {
      if (rounds >= maxRounds) throw new IllegalStateException(
        s"star CC not converged after $maxRounds rounds (witness $w)")
      val next = OpsKit.pinned(smallStar(largeStar(e)))
      val w2 = witness(next)
      converged = w2 == w
      e = next
      w = w2
      rounds += 1
    }
    // Certify the star-forest invariant the witness only suggests: no
    // center is also a leaf (two hash joins' worth of work, once).
    val nonForest = e.alias("l")
      .join(e.alias("r"), col("l.id2") === col("r.id1"), "left_semi")
      .head(1)
    if (nonForest.nonEmpty) throw new IllegalStateException(
      s"star CC converged to a non-forest: leaf edge at ${nonForest.head}")
    val reps = e.groupBy(col("id1")).agg(min(col("id2")).as("rep"))
      .select(col("id1").as("doc_id"), col("rep"))
    val labels = nodes.select(col("doc_id"))
      .join(reps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
    (labels, rounds)
  }
}
