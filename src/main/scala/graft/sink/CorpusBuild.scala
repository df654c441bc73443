package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{GovernanceOps, LlmKit, OpsKit, TextOps}

/** The end-to-end curated-corpus build — the LLM-pipeline analog of
  * [[graft.MovieDbImport.run]] (reference analog: loader.py's main() is
  * the reference's one end-to-end entrypoint, loader.py:1; this is the
  * same idea for the training-data pipeline SURVEY §8 assembles
  * piecemeal). One call chains the committed per-stage operators, each
  * reusing the family's shared artifacts so the corpus is scanned a
  * bounded number of times end-to-end:
  *
  *   1. curation decisions (q100): quality → decontamination → near-dup
  *      closure per document, read from the disk-memoized decision
  *      artifact (ONE LSH + closure pass per battery, amortized);
  *   2. DoReMi mixture weights (q298): 8 Hedge rounds over per-source
  *      excess loss — the reference/proxy LMs come from the SHARED
  *      docBigrams artifact (corpus-wide statistics, one scan per
  *      battery), but the losses are evaluated on the KEPT pool only:
  *      the weights the build samples by describe the pool it samples
  *      from, not documents the gates already dropped;
  *   3. largest-remainder apportionment (q124's Hamilton method) of a
  *      budget T = n_kept div 2 across sources proportional to the
  *      DoReMi weights, then deterministic hash-priority selection
  *      within each source (the q89/q124 salted-md5 idiom — no RNG,
  *      same sample on any cluster);
  *   4. sequence packing (q54): greedy boundary-crossing layout of the
  *      selected docs into 2048-token bins, windowed per source;
  *   5. publish (q106's sink): hive-partitioned by source through
  *      [[CorpusPublish.publish]], then certify FROM THE FILES — the
  *      returned row set is one row per published source with the
  *      chain-side expectations (n_docs, n_kept, alpha, quota) joined
  *      against file-derived facts (n_selected, n_bins, n_tokens, and
  *      an order-independent MD5-slice checksum over doc_id, bin_id,
  *      text). A lost, duplicated, mis-assigned, or mis-packed row
  *      flips a checksum; the oracle replays the whole chain from the
  *      source tables, so the hash gate certifies the build, not just
  *      the final aggregation.
  *
  * Scale shape: the decision artifact and the bigram artifact are the
  * battery-amortized passes the family already pays; within this build
  * the corpus is scanned ONCE more (the kept-join → select → pack →
  * publish write). Iterative state (Hedge weights, apportionment) is
  * K ≈ 20 driver scalars re-entering the plan as literals — the
  * bounded-state idiom q271/q284/q298 pinned. The per-source windows
  * (selection rank, packing cumsum) partition on `source`, the same
  * shape q54/q124/q212 carry; at 100 TB each source packs and ranks in
  * its own task group, and the publish is the q106 one-shuffle layout.
  */
object CorpusBuild {
  /** Token budget per packed training row (q54's constant). */
  val BinTokens = 2048

  /** Per-doc MD5-slice row hash over the PUBLISHED columns that carry
    * the chain's decisions: identity, bin assignment, and content. */
  private def rowHash = conv(substring(md5(concat_ws("\u0001",
    col("doc_id"), col("bin_id"), col("text"))), 18, 15), 16, 10)
    .cast("long")

  def run(spark: SparkSession, dir: String, out: String): DataFrame = {
    import spark.implicits._

    // ---- stage 1: per-doc curation decisions (shared disk artifact) ----
    val dec = GovernanceOps.curationDecisions(spark, dir)
    // the decision table covers the doubled near-dup corpus; originals
    // (the publishable pool) are the sub-100000 ids — q100's convention
    val originals = dec.filter(col("doc_id") < 100000)
    val keptIds = originals.filter(col("decision") === "keep")
      .select(col("doc_id"))
    // per-source totals and kept counts from the decision artifact, NOT
    // from documents — no corpus scan, and the funnel numbers certified
    // here can never disagree with the decisions they summarize
    val perSrcRows = OpsKit.audited(originals.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("decision") === "keep", 1L).otherwise(0L))
          .as("n_kept")))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept")))
      .sortBy(_._1)

    // ---- stage 2: DoReMi weights on the kept pool (q298's LM chain) ----
    val dbg = TextOps.docBigrams(spark, dir)
    val cnt = dbg.groupBy(col("bg")).agg(sum(col("k")).as("c12"))
      .withColumn("w1", substring_index(col("bg"), "\u0001", 1))
    val prefix = cnt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = cnt
      .withColumn("w2", substring_index(col("bg"), "\u0001", -1))
      .groupBy(col("w2")).agg(sum(col("c12")).as("cu"))
    val ntot = vocab.agg(sum(col("cu")).as("nu"))
    val lm = cnt.join(prefix, "w1")
      .withColumn("w2", substring_index(col("bg"), "\u0001", -1))
      .join(broadcast(vocab), "w2")
    // LM statistics are corpus-wide (the shared artifact); the excess
    // losses integrate over KEPT docs only
    val perDoc = dbg.join(keptIds, "doc_id")
      .join(lm, "bg")
      .crossJoin(broadcast(ntot))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("k")).as("n_bg"),
        OpsKit.dsum(col("k").cast("double") * (col("c12").cast("double") /
          col("c1").cast("double"))).as("refs"),
        sum((col("k") * col("cu")).cast("decimal(38,0)")).as("proxys"),
        max(col("nu")).as("nu"))
      .select(col("source"),
        (col("refs") / col("n_bg").cast("double")).as("ref_prob"),
        (col("proxys").cast("double") /
          (col("n_bg").cast("double") * col("nu").cast("double")))
          .as("proxy_prob"))
    val lam = OpsKit.pinned(perDoc
      .select(col("source"),
        greatest(col("ref_prob") / col("proxy_prob") - lit(1.0), lit(0.0))
          .as("excess"))
      .groupBy(col("source"))
      .agg((OpsKit.dsum(col("excess")) / count(lit(1)).cast("double"))
        .as("excess_loss")))
    // the 8 Hedge rounds iterate K driver scalars — bit-identical to
    // q298's fold (and to the oracle's unrolled MATERIALIZED rounds):
    // (1+λ) polynomial weights, dsum-grid normalizer, 0.99/0.01 smoothing
    val lamRows = lam.select(col("source"), col("excess_loss")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq.sortBy(_._1)
    val kDom = lamRows.size
    var aMap = lamRows.map { case (src, _) => src -> 1.0 }.toMap
    for (_ <- 1 to 8) {
      val ar = lamRows.map { case (src, lamV) =>
        src -> aMap(src) * (1.0 + lamV)
      }
      val z = ar.map { case (_, v) =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      aMap = ar.map { case (src, v) =>
        src -> (0.99 * (v / z) + 0.01 / kDom.toDouble)
      }.toMap
    }

    // ---- stage 3: Hamilton apportionment of T = n_kept div 2 ----------
    // K scalars on the driver (the q124 method with DoReMi weights as
    // the apportionment measure instead of raw counts); floor/remainder
    // arithmetic is the identical IEEE double expression in the oracle
    val budget = perSrcRows.map(_._3).sum / 2
    val appo = lamRows.map { case (src, _) =>
      val a = aMap(src)
      val fq = math.floor(budget.toDouble * a).toLong
      (src, a, fq, budget.toDouble * a - fq)
    }
    val deficit = math.max(budget - appo.map(_._3).sum, 0L)
    val quotas = appo.sortBy { case (src, _, _, rem) => (-rem, src) }
      .zipWithIndex
      .map { case ((src, a, fq, _), i) =>
        (src, a, fq + (if (i < deficit) 1L else 0L))
      }
      .sortBy(_._1)

    // ---- stage 4: selection + packing + publish — ONE corpus scan -----
    val quotaDf = broadcast(quotas.toDF("src", "alpha", "quota"))
    val kept = OpsKit.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .join(keptIds, "doc_id")
    val wSel = Window.partitionBy(col("source"))
      .orderBy(LlmKit.strHash(
        concat(lit("q299:"), col("doc_id").cast("string"))), col("doc_id"))
    val wPack = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = kept.join(quotaDf, col("source") === col("src"))
      .withColumn("pick", row_number().over(wSel).cast("long"))
      .filter(col("pick") <= col("quota"))
      .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("n_toks")).over(wPack))
      .withColumn("bin_id",
        floor((col("cum") - col("n_toks")) / lit(BinTokens.toDouble)))
      .select(col("doc_id"), col("text"), col("n_toks"), col("bin_id"),
        col("source"))
    // audited: the publish write below executes this plan during query
    // construction — hand its documents scan to the scan gate first
    CorpusPublish.publish(OpsKit.audited(packed), out, "source", "doc_id",
      1000)

    // ---- stage 5: certify FROM THE FILES -------------------------------
    val cert = spark.read.parquet(out)
      .groupBy(col("source").cast("string").as("source"))
      .agg(count(lit(1)).as("n_selected"),
        countDistinct(col("bin_id")).as("n_bins"),
        // token totals recomputed from the published TEXT, not trusted
        // from the written n_toks column (which the checksum re-derives
        // through bin_id anyway): the files certify themselves
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        bit_xor(rowHash).as("checksum"))
    val expect = broadcast(perSrcRows.toSeq.toDF("source", "n_docs", "n_kept"))
    cert.join(expect, "source")
      .join(quotaDf, col("source") === col("src"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("alpha"),
        col("quota"), col("n_selected"), col("n_bins"), col("n_tokens"),
        col("checksum"))
  }
}
