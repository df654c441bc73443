package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-technique operators: shapes that only matter past a single node,
  * expressed so the driver's oracle can still verify them at small SF.
  */
object ScaleOps {
  import LlmKit.{strHash, strHashSql, MinhashP}
  import OpsKit._

  /** Grouped phased CDF: exact cumulative weight per (key, v) with the
    * group key in EVERY partitioning (q148's global shape, grouped) —
    * no unpartitioned window anywhere. Shared by the KLL certification
    * twins: q256 keys by source, q257 by window_start; a change to the
    * 1024-bucket grid or the run/offset algebra reaches both gates.
    * Input: (key, v double); output: (key, v, cw). */
  private def groupedPhasedCdf(vals: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cdf = vals.groupBy(col(key), col("v"))
      .agg(count(lit(1)).as("c"))
    val bounds = cdf.groupBy(col(key))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val keyed = cdf.join(broadcast(bounds), key).withColumn("b",
      when(col("hi") > col("lo"), least(lit(1023),
        floor((col("v") - col("lo")) * 1024.0 / (col("hi") - col("lo")))
          .cast("int"))).otherwise(lit(0)))
    val run = keyed.withColumn("rc",
      sum(col("c")).over(Window.partitionBy(col(key), col("b"))
        .orderBy(col("v"))))
    val off = keyed.groupBy(col(key), col("b"))
      .agg(sum(col("c")).as("tb"))
      .select(col(key), col("b"),
        coalesce(sum(col("tb")).over(Window.partitionBy(col(key))
          .orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("o"))
    run.join(broadcast(off), Seq(key, "b"))
      .select(col(key), col("v"), (col("rc") + col("o")).as("cw"))
  }

  def all: Seq[NamedQuery] = Seq(

    // ----- q38: salted two-phase aggregation over skewed keys -------------
    // events has only 5 event_type values → every key is hot at 100 TB.
    // Phase 1 aggregates by (key, salt) so the heavy lifting spreads over
    // 16×|keys| reducers; phase 2 combines the 80 partials. dsum's decimal
    // arithmetic makes the two-phase result bit-identical to a direct
    // aggregation, which is exactly what the oracle computes.
    NamedQuery(
      "q38_salted_agg",
      (s, d) => {
        val salted = events(s, d)
          .withColumn("salt", pmod(col("event_id"), lit(16)))
          .groupBy(col("event_type"), col("salt"))
          .agg(count(lit(1)).as("n_part"),
            sum(col("value").cast("decimal(28,6)")).as("sum_part"))
        salted.groupBy(col("event_type"))
          .agg(sum(col("n_part")).as("n"),
            sum(col("sum_part")).cast("double").as("sum_value"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
              |  ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY event_type""".stripMargin)),

    // ----- q40: rollup (hierarchical subtotals, one shuffle) --------------
    NamedQuery(
      "q40_rollup",
      (s, d) =>
        tbl(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
              |FROM lineitem
              |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // ----- q50: exact interpolated percentiles per group ------------------
    // Spark `percentile` and DuckDB `quantile_cont` both compute linear
    // interpolation over the sorted values — same arithmetic, hash-exact.
    NamedQuery(
      "q50_percentiles",
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"))
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"),
            expr("percentile(value, 0.99)").as("p99")),
      Some("""SELECT event_type,
             |  quantile_cont(value, 0.5) AS p50,
             |  quantile_cont(value, 0.95) AS p95,
             |  quantile_cont(value, 0.99) AS p99
             |FROM events GROUP BY event_type""".stripMargin)),

    // ----- q51: correlated scalar subquery (Catalyst decorrelation) -------
    NamedQuery(
      "q51_correlated_subquery",
      (s, d) => {
        events(s, d).createOrReplaceTempView("ev_q51")
        // the same ANSI text the oracle runs, modulo the view name —
        // exercises spark.sql + Catalyst's subquery decorrelation
        s.sql(s"""SELECT event_id, user_id, value FROM ev_q51 e
                 |WHERE value > 2 * (SELECT ${davgSql("i.value")}
                 |  FROM ev_q51 i WHERE i.user_id = e.user_id)""".stripMargin)
      },
      Some(s"""SELECT event_id, user_id, value FROM events e
              |WHERE value > 2 * (SELECT ${davgSql("i.value")}
              |  FROM events i WHERE i.user_id = e.user_id)""".stripMargin)),

    // ----- q41: HLL sketch distinct (approx_count_distinct) ---------------
    // The built-in HLL++'s sketch internals are engine-specific, so the
    // raw estimate can never hash-match a DuckDB oracle (q79's hand-rolled
    // HLL closes that gap bit-exactly). What CAN be verified exactly: the
    // exact distinct count, and that the estimate honors its error
    // contract. The estimate therefore ships as a bounded-error boolean —
    // rsd=0.05 default, bound 3σ=15%; deterministic for a given input, not
    // flaky — and the oracle emits TRUE, so rows+schema+hash cover the
    // whole output instead of the previous rows-only check.
    NamedQuery(
      "q41_approx_distinct",
      (s, d) =>
        tbl(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("token"))
          .groupBy(col("lang"))
          .agg(approx_count_distinct(col("token")).as("approx"),
            countDistinct(col("token")).as("exact_tokens"))
          .select(col("lang"), col("exact_tokens"),
            (abs(col("approx") - col("exact_tokens")).cast("double") <=
              lit(0.15) * col("exact_tokens").cast("double"))
              .as("approx_within_15pct")),
      Some("""SELECT lang, COUNT(DISTINCT token) AS exact_tokens,
             |  TRUE AS approx_within_15pct
             |FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
             |      FROM documents)
             |GROUP BY lang""".stripMargin)),

    // ----- q66: cube (all grouping-set combinations, one shuffle) ---------
    // Completes the multi-dimensional aggregate surface next to q40's
    // rollup: CUBE(source, lang) emits all four grouping sets in ONE
    // expand + ONE hash aggregate — no union of four scans. grouping_id
    // disambiguates a real NULL group value from a subtotal row (the
    // standard pitfall cube queries hit); both engines number the bits
    // identically (left column = high bit).
    NamedQuery(
      "q66_cube",
      (s, d) =>
        tbl(s, d, "documents")
          .cube(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            grouping_id().as("gid")),
      Some("""SELECT source, lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(GROUPING(source, lang) AS BIGINT) AS gid
             |FROM documents
             |GROUP BY CUBE(source, lang)""".stripMargin)),

    // ----- q67: bounded-memory top-k via a typed Aggregator (udaf) --------
    // The custom-aggregate extension surface: a space-saving top-k sketch
    // ([[graft.functions.SpaceSavingTopK]]) run as a first-class
    // aggregate — partial aggregation, merge, and finish all inside one
    // hash-aggregate plan node. Per source, the top-3 tokens. Exact here
    // (vocabulary ≪ cap=64, see the Aggregator's determinism contract)
    // so the oracle is the materialize-everything count + window-rank
    // form — the formulation this operator exists to REPLACE at 100 TB,
    // where per-group state must stay bounded.
    NamedQuery(
      "q67_topk_udaf",
      (s, d) => {
        val topk = udaf(new graft.functions.SpaceSavingTopK(64, 3))
        tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"))
          .agg(topk(col("tok")).as("t"))
          // CSV-stringified: the driver's compare hashes scalar cells
          .select(col("source"),
            array_join(col("t.top_toks"), ",").as("top_toks"),
            array_join(transform(col("t.top_counts"), _.cast("string")), ",")
              .as("top_counts"))
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, COUNT(*) AS c
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY source, tok),
             |r AS (
             |  SELECT source, tok, c,
             |    row_number() OVER (PARTITION BY source
             |                       ORDER BY c DESC, tok) AS rn
             |  FROM tc)
             |SELECT source,
             |  array_to_string(list(tok ORDER BY rn), ',') AS top_toks,
             |  array_to_string(list(c ORDER BY rn), ',') AS top_counts
             |FROM r WHERE rn <= 3 GROUP BY source""".stripMargin)),

    // ----- q78: count-min sketch with cross-engine-exact arithmetic -------
    // The classic streaming frequency sketch, hand-rolled so BOTH engines
    // compute the identical structure (unlike q41's built-in HLL, whose
    // internals are engine-specific and get only a rows-only check):
    // 4 rows × 16 counters — the width sits BELOW the corpus's 31-token
    // vocabulary on purpose: at 100 TB the vocabulary always dwarfs the
    // sketch width and collisions are the operating regime, but a 512-
    // wide sketch over 31 types never collided and the overcount column
    // was identically zero at every SF (r12 degeneracy sweep) — a CMS
    // whose error path never executes certifies only half the sketch.
    // Row r maps token hash h to bucket
    // (A(r)·h + B(r)) mod P mod 16 with the same closed-form
    // coefficients the MinHash family uses — all integer arithmetic, so
    // the oracle hash-matches exactly. The sketch build is ONE partially-
    // aggregated groupBy over (row, bucket) — 2048 counters total no
    // matter the corpus size — and the probe (every distinct token) reads
    // its 4 counters and takes the min. CMS guarantee surfaces in the
    // output: est ≥ exact always, equality unless the probe collided in
    // all 4 rows.
    NamedQuery(
      "q78_countmin",
      (s, d) => {
        val W = 16
        def bucket(r: Int, h: org.apache.spark.sql.Column) = {
          val a = (1103515245L * (r + 1)) % MinhashP
          val b = (12345L + 2654435761L * r) % MinhashP
          pmod(pmod(lit(a) * h + lit(b), lit(MinhashP)), lit(W))
        }
        val toks = tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .select(col("tok"), (strHash(col("tok")) % MinhashP).as("h"))
        val exact = toks.groupBy(col("tok"), col("h"))
          .agg(count(lit(1)).as("exact"))
        // the sketch aggregates FROM the vocabulary-sized exact counts
        // (Σ over a token's occurrences == its count), so the corpus-wide
        // explode + md5 pass runs exactly once, not once per structure
        val cells = exact.select(col("exact"), col("h"),
          explode(array((0 until 4).map(r =>
            struct(lit(r).as("r"), bucket(r, col("h")).as("bkt"))): _*))
            .as("cell"))
          .groupBy(col("cell.r").as("r"), col("cell.bkt").as("bkt"))
          .agg(sum(col("exact")).as("c"))
        val probes = exact.select(col("tok"), col("h"), col("exact"),
          explode(array((0 until 4).map(r =>
            struct(lit(r).as("r"), bucket(r, col("h")).as("bkt"))): _*))
            .as("cell"))
          .select(col("tok"), col("exact"),
            col("cell.r").as("r"), col("cell.bkt").as("bkt"))
        // the sketch is ≤ 2048 rows by construction — broadcast it so the
        // vocabulary-sized probe side never shuffles
        probes.join(broadcast(cells), Seq("r", "bkt"))
          .groupBy(col("tok"), col("exact"))
          .agg(min(col("c")).as("cms_est"))
          .select(col("tok"), col("exact"), col("cms_est"),
            (col("cms_est") - col("exact")).as("overcount"))
      },
      Some {
        val h = s"${strHashSql("tok")} % $MinhashP"
        def bucketSql(r: Int): String = {
          val a = (1103515245L * (r + 1)) % MinhashP
          val b = (12345L + 2654435761L * r) % MinhashP
          s"(($a * h + $b) % $MinhashP) % 16"
        }
        val cellList = (0 until 4)
          .map(r => s"{'r': $r, 'bkt': ${bucketSql(r)}}").mkString("[", ", ", "]")
        s"""WITH toks AS (
           |  SELECT tok, $h AS h FROM (
           |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
           |cells AS (
           |  SELECT c.cell.r AS r, c.cell.bkt AS bkt, COUNT(*) AS c
           |  FROM (SELECT unnest($cellList) AS cell FROM toks) c
           |  GROUP BY c.cell.r, c.cell.bkt),
           |exact AS (
           |  SELECT tok, h, COUNT(*) AS exact FROM toks GROUP BY tok, h),
           |probes AS (
           |  SELECT tok, exact, p.cell.r AS r, p.cell.bkt AS bkt
           |  FROM (SELECT tok, exact, unnest($cellList) AS cell
           |        FROM exact) p)
           |SELECT tok, exact, CAST(MIN(c) AS BIGINT) AS cms_est,
           |  CAST(MIN(c) - exact AS BIGINT) AS overcount
           |FROM probes JOIN cells USING (r, bkt)
           |GROUP BY tok, exact""".stripMargin
      }),

    // ----- q79: hand-rolled HyperLogLog with a full oracle ----------------
    // The mergeable cardinality sketch, built from scratch so the DuckDB
    // oracle verifies the ENTIRE structure (q41's built-in HLL gets only
    // a rows-only check — its internals are engine-private). 64 registers
    // per group: bucket = h mod 64, register = max first-1-bit rank of
    // the remaining 54 hash bits (all integers — rank via length(bin(v)),
    // identical in both engines). The estimate is the raw HLL formula
    // α·m²/Z with Z folded over the registers in bucket order, empty
    // registers appended as one exact multiple — every double op happens
    // in the same sequence in both engines, so even the ESTIMATE
    // hash-matches bit-exactly. The register table is a partially-
    // aggregated (group, bucket) max — 64 longs per group per partition,
    // the textbook mergeable-summary shape. Exact distinct rides along
    // to make the sketch's error visible.
    NamedQuery(
      "q79_hll",
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .select(col("lang"), col("tok"), strHash(col("tok")).as("h"))
        val ranked = toks.select(col("lang"),
          pmod(col("h"), lit(64)).as("bkt"),
          expr("shiftright(h, 6)").as("v"))
          .select(col("lang"), col("bkt"),
            when(col("v") === 0, lit(55))
              .otherwise(lit(55) - length(bin(col("v")))).as("rank"))
        val regs = ranked.groupBy(col("lang"), col("bkt"))
          .agg(max(col("rank")).as("m"))
        // α from integer-cast divisions: a direct 0.7213 literal parses
        // as DECIMAL in DuckDB and may round differently from Spark's
        // double literal — integer→double casts are exact on both sides
        val alpha = (lit(7213.0) / lit(10000.0)) /
          (lit(1.0) + (lit(1079.0) / lit(1000.0)) / lit(64.0))
        val est = regs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_regs"),
            sort_array(collect_list(struct(col("bkt"), col("m")))).as("rm"))
          .select(col("lang"), col("n_regs"),
            (aggregate(col("rm"), lit(0.0),
              (acc, p) => acc + lit(1.0) / pow(lit(2.0), p.getField("m"))) +
              (lit(64) - col("n_regs")).cast("double")).as("z"))
          .select(col("lang"), col("n_regs"),
            (alpha * lit(4096.0) / col("z")).as("hll_est"))
        val exact = toks.groupBy(col("lang"))
          .agg(countDistinct(col("tok")).as("exact_distinct"))
        est.join(exact, "lang")
      },
      Some {
        val h = strHashSql("tok")
        s"""WITH toks AS (
           |  SELECT lang, tok, $h AS h FROM (
           |    SELECT lang, unnest(string_split(text, ' ')) AS tok
           |    FROM documents)),
           |ranked AS (
           |  SELECT lang, h % 64 AS bkt,
           |    CASE WHEN (h // 64) = 0 THEN 55
           |         ELSE 55 - length(bin(h // 64)) END AS rank
           |  FROM toks),
           |regs AS (
           |  SELECT lang, bkt, MAX(rank) AS m
           |  FROM ranked GROUP BY lang, bkt),
           |folded AS (
           |  SELECT lang, COUNT(*) AS n_regs,
           |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list_transform(list(m ORDER BY bkt), mm ->
           |        CAST(1 AS DOUBLE) / pow(CAST(2 AS DOUBLE), mm))),
           |      (a, b) -> a + b)
           |      + CAST(64 - COUNT(*) AS DOUBLE) AS z
           |  FROM regs GROUP BY lang),
           |exact AS (
           |  SELECT lang, COUNT(DISTINCT tok) AS exact_distinct
           |  FROM toks GROUP BY lang)
           |SELECT f.lang, f.n_regs,
           |  ((CAST(7213 AS DOUBLE) / CAST(10000 AS DOUBLE))
           |     / (CAST(1 AS DOUBLE)
           |        + (CAST(1079 AS DOUBLE) / CAST(1000 AS DOUBLE))
           |          / CAST(64 AS DOUBLE)))
           |    * CAST(4096 AS DOUBLE) / f.z AS hll_est,
           |  e.exact_distinct
           |FROM folded f JOIN exact e USING (lang)""".stripMargin
      }),

    // ----- q87: cross-source vocabulary overlap via MERGED HLL sketches ---
    // The mergeability payoff q79 only claims: per-source HLL registers
    // (source, bucket, max-rank) are built ONCE from one token-stream
    // shuffle, then every source pair's UNION cardinality comes from
    // merging two 64-register summaries by element-wise max — 190 pairs ×
    // 64 registers, never a re-scan of the corpus. At 100 TB this is how
    // cross-shard overlap matrices are computed: sketch per shard in one
    // pass, merge sketches driver-side-small. The estimate reuses q79's
    // bit-exact fold (registers in bucket order, empties appended as one
    // exact multiple, α from integer-cast divisions) so even the DOUBLE
    // column hash-matches. Exact |A∩B| (distinct-token equi-join, shuffles
    // on the token — uniform keys) and |A∪B| = nA + nB − |A∩B| ride along
    // to make the sketch error visible, same witness pattern as q78/q79.
    NamedQuery(
      "q87_hll_union",
      (s, d) => {
        val dt = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val ranked = dt.select(col("source"), strHash(col("tok")).as("h"))
          .select(col("source"), pmod(col("h"), lit(64)).as("bkt"),
            expr("shiftright(h, 6)").as("v"))
          .select(col("source"), col("bkt"),
            when(col("v") === 0, lit(55))
              .otherwise(lit(55) - length(bin(col("v")))).as("rank"))
        val regs = ranked.groupBy(col("source"), col("bkt"))
          .agg(max(col("rank")).as("m"))
        val srcs = dt.select(col("source")).distinct()
        val pairs = srcs.select(col("source").as("src_a"))
          .crossJoin(srcs.select(col("source").as("src_b")))
          .filter(col("src_a") < col("src_b"))
        // merged registers: union both sides' registers per pair, max per
        // bucket — the HLL merge operation itself
        val merged = pairs
          .join(regs.withColumnRenamed("source", "src_a"), Seq("src_a"))
          .select(col("src_a"), col("src_b"), col("bkt"), col("m"))
          .unionByName(pairs
            .join(regs.withColumnRenamed("source", "src_b"), Seq("src_b"))
            .select(col("src_a"), col("src_b"), col("bkt"), col("m")))
          .groupBy(col("src_a"), col("src_b"), col("bkt"))
          .agg(max(col("m")).as("m"))
        val alpha = (lit(7213.0) / lit(10000.0)) /
          (lit(1.0) + (lit(1079.0) / lit(1000.0)) / lit(64.0))
        val est = merged.groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_regs"),
            sort_array(collect_list(struct(col("bkt"), col("m")))).as("rm"))
          .select(col("src_a"), col("src_b"),
            (aggregate(col("rm"), lit(0.0),
              (acc, p) => acc + lit(1.0) / pow(lit(2.0), p.getField("m"))) +
              (lit(64) - col("n_regs")).cast("double")).as("z"))
          .select(col("src_a"), col("src_b"),
            (alpha * lit(4096.0) / col("z")).as("hll_union_est"))
        val counts = dt.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val inter = dt.select(col("source").as("src_a"), col("tok"))
          .join(dt.select(col("source").as("src_b"), col("tok")), Seq("tok"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("exact_inter"))
        est
          .join(counts.select(col("source").as("src_a"), col("n").as("na")),
            Seq("src_a"))
          .join(counts.select(col("source").as("src_b"), col("n").as("nb")),
            Seq("src_b"))
          .join(inter, Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"), col("hll_union_est"),
            coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
            (col("na") + col("nb") -
              coalesce(col("exact_inter"), lit(0L))).as("exact_union"))
      },
      Some {
        val h = strHashSql("tok")
        s"""WITH dt AS (
           |  SELECT DISTINCT source, tok FROM (
           |    SELECT source, unnest(string_split(text, ' ')) AS tok
           |    FROM documents)),
           |ranked AS (
           |  SELECT source, h % 64 AS bkt,
           |    CASE WHEN (h // 64) = 0 THEN 55
           |         ELSE 55 - length(bin(h // 64)) END AS rank
           |  FROM (SELECT source, $h AS h FROM dt)),
           |regs AS (
           |  SELECT source, bkt, MAX(rank) AS m
           |  FROM ranked GROUP BY source, bkt),
           |pairs AS (
           |  SELECT a.source AS src_a, b.source AS src_b
           |  FROM (SELECT DISTINCT source FROM dt) a,
           |       (SELECT DISTINCT source FROM dt) b
           |  WHERE a.source < b.source),
           |merged AS (
           |  SELECT src_a, src_b, bkt, MAX(m) AS m FROM (
           |    SELECT p.src_a, p.src_b, r.bkt, r.m
           |    FROM pairs p JOIN regs r ON r.source = p.src_a
           |    UNION ALL
           |    SELECT p.src_a, p.src_b, r.bkt, r.m
           |    FROM pairs p JOIN regs r ON r.source = p.src_b)
           |  GROUP BY src_a, src_b, bkt),
           |folded AS (
           |  SELECT src_a, src_b, COUNT(*) AS n_regs,
           |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list_transform(list(m ORDER BY bkt), mm ->
           |        CAST(1 AS DOUBLE) / pow(CAST(2 AS DOUBLE), mm))),
           |      (a, b) -> a + b)
           |      + CAST(64 - COUNT(*) AS DOUBLE) AS z
           |  FROM merged GROUP BY src_a, src_b),
           |counts AS (
           |  SELECT source, COUNT(*) AS n FROM dt GROUP BY source),
           |inter AS (
           |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS c
           |  FROM dt a JOIN dt b
           |    ON a.tok = b.tok AND a.source < b.source
           |  GROUP BY a.source, b.source)
           |SELECT f.src_a, f.src_b,
           |  ((CAST(7213 AS DOUBLE) / CAST(10000 AS DOUBLE))
           |     / (CAST(1 AS DOUBLE)
           |        + (CAST(1079 AS DOUBLE) / CAST(1000 AS DOUBLE))
           |          / CAST(64 AS DOUBLE)))
           |    * CAST(4096 AS DOUBLE) / f.z AS hll_union_est,
           |  CAST(COALESCE(i.c, 0) AS BIGINT) AS exact_inter,
           |  CAST(ca.n + cb.n - COALESCE(i.c, 0) AS BIGINT) AS exact_union
           |FROM folded f
           |JOIN counts ca ON ca.source = f.src_a
           |JOIN counts cb ON cb.source = f.src_b
           |LEFT JOIN inter i ON i.src_a = f.src_a AND i.src_b = f.src_b"""
          .stripMargin
      }),

    // ----- q161: KMV (k-minimum-values) distinct sketch + merged union ----
    // The third distinct-count sketch in the family (q41 HLL++-gated,
    // q79/q87 hand-rolled HLL): KMV keeps the k = 32 SMALLEST distinct
    // hash values per source and estimates D = (k−1)/u_(k) with u_(k)
    // the k-th minimum normalized to (0,1) (Bar-Yossef et al. 2002) —
    // the sketch HLL replaced, still worth carrying because its state
    // is VALUES, so the same sketch also answers set-resemblance
    // (it is MinHash's bottom-k twin) and supports exact small-set
    // fallback (n < k ⇒ the sketch IS the distinct set; the estimate
    // is exact, emitted via the CASE arm). Mergeability is demonstrated
    // the q87 way, but cheaper: the cross-source UNION sketch is built
    // from the 20 per-source sketches alone (any hash among the global
    // 32 smallest is among its own source's 32 smallest — a bottom-k
    // union needs only the bottom-k inputs), never from the corpus.
    // Estimator arithmetic: u = hk/2^60 (power-of-two divisor, exact),
    // (k−1) and the 3/√(k−2) error gate from exactly-representable
    // literals — identical IEEE trees both engines, so even the DOUBLE
    // column hash-matches. The in_bound witness column makes the
    // accuracy contract part of the result, q41's discipline. Scale
    // shape: one distinct shuffle on (source, hash), per-source bottom-k
    // via a partitioned window over vocab-sized input, the union via
    // TakeOrdered over ≤ 20·k sketch rows — no global sort, no state.
    // 60-bit hash collisions (~1e-8 at 1e5 tokens) are absorbed by
    // DEFINING exact_distinct as the distinct-hash count: both engines
    // and both columns see the same universe.
    NamedQuery(
      "q161_kmv_sketch",
      (s, d) => {
        val k = 32
        val twoTo60 = 1152921504606846976.0
        val hs = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .select(col("source"), strHash(col("tok")).as("h"))
          .distinct().persist()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"))
        val sk = hs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).persist()
        def est(n: org.apache.spark.sql.Column,
            hk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          when(n < k, n.cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (hk.cast("double") / lit(twoTo60)))
        val src = sk.groupBy(col("source"))
          .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("hk"))
          .join(hs.groupBy(col("source"))
            .agg(count(lit(1)).as("exact_distinct")), "source")
          .select(col("source"), col("n_sketch"),
            est(col("n_sketch"), col("hk")).as("kmv_est"),
            col("exact_distinct"))
        val uni = sk.select(col("h")).distinct()
          .orderBy(col("h")).limit(k)
          .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("hk"))
          .crossJoin(broadcast(
            hs.select(col("h")).distinct()
              .agg(count(lit(1)).as("exact_distinct"))))
          .select(lit("__union__").as("source"), col("n_sketch"),
            est(col("n_sketch"), col("hk")).as("kmv_est"),
            col("exact_distinct"))
        src.unionByName(uni)
          .withColumn("in_bound",
            abs(col("kmv_est") - col("exact_distinct").cast("double")) /
              col("exact_distinct").cast("double") <=
              lit(3.0) / sqrt(lit(30.0)))
      },
      Some {
        val h = strHashSql("tok")
        s"""WITH toks AS (
           |  SELECT source, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |hs AS (SELECT DISTINCT source, $h AS h FROM toks),
           |sk AS (
           |  SELECT source, h FROM (
           |    SELECT source, h, row_number() OVER (
           |      PARTITION BY source ORDER BY h) AS rn
           |    FROM hs)
           |  WHERE rn <= 32),
           |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sketch,
           |          MAX(h) AS hk
           |        FROM sk GROUP BY source),
           |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
           |       FROM hs GROUP BY source),
           |src AS (
           |  SELECT per.source, n_sketch,
           |    CASE WHEN n_sketch < 32 THEN CAST(n_sketch AS DOUBLE)
           |         ELSE 31.0 / (CAST(hk AS DOUBLE)
           |                      / 1152921504606846976.0) END AS kmv_est,
           |    exact_distinct
           |  FROM per JOIN ex USING (source)),
           |usk AS (SELECT h FROM (SELECT DISTINCT h FROM sk)
           |        ORDER BY h LIMIT 32),
           |uper AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sketch,
           |           MAX(h) AS hk FROM usk),
           |uex AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT)
           |          AS exact_distinct FROM hs),
           |uni AS (
           |  SELECT '__union__' AS source, n_sketch,
           |    CASE WHEN n_sketch < 32 THEN CAST(n_sketch AS DOUBLE)
           |         ELSE 31.0 / (CAST(hk AS DOUBLE)
           |                      / 1152921504606846976.0) END AS kmv_est,
           |    exact_distinct
           |  FROM uper CROSS JOIN uex)
           |SELECT source, n_sketch, kmv_est, exact_distinct,
           |  abs(kmv_est - CAST(exact_distinct AS DOUBLE))
           |    / CAST(exact_distinct AS DOUBLE) <= 3.0 / sqrt(30.0)
           |    AS in_bound
           |FROM (SELECT * FROM src UNION ALL SELECT * FROM uni)"""
          .stripMargin
      }),

    // ----- q162: Z-order layout vs linear — zone-map skipping report ------
    // The data-layout decision every 100 TB table owner faces, measured
    // instead of asserted: interleave the bits of two quantized join/
    // filter dimensions into a Z-value (Morton order — the curve behind
    // Delta/Iceberg OPTIMIZE ZORDER), carve the table into 256 equal
    // Z-range files, record each file's (min, max) zone map per
    // dimension, and count how many files a 2-D box predicate can SKIP —
    // side by side with the same 256-file budget laid out linearly
    // (single-dimension sort). The Z layout bounds every file to a
    // 4096×4096 cell of the quantized plane, so a quarter-range box in
    // both dims touches ~16/256 files where the linear layout must scan
    // ~64/256: multi-dimensional clustering is the only layout whose
    // skip rate composes across predicates. All arithmetic is exact
    // integer — quantization by `div` on non-negative operands
    // (truncate == floor, so Spark's div and DuckDB's // agree), the
    // 16-bit interleave as 32 literal shift-mask terms (no doubles
    // anywhere until the final scan_frac ratio). Scale shape: one
    // min/max agg broadcast back, one per-row projection, two
    // 256-group aggregations — the report costs two corpus streams;
    // the LAYOUT it models costs one range-partitioned write.
    NamedQuery(
      "q162_zorder_skipping",
      (s, d) => {
        val (lo, hi) = (16384L, 32767L) // quarter-range box, both dims
        val bounds = tbl(s, d, "lineitem")
          .agg(min(col("l_orderkey")).as("xmin"),
            max(col("l_orderkey")).as("xmax"),
            min(col("l_partkey")).as("ymin"),
            max(col("l_partkey")).as("ymax"))
        val q = tbl(s, d, "lineitem")
          .select(col("l_orderkey").as("x"), col("l_partkey").as("y"))
          .crossJoin(broadcast(bounds))
          .select(
            expr("CAST(((x - xmin) * 65535) div " +
              "greatest(xmax - xmin, 1) AS BIGINT)").as("xq"),
            expr("CAST(((y - ymin) * 65535) div " +
              "greatest(ymax - ymin, 1) AS BIGINT)").as("yq"))
          .withColumn("z", expr(
            "(((xq >> 0) & 1) << 0) + (((yq >> 0) & 1) << 1) + (((xq >> 1) & 1) << 2) + (((yq >> 1) & 1) << 3) + (((xq >> 2) & 1) << 4) + (((yq >> 2) & 1) << 5) + (((xq >> 3) & 1) << 6) + (((yq >> 3) & 1) << 7) + (((xq >> 4) & 1) << 8) + (((yq >> 4) & 1) << 9) + (((xq >> 5) & 1) << 10) + (((yq >> 5) & 1) << 11) + (((xq >> 6) & 1) << 12) + (((yq >> 6) & 1) << 13) + (((xq >> 7) & 1) << 14) + (((yq >> 7) & 1) << 15) + (((xq >> 8) & 1) << 16) + (((yq >> 8) & 1) << 17) + (((xq >> 9) & 1) << 18) + (((yq >> 9) & 1) << 19) + (((xq >> 10) & 1) << 20) + (((yq >> 10) & 1) << 21) + (((xq >> 11) & 1) << 22) + (((yq >> 11) & 1) << 23) + (((xq >> 12) & 1) << 24) + (((yq >> 12) & 1) << 25) + (((xq >> 13) & 1) << 26) + (((yq >> 13) & 1) << 27) + (((xq >> 14) & 1) << 28) + (((yq >> 14) & 1) << 29) + (((xq >> 15) & 1) << 30) + (((yq >> 15) & 1) << 31)"))
          .withColumn("fid_z", expr("z div 16777216"))
          .withColumn("fid_lin", expr("xq div 256"))
          .persist()
        def layout(fid: String, name: String) = {
          val zones = q.groupBy(col(fid).as("fid"))
            .agg(count(lit(1)).as("n_rows"),
              min(col("xq")).as("minx"), max(col("xq")).as("maxx"),
              min(col("yq")).as("miny"), max(col("yq")).as("maxy"))
          val skipped = col("maxx") < lo || col("minx") > hi ||
            col("maxy") < lo || col("miny") > hi
          zones.agg(count(lit(1)).as("n_files"),
            sum(when(skipped, 1L).otherwise(0L)).as("n_skipped"),
            sum(col("n_rows")).as("rows_total"),
            sum(when(skipped, 0L).otherwise(col("n_rows")))
              .as("rows_scanned"))
            .select(lit(name).as("layout"), col("n_files"),
              col("n_skipped"), col("rows_total"), col("rows_scanned"),
              (col("rows_scanned").cast("double") /
                col("rows_total").cast("double")).as("scan_frac"))
        }
        val matching = q.agg(count(when(
          col("xq").between(lo, hi) && col("yq").between(lo, hi),
          lit(1))).as("rows_matching"))
        layout("fid_z", "zorder").unionByName(layout("fid_lin", "linear"))
          .crossJoin(broadcast(matching))
      },
      Some {
        val zSql = (0 until 16).map(j =>
          s"(((xq >> $j) & 1) << ${2 * j}) + " +
            s"(((yq >> $j) & 1) << ${2 * j + 1})").mkString(" + ")
        s"""WITH b AS (
           |  SELECT MIN(l_orderkey) AS xmin, MAX(l_orderkey) AS xmax,
           |    MIN(l_partkey) AS ymin, MAX(l_partkey) AS ymax
           |  FROM lineitem),
           |q AS (
           |  SELECT CAST(((l_orderkey - xmin) * 65535)
           |           // greatest(xmax - xmin, 1) AS BIGINT) AS xq,
           |    CAST(((l_partkey - ymin) * 65535)
           |           // greatest(ymax - ymin, 1) AS BIGINT) AS yq
           |  FROM lineitem CROSS JOIN b),
           |z AS (SELECT xq, yq, $zSql AS z FROM q),
           |f AS (SELECT xq, yq, z // 16777216 AS fid_z,
           |        xq // 256 AS fid_lin FROM z),
           |m AS (SELECT CAST(COUNT(CASE WHEN xq BETWEEN 16384 AND 32767
           |          AND yq BETWEEN 16384 AND 32767 THEN 1 END) AS BIGINT)
           |        AS rows_matching FROM f),
           |zz AS (
           |  SELECT fid_z AS fid, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    MIN(xq) AS minx, MAX(xq) AS maxx,
           |    MIN(yq) AS miny, MAX(yq) AS maxy
           |  FROM f GROUP BY fid_z),
           |zl AS (
           |  SELECT fid_lin AS fid, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    MIN(xq) AS minx, MAX(xq) AS maxx,
           |    MIN(yq) AS miny, MAX(yq) AS maxy
           |  FROM f GROUP BY fid_lin),
           |rz AS (
           |  SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(SUM(CASE WHEN maxx < 16384 OR minx > 32767
           |        OR maxy < 16384 OR miny > 32767 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_skipped,
           |    CAST(SUM(n_rows) AS BIGINT) AS rows_total,
           |    CAST(SUM(CASE WHEN maxx < 16384 OR minx > 32767
           |        OR maxy < 16384 OR miny > 32767 THEN 0 ELSE n_rows END)
           |      AS BIGINT) AS rows_scanned
           |  FROM zz),
           |rl AS (
           |  SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           |    CAST(SUM(CASE WHEN maxx < 16384 OR minx > 32767
           |        OR maxy < 16384 OR miny > 32767 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_skipped,
           |    CAST(SUM(n_rows) AS BIGINT) AS rows_total,
           |    CAST(SUM(CASE WHEN maxx < 16384 OR minx > 32767
           |        OR maxy < 16384 OR miny > 32767 THEN 0 ELSE n_rows END)
           |      AS BIGINT) AS rows_scanned
           |  FROM zl)
           |SELECT layout, n_files, n_skipped, rows_total, rows_scanned,
           |  CAST(rows_scanned AS DOUBLE) / CAST(rows_total AS DOUBLE)
           |    AS scan_frac, rows_matching
           |FROM (SELECT * FROM rz UNION ALL SELECT * FROM rl)
           |CROSS JOIN m""".stripMargin
      }),

    // ----- q172: rolling 7-day distinct users via mergeable registers -----
    // Rolling uniques is THE aggregate exact methods can't scale: a
    // 7-day window re-reads every event 7 times (the witness column
    // below does exactly that, honestly). The production shape is
    // sketch-merge: build per-(day, bucket) HLL registers ONCE from one
    // partial-agg shuffle, then every day's 7-day estimate is an
    // element-wise MAX over its trailing register rows — a window over
    // the CALENDAR×64 grid (densified from a generated day spine so the
    // row frame is calendar-correct even when a bucket has gaps), never
    // a second pass over events. Registers, fold, and α reuse q79's
    // bit-exact construction, so the DOUBLE estimate hash-matches. The
    // exact rolling distinct rides along via a 30-row broadcast range
    // join (fine here; the 100 TB story is that the REGISTERS are what
    // you keep). in_bound is the q41-style witness at 2σ ≈ 25% for 64
    // registers. Scale: one event scan for registers, one for the
    // witness; windows over a bounded grid.
    NamedQuery(
      "q172_rolling_uniques",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = OpsKit.events(s, d)
          .select(to_date(col("ts")).as("dy"), col("user_id"))
        val bounds = ev.agg(min(col("dy")).as("d0"), max(col("dy")).as("d1"))
        val days = bounds
          .select(explode(expr("sequence(d0, d1, interval 1 day)"))
            .as("day"))
        val bkts = s.range(0, 64).select(col("id").as("bkt"))
        val regs = ev
          .select(col("dy").as("day"),
            strHash(col("user_id").cast("string")).as("h"))
          .select(col("day"), pmod(col("h"), lit(64)).as("bkt"),
            expr("shiftright(h, 6)").as("v"))
          .select(col("day"), col("bkt"),
            when(col("v") === 0, lit(55))
              .otherwise(lit(55) - length(bin(col("v")))).as("rank"))
          .groupBy(col("day"), col("bkt")).agg(max(col("rank")).as("m"))
        val w = Window.partitionBy(col("bkt")).orderBy(col("day"))
          .rowsBetween(-6, 0)
        val grid = days.crossJoin(broadcast(bkts))
          .join(regs, Seq("day", "bkt"), "left")
          .withColumn("mm", max(col("m")).over(w))
        val alpha = (lit(7213.0) / lit(10000.0)) /
          (lit(1.0) + (lit(1079.0) / lit(1000.0)) / lit(64.0))
        val est = grid.filter(col("mm").isNotNull)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_regs"),
            sort_array(collect_list(struct(col("bkt"), col("mm"))))
              .as("rm"))
          .select(col("day"),
            (aggregate(col("rm"), lit(0.0),
              (acc, p) => acc + lit(1.0) / pow(lit(2.0), p.getField("mm"))) +
              (lit(64) - col("n_regs")).cast("double")).as("z"))
          .select(col("day"), (alpha * lit(4096.0) / col("z")).as("est"))
        val exact = days
          .join(ev, col("dy") >= date_sub(col("day"), 6) &&
            col("dy") <= col("day"), "left")
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("uniques_7d_exact"))
        exact.join(est, Seq("day"), "left")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("uniques_7d_exact"),
            coalesce(col("est"), lit(0.0)).as("hll_est_7d"))
          .withColumn("in_bound",
            abs(col("hll_est_7d") - col("uniques_7d_exact").cast("double"))
              <= lit(0.25) * col("uniques_7d_exact").cast("double"))
      },
      Some {
        val h = strHashSql("CAST(user_id AS VARCHAR)")
        s"""WITH ev AS (
           |  SELECT CAST(ts AS DATE) AS dy, user_id FROM events),
           |b AS (SELECT MIN(dy) AS d0, MAX(dy) AS d1 FROM ev),
           |days AS (
           |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
           |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           |  FROM b),
           |bkts AS (SELECT unnest(range(0, 64)) AS bkt),
           |hh AS (SELECT dy, $h AS h FROM ev),
           |regs AS (
           |  SELECT dy AS day, h % 64 AS bkt,
           |    MAX(CASE WHEN (h // 64) = 0 THEN 55
           |        ELSE 55 - length(bin(h // 64)) END) AS m
           |  FROM hh GROUP BY 1, 2),
           |grid AS (
           |  SELECT d.day, k.bkt, r.m
           |  FROM days d CROSS JOIN bkts k
           |  LEFT JOIN regs r ON r.day = d.day AND r.bkt = k.bkt),
           |win AS (
           |  SELECT day, bkt, MAX(m) OVER (PARTITION BY bkt ORDER BY day
           |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mm
           |  FROM grid),
           |est AS (
           |  SELECT day,
           |    ((CAST(7213 AS DOUBLE) / CAST(10000 AS DOUBLE))
           |       / (CAST(1 AS DOUBLE)
           |          + (CAST(1079 AS DOUBLE) / CAST(1000 AS DOUBLE))
           |            / CAST(64 AS DOUBLE)))
           |      * CAST(4096 AS DOUBLE) /
           |      (list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |         list_transform(list(mm ORDER BY bkt), v ->
           |           CAST(1 AS DOUBLE) / pow(CAST(2 AS DOUBLE), v))),
           |         (a, x) -> a + x)
           |       + CAST(64 - COUNT(*) AS DOUBLE)) AS est
           |  FROM win WHERE mm IS NOT NULL GROUP BY day),
           |ex AS (
           |  SELECT d.day,
           |    CAST(COUNT(DISTINCT e.user_id) AS BIGINT)
           |      AS uniques_7d_exact
           |  FROM days d LEFT JOIN ev e
           |    ON e.dy BETWEEN d.day - 6 AND d.day
           |  GROUP BY d.day)
           |SELECT strftime(ex.day, '%Y-%m-%d') AS day,
           |  uniques_7d_exact,
           |  COALESCE(est, 0.0) AS hll_est_7d,
           |  abs(COALESCE(est, 0.0) - CAST(uniques_7d_exact AS DOUBLE))
           |    <= 0.25 * CAST(uniques_7d_exact AS DOUBLE) AS in_bound
           |FROM ex LEFT JOIN est ON ex.day = est.day""".stripMargin
      }),

    // ----- q173: robust outlier thresholds via MAD (median abs deviation) -
    // The robust twin of q119's mean/std outlier detection: mean and
    // standard deviation are themselves dragged by the outliers they're
    // supposed to find, so production length filters threshold on the
    // MEDIAN and the median absolute deviation (Hampel's estimator —
    // 50% breakdown point vs 0% for the mean). Per source over document
    // length: median, MAD, and how many docs sit beyond 3·MAD — the
    // robust band a C4-style trim would keep. Both medians use the
    // q50/q90 interpolated-percentile parity contract (Spark percentile
    // ≡ DuckDB quantile_cont); deviations are identical double trees.
    // Scale shape: two percentile passes per source (partial-agg
    // percentile over the source partition), each median broadcast back
    // — the corpus streams twice, no global sorts, no windows.
    NamedQuery(
      "q173_mad_outliers",
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val med = docs.groupBy(col("source"))
          .agg(expr("percentile(n_chars, 0.5)").as("med"))
        val dev = docs.join(broadcast(med), "source")
          .select(col("source"), col("med"),
            abs(col("n_chars").cast("double") - col("med")).as("adev"))
        val mad = dev.groupBy(col("source"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "source")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            max(col("med")).as("median_chars"),
            max(col("mad")).as("mad_chars"),
            sum(when(col("adev") > lit(3.0) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .withColumn("outlier_frac",
            col("n_outliers").cast("double") / col("n_docs").cast("double"))
      },
      Some("""WITH med AS (
             |  SELECT source, quantile_cont(n_chars, 0.5) AS med
             |  FROM documents GROUP BY source),
             |dev AS (
             |  SELECT d.source, m.med,
             |    abs(CAST(n_chars AS DOUBLE) - m.med) AS adev
             |  FROM documents d JOIN med m ON d.source = m.source),
             |mad AS (
             |  SELECT source, quantile_cont(adev, 0.5) AS mad
             |  FROM dev GROUP BY source)
             |SELECT dev.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MAX(dev.med) AS median_chars,
             |  MAX(mad.mad) AS mad_chars,
             |  CAST(SUM(CASE WHEN adev > 3.0 * mad.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers,
             |  CAST(SUM(CASE WHEN adev > 3.0 * mad.mad THEN 1 ELSE 0 END)
             |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS outlier_frac
             |FROM dev JOIN mad ON dev.source = mad.source
             |GROUP BY dev.source""".stripMargin)),

    // ----- q193: custom GROUPING SETS (the lattice rollup/cube can't) -----
    // Completes the multi-dimensional aggregate family: q40's ROLLUP is
    // the prefix lattice, q66's CUBE is the full lattice; real reporting
    // wants ARBITRARY slices — here ((type, dow), (type), (dow)): both
    // marginals but no grand total, which neither rollup nor cube
    // expresses without waste. One expand + one hash aggregate, exactly
    // like cube — never a union of per-set scans. grouping_id
    // disambiguates subtotal rows from genuine NULL groups, numbered
    // identically by both engines (q66's bit contract). Value mass
    // stays on the decimal grid.
    NamedQuery(
      "q193_grouping_sets",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"),
            col("value"))
        ev.groupingSets(
            Seq(Seq(col("event_type"), col("dow")), Seq(col("event_type")),
              Seq(col("dow"))),
            col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
            grouping_id().as("gid"))
      },
      Some(s"""SELECT event_type,
             |  CAST(dayofweek(ts) AS INTEGER) AS dow,
             |  CAST(COUNT(*) AS BIGINT) AS n,
             |  ${dsumSql("value")} AS sum_value,
             |  CAST(GROUPING(event_type, dayofweek(ts)) AS BIGINT) AS gid
             |FROM events
             |GROUP BY GROUPING SETS ((event_type, dayofweek(ts)),
             |  (event_type), (dayofweek(ts)))""".stripMargin)),

    // ----- q194: incremental aggregate maintenance (merge == recompute) ---
    // The warehouse pattern behind every materialized daily rollup: keep
    // per-partition PARTIAL aggregates, merge yesterday's snapshot with
    // today's delta, and NEVER rescan history. The query is its own
    // correctness proof: it computes the merged form (base partials ⊎
    // delta partials re-aggregated) AND the direct full recompute, and
    // emits per-group equality witnesses — count/sum/min/max are the
    // mergeable quartet (sum on the decimal grid, so merge order cannot
    // drift), mean is derived POST-merge (the classic
    // mergeable-vs-derivable distinction). At 100 TB the base partials
    // are a tiny stored table and only the delta is scanned; here both
    // sides run so the witness can gate.
    NamedQuery(
      "q194_incr_agg_merge",
      (s, d) => {
        val ev = events(s, d)
        val bounds = ev.agg(
          min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        val tagged = ev.crossJoin(broadcast(bounds))
          .select(col("event_type"), col("value"),
            (datediff(to_date(col("ts")), col("d0")) * 2 <=
              datediff(col("d1"), col("d0"))).as("is_base"))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast(org.apache.spark.sql.types
                .DecimalType(28, 6))).as("sv"),
              min(col("value")).as("mn"), max(col("value")).as("mx"))
        val merged = partial(tagged.filter(col("is_base")))
          .unionByName(partial(tagged.filter(!col("is_base"))))
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
            min(col("mn")).as("mn"), max(col("mx")).as("mx"))
        val direct = partial(tagged).select(col("event_type"),
          col("n").as("dn"), col("sv").as("dsv"), col("mn").as("dmn"),
          col("mx").as("dmx"))
        merged.join(direct, "event_type")
          .select(col("event_type"), col("n"),
            (col("sv").cast("double") / col("n").cast("double"))
              .as("mean"),
            col("mn").as("min_value"), col("mx").as("max_value"),
            (col("n") === col("dn") && col("sv") === col("dsv") &&
              col("mn") === col("dmn") && col("mx") === col("dmx"))
              .as("merge_matches_recompute"))
      },
      Some("""WITH b AS (
             |  SELECT MIN(CAST(ts AS DATE)) AS d0,
             |         MAX(CAST(ts AS DATE)) AS d1 FROM events),
             |tagged AS (
             |  SELECT event_type, value,
             |    date_diff('day', b.d0, CAST(ts AS DATE)) * 2
             |      <= date_diff('day', b.d0, b.d1) AS is_base
             |  FROM events CROSS JOIN b),
             |p AS (
             |  SELECT event_type, is_base, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(value AS DECIMAL(28,6))) AS sv,
             |    MIN(value) AS mn, MAX(value) AS mx
             |  FROM tagged GROUP BY event_type, is_base),
             |merged AS (
             |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n,
             |    SUM(sv) AS sv, MIN(mn) AS mn, MAX(mx) AS mx
             |  FROM p GROUP BY event_type),
             |direct AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS dn,
             |    SUM(CAST(value AS DECIMAL(28,6))) AS dsv,
             |    MIN(value) AS dmn, MAX(value) AS dmx
             |  FROM tagged GROUP BY event_type)
             |SELECT m.event_type, m.n,
             |  CAST(m.sv AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean,
             |  m.mn AS min_value, m.mx AS max_value,
             |  m.n = d.dn AND m.sv = d.dsv AND m.mn = d.dmn
             |    AND m.mx = d.dmx AS merge_matches_recompute
             |FROM merged m JOIN direct d USING (event_type)"""
        .stripMargin)),

    // ----- q199: join-key skew report (partition-planning diagnostic) -----
    // The table a cluster operator reads BEFORE sizing a shuffle: for
    // each of lineitem's three join keys — distinct keys, the hottest
    // key's row count and share, and how many keys (and rows) sit above
    // 2× the mean frequency. The hot-key test is the ALL-INTEGER cross
    // multiplication freq·n_distinct > 2·n_rows (never a float mean
    // crossing engines); shares are one integer ratio each. This is the
    // measurement behind q38's salting and AQE's skew-join split: a key
    // family with top1_share ≫ 1/n_distinct is the one you salt. Shape:
    // one frequency aggregate per key family (each its own shuffle by
    // necessity — different keys), each reduced to one row before the
    // 3-row union.
    NamedQuery(
      "q199_skew_report",
      (s, d) => {
        val li = tbl(s, d, "lineitem")
        // hot-key flags come from a broadcast of the 1-row frequency
        // totals back onto the frequency table — two aggregates per key
        def report(key: String): org.apache.spark.sql.DataFrame = {
          val freq = li.select(col(key).as("k"))
            .groupBy(col("k")).agg(count(lit(1)).as("f"))
          val tot = freq.agg(count(lit(1)).as("n_distinct"),
            sum(col("f")).as("n_rows"), max(col("f")).as("max_freq"))
          freq.crossJoin(broadcast(tot))
            .select(col("f"), col("n_distinct"), col("n_rows"),
              col("max_freq"),
              (col("f") * col("n_distinct") > lit(2L) * col("n_rows"))
                .as("hot"))
            .groupBy(col("n_distinct"), col("n_rows"), col("max_freq"))
            .agg(sum(when(col("hot"), 1L).otherwise(0L)).as("n_hot_keys"),
              sum(when(col("hot"), col("f")).otherwise(0L))
                .as("n_hot_rows"))
            .select(lit(key).as("join_key"), col("n_rows"),
              col("n_distinct"), col("max_freq"),
              (col("max_freq").cast("double") / col("n_rows").cast("double"))
                .as("top1_share"),
              col("n_hot_keys"), col("n_hot_rows"),
              (col("n_hot_rows").cast("double") /
                col("n_rows").cast("double")).as("hot_row_share"))
        }
        report("l_orderkey")
          .unionByName(report("l_partkey"))
          .unionByName(report("l_suppkey"))
      },
      Some {
        def one(key: String): String =
          s"""SELECT '$key' AS join_key, t.n_rows, t.n_distinct,
             |  t.max_freq,
             |  CAST(t.max_freq AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
             |    AS top1_share,
             |  CAST(SUM(CASE WHEN f.f * t.n_distinct > 2 * t.n_rows
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
             |  CAST(SUM(CASE WHEN f.f * t.n_distinct > 2 * t.n_rows
             |    THEN f.f ELSE 0 END) AS BIGINT) AS n_hot_rows,
             |  CAST(SUM(CASE WHEN f.f * t.n_distinct > 2 * t.n_rows
             |    THEN f.f ELSE 0 END) AS DOUBLE)
             |    / CAST(t.n_rows AS DOUBLE) AS hot_row_share
             |FROM (SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS f
             |      FROM lineitem GROUP BY $key) f
             |CROSS JOIN (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
             |    CAST(SUM(f) AS BIGINT) AS n_rows,
             |    MAX(f) AS max_freq
             |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS f
             |        FROM lineitem GROUP BY $key)) t
             |GROUP BY t.n_rows, t.n_distinct, t.max_freq""".stripMargin
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
          .mkString("", "\nUNION ALL\n", "")
      }),

    // ----- q202: sampled self-join size estimation (optimizer stats) ------
    // The cardinality question behind every shuffle-join plan: how big
    // is lineitem ⋈ lineitem on this key? Exact answer = Σ_k f(k)² —
    // quadratic in the hot key, which is why q199's skew report and
    // this estimator travel together. The estimator is distinct-value
    // sampling (sample KEYS by portable hash at rate 1%, keep their
    // EXACT frequencies, scale by 1/p — Haas et al.'s trick that keeps
    // per-key counts unbiased where row-sampling would square the
    // noise), so the estimate is an exact INTEGER ×100 and the relative
    // error column is one mirrored ratio. At 100 TB the sampled
    // frequency table is 1% of the key dimension — the stats pass a
    // planner can afford on every load.
    NamedQuery(
      "q202_joinsize_est",
      (s, d) => {
        val li = tbl(s, d, "lineitem")
        def est(key: String): org.apache.spark.sql.DataFrame = {
          val freq = li.select(col(key).as("k"))
            .groupBy(col("k")).agg(count(lit(1)).as("f"))
          freq.agg(
              sum(col("f") * col("f")).as("exact_join_size"),
              (sum(when(pmod(strHash(col("k").cast("string")),
                lit(1000L)) < 10, col("f") * col("f")).otherwise(0L)) *
                lit(100L)).as("est_join_size"),
              sum(when(pmod(strHash(col("k").cast("string")),
                lit(1000L)) < 10, 1L).otherwise(0L)).as("n_sampled_keys"))
            .select(lit(key).as("join_key"), col("exact_join_size"),
              col("est_join_size"), col("n_sampled_keys"),
              (abs(col("est_join_size") - col("exact_join_size"))
                .cast("double") / col("exact_join_size").cast("double"))
                .as("rel_err"))
        }
        est("l_orderkey").unionByName(est("l_partkey"))
          .unionByName(est("l_suppkey"))
      },
      Some {
        def one(key: String): String = {
          val h = strHashSql("CAST(k AS VARCHAR)")
          s"""SELECT '$key' AS join_key,
             |  CAST(SUM(f * f) AS BIGINT) AS exact_join_size,
             |  CAST(SUM(CASE WHEN ($h) % 1000 < 10 THEN f * f
             |    ELSE 0 END) * 100 AS BIGINT) AS est_join_size,
             |  CAST(SUM(CASE WHEN ($h) % 1000 < 10 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_sampled_keys,
             |  CAST(abs(SUM(CASE WHEN ($h) % 1000 < 10 THEN f * f
             |      ELSE 0 END) * 100 - SUM(f * f)) AS DOUBLE)
             |    / CAST(SUM(f * f) AS DOUBLE) AS rel_err
             |FROM (SELECT $key AS k, CAST(COUNT(*) AS BIGINT) AS f
             |      FROM lineitem GROUP BY $key)""".stripMargin
        }
        Seq("l_orderkey", "l_partkey", "l_suppkey").map(one)
          .mkString("", "\nUNION ALL\n", "")
      }),

    // ----- q203: shard-rebalance stability (rendezvous vs mod hashing) ----
    // What happens to key placement when the cluster grows 8 → 9 nodes?
    // Mod hashing moves almost everything (≈ 8/9 of keys change
    // residue); rendezvous / highest-random-weight hashing (Thaler &
    // Ravishankar 1998 — the stateless cousin of consistent hashing)
    // moves only the keys the NEW node wins (≈ 1/9) — the property that
    // makes stateful-service and cache topologies survivable. This
    // query MEASURES both fractions on the user-key population: per key,
    // nine portable per-node hash scores, argmax over the first 8 vs
    // all 9 (row_number over a 9-row per-key partition — bounded
    // fan-in), mod residues alongside; two summary rows out. All
    // integer hashing and counts; one ratio per row.
    NamedQuery(
      "q203_shard_rebalance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keys = events(s, d).select(col("user_id").as("k")).distinct()
        val scores = keys
          .select(col("k"), explode(sequence(lit(0), lit(8))).as("j"))
          .withColumn("h", strHash(concat(col("k").cast("string"),
            lit(":"), col("j").cast("string"))))
        val w9 = Window.partitionBy(col("k"))
          .orderBy(col("h").desc, col("j"))
        val a9 = scores.withColumn("rn", row_number().over(w9))
          .filter(col("rn") === 1)
          .select(col("k"), col("j").as("a9"))
        val a8 = scores.filter(col("j") < 8)
          .withColumn("rn", row_number().over(w9))
          .filter(col("rn") === 1)
          .select(col("k"), col("j").as("a8"))
        val joined = a8.join(a9, "k")
          .select(col("k"), (col("a8") =!= col("a9")).as("rdv_moved"),
            (pmod(col("k"), lit(8L)) =!= pmod(col("k"), lit(9L)))
              .as("mod_moved"))
        val agg = joined.agg(count(lit(1)).as("n_keys"),
          sum(when(col("rdv_moved"), 1L).otherwise(0L)).as("rdv"),
          sum(when(col("mod_moved"), 1L).otherwise(0L)).as("mod"))
        agg.select(lit("rendezvous").as("strategy"), col("n_keys"),
            col("rdv").as("n_moved"),
            (col("rdv").cast("double") / col("n_keys").cast("double"))
              .as("moved_frac"))
          .unionByName(agg.select(lit("mod").as("strategy"), col("n_keys"),
            col("mod").as("n_moved"),
            (col("mod").cast("double") / col("n_keys").cast("double"))
              .as("moved_frac")))
      },
      Some {
        val h = strHashSql(
          "CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
        s"""WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
           |scores AS (
           |  SELECT k, j, $h AS h
           |  FROM keys, unnest(range(0, 9)) AS u(j)),
           |a9 AS (
           |  SELECT k, j AS a9 FROM (
           |    SELECT k, j, row_number() OVER (PARTITION BY k
           |      ORDER BY h DESC, j) AS rn FROM scores)
           |  WHERE rn = 1),
           |a8 AS (
           |  SELECT k, j AS a8 FROM (
           |    SELECT k, j, row_number() OVER (PARTITION BY k
           |      ORDER BY h DESC, j) AS rn FROM scores WHERE j < 8)
           |  WHERE rn = 1),
           |joined AS (
           |  SELECT a8.k, a8.a8 <> a9.a9 AS rdv_moved,
           |    (a8.k % 8) <> (a8.k % 9) AS mod_moved
           |  FROM a8 JOIN a9 USING (k)),
           |agg AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           |    CAST(SUM(CASE WHEN rdv_moved THEN 1 ELSE 0 END) AS BIGINT)
           |      AS rdv,
           |    CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT)
           |      AS mod
           |  FROM joined)
           |SELECT 'rendezvous' AS strategy, n_keys, rdv AS n_moved,
           |  CAST(rdv AS DOUBLE) / CAST(n_keys AS DOUBLE) AS moved_frac
           |FROM agg
           |UNION ALL
           |SELECT 'mod', n_keys, mod,
           |  CAST(mod AS DOUBLE) / CAST(n_keys AS DOUBLE)
           |FROM agg""".stripMargin
      }),

    // ----- q208: pairwise KMV resemblance matrix --------------------------
    // The sketch-algebra payoff q161 sets up: the SAME per-source
    // bottom-32 KMV sketches answer every PAIRWISE vocabulary-overlap
    // question without re-touching the corpus. For each source pair the
    // bottom-k of the union of the two sketches is a uniform sample of
    // A∪B (any global bottom-k hash is in its own source's bottom-k),
    // and the share of that sample present in BOTH sketches is Broder's
    // bottom-k Jaccard estimator Ĵ = |X ∩ S_A ∩ S_B| / |X|. The exact
    // per-pair Jaccard over the distinct-hash sets rides along as the
    // witness column, so the estimator's quality is part of the result
    // (q41/q161 discipline). All estimator arithmetic is integer counts
    // and one double ratio — identical trees both engines, the DOUBLE
    // hash-matches. Scale shape: the pair stage touches ONLY sketch rows
    // (20 sources × 32 values; at 10k sources still sketch-bounded) —
    // the corpus is read once to build `hs`, which the plan-keyed cache
    // SHARES with q161 verbatim; the exact-witness join is a vocab-sized
    // equi-join on the 60-bit hash, dropped at true scale where the
    // estimate IS the product.
    NamedQuery(
      "q208_kmv_resemblance",
      (s, d) => {
        import graft.ops.LlmKit.strHash
        val k = 32
        val hs = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .select(col("source"), strHash(col("tok")).as("h"))
          .distinct().persist()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"))
        val sk = hs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).persist()
        val srcs = sk.select(col("source")).distinct()
        val pr = srcs.select(col("source").as("src_a"))
          .crossJoin(srcs.select(col("source").as("src_b")))
          .filter(col("src_a") < col("src_b"))
        val ta = pr.join(sk.select(col("source").as("src_a"), col("h"),
          lit(1).as("in_a"), lit(0).as("in_b")), Seq("src_a"))
        val tb = pr.join(sk.select(col("source").as("src_b"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")), Seq("src_b"))
        val merged = ta.select(col("src_a"), col("src_b"), col("h"),
            col("in_a"), col("in_b"))
          .unionByName(tb.select(col("src_a"), col("src_b"), col("h"),
            col("in_a"), col("in_b")))
          .groupBy(col("src_a"), col("src_b"), col("h"))
          .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        val wx = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
        val est = merged.withColumn("rn", row_number().over(wx))
          .filter(col("rn") <= k)
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("nx"),
            sum(col("in_a") * col("in_b")).cast("long").as("n_common"))
        val sizes = hs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = hs.select(col("source").as("src_a"), col("h"))
          .join(hs.select(col("source").as("src_b"), col("h")), Seq("h"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_inter"))
        est
          .join(broadcast(sizes.select(col("source").as("src_a"),
            col("n").as("n_a"))), Seq("src_a"))
          .join(broadcast(sizes.select(col("source").as("src_b"),
            col("n").as("n_b"))), Seq("src_b"))
          .join(inter, Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"), col("nx"), col("n_common"),
            (col("n_common").cast("double") / col("nx").cast("double"))
              .as("j_est"),
            (coalesce(col("n_inter"), lit(0L)).cast("double") /
              (col("n_a") + col("n_b") -
                coalesce(col("n_inter"), lit(0L))).cast("double"))
              .as("j_exact"))
      },
      Some {
        import graft.ops.LlmKit.strHashSql
        val h = strHashSql("tok")
        s"""WITH toks AS (
           |  SELECT source, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |hs AS (SELECT DISTINCT source, $h AS h FROM toks),
           |sk AS (
           |  SELECT source, h FROM (
           |    SELECT source, h, row_number() OVER (
           |      PARTITION BY source ORDER BY h) AS rn
           |    FROM hs)
           |  WHERE rn <= 32),
           |pr AS (
           |  SELECT a.source AS src_a, b.source AS src_b
           |  FROM (SELECT DISTINCT source FROM sk) a,
           |       (SELECT DISTINCT source FROM sk) b
           |  WHERE a.source < b.source),
           |merged AS (
           |  SELECT src_a, src_b, h,
           |    MAX(in_a) AS in_a, MAX(in_b) AS in_b
           |  FROM (
           |    SELECT pr.src_a, pr.src_b, s.h, 1 AS in_a, 0 AS in_b
           |    FROM pr JOIN sk s ON s.source = pr.src_a
           |    UNION ALL
           |    SELECT pr.src_a, pr.src_b, s.h, 0, 1
           |    FROM pr JOIN sk s ON s.source = pr.src_b)
           |  GROUP BY 1, 2, 3),
           |est AS (
           |  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS nx,
           |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
           |  FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY src_a, src_b ORDER BY h) AS rn
           |    FROM merged)
           |  WHERE rn <= 32
           |  GROUP BY 1, 2),
           |sizes AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM hs GROUP BY source),
           |inter AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_inter
           |  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT e.src_a, e.src_b, e.nx, e.n_common,
           |  CAST(e.n_common AS DOUBLE) / CAST(e.nx AS DOUBLE) AS j_est,
           |  CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
           |    / CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS DOUBLE)
           |    AS j_exact
           |FROM est e
           |JOIN sizes sa ON sa.source = e.src_a
           |JOIN sizes sb ON sb.source = e.src_b
           |LEFT JOIN inter i
           |  ON i.src_a = e.src_a AND i.src_b = e.src_b""".stripMargin
      }),

    // ----- q216: rolling 24h distinct users via sketch merge --------------
    // The sliding-window distinct count no exact method survives at
    // scale (exact needs every user id in the window in state): keep
    // ONE 64-register HLL per hour (q79's portable integer registers),
    // and answer "distinct users in the last 24 h" for every hour by
    // merging 24 hourly sketches — registers merge by MAX, so the
    // rolling merge is a range-frame window max per register, dense
    // over the hour grid (a register absent from all 24 hours counts as
    // empty). This is the streaming-state story made relational: hourly
    // state is 64 small ints regardless of traffic; the window NEVER
    // touches user ids. The exact rolling distinct rides along as the
    // witness (computed from the bounded (hour, user) activity grid ×
    // ≤24 hour memberships — linear, for the audit only; at true scale
    // the sketch column is the product). Estimator fold, α constant,
    // and rank arithmetic are q79's verbatim, so the DOUBLE estimate
    // hash-matches.
    NamedQuery(
      "q216_rolling_distinct",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val uh = events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"),
            col("user_id"))
          .distinct().persist()
        val hashed = uh.select(col("h"),
          strHash(col("user_id").cast("string")).as("uhash"))
          .select(col("h"), pmod(col("uhash"), lit(64)).as("bkt"),
            expr("shiftright(uhash, 6)").as("v"))
          .select(col("h"), col("bkt"),
            when(col("v") === 0, lit(55))
              .otherwise(lit(55) - length(bin(col("v")))).as("rank"))
        val regs = hashed.groupBy(col("h"), col("bkt"))
          .agg(max(col("rank")).as("m"))
        val hours = uh.select(col("h")).distinct()
        val grid = hours.crossJoin(
            broadcast(s.range(0, 64).select(col("id").as("bkt"))))
          .join(regs, Seq("h", "bkt"), "left")
        val wr = Window.partitionBy(col("bkt")).orderBy(col("h"))
          .rangeBetween(-23, 0)
        val rolled = grid.withColumn("rm", max(col("m")).over(wr))
        val alpha = (lit(7213.0) / lit(10000.0)) /
          (lit(1.0) + (lit(1079.0) / lit(1000.0)) / lit(64.0))
        val est = rolled.groupBy(col("h"))
          .agg(sum(when(col("rm").isNotNull, 1L).otherwise(0L))
              .as("n_regs"),
            // collect_list drops NULL inputs, so absent registers never
            // enter the fold (mirrors the oracle's FILTER clause)
            sort_array(collect_list(when(col("rm").isNotNull,
              struct(col("bkt"), col("rm"))))).as("rm"))
          .select(col("h"), col("n_regs"),
            (aggregate(col("rm"), lit(0.0),
              (acc, p) => acc + lit(1.0) /
                pow(lit(2.0), p.getField("rm"))) +
              (lit(64) - col("n_regs")).cast("double")).as("z"))
          .select(col("h"), col("n_regs"),
            (alpha * lit(4096.0) / col("z")).as("hll_24h"))
        // r19: the witness used to attach hours via a broadcast
        // nested-loop RANGE join (uh_h BETWEEN h-23 AND h) — |uh| × |hours|
        // predicate evaluations (~65M at sf0.1), quadratic in the hour
        // span even though the membership is bounded at 24 rows per
        // activity cell. Generate the ≤24 covered hours per (hour, user)
        // cell instead and attach the observed-hour grid with a hash
        // equi-join: uh_h ∈ [h-23, h] ⟺ h ∈ [uh_h, uh_h+23], so the
        // joined (h, user) pair set — and the per-hour distinct count —
        // is identical; only the join algorithm changes (BNLJ → BHJ,
        // guide §3.1). Measured 1.06 s → see OPTIMIZATION_r19.md.
        val exact = uh.select(col("h").as("uh_h"), col("user_id"))
          .select(explode(sequence(col("uh_h"), col("uh_h") + 23))
            .as("h"), col("user_id"))
          .join(broadcast(hours), Seq("h"))
          .groupBy(col("h"))
          .agg(countDistinct(col("user_id")).as("exact_24h"))
        est.join(exact, "h")
          .select(col("h"), col("n_regs"), col("hll_24h"),
            col("exact_24h"),
            (abs(col("hll_24h") - col("exact_24h").cast("double")) /
              col("exact_24h").cast("double")).as("rel_err"))
      },
      Some {
        val h = strHashSql("CAST(user_id AS VARCHAR)")
        s"""WITH uh AS (
           |  SELECT DISTINCT epoch_us(ts) // 3600000000 AS h, user_id
           |  FROM events),
           |hashed AS (
           |  SELECT h, hh % 64 AS bkt,
           |    CASE WHEN (hh // 64) = 0 THEN 55
           |         ELSE 55 - length(bin(hh // 64)) END AS rank
           |  FROM (SELECT h, $h AS hh FROM uh)),
           |regs AS (
           |  SELECT h, bkt, MAX(rank) AS m
           |  FROM hashed GROUP BY h, bkt),
           |hours AS (SELECT DISTINCT h FROM uh),
           |grid AS (
           |  SELECT hours.h, b.bkt, regs.m
           |  FROM hours CROSS JOIN
           |    (SELECT unnest(range(0, 64)) AS bkt) b
           |  LEFT JOIN regs ON regs.h = hours.h AND regs.bkt = b.bkt),
           |rolled AS (
           |  SELECT h, bkt, MAX(m) OVER (PARTITION BY bkt ORDER BY h
           |    RANGE BETWEEN 23 PRECEDING AND CURRENT ROW) AS rm
           |  FROM grid),
           |folded AS (
           |  SELECT h,
           |    CAST(SUM(CASE WHEN rm IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_regs,
           |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |      list_transform(list(rm ORDER BY bkt)
           |          FILTER (WHERE rm IS NOT NULL), mm ->
           |        CAST(1 AS DOUBLE) / pow(CAST(2 AS DOUBLE), mm))),
           |      (a, b) -> a + b) AS zp
           |  FROM rolled GROUP BY h),
           |est AS (
           |  SELECT h, n_regs,
           |    ((7213.0 / 10000.0) / (1.0 + (1079.0 / 1000.0) / 64.0))
           |      * 4096.0
           |      / (COALESCE(zp, 0.0) + CAST(64 - n_regs AS DOUBLE))
           |      AS hll_24h
           |  FROM folded),
           |exact AS (
           |  SELECT hours.h,
           |    CAST(COUNT(DISTINCT uh.user_id) AS BIGINT) AS exact_24h
           |  FROM uh JOIN hours
           |    ON uh.h BETWEEN hours.h - 23 AND hours.h
           |  GROUP BY hours.h)
           |SELECT e.h, e.n_regs, e.hll_24h, x.exact_24h,
           |  abs(e.hll_24h - CAST(x.exact_24h AS DOUBLE))
           |    / CAST(x.exact_24h AS DOUBLE) AS rel_err
           |FROM est e JOIN exact x USING (h)""".stripMargin
      }),

    // ----- q223: feature-hashing collision audit ---------------------------
    // The hashing-trick's due-diligence report (Weinberger et al. 2009):
    // before a pipeline maps a token vocabulary into 2^16 hashed feature
    // slots, measure what the hash actually does to THIS corpus's
    // vocabulary — load histogram (how many slots carry k distinct
    // tokens), max load, and the share of tokens that lost identity to a
    // collision (the fraction of feature mass that became ambiguous).
    // All integers and integer ratios — no Poisson approximation (e^-λ
    // is libm; the measured histogram IS the answer the approximation
    // estimates). Shape: one distinct-token agg (vocab-bounded), one
    // 2^16-key agg, one load-histogram agg — nothing corpus-scale past
    // the first distinct.
    NamedQuery(
      "q223_feature_hash_collisions",
      (s, d) => {
        val vocab = tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val loads = vocab
          .select((strHash(col("tok")) % 65536).as("slot"))
          .groupBy(col("slot")).agg(count(lit(1)).as("load"))
        val hist = loads.groupBy(col("load"))
          .agg(count(lit(1)).as("n_slots"))
        val tot = loads.agg(sum(col("load")).as("n_tokens"),
          count(lit(1)).as("slots_used"),
          max(col("load")).as("max_load"),
          sum(when(col("load") >= 2, col("load")).otherwise(0L))
            .as("collided_tokens"))
        hist.crossJoin(broadcast(tot))
          .select(col("load"), col("n_slots"), col("n_tokens"),
            col("slots_used"), col("max_load"),
            (col("collided_tokens").cast("double") /
              col("n_tokens").cast("double")).as("collided_share"))
      },
      Some(s"""WITH vocab AS (
             |  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |loads AS (
             |  SELECT ${strHashSql("tok")} % 65536 AS slot,
             |    CAST(COUNT(*) AS BIGINT) AS load
             |  FROM vocab GROUP BY 1),
             |hist AS (SELECT load, CAST(COUNT(*) AS BIGINT) AS n_slots
             |         FROM loads GROUP BY load),
             |tot AS (SELECT CAST(SUM(load) AS BIGINT) AS n_tokens,
             |    CAST(COUNT(*) AS BIGINT) AS slots_used,
             |    CAST(MAX(load) AS BIGINT) AS max_load,
             |    CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END)
             |      AS BIGINT) AS collided_tokens
             |  FROM loads)
             |SELECT h.load, h.n_slots, t.n_tokens, t.slots_used,
             |  t.max_load,
             |  CAST(t.collided_tokens AS DOUBLE)
             |    / CAST(t.n_tokens AS DOUBLE) AS collided_share
             |FROM hist h, tot t""".stripMargin)),

    // ----- q254: KLL rank-quantile sketch (the 100-TB quantile path) ------
    // q50's exact `percentile` buffers whole groups and q108's histogram
    // needs a bin width chosen up front; the mergeable KLL sketch
    // ([[graft.functions.KllQuantiles]], Karnin–Lang–Liberty FOCS'16) is
    // what a cluster actually runs: ONE partially-aggregated pass, O(k·
    // log(n/k)) state, ε≈O(1/k) rank error, no prior knowledge of the
    // value range. The q41/q161 verification discipline: sketch internals
    // are partitioning-dependent (legal — the bound isn't), so the output
    // carries only cross-engine-exact witnesses — n, the integer target
    // rank ceil(p·n/100), the EXACT p-th quantile value (computed with
    // the q148 phased CDF, zero unpartitioned windows over values) — and
    // the gate boolean: the sketch estimate's true rank within 2%·n of
    // target (k=256's guarantee is ~4× tighter; deterministic md5
    // compaction coins make the check reproducible, never flaky). The
    // oracle recomputes every witness and emits TRUE — a sketch drifting
    // out of bound fails the driver's hash gate.
    NamedQuery(
      "q254_kll_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val P = Seq(1, 5, 25, 50, 75, 95, 99)
        val kll = udaf(new graft.functions.KllQuantiles(
          256, P.map(_ / 100.0).toArray))
        val vals = tbl(s, d, "lineitem")
          .select(col("l_extendedprice").cast("double").as("v"))
        val sk = vals.agg(kll(col("v")).as("sk"), count(lit(1)).as("n"))
        val pArr = array(P.map(p => lit(p.toLong)): _*)
        val ests = sk.select(col("n"),
            posexplode(col("sk.est")).as(Seq("i", "est")))
          .select(element_at(pArr, col("i") + 1).as("p"), col("n"),
            col("est"),
            ((element_at(pArr, col("i") + 1) * col("n") + 99) / 100)
              .cast("long").as("thr"))
        // true rank of each estimate: 7× bounded expansion, one pass
        val ranks = vals.crossJoin(broadcast(ests))
          .groupBy(col("p"), col("n"), col("est"), col("thr"))
          .agg(sum(when(col("v") <= col("est"), 1L).otherwise(0L))
            .as("est_rank"))
        // exact p-th quantile witness: phased CDF over DISTINCT values —
        // range buckets from the broadcast [lo,hi], per-bucket running
        // sums, broadcast bucket offsets (the q148 shape)
        val cdf = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
        val bounds = cdf.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        val keyed = cdf.crossJoin(broadcast(bounds)).withColumn("b",
          when(col("hi") > col("lo"), least(lit(1023),
            floor((col("v") - col("lo")) * 1024.0 / (col("hi") - col("lo")))
              .cast("int"))).otherwise(lit(0)))
        val run = keyed.withColumn("rc",
          sum(col("c")).over(Window.partitionBy(col("b")).orderBy(col("v"))))
        val off = keyed.groupBy(col("b")).agg(sum(col("c")).as("tb"))
          .select(col("b"), coalesce(sum(col("tb")).over(
            boundedWin.orderBy(col("b"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("o"))
        val cum = run.join(broadcast(off), "b")
          .select(col("v"), (col("rc") + col("o")).as("cw"))
        val exact = cum.crossJoin(broadcast(ranks.select(col("p"), col("thr"))))
          .filter(col("cw") >= col("thr"))
          .groupBy(col("p")).agg(min(col("v")).as("exact_q"))
        ranks.join(exact, "p")
          .select(col("p"), col("n"), col("thr"), col("exact_q"),
            (abs(col("est_rank") - col("thr")) * 50 <= col("n"))
              .as("within_bound"))
      },
      Some("""WITH vals AS (
             |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
             |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
             |ps AS (SELECT CAST(unnest([1,5,25,50,75,95,99]) AS BIGINT)
             |         AS p),
             |thr AS (SELECT p, n,
             |          CAST((p * n + 99) // 100 AS BIGINT) AS thr
             |        FROM ps, nn),
             |cdf AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
             |        FROM vals GROUP BY v),
             |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cw FROM cdf),
             |ex AS (SELECT t.p, MIN(c.v) AS exact_q
             |       FROM thr t JOIN cum c ON c.cw >= t.thr GROUP BY t.p)
             |SELECT t.p, t.n, t.thr, e.exact_q, TRUE AS within_bound
             |FROM thr t JOIN ex e USING (p)""".stripMargin)),

    // ----- q256: GROUPED KLL — per-source quantile sketches ---------------
    // q254 proves the sketch as ONE global aggregate; the shape a 100-TB
    // profiler actually runs is `groupBy(k).agg(kll(v))` — thousands of
    // sketches built in one partial aggregation, each group's buffers
    // merging independently across the exchange (mergeability per group
    // is exactly what a typed Aggregator buys: no per-group re-sort, no
    // second pass). Same verification discipline as q254, per GROUP, in
    // the TIE-ROBUST form: n_chars is a small-integer domain, so one
    // value can carry more than 2%·n_g of a group's mass and the q254
    // "rank of the estimate" gate would flag a CORRECT estimate whose tie
    // block merely straddles the target rank. The equivalent tie-safe
    // statement of the KLL guarantee gates the VALUE: est must lie
    // between the exact values at ranks thr − 2%·n_g and thr + 2%·n_g
    // (est < lo_q ⟹ every rank of est is below the window; est > hi_q ⟹
    // every rank is above — exactly a bound violation, ties or not). The
    // exact witnesses come from the q148 phased CDF with the group key
    // threaded through every phase — running sums partition by (source,
    // bucket), bucket offsets by (source), so no window ever spans more
    // than one group's one bucket; all three rank thresholds resolve in
    // the SAME single pass over the cumulative weights. The oracle
    // recomputes witnesses with an ordinary per-group cumulative window
    // and emits TRUE for every gate.
    NamedQuery(
      "q256_grouped_kll",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val P = Seq(25, 50, 75, 95)
        val kll = udaf(new graft.functions.KllQuantiles(
          256, P.map(_ / 100.0).toArray))
        val vals = tbl(s, d, "documents")
          .select(col("source"), col("n_chars").cast("double").as("v"))
        val sk = vals.groupBy(col("source"))
          .agg(kll(col("v")).as("sk"), count(lit(1)).as("n"))
        val pArr = array(P.map(p => lit(p.toLong)): _*)
        val ests = sk.select(col("source"), col("n"),
            posexplode(col("sk.est")).as(Seq("i", "est")))
          .select(col("source"), element_at(pArr, col("i") + 1).as("p"),
            col("n"), col("est"),
            ((element_at(pArr, col("i") + 1) * col("n") + 99) / 100)
              .cast("long").as("thr"))
          .withColumn("thr_lo",
            greatest(lit(1L), col("thr") - expr("n div 50")))
          .withColumn("thr_hi",
            least(col("n"), col("thr") + expr("n div 50")))
        // exact per-group quantile witnesses: the shared grouped phased
        // CDF (group key in every partitioning — q148 shape, grouped)
        val cum = groupedPhasedCdf(vals, "source")
        // all three rank thresholds resolve in ONE pass over cum
        val exact = cum.join(broadcast(ests), "source")
          .groupBy(col("source"), col("p"))
          .agg(
            min(when(col("cw") >= col("thr"), col("v"))).as("exact_q"),
            min(when(col("cw") >= col("thr_lo"), col("v"))).as("lo_q"),
            min(when(col("cw") >= col("thr_hi"), col("v"))).as("hi_q"))
        ests.join(exact, Seq("source", "p"))
          .select(col("source"), col("p"), col("n"), col("thr"),
            col("exact_q"),
            (col("est") >= col("lo_q") && (col("est") <= col("hi_q")))
              .as("within_bound"))
      },
      Some("""WITH vals AS (
             |  SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents),
             |nn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM vals GROUP BY source),
             |ps AS (SELECT CAST(unnest([25,50,75,95]) AS BIGINT) AS p),
             |thr AS (SELECT source, p, n,
             |          CAST((p * n + 99) // 100 AS BIGINT) AS thr
             |        FROM ps, nn),
             |cdf AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
             |        FROM vals GROUP BY source, v),
             |cum AS (SELECT source, v,
             |          SUM(c) OVER (PARTITION BY source ORDER BY v) AS cw
             |        FROM cdf),
             |ex AS (SELECT t.source, t.p, MIN(c.v) AS exact_q
             |       FROM thr t JOIN cum c
             |         ON c.source = t.source AND c.cw >= t.thr
             |       GROUP BY t.source, t.p)
             |SELECT t.source, t.p, t.n, t.thr, e.exact_q,
             |  TRUE AS within_bound
             |FROM thr t JOIN ex e USING (source, p)""".stripMargin)),

    // ----- q257: streaming quantile monitor (batch twin + certification) --
    // The KLL sketch's THIRD deployment shape, and the one a live
    // pipeline runs: per event-time hour window, p50/p95 of `value`
    // through [[graft.streaming.StreamOps.quantileSketchWindows]] — the
    // q253 twin pattern puts the streaming operator's exact code under
    // the driver's hash gate in batch mode, StreamOpsSpec separately
    // runs it as a real chunked stream and asserts the rank-error
    // contract on BOTH modes (bit-equality of sketch estimates across
    // merge trees is impossible by design; the bound is the invariant).
    // Certification here is q256's tie-robust value-window form, per
    // hour window: est must lie between the exact values at ranks
    // thr ∓ 2%·n_w, witnesses from the grouped phased CDF (running sums
    // partition by (window, bucket), offsets by (window) — every window
    // in the plan is partitioned by a time-domain key).
    NamedQuery(
      "q257_stream_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = graft.streaming.StreamOps
          .quantileSketchWindows(events(s, d))
        val ests = base.select(col("window_start"), col("n"),
            explode(map(
              lit(50L), col("est_p50"),
              lit(95L), col("est_p95"))).as(Seq("p", "est")))
          .withColumn("thr", expr("(p * n + 99) div 100"))
          .withColumn("thr_lo",
            greatest(lit(1L), col("thr") - expr("n div 50")))
          .withColumn("thr_hi",
            least(col("n"), col("thr") + expr("n div 50")))
        val vals = events(s, d).select(
          date_format(window(col("ts"), "1 hour").getField("start"),
            OpsKit.TsFmt).as("w"),
          col("value").cast("double").as("v"))
        val cum = groupedPhasedCdf(vals, "w")
        // fresh aliases on the re-joined side: `exact` derives FROM
        // `ests`, so joining them back on same-exprId columns would be
        // ambiguous — the aliased projection mints new attribute ids
        val thrs = ests.select(col("window_start").as("tw"),
          col("p").as("tp"), col("thr").as("t0"),
          col("thr_lo").as("t1"), col("thr_hi").as("t2"))
        val exact = cum
          .join(broadcast(thrs), col("w") === col("tw"))
          .groupBy(col("w"), col("tp"))
          .agg(
            min(when(col("cw") >= col("t0"), col("v"))).as("exact_q"),
            min(when(col("cw") >= col("t1"), col("v"))).as("lo_q"),
            min(when(col("cw") >= col("t2"), col("v"))).as("hi_q"))
        ests.join(exact,
            col("window_start") === col("w") && col("p") === col("tp"))
          .select(col("window_start"), col("p"), col("n"), col("thr"),
            col("exact_q"),
            (col("est") >= col("lo_q") && (col("est") <= col("hi_q")))
              .as("within_bound"))
      },
      Some("""WITH vals AS (
             |  SELECT epoch_us(ts) // 1000000 AS tsec,
             |    CAST(value AS DOUBLE) AS v
             |  FROM events),
             |w AS (SELECT strftime(make_timestamp(
             |          (tsec - (tsec % 3600)) * 1000000),
             |          '%Y-%m-%d %H:%M:%S') AS window_start, v
             |      FROM vals),
             |nn AS (SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM w GROUP BY window_start),
             |ps AS (SELECT CAST(unnest([50, 95]) AS BIGINT) AS p),
             |thr AS (SELECT window_start, p, n,
             |          CAST((p * n + 99) // 100 AS BIGINT) AS thr
             |        FROM ps, nn),
             |cdf AS (SELECT window_start, v, CAST(COUNT(*) AS BIGINT) AS c
             |        FROM w GROUP BY window_start, v),
             |cum AS (SELECT window_start, v,
             |          SUM(c) OVER (PARTITION BY window_start ORDER BY v)
             |            AS cw
             |        FROM cdf),
             |ex AS (SELECT t.window_start, t.p, MIN(c.v) AS exact_q
             |       FROM thr t JOIN cum c
             |         ON c.window_start = t.window_start AND c.cw >= t.thr
             |       GROUP BY t.window_start, t.p)
             |SELECT t.window_start, t.p, t.n, t.thr, e.exact_q,
             |  TRUE AS within_bound
             |FROM thr t JOIN ex e USING (window_start, p)""".stripMargin)),

    // ----- q258: streaming cardinality monitor (batch twin + gate) --------
    // [[graft.streaming.StreamOps.cardinalityWindows]] under the hash
    // gate: per event-time hour, total events and HLL++ distinct users.
    // Unlike the KLL twin, HLL state merges by per-register max —
    // merge-order-insensitive — so StreamOpsSpec asserts stream == batch
    // EXACTLY, and the estimate here is deterministic for the input
    // regardless of partitioning. The estimate itself can never
    // hash-match DuckDB (engine-specific sketch internals — q41's
    // analysis), so it ships as the q41 bounded-error boolean over the
    // exact witness, which both engines compute exactly. rsd = 0.01
    // (2^14 registers/window): the default 0.05's small-cardinality
    // bias overshoots 3σ on hours with ~5 users — measured, the 0.01
    // sketch is EXACT below ~10^2 distinct and 5% leaves 5σ headroom
    // at every scale factor.
    NamedQuery(
      "q258_stream_cardinality",
      (s, d) => {
        val base = graft.streaming.StreamOps
          .cardinalityWindows(events(s, d))
        val exact = events(s, d).select(
            date_format(window(col("ts"), "1 hour").getField("start"),
              OpsKit.TsFmt).as("window_start"),
            col("user_id"))
          .groupBy(col("window_start"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        base.join(exact, "window_start")
          .select(col("window_start"), col("n"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")).cast("double") <=
              lit(0.05) * col("exact_users").cast("double"))
              .as("approx_within_5pct"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) // 1000000 AS tsec, user_id
             |  FROM events),
             |w AS (SELECT strftime(make_timestamp(
             |          (tsec - (tsec % 3600)) * 1000000),
             |          '%Y-%m-%d %H:%M:%S') AS window_start, user_id
             |      FROM ev)
             |SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  TRUE AS approx_within_5pct
             |FROM w GROUP BY window_start""".stripMargin)),

    // ----- q265: streaming heavy-hitters monitor (batch twin + gate) ------
    // Batch twin of [[graft.streaming.StreamOps.heavyHitterWindows]] —
    // the monitor trio's top-keys leg (q257 quantiles, q258 cardinality,
    // this). The space-saving aggregator's per-window top-5 is joined
    // back to the exact per-(window, key) counts and every emitted
    // count is certified equal (the event-type domain is far under
    // cap=64, so the summary is provably exact here — the same
    // determinism contract q67 pins; at cap-exceeding key domains the
    // gate would relax to the ±n/cap bound). The oracle re-derives the
    // same top-5 with an exact count + row_number ranked (count desc,
    // key asc) — the aggregator's own tie order. Scale: the aggregate
    // state is ≤ cap counters per window REGARDLESS of the key domain;
    // the exact join side exists only as this certification's witness.
    NamedQuery(
      "q265_stream_topk",
      (s, d) => {
        val base = graft.streaming.StreamOps
          .heavyHitterWindows(events(s, d))
        val exact = events(s, d).select(
            date_format(window(col("ts"), "1 hour").getField("start"),
              OpsKit.TsFmt).as("window_start"),
            col("event_type"))
          .groupBy(col("window_start"), col("event_type"))
          .agg(count(lit(1)).as("exact_cnt"))
        base.join(exact,
            base("window_start") === exact("window_start") &&
              base("tok") === exact("event_type"))
          .select(base("window_start"), col("n"), col("rank"),
            col("tok"), col("cnt"), col("exact_cnt"),
            (col("cnt") === col("exact_cnt")).as("exact_agree"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) // 1000000 AS tsec, event_type
             |  FROM events),
             |w AS (SELECT strftime(make_timestamp(
             |          (tsec - (tsec % 3600)) * 1000000),
             |          '%Y-%m-%d %H:%M:%S') AS window_start, event_type
             |      FROM ev),
             |c AS (SELECT window_start, event_type,
             |        CAST(COUNT(*) AS BIGINT) AS cnt
             |      FROM w GROUP BY 1, 2),
             |t AS (SELECT window_start, CAST(SUM(cnt) AS BIGINT) AS n
             |      FROM c GROUP BY 1),
             |r AS (SELECT window_start, event_type, cnt,
             |        CAST(row_number() OVER (
             |          PARTITION BY window_start
             |          ORDER BY cnt DESC, event_type) AS BIGINT) AS rank
             |      FROM c)
             |SELECT r.window_start, t.n, r.rank, r.event_type AS tok,
             |  r.cnt, r.cnt AS exact_cnt, TRUE AS exact_agree
             |FROM r JOIN t USING (window_start)
             |WHERE r.rank <= 5""".stripMargin)),

    // ----- q270: sketch set-DIFFERENCE (theta-style A-not-B) --------------
    // The set-algebra operation HLL structurally cannot do: register
    // maxima only merge UP, so |A∖B| needs a sample-based sketch. The
    // theta sketch's AnotB (Dasgupta et al., "Theta sketch framework",
    // 2016 — the KMV generalization) works because a KMV sketch is a
    // uniform hash sample below a per-set threshold θ: clip both
    // sketches to θ = min(θ_A, θ_B), drop A-samples present in B's
    // sample (below θ, membership in B ⟺ membership in S_B — B keeps
    // EVERYTHING below its θ), and scale the survivors by 1/θ. Built on
    // q161's exact KMV conventions (md5 hashes normalized by 2^60,
    // k = 32, k−1-below-hk estimator), so every retained-sample count,
    // threshold, and the double estimate are deterministic and the
    // oracle replays them relationally. Exact |A∖B| (per-pair anti-join
    // count) rides along as the witness. Scale: sketches are 32 rows
    // per source — the pair algebra is sources²×32, never corpus²; at
    // 100 TB this is how "what's in the new crawl that the old one
    // lacks" is answered without a distinct-join over both corpora.
    NamedQuery(
      "q270_sketch_anotb",
      (s, d) => {
        val k = 32
        val M = 1152921504606846976L // 2^60 — strHash's range, cf. q161
        val hs = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .select(col("source"), strHash(col("tok")).as("h"))
          .distinct().persist()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"))
        val sk = hs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn").persist()
        val theta = sk.groupBy(col("source"))
          .agg(count(lit(1)).as("nsk"), max(col("h")).as("hk"))
          .select(col("source"),
            when(col("nsk") < k, lit(M)).otherwise(col("hk")).as("th"))
        val srcs = hs.select(col("source")).distinct()
        val prs = srcs.select(col("source").as("src_a"))
          .crossJoin(srcs.select(col("source").as("src_b")))
          .filter(col("src_a") =!= col("src_b"))
          .join(broadcast(theta).withColumnRenamed("source", "src_a")
            .withColumnRenamed("th", "tha"), Seq("src_a"))
          .join(broadcast(theta).withColumnRenamed("source", "src_b")
            .withColumnRenamed("th", "thb"), Seq("src_b"))
          .select(col("src_a"), col("src_b"),
            least(col("tha"), col("thb")).as("hth"))
        val retained = prs
          .join(sk.withColumnRenamed("source", "src_a"), Seq("src_a"))
          .filter(col("h") < col("hth"))
          .join(sk.select(col("source").as("src_b"), col("h")),
            Seq("src_b", "h"), "left_anti")
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_retained"))
        val na = hs.groupBy(col("source"))
          .agg(count(lit(1)).as("exact_a"))
        val inter = hs.select(col("source").as("src_a"), col("h"))
          .join(hs.select(col("source").as("src_b"), col("h")),
            Seq("h"))
          .filter(col("src_a") =!= col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_inter"))
        prs
          .join(retained, Seq("src_a", "src_b"), "left")
          .join(na.withColumnRenamed("source", "src_a"), Seq("src_a"))
          .join(inter, Seq("src_a", "src_b"), "left")
          .select(col("src_a"), col("src_b"), col("exact_a"),
            (col("exact_a") - coalesce(col("n_inter"), lit(0L)))
              .as("exact_diff"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            (coalesce(col("n_retained"), lit(0L)).cast("double") *
              lit(M.toDouble) / col("hth").cast("double")).as("est_diff"))
      },
      Some {
        val h = strHashSql("tok")
        s"""WITH toks AS (
           |  SELECT source, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |hs AS (SELECT DISTINCT source, $h AS h FROM toks),
           |sk AS (
           |  SELECT source, h FROM (
           |    SELECT source, h, row_number() OVER (
           |      PARTITION BY source ORDER BY h) AS rn
           |    FROM hs)
           |  WHERE rn <= 32),
           |theta AS (
           |  SELECT source,
           |    CASE WHEN COUNT(*) < 32 THEN 1152921504606846976
           |         ELSE MAX(h) END AS th
           |  FROM sk GROUP BY source),
           |prs AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |    least(ta.th, tb.th) AS hth
           |  FROM (SELECT DISTINCT source FROM hs) a
           |  JOIN (SELECT DISTINCT source FROM hs) b
           |    ON a.source <> b.source
           |  JOIN theta ta ON ta.source = a.source
           |  JOIN theta tb ON tb.source = b.source),
           |ret AS (
           |  SELECT p.src_a, p.src_b, CAST(COUNT(*) AS BIGINT)
           |    AS n_retained
           |  FROM prs p JOIN sk sa ON sa.source = p.src_a
           |  WHERE sa.h < p.hth
           |    AND NOT EXISTS (SELECT 1 FROM sk sb
           |                    WHERE sb.source = p.src_b
           |                      AND sb.h = sa.h)
           |  GROUP BY p.src_a, p.src_b),
           |na AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_a
           |       FROM hs GROUP BY source),
           |inter AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_inter
           |  FROM hs a JOIN hs b ON a.h = b.h AND a.source <> b.source
           |  GROUP BY 1, 2)
           |SELECT p.src_a, p.src_b, na.exact_a,
           |  na.exact_a - COALESCE(i.n_inter, 0) AS exact_diff,
           |  COALESCE(r.n_retained, 0) AS n_retained,
           |  CAST(COALESCE(r.n_retained, 0) AS DOUBLE)
           |    * 1152921504606846976.0 / CAST(p.hth AS DOUBLE)
           |    AS est_diff
           |FROM prs p
           |LEFT JOIN ret r ON r.src_a = p.src_a AND r.src_b = p.src_b
           |JOIN na ON na.source = p.src_a
           |LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
           |ORDER BY p.src_a, p.src_b""".stripMargin
      }),

    // ----- q262: incremental view maintenance of a join view --------------
    // The delta algebra every warehouse eventually needs (Blakeley,
    // Larson & Tompa, SIGMOD 1986): a materialized join view
    // V = orders ⋈ customer must absorb a new batch WITHOUT re-joining
    // the base tables. With insert deltas ΔO, ΔC:
    //   ΔV = ΔO⋈C_old  ∪  O_old⋈ΔC  ∪  ΔO⋈ΔC
    // — three disjoint terms (each pair is classified by which side of
    // the batch boundary its halves fall on), every one sized by a
    // DELTA, never |base|⋈|base|. The deltas here are a deterministic
    // slice (o_orderkey % 17 = 0, c_custkey % 13 = 0), which also makes
    // the realistic wrinkle appear: old orders referencing a customer
    // that only arrives in ΔC join nothing in V_old and surface in the
    // O_old⋈ΔC term — the case naive "just join the new orders" code
    // silently drops. The query emits each term plus V_old and V_full
    // with rowcounts and EXACT decimal revenue sums, and certifies
    // count(V_full) = count(V_old) + count(ΔV) and the same for the
    // sums on every row (the IVM invariant, verified from the query's
    // own output, decimal-exact so equality is equality).
    // Scale: deltas are small by nature → both cross-boundary terms are
    // broadcast joins of Δ against base (plan: zero shuffles on the
    // base tables beyond their scan); the full join runs here only as
    // the certification witness.
    NamedQuery(
      "q262_ivm_join",
      (s, d) => {
        val o = tbl(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val c = tbl(s, d, "customer").select(col("c_custkey"))
        val oOld = o.filter(col("o_orderkey") % 17 =!= 0)
        val dO = o.filter(col("o_orderkey") % 17 === 0)
        val cOld = c.filter(col("c_custkey") % 13 =!= 0)
        val dC = c.filter(col("c_custkey") % 13 === 0)
        def term(name: String, df: DataFrame): DataFrame =
          df.agg(lit(name).as("component"),
            count(lit(1)).as("n_rows"),
            coalesce(sum(col("o_totalprice").cast("decimal(28,6)")),
              lit(java.math.BigDecimal.ZERO).cast("decimal(28,6)"))
              .as("sum_price"))
        val j = (l: DataFrame, r: DataFrame) =>
          l.join(r, col("o_custkey") === col("c_custkey"))
        val vOld = term("view_old", j(oOld, cOld))
        val t1 = term("delta_orders_x_old_cust", j(broadcast(dO), cOld))
        val t2 = term("old_orders_x_delta_cust", j(oOld, broadcast(dC)))
        val t3 = term("delta_x_delta", j(broadcast(dO), broadcast(dC)))
        val vFull = term("view_full", j(o, c))
        val parts = vOld.unionByName(t1).unionByName(t2).unionByName(t3)
        val incr = parts.agg(
          sum(col("n_rows")).as("n_incr"),
          sum(col("sum_price")).as("s_incr"))
        val full = vFull.select(col("n_rows").as("n_full"),
          col("sum_price").as("s_full"))
        parts.unionByName(vFull)
          .crossJoin(broadcast(incr)).crossJoin(broadcast(full))
          .select(col("component"), col("n_rows"),
            col("sum_price").cast("double").as("sum_price"),
            (col("n_full") === col("n_incr")).as("counts_consistent"),
            (col("s_full") === col("s_incr")).as("sums_consistent"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice
             |          FROM orders),
             |c AS (SELECT c_custkey FROM customer),
             |terms AS (
             |  SELECT 'view_old' AS component, COUNT(*) AS n_rows,
             |    COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0)
             |      AS sum_price
             |  FROM o JOIN c ON o_custkey = c_custkey
             |  WHERE o_orderkey % 17 <> 0 AND c_custkey % 13 <> 0
             |  UNION ALL
             |  SELECT 'delta_orders_x_old_cust', COUNT(*),
             |    COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0)
             |  FROM o JOIN c ON o_custkey = c_custkey
             |  WHERE o_orderkey % 17 = 0 AND c_custkey % 13 <> 0
             |  UNION ALL
             |  SELECT 'old_orders_x_delta_cust', COUNT(*),
             |    COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0)
             |  FROM o JOIN c ON o_custkey = c_custkey
             |  WHERE o_orderkey % 17 <> 0 AND c_custkey % 13 = 0
             |  UNION ALL
             |  SELECT 'delta_x_delta', COUNT(*),
             |    COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0)
             |  FROM o JOIN c ON o_custkey = c_custkey
             |  WHERE o_orderkey % 17 = 0 AND c_custkey % 13 = 0),
             |vfull AS (
             |  SELECT 'view_full' AS component, COUNT(*) AS n_rows,
             |    COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 0)
             |      AS sum_price
             |  FROM o JOIN c ON o_custkey = c_custkey),
             |incr AS (SELECT SUM(n_rows) AS n_incr, SUM(sum_price) AS s_incr
             |         FROM terms)
             |SELECT u.component, CAST(u.n_rows AS BIGINT) AS n_rows,
             |  CAST(u.sum_price AS DOUBLE) AS sum_price,
             |  v.n_rows = i.n_incr AS counts_consistent,
             |  v.sum_price = i.s_incr AS sums_consistent
             |FROM (SELECT * FROM terms UNION ALL SELECT * FROM vfull) u
             |CROSS JOIN vfull v CROSS JOIN incr i""".stripMargin)),

    // ----- q277: histogram join-cardinality estimation --------------------
    // "How big is the self-join before I run it?" — the question a
    // planner (and an engineer about to launch a sessionization
    // pair-join at 100 TB) answers from per-bucket key histograms, not
    // by executing the join. Exact output size of events ⋈ events on
    // user_id is Σ_u c_u²; the estimator sees only the 32-bucket
    // rollup (c_b = events in bucket, d_b = distinct users) and applies
    // the uniformity assumption within each bucket — est = Σ_b c_b²/d_b,
    // exact precisely when every user in a bucket has the same count
    // (the standard equi-depth-histogram bound from the selectivity-
    // estimation literature, e.g. Ioannidis & Christodoulakis 1991 on
    // when uniformity errs). The TRUE size ships alongside (this is the
    // audit the sf data affords; at 100 TB you'd ship only the
    // estimate) plus max_user_events, the heavy-hitter signal that says
    // when per-key exact counts must replace the uniform tail. All
    // counts BIGINT-exact; est is a 32-term dsum of single-division
    // terms — engine-identical. Scale shape: one user rollup, one
    // 32-row bucket rollup; nothing else.
    NamedQuery(
      "q277_join_card_est",
      (s, d) => {
        val per = events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("c"))
        val truth = per.agg(count(lit(1)).as("n_users"),
          sum(col("c")).as("n_events"),
          sum(col("c") * col("c")).as("true_pairs"),
          max(col("c")).as("max_user_events"))
        val est = per
          .groupBy(pmod(col("user_id"), lit(32L)).as("b"))
          .agg(sum(col("c")).as("cb"), count(lit(1)).as("db"))
          .agg(dsum((col("cb").cast("double") * col("cb").cast("double"))
            / col("db").cast("double")).as("est_pairs"))
        truth.crossJoin(broadcast(est))
          .select(col("n_users"), col("n_events"), col("true_pairs"),
            col("max_user_events"), col("est_pairs"),
            ((col("est_pairs") - col("true_pairs").cast("double")) /
              col("true_pairs").cast("double")).as("rel_err"))
      },
      Some(s"""WITH per AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY user_id),
             |truth AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(c) AS BIGINT) AS n_events,
             |    CAST(SUM(c * c) AS BIGINT) AS true_pairs,
             |    CAST(MAX(c) AS BIGINT) AS max_user_events
             |  FROM per),
             |bkt AS (
             |  SELECT user_id % 32 AS b, CAST(SUM(c) AS BIGINT) AS cb,
             |    CAST(COUNT(*) AS BIGINT) AS db
             |  FROM per GROUP BY user_id % 32),
             |est AS (
             |  SELECT ${dsumSql(
                 "(CAST(cb AS DOUBLE) * CAST(cb AS DOUBLE)) " +
                 "/ CAST(db AS DOUBLE)")} AS est_pairs
             |  FROM bkt)
             |SELECT t.n_users, t.n_events, t.true_pairs,
             |  t.max_user_events, e.est_pairs,
             |  (e.est_pairs - CAST(t.true_pairs AS DOUBLE))
             |    / CAST(t.true_pairs AS DOUBLE) AS rel_err
             |FROM truth t CROSS JOIN est e""".stripMargin)),

    // ----- q278: deterministic Bloom-filter anti-join ----------------------
    // The existence-pruning pattern: instead of shuffling the whole
    // fact side into a semi/anti join against a large key set, build an
    // m-bit Bloom filter over the keys once, BROADCAST it, and let each
    // fact partition drop non-members locally — false positives fall
    // through to the exact join, false negatives are impossible. Here
    // m = 8192, K = 3, and the bit positions are md5-derived
    // (strHash("i:key") mod m) so the filter is bit-identical in both
    // engines — no RNG, no engine hash. The filter is represented as
    // the ≤m-row TABLE of set positions (the relational rendering of a
    // bitmap: broadcast-joinable, oracle-checkable); membership = all K
    // probe positions present. Output: the confusion summary — true
    // members, Bloom passes, false positives, the n_true_pass ==
    // n_true_members equality that CERTIFIES no-false-negatives as a
    // varying value (not a constant-true column, per the degeneracy
    // sweep), and the realized fp_rate to compare against the
    // (1−e^{−Kn/m})^K design point. Scale: bits and the flagged set
    // are the only broadcast state; candidates never shuffle.
    NamedQuery(
      "q278_bloom_antijoin",
      (s, d) => {
        val m = 8192L
        def pos(key: org.apache.spark.sql.Column, i: Int) =
          strHash(concat(lit(s"$i:"), key.cast("string"))) % m
        def probes(key: org.apache.spark.sql.Column) =
          array(pos(key, 0), pos(key, 1), pos(key, 2))
        // pinned: the flagged set and its <=8192-row bit table are
        // each read twice (probe join + truth join / bits_set count)
        val flagged = OpsKit.pinned(tbl(s, d, "orders")
          .filter(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey").as("k")).distinct())
        val bits = OpsKit.pinned(
          flagged.select(explode(probes(col("k"))).as("pos"))
            .distinct())
        val cand = tbl(s, d, "lineitem")
          .select(col("l_orderkey").as("k")).distinct()
        val hits = cand.select(col("k"), explode(probes(col("k")))
            .as("pos"))
          .join(broadcast(bits), Seq("pos"))
          .groupBy(col("k")).agg(count(lit(1)).as("nhit"))
        val summary = cand
          .join(broadcast(flagged.withColumn("is_true", lit(1L))),
            Seq("k"), "left")
          .join(hits, Seq("k"), "left")
          .agg(count(lit(1)).as("n_candidates"),
            sum(coalesce(col("is_true"), lit(0L))).as("n_true_members"),
            sum(when(col("nhit") === 3, 1L).otherwise(0L))
              .as("n_bloom_pass"),
            sum(when(col("nhit") === 3 && col("is_true").isNotNull, 1L)
              .otherwise(0L)).as("n_true_pass"),
            sum(when(col("nhit") === 3 && col("is_true").isNull, 1L)
              .otherwise(0L)).as("n_false_pos"))
        summary
          .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
          .select(col("n_candidates"), col("n_true_members"),
            col("n_bloom_pass"), col("n_true_pass"), col("n_false_pos"),
            col("bits_set"),
            when(col("n_candidates") > col("n_true_members"),
              col("n_false_pos").cast("double") /
                (col("n_candidates") - col("n_true_members"))
                  .cast("double"))
              .otherwise(lit(0.0)).as("fp_rate"))
      },
      Some({
        def hp(i: String) =
          s"${strHashSql(s"'$i:' || CAST(k AS VARCHAR)")} % 8192"
        s"""WITH flagged AS (
           |  SELECT DISTINCT o_orderkey AS k FROM orders
           |  WHERE o_totalprice > 400000.0),
           |bits AS (
           |  SELECT DISTINCT unnest([${hp("0")}, ${hp("1")},
           |    ${hp("2")}]) AS pos
           |  FROM flagged),
           |cand AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
           |cp AS (
           |  SELECT k, unnest([${hp("0")}, ${hp("1")}, ${hp("2")}])
           |    AS pos
           |  FROM cand),
           |hits AS (
           |  SELECT cp.k, CAST(COUNT(*) AS BIGINT) AS nhit
           |  FROM cp JOIN bits USING (pos) GROUP BY cp.k),
           |summary AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |    CAST(SUM(CASE WHEN f.k IS NOT NULL THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_true_members,
           |    CAST(SUM(CASE WHEN h.nhit = 3 THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_bloom_pass,
           |    CAST(SUM(CASE WHEN h.nhit = 3 AND f.k IS NOT NULL
           |             THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pass,
           |    CAST(SUM(CASE WHEN h.nhit = 3 AND f.k IS NULL
           |             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
           |  FROM cand c
           |  LEFT JOIN flagged f ON c.k = f.k
           |  LEFT JOIN hits h ON c.k = h.k),
           |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits)
           |SELECT s.n_candidates, s.n_true_members, s.n_bloom_pass,
           |  s.n_true_pass, s.n_false_pos, bs.bits_set,
           |  CASE WHEN s.n_candidates > s.n_true_members
           |       THEN CAST(s.n_false_pos AS DOUBLE)
           |            / CAST(s.n_candidates - s.n_true_members
           |                   AS DOUBLE)
           |       ELSE 0.0 END AS fp_rate
           |FROM summary s CROSS JOIN bs""".stripMargin
      })),

    // ----- q283: source-overlap matrix via per-SOURCE MinHash sketches ----
    // "How much does crawl A duplicate crawl B?" answered WITHOUT a
    // corpus×corpus join: each source's entire shingle SET collapses to
    // a 16-permutation MinHash signature — and because min() is
    // associative/commutative, the signature is a mergeable PARTIAL
    // AGGREGATE (the q87/q261 register discipline): at 100 TB each
    // executor sketches its shard and 16 longs per source cross the
    // wire. Pairwise estimated Jaccard = fraction of agreeing
    // components (the classic Broder estimator, matched-permutation
    // collision probability = Jaccard); the EXACT Jaccard from a
    // (source, shingle)-distinct self-join ships alongside as the
    // audit this SF affords — at scale you'd keep only the sketch
    // columns. Permutations are the MinHash family's closed-form
    // coefficients (LlmKit), so both engines build bit-identical
    // signatures; est_jac is a 16-term integer sum over 190 pairs.
    NamedQuery(
      "q283_source_overlap",
      (s, d) => {
        val NPerm = 16
        def perm(i: Int, h: org.apache.spark.sql.Column) = {
          val a = (1103515245L * (i + 1)) % MinhashP
          val b = (12345L + 2654435761L * i) % MinhashP
          pmod(lit(a) * h + lit(b), lit(MinhashP))
        }
        val sh = tbl(s, d, "documents")
          .select(col("source"),
            explode(LlmKit.hashedShingles(col("text"))).as("h"))
          .distinct()
        // pinned: the 20-row signature table feeds both sides of the
        // pair cross join - one shingle scan, not two
        val sig = OpsKit.pinned(sh.groupBy(col("source"))
          .agg(count(lit(1)).as("setsz"),
            (0 until NPerm).map(i => min(perm(i, col("h")))
              .as(s"m$i")): _*))
        val a = sig.select((col("source").as("source_a") +:
          col("setsz").as("size_a") +:
          (0 until NPerm).map(i => col(s"m$i").as(s"a$i"))): _*)
        val b = sig.select((col("source").as("source_b") +:
          col("setsz").as("size_b") +:
          (0 until NPerm).map(i => col(s"m$i").as(s"b$i"))): _*)
        val agree = (0 until NPerm).map(i =>
          when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
          .reduce(_ + _)
        val pairs = a.crossJoin(broadcast(b))
          .filter(col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"), col("size_a"),
            col("size_b"), agree.as("n_agree"))
        val inter = sh.select(col("source").as("source_a"), col("h"))
          .join(sh.select(col("source").as("source_b"), col("h")),
            Seq("h"))
          .filter(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("inter"))
        pairs.join(inter, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"), col("size_a"),
            col("size_b"),
            coalesce(col("inter"), lit(0L)).as("inter"),
            (coalesce(col("inter"), lit(0L)).cast("double") /
              (col("size_a") + col("size_b") -
                coalesce(col("inter"), lit(0L))).cast("double"))
              .as("exact_jac"),
            (col("n_agree").cast("double") / lit(NPerm.toDouble))
              .as("est_jac"))
      },
      Some {
        def permSql(i: Int): String = {
          val a = (1103515245L * (i + 1)) % MinhashP
          val b = (12345L + 2654435761L * i) % MinhashP
          s"MIN(($a * h + $b) % $MinhashP) AS m$i"
        }
        val agree = (0 until 16).map(i =>
          s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH sh AS (
           |  SELECT DISTINCT source, sh AS h FROM (
           |    SELECT source, unnest(${LlmKit.hashedShinglesSql("text",
               LlmKit.tokenHashesSql("text"))}) AS sh
           |    FROM documents)),
           |sig AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS setsz,
           |    ${(0 until 16).map(permSql).mkString(",\n           |    ")}
           |  FROM sh GROUP BY source),
           |pairs AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |    a.setsz AS size_a, b.setsz AS size_b,
           |    CAST($agree AS BIGINT) AS n_agree
           |  FROM sig a JOIN sig b ON a.source < b.source),
           |inter AS (
           |  SELECT x.source AS source_a, y.source AS source_b,
           |    CAST(COUNT(*) AS BIGINT) AS inter
           |  FROM sh x JOIN sh y
           |    ON x.h = y.h AND x.source < y.source
           |  GROUP BY x.source, y.source)
           |SELECT p.source_a, p.source_b, p.size_a, p.size_b,
           |  CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
           |  CAST(COALESCE(i.inter, 0) AS DOUBLE)
           |    / CAST(p.size_a + p.size_b - COALESCE(i.inter, 0)
           |           AS DOUBLE) AS exact_jac,
           |  CAST(p.n_agree AS DOUBLE) / 16.0 AS est_jac
           |FROM pairs p
           |LEFT JOIN inter i USING (source_a, source_b)""".stripMargin
      }),

    // ----- q291: approximate query processing with an error-bound audit ----
    // The BlinkDB/sampling contract, certified: estimate per-group
    // means from a deterministic md5 10% row sample, attach the CLT
    // 95% half-width 1.96·s/√m, and put the EXACT answer beside the
    // estimate with an `in_ci` audit column — the production pattern
    // where a 100 TB scan becomes a 10 TB one at a stated accuracy.
    // Determinism: the "random" sample is md5(event_id) % 10 = 0 —
    // identical rows on every engine and partitioning (the q196/q249
    // hash-draw idiom); sample variance comes from gridded Σv and Σv²
    // in one pass, so the whole row is a fixed IEEE expression.
    // Scale: two partial-aggregation passes (full + sample); the
    // sample pass is the one a real deployment keeps, the full pass
    // exists here to certify the bound.
    NamedQuery(
      "q291_aqp_sample",
      (s, d) => {
        val ev = events(s, d).select(col("event_type"), col("value"),
          pmod(strHash(concat(lit("aqp:"),
            col("event_id").cast("string"))), lit(10L)).as("h"))
        val exact = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_exact"),
            dsum(col("value")).as("sum_exact"))
          .withColumn("mean_exact",
            col("sum_exact") / col("n_exact").cast("double"))
        val sm = ev.filter(col("h") === 0L).groupBy(col("event_type"))
          .agg(count(lit(1)).as("m"), dsum(col("value")).as("sv"),
            dsum(col("value") * col("value")).as("svv"))
        exact.join(broadcast(sm), Seq("event_type"))
          .select(col("event_type"), col("n_exact"), col("mean_exact"),
            col("m"),
            when(col("m") > 0L, col("sv") / col("m").cast("double"))
              .as("est_mean"),
            when(col("m") > 1L,
              lit(1.96) * sqrt(
                ((col("svv") - col("sv") * col("sv") /
                  col("m").cast("double")) /
                  (col("m") - 1L).cast("double")) /
                  col("m").cast("double"))).as("ci_half"))
          .withColumn("est_sum",
            col("est_mean") * col("n_exact").cast("double"))
          .withColumn("in_ci",
            when(col("ci_half").isNotNull,
              abs(col("mean_exact") - col("est_mean")) <=
                col("ci_half")))
      },
      Some {
        val h = strHashSql("concat('aqp:', CAST(event_id AS VARCHAR))")
        s"""WITH ev AS (
           |  SELECT event_type, value, $h % 10 AS h FROM events),
           |exact_ AS (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |    ${dsumSql("value")} AS sum_exact
           |  FROM ev GROUP BY event_type),
           |sm AS (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
           |    ${dsumSql("value")} AS sv,
           |    ${dsumSql("value * value")} AS svv
           |  FROM ev WHERE h = 0 GROUP BY event_type)
           |SELECT e.event_type, e.n_exact,
           |  e.sum_exact / CAST(e.n_exact AS DOUBLE) AS mean_exact,
           |  s.m,
           |  CASE WHEN s.m > 0 THEN s.sv / CAST(s.m AS DOUBLE) END
           |    AS est_mean,
           |  CASE WHEN s.m > 1 THEN
           |    1.96 * sqrt(((s.svv - s.sv * s.sv / CAST(s.m AS DOUBLE))
           |                 / CAST(s.m - 1 AS DOUBLE))
           |                / CAST(s.m AS DOUBLE)) END AS ci_half,
           |  CASE WHEN s.m > 0 THEN s.sv / CAST(s.m AS DOUBLE) END
           |    * CAST(e.n_exact AS DOUBLE) AS est_sum,
           |  CASE WHEN s.m > 1 THEN
           |    abs(e.sum_exact / CAST(e.n_exact AS DOUBLE)
           |        - s.sv / CAST(s.m AS DOUBLE))
           |    <= 1.96 * sqrt(((s.svv - s.sv * s.sv
           |                     / CAST(s.m AS DOUBLE))
           |                    / CAST(s.m - 1 AS DOUBLE))
           |                   / CAST(s.m AS DOUBLE)) END AS in_ci
           |FROM exact_ e JOIN sm s USING (event_type)""".stripMargin
      }),

    // ----- q296: DKW confidence band for the sampled CDF --------------------
    // q291 bounds a sampled MEAN; the Dvoretzky–Kiefer–Wolfowitz
    // inequality (1956, Massart's tight constant 1990) bounds the whole
    // DISTRIBUTION: sup|F̂ₙ − F| ≤ ε = √(ln(2/α)/(2n)) with probability
    // ≥ 1−α — the certificate that a 20% sample's CDF is trustworthy
    // everywhere at once, which is what sampled quantile/histogram
    // serving actually needs. ln(2/0.05) = ln 40 is the FIXED-DECIMAL
    // literal 3.6888794541139363 (no libm call at query time — the
    // repo's no-ln discipline), so ε is one sqrt of exact integers.
    // The observed sup comes from the pooled distinct-value grid (the
    // q136 CDF shape, partitioned per type): max|F_sample − F_full| as
    // integer-count divisions. Exact throughout; the within_band
    // column is the certification (allowlisted constant-true — DKW
    // holds at 95% and this fixture is far inside it; dev_ratio varies).
    NamedQuery(
      "q296_dkw_band",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("event_type"), col("value"),
          (pmod(strHash(concat(lit("dkw:"),
            col("event_id").cast("string"))), lit(5L)) === 0L)
            .as("insamp"))
        val g = ev.groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("cf"),
            sum(when(col("insamp"), 1L).otherwise(0L)).as("cs"))
        val t = OpsKit.pinned(g.groupBy(col("event_type"))
          .agg(sum(col("cf")).as("n_full"), sum(col("cs")).as("n_sample")))
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cdf = g.join(broadcast(t), Seq("event_type"))
          .withColumn("ff", sum(col("cf")).over(w).cast("double") /
            col("n_full").cast("double"))
          .withColumn("fs", sum(col("cs")).over(w).cast("double") /
            col("n_sample").cast("double"))
        cdf.groupBy(col("event_type"), col("n_full"), col("n_sample"))
          .agg(max(abs(col("ff") - col("fs"))).as("max_dev"))
          .withColumn("epsilon",
            when(col("n_sample") > 0L,
              sqrt(lit(3.6888794541139363) /
                (lit(2.0) * col("n_sample").cast("double")))))
          .withColumn("dev_ratio",
            when(col("epsilon").isNotNull,
              col("max_dev") / col("epsilon")))
          .withColumn("within_band",
            when(col("epsilon").isNotNull,
              col("max_dev") <= col("epsilon")))
      },
      Some {
        val h = strHashSql("concat('dkw:', CAST(event_id AS VARCHAR))")
        s"""WITH ev AS (
           |  SELECT event_type, value, $h % 5 = 0 AS insamp
           |  FROM events),
           |g AS (
           |  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS cf,
           |    CAST(SUM(CASE WHEN insamp THEN 1 ELSE 0 END) AS BIGINT)
           |      AS cs
           |  FROM ev GROUP BY event_type, value),
           |t AS (
           |  SELECT event_type, CAST(SUM(cf) AS BIGINT) AS n_full,
           |    CAST(SUM(cs) AS BIGINT) AS n_sample
           |  FROM g GROUP BY event_type),
           |cdf AS (
           |  SELECT g.event_type, t.n_full, t.n_sample,
           |    CAST(SUM(cf) OVER (PARTITION BY g.event_type
           |      ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           |      / CAST(t.n_full AS DOUBLE) AS ff,
           |    CAST(SUM(cs) OVER (PARTITION BY g.event_type
           |      ORDER BY value ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           |      / CAST(t.n_sample AS DOUBLE) AS fs
           |  FROM g JOIN t ON t.event_type = g.event_type),
           |mx AS (
           |  SELECT event_type, n_full, n_sample,
           |    MAX(abs(ff - fs)) AS max_dev
           |  FROM cdf GROUP BY event_type, n_full, n_sample)
           |SELECT event_type, n_full, n_sample, max_dev,
           |  CASE WHEN n_sample > 0 THEN
           |    sqrt(CAST('3.6888794541139363' AS DOUBLE) / (2.0 * CAST(n_sample AS DOUBLE)))
           |  END AS epsilon,
           |  CASE WHEN n_sample > 0 THEN
           |    max_dev / sqrt(CAST('3.6888794541139363' AS DOUBLE)
           |                   / (2.0 * CAST(n_sample AS DOUBLE)))
           |  END AS dev_ratio,
           |  CASE WHEN n_sample > 0 THEN
           |    max_dev <= sqrt(CAST('3.6888794541139363' AS DOUBLE)
           |                    / (2.0 * CAST(n_sample AS DOUBLE)))
           |  END AS within_band
           |FROM mx""".stripMargin
      }),
  )
}
