package graft.ops

import org.apache.spark.sql.functions._

/** Scale-technique operators: shapes that only matter past a single node,
  * expressed so the driver's oracle can still verify them at small SF.
  */
object ScaleOps {
  import OpsKit._

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
    // Sketch contents are engine-specific, so there is no cross-engine
    // oracle — the driver records a rows-only check. The exact count rides
    // along so the sketch's error is visible in the output itself.
    NamedQuery(
      "q41_approx_distinct",
      (s, d) =>
        tbl(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("token"))
          .groupBy(col("lang"))
          .agg(approx_count_distinct(col("token")).as("approx_tokens"),
            countDistinct(col("token")).as("exact_tokens")),
      None),

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
  )
}
