package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-behavior analytics over `events` — the classic product-analytics
  * shapes, expressed as exact-arithmetic queries:
  *
  *  - q68 funnel conversion: signup → first click at-or-after signup →
  *    first purchase at-or-after that click, counted per stage. Stage
  *    dependencies are per-user MIN-timestamp joins (each stage is one
  *    keyed aggregate + one keyed join — shuffle-partitionable on
  *    user_id at any scale, no window over the whole history);
  *  - q69 cohort retention: users bucketed by ISO week of first activity,
  *    crossed with the weeks they were active — the retention matrix.
  *    Week arithmetic stays integral (datediff div 7); both engines
  *    truncate weeks to ISO Monday, and counts are exact;
  *  - q73 event-transition matrix: behavioral bigram probabilities via a
  *    per-user lag window — the Markov-chain input for session modeling;
  *  - q74 SCD-2 validity ranges: changelog → type-2 dimension rows via a
  *    per-user lead window (valid_from/valid_to, NULL = current);
  *  - q97 z-score anomaly detection: per-type mean/stddev from exact
  *    decimal moment sums, broadcast back to flag |z| ≥ 2.5 events;
  *  - q108 binned-histogram quantiles: the mergeable-sketch form of q50's
  *    exact percentiles (per-type p50/p95/p99 from fixed-width bin
  *    counts, error ≤ bin width — the 100 TB quantile pattern);
  *  - q121 Pearson correlation (clicks vs spend): all five moments as
  *    exact integers on a millis grid, one user-keyed aggregate + one
  *    single-row global aggregate;
  *  - q122 inactivity-gap sessionization: gaps-and-islands session ids
  *    from a per-user cumulative window, integral-microsecond gaps —
  *    the batch twin of q21's streaming session_window;
  *  - q123 forward-fill: last purchase value carried forward per user
  *    (last_value IGNORE NULLS running window) — the imputation idiom.
  */
object AnalyticsOps {
  import OpsKit._

  /** q175's expected first-digit masses log10(1+1/d), 6-decimal literals
    * (log10 at query time would be libm; both engines parse these to
    * identical doubles — the q179 discount-table contract). */
  private[graft] val BenfordMass: Seq[(Int, Double)] = Seq(
    1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  def all: Seq[NamedQuery] = Seq(

    // ----- q68: funnel conversion (signup → click → purchase) -------------
    NamedQuery(
      "q68_funnel",
      (s, d) => {
        val ev = events(s, d)
        // Examined in r18 and left UNPINNED: su/cl are re-derived by
        // each downstream consumer (3x/2x events scans), but the stages
        // are user-count-sized and the rescans are cheap columnar
        // re-reads — pinning them was measured ~2x SLOWER end-to-end at
        // sf0.1 (two checkpoint jobs + Row round-trips outweigh the
        // saved scans) and was reverted. At cluster scale the funnel is
        // still linear: three filtered scans of one table, no fact
        // shuffle.
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("ts_s"))
        val cl = ev.filter(col("event_type") === "click")
          .join(su, "user_id").filter(col("ts") >= col("ts_s"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("ts_c"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(cl, "user_id").filter(col("ts") >= col("ts_c"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("ts_p"))
        su.agg(count(lit(1)).as("n_signup"))
          .crossJoin(cl.agg(count(lit(1)).as("n_click_after")))
          .crossJoin(pu.agg(count(lit(1)).as("n_purchase_after")))
          .select(col("n_signup"), col("n_click_after"),
            col("n_purchase_after"),
            (col("n_purchase_after").cast("double") /
              col("n_signup").cast("double")).as("conv_rate"))
      },
      Some("""WITH su AS (
             |  SELECT user_id, MIN(ts) AS ts_s FROM events
             |  WHERE event_type = 'signup' GROUP BY user_id),
             |cl AS (
             |  SELECT e.user_id, MIN(e.ts) AS ts_c
             |  FROM events e JOIN su USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts >= su.ts_s
             |  GROUP BY e.user_id),
             |pu AS (
             |  SELECT e.user_id, MIN(e.ts) AS ts_p
             |  FROM events e JOIN cl USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts >= cl.ts_c
             |  GROUP BY e.user_id)
             |SELECT (SELECT COUNT(*) FROM su) AS n_signup,
             |  (SELECT COUNT(*) FROM cl) AS n_click_after,
             |  (SELECT COUNT(*) FROM pu) AS n_purchase_after,
             |  CAST((SELECT COUNT(*) FROM pu) AS DOUBLE)
             |    / CAST((SELECT COUNT(*) FROM su) AS DOUBLE) AS conv_rate"""
        .stripMargin)),

    // ----- q69: weekly cohort retention matrix ----------------------------
    NamedQuery(
      "q69_cohort_retention",
      (s, d) => {
        val ev = events(s, d)
        val cohorts = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cw"))
        val active = ev.select(col("user_id"),
          date_trunc("week", col("ts")).as("aw")).distinct()
        active.join(cohorts, "user_id")
          .groupBy(date_format(col("cw"), TsFmt).as("cohort_week"),
            expr("datediff(aw, cw) div 7").cast("long").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some(s"""WITH cohorts AS (
              |  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
              |  FROM events GROUP BY user_id),
              |active AS (
              |  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
              |  FROM events)
              |SELECT strftime(cw, '$TsFmtDuck') AS cohort_week,
              |  datediff('day', cw, aw) // 7 AS week_offset,
              |  COUNT(*) AS n_users
              |FROM active JOIN cohorts USING (user_id)
              |GROUP BY cw, aw""".stripMargin)),

    // ----- q73: event-transition matrix (behavioral bigrams) --------------
    // P(next event type | current) per user journey: lag over the
    // (user_id, ts)-ordered stream, then one count aggregate — the
    // Markov-chain input for session modeling. One window shuffle on
    // user_id (each user's history sorts independently), one aggregate;
    // the probability is a single double division of exact counts. The
    // per-from total comes from a second small aggregate joined back —
    // 25 rows, broadcast — rather than a second window over the data.
    NamedQuery(
      "q73_transition_matrix",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("to_type"))
          .withColumn("from_type", lag(col("to_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
        val counts = pairs.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy(col("from_type"))
          .agg(sum(col("n")).as("tot"))
        counts.join(broadcast(totals), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("p"))
      },
      Some("""WITH pairs AS (
             |  SELECT lag(event_type) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
             |    event_type AS to_type
             |  FROM events),
             |counts AS (
             |  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
             |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
             |totals AS (
             |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
             |  FROM counts GROUP BY from_type)
             |SELECT from_type, to_type, n,
             |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
             |FROM counts JOIN totals USING (from_type)""".stripMargin)),

    // ----- q74: SCD-2 validity ranges (temporal snapshot table) -----------
    // Treat each user's events as attribute updates and emit slowly-
    // changing-dimension type-2 rows: value valid from its own event
    // until the next event's timestamp (NULL = still current). The lead
    // window per user is the whole op — one shuffle, then pure
    // projection; at 100 TB this is the standard
    // changelog → point-in-time-joinable table step. Timestamps are
    // emitted as formatted strings (the engines' shared transport).
    NamedQuery(
      "q74_scd2_ranges",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("event_id"), col("value"),
            date_format(col("ts"), TsFmt).as("valid_from"),
            date_format(col("valid_to"), TsFmt).as("valid_to"))
      },
      Some(s"""SELECT user_id, event_id, value,
              |  strftime(ts, '$TsFmtDuck') AS valid_from,
              |  strftime(lead(ts) OVER
              |    (PARTITION BY user_id ORDER BY ts, event_id),
              |    '$TsFmtDuck') AS valid_to
              |FROM events""".stripMargin)),

    // ----- q97: per-type z-score anomaly detection ------------------------
    // The metric-monitoring primitive: flag events whose value sits more
    // than 2.5 standard deviations from their type's mean. Mean and
    // variance come from EXACT decimal sums (Σx, Σx² with the x values
    // rounded once to 6 dp — the dsum parity contract; the square is an
    // exact decimal product, so partial-aggregation order cannot change
    // either sum), then one fixed sequence of double ops both engines
    // share: μ = Σx/n, σ = sqrt(max(Σx²/n − μ², 0)), z = (x−μ)/σ. The
    // stats table is 5 rows and broadcasts; the scan streams once — at
    // 100 TB this is one partial-agg shuffle plus a map.
    NamedQuery(
      "q97_zscore_anomaly",
      (s, d) => {
        val d6 = col("value").cast("decimal(18,6)")
        val ev = events(s, d)
        // both sums are re-rounded to scale 6 BEFORE the double cast: a
        // scale-12 decimal's unscaled value exceeds 2^53 and the two
        // engines' decimal→double casts double-round differently there,
        // while a scale-6 re-round makes the /10^6 division round once,
        // identically (the dsum contract). Precision 38, not 28: a
        // Σx² > 10^22 overflows decimal(28,6) — which NULLs in Spark
        // (non-ANSI) but errors in DuckDB, silently splitting the
        // engines; 38 is the max both sides support and keeps ~10^32 of
        // integer headroom
        val stats = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(d6).cast("decimal(38,6)").cast("double").as("sv"),
            sum(d6 * d6).cast("decimal(38,6)").cast("double").as("sv2"))
          .select(col("event_type"), col("n"),
            (col("sv") / col("n").cast("double")).as("mu"),
            sqrt(greatest(
              col("sv2") / col("n").cast("double") -
                (col("sv") / col("n").cast("double")) *
                (col("sv") / col("n").cast("double")),
              lit(0.0))).as("sigma"))
        // sigma > 0 guard on BOTH engines: Spark's 0.0-divide yields NULL
        // (filtered), DuckDB's yields ±inf (kept) — a constant-valued
        // event type would otherwise split the engines; a zero-variance
        // type has no anomalies by definition, so dropping it is the
        // statement of intent, not a workaround
        ev.join(broadcast(stats.filter(col("sigma") > 0.0)),
            Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("value"),
            ((col("value") - col("mu")) / col("sigma")).as("z"))
          .filter(abs(col("z")) >= 2.5)
      },
      Some("""WITH stats AS (
             |  SELECT event_type, COUNT(*) AS n,
             |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
             |         AS DECIMAL(38,6)) AS DOUBLE) AS sv,
             |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))
             |                  * CAST(value AS DECIMAL(18,6)))
             |         AS DECIMAL(38,6)) AS DOUBLE) AS sv2
             |  FROM events GROUP BY event_type),
             |st AS (
             |  SELECT event_type, n, sv / CAST(n AS DOUBLE) AS mu,
             |    sqrt(greatest(
             |      sv2 / CAST(n AS DOUBLE)
             |        - (sv / CAST(n AS DOUBLE)) * (sv / CAST(n AS DOUBLE)),
             |      0.0)) AS sigma
             |  FROM stats)
             |SELECT event_id, e.event_type, value,
             |  (value - mu) / sigma AS z
             |FROM events e JOIN st ON e.event_type = st.event_type
             |WHERE sigma > 0.0
             |  AND abs((value - mu) / sigma) >= 2.5""".stripMargin)),

    // ----- q108: binned-histogram quantiles (mergeable sketch) ------------
    // How percentiles are computed at 100 TB: q50's exact percentile_disc
    // needs the sorted values of each group in one place, while a
    // fixed-width histogram is a MERGEABLE sketch — per-partition bin
    // counts partial-aggregate (one shuffle of ~bins rows per type), and
    // the quantile is read off the cumulative distribution, error bounded
    // by the bin width (0.25 here). Every step is exact integer
    // arithmetic on both engines: bin = floor(value·4) (explicit floor —
    // Spark's double→long CAST truncates while DuckDB's rounds, the one
    // cross-engine cast trap), cumulative counts by bin order, and the
    // q-quantile is the first bin whose cumulative count reaches
    // ceil(q·n). The per-type window runs over ~2 240 post-aggregation
    // bin rows, never over raw events.
    NamedQuery(
      "q108_binned_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val binned = events(s, d)
          .groupBy(col("event_type"),
            floor(col("value") * 4).as("bin"))
          .agg(count(lit(1)).as("c"))
        val cum = binned
          .withColumn("cum", sum(col("c"))
            .over(Window.partitionBy(col("event_type")).orderBy(col("bin"))))
          .withColumn("n", sum(col("c"))
            .over(Window.partitionBy(col("event_type"))))
        def qb(q: Double): org.apache.spark.sql.Column =
          (min(when(col("cum") >= ceil(lit(q) * col("n")), col("bin")))
            .cast("double") / 4.0)
        cum.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), qb(0.50).as("p50"),
            qb(0.95).as("p95"), qb(0.99).as("p99"))
      },
      Some("""WITH b AS (
             |  SELECT event_type,
             |    CAST(floor(value * 4) AS BIGINT) AS bin, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |cd AS (
             |  SELECT event_type, bin, c,
             |    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             |    SUM(c) OVER (PARTITION BY event_type) AS n
             |  FROM b)
             |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             |  CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN bin END)
             |       AS DOUBLE) / 4.0 AS p50,
             |  CAST(MIN(CASE WHEN cum >= ceil(0.95 * n) THEN bin END)
             |       AS DOUBLE) / 4.0 AS p95,
             |  CAST(MIN(CASE WHEN cum >= ceil(0.99 * n) THEN bin END)
             |       AS DOUBLE) / 4.0 AS p99
             |FROM cd GROUP BY event_type""".stripMargin)),

    // ----- q121: Pearson correlation (clicks vs purchase value) ----------
    // The cross-metric association question every analytics stack gets
    // asked ("do users who click more also spend more?"), computed
    // exactly: per-user click count (integer) and purchase-value sum
    // (exact decimal → double → floor·1000 millis grid, so every moment
    // is an INTEGER and the Σ's are order-independent at any partition
    // count); the five moment sums go through decimal(38,0) (q97's
    // overflow lesson), and the textbook corr formula runs once on
    // exact-integer inputs — a fixed IEEE op sequence both engines
    // execute identically. Zero-variance degenerate corpora yield NULL
    // (guarded CASE) instead of engine-dependent ±inf/NULL splits.
    // Scale shape: one user-keyed aggregate, one single-row global
    // partial-agg — nothing else.
    NamedQuery(
      "q121_click_spend_corr",
      (s, d) => {
        val perUser = events(s, d)
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            coalesce(dsum(when(col("event_type") === "purchase",
              col("value"))), lit(0.0)).as("yv"))
          .select(col("x"),
            floor(col("yv") * 1000.0).cast("long").as("y"))
        val m = perUser.agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double")
            .as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
            .as("sxx"),
          sum((col("y").cast("decimal(19,0)") *
            col("y").cast("decimal(19,0)")).cast("decimal(38,0)"))
            .cast("double").as("syy"))
        m.select(col("n"),
          when(
            (col("n").cast("double") * col("sxx") - col("sx") * col("sx"))
              * (col("n").cast("double") * col("syy") -
                col("sy") * col("sy")) > 0.0,
            (col("n").cast("double") * col("sxy") - col("sx") * col("sy"))
              / (sqrt(col("n").cast("double") * col("sxx") -
                  col("sx") * col("sx")) *
                 sqrt(col("n").cast("double") * col("syy") -
                  col("sy") * col("sy"))))
            .as("corr"))
      },
      Some(s"""WITH u AS (
              |  SELECT user_id,
              |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              |      AS x,
              |    CAST(floor(coalesce(${dsumSql(
                     "CASE WHEN event_type = 'purchase' THEN value END")},
                     0.0) * 1000.0) AS BIGINT) AS y
              |  FROM events GROUP BY user_id),
              |m AS (
              |  SELECT COUNT(*) AS n,
              |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
              |         AS DOUBLE) AS sx,
              |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
              |         AS DOUBLE) AS sy,
              |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,0)))
              |         AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
              |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0)))
              |         AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
              |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
              |           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
              |         AS DECIMAL(38,0)) AS DOUBLE) AS syy
              |  FROM u)
              |SELECT n,
              |  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx)
              |          * (CAST(n AS DOUBLE) * syy - sy * sy) > 0.0
              |    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
              |      / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
              |         * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
              |  END AS corr
              |FROM m""".stripMargin)),

    // ----- q122: inactivity-gap sessionization (batch) --------------------
    // The batch twin of what session_window (q21) does in streaming: cut
    // each user's event history into sessions at > 30-minute silences
    // and report per-session stats. Session ids are the classic
    // gaps-and-islands cumulative sum of new-session flags over a
    // per-user window — partitioned by user_id, so the sort is per-user
    // and shuffle-partitionable at any scale (no global ordering). Gap
    // arithmetic is integral microseconds (unix_micros vs epoch_us —
    // no float seconds, no truncation mismatches); (ts, event_id) makes
    // the intra-user order total on both engines.
    NamedQuery(
      "q122_gap_sessions",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(wc))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("t0"), max(col("ts")).as("t1"))
          .select(col("user_id"), col("session_id"), col("n_events"),
            date_format(col("t0"), TsFmt).as("start_ts"),
            date_format(col("t1"), TsFmt).as("end_ts"),
            expr("(unix_micros(t1) - unix_micros(t0)) div 1000000")
              .as("duration_secs"))
      },
      Some(s"""WITH o AS (
              |  SELECT user_id, event_id, ts,
              |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
              |      ORDER BY ts, event_id) AS prev_us
              |  FROM events),
              |f AS (
              |  SELECT user_id, event_id, ts,
              |    CASE WHEN prev_us IS NULL
              |           OR epoch_us(ts) - prev_us > 1800000000
              |      THEN 1 ELSE 0 END AS new_sess
              |  FROM o),
              |sess AS (
              |  SELECT user_id, ts,
              |    SUM(new_sess) OVER (PARTITION BY user_id
              |      ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS session_id
              |  FROM f)
              |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              |  COUNT(*) AS n_events,
              |  strftime(MIN(ts), '$TsFmtDuck') AS start_ts,
              |  strftime(MAX(ts), '$TsFmtDuck') AS end_ts,
              |  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
              |    AS duration_secs
              |FROM sess GROUP BY user_id, session_id""".stripMargin)),

    // ----- q125: rolling-window stats (per-user trailing 5 events) --------
    // The rolling-feature idiom (Bollinger-style): at every event, the
    // mean/std of the user's last 5 event values and the current value's
    // rolling z — the windowed feature a fraud/engagement model consumes.
    // Exactness inside a moving frame: the frame's decimal sums are
    // exact regardless of evaluation order, the mean is one division,
    // and the second moment uses the scale-3 grid so d3² lands natively
    // at scale 6 (q119's DuckDB-truncation lesson applies to window
    // aggregates too). ROWS frames + (ts, event_id) total order make the
    // frame contents identical on both engines. Scale: per-user windows
    // only — shuffle-partitionable on user_id, no global sort.
    NamedQuery(
      "q125_rolling_stats",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wf = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        val d6 = col("value").cast("decimal(18,6)")
        val d3 = col("value").cast("decimal(18,3)")
        val withMoments = events(s, d)
          .withColumn("rn", count(lit(1)).over(wf))
          .withColumn("sv", sum(d6).over(wf).cast("double"))
          .withColumn("sv3", sum(d3).over(wf).cast("double"))
          .withColumn("sv2", sum(d3 * d3).over(wf)
            .cast("decimal(38,6)").cast("double"))
        withMoments
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TsFmt).as("ts_s"), col("value"),
            col("rn").as("roll_n"),
            (col("sv") / col("rn").cast("double")).as("roll_mean"),
            sqrt(greatest(
              col("sv2") / col("rn").cast("double") -
                (col("sv3") / col("rn").cast("double")) *
                (col("sv3") / col("rn").cast("double")),
              lit(0.0))).as("roll_std"))
      },
      Some(s"""WITH m AS (
              |  SELECT event_id, user_id, ts, value,
              |    COUNT(*) OVER w AS rn,
              |    CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w
              |         AS DOUBLE) AS sv,
              |    CAST(SUM(CAST(value AS DECIMAL(18,3))) OVER w
              |         AS DOUBLE) AS sv3,
              |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,3))
              |                  * CAST(value AS DECIMAL(18,3))) OVER w
              |         AS DECIMAL(38,6)) AS DOUBLE) AS sv2
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
              |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
              |SELECT event_id, user_id,
              |  strftime(ts, '$TsFmtDuck') AS ts_s, value,
              |  rn AS roll_n,
              |  sv / CAST(rn AS DOUBLE) AS roll_mean,
              |  sqrt(greatest(sv2 / CAST(rn AS DOUBLE)
              |    - (sv3 / CAST(rn AS DOUBLE)) * (sv3 / CAST(rn AS DOUBLE)),
              |    0.0)) AS roll_std
              |FROM m""".stripMargin)),

    // ----- q123: forward-fill (last observation carried forward) ----------
    // The imputation idiom feature pipelines run before model scoring:
    // at every event, the user's most recent purchase value so far —
    // last_value IGNORE NULLS over a per-user running window. NULL until
    // the first purchase (both engines agree NULL-before-first is the
    // honest answer, no default). Values pass through untouched (no
    // arithmetic to drift); (ts, event_id) totalizes the order. Scale:
    // one per-user window, shuffle-partitionable on user_id.
    NamedQuery(
      "q123_forward_fill",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wc = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("last_purchase_value",
            last(when(col("event_type") === "purchase", col("value")),
              ignoreNulls = true).over(wc))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TsFmt).as("ts_s"),
            col("event_type"), col("last_purchase_value"))
      },
      Some(s"""SELECT event_id, user_id,
              |  strftime(ts, '$TsFmtDuck') AS ts_s, event_type,
              |  last_value(CASE WHEN event_type = 'purchase' THEN value END
              |    IGNORE NULLS) OVER (PARTITION BY user_id
              |    ORDER BY ts, event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS last_purchase_value
              |FROM events""".stripMargin)),

    // ----- q136: exact two-sample Kolmogorov–Smirnov drift ----------------
    // The distribution-level drift gate q96's chi-square can't give you:
    // KS compares FULL empirical CDFs (click vs purchase spend here), so
    // it catches shape drift that leaves bin totals unchanged. Everything
    // is exact: the statistic's supremum is computed on the integer cross
    // products |F₁·n₂ − F₂·n₁| (never on float CDF ratios — the q52
    // parity rule), the only doubles are the final division and the
    // argmax location. The CDF is built WITHOUT a global sort: distinct
    // values are range-bucketed by ⌊value⌋, running counts use a window
    // PER BUCKET, and bucket base offsets come from one bucket-level
    // cumulative over the (bounded, post-aggregation) bucket dimension —
    // the q109 phased-ranking shape, so a 100 TB event log builds its CDF
    // one bucket-partition per task. Cross products stay in longs under a
    // raise_error guard at 3·10⁹ rows per side (past that the products
    // need DECIMAL(38,0); the guard makes the boundary loud, not silent —
    // DuckDB's checked BIGINT arithmetic errors at the same point).
    NamedQuery(
      "q136_ks_drift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("value"), col("event_type"))
        val dist = ev.groupBy(col("value"))
          .agg(sum(when(col("event_type") === "click", lit(1L))
            .otherwise(lit(0L))).as("c1"),
            sum(when(col("event_type") === "purchase", lit(1L))
              .otherwise(lit(0L))).as("c2"))
          .withColumn("b", floor(col("value")).cast("long"))
        val wRun = Window.partitionBy(col("b")).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = dist
          .withColumn("r1", sum(col("c1")).over(wRun))
          .withColumn("r2", sum(col("c2")).over(wRun))
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = dist.groupBy(col("b"))
          .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
          .select(col("b"),
            coalesce(sum(col("t1")).over(wOff), lit(0L)).as("o1"),
            coalesce(sum(col("t2")).over(wOff), lit(0L)).as("o2"))
        val n = dist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
          .select(
            when(col("n1") > 3000000000L || col("n2") > 3000000000L,
              raise_error(lit("q136: side exceeds 3e9 rows — widen the " +
                "cross products to DECIMAL(38,0)")).cast("long"))
              .otherwise(col("n1")).as("n1"),
            col("n2"))
        val cdf = run.join(broadcast(off), "b")
          .crossJoin(broadcast(n))
          .select(col("value"), col("n1"), col("n2"),
            abs((col("o1") + col("r1")) * col("n2") -
              (col("o2") + col("r2")) * col("n1")).as("num"))
        val mx = cdf.agg(max(col("num")).as("ks_num"))
        cdf.join(broadcast(mx), col("num") === col("ks_num"))
          .groupBy(col("n1"), col("n2"), col("ks_num"))
          .agg(min(col("value")).as("ks_value"))
          .select(col("n1"), col("n2"), col("ks_num"), col("ks_value"),
            (col("ks_num").cast("double") /
              (col("n1").cast("double") * col("n2").cast("double")))
              .as("ks_stat"))
      },
      Some("""WITH f AS (
             |  SELECT value, event_type FROM events
             |  WHERE event_type IN ('click', 'purchase')),
             |d AS (SELECT value,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c1,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |      END) AS BIGINT) AS c2
             |  FROM f GROUP BY value),
             |c AS (SELECT value,
             |    CAST(SUM(c1) OVER (ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f1,
             |    CAST(SUM(c2) OVER (ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f2
             |  FROM d),
             |n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             |             CAST(SUM(c2) AS BIGINT) AS n2 FROM d),
             |x AS (SELECT value, n1, n2, ABS(f1 * n2 - f2 * n1) AS num
             |      FROM c, n),
             |m AS (SELECT MAX(num) AS ks_num FROM x)
             |SELECT n1, n2, ks_num,
             |  (SELECT MIN(value) FROM x WHERE num = m.ks_num) AS ks_value,
             |  CAST(ks_num AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat
             |FROM m, n""".stripMargin)),

    // ----- q140: Kaplan–Meier survival (time-to-conversion) ---------------
    // The right-censoring-aware lifetime curve a raw duration histogram
    // gets wrong: subjects are users, the event is their first HIGH-VALUE
    // purchase (value > 150 — q178's outcome; bare purchase saturates at
    // small SF and left the censored count identically zero, r12
    // degeneracy sweep — a KM curve with no censoring is just an ECDF),
    // users who never convert are CENSORED at their last observed event
    // (they contribute to the at-risk denominator until they leave, not
    // as fake conversions). Durations are integer hours from exact
    // microsecond arithmetic (unix_micros / epoch_us, floor-div — no
    // float time math). Both global prefixes avoid a global sort: the
    // at-risk counts use the q136 phased shape (per-day-bucket running
    // window + bucket-level offsets), and the survival PRODUCT — which
    // has no distributive aggregate — uses order-pinned list folds:
    // within-bucket prefix folds of collect_list over the dur-ordered
    // window, times a bucket-offset fold of per-bucket products. The
    // fold NESTING is mirrored token-for-token in the oracle, so the
    // doubles are bit-identical even though float multiply is not
    // associative. Censored-only durations carry factor exactly 1.0
    // (d = 0) and drop out of the reported steps but not the risk set;
    // the reported `c` is the LIFE-TABLE interval count — censorings in
    // [t_i, t_{i+1}) roll up to event time t_i (exact-hour censored
    // counts almost never coincide with an event hour, which left `c`
    // identically zero — r12 degeneracy sweep; the interval form is
    // also what the standard KM table prints). The anchor assignment is
    // a running max of event-durs through the same phased two-level
    // window shape as the risk counts — no unpartitioned window over
    // anything SF-scaling.
    NamedQuery(
      "q140_kaplan_meier",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val subj = events(s, d)
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase" &&
              col("value") > 150.0,
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tl"))
          .select(expr("(coalesce(tp, tl) - t0) div 3600000000").as("dur"),
            col("tp").isNotNull.as("ev"))
        val dist = subj.groupBy(col("dur"))
          .agg(sum(when(col("ev"), lit(1L)).otherwise(lit(0L))).as("d"),
            sum(when(col("ev"), lit(0L)).otherwise(lit(1L))).as("c"))
          .withColumn("b", expr("dur div 24"))
        val n = dist.agg(sum(col("d") + col("c")).as("n_total"))
        val wRun = Window.partitionBy(col("b")).orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wOffCnt = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = dist.groupBy(col("b"))
          .agg(sum(col("d") + col("c")).as("tb"))
          .select(col("b"),
            coalesce(sum(col("tb")).over(wOffCnt), lit(0L)).as("ocnt"))
        val risks = dist.join(broadcast(off), "b")
          .crossJoin(broadcast(n))
          .withColumn("before", col("ocnt") +
            coalesce(sum(col("d") + col("c")).over(wRun), lit(0L)))
          .withColumn("n_risk", col("n_total") - col("before"))
          .withColumn("f", lit(1.0) -
            col("d").cast("double") / col("n_risk").cast("double"))
        val wList = Window.partitionBy(col("b")).orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = risks
          .withColumn("fl", collect_list(col("f")).over(wList))
          .withColumn("pre",
            aggregate(col("fl"), lit(1.0), (a, x) => a * x))
        val bp = risks.groupBy(col("b"))
          .agg(expr("aggregate(transform(array_sort(" +
            "collect_list(struct(dur, f))), s -> s.f), 1.0D, " +
            "(a, x) -> a * x)").as("pb"))
        val wOffP = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offp = bp
          .withColumn("lp", collect_list(col("pb")).over(wOffP))
          .select(col("b"),
            aggregate(col("lp"), lit(1.0), (a, x) => a * x).as("po"))
        // life-table censoring: anchor every dist row to the most recent
        // event-duration ≤ it (within-bucket running max + bucket-level
        // offset maxes — the same phased shape as the risk counts), then
        // roll censored counts up to their anchor
        val wCum = Window.partitionBy(col("b")).orderBy(col("dur"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOffEv = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bm = dist.groupBy(col("b"))
          .agg(max(when(col("d") > 0, col("dur"))).as("bmax"))
          .withColumn("oev", max(col("bmax")).over(wOffEv))
          .select(col("b"), col("oev"))
        val cint = dist
          .withColumn("lastin",
            max(when(col("d") > 0, col("dur"))).over(wCum))
          .join(broadcast(bm), "b")
          .withColumn("anchor",
            greatest(coalesce(col("lastin"), lit(-1L)),
              coalesce(col("oev"), lit(-1L))))
          .filter(col("anchor") >= 0)
          .groupBy(col("anchor")).agg(sum(col("c")).as("ci"))
        pre.join(broadcast(offp), "b")
          .filter(col("d") > 0)
          .join(broadcast(cint.select(col("anchor").as("dur"),
            col("ci"))), Seq("dur"), "left")
          .select(col("dur"), col("d"),
            coalesce(col("ci"), lit(0L)).as("c"), col("n_risk"),
            (col("po") * col("pre")).as("surv"))
      },
      Some("""WITH s0 AS (
             |  SELECT user_id, min(epoch_us(ts)) AS t0,
             |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN epoch_us(ts) END) AS tp,
             |    max(epoch_us(ts)) AS tl
             |  FROM events GROUP BY user_id),
             |subj AS (
             |  SELECT (coalesce(tp, tl) - t0) // 3600000000 AS dur,
             |    tp IS NOT NULL AS ev
             |  FROM s0),
             |dist AS (
             |  SELECT dur,
             |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c,
             |    dur // 24 AS b
             |  FROM subj GROUP BY dur),
             |n AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n_total FROM dist),
             |off AS (
             |  SELECT b, coalesce(CAST(SUM(tb) OVER (ORDER BY b
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS BIGINT), 0) AS ocnt
             |  FROM (SELECT b, CAST(SUM(d + c) AS BIGINT) AS tb
             |        FROM dist GROUP BY b)),
             |risks AS (
             |  SELECT dur, d, c, dist.b AS b, n_total,
             |    CAST(n_total - (ocnt + coalesce(CAST(SUM(d + c) OVER (
             |      PARTITION BY dist.b ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS BIGINT), 0)) AS BIGINT) AS n_risk
             |  FROM dist JOIN off ON dist.b = off.b CROSS JOIN n),
             |r2 AS (
             |  SELECT dur, d, c, b, n_risk,
             |    1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
             |  FROM risks),
             |pre AS (
             |  SELECT dur, d, c, b, n_risk,
             |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             |      list(f) OVER (PARTITION BY b ORDER BY dur
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |      (a, x) -> a * x) AS pre
             |  FROM r2),
             |bp AS (
             |  SELECT b, list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             |      list(f ORDER BY dur)), (a, x) -> a * x) AS pb
             |  FROM r2 GROUP BY b),
             |offp AS (
             |  SELECT b, list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             |      coalesce(list(pb) OVER (ORDER BY b
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |        CAST([] AS DOUBLE[]))), (a, x) -> a * x) AS po
             |  FROM bp),
             |anch AS (
             |  SELECT dur, d, c,
             |    max(CASE WHEN d > 0 THEN dur END) OVER (ORDER BY dur
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS anchor
             |  FROM dist),
             |cint AS (
             |  SELECT anchor AS dur, CAST(SUM(c) AS BIGINT) AS ci
             |  FROM anch WHERE anchor IS NOT NULL GROUP BY anchor)
             |SELECT p.dur, p.d, CAST(coalesce(ci.ci, 0) AS BIGINT) AS c,
             |  p.n_risk, po * pre AS surv
             |FROM pre p JOIN offp USING (b)
             |LEFT JOIN cint ci ON ci.dur = p.dur
             |WHERE d > 0""".stripMargin)),

    // ----- q143: market-basket association rules (A-Priori 2-itemsets) ----
    // Agrawal–Srikant's frequent-pair mining, the distributed way: the
    // candidate space is pruned BEFORE the pair join (a part enters the
    // basket self-join only if its 1-item support already clears the
    // threshold — the A-Priori monotonicity step, applied as a broadcast
    // semi-join), so pair work is bounded by Σ basket² over FREQUENT
    // items, never |parts|². The self-join key is the order id: a basket
    // joins only itself, and baskets are small (TPC-H ≤ 7 lines), so no
    // pair explosion regardless of corpus size. Supports are exact
    // integers; confidence and lift are single-rounding double ratios of
    // those integers (identical expression trees both engines). Output =
    // global top-20 by (support, p1, p2) — a TakeOrderedAndProject, not
    // a full sort. The part-support side is part-dimension-sized and
    // broadcast; the order-count is ONE scalar row.
    NamedQuery(
      "q143_basket_rules",
      (s, d) => {
        // pinned (r18 optimization): the basket item set feeds three
        // consumers (item supports, the order count, the frequent-item
        // semi-join) and the frequent-item baskets feed three more (the
        // pair-work diagnostic and both self-join sides, whose aliases
        // differ so exchange reuse cannot dedup them). Unpinned, each
        // consumer re-scanned lineitem and re-paid the distinct.
        val items = OpsKit.pinned(tbl(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct())
        val supp1 = OpsKit.pinned(items.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("s")))
        val norders = items.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        val freq = supp1.filter(col("s") >= 3)
        val fitems = OpsKit.pinned(items
          .join(broadcast(freq.select(col("l_partkey"))), "l_partkey"))
        // operational diagnostic, carried in the output: the WORST
        // per-basket pair expansion max C(|basket|,2) over frequent-item
        // baskets — the quantity that must stay bounded for the self-
        // join to stay linear; a probe battery watching this column
        // sees super-linear growth before it hurts (SCALING.md q143)
        val maxPairWork = fitems
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("bs"))
          .agg(max(expr("bs * (bs - 1) div 2")).as("max_pair_work"))
        val a = fitems.select(col("l_orderkey"), col("l_partkey").as("p1"))
        val b = fitems.select(col("l_orderkey"), col("l_partkey").as("p2"))
        val pairs = a.join(b, Seq("l_orderkey"))
          .filter(col("p1") < col("p2"))
          .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
        val s1 = supp1.select(col("l_partkey").as("p1"), col("s").as("s1"))
        val s2 = supp1.select(col("l_partkey").as("p2"), col("s").as("s2"))
        pairs.join(broadcast(s1), "p1").join(broadcast(s2), "p2")
          .crossJoin(broadcast(norders))
          .crossJoin(broadcast(maxPairWork))
          .select(col("p1"), col("p2"), col("supp"), col("s1"), col("s2"),
            (col("supp").cast("double") / col("s1").cast("double"))
              .as("conf"),
            ((col("supp").cast("double") * col("n_orders").cast("double"))
              / (col("s1").cast("double") * col("s2").cast("double")))
              .as("lift"),
            col("max_pair_work"))
          .orderBy(col("supp").desc, col("p1"), col("p2"))
          .limit(20)
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |s1t AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s
             |        FROM items GROUP BY l_partkey),
             |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
             |        AS n_orders FROM items),
             |f AS (SELECT l_partkey FROM s1t WHERE s >= 3),
             |fi AS (SELECT i.l_orderkey, i.l_partkey FROM items i
             |       JOIN f ON i.l_partkey = f.l_partkey),
             |p AS (
             |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             |    CAST(COUNT(*) AS BIGINT) AS supp
             |  FROM fi a JOIN fi b ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
             |bw AS (
             |  SELECT CAST(MAX((c * (c - 1)) // 2) AS BIGINT)
             |    AS max_pair_work
             |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
             |        FROM fi GROUP BY l_orderkey))
             |SELECT p1, p2, supp, x.s AS s1, y.s AS s2,
             |  CAST(supp AS DOUBLE) / CAST(x.s AS DOUBLE) AS conf,
             |  (CAST(supp AS DOUBLE) * CAST(n_orders AS DOUBLE))
             |    / (CAST(x.s AS DOUBLE) * CAST(y.s AS DOUBLE)) AS lift,
             |  max_pair_work
             |FROM p JOIN s1t x ON p.p1 = x.l_partkey
             |       JOIN s1t y ON p.p2 = y.l_partkey
             |       CROSS JOIN n CROSS JOIN bw
             |ORDER BY supp DESC, p1, p2 LIMIT 20""".stripMargin)),

    // ----- q144: Pareto skyline (2-D dominance) without the O(n²) join ----
    // The classic skyline operator (Börzsönyi et al., ICDE 2001): parts
    // on the (cheapest-offer, most-units-sold) frontier — no other part
    // is at-most-as-expensive AND at-least-as-demanded with one strict.
    // The textbook formulation is a quadratic NOT EXISTS self-join; the
    // 2-D identity "on the skyline ⟺ best-discount-at-this-price beats
    // the best discount over all STRICTLY cheaper prices" turns it into
    // a strict-prefix-max — built here with the q136 phased shape
    // (per-price-bucket running max + bucket-level offsets), so a 100 TB
    // offer table computes its frontier with two bounded windows and
    // zero global sorts. Money lands on an exact cent grid via
    // floor(x·100 + 0.5) (round-half-up — identical IEEE ops both
    // engines). The ORACLE deliberately uses the quadratic NOT EXISTS
    // definition — construction-independent semantics, so a bug in the
    // prefix-max identity cannot self-confirm. Ties: equal (price,
    // discount) points dominate neither way and are BOTH kept.
    NamedQuery(
      "q144_pareto_skyline",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val parts = tbl(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(min(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).as("pc"),
            sum(floor(col("l_quantity")).cast("long")).as("dc"))
        val pts = parts.groupBy(col("pc")).agg(max(col("dc")).as("bd"))
          .withColumn("b", expr("pc div 100000"))
        val wIn = Window.partitionBy(col("b")).orderBy(col("pc"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = pts.groupBy(col("b")).agg(max(col("bd")).as("mb"))
          .select(col("b"),
            coalesce(max(col("mb")).over(wOff), lit(-1L)).as("omax"))
        val sky = pts.join(broadcast(off), "b")
          .withColumn("prefix", greatest(col("omax"),
            coalesce(max(col("bd")).over(wIn), lit(-1L))))
          .filter(col("bd") > col("prefix"))
          .select(col("pc"), col("bd").as("dc"))
        parts.join(broadcast(sky), Seq("pc", "dc"))
          .select(col("l_partkey"), col("pc"), col("dc"))
      },
      Some("""WITH parts AS (
             |  SELECT l_partkey,
             |    CAST(MIN(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT)
             |      AS pc,
             |    CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
             |      AS dc
             |  FROM lineitem GROUP BY l_partkey)
             |SELECT p.l_partkey, p.pc, p.dc FROM parts p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM parts q
             |  WHERE q.pc <= p.pc AND q.dc >= p.dc
             |    AND (q.pc < p.pc OR q.dc > p.dc))""".stripMargin)),

    // ----- q147: per-segment OLS trend (drift by regression) --------------
    // Is each event type's value drifting over time, and how fast? The
    // regression complement to the q96/q99/q136 drift gates: a chi-square
    // says "the distribution moved", the fitted slope says "by this many
    // cents per day, in this direction". Same exactness discipline as
    // q121: x = integer epoch days (floor-div of microseconds), y =
    // integer cents (floor(v·100 + 0.5)), all five moments summed in
    // DECIMAL(38,0) (order-independent, overflow-loud) and cast to
    // double ONCE, then the textbook closed form runs as a fixed IEEE
    // op sequence identical on both engines. Degenerate segments (one
    // point, or zero x-variance) yield NULL slope/intercept/r² via the
    // shared positive-variance guard, never ±inf. Scale shape: one
    // (type)-keyed partial aggregate over the raw events — the moments
    // ARE the sufficient statistics, so a 100 TB log reduces to 5 rows
    // before any arithmetic happens.
    NamedQuery(
      "q147_trend_ols",
      (s, d) => {
        val pts = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("x"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
              .as("y"))
        val m = pts.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).cast("double")
            .as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double")
            .as("sxx"),
          sum((col("y").cast("decimal(19,0)") *
            col("y").cast("decimal(19,0)")).cast("decimal(38,0)"))
            .cast("double").as("syy"))
        val nd = col("n").cast("double")
        val dx = nd * col("sxx") - col("sx") * col("sx")
        val dy = nd * col("syy") - col("sy") * col("sy")
        val num = nd * col("sxy") - col("sx") * col("sy")
        m.select(col("event_type"), col("n"),
          when(dx > 0.0, num / dx).as("slope"),
          when(dx > 0.0,
            (col("sy") - (num / dx) * col("sx")) / nd).as("intercept"),
          when(dx > 0.0 && dy > 0.0,
            (num / sqrt(dx)) / sqrt(dy) * (num / sqrt(dx)) / sqrt(dy))
            .as("r2"))
      },
      Some("""WITH pts AS (
             |  SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS x,
             |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
             |  FROM events),
             |m AS (
             |  SELECT event_type, COUNT(*) AS n,
             |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |         AS DOUBLE) AS sx,
             |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |         AS DOUBLE) AS sy,
             |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,0)))
             |         AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
             |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0)))
             |         AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
             |           * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
             |         AS DECIMAL(38,0)) AS DOUBLE) AS syy
             |  FROM pts GROUP BY event_type)
             |SELECT event_type, n,
             |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
             |    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
             |         / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope,
             |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
             |    THEN (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
             |                / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             |         / CAST(n AS DOUBLE) END AS intercept,
             |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
             |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
             |    THEN ((CAST(n AS DOUBLE) * sxy - sx * sy)
             |          / sqrt(CAST(n AS DOUBLE) * sxx - sx * sx))
             |         / sqrt(CAST(n AS DOUBLE) * syy - sy * sy)
             |         * ((CAST(n AS DOUBLE) * sxy - sx * sy)
             |            / sqrt(CAST(n AS DOUBLE) * sxx - sx * sx))
             |         / sqrt(CAST(n AS DOUBLE) * syy - sy * sy)
             |  END AS r2
             |FROM m""".stripMargin)),

    // ----- q148: segment placement in the global value distribution -------
    // Quantile-normalization's reporting half: where does each event
    // type's value mass sit in the GLOBAL spend distribution? (q96's
    // chi-square bins by absolute value; this bins by global RANK, so
    // it answers "purchases live in the top decile" even when scales
    // drift.) The global CDF is built the q136 way — distinct values
    // range-bucketed by ⌊value⌋, running counts per bucket window,
    // bucket-level offsets, NO global sort — then every event meets its
    // value's inclusive rank F(v) in a hash join and lands in decile
    // (10·F − 1) div N: PURE INTEGER binning, so decile edges cannot
    // drift across engines (F ∈ [1, N] maps onto 0..9 with no cap
    // needed). Output: (type, decile, n, share-of-type) — 5×10 rows
    // from any log size; the oracle builds F with a plain global
    // cumulative (construction-independent semantics: count of rows
    // ≤ v), so a bug in the phased offsets cannot self-confirm.
    NamedQuery(
      "q148_global_decile_mix",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("event_type"), col("value"))
        val dist = ev.groupBy(col("value")).agg(count(lit(1)).as("c"))
          .withColumn("b", floor(col("value")).cast("long"))
        val wRun = Window.partitionBy(col("b")).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = dist.withColumn("r", sum(col("c")).over(wRun))
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = dist.groupBy(col("b")).agg(sum(col("c")).as("tb"))
          .select(col("b"),
            coalesce(sum(col("tb")).over(wOff), lit(0L)).as("o"))
        val n = dist.agg(sum(col("c")).as("n_total"))
        val ranks = run.join(broadcast(off), "b")
          .crossJoin(broadcast(n))
          .select(col("value"),
            expr("((o + r) * 10 - 1) div n_total").as("decile"))
        val typed = ev.join(ranks, "value")
          .groupBy(col("event_type"), col("decile"))
          .agg(count(lit(1)).as("n"))
        val totals = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("tot"))
        typed.join(broadcast(totals), "event_type")
          .select(col("event_type"), col("decile"), col("n"),
            (col("n").cast("double") / col("tot").cast("double"))
              .as("share"))
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events),
             |d AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM ev GROUP BY value),
             |cdf AS (SELECT value,
             |    CAST(SUM(c) OVER (ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f
             |  FROM d),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM d),
             |ranks AS (SELECT value, (f * 10 - 1) // n_total AS decile
             |          FROM cdf, n),
             |typed AS (
             |  SELECT ev.event_type, r.decile,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM ev JOIN ranks r ON ev.value = r.value
             |  GROUP BY ev.event_type, r.decile),
             |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS tot
             |        FROM ev GROUP BY event_type)
             |SELECT t.event_type, t.decile, t.n,
             |  CAST(t.n AS DOUBLE) / CAST(x.tot AS DOUBLE) AS share
             |FROM typed t JOIN tot x ON t.event_type = x.event_type"""
        .stripMargin)),

    // ----- q149: right-to-be-forgotten cascade audit ----------------------
    // The deletion-impact report a data-governance pipeline runs BEFORE
    // executing a GDPR/CCPA erasure batch: a deletion cohort (here one
    // nation's customers — any predicate drops in) cascades through the
    // FK graph customer → orders → lineitem, and the audit reports per
    // table how many rows the cascade touches. Each hop is ONE semi-join
    // on the parent's surviving key set — the cohort's key set stays
    // key-shaped (never row-shaped), so at 100 TB the orders hop
    // shuffles on custkey and the lineitem hop on orderkey, both plain
    // hash joins; nothing is materialized except counts. The three
    // per-table aggregates are single partial-agg rows unioned into the
    // audit table; kept ≡ total − deleted is structural (semi ∪ anti
    // partitions a table), so the oracle's independent IN-subquery
    // counts gate the join plumbing, not just arithmetic.
    NamedQuery(
      "q149_erasure_cascade",
      (s, d) => {
        val cust = tbl(s, d, "customer")
        val orders = tbl(s, d, "orders")
        val li = tbl(s, d, "lineitem")
        val delCust = cust.filter(col("c_nationkey") === 3)
          .select(col("c_custkey"))
        val delOrders = orders
          .join(delCust, col("o_custkey") === col("c_custkey"), "semi")
          .select(col("o_orderkey"))
        val delLi = li
          .join(delOrders, col("l_orderkey") === col("o_orderkey"), "semi")
        def audit(name: String, total: org.apache.spark.sql.DataFrame,
            deleted: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val t = total.agg(count(lit(1)).as("n_total"))
          val x = deleted.agg(count(lit(1)).as("n_deleted"))
          t.crossJoin(x).select(lit(name).as("tbl"), col("n_total"),
            col("n_deleted"),
            (col("n_total") - col("n_deleted")).as("n_kept"))
        }
        audit("customer", cust, cust.filter(col("c_nationkey") === 3))
          .unionByName(audit("orders", orders,
            orders.join(delCust, col("o_custkey") === col("c_custkey"),
              "semi")))
          .unionByName(audit("lineitem", li, delLi))
      },
      Some("""WITH delc AS (
             |  SELECT c_custkey FROM customer WHERE c_nationkey = 3),
             |delo AS (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_custkey IN (SELECT c_custkey FROM delc)),
             |a AS (
             |  SELECT 'customer' AS tbl,
             |    CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
             |      AS n_total,
             |    CAST((SELECT COUNT(*) FROM delc) AS BIGINT) AS n_deleted
             |  UNION ALL
             |  SELECT 'orders',
             |    CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
             |    CAST((SELECT COUNT(*) FROM delo) AS BIGINT)
             |  UNION ALL
             |  SELECT 'lineitem',
             |    CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
             |    CAST((SELECT COUNT(*) FROM lineitem
             |          WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
             |      AS BIGINT))
             |SELECT tbl, n_total, n_deleted,
             |  n_total - n_deleted AS n_kept
             |FROM a""".stripMargin)),

    // ----- q175: Benford first-digit audit (synthetic-data detector) ------
    // The forensic data-quality gate: naturally-occurring positive
    // amounts follow Benford's law; fabricated or clipped feeds don't,
    // so a per-stream chi-square against the Benford mass flags suspect
    // sources before they poison downstream stats. log10(1+1/d) would be
    // libm, so the nine expected masses are 6-decimal LITERALS (the q179
    // discount-table move). First digits are extracted EXACTLY: amounts
    // are half-up-scaled to integer cents (floor(v·100+0.5) — never
    // engine round(), whose tie mode differs) and the leading digit read
    // off the integer's decimal string, which both engines render
    // identically — no log, no float normalization loop. The digit grid
    // is densified (event_type × 1..9) so absent digits still carry
    // their expected mass into the statistic. Chi-square at df=8,
    // α=0.005 → flag above 21.955. Shape: one scan to a 9-bucket
    // partial aggregate per stream, broadcast grid/rollup joins — the
    // corpus is read once, everything downstream is O(types·9).
    NamedQuery(
      "q175_benford_audit",
      (s, d) => {
        val benford = BenfordMass.tail.foldLeft(
          when(col("digit") === BenfordMass.head._1,
            lit(BenfordMass.head._2))) { case (acc, (dg, p)) =>
          acc.when(col("digit") === dg, lit(p))
        }
        // floor(v·100+0.5) >= 1 excludes values in (0, 0.005), whose
        // scaled cents are 0: digit 0 has no cell in the 1–9 grid, so
        // counting those rows in the totals would inflate every expected
        // mass and bias the chi-square (mirrored in the oracle)
        val ev = events(s, d).filter(col("value") > 0.0)
          .filter(floor(col("value") * 100 + lit(0.5)) >= 1)
          .select(col("event_type"),
            substring(floor(col("value") * 100 + lit(0.5)).cast("string"),
              1, 1).cast("int").as("digit"))
        val obs = ev.groupBy(col("event_type"), col("digit"))
          .agg(count(lit(1)).as("n_obs"))
        val tot = obs.groupBy(col("event_type")).agg(sum(col("n_obs")).as("n"))
        val digits = s.range(1, 10).select(col("id").cast("int").as("digit"))
        val dense = tot.crossJoin(broadcast(digits))
          .join(obs, Seq("event_type", "digit"), "left")
          .select(col("event_type"), col("digit"),
            coalesce(col("n_obs"), lit(0L)).as("n_obs"),
            (col("n").cast("double") * benford).as("expected"))
          .withColumn("contrib",
            (col("n_obs").cast("double") - col("expected")) *
              (col("n_obs").cast("double") - col("expected")) /
              col("expected"))
        val chi = dense.groupBy(col("event_type"))
          .agg(dsum(col("contrib")).as("chi2"))
        dense.join(broadcast(chi), "event_type")
          .select(col("event_type"), col("digit"), col("n_obs"),
            col("expected"), col("contrib"), col("chi2"),
            (col("chi2") > lit(21.955)).as("flagged"))
      },
      Some {
        val caseSql = BenfordMass
          .map { case (dg, p) => s"WHEN $dg THEN $p" }
          .mkString("CASE g.digit ", " ", " END")
        s"""WITH ev AS (
           |  SELECT event_type,
           |    CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
           |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
           |  FROM events
           |  WHERE value > 0.0 AND floor(value * 100 + 0.5) >= 1),
           |obs AS (
           |  SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
           |  FROM ev GROUP BY event_type, digit),
           |tot AS (
           |  SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n
           |  FROM obs GROUP BY event_type),
           |dense AS (
           |  SELECT t.event_type, g.digit,
           |    CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           |    CAST(t.n AS DOUBLE) * ($caseSql) AS expected
           |  FROM tot t CROSS JOIN (
           |    SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit) g
           |  LEFT JOIN obs o
           |    ON o.event_type = t.event_type AND o.digit = g.digit),
           |c AS (
           |  SELECT *,
           |    (CAST(n_obs AS DOUBLE) - expected)
           |      * (CAST(n_obs AS DOUBLE) - expected) / expected AS contrib
           |  FROM dense),
           |chi AS (
           |  SELECT event_type, ${dsumSql("contrib")} AS chi2
           |  FROM c GROUP BY event_type)
           |SELECT c.event_type, c.digit, c.n_obs, c.expected, c.contrib,
           |  chi.chi2, chi.chi2 > 21.955 AS flagged
           |FROM c JOIN chi USING (event_type)""".stripMargin
      }),

    // ----- q177: Markov stationary distribution (integer power iter) ------
    // Where does a user's journey SETTLE? q73 builds the one-step
    // transition matrix; this runs the power iteration to its stationary
    // measure — the q133 integer-grid contract applied to the type graph:
    // mass starts at 10^12 per state and each round moves
    // (m·n(i,j)) div tot(i) along every observed transition, so all
    // arithmetic is exact integer (the product widened to DECIMAL(38,0)/
    // HUGEINT — see the round body) and the result is bit-exact at any
    // partition count (no float matmul, no libm). Four synchronous rounds, fixed by
    // design (the q141 bounded-horizon reproducibility rule). Scale: the
    // matrix is |event_type|² — provenance-bounded like q176's sources —
    // so every join is a broadcast; the only corpus-sized work is q73's
    // own lag-window shuffle to COUNT the transitions.
    NamedQuery(
      "q177_stationary_dist",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("to_type"))
          .withColumn("from_type", lag(col("to_type"), 1).over(w))
          .filter(col("from_type").isNotNull)
        val counts = pairs.groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tm = counts.join(
          counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot")),
          "from_type")
        val types = counts.select(col("from_type").as("t"))
          .unionByName(counts.select(col("to_type").as("t"))).distinct()
        var mass = types.select(col("t"), lit(1000000000000L).as("m"))
        for (_ <- 1 to 4) {
          // the m·n product is computed in DECIMAL(38,0) (HUGEINT in the
          // oracle), NOT BIGINT: m ≤ 10^12 and n is a corpus-scale
          // transition count, so the raw long product overflows past
          // ~2M transitions per edge — where Spark (non-ANSI) would wrap
          // silently while DuckDB raises. The widened product is ≤ 10^25,
          // exact in both engines, and the quotient is ≤ m, so the final
          // BIGINT landing is always safe.
          val contrib = tm.join(mass, col("from_type") === col("t"))
            .select(col("to_type"),
              expr("(CAST(m AS DECIMAL(38,0)) * n) div tot").as("c"))
            .groupBy(col("to_type")).agg(sum(col("c")).as("sc"))
          mass = types.join(broadcast(contrib),
              col("t") === col("to_type"), "left")
            .select(col("t"), coalesce(col("sc"), lit(0L)).as("m"))
        }
        mass.select(col("t").as("event_type"), col("m").as("mass"))
      },
      Some {
        def round(prev: String, cur: Int): String =
          s"""c$cur AS (
             |  SELECT tm.to_type, CAST(SUM(
             |      CAST((CAST(r.m AS HUGEINT) * tm.n) // tm.tot AS BIGINT)
             |    ) AS BIGINT) AS sc
             |  FROM tm JOIN $prev r ON tm.from_type = r.t
             |  GROUP BY tm.to_type),
             |r$cur AS (
             |  SELECT t, CAST(COALESCE(sc, 0) AS BIGINT) AS m
             |  FROM types LEFT JOIN c$cur ON t = to_type)""".stripMargin
        s"""WITH pairs AS (
           |  SELECT lag(event_type) OVER
           |      (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
           |    event_type AS to_type
           |  FROM events),
           |counts AS (
           |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM pairs WHERE from_type IS NOT NULL
           |  GROUP BY from_type, to_type),
           |tm AS (
           |  SELECT c.from_type, c.to_type, c.n, t.tot
           |  FROM counts c JOIN (
           |    SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
           |    FROM counts GROUP BY from_type) t USING (from_type)),
           |types AS (
           |  SELECT from_type AS t FROM counts
           |  UNION SELECT to_type FROM counts),
           |r0 AS (SELECT t, CAST(1000000000000 AS BIGINT) AS m FROM types),
           |${round("r0", 1)},
           |${round("r1", 2)},
           |${round("r2", 3)},
           |${round("r3", 4)}
           |SELECT t AS event_type, m AS mass FROM r4""".stripMargin
      }),

    // ----- q178: A/B two-proportion z-test (hash-bucketed arms) -----------
    // The experimentation primitive: users are assigned to arms by id
    // parity (the deterministic stand-in for a salted assignment hash),
    // conversion is "ever purchased", and the two-proportion z-statistic
    // with pooled variance decides significance at 1.96. Every input is
    // an integer count; the z expression is rational-plus-one-sqrt (the
    // IEEE-exact transcendental, q176's contract) evaluated on a SINGLE
    // row, so parity is the mirrored expression tree. Shape: one per-user
    // rollup (shuffle on user_id), then a 2-row conditional aggregate —
    // the corpus is touched once; at 100 TB this is a partial-agg
    // pipeline with a scalar epilogue.
    NamedQuery(
      "q178_ab_ztest",
      (s, d) => {
        val perUser = events(s, d)
          .select(col("user_id"), col("event_type"), col("value"))
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 150.0, 1L).otherwise(0L)).as("converted"))
          .select(col("user_id"), col("converted"),
            when(pmod(col("user_id"), lit(2L)) === 0L, lit("control"))
              .otherwise(lit("treatment")).as("arm"))
        perUser.groupBy()
          .agg(
            sum(when(col("arm") === "control", 1L).otherwise(0L))
              .as("n_control"),
            sum(when(col("arm") === "treatment", 1L).otherwise(0L))
              .as("n_treat"),
            sum(when(col("arm") === "control", col("converted"))
              .otherwise(0L)).as("x_control"),
            sum(when(col("arm") === "treatment", col("converted"))
              .otherwise(0L)).as("x_treat"))
          .select(col("n_control"), col("n_treat"),
            col("x_control"), col("x_treat"),
            (col("x_control").cast("double") /
              col("n_control").cast("double")).as("p_control"),
            (col("x_treat").cast("double") /
              col("n_treat").cast("double")).as("p_treat"),
            ((col("x_control") + col("x_treat")).cast("double") /
              (col("n_control") + col("n_treat")).cast("double"))
              .as("p_pool"))
          .withColumn("se",
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_control").cast("double") +
                lit(1.0) / col("n_treat").cast("double"))))
          // se = 0 (all-or-none conversion) → NULL z, not a crash: the
          // degenerate experiment is reported, never masked by ANSI mode
          .select(col("n_control"), col("n_treat"),
            col("x_control"), col("x_treat"),
            col("p_control"), col("p_treat"),
            when(col("se") > 0.0,
              (col("p_treat") - col("p_control")) / col("se"))
              .as("z_stat"))
          .withColumn("significant", abs(col("z_stat")) > lit(1.96))
      },
      Some("""WITH pu AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |      THEN 1 ELSE 0 END) AS converted,
             |    CASE WHEN user_id % 2 = 0 THEN 'control'
             |         ELSE 'treatment' END AS arm
             |  FROM events GROUP BY user_id),
             |agg AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_control,
             |    CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_treat,
             |    CAST(SUM(CASE WHEN arm = 'control' THEN converted
             |      ELSE 0 END) AS BIGINT) AS x_control,
             |    CAST(SUM(CASE WHEN arm = 'treatment' THEN converted
             |      ELSE 0 END) AS BIGINT) AS x_treat
             |  FROM pu),
             |p AS (
             |  SELECT *,
             |    CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE)
             |      AS p_control,
             |    CAST(x_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
             |      AS p_treat,
             |    CAST(x_control + x_treat AS DOUBLE)
             |      / CAST(n_control + n_treat AS DOUBLE) AS p_pool
             |  FROM agg),
             |se AS (
             |  SELECT *,
             |    sqrt(p_pool * (1.0 - p_pool)
             |         * (1.0 / CAST(n_control AS DOUBLE)
             |            + 1.0 / CAST(n_treat AS DOUBLE))) AS se
             |  FROM p)
             |SELECT n_control, n_treat, x_control, x_treat,
             |  p_control, p_treat,
             |  CASE WHEN se > 0.0 THEN (p_treat - p_control) / se END
             |    AS z_stat,
             |  abs(CASE WHEN se > 0.0 THEN (p_treat - p_control) / se END)
             |    > 1.96 AS significant
             |FROM se""".stripMargin)),

    // ----- q180: mix-shift decomposition of a metric change ---------------
    // "Average value dropped 4% — is any segment actually worse, or did
    // the MIX move?" The Oaxaca-style two-period decomposition: split the
    // corpus at the midpoint day, and per event_type express the overall
    // Δmean as a within-segment term w2·(m2−m1) plus a mix term
    // (w2−w1)·m1 — the two columns sum (over segments) to exactly
    // ȳ2−ȳ1. Means are decimal-exact sums over integer counts; weights
    // are integer ratios; the products are mirrored double trees. Shape:
    // one scan, one (segment, period) partial aggregate, a broadcast of
    // the 2-row period totals — no windows, no second pass over the
    // corpus.
    NamedQuery(
      "q180_mix_shift",
      (s, d) => {
        val ev = events(s, d)
        val bounds = ev.agg(
          min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        val tagged = ev.crossJoin(broadcast(bounds))
          .select(col("event_type"), col("value"),
            when(datediff(to_date(col("ts")), col("d0")) * 2 <=
              datediff(col("d1"), col("d0")), lit("p1"))
              .otherwise(lit("p2")).as("period"))
        val seg = tagged.groupBy(col("event_type"), col("period"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
        val ptot = seg.groupBy(col("period")).agg(sum(col("n")).as("ntot"))
        val m = seg.join(broadcast(ptot), "period")
          .select(col("event_type"), col("period"),
            (col("sv") / col("n").cast("double")).as("mean"),
            (col("n").cast("double") / col("ntot").cast("double")).as("w"))
        val p1 = m.filter(col("period") === "p1")
          .select(col("event_type"), col("mean").as("m1"), col("w").as("w1"))
        val p2 = m.filter(col("period") === "p2")
          .select(col("event_type"), col("mean").as("m2"), col("w").as("w2"))
        p1.join(p2, "event_type")
          .select(col("event_type"), col("w1"), col("w2"),
            col("m1"), col("m2"),
            (col("w2") * (col("m2") - col("m1"))).as("within_delta"),
            ((col("w2") - col("w1")) * col("m1")).as("mix_delta"))
      },
      Some(s"""WITH b AS (
             |  SELECT MIN(CAST(ts AS DATE)) AS d0,
             |         MAX(CAST(ts AS DATE)) AS d1 FROM events),
             |tagged AS (
             |  SELECT event_type, value,
             |    CASE WHEN date_diff('day', b.d0, CAST(ts AS DATE)) * 2
             |           <= date_diff('day', b.d0, b.d1)
             |      THEN 'p1' ELSE 'p2' END AS period
             |  FROM events CROSS JOIN b),
             |seg AS (
             |  SELECT event_type, period, CAST(COUNT(*) AS BIGINT) AS n,
             |    ${dsumSql("value")} AS sv
             |  FROM tagged GROUP BY event_type, period),
             |ptot AS (
             |  SELECT period, CAST(SUM(n) AS BIGINT) AS ntot
             |  FROM seg GROUP BY period),
             |m AS (
             |  SELECT event_type, period,
             |    sv / CAST(n AS DOUBLE) AS mean,
             |    CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE) AS w
             |  FROM seg JOIN ptot USING (period))
             |SELECT p1.event_type, p1.w AS w1, p2.w AS w2,
             |  p1.mean AS m1, p2.mean AS m2,
             |  p2.w * (p2.mean - p1.mean) AS within_delta,
             |  (p2.w - p1.w) * p1.mean AS mix_delta
             |FROM m p1 JOIN m p2 ON p1.event_type = p2.event_type
             |  AND p1.period = 'p1' AND p2.period = 'p2'""".stripMargin)),

    // ----- q181: frequent session paths (journey mining) ------------------
    // The "what do users actually DO" query: sessionize by the q122
    // 30-minute gap rule, render each session's first five event types as
    // a '>'-joined path string, and count path frequencies (top 20).
    // Truncating at five keeps the path alphabet bounded (the classic
    // prefix-mining guard against one marathon session minting a
    // unique-forever string). Determinism: the in-session order is the
    // total (ts, event_id) order, imposed on the Spark side by sorting
    // (ts_us, event_id, type) structs — no collect_list order roulette —
    // and on the oracle side by ORDER BY inside list(). Shape: one
    // user-window pass, one session rollup, one path count; top-20 is a
    // TakeOrdered.
    NamedQuery(
      "q181_session_paths",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(wc))
          .groupBy(col("user_id"), col("session_id"))
          .agg(collect_list(struct(unix_micros(col("ts")).as("us"),
            col("event_id").as("eid"), col("event_type").as("et")))
            .as("evs"))
          .select(array_join(
            transform(slice(array_sort(col("evs")), 1, 5), x => x("et")),
            ">").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    CASE WHEN prev_us IS NULL
             |           OR epoch_us(ts) - prev_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM o),
             |sess AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    SUM(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_id
             |  FROM f),
             |paths AS (
             |  SELECT array_to_string(
             |    (list(event_type ORDER BY ts, event_id))[1:5], '>')
             |    AS path
             |  FROM sess GROUP BY user_id, session_id)
             |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
             |FROM paths GROUP BY path
             |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    // ----- q183: seasonal-baseline anomaly summary ------------------------
    // q97 z-scores against a GLOBAL per-type baseline; real telemetry is
    // seasonal, so the honest baseline is (event_type, day-of-week,
    // hour-of-day). Per cell: count, decimal-exact mean, sample std (the
    // Σv²/Σv form on the decimal grid, clamped at zero before the
    // IEEE-exact sqrt), and how many of the cell's own events sit more
    // than 3σ out — the calibration view an alerting pipeline reads
    // before it trusts a threshold. Cells with n<5 report zero anomalies
    // by rule (a 2-event "baseline" is noise). Day-of-week is numeric
    // with Sunday=0 on BOTH engines (Spark's dayofweek()−1 — never
    // locale-dependent day NAMES across engines). Shape: one partial
    // aggregate to the bounded cell grid, one broadcast join back for the
    // 3σ test, one final rollup — two scans, no windows.
    NamedQuery(
      "q183_seasonal_anomaly",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"), col("value"),
            (dayofweek(col("ts")) - 1).as("dow"), hour(col("ts")).as("hod"))
        val cells = ev.groupBy(col("event_type"), col("dow"), col("hod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"),
            dsum(col("value") * col("value")).as("sv2"))
          .select(col("event_type"), col("dow"), col("hod"), col("n"),
            (col("sv") / col("n").cast("double")).as("mean"),
            when(col("n") > 1,
              sqrt(greatest(
                (col("sv2") - col("sv") * col("sv") /
                  col("n").cast("double")) /
                  (col("n") - 1).cast("double"),
                lit(0.0)))).as("std"))
        ev.join(broadcast(cells), Seq("event_type", "dow", "hod"))
          .groupBy(col("event_type"), col("dow"), col("hod"))
          .agg(first(col("n")).as("n"), first(col("mean")).as("mean"),
            first(col("std")).as("std"),
            sum(when(col("n") >= 5 && col("std").isNotNull &&
              abs(col("value") - col("mean")) > lit(3.0) * col("std"), 1L)
              .otherwise(0L)).as("n_anomalies"))
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type, value,
             |    CAST(dayofweek(ts) AS INTEGER) AS dow,
             |    CAST(hour(ts) AS INTEGER) AS hod
             |  FROM events),
             |cells AS (
             |  SELECT event_type, dow, hod, CAST(COUNT(*) AS BIGINT) AS n,
             |    ${dsumSql("value")} AS sv,
             |    ${dsumSql("value * value")} AS sv2
             |  FROM ev GROUP BY event_type, dow, hod),
             |stats AS (
             |  SELECT event_type, dow, hod, n,
             |    sv / CAST(n AS DOUBLE) AS mean,
             |    CASE WHEN n > 1 THEN
             |      sqrt(greatest(
             |        (sv2 - sv * sv / CAST(n AS DOUBLE))
             |          / CAST(n - 1 AS DOUBLE), 0.0))
             |    END AS std
             |  FROM cells)
             |SELECT s.event_type, s.dow, s.hod, s.n, s.mean, s.std,
             |  CAST(SUM(CASE WHEN s.n >= 5 AND s.std IS NOT NULL
             |    AND abs(e.value - s.mean) > 3.0 * s.std
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
             |FROM ev e JOIN stats s USING (event_type, dow, hod)
             |GROUP BY s.event_type, s.dow, s.hod, s.n, s.mean, s.std"""
        .stripMargin)),

    // ----- q188: log-rank test (two-sample survival comparison) -----------
    // q140 draws the curve; the log-rank test (Mantel 1966) answers the
    // question the curve raises: do the two arms' time-to-conversion
    // distributions actually DIFFER? Same subjects/censoring as q140
    // (first HIGH-VALUE purchase = event — kept in lockstep with q140's
    // r12 de-degeneration so the family shares one outcome definition —
    // last-seen = censor), arms by id parity
    // (q178's assignment). At each event time: observed-vs-expected arm-A
    // events under the shared-hazard null, hypergeometric variance,
    // χ²₁ = (Σ(O−E))²/ΣV, significance at 3.841. All at-risk counts come
    // from a range self-join on the HOUR-grain duration-distribution
    // table (≈ retention-horizon-bounded rows — T² on a dimension table,
    // zero windows, no q140-style phased prefix needed); per-time terms
    // are integer ratios on mirrored trees, summed on the decimal grid.
    // n = 1 tails carry V = 0 by rule (the 0/0 hypergeometric cell).
    NamedQuery(
      "q188_logrank",
      (s, d) => {
        val subj = events(s, d)
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase" &&
              col("value") > 150.0,
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tl"))
          .select(expr("(coalesce(tp, tl) - t0) div 3600000000").as("dur"),
            col("tp").isNotNull.as("ev"),
            (pmod(col("user_id"), lit(2L)) === 0L).as("grp_a"))
        val dist = subj.groupBy(col("dur"))
          .agg(
            sum(when(col("grp_a") && col("ev"), 1L).otherwise(0L)).as("da"),
            sum(when(col("grp_a") && !col("ev"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("grp_a") && col("ev"), 1L).otherwise(0L)).as("db"),
            sum(when(!col("grp_a") && !col("ev"), 1L).otherwise(0L))
              .as("cb"))
        val times = dist.filter(col("da") + col("db") > 0)
          .select(col("dur").as("t"), col("da"), col("db"))
        val risk = times.join(dist.select(col("dur"),
            (col("da") + col("ca")).as("ta"),
            (col("db") + col("cb")).as("tb")),
            col("dur") >= col("t"))
          .groupBy(col("t"), col("da"), col("db"))
          .agg(sum(col("ta")).as("na"), sum(col("tb")).as("nb"))
        val terms = risk
          .select(col("t"), col("da"), col("db"), col("na"), col("nb"),
            (col("da") + col("db")).as("dd"),
            (col("na") + col("nb")).as("nn"))
          .select(col("da"),
            (col("da").cast("double") -
              col("na").cast("double") * col("dd").cast("double") /
                col("nn").cast("double")).as("ome"),
            when(col("nn") > 1,
              col("dd").cast("double") *
                (col("na").cast("double") / col("nn").cast("double")) *
                (col("nb").cast("double") / col("nn").cast("double")) *
                ((col("nn") - col("dd")).cast("double") /
                  (col("nn") - 1).cast("double"))).otherwise(lit(0.0))
              .as("v"))
        val tot = subj.groupBy()
          .agg(sum(when(col("grp_a"), 1L).otherwise(0L)).as("n_a"),
            sum(when(!col("grp_a"), 1L).otherwise(0L)).as("n_b"),
            sum(when(col("grp_a") && col("ev"), 1L).otherwise(0L))
              .as("events_a"),
            sum(when(!col("grp_a") && col("ev"), 1L).otherwise(0L))
              .as("events_b"))
        terms.groupBy()
          .agg(dsum(col("ome")).as("o_minus_e"), dsum(col("v")).as("var_sum"))
          .crossJoin(broadcast(tot))
          .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
            col("o_minus_e"), col("var_sum"),
            when(col("var_sum") > 0.0,
              col("o_minus_e") * col("o_minus_e") / col("var_sum"))
              .as("chi2"))
          .withColumn("significant", col("chi2") > lit(3.841))
      },
      Some(s"""WITH subj AS (
             |  SELECT (COALESCE(tp, tl) - t0) // 3600000000 AS dur,
             |    tp IS NOT NULL AS ev, grp_a
             |  FROM (
             |    SELECT user_id % 2 = 0 AS grp_a,
             |      MIN(epoch_us(ts)) AS t0,
             |      MIN(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN epoch_us(ts) END) AS tp,
             |      MAX(epoch_us(ts)) AS tl
             |    FROM events GROUP BY user_id)),
             |dist AS (
             |  SELECT dur,
             |    CAST(SUM(CASE WHEN grp_a AND ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS da,
             |    CAST(SUM(CASE WHEN grp_a AND NOT ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN NOT grp_a AND ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS db,
             |    CAST(SUM(CASE WHEN NOT grp_a AND NOT ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cb
             |  FROM subj GROUP BY dur),
             |times AS (
             |  SELECT dur AS t, da, db FROM dist WHERE da + db > 0),
             |risk AS (
             |  SELECT t.t, t.da, t.db,
             |    CAST(SUM(u.da + u.ca) AS BIGINT) AS na,
             |    CAST(SUM(u.db + u.cb) AS BIGINT) AS nb
             |  FROM times t JOIN dist u ON u.dur >= t.t
             |  GROUP BY t.t, t.da, t.db),
             |terms AS (
             |  SELECT da,
             |    CAST(da AS DOUBLE)
             |      - CAST(na AS DOUBLE) * CAST(da + db AS DOUBLE)
             |        / CAST(na + nb AS DOUBLE) AS ome,
             |    CASE WHEN na + nb > 1 THEN
             |      CAST(da + db AS DOUBLE)
             |        * (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
             |        * (CAST(nb AS DOUBLE) / CAST(na + nb AS DOUBLE))
             |        * (CAST(na + nb - (da + db) AS DOUBLE)
             |           / CAST(na + nb - 1 AS DOUBLE))
             |    ELSE 0.0 END AS v
             |  FROM risk),
             |tot AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    CAST(SUM(CASE WHEN NOT grp_a THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b,
             |    CAST(SUM(CASE WHEN grp_a AND ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS events_a,
             |    CAST(SUM(CASE WHEN NOT grp_a AND ev THEN 1 ELSE 0 END)
             |      AS BIGINT) AS events_b
             |  FROM subj),
             |agg AS (
             |  SELECT ${dsumSql("ome")} AS o_minus_e,
             |    ${dsumSql("v")} AS var_sum
             |  FROM terms)
             |SELECT n_a, n_b, events_a, events_b, o_minus_e, var_sum,
             |  CASE WHEN var_sum > 0.0
             |    THEN o_minus_e * o_minus_e / var_sum END AS chi2,
             |  CASE WHEN var_sum > 0.0
             |    THEN o_minus_e * o_minus_e / var_sum END > 3.841
             |    AS significant
             |FROM agg CROSS JOIN tot""".stripMargin)),

    // ----- q189: difference-in-differences estimator ----------------------
    // The observational-causal companion to q178's randomized z-test:
    // when assignment is NOT randomized, the DiD point estimate
    // (Δtreatment − Δcontrol across the midpoint period split) nets out
    // both the group level and the common time trend — the standard
    // first answer to "did the rollout move the metric". Arms by id
    // parity, periods by q180's midpoint-day rule; the four cell means
    // are decimal-exact sums over integer counts, the three deltas are
    // mirrored double subtractions. One scan, one 4-cell aggregate.
    NamedQuery(
      "q189_diff_in_diff",
      (s, d) => {
        val ev = events(s, d)
        val bounds = ev.agg(
          min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        val cells = ev.crossJoin(broadcast(bounds))
          .select(col("value"),
            (pmod(col("user_id"), lit(2L)) === 0L).as("treated"),
            (datediff(to_date(col("ts")), col("d0")) * 2 <=
              datediff(col("d1"), col("d0"))).as("pre"))
          .groupBy(col("treated"), col("pre"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
          .select(col("treated"), col("pre"),
            (col("sv") / col("n").cast("double")).as("m"))
        cells.groupBy()
          .agg(
            max(when(col("treated") && col("pre"), col("m"))).as("m_t_pre"),
            max(when(col("treated") && !col("pre"), col("m")))
              .as("m_t_post"),
            max(when(!col("treated") && col("pre"), col("m")))
              .as("m_c_pre"),
            max(when(!col("treated") && !col("pre"), col("m")))
              .as("m_c_post"))
          .select(col("m_t_pre"), col("m_t_post"), col("m_c_pre"),
            col("m_c_post"),
            (col("m_t_post") - col("m_t_pre")).as("delta_treat"),
            (col("m_c_post") - col("m_c_pre")).as("delta_control"),
            ((col("m_t_post") - col("m_t_pre")) -
              (col("m_c_post") - col("m_c_pre"))).as("did"))
      },
      Some(s"""WITH b AS (
             |  SELECT MIN(CAST(ts AS DATE)) AS d0,
             |         MAX(CAST(ts AS DATE)) AS d1 FROM events),
             |cells AS (
             |  SELECT treated, pre,
             |    ${dsumSql("value")} / CAST(COUNT(*) AS DOUBLE) AS m
             |  FROM (
             |    SELECT value, user_id % 2 = 0 AS treated,
             |      date_diff('day', b.d0, CAST(ts AS DATE)) * 2
             |        <= date_diff('day', b.d0, b.d1) AS pre
             |    FROM events CROSS JOIN b)
             |  GROUP BY treated, pre),
             |w AS (
             |  SELECT
             |    MAX(CASE WHEN treated AND pre THEN m END) AS m_t_pre,
             |    MAX(CASE WHEN treated AND NOT pre THEN m END) AS m_t_post,
             |    MAX(CASE WHEN NOT treated AND pre THEN m END) AS m_c_pre,
             |    MAX(CASE WHEN NOT treated AND NOT pre THEN m END)
             |      AS m_c_post
             |  FROM cells)
             |SELECT m_t_pre, m_t_post, m_c_pre, m_c_post,
             |  m_t_post - m_t_pre AS delta_treat,
             |  m_c_post - m_c_pre AS delta_control,
             |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
             |FROM w""".stripMargin)),

    // ----- q192: windowed Benford gate (batch twin of the streaming op) ---
    // q175 audits the accumulated corpus; the streaming form
    // [[graft.streaming.StreamOps.benfordGate]] watches the SAME
    // statistic per event-time hour window, so a feed that starts
    // fabricating amounts mid-day trips the gate in that hour, not at
    // month-end. The registered query runs the IDENTICAL function in
    // batch mode over real event time (the q99 twin pattern), putting
    // the streaming operator's logic under the driver's hash gate;
    // StreamOpsSpec separately proves stream == batch on the same
    // chunked input. Vanished digits keep their (0−e)²/e term via the
    // nine conditional sums carried through the window aggregate.
    NamedQuery(
      "q192_benford_windows",
      (s, d) => graft.streaming.StreamOps.benfordGate(events(s, d)),
      Some {
        val caseSql = BenfordMass
          .map { case (dg, p) => s"WHEN $dg THEN $p" }
          .mkString("CASE digit ", " ", " END")
        s"""WITH ev AS (
           |  SELECT epoch_us(ts) // 1000000 AS tsec,
           |    CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
           |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
           |  FROM events
           |  WHERE value > 0.0 AND floor(value * 100 + 0.5) >= 1),
           |h AS (
           |  SELECT tsec - (tsec % 3600) AS wsec, digit,
           |    CAST(COUNT(*) AS BIGINT) AS n
           |  FROM ev GROUP BY 1, 2),
           |nw AS (
           |  SELECT wsec, CAST(SUM(n) AS BIGINT) AS n_win
           |  FROM h GROUP BY wsec),
           |grid AS (
           |  SELECT nw.wsec, g.digit, COALESCE(h.n, 0) AS n_obs, nw.n_win
           |  FROM nw CROSS JOIN
           |    (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit) g
           |  LEFT JOIN h ON h.wsec = nw.wsec AND h.digit = g.digit)
           |SELECT
           |  strftime(make_timestamp(wsec * 1000000), '$TsFmtDuck')
           |    AS window_start,
           |  digit, CAST(n_obs AS BIGINT) AS n_obs, n_win,
           |  CAST(n_win AS DOUBLE) * ($caseSql) AS expected,
           |  (CAST(n_obs AS DOUBLE) - CAST(n_win AS DOUBLE) * ($caseSql))
           |    * (CAST(n_obs AS DOUBLE)
           |       - CAST(n_win AS DOUBLE) * ($caseSql))
           |    / (CAST(n_win AS DOUBLE) * ($caseSql)) AS chi2_term
           |FROM grid""".stripMargin
      }),

    // ----- q195: funnel latency histogram (click → purchase lag) ----------
    // q68 counts WHO converts; operations needs HOW LONG conversion
    // takes. Per user: first click, then the first purchase strictly
    // after it; the lag lands in an hour bucket and the histogram
    // carries a cumulative converted-share column — the
    // time-to-convert CDF a funnel dashboard draws. Lags are exact
    // integer microsecond subtraction floor-divided to hours (no float
    // time math); the share is one integer ratio per bucket. The
    // cumulative window runs over the bounded bucket table (the q167
    // day-table contract); the purchase-after-click meet is one hash
    // join co-partitioned on user_id — the first-click side is
    // user-cardinality, so it shuffles WITH the purchases, never a
    // broadcast.
    NamedQuery(
      "q195_funnel_latency",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
        val firstClick = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("uc"))
        val lag = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("up"))
          .join(firstClick, "user_id")
          .filter(col("up") > col("uc"))
          .groupBy(col("user_id"), col("uc"))
          .agg(min(col("up")).as("up"))
          .select(expr("(up - uc) div 3600000000").as("lag_hours"))
        val hist = lag.groupBy(col("lag_hours"))
          .agg(count(lit(1)).as("n_users"))
        val tot = hist.agg(sum(col("n_users")).as("n_converted"))
        val w = boundedWin.orderBy(col("lag_hours"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist.crossJoin(broadcast(tot))
          .withColumn("cum_users", sum(col("n_users")).over(w))
          .select(col("lag_hours"), col("n_users"), col("cum_users"),
            (col("cum_users").cast("double") /
              col("n_converted").cast("double")).as("cum_share"))
      },
      Some("""WITH fc AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS uc
             |  FROM events WHERE event_type = 'click' GROUP BY user_id),
             |lg AS (
             |  SELECT (MIN(e.up) - uc) // 3600000000 AS lag_hours
             |  FROM (SELECT user_id, epoch_us(ts) AS up FROM events
             |        WHERE event_type = 'purchase') e
             |  JOIN fc USING (user_id)
             |  WHERE e.up > fc.uc
             |  GROUP BY e.user_id, fc.uc),
             |hist AS (
             |  SELECT lag_hours, CAST(COUNT(*) AS BIGINT) AS n_users
             |  FROM lg GROUP BY lag_hours),
             |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_converted
             |        FROM hist)
             |SELECT lag_hours, n_users,
             |  CAST(SUM(n_users) OVER (ORDER BY lag_hours
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum_users,
             |  CAST(SUM(n_users) OVER (ORDER BY lag_hours
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) / CAST(t.n_converted AS DOUBLE) AS cum_share
             |FROM hist CROSS JOIN tot t""".stripMargin)),

    // ----- q196: deterministic bootstrap CI (Poisson resampling) ----------
    // Uncertainty for the metrics the other queries report as points:
    // the Efron percentile bootstrap, made REPRODUCIBLE — each event is
    // md5-hashed ONCE and the 32 replicate draws are affine
    // permutations of that hash mod P (the MinHash coefficient
    // contract), mapped through the Poisson(1) inverse CDF as an
    // ALL-INTEGER
    // threshold ladder (u ∈ [0, 10^6) vs six cumulative-probability
    // literals ×10^6 — the streaming-bootstrap approximation of
    // multinomial draws, Oza & Russell 2001, and not a single float in
    // the draw). Per (type, replicate): a decimal×integer weighted sum —
    // the q184 exactness pattern — one division at the end; the CI is
    // pure ORDER STATISTICS over the 32 replicate means (ranks 2/16/31 ≈
    // the 5th/50th/95th percentile — no arithmetic on doubles at all).
    // Cost is the honest bootstrap cost: the 32× row expansion is B
    // passes-worth of partial aggregation, embarrassingly parallel, and
    // the state is B doubles per group.
    NamedQuery(
      "q196_bootstrap_ci",
      (s, d) => {
        // ONE md5 per event; the 32 replicate draws come from affine
        // permutations of that hash mod P (LlmKit's documented MinHash
        // coefficient closed form) — 32 integer ops instead of 32
        // hashes per row, which was the battery's one steep entry
        val ev = events(s, d)
          .select(col("event_type"), col("value"),
            pmod(LlmKit.strHash(col("event_id").cast("string")),
              lit(LlmKit.MinhashP)).as("hm"))
          .select(col("event_type"), col("value"), col("hm"),
            explode(sequence(lit(0), lit(31))).as("b"))
          .withColumn("u", pmod(
            pmod(col("hm") *
              pmod(lit(1103515245L) * (col("b") + 1), lit(LlmKit.MinhashP)) +
              pmod(lit(12345L) + lit(2654435761L) * col("b"),
                lit(LlmKit.MinhashP)),
              lit(LlmKit.MinhashP)),
            lit(1000000L)))
          .select(col("event_type"), col("value"), col("b"),
            when(col("u") < 367879L, 0L).when(col("u") < 735759L, 1L)
              .when(col("u") < 919699L, 2L).when(col("u") < 981012L, 3L)
              .when(col("u") < 996340L, 4L).when(col("u") < 999406L, 5L)
              .otherwise(6L).as("w"))
        val means = ev.groupBy(col("event_type"), col("b"))
          .agg(sum(col("value").cast(org.apache.spark.sql.types
              .DecimalType(28, 6)) * col("w")).as("num"),
            sum(col("w")).as("den"))
          .filter(col("den") > 0)
          .select(col("event_type"),
            (col("num").cast("double") / col("den").cast("double"))
              .as("m"))
        means.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_boot"),
            sort_array(collect_list(col("m"))).as("ms"))
          .select(col("event_type"), col("n_boot"),
            element_at(col("ms"), 2).as("ci_lo"),
            element_at(col("ms"), 16).as("median_boot"),
            element_at(col("ms"), 31).as("ci_hi"))
      },
      Some {
        val h = LlmKit.strHashSql("CAST(event_id AS VARCHAR)")
        val P = LlmKit.MinhashP
        s"""WITH ev AS (
           |  SELECT event_type, value, ($h) % $P AS hm,
           |    unnest(range(0, 32)) AS b
           |  FROM events),
           |uu AS (
           |  SELECT event_type, value, b,
           |    ((hm * ((1103515245 * (b + 1)) % $P)
           |      + ((12345 + 2654435761 * b) % $P)) % $P) % 1000000 AS u
           |  FROM ev),
           |ww AS (
           |  SELECT event_type, value, b,
           |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
           |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
           |         WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
           |         ELSE 6 END AS w
           |  FROM uu),
           |m AS (
           |  SELECT event_type, b,
           |    SUM(CAST(value AS DECIMAL(28,6)) * w) AS num,
           |    CAST(SUM(w) AS BIGINT) AS den
           |  FROM ww GROUP BY event_type, b),
           |ms AS (
           |  SELECT event_type,
           |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS m
           |  FROM m WHERE den > 0),
           |agg AS (
           |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_boot,
           |    list(m ORDER BY m) AS l
           |  FROM ms GROUP BY event_type)
           |SELECT event_type, n_boot, l[2] AS ci_lo,
           |  l[16] AS median_boot, l[31] AS ci_hi
           |FROM agg""".stripMargin
      }),

    // ----- q198: sequential pattern pairs (a-before-b support + lift) -----
    // q181 mines literal contiguous paths; sequence mining's first
    // (and most used) level is NON-contiguous order: "a happens before
    // b in the same session", counted once per session on FIRST
    // occurrences (the PrefixSpan length-2 prefix, Pei et al. 2001).
    // Support and lift against the independence baseline
    // sa·sb/n_sessions come out as integer ratios; a pair with lift ≫ 1
    // is a real behavioral sequence, not co-popularity. Shape: sessions
    // from the q122 gap rule, then a per-session (type → min position)
    // table — ≤ |alphabet| rows per session — self-joined WITHIN the
    // session key; the quadratic lives on the bounded alphabet, never
    // on events.
    NamedQuery(
      "q198_seq_pairs",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_sess")).over(wc))
          // (user_id, ts) is unique, so min event-time IS the first
          // occurrence — no struct tie-break needed
          .groupBy(col("user_id"), col("sid"), col("event_type"))
          .agg(min(unix_micros(col("ts"))).as("first_pos"))
        val nSess = sess.select(col("user_id"), col("sid")).distinct()
          .agg(count(lit(1)).as("n_sessions"))
        val single = sess.groupBy(col("event_type"))
          .agg(count(lit(1)).as("s1"))
        val ab = sess.select(col("user_id"), col("sid"),
            col("event_type").as("a"), col("first_pos").as("pa"))
          .join(sess.select(col("user_id"), col("sid"),
            col("event_type").as("b"), col("first_pos").as("pb")),
            Seq("user_id", "sid"))
          .filter(col("a") =!= col("b") && col("pa") < col("pb"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        ab.join(broadcast(single.select(col("event_type").as("a"),
            col("s1").as("sa"))), Seq("a"))
          .join(broadcast(single.select(col("event_type").as("b"),
            col("s1").as("sb"))), Seq("b"))
          .crossJoin(broadcast(nSess))
          .select(col("a"), col("b"), col("n_ab"), col("sa"), col("sb"),
            (col("n_ab").cast("double") / col("n_sessions").cast("double"))
              .as("support"),
            (col("n_ab").cast("double") * col("n_sessions").cast("double") /
              (col("sa").cast("double") * col("sb").cast("double")))
              .as("lift"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_id, ts, event_type, us,
             |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM o),
             |sess AS (
             |  SELECT user_id, sid, event_type, MIN(us) AS first_pos
             |  FROM (
             |    SELECT user_id, event_id, event_type, us,
             |      SUM(new_sess) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |        AS sid
             |    FROM f)
             |  GROUP BY user_id, sid, event_type),
             |ns AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
             |  FROM (SELECT DISTINCT user_id, sid FROM sess)),
             |single AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS s1
             |  FROM sess GROUP BY event_type),
             |ab AS (
             |  SELECT a.event_type AS a, b.event_type AS b,
             |    CAST(COUNT(*) AS BIGINT) AS n_ab
             |  FROM sess a JOIN sess b
             |    ON a.user_id = b.user_id AND a.sid = b.sid
             |  WHERE a.event_type <> b.event_type
             |    AND a.first_pos < b.first_pos
             |  GROUP BY a.event_type, b.event_type)
             |SELECT ab.a, ab.b, ab.n_ab, sa.s1 AS sa, sb.s1 AS sb,
             |  CAST(ab.n_ab AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE)
             |    AS support,
             |  CAST(ab.n_ab AS DOUBLE) * CAST(ns.n_sessions AS DOUBLE)
             |    / (CAST(sa.s1 AS DOUBLE) * CAST(sb.s1 AS DOUBLE))
             |    AS lift
             |FROM ab JOIN single sa ON ab.a = sa.event_type
             |        JOIN single sb ON ab.b = sb.event_type
             |CROSS JOIN ns""".stripMargin)),

    // ----- q200: off-policy evaluation (IPS / SNIPS) ----------------------
    // The counterfactual question every recommender change asks BEFORE
    // an A/B test: what would a different action policy have earned on
    // the logged traffic? Inverse-propensity scoring (Horvitz–Thompson
    // applied to policies; SNIPS per Swaminathan & Joachims 2015):
    // logging propensities are the empirical action frequencies, the
    // target policy is uniform over {click, purchase}, rewards are the
    // logged values. Because both policies depend only on the ACTION,
    // every estimator reduces to exact per-action aggregates — weights
    // are integer ratios, reward mass stays on the decimal grid, and
    // the five-row epilogue (IPS, SNIPS, effective sample size) is
    // mirrored arithmetic. ESS ≪ n is the standard "the target policy
    // is too far from logging" warning, emitted alongside the
    // estimates. (With action-only policies Σw = n identically, so
    // v_snips == v_ips — the equality is itself a correctness witness
    // of the per-action reduction; context-dependent policies would
    // split them.) One scan, one 5-row aggregate.
    NamedQuery(
      "q200_ips_offpolicy",
      (s, d) => {
        val acts = events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("na"), dsum(col("value")).as("sr"))
        val n = acts.agg(sum(col("na")).as("n"))
        val withW = acts.crossJoin(broadcast(n))
          .select(col("event_type"), col("na"), col("sr"), col("n"),
            when(col("event_type").isin("click", "purchase"),
              lit(0.5) * col("n").cast("double") / col("na").cast("double"))
              .otherwise(lit(0.0)).as("w"))
        withW.groupBy()
          .agg(max(col("n")).as("n"),
            dsum(col("sr") * col("w")).as("rw"),
            dsum(col("na").cast("double") * col("w")).as("sw"),
            dsum(col("na").cast("double") * col("w") * col("w")).as("sw2"))
          .select(col("n"),
            (col("rw") / col("n").cast("double")).as("v_ips"),
            (col("rw") / col("sw")).as("v_snips"),
            (col("sw") * col("sw") / col("sw2")).as("ess"),
            (col("sw") * col("sw") / col("sw2") / col("n").cast("double"))
              .as("ess_frac"))
      },
      Some(s"""WITH acts AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS na,
             |    ${dsumSql("value")} AS sr
             |  FROM events GROUP BY event_type),
             |n AS (SELECT CAST(SUM(na) AS BIGINT) AS n FROM acts),
             |ww AS (
             |  SELECT event_type, na, sr, n.n,
             |    CASE WHEN event_type IN ('click', 'purchase')
             |      THEN 0.5 * CAST(n.n AS DOUBLE) / CAST(na AS DOUBLE)
             |      ELSE 0.0 END AS w
             |  FROM acts CROSS JOIN n),
             |agg AS (
             |  SELECT MAX(n) AS n,
             |    ${dsumSql("sr * w")} AS rw,
             |    ${dsumSql("CAST(na AS DOUBLE) * w")} AS sw,
             |    ${dsumSql("CAST(na AS DOUBLE) * w * w")} AS sw2
             |  FROM ww)
             |SELECT n, rw / CAST(n AS DOUBLE) AS v_ips,
             |  rw / sw AS v_snips,
             |  sw * sw / sw2 AS ess,
             |  sw * sw / sw2 / CAST(n AS DOUBLE) AS ess_frac
             |FROM agg""".stripMargin)),

    // ----- q201: transition-lag profile (process-mining bottlenecks) ------
    // q73 says WHERE journeys go; process mining asks how LONG each hop
    // takes — the direct-follows graph annotated with its latency
    // profile, which is where funnels stall. Per (from_type, to_type):
    // transition count, decimal-exact mean lag, and exact interpolated
    // median/p90 (the q50 percentile parity contract — both engines
    // compute linear interpolation over sorted values, here over exact
    // integer seconds, so even the interpolated doubles hash-match).
    // Lags are integer microsecond differences floor-divided to
    // seconds; one user-window pass feeds a 25-cell aggregate.
    NamedQuery(
      "q201_transition_lag",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("to_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("from_type", lag(col("to_type"), 1).over(w))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .filter(col("from_type").isNotNull)
          .select(col("from_type"), col("to_type"),
            expr("(us - prev_us) div 1000000").as("lag_secs"))
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"),
            (dsum(col("lag_secs").cast("double")) /
              count(lit(1)).cast("double")).as("mean_secs"),
            expr("percentile(lag_secs, 0.5)").as("p50_secs"),
            expr("percentile(lag_secs, 0.9)").as("p90_secs"))
      },
      Some(s"""WITH pairs AS (
             |  SELECT
             |    lag(event_type) OVER w AS from_type,
             |    event_type AS to_type,
             |    (epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000
             |      AS lag_secs
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
             |  ${dsumSql("CAST(lag_secs AS DOUBLE)")}
             |    / CAST(COUNT(*) AS DOUBLE) AS mean_secs,
             |  quantile_cont(lag_secs, 0.5) AS p50_secs,
             |  quantile_cont(lag_secs, 0.9) AS p90_secs
             |FROM pairs WHERE from_type IS NOT NULL
             |GROUP BY from_type, to_type""".stripMargin)),

    // ----- q210: CUSUM change-point over hourly event rates ---------------
    // The monitoring question q99's drift windows can't answer: not "is
    // this window off?" but WHEN did the rate regime change. Classic
    // CUSUM (Page 1954) per event_type over the DENSIFIED hourly count
    // series (absent hours are zero events — skipping them would hide
    // exactly the outage a change-point detector exists to find),
    // kept integer-exact by scaling: S_k = n·Σ_{i≤k} x_i − k·total is
    // the running deviation from the mean rate multiplied through by
    // n_hours, so no rational mean ever materializes; the change point
    // is argmax |S_k| with ties to the earliest hour (min(struct) —
    // partial-aggregable, no second window). BIGINT bounds: |S| ≤
    // n_hours·total ≈ 10^5·10^12 at crawl scale — within long. Shape:
    // one (type, hour) partial-agg shuffle, a per-type bounded
    // densification (sequence over the type's own hour span), one
    // cumulative window per type, one argmin agg. Never event×hour.
    NamedQuery(
      "q210_cusum_changepoint",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hc = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("x"))
        val bounds = hc.groupBy(col("event_type"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
            sum(col("x")).as("total"))
        val dense = bounds
          .select(col("event_type"), col("h0"), col("total"),
            (col("h1") - col("h0") + 1).as("n_hours"),
            explode(expr("sequence(h0, h1)")).as("h"))
          .join(hc, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"), col("h0"), col("n_hours"),
            col("total"), coalesce(col("x"), lit(0L)).as("x"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dense
          .withColumn("s",
            col("n_hours") * sum(col("x")).over(wc) -
              (col("h") - col("h0") + 1) * col("total"))
          .groupBy(col("event_type"))
          .agg(max(col("n_hours")).as("n_hours"),
            max(col("total")).as("total"),
            min(struct((-abs(col("s"))).as("na"), col("h").as("h")))
              .as("m"))
          .select(col("event_type"), col("n_hours"), col("total"),
            col("m.h").as("cp_hour"), (-col("m.na")).as("s_max"))
      },
      Some("""WITH hc AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             |    CAST(COUNT(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1,
             |    CAST(SUM(x) AS BIGINT) AS total,
             |    MAX(h) - MIN(h) + 1 AS n_hours
             |  FROM hc GROUP BY event_type),
             |dense AS (
             |  SELECT g.event_type, g.h, g.h0, g.n_hours, g.total,
             |    CAST(COALESCE(hc.x, 0) AS BIGINT) AS x
             |  FROM (SELECT event_type, h0, h1, n_hours, total,
             |          unnest(range(h0, h1 + 1)) AS h
             |        FROM bounds) g
             |  LEFT JOIN hc ON hc.event_type = g.event_type
             |    AND hc.h = g.h),
             |cum AS (
             |  SELECT event_type, h, n_hours, total,
             |    n_hours * SUM(x) OVER (PARTITION BY event_type
             |      ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - (h - h0 + 1) * total AS s
             |  FROM dense)
             |SELECT event_type, n_hours, total,
             |  CAST(h AS BIGINT) AS cp_hour,
             |  CAST(abs(s) AS BIGINT) AS s_max
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY abs(s) DESC, h) AS rn
             |  FROM cum)
             |WHERE rn = 1""".stripMargin)),

    // ----- q213: per-stream OLS trend (closed-form regression) ------------
    // Is a stream's value drifting, and how fast? Ordinary least squares
    // of value against the hour index, per event_type, from the five
    // classic sufficient statistics (n, Σx, Σx², Σy, Σxy — plus Σy² for
    // r²) — the one-pass, partial-aggregable shape that IS how
    // regression runs on a cluster: every statistic is a partial-agg
    // sum, so the corpus is read once and no residual pass exists.
    // Exactness: x = hours since the stream's own first hour (bounded,
    // so Σx² stays representable), x-sums accumulate in DECIMAL(38,0)
    // (Σx² would pass 2^63 at crawl scale), y-sums on the dsum decimal
    // grid; the slope/intercept/r² formulas are then identical
    // double-arithmetic trees in both engines. The per-type x offset
    // uses a broadcast min-join, not a window.
    NamedQuery(
      "q213_trend_ols",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"), col("value"))
        val h0 = ev.groupBy(col("event_type")).agg(min(col("h")).as("h0"))
        val st = ev.join(broadcast(h0), "event_type")
          .select(col("event_type"), (col("h") - col("h0")).as("x"),
            col("value").as("y"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double").as("sx"),
            sum((col("x") * col("x"))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double").as("sxx"),
            dsum(col("y")).as("sy"),
            dsum(col("x").cast("double") * col("y")).as("sxy"),
            dsum(col("y") * col("y")).as("syy"))
        val nD = col("n").cast("double")
        val num = nD * col("sxy") - col("sx") * col("sy")
        val den = nD * col("sxx") - col("sx") * col("sx")
        val deny = nD * col("syy") - col("sy") * col("sy")
        st.select(col("event_type"), col("n"),
          (num / den).as("slope"),
          ((col("sy") - (num / den) * col("sx")) / nD).as("intercept"),
          ((num * num) / (den * deny)).as("r2"))
      },
      Some(s"""WITH ev AS (
              |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, value
              |  FROM events),
              |h0 AS (SELECT event_type, MIN(h) AS h0
              |       FROM ev GROUP BY event_type),
              |st AS (
              |  SELECT ev.event_type,
              |    CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(SUM(CAST(ev.h - h0.h0 AS DECIMAL(38,0)))
              |      AS DOUBLE) AS sx,
              |    CAST(SUM(CAST((ev.h - h0.h0) * (ev.h - h0.h0)
              |      AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
              |    ${dsumSql("value")} AS sy,
              |    ${dsumSql("CAST(ev.h - h0.h0 AS DOUBLE) * value")} AS sxy,
              |    ${dsumSql("value * value")} AS syy
              |  FROM ev JOIN h0 USING (event_type)
              |  GROUP BY ev.event_type)
              |SELECT event_type, n,
              |  (CAST(n AS DOUBLE) * sxy - sx * sy)
              |    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
              |  (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
              |          / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
              |    / CAST(n AS DOUBLE) AS intercept,
              |  ((CAST(n AS DOUBLE) * sxy - sx * sy)
              |    * (CAST(n AS DOUBLE) * sxy - sx * sy))
              |    / ((CAST(n AS DOUBLE) * sxx - sx * sx)
              |       * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r2
              |FROM st""".stripMargin)),

    // ----- q217: Mann–Whitney U rank test (does a stream dominate?) -------
    // The distribution-free two-sample test: does one event stream's
    // value distribution stochastically dominate the rest? (q178's
    // z-test compares PROPORTIONS, q136's KS compares CDF shape; this
    // is the rank test — robust to outliers and scale, the one to run
    // when value units drift across sources.) Each type is tested
    // against all other rows using GLOBAL average ranks, so ranks are
    // computed ONCE and shared by all k tests — not k re-rankings.
    // Exactness: doubled average ranks 2·rank(v) = 2F(v) − c(v) + 1 are
    // INTEGERS (F = inclusive global CDF, c = tie size), so the rank
    // sums accumulate exactly in DECIMAL(38,0)/HUGEINT; the tie
    // correction Σ(c³−c) likewise. U, the common-language effect size
    // AUC = U/(n1·n2), and the normal z (one IEEE sqrt) are identical
    // double trees both engines, the q176 contract. Scale: the CDF is
    // the q148 phased construction — distinct values range-bucketed by
    // ⌊value⌋, running counts per bucket window, bucket offsets, NO
    // global sort — and everything downstream is distinct-value-sized.
    NamedQuery(
      "q217_mannwhitney",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("event_type"), col("value"))
        val dist = ev.groupBy(col("value")).agg(count(lit(1)).as("c"))
          .withColumn("b", floor(col("value")).cast("long"))
        val wRun = Window.partitionBy(col("b")).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = dist.withColumn("r", sum(col("c")).over(wRun))
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = dist.groupBy(col("b")).agg(sum(col("c")).as("tb"))
          .select(col("b"),
            coalesce(sum(col("tb")).over(wOff), lit(0L)).as("o"))
        val f = run.join(broadcast(off), "b")
          .select(col("value"), col("c"), (col("o") + col("r")).as("fv"))
        val byTv = ev.groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("k"))
        val perType = byTv.join(f, "value")
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("n1"),
            // k·(2F − c + 1) widened BEFORE the multiply: k and F are
            // both corpus-scale, so the raw long product wraps at ~3e9
            // rows (the q177 overflow lesson)
            sum(expr("CAST(k AS DECIMAL(38,0)) * (2*fv - c + 1)"))
              .as("two_r1"))
        val glob = dist.agg(sum(col("c")).as("nt"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).as("ties"))
        val n1d = col("n1").cast("double")
        val n2d = (col("nt") - col("n1")).cast("double")
        val nd = col("nt").cast("double")
        val u = (col("two_r1").cast("double") -
          n1d * (n1d + lit(1.0))) / lit(2.0)
        val sigma2 = n1d * n2d / lit(12.0) *
          ((nd + lit(1.0)) -
            col("ties").cast("double") / (nd * (nd - lit(1.0))))
        val z = (u - n1d * n2d / lit(2.0)) / sqrt(sigma2)
        perType.crossJoin(broadcast(glob))
          .select(col("event_type"), col("n1"),
            (col("nt") - col("n1")).as("n2"),
            u.as("u_stat"),
            (u / (n1d * n2d)).as("auc"),
            z.as("z"),
            // |z| at two-sided α = 0.005 — the battery's audit alpha
            (abs(z) > lit(2.807)).as("flagged"))
      },
      Some("""WITH ev AS (SELECT event_type, value FROM events),
             |d AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM ev GROUP BY value),
             |cdf AS (SELECT value, c,
             |    CAST(SUM(c) OVER (ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fv
             |  FROM d),
             |tv AS (SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS k
             |       FROM ev GROUP BY event_type, value),
             |pt AS (SELECT tv.event_type,
             |    CAST(SUM(k) AS BIGINT) AS n1,
             |    SUM(CAST(k AS HUGEINT) * (2*fv - c + 1)) AS two_r1
             |  FROM tv JOIN cdf USING (value)
             |  GROUP BY tv.event_type),
             |g AS (SELECT CAST(SUM(c) AS BIGINT) AS nt,
             |    SUM(CAST(c AS HUGEINT) * c * c - c) AS ties FROM d),
             |m AS (SELECT event_type, n1, nt - n1 AS n2,
             |    CAST(n1 AS DOUBLE) AS n1d,
             |    CAST(nt - n1 AS DOUBLE) AS n2d,
             |    CAST(nt AS DOUBLE) AS nd,
             |    CAST(two_r1 AS DOUBLE) AS trd,
             |    CAST(ties AS DOUBLE) AS tiesd
             |  FROM pt, g)
             |SELECT event_type, n1, n2,
             |  (trd - n1d * (n1d + 1.0)) / 2.0 AS u_stat,
             |  ((trd - n1d * (n1d + 1.0)) / 2.0) / (n1d * n2d) AS auc,
             |  ((trd - n1d * (n1d + 1.0)) / 2.0 - n1d * n2d / 2.0)
             |    / sqrt(n1d * n2d / 12.0
             |           * ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))) AS z,
             |  abs(((trd - n1d * (n1d + 1.0)) / 2.0 - n1d * n2d / 2.0)
             |    / sqrt(n1d * n2d / 12.0
             |           * ((nd + 1.0) - tiesd / (nd * (nd - 1.0)))))
             |    > 2.807 AS flagged
             |FROM m""".stripMargin)),

    // ----- q218: one-way ANOVA F across event streams ----------------------
    // Do the k streams share a mean at all? The omnibus test that runs
    // BEFORE pairwise z-tests (q178) — one F from the classic variance
    // decomposition SST = SSB + SSW. Sufficient statistics only: per
    // group n, Σy, Σy² as DECIMAL(28,6) partial-aggregable sums (the
    // dsum grid, kept DECIMAL through the cross-group rollup so the
    // grand total is exact — summing the per-group DOUBLES would make
    // the grand sum order-dependent); SSW/SSB are then per-group double
    // terms recombined on the 6-decimal grid, and F is one double
    // ratio. Scale: one corpus scan into a k-row partial agg, a k-row
    // scalar epilogue, and the F row broadcast back onto the per-group
    // report — the q178 shape generalized to k arms.
    NamedQuery(
      "q218_anova_f",
      (s, d) => {
        val dec = org.apache.spark.sql.types.DecimalType(28, 6)
        val grp = events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec)).as("sdec"),
            sum((col("value") * col("value")).cast(dec)).as("ssdec"))
        val g = grp.agg(sum(col("n")).as("nt"), sum(col("sdec")).as("stot"),
          count(lit(1)).as("kg"))
        val syd = col("sdec").cast("double")
        val ssyd = col("ssdec").cast("double")
        val ndd = col("n").cast("double")
        val terms = grp.crossJoin(broadcast(g))
          .select(col("event_type"), col("n"),
            (syd / ndd).as("mean_value"),
            (ssyd - syd * syd / ndd).as("ss_within"),
            (syd * syd / ndd).as("bterm"),
            col("nt"), col("kg"), col("stot").cast("double").as("std"))
        val fRow = terms.agg(
          dsum(col("ss_within")).as("ssw"),
          dsum(col("bterm")).as("sbsum"),
          max(col("nt")).as("nt2"), max(col("kg")).as("kg2"),
          max(col("std")).as("std2"))
          .select(col("ssw"),
            (col("sbsum") -
              col("std2") * col("std2") / col("nt2").cast("double"))
              .as("ssb"),
            col("nt2"), col("kg2"))
        val f = (col("ssb") / (col("kg2") - lit(1)).cast("double")) /
          (col("ssw") / (col("nt2") - col("kg2")).cast("double"))
        terms.select(col("event_type"), col("n"), col("mean_value"),
            col("ss_within"))
          .crossJoin(broadcast(fRow.select(f.as("f_stat"),
            (col("kg2") - lit(1)).as("df1"),
            (col("nt2") - col("kg2")).as("df2"),
            // F(4, ∞) critical value at α = 0.01 — a 6-decimal literal,
            // never a runtime inverse-F (libm)
            (f > lit(3.32)).as("flagged"))))
      },
      Some("""WITH grp AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(value AS DECIMAL(28,6))) AS sdec,
             |    SUM(CAST(value * value AS DECIMAL(28,6))) AS ssdec
             |  FROM events GROUP BY event_type),
             |g AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(sdec) AS stot,
             |      CAST(COUNT(*) AS BIGINT) AS kg FROM grp),
             |terms AS (
             |  SELECT event_type, n,
             |    CAST(sdec AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
             |    CAST(ssdec AS DOUBLE) - CAST(sdec AS DOUBLE)
             |      * CAST(sdec AS DOUBLE) / CAST(n AS DOUBLE) AS ss_within,
             |    CAST(sdec AS DOUBLE) * CAST(sdec AS DOUBLE)
             |      / CAST(n AS DOUBLE) AS bterm,
             |    nt, kg, CAST(stot AS DOUBLE) AS std
             |  FROM grp, g),
             |f AS (
             |  SELECT
             |    CAST(SUM(CAST(ss_within AS DECIMAL(28,6))) AS DOUBLE)
             |      AS ssw,
             |    CAST(SUM(CAST(bterm AS DECIMAL(28,6))) AS DOUBLE)
             |      - MAX(std) * MAX(std) / CAST(MAX(nt) AS DOUBLE) AS ssb,
             |    MAX(nt) AS nt2, MAX(kg) AS kg2
             |  FROM terms)
             |SELECT t.event_type, t.n, t.mean_value, t.ss_within,
             |  (f.ssb / CAST(f.kg2 - 1 AS DOUBLE))
             |    / (f.ssw / CAST(f.nt2 - f.kg2 AS DOUBLE)) AS f_stat,
             |  f.kg2 - 1 AS df1, f.nt2 - f.kg2 AS df2,
             |  (f.ssb / CAST(f.kg2 - 1 AS DOUBLE))
             |    / (f.ssw / CAST(f.nt2 - f.kg2 AS DOUBLE)) > 3.32 AS flagged
             |FROM terms t, f""".stripMargin)),

    // ----- q220: Spearman rank correlation (length vs lexical variety) ----
    // Monotone association without a linearity assumption: per language,
    // does document length predict vocabulary size RANK-wise? (q147/q213
    // fit a line — one outlier document bends them; Spearman only sees
    // order.) Doubled average ranks 2r = 2F − c + 1 (the q217 integer
    // trick, computed per language over the DISTINCT-value table — both
    // metrics are small integers, so the rank windows run over
    // bounded-cardinality inputs, never a per-row sort); Pearson on the
    // doubled ranks equals Pearson on the ranks (the ×2 cancels), so the
    // five sufficient sums accumulate exactly in DECIMAL(38,0)/HUGEINT
    // and ρ is one identical double tree. Scale: two distinct-value
    // aggs + two hash joins back to the corpus + one k-row partial agg.
    NamedQuery(
      "q220_spearman",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = tbl(s, d, "documents").select(col("lang"),
          col("n_chars").cast("long").as("x"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("y"))
        def doubledRanks(c: String): org.apache.spark.sql.DataFrame = {
          val dist = docs.groupBy(col("lang"), col(c))
            .agg(count(lit(1)).as("cc"))
          val w = Window.partitionBy(col("lang")).orderBy(col(c))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          dist.withColumn("fcum", sum(col("cc")).over(w))
            .select(col("lang"), col(c),
              (col("fcum") * 2 - col("cc") + 1).as(s"r$c"))
        }
        val ranked = docs
          .join(doubledRanks("x"), Seq("lang", "x"))
          .join(doubledRanks("y"), Seq("lang", "y"))
        val st = ranked.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          sum(expr("CAST(rx AS DECIMAL(38,0))")).cast("double").as("sx"),
          sum(expr("CAST(rx AS DECIMAL(38,0)) * rx")).cast("double")
            .as("sxx"),
          sum(expr("CAST(ry AS DECIMAL(38,0))")).cast("double").as("sy"),
          sum(expr("CAST(ry AS DECIMAL(38,0)) * ry")).cast("double")
            .as("syy"),
          sum(expr("CAST(rx AS DECIMAL(38,0)) * ry")).cast("double")
            .as("sxy"))
        val nD = col("n").cast("double")
        st.select(col("lang"), col("n"),
          ((nD * col("sxy") - col("sx") * col("sy")) /
            (sqrt(nD * col("sxx") - col("sx") * col("sx")) *
              sqrt(nD * col("syy") - col("sy") * col("sy")))).as("rho"))
      },
      Some("""WITH docs AS (
             |  SELECT lang, CAST(n_chars AS BIGINT) AS x,
             |    CAST(len(list_distinct(string_split(text, ' ')))
             |      AS BIGINT) AS y
             |  FROM documents),
             |dx AS (SELECT lang, x, CAST(COUNT(*) AS BIGINT) AS cc
             |       FROM docs GROUP BY lang, x),
             |rxs AS (SELECT lang, x,
             |    CAST(SUM(cc) OVER (PARTITION BY lang ORDER BY x
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * 2 - cc + 1 AS rx
             |  FROM dx),
             |dy AS (SELECT lang, y, CAST(COUNT(*) AS BIGINT) AS cc
             |       FROM docs GROUP BY lang, y),
             |rys AS (SELECT lang, y,
             |    CAST(SUM(cc) OVER (PARTITION BY lang ORDER BY y
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * 2 - cc + 1 AS ry
             |  FROM dy),
             |ranked AS (
             |  SELECT d.lang, rxs.rx, rys.ry
             |  FROM docs d
             |  JOIN rxs ON rxs.lang = d.lang AND rxs.x = d.x
             |  JOIN rys ON rys.lang = d.lang AND rys.y = d.y),
             |st AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(rx AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(rx AS HUGEINT) * rx) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(ry AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(ry AS HUGEINT) * ry) AS DOUBLE) AS syy,
             |    CAST(SUM(CAST(rx AS HUGEINT) * ry) AS DOUBLE) AS sxy
             |  FROM ranked GROUP BY lang)
             |SELECT lang, n,
             |  (CAST(n AS DOUBLE) * sxy - sx * sy)
             |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
             |       * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS rho
             |FROM st""".stripMargin)),

    // ----- q222: Gini-impurity decision stump (weak-learner training) -----
    // The atomic unit of tree ensembles: the best single threshold on a
    // feature. Label = "is the document English", feature = length; for
    // every candidate split x ≤ t the weighted Gini impurity comes from
    // CUMULATIVE (count, positives) over the distinct-length table —
    // Gini, not information gain, because impurity is RATIONAL in the
    // counts where entropy's log is libm (the q185 RA-index move). The
    // cumulative window runs over DISTINCT n_chars values, whose
    // cardinality is bounded by the max document length — it does not
    // grow with corpus rows, so the unpartitioned window is
    // scale-constant (unlike a per-row rank). One corpus scan → one
    // bounded agg → a 5-row ranked answer (top splits by impurity,
    // ties to the smaller threshold).
    NamedQuery(
      "q222_gini_stump",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dist = tbl(s, d, "documents")
          .select(col("n_chars").cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
          .groupBy(col("x"))
          .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
        val w = boundedWin.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dist
          .withColumn("nl", sum(col("c")).over(w))
          .withColumn("pl", sum(col("p")).over(w))
        val tot = dist.agg(sum(col("c")).as("n"), sum(col("p")).as("pt"))
        val j = cum.crossJoin(broadcast(tot))
          .filter(col("nl") < col("n")) // right side must be non-empty
        val nld = col("nl").cast("double")
        val pld = col("pl").cast("double")
        val nrd = (col("n") - col("nl")).cast("double")
        val prd = (col("pt") - col("pl")).cast("double")
        val nd = col("n").cast("double")
        val ptd = col("pt").cast("double")
        // weighted impurity: [nL − (posL²+negL²)/nL + nR − (…)/nR] / n
        val giniSplit = (nld -
          (pld * pld + (nld - pld) * (nld - pld)) / nld +
          nrd - (prd * prd + (nrd - prd) * (nrd - prd)) / nrd) / nd
        val giniRoot = lit(1.0) - (ptd / nd) * (ptd / nd) -
          ((nd - ptd) / nd) * ((nd - ptd) / nd)
        j.select(col("x").as("threshold"), col("nl").as("n_left"),
            (col("n") - col("nl")).as("n_right"),
            col("pl").as("pos_left"), (col("pt") - col("pl"))
              .as("pos_right"),
            giniSplit.as("gini_split"), giniRoot.as("gini_root"),
            (giniRoot - giniSplit).as("gain"))
          .orderBy(col("gini_split"), col("threshold"))
          .limit(5)
      },
      Some {
        val nld = "CAST(nl AS DOUBLE)"
        val pld = "CAST(pl AS DOUBLE)"
        val nrd = "CAST(n - nl AS DOUBLE)"
        val prd = "CAST(pt - pl AS DOUBLE)"
        val nd = "CAST(n AS DOUBLE)"
        val ptd = "CAST(pt AS DOUBLE)"
        val giniSplit = s"""($nld
          | - ($pld * $pld + ($nld - $pld) * ($nld - $pld)) / $nld
          | + $nrd - ($prd * $prd + ($nrd - $prd) * ($nrd - $prd)) / $nrd)
          | / $nd""".stripMargin.replace("\n", " ")
        val giniRoot = s"""1.0 - ($ptd / $nd) * ($ptd / $nd)
          | - (($nd - $ptd) / $nd) * (($nd - $ptd) / $nd)"""
          .stripMargin.replace("\n", " ")
        s"""WITH dist AS (
           |  SELECT CAST(n_chars AS BIGINT) AS x,
           |    CAST(COUNT(*) AS BIGINT) AS c,
           |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS p
           |  FROM documents GROUP BY 1),
           |cum AS (
           |  SELECT x,
           |    CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS nl,
           |    CAST(SUM(p) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS pl
           |  FROM dist),
           |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
           |        CAST(SUM(p) AS BIGINT) AS pt FROM dist)
           |SELECT x AS threshold, nl AS n_left, n - nl AS n_right,
           |  pl AS pos_left, pt - pl AS pos_right,
           |  $giniSplit AS gini_split, $giniRoot AS gini_root,
           |  ($giniRoot) - ($giniSplit) AS gain
           |FROM cum, tot WHERE nl < n
           |ORDER BY gini_split, threshold LIMIT 5""".stripMargin
      }),

    // ----- q225: trimmed + winsorized stream means (robust location) ------
    // The robust-statistics pair a metrics pipeline needs when one bad
    // feed can drag a plain mean: per stream, the 5%-trimmed mean
    // (drop the k lowest and k highest ranks, k = ⌊n/20⌋) and the
    // winsorized mean (clamp them to the cut values instead). Both are
    // EXACT rank arithmetic on the per-type distinct-value CDF (the
    // q217 phased construction, partitioned by stream): each distinct
    // value's rank range [F−c+1, F] is intersected with the kept band
    // (k, n−k] to get its kept multiplicity — integer set algebra, no
    // per-row sort, no quantile interpolation mode to disagree on. The
    // cut values themselves are conditional MIN aggregates over the
    // same CDF rows. Decimal-grid sums make every mean order-exact.
    NamedQuery(
      "q225_trimmed_mean",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tv = events(s, d)
          .groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("c"))
          .withColumn("b", floor(col("value")).cast("long"))
        val wRun = Window.partitionBy(col("event_type"), col("b"))
          .orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = tv.withColumn("r", sum(col("c")).over(wRun))
        val wOff = Window.partitionBy(col("event_type")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = tv.groupBy(col("event_type"), col("b"))
          .agg(sum(col("c")).as("tb"))
          .select(col("event_type"), col("b"),
            coalesce(sum(col("tb")).over(wOff), lit(0L)).as("o"))
        val n = tv.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        val f = run.join(off, Seq("event_type", "b"))
          .join(broadcast(n), "event_type")
          .select(col("event_type"), col("value"), col("c"), col("n"),
            (col("o") + col("r")).as("fv"),
            expr("n * 5 div 100").as("k"))
        val kept = greatest(lit(0L),
          least(col("fv"), col("n") - col("k")) -
            greatest(col("fv") - col("c") + 1, col("k") + 1) + lit(1L))
        val st = f.groupBy(col("event_type")).agg(
          max(col("n")).as("n"), max(col("k")).as("k"),
          dsum(col("c").cast("double") * col("value")).as("full_sum"),
          dsum(kept.cast("double") * col("value")).as("trim_sum"),
          min(when(col("fv") >= col("k") + 1, col("value"))).as("lo_cut"),
          min(when(col("fv") >= col("n") - col("k"), col("value")))
            .as("hi_cut"))
        val nd = col("n").cast("double")
        val kd = col("k").cast("double")
        st.select(col("event_type"), col("n"), col("k"),
          (col("full_sum") / nd).as("mean"),
          (col("trim_sum") / (nd - kd - kd)).as("trimmed_mean"),
          ((col("trim_sum") + kd * col("lo_cut") + kd * col("hi_cut"))
            / nd).as("winsorized_mean"),
          col("lo_cut"), col("hi_cut"))
      },
      Some("""WITH tv AS (
             |  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |cdf AS (SELECT event_type, value, c,
             |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fv
             |  FROM tv),
             |n AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
             |      FROM tv GROUP BY event_type),
             |f AS (SELECT cdf.*, n.n, n.n * 5 // 100 AS k
             |      FROM cdf JOIN n USING (event_type)),
             |st AS (
             |  SELECT event_type, MAX(n) AS n, MAX(k) AS k,
             |    CAST(SUM(CAST(CAST(c AS DOUBLE) * value
             |      AS DECIMAL(28,6))) AS DOUBLE) AS full_sum,
             |    CAST(SUM(CAST(CAST(greatest(0, least(fv, n - k)
             |        - greatest(fv - c + 1, k + 1) + 1) AS DOUBLE) * value
             |      AS DECIMAL(28,6))) AS DOUBLE) AS trim_sum,
             |    MIN(CASE WHEN fv >= k + 1 THEN value END) AS lo_cut,
             |    MIN(CASE WHEN fv >= n - k THEN value END) AS hi_cut
             |  FROM f GROUP BY event_type)
             |SELECT event_type, n, k,
             |  full_sum / CAST(n AS DOUBLE) AS mean,
             |  trim_sum / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)
             |              - CAST(k AS DOUBLE)) AS trimmed_mean,
             |  (trim_sum + CAST(k AS DOUBLE) * lo_cut
             |    + CAST(k AS DOUBLE) * hi_cut) / CAST(n AS DOUBLE)
             |    AS winsorized_mean,
             |  lo_cut, hi_cut
             |FROM st""".stripMargin)),

    // ----- q227: autocorrelation function (ACF) per event stream ----------
    // The seasonality detector underneath q183's seasonal-anomaly gate:
    // sample autocorrelation r_k of the DENSIFIED hourly count series
    // (q210's grid — zeros are real observations) at lags 1..24. The
    // classic estimator r_k = c_k/c_0 with full-series mean: all
    // sufficient statistics are exact integers (Σx_t·x_{t+k} widened to
    // DECIMAL/HUGEINT before the product — counts are corpus-scale),
    // the mean-correction and the ratio are identical double trees, and
    // the ±2/√n white-noise band is the significance flag (written as
    // |r|·√n > 2 — one IEEE sqrt, no libm). Shape: the lag pairs are
    // 24 SHIFTED EQUI-JOINS in one pass (dense × lag grid joined on
    // t+k), never a window over raw events; everything is
    // hours×24-bounded per stream after the one hourly rollup.
    NamedQuery(
      "q227_acf_seasonality",
      (s, d) => {
        val hc = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("x"))
        val bounds = hc.groupBy(col("event_type"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
            sum(col("x")).as("total"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        val dense = bounds
          .select(col("event_type"), col("h0"),
            (col("h1") - col("h0") + 1).as("n"),
            explode(expr("sequence(h0, h1)")).as("h"))
          .join(hc, Seq("event_type", "h"), "left")
          .select(col("event_type"), (col("h") - col("h0")).as("t"),
            col("n"), coalesce(col("x"), lit(0L)).as("x"))
        val lags = s.range(1, 25).select(col("id").as("k"))
        val head = dense.crossJoin(broadcast(lags))
          .select(col("event_type"), col("k"), col("n"),
            (col("t") + col("k")).as("t2"), col("x").as("xa"))
        val pairs = head.join(
          dense.select(col("event_type"), col("t").as("t2"),
            col("x").as("xb")),
          Seq("event_type", "t2"))
        val st = pairs.groupBy(col("event_type"), col("k"))
          .agg(max(col("n")).as("n"),
            sum(expr("CAST(xa AS DECIMAL(38,0)) * xb")).cast("double")
              .as("sxy"),
            sum(col("xa")).cast("double").as("sh"),
            sum(col("xb")).cast("double").as("st"))
          .join(broadcast(bounds.select(col("event_type"),
            col("total"), col("sxx"))), "event_type")
        val nd = col("n").cast("double")
        val kd = col("k").cast("double")
        val mu = col("total").cast("double") / nd
        val ck = col("sxy") - mu * (col("sh") + col("st")) +
          (nd - kd) * mu * mu
        val c0 = col("sxx").cast("double") - nd * mu * mu
        st.select(col("event_type"), col("k"), col("n").as("n_hours"),
          (ck / c0).as("r_k"),
          (abs(ck / c0) * sqrt(nd) > lit(2.0)).as("significant"))
      },
      Some("""WITH hc AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             |    CAST(COUNT(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1,
             |    MAX(h) - MIN(h) + 1 AS n,
             |    CAST(SUM(x) AS BIGINT) AS total,
             |    SUM(CAST(x AS HUGEINT) * x) AS sxx
             |  FROM hc GROUP BY event_type),
             |dense AS (
             |  SELECT g.event_type, g.h - g.h0 AS t, g.n,
             |    CAST(COALESCE(hc.x, 0) AS BIGINT) AS x
             |  FROM (SELECT event_type, h0, h1, n,
             |          unnest(range(h0, h1 + 1)) AS h
             |        FROM bounds) g
             |  LEFT JOIN hc ON hc.event_type = g.event_type
             |    AND hc.h = g.h),
             |pairs AS (
             |  SELECT a.event_type, l.k, a.n, a.x AS xa, b.x AS xb
             |  FROM dense a
             |  CROSS JOIN (SELECT unnest(range(1, 25)) AS k) l
             |  JOIN dense b ON b.event_type = a.event_type
             |    AND b.t = a.t + l.k),
             |st AS (
             |  SELECT p.event_type, p.k, MAX(p.n) AS n,
             |    CAST(SUM(CAST(xa AS HUGEINT) * xb) AS DOUBLE) AS sxy,
             |    CAST(SUM(xa) AS DOUBLE) AS sh,
             |    CAST(SUM(xb) AS DOUBLE) AS st
             |  FROM pairs p GROUP BY p.event_type, p.k),
             |m AS (
             |  SELECT st.event_type, st.k, st.n, st.sxy, st.sh, st.st,
             |    CAST(b.total AS DOUBLE) / CAST(st.n AS DOUBLE) AS mu,
             |    CAST(b.sxx AS DOUBLE) AS sxxd
             |  FROM st JOIN bounds b USING (event_type))
             |SELECT event_type, k, n AS n_hours,
             |  (sxy - mu * (sh + st)
             |    + (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * mu * mu)
             |    / (sxxd - CAST(n AS DOUBLE) * mu * mu) AS r_k,
             |  abs((sxy - mu * (sh + st)
             |    + (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * mu * mu)
             |    / (sxxd - CAST(n AS DOUBLE) * mu * mu))
             |    * sqrt(CAST(n AS DOUBLE)) > 2.0 AS significant
             |FROM m""".stripMargin)),

    // ----- q228: SAX symbolization + motif counts per stream --------------
    // Symbolic Aggregate approXimation (Lin et al. 2003): z-normalize
    // the densified hourly series, map each hour onto a 4-letter
    // alphabet at the N(0,1) quartile breakpoints (∓0.6745 as 4-decimal
    // LITERALS — the inverse normal CDF at query time would be libm),
    // and count 3-letter motifs — the discretization under time-series
    // motif discovery and the anomaly grammar q183/q184 could consume.
    // μ and σ come from exact integer sums (one IEEE sqrt); a σ = 0
    // stream maps to 'b' explicitly rather than riding on NaN
    // comparison semantics. Motif assembly is two SHIFTED EQUI-JOINS on
    // the hour index (the q227/q224 shape — no window over the corpus);
    // output is alphabet³-bounded per stream.
    NamedQuery(
      "q228_sax_motifs",
      (s, d) => {
        val hc = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("x"))
        val bounds = hc.groupBy(col("event_type"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
            sum(col("x")).as("total"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        val nd = (col("h1") - col("h0") + 1).cast("double")
        val mu = col("total").cast("double") / nd
        val sd = sqrt((col("sxx").cast("double") - nd * mu * mu) / nd)
        val dense = bounds
          .select(col("event_type"), col("h0"),
            (col("h1") - col("h0") + 1).as("n"),
            mu.as("mu"), sd.as("sd"),
            explode(expr("sequence(h0, h1)")).as("h"))
          .join(hc, Seq("event_type", "h"), "left")
          .select(col("event_type"), (col("h") - col("h0")).as("t"),
            col("n"),
            when(col("sd") === 0.0, "b")
              .when((coalesce(col("x"), lit(0L)).cast("double") -
                col("mu")) / col("sd") < -0.6745, "a")
              .when((coalesce(col("x"), lit(0L)).cast("double") -
                col("mu")) / col("sd") < 0.0, "b")
              .when((coalesce(col("x"), lit(0L)).cast("double") -
                col("mu")) / col("sd") < 0.6745, "c")
              .otherwise("d").as("sym"))
        val s1 = dense.select(col("event_type"), col("t"), col("n"),
          col("sym").as("c1"))
        val s2 = dense.select(col("event_type"), (col("t") - 1).as("t"),
          col("sym").as("c2"))
        val s3 = dense.select(col("event_type"), (col("t") - 2).as("t"),
          col("sym").as("c3"))
        s1.join(s2, Seq("event_type", "t"))
          .join(s3, Seq("event_type", "t"))
          .select(col("event_type"), col("n"),
            concat(col("c1"), col("c2"), col("c3")).as("motif"))
          .groupBy(col("event_type"), col("motif"))
          .agg(max(col("n")).as("n_hours"), count(lit(1)).as("cnt"))
          .select(col("event_type"), col("motif"), col("cnt"),
            (col("cnt").cast("double") /
              (col("n_hours") - 2).cast("double")).as("share"))
      },
      Some("""WITH hc AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             |    CAST(COUNT(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1,
             |    MAX(h) - MIN(h) + 1 AS n,
             |    CAST(SUM(x) AS BIGINT) AS total,
             |    SUM(CAST(x AS HUGEINT) * x) AS sxx
             |  FROM hc GROUP BY event_type),
             |parms AS (
             |  SELECT event_type, h0, n,
             |    CAST(total AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             |    sqrt((CAST(sxx AS DOUBLE)
             |      - CAST(n AS DOUBLE)
             |        * (CAST(total AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (CAST(total AS DOUBLE) / CAST(n AS DOUBLE)))
             |      / CAST(n AS DOUBLE)) AS sd
             |  FROM bounds),
             |dense AS (
             |  SELECT g.event_type, g.h - g.h0 AS t, g.n,
             |    CASE WHEN g.sd = 0.0 THEN 'b'
             |      WHEN (CAST(COALESCE(hc.x, 0) AS DOUBLE) - g.mu)
             |        / g.sd < -0.6745 THEN 'a'
             |      WHEN (CAST(COALESCE(hc.x, 0) AS DOUBLE) - g.mu)
             |        / g.sd < 0.0 THEN 'b'
             |      WHEN (CAST(COALESCE(hc.x, 0) AS DOUBLE) - g.mu)
             |        / g.sd < 0.6745 THEN 'c'
             |      ELSE 'd' END AS sym
             |  FROM (SELECT event_type, h0, n, mu, sd,
             |          unnest(range(h0, h0 + n)) AS h
             |        FROM parms) g
             |  LEFT JOIN hc ON hc.event_type = g.event_type
             |    AND hc.h = g.h)
             |SELECT a.event_type, a.sym || b.sym || c.sym AS motif,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(COUNT(*) AS DOUBLE)
             |    / CAST(MAX(a.n) - 2 AS DOUBLE) AS share
             |FROM dense a
             |JOIN dense b ON b.event_type = a.event_type
             |  AND b.t = a.t + 1
             |JOIN dense c ON c.event_type = a.event_type
             |  AND c.t = a.t + 2
             |GROUP BY a.event_type, a.sym || b.sym || c.sym"""
        .stripMargin)),

    // ----- q230: heavy-hitter churn between time halves --------------------
    // Not "who are the heavy hitters" (q67) but "who CHANGED" — the
    // report an on-call engineer reads when traffic shifts: top-10 users
    // by activity in each half of the time range, joined into
    // entered/left/stayed with rank movement. The per-half top-10 runs
    // through the custom [[graft.plans.TopKPerGroup]] operator (map-side
    // heaps, no sort — its second production call site after q226); the
    // rank numbers are then a window over ≤ 2·k surviving rows, which is
    // where a window belongs. The midpoint is integer hour arithmetic;
    // oracle re-derives everything with plain row_number windows, so the
    // custom operator is gated by construction-independent semantics
    // again. COALESCE(−, 0) keeps absent-side counts/ranks integral
    // rather than NULL (identical on both sides).
    NamedQuery(
      "q230_heavyhitter_churn",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("h"))
        val mid = ev.agg(expr("(min(h) + max(h) + 1) div 2").as("mid"))
        val counts = ev.crossJoin(broadcast(mid))
          .select(col("user_id"),
            when(col("h") < col("mid"), "w1").otherwise("w2").as("half"))
          .groupBy(col("half"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        val top = graft.plans.TopKPerGroup.topK(
          counts, keys = Seq("half"),
          order = Seq(("cnt", true), ("user_id", false)), k = 10)
        val ranked = top.withColumn("rk",
          row_number().over(Window.partitionBy(col("half"))
            .orderBy(col("cnt").desc, col("user_id"))).cast("long"))
        val w1 = ranked.filter(col("half") === "w1")
          .select(col("user_id"), col("cnt").as("cnt_w1"),
            col("rk").as("rank_w1"))
        val w2 = ranked.filter(col("half") === "w2")
          .select(col("user_id"), col("cnt").as("cnt_w2"),
            col("rk").as("rank_w2"))
        w1.join(w2, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("cnt_w1"), lit(0L)).as("cnt_w1"),
            coalesce(col("cnt_w2"), lit(0L)).as("cnt_w2"),
            coalesce(col("rank_w1"), lit(0L)).as("rank_w1"),
            coalesce(col("rank_w2"), lit(0L)).as("rank_w2"),
            when(col("rank_w1").isNull, "entered")
              .when(col("rank_w2").isNull, "left")
              .otherwise("stayed").as("status"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) // 3600000000 AS h
             |  FROM events),
             |mid AS (SELECT (MIN(h) + MAX(h) + 1) // 2 AS mid FROM ev),
             |counts AS (
             |  SELECT CASE WHEN e.h < m.mid THEN 'w1' ELSE 'w2' END
             |      AS half,
             |    e.user_id, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM ev e, mid m GROUP BY 1, 2),
             |ranked AS (
             |  SELECT half, user_id, cnt,
             |    CAST(row_number() OVER (PARTITION BY half
             |      ORDER BY cnt DESC, user_id) AS BIGINT) AS rk
             |  FROM counts),
             |t AS (SELECT * FROM ranked WHERE rk <= 10),
             |w1 AS (SELECT user_id, cnt AS cnt_w1, rk AS rank_w1
             |       FROM t WHERE half = 'w1'),
             |w2 AS (SELECT user_id, cnt AS cnt_w2, rk AS rank_w2
             |       FROM t WHERE half = 'w2')
             |SELECT COALESCE(w1.user_id, w2.user_id) AS user_id,
             |  COALESCE(cnt_w1, 0) AS cnt_w1,
             |  COALESCE(cnt_w2, 0) AS cnt_w2,
             |  COALESCE(rank_w1, 0) AS rank_w1,
             |  COALESCE(rank_w2, 0) AS rank_w2,
             |  CASE WHEN rank_w1 IS NULL THEN 'entered'
             |       WHEN rank_w2 IS NULL THEN 'left'
             |       ELSE 'stayed' END AS status
             |FROM w1 FULL OUTER JOIN w2 USING (user_id)"""
        .stripMargin)),

    // ----- q232: bagged stump ensemble with out-of-bag error ---------------
    // q222 trains ONE weak learner; this is the smallest honest ENSEMBLE
    // (Breiman 1996 bagging): 8 stumps, each trained on a deterministic
    // half-subsample (md5 membership — the portable stand-in for a
    // bootstrap draw), majority-vote aggregation, and the out-of-bag
    // error — the free validation estimate a production ensemble ships
    // with. Everything stays exact: per-bag threshold search is q222's
    // cumulative-Gini over the distinct-length table (8× a bounded
    // table); each side of each stump predicts ITS OWN majority class by
    // integer cross-multiplication; votes and OOB tallies are integer
    // counts; ties vote positive (documented, mirrored). Shape: one 8×
    // bounded threshold search, one 8-row broadcast of trained stumps
    // onto the corpus, two scalar rollups.
    NamedQuery(
      "q232_bagged_stumps",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = tbl(s, d, "documents")
          .select(col("doc_id"), col("n_chars").cast("long").as("x"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val bags = s.range(0, 8).select(col("id").as("b"))
        val member = docs.crossJoin(broadcast(bags))
          .filter(LlmKit.strHash(concat(lit("bag:"),
            col("b").cast("string"), lit(":"),
            col("doc_id").cast("string"))) % 2 === 0)
        val dist = member.groupBy(col("b"), col("x"))
          .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
        val w = Window.partitionBy(col("b")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dist
          .withColumn("nl", sum(col("c")).over(w))
          .withColumn("pl", sum(col("p")).over(w))
        val tot = dist.groupBy(col("b"))
          .agg(sum(col("c")).as("n"), sum(col("p")).as("pt"))
        val j = cum.join(broadcast(tot), "b").filter(col("nl") < col("n"))
        val nld = col("nl").cast("double")
        val pld = col("pl").cast("double")
        val nrd = (col("n") - col("nl")).cast("double")
        val prd = (col("pt") - col("pl")).cast("double")
        val gini = (nld -
          (pld * pld + (nld - pld) * (nld - pld)) / nld +
          nrd - (prd * prd + (nrd - prd) * (nrd - prd)) / nrd) /
          col("n").cast("double")
        val stumps = j
          .select(col("b"), gini.as("g"), col("x"), col("nl"), col("pl"),
            col("n"), col("pt"))
          .groupBy(col("b"))
          .agg(min(struct(col("g"), col("x"), col("nl"), col("pl"),
            col("n"), col("pt"))).as("m"))
          .select(col("b"), col("m.x").as("threshold"),
            col("m.g").as("train_gini"),
            (col("m.pl") * 2 >= col("m.nl")).as("left_pred"),
            ((col("m.pt") - col("m.pl")) * 2 >= col("m.n") - col("m.nl"))
              .as("right_pred"))
          .cache()
        val applied = docs.crossJoin(broadcast(stumps))
          .select(col("doc_id"), col("y"), col("b"),
            when(col("x") <= col("threshold"), col("left_pred"))
              .otherwise(col("right_pred")).cast("long").as("pred"),
            (LlmKit.strHash(concat(lit("bag:"), col("b").cast("string"),
              lit(":"), col("doc_id").cast("string"))) % 2 =!= 0)
              .cast("long").as("oob"))
        val perDoc = applied.groupBy(col("doc_id"), col("y"))
          .agg(sum(col("pred")).as("votes1"),
            sum(col("oob")).as("oob_n"),
            sum(col("pred") * col("oob")).as("oob_votes1"))
        val acc = perDoc.agg(
          (sum(when((col("votes1") * 2 >= 8).cast("long") === col("y"),
            1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double")).as("ensemble_acc"),
          (sum(when((col("oob_n") > 0) &&
            ((col("oob_votes1") * 2 >= col("oob_n")).cast("long") =!=
              col("y")), 1L).otherwise(0L)).cast("double") /
            sum(when(col("oob_n") > 0, 1L).otherwise(0L)).cast("double"))
            .as("oob_error"))
        stumps.crossJoin(broadcast(acc))
      },
      Some {
        val h = LlmKit.strHashSql(
          "concat('bag:', CAST(b.b AS VARCHAR), ':', " +
            "CAST(d.doc_id AS VARCHAR))")
        val nld = "CAST(nl AS DOUBLE)"
        val pld = "CAST(pl AS DOUBLE)"
        val nrd = "CAST(n - nl AS DOUBLE)"
        val prd = "CAST(pt - pl AS DOUBLE)"
        s"""WITH docs AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |member AS (
           |  SELECT b.b, d.doc_id, d.x, d.y
           |  FROM docs d, (SELECT unnest(range(0, 8)) AS b) b
           |  WHERE $h % 2 = 0),
           |dist AS (
           |  SELECT b, x, CAST(COUNT(*) AS BIGINT) AS c,
           |    CAST(SUM(y) AS BIGINT) AS p
           |  FROM member GROUP BY b, x),
           |cum AS (
           |  SELECT b, x,
           |    CAST(SUM(c) OVER (PARTITION BY b ORDER BY x
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
           |    CAST(SUM(p) OVER (PARTITION BY b ORDER BY x
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl
           |  FROM dist),
           |tot AS (SELECT b, CAST(SUM(c) AS BIGINT) AS n,
           |        CAST(SUM(p) AS BIGINT) AS pt FROM dist GROUP BY b),
           |scored AS (
           |  SELECT cum.b, cum.x, cum.nl, cum.pl, tot.n, tot.pt,
           |    ($nld - ($pld * $pld + ($nld - $pld) * ($nld - $pld))
           |       / $nld
           |     + $nrd - ($prd * $prd + ($nrd - $prd) * ($nrd - $prd))
           |       / $nrd) / CAST(n AS DOUBLE) AS g
           |  FROM cum JOIN tot USING (b) WHERE cum.nl < tot.n),
           |stumps AS (
           |  SELECT b, x AS threshold, g AS train_gini,
           |    pl * 2 >= nl AS left_pred,
           |    (pt - pl) * 2 >= n - nl AS right_pred
           |  FROM (SELECT *, row_number() OVER (PARTITION BY b
           |          ORDER BY g, x) AS rk FROM scored)
           |  WHERE rk = 1),
           |applied AS (
           |  SELECT d.doc_id, d.y, s.b,
           |    CASE WHEN d.x <= s.threshold
           |      THEN CASE WHEN s.left_pred THEN 1 ELSE 0 END
           |      ELSE CASE WHEN s.right_pred THEN 1 ELSE 0 END
           |    END AS pred,
           |    CASE WHEN ${LlmKit.strHashSql(
          "concat('bag:', CAST(s.b AS VARCHAR), ':', " +
            "CAST(d.doc_id AS VARCHAR))")} % 2 <> 0
           |      THEN 1 ELSE 0 END AS oob
           |  FROM docs d, stumps s),
           |per_doc AS (
           |  SELECT doc_id, y, CAST(SUM(pred) AS BIGINT) AS votes1,
           |    CAST(SUM(oob) AS BIGINT) AS oob_n,
           |    CAST(SUM(pred * oob) AS BIGINT) AS oob_votes1
           |  FROM applied GROUP BY doc_id, y),
           |acc AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN (CASE WHEN votes1 * 2 >= 8 THEN 1
           |          ELSE 0 END) = y THEN 1 ELSE 0 END) AS DOUBLE)
           |      / CAST(COUNT(*) AS DOUBLE) AS ensemble_acc,
           |    CAST(SUM(CASE WHEN oob_n > 0
           |          AND (CASE WHEN oob_votes1 * 2 >= oob_n THEN 1
           |               ELSE 0 END) <> y THEN 1 ELSE 0 END) AS DOUBLE)
           |      / CAST(SUM(CASE WHEN oob_n > 0 THEN 1 ELSE 0 END)
           |             AS DOUBLE) AS oob_error
           |  FROM per_doc)
           |SELECT s.b, s.threshold, s.train_gini, s.left_pred,
           |  s.right_pred, a.ensemble_acc, a.oob_error
           |FROM stumps s, acc a""".stripMargin
      }),

    // ----- q233: pairwise KS distance matrix between sources --------------
    // q136 tests one stream against a reference window; this is the
    // all-pairs version a mixture designer reads — which SOURCES have
    // the same document-length distribution? The two-sample
    // Kolmogorov–Smirnov D for every source pair, computed EXACTLY:
    // each source's CDF lives on the shared global distinct-length grid
    // (sources × ~hundreds of lengths, bounded — lengths don't grow
    // with corpus rows), and D's max runs over the INTEGER
    // cross-multiplied form |F_s·n_t − F_t·n_s| so no float compare
    // decides the argmax; the single division and the 1.36·√((n_s+n_t)
    // /(n_s·n_t)) band (α=0.05 literal) happen after the max. Shape:
    // one per-(source, length) rollup, one dense-grid cumulative per
    // source, one grid self-join on length for the 190 pairs.
    NamedQuery(
      "q233_ks_matrix",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = tbl(s, d, "documents")
          .select(col("source"), col("n_chars").cast("long").as("x"))
        val counts = docs.groupBy(col("source"), col("x"))
          .agg(count(lit(1)).as("c"))
        val xs = docs.select(col("x")).distinct()
        val srcs = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val grid = srcs.crossJoin(xs)
          .join(counts, Seq("source", "x"), "left")
          .select(col("source"), col("x"), col("n"),
            coalesce(col("c"), lit(0L)).as("c"))
        val w = Window.partitionBy(col("source")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cdf = grid.withColumn("f", sum(col("c")).over(w))
        val a = cdf.select(col("source").as("s1"), col("x"),
          col("n").as("n1"), col("f").as("f1"))
        val b = cdf.select(col("source").as("s2"), col("x"),
          col("n").as("n2"), col("f").as("f2"))
        val pairs = a.join(b, Seq("x")).filter(col("s1") < col("s2"))
          .select(col("s1"), col("s2"), col("n1"), col("n2"),
            abs(col("f1") * col("n2") - col("f2") * col("n1")).as("dn"))
          .groupBy(col("s1"), col("s2"))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            max(col("dn")).as("dmax"))
        val n1d = col("n1").cast("double")
        val n2d = col("n2").cast("double")
        val dStat = col("dmax").cast("double") / (n1d * n2d)
        pairs.select(col("s1"), col("s2"), col("n1"), col("n2"),
          dStat.as("d_stat"),
          (dStat > lit(1.36) * sqrt((n1d + n2d) / (n1d * n2d)))
            .as("differs"))
      },
      Some("""WITH docs AS (
             |  SELECT source, CAST(n_chars AS BIGINT) AS x
             |  FROM documents),
             |counts AS (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS c
             |           FROM docs GROUP BY 1, 2),
             |xs AS (SELECT DISTINCT x FROM docs),
             |srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
             |         FROM docs GROUP BY source),
             |cdf AS (
             |  SELECT g.source, g.x, g.n,
             |    CAST(SUM(COALESCE(c.c, 0)) OVER (PARTITION BY g.source
             |      ORDER BY g.x ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS f
             |  FROM (SELECT s.source, s.n, xs.x FROM srcs s, xs) g
             |  LEFT JOIN counts c
             |    ON c.source = g.source AND c.x = g.x),
             |pairs AS (
             |  SELECT a.source AS s1, b.source AS s2,
             |    MAX(a.n) AS n1, MAX(b.n) AS n2,
             |    MAX(abs(a.f * b.n - b.f * a.n)) AS dmax
             |  FROM cdf a JOIN cdf b ON a.x = b.x AND a.source < b.source
             |  GROUP BY a.source, b.source)
             |SELECT s1, s2, n1, n2,
             |  CAST(dmax AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
             |  CAST(dmax AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             |    > 1.36 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
             |        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             |    AS differs
             |FROM pairs""".stripMargin)),

    // ----- q234: capture–recapture population estimate per stream ---------
    // Estimate a population you can't enumerate from two overlapping
    // samples — the ecology estimator (Chapman's bias-corrected
    // Lincoln–Petersen) that dedup audits borrow to size a corpus's
    // true user base from two crawls. Here the two "captures" are each
    // stream's user sets in the two time halves; N̂ = (n1+1)(n2+1)/
    // (m+1) − 1 lands next to the EXACT distinct-user truth, so the
    // query calibrates itself (the q85/q135 self-audit discipline). The
    // estimator's assumption — equal catchability — is real: uniform
    // synthetic users recapture well; skewed real traffic would bias N̂
    // low, and the rel_err column is where that shows. All integers
    // until the final ratio. Shape: two distinct rollups + one
    // hash-join on (type, user), all partial-aggregable.
    NamedQuery(
      "q234_capture_recapture",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"), col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("h"))
        val mid = ev.agg(expr("(min(h) + max(h) + 1) div 2").as("mid"))
        val halves = ev.crossJoin(broadcast(mid))
          .select(col("event_type"), col("user_id"),
            when(col("h") < col("mid"), 1L).otherwise(2L).as("half"))
          .distinct()
        val w1 = halves.filter(col("half") === 1)
          .select(col("event_type"), col("user_id"))
        val w2 = halves.filter(col("half") === 2)
          .select(col("event_type"), col("user_id"))
        val n1 = w1.groupBy(col("event_type")).agg(count(lit(1)).as("n1"))
        val n2 = w2.groupBy(col("event_type")).agg(count(lit(1)).as("n2"))
        val m = w1.join(w2, Seq("event_type", "user_id"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("m"))
        val truth = ev.select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_true"))
        val est = ((col("n1") + 1) * (col("n2") + 1)).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0)
        n1.join(n2, "event_type").join(m, "event_type")
          .join(truth, "event_type")
          .select(col("event_type"), col("n1"), col("n2"), col("m"),
            col("n_true"), est.as("n_hat"),
            (abs(est - col("n_true").cast("double")) /
              col("n_true").cast("double")).as("rel_err"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, user_id,
             |    epoch_us(ts) // 3600000000 AS h
             |  FROM events),
             |mid AS (SELECT (MIN(h) + MAX(h) + 1) // 2 AS mid FROM ev),
             |halves AS (
             |  SELECT DISTINCT event_type, user_id,
             |    CASE WHEN h < (SELECT mid FROM mid) THEN 1 ELSE 2 END
             |      AS half
             |  FROM ev),
             |n1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n1
             |       FROM halves WHERE half = 1 GROUP BY event_type),
             |n2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n2
             |       FROM halves WHERE half = 2 GROUP BY event_type),
             |m AS (
             |  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS m
             |  FROM (SELECT event_type, user_id FROM halves
             |        WHERE half = 1) a
             |  JOIN (SELECT event_type, user_id FROM halves
             |        WHERE half = 2) b
             |    ON a.event_type = b.event_type
             |    AND a.user_id = b.user_id
             |  GROUP BY a.event_type),
             |truth AS (
             |  SELECT event_type,
             |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
             |  FROM ev GROUP BY event_type)
             |SELECT n1.event_type, n1.n1, n2.n2, m.m, truth.n_true,
             |  CAST((n1.n1 + 1) * (n2.n2 + 1) AS DOUBLE)
             |    / CAST(m.m + 1 AS DOUBLE) - 1.0 AS n_hat,
             |  abs(CAST((n1.n1 + 1) * (n2.n2 + 1) AS DOUBLE)
             |      / CAST(m.m + 1 AS DOUBLE) - 1.0
             |      - CAST(truth.n_true AS DOUBLE))
             |    / CAST(truth.n_true AS DOUBLE) AS rel_err
             |FROM n1 JOIN n2 USING (event_type)
             |JOIN m USING (event_type)
             |JOIN truth USING (event_type)""".stripMargin)),

    // ----- q239: Simpson's-paradox audit (stratified vs pooled slope) -----
    // The aggregation trap detector: the clicks→spend relationship
    // (q121's exact integer grid — spend on the ×1000 millis grid) fit
    // POOLED and fit within activity terciles, side by side. Activity
    // volume confounds both variables, so the pooled slope can carry a
    // sign no stratum supports — Simpson's paradox — and any dashboard
    // reading the pooled number alone inherits it; the sign_flip column
    // is the alarm. Terciles come from the q148 phased rank over the
    // per-user event-count distribution (scale-relative — literal
    // thresholds would pin to one SF's traffic shape); slopes are the
    // q213 sufficient-statistic form, DECIMAL-exact sums, one double
    // tree. Shape: one user rollup, one bounded distinct-count CDF, a
    // 3-row + 1-row epilogue.
    NamedQuery(
      "q239_simpson_audit",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val perUser = events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_ev"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            coalesce(dsum(when(col("event_type") === "purchase",
              col("value"))), lit(0.0)).as("yv"))
          .select(col("user_id"), col("n_ev"), col("x"),
            floor(col("yv") * 1000.0).cast("long").as("y"))
        val dist = perUser.groupBy(col("n_ev"))
          .agg(count(lit(1)).as("c"))
        val wRun = boundedWin.orderBy(col("n_ev"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nU = dist.agg(sum(col("c")).as("nu"))
        val ranks = dist.withColumn("f", sum(col("c")).over(wRun))
          .crossJoin(broadcast(nU))
          .select(col("n_ev"),
            expr("(f * 3 - 1) div nu").as("band"))
        val banded = perUser.join(broadcast(ranks), "n_ev")
        def slopeAgg(df: org.apache.spark.sql.DataFrame,
            keys: Seq[org.apache.spark.sql.Column]) = {
          val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys: _*)
          g.agg(count(lit(1)).as("n"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).cast("double").as("sx"),
            sum(expr("CAST(y AS DECIMAL(38,0))")).cast("double").as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double")
              .as("sxy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double")
              .as("sxx"))
        }
        val nd = col("n").cast("double")
        val slope = (nd * col("sxy") - col("sx") * col("sy")) /
          (nd * col("sxx") - col("sx") * col("sx"))
        val pooled = slopeAgg(banded, Nil)
          .select(slope.as("pooled_slope"))
        slopeAgg(banded, Seq(col("band")))
          .select(col("band"), col("n").as("n_users"),
            slope.as("band_slope"))
          .crossJoin(broadcast(pooled))
          .select(col("band"), col("n_users"), col("band_slope"),
            col("pooled_slope"),
            (col("band_slope") * col("pooled_slope") < 0.0)
              .as("sign_flip"))
      },
      Some(s"""WITH u AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS x,
             |    CAST(floor(coalesce(${dsumSql(
               "CASE WHEN event_type = 'purchase' THEN value END")},
               0.0) * 1000.0) AS BIGINT) AS y
             |  FROM events GROUP BY user_id),
             |dist AS (SELECT n_ev, CAST(COUNT(*) AS BIGINT) AS c
             |         FROM u GROUP BY n_ev),
             |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM dist),
             |ranks AS (
             |  SELECT n_ev,
             |    (CAST(SUM(c) OVER (ORDER BY n_ev
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) * 3 - 1)
             |      // (SELECT nu FROM nu) AS band
             |  FROM dist),
             |b AS (SELECT u.*, r.band FROM u JOIN ranks r
             |      USING (n_ev)),
             |bs AS (
             |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
             |  FROM b GROUP BY band),
             |ps AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
             |  FROM b),
             |pp AS (
             |  SELECT (CAST(n AS DOUBLE) * sxy - sx * sy)
             |    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS pooled_slope
             |  FROM ps)
             |SELECT bs.band, bs.n AS n_users,
             |  (CAST(bs.n AS DOUBLE) * bs.sxy - bs.sx * bs.sy)
             |    / (CAST(bs.n AS DOUBLE) * bs.sxx - bs.sx * bs.sx)
             |    AS band_slope,
             |  pp.pooled_slope,
             |  (CAST(bs.n AS DOUBLE) * bs.sxy - bs.sx * bs.sy)
             |    / (CAST(bs.n AS DOUBLE) * bs.sxx - bs.sx * bs.sx)
             |    * pp.pooled_slope < 0.0 AS sign_flip
             |FROM bs, pp""".stripMargin)),

    // ----- q240: lang × source independence (chi-square + Cramér's V) -----
    // Is language independent of source, or does each source carry its
    // own language mix? The contingency-table test every mixture
    // designer should run before treating "source" and "language" as
    // separable knobs: observed cell counts vs independence expectation
    // e = row·col/n, chi-square over all cells (absent cells
    // DENSIFIED — their expected mass still counts, the q175 grid
    // lesson), and Cramér's V = √(χ²/(n·(min(r,c)−1))) as the
    // normalized effect size. Counts are exact integers; e and the
    // statistic are identical double trees; the 5×20 grid is
    // dimension-bounded at any corpus size.
    NamedQuery(
      "q240_cramers_v",
      (s, d) => {
        val docs = tbl(s, d, "documents")
          .select(col("lang"), col("source"))
        val cells = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
        val rows = docs.groupBy(col("lang")).agg(count(lit(1)).as("r"))
        val cols = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
        val n = docs.agg(count(lit(1)).as("n"),
          countDistinct(col("lang")).as("nr"),
          countDistinct(col("source")).as("nc"))
        val dense = rows.crossJoin(cols)
          .join(cells, Seq("lang", "source"), "left")
          .crossJoin(broadcast(n))
          .select(col("lang"), col("source"),
            coalesce(col("o"), lit(0L)).as("o"),
            (col("r").cast("double") * col("c").cast("double") /
              col("n").cast("double")).as("e"),
            col("n"), col("nr"), col("nc"))
          .withColumn("contrib",
            (col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e"))
        val chi = dense.agg(dsum(col("contrib")).as("chi2"),
          max(col("n")).as("n2"), max(col("nr")).as("nr2"),
          max(col("nc")).as("nc2"))
          .select(col("chi2"),
            ((col("nr2") - 1) * (col("nc2") - 1)).as("dof"),
            sqrt(col("chi2") / (col("n2").cast("double") *
              (least(col("nr2"), col("nc2")) - lit(1)).cast("double")))
              .as("cramers_v"))
        dense.select(col("lang"), col("source"), col("o"), col("e"),
            col("contrib"))
          .crossJoin(broadcast(chi))
      },
      Some(s"""WITH docs AS (SELECT lang, source FROM documents),
             |cells AS (SELECT lang, source,
             |    CAST(COUNT(*) AS BIGINT) AS o
             |  FROM docs GROUP BY 1, 2),
             |r AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS r
             |      FROM docs GROUP BY lang),
             |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM docs GROUP BY source),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
             |    CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
             |  FROM docs),
             |dense AS (
             |  SELECT r.lang, c.source,
             |    CAST(COALESCE(cells.o, 0) AS BIGINT) AS o,
             |    CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
             |      / CAST(n.n AS DOUBLE) AS e,
             |    n.n, n.nr, n.nc
             |  FROM r CROSS JOIN c
             |  LEFT JOIN cells ON cells.lang = r.lang
             |    AND cells.source = c.source
             |  CROSS JOIN n),
             |dc AS (
             |  SELECT lang, source, o, e,
             |    (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
             |      AS contrib,
             |    n, nr, nc
             |  FROM dense),
             |chi AS (
             |  SELECT ${dsumSql("contrib")} AS chi2,
             |    (MAX(nr) - 1) * (MAX(nc) - 1) AS dof,
             |    sqrt(${dsumSql("contrib")}
             |      / (CAST(MAX(n) AS DOUBLE)
             |         * CAST(least(MAX(nr), MAX(nc)) - 1 AS DOUBLE)))
             |      AS cramers_v
             |  FROM dc)
             |SELECT dc.lang, dc.source, dc.o, dc.e, dc.contrib,
             |  chi.chi2, chi.dof, chi.cramers_v
             |FROM dc, chi""".stripMargin)),

    // ----- q243: event-type co-usage matrix (user-set Jaccard) ------------
    // Which behaviors share an audience? For every event-type pair:
    // the user-set overlap, Jaccard, and BOTH containments (Jaccard
    // says "these audiences are similar"; containment says "A's users
    // are a subset of B's" — the asymmetric reading a funnel designer
    // needs, q95's lesson applied to audiences). One distinct
    // (type, user) projection, one user-keyed self-join producing only
    // pairs that SHARE a user — the sparse intersection, never
    // |types|²·|users| — then a 10-row epilogue against broadcast
    // per-type sizes. All counts exact.
    NamedQuery(
      "q243_cousage_matrix",
      (s, d) => {
        val tu = events(s, d)
          .select(col("event_type"), col("user_id")).distinct()
        val sizes = tu.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nu"))
        val inter = tu.select(col("event_type").as("ta"), col("user_id"))
          .join(tu.select(col("event_type").as("tb"), col("user_id")),
            "user_id")
          .filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb"))
          .agg(count(lit(1)).as("m"))
        inter
          .join(broadcast(sizes.select(col("event_type").as("ta"),
            col("nu").as("na"))), "ta")
          .join(broadcast(sizes.select(col("event_type").as("tb"),
            col("nu").as("nb"))), "tb")
          .select(col("ta"), col("tb"), col("na"), col("nb"), col("m"),
            (col("m").cast("double") /
              (col("na") + col("nb") - col("m")).cast("double"))
              .as("jaccard"),
            (col("m").cast("double") / col("na").cast("double"))
              .as("containment_a"),
            (col("m").cast("double") / col("nb").cast("double"))
              .as("containment_b"))
      },
      Some("""WITH tu AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu
             |          FROM tu GROUP BY event_type),
             |inter AS (
             |  SELECT a.event_type AS ta, b.event_type AS tb,
             |    CAST(COUNT(*) AS BIGINT) AS m
             |  FROM tu a JOIN tu b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT i.ta, i.tb, sa.nu AS na, sb.nu AS nb, i.m,
             |  CAST(i.m AS DOUBLE)
             |    / CAST(sa.nu + sb.nu - i.m AS DOUBLE) AS jaccard,
             |  CAST(i.m AS DOUBLE) / CAST(sa.nu AS DOUBLE)
             |    AS containment_a,
             |  CAST(i.m AS DOUBLE) / CAST(sb.nu AS DOUBLE)
             |    AS containment_b
             |FROM inter i
             |JOIN sizes sa ON sa.event_type = i.ta
             |JOIN sizes sb ON sb.event_type = i.tb"""
        .stripMargin)),

    // ----- q244: sample-ratio mismatch (SRM) guard for the A/B split -------
    // The pre-test every experiment readout must pass BEFORE q178's
    // z-test means anything: does the 50/50 assignment actually split
    // 50/50? A skewed split (bot filtering, logging loss, assignment
    // bugs) invalidates the comparison silently — SRM is the most
    // common real-world A/B failure. Per activity cohort (users seen in
    // each event type): arm sizes under the parity assignment, the
    // 1-dof chi-square in its exact integer-numerator form
    // (o₁−o₂)²/n, and the 3.841 (α=0.05) alarm. One distinct rollup,
    // cohort-bounded epilogue.
    NamedQuery(
      "q244_srm_check",
      (s, d) => {
        val cu = events(s, d)
          .select(col("event_type"), col("user_id")).distinct()
          .select(col("event_type"),
            (col("user_id") % 2 === 0).cast("long").as("arm0"))
        val st = cu.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("arm0")).as("n_arm0"))
        val o1 = col("n_arm0").cast("double")
        val o2 = (col("n") - col("n_arm0")).cast("double")
        val chi = (o1 - o2) * (o1 - o2) / col("n").cast("double")
        st.select(col("event_type"), col("n"), col("n_arm0"),
          (col("n") - col("n_arm0")).as("n_arm1"),
          chi.as("chi2"), (chi > lit(3.841)).as("srm_alarm"))
      },
      Some("""WITH cu AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |st AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_arm0
             |  FROM cu GROUP BY event_type)
             |SELECT event_type, n, n_arm0, n - n_arm0 AS n_arm1,
             |  (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    * (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS chi2,
             |  (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    * (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    / CAST(n AS DOUBLE) > 3.841 AS srm_alarm
             |FROM st""".stripMargin)),

    // ----- q246: decile lift / gains table (model-eval workhorse) ---------
    // The table every scoring model ships with: rank users by a score
    // (clicks — the q121 predictor), cut into GLOBAL deciles, and report
    // each decile's purchase rate, lift over base rate, and the
    // cumulative gains curve read from the top. Deciles come from the
    // q148 phased CDF over distinct scores — integer binning, no
    // percentile interpolation — numbered 1 = best-scored; ties share a
    // decile (they share a score, so any other assignment would be
    // arbitrary). The cumulative window runs over exactly 10 rows.
    // lift > 1 in decile 1 is the "model beats random" readout; the
    // cumulative share at decile k is the budget curve a campaign
    // planner cuts at.
    NamedQuery(
      "q246_decile_lift",
      (s, d) => {
        // outcome = HIGH-VALUE purchase (q178's target): bare "ever
        // purchased" is all-ones at small SF (the r12 degeneracy sweep
        // caught rate = lift = 1.0 in every decile — a gains table
        // certifying nothing)
        import org.apache.spark.sql.expressions.Window
        val perUser = events(s, d)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("score"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150.0, 1L).otherwise(0L))
              .as("pos"))
        val dist = perUser.groupBy(col("score"))
          .agg(count(lit(1)).as("c"))
        val wRun = boundedWin.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nU = dist.agg(sum(col("c")).as("nu"))
        val ranks = dist.withColumn("f", sum(col("c")).over(wRun))
          .crossJoin(broadcast(nU))
          .select(col("score"),
            (lit(10) - expr("(f * 10 - 1) div nu")).as("decile"))
        val byDec = perUser.join(broadcast(ranks), "score")
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("pos")).as("n_pos"))
        val tot = byDec.agg(sum(col("n_users")).as("nt"),
          sum(col("n_pos")).as("pt"))
        val wCum = boundedWin.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byDec.crossJoin(broadcast(tot))
          .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
          .select(col("decile"), col("n_users"), col("n_pos"),
            (col("n_pos").cast("double") / col("n_users").cast("double"))
              .as("rate"),
            ((col("n_pos").cast("double") / col("n_users").cast("double"))
              / (col("pt").cast("double") / col("nt").cast("double")))
              .as("lift"),
            (col("cum_pos").cast("double") / col("pt").cast("double"))
              .as("cum_gain_share"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS score,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN 1 ELSE 0 END)
             |      AS pos
             |  FROM events GROUP BY user_id),
             |dist AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c
             |         FROM u GROUP BY score),
             |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM dist),
             |ranks AS (
             |  SELECT score,
             |    10 - (CAST(SUM(c) OVER (ORDER BY score
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10 - 1)
             |      // (SELECT nu FROM nu) AS decile
             |  FROM dist),
             |bd AS (
             |  SELECT r.decile, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(u.pos) AS BIGINT) AS n_pos
             |  FROM u JOIN ranks r USING (score)
             |  GROUP BY r.decile),
             |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nt,
             |        CAST(SUM(n_pos) AS BIGINT) AS pt FROM bd)
             |SELECT bd.decile, bd.n_users, bd.n_pos,
             |  CAST(bd.n_pos AS DOUBLE) / CAST(bd.n_users AS DOUBLE)
             |    AS rate,
             |  (CAST(bd.n_pos AS DOUBLE) / CAST(bd.n_users AS DOUBLE))
             |    / (CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE)) AS lift,
             |  CAST(SUM(bd.n_pos) OVER (ORDER BY bd.decile
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             |    / CAST(t.pt AS DOUBLE) AS cum_gain_share
             |FROM bd, tot t""".stripMargin)),

    // ----- q248: Cochran–Armitage trend in proportions ---------------------
    // "Does conversion RISE with account balance?" — not "are the bands
    // different" (q218's omnibus) but the ORDERED question, which the
    // trend test answers with far more power when the truth is
    // monotone. Scores w = the integer balance band itself; every
    // sufficient statistic (Σwr, Σwn, Σw²n, R, n) is an exact
    // DECIMAL/HUGEINT sum, and z is one identical double tree with one
    // IEEE sqrt. The outcome is "has placed ≥1 URGENT order" — every
    // customer here has SOME order (p = 1 would make the null variance
    // vanish — measured, not assumed), so the urgency flag is the
    // binary with real variation. One distinct semi-join flag, one band
    // rollup; the per-band rates publish alongside the broadcast z so
    // the trend claim can be eyeballed against its own evidence.
    NamedQuery(
      "q248_trend_test",
      (s, d) => {
        val conv = tbl(s, d, "customer")
          .join(tbl(s, d, "orders")
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")).distinct()
            .withColumnRenamed("o_custkey", "c_custkey")
            .withColumn("converted", lit(1L)), Seq("c_custkey"), "left")
          .select(floor(col("c_acctbal") / lit(1000.0)).cast("long")
            .as("band"),
            coalesce(col("converted"), lit(0L)).as("y"))
        val bands = conv.groupBy(col("band"))
          .agg(count(lit(1)).as("n_i"), sum(col("y")).as("r_i"))
        val st = bands.agg(
          sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
          sum(expr("CAST(band AS DECIMAL(38,0)) * r_i")).cast("double")
            .as("swr"),
          sum(expr("CAST(band AS DECIMAL(38,0)) * n_i")).cast("double")
            .as("swn"),
          sum(expr("CAST(band AS DECIMAL(38,0)) * band * n_i"))
            .cast("double").as("swwn"))
        val nd = col("n").cast("double")
        val pd = col("r").cast("double") / nd
        val z = (col("swr") - pd * col("swn")) /
          sqrt(pd * (lit(1.0) - pd) *
            (col("swwn") - col("swn") * col("swn") / nd))
        bands
          .select(col("band"), col("n_i"), col("r_i"),
            (col("r_i").cast("double") / col("n_i").cast("double"))
              .as("rate"))
          .crossJoin(broadcast(st.select(z.as("z_trend"),
            (abs(z) > lit(2.576)).as("trend_significant"))))
      },
      Some("""WITH conv AS (
             |  SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
             |    CASE WHEN EXISTS (SELECT 1 FROM orders o
             |                      WHERE o.o_custkey = c.c_custkey
             |                        AND o.o_orderpriority = '1-URGENT')
             |      THEN 1 ELSE 0 END AS y
             |  FROM customer c),
             |bands AS (
             |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_i,
             |    CAST(SUM(y) AS BIGINT) AS r_i
             |  FROM conv GROUP BY band),
             |st AS (
             |  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
             |    CAST(SUM(r_i) AS BIGINT) AS r,
             |    CAST(SUM(CAST(band AS HUGEINT) * r_i) AS DOUBLE) AS swr,
             |    CAST(SUM(CAST(band AS HUGEINT) * n_i) AS DOUBLE) AS swn,
             |    CAST(SUM(CAST(band AS HUGEINT) * band * n_i) AS DOUBLE)
             |      AS swwn
             |  FROM bands),
             |zz AS (
             |  SELECT
             |    (swr - (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * swn)
             |    / sqrt((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (swwn - swn * swn / CAST(n AS DOUBLE))) AS z_trend
             |  FROM st)
             |SELECT b.band, b.n_i, b.r_i,
             |  CAST(b.r_i AS DOUBLE) / CAST(b.n_i AS DOUBLE) AS rate,
             |  zz.z_trend, abs(zz.z_trend) > 2.576 AS trend_significant
             |FROM bands b, zz""".stripMargin)),

    // ----- q249: paired sign-flip permutation test --------------------------
    // Exact nonparametric inference with ZERO distributional math: did
    // per-user spend CHANGE between the two time halves? Under H0 the
    // paired differences are sign-symmetric, so every ± relabeling is
    // equally likely — flip signs by 64 deterministic md5 patterns,
    // recompute ΣT each time, and the p-value is the share of flips at
    // least as extreme as the observed total (with the standard +1
    // add-one). EVERYTHING except p̂ itself is integer arithmetic on
    // the spend-millis grid — |T_m| ≥ |T| is an exact integer compare,
    // so there is no tolerance anywhere in the test. q196 bootstraps a
    // CI; this is its hypothesis-test sibling. Shape: users × 64 rows
    // (linear), one flip-keyed partial agg, a 64-row epilogue.
    NamedQuery(
      "q249_signflip_test",
      (s, d) => {
        val ev = events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("h"),
            when(col("event_type") === "purchase", col("value"))
              .as("spend"))
        val mid = ev.agg(expr("(min(h) + max(h) + 1) div 2").as("mid"))
        val diffs = ev.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg((floor(coalesce(dsum(when(col("h") >= col("mid"),
              col("spend"))), lit(0.0)) * 1000.0) -
            floor(coalesce(dsum(when(col("h") < col("mid"),
              col("spend"))), lit(0.0)) * 1000.0)).cast("long").as("dm"))
        val tObs = diffs.agg(sum(col("dm")).as("t_obs"),
          count(lit(1)).as("n_users"))
        val flips = s.range(0, 64).select(col("id").as("m"))
        val flipped = diffs.crossJoin(broadcast(flips))
          .select(col("m"),
            when(LlmKit.strHash(concat(lit("flip:"),
              col("m").cast("string"), lit(":"),
              col("user_id").cast("string"))) % 2 === 0,
              col("dm")).otherwise(-col("dm")).as("sd"))
          .groupBy(col("m")).agg(sum(col("sd")).as("t_m"))
        val extreme = flipped.crossJoin(broadcast(tObs))
          .agg(sum((abs(col("t_m")) >= abs(col("t_obs"))).cast("long"))
            .as("n_extreme"),
            max(col("t_obs")).as("t_obs"),
            max(col("n_users")).as("n_users"))
        extreme.select(col("n_users"), col("t_obs"), lit(64L).as("m"),
          col("n_extreme"),
          ((col("n_extreme") + 1).cast("double") / lit(65.0))
            .as("p_hat"),
          (((col("n_extreme") + 1).cast("double") / lit(65.0)) <=
            lit(0.05)).as("reject_h0"))
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
             |    CASE WHEN event_type = 'purchase' THEN value END
             |      AS spend
             |  FROM events),
             |mid AS (SELECT (MIN(h) + MAX(h) + 1) // 2 AS mid FROM ev),
             |diffs AS (
             |  SELECT user_id,
             |    CAST(floor(coalesce(${dsumSql(
               "CASE WHEN h >= (SELECT mid FROM mid) THEN spend END")},
               0.0) * 1000.0)
             |      - floor(coalesce(${dsumSql(
               "CASE WHEN h < (SELECT mid FROM mid) THEN spend END")},
               0.0) * 1000.0) AS BIGINT) AS dm
             |  FROM ev GROUP BY user_id),
             |t AS (SELECT CAST(SUM(dm) AS BIGINT) AS t_obs,
             |      CAST(COUNT(*) AS BIGINT) AS n_users FROM diffs),
             |fl AS (
             |  SELECT f.m,
             |    CAST(SUM(CASE WHEN ${LlmKit.strHashSql(
               "concat('flip:', CAST(f.m AS VARCHAR), ':', " +
                 "CAST(d.user_id AS VARCHAR))")} % 2 = 0
             |      THEN d.dm ELSE -d.dm END) AS BIGINT) AS t_m
             |  FROM diffs d, (SELECT unnest(range(0, 64)) AS m) f
             |  GROUP BY f.m),
             |x AS (
             |  SELECT CAST(SUM(CASE WHEN abs(fl.t_m) >= abs(t.t_obs)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
             |    MAX(t.t_obs) AS t_obs, MAX(t.n_users) AS n_users
             |  FROM fl, t)
             |SELECT n_users, t_obs, CAST(64 AS BIGINT) AS m, n_extreme,
             |  CAST(n_extreme + 1 AS DOUBLE) / 65.0 AS p_hat,
             |  CAST(n_extreme + 1 AS DOUBLE) / 65.0 <= 0.05 AS reject_h0
             |FROM x""".stripMargin)),

    // ----- q251: bounce rate with Wilson confidence intervals --------------
    // The proportion with its honest error bars: per stream (a session
    // is attributed to its FIRST event's type), the share of q122-rule
    // sessions that bounced (exactly one event) — and the Wilson 95%
    // interval, which behaves at small n and extreme p where the naive
    // ±z√(pq/n) interval collapses (the reason every serious dashboard
    // uses Wilson). z = 1.96 as a literal; the interval is rational
    // plus one IEEE sqrt, identical trees both engines. Shape: the
    // per-user session window (bounded per-user partitions), one
    // session rollup, a stream-bounded epilogue.
    NamedQuery(
      "q251_bounce_wilson",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wc = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val sess = events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(wc))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(struct(col("ts"), col("event_id"), col("event_type")))
              .getField("event_type").as("first_type"))
        val st = sess.groupBy(col("first_type"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L))
              .as("n_bounce"))
        val nd = col("n_sessions").cast("double")
        val p = col("n_bounce").cast("double") / nd
        val z = lit(1.96)
        val denom = lit(1.0) + z * z / nd
        val center = p + z * z / (lit(2.0) * nd)
        val half = z * sqrt(p * (lit(1.0) - p) / nd +
          z * z / (lit(4.0) * nd * nd))
        st.select(col("first_type").as("event_type"), col("n_sessions"),
          col("n_bounce"), p.as("bounce_rate"),
          ((center - half) / denom).as("wilson_lo"),
          ((center + half) / denom).as("wilson_hi"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |m AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000
             |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS session_id
             |  FROM o),
             |sess AS (
             |  SELECT user_id, session_id,
             |    CAST(COUNT(*) AS BIGINT) AS n_events
             |  FROM m GROUP BY user_id, session_id),
             |fs AS (
             |  SELECT user_id, session_id, event_type AS first_type
             |  FROM (SELECT user_id, session_id, event_type,
             |          row_number() OVER (PARTITION BY user_id, session_id
             |            ORDER BY ts, event_id) AS rn
             |        FROM m) WHERE rn = 1),
             |st AS (
             |  SELECT fs.first_type AS event_type,
             |    CAST(COUNT(*) AS BIGINT) AS n_sessions,
             |    CAST(SUM(CASE WHEN s.n_events = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_bounce
             |  FROM sess s JOIN fs USING (user_id, session_id)
             |  GROUP BY fs.first_type),
             |c AS (
             |  SELECT event_type, n_sessions, n_bounce,
             |    CAST(n_sessions AS DOUBLE) AS nd,
             |    CAST(n_bounce AS DOUBLE) / CAST(n_sessions AS DOUBLE)
             |      AS p
             |  FROM st)
             |SELECT event_type, n_sessions, n_bounce, p AS bounce_rate,
             |  ((p + 1.96 * 1.96 / (2.0 * nd))
             |   - 1.96 * sqrt(p * (1.0 - p) / nd
             |       + 1.96 * 1.96 / (4.0 * nd * nd)))
             |    / (1.0 + 1.96 * 1.96 / nd) AS wilson_lo,
             |  ((p + 1.96 * 1.96 / (2.0 * nd))
             |   + 1.96 * sqrt(p * (1.0 - p) / nd
             |       + 1.96 * 1.96 / (4.0 * nd * nd)))
             |    / (1.0 + 1.96 * 1.96 / nd) AS wilson_hi
             |FROM c""".stripMargin)),

    // ----- q253: windowed SRM gate (batch twin of the streaming op) -------
    // q244 audits the experiment's accumulated assignment; the
    // streaming form [[graft.streaming.StreamOps.srmGate]] watches the
    // SAME statistic per event-time hour window, so an arm-biased
    // logging outage trips the gate in the hour it happens. The
    // registered query runs the IDENTICAL function in batch mode (the
    // q99/q192 twin pattern), putting the streaming operator's logic
    // under the driver's hash gate; StreamOpsSpec separately proves
    // stream == batch on the same chunked input.
    NamedQuery(
      "q253_srm_windows",
      (s, d) => graft.streaming.StreamOps.srmGate(events(s, d)),
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) // 1000000 AS tsec,
             |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm0
             |  FROM events),
             |w AS (
             |  SELECT tsec - (tsec % 3600) AS wsec,
             |    CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(arm0) AS BIGINT) AS n_arm0
             |  FROM ev GROUP BY 1)
             |SELECT strftime(make_timestamp(wsec * 1000000),
             |    '%Y-%m-%d %H:%M:%S') AS window_start,
             |  n, n_arm0, n - n_arm0 AS n_arm1,
             |  (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    * (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS chi2,
             |  (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    * (CAST(n_arm0 AS DOUBLE) - CAST(n - n_arm0 AS DOUBLE))
             |    / CAST(n AS DOUBLE) > 3.841 AS srm_alarm
             |FROM w""".stripMargin)),

    // ----- q259: calibration curve + Brier decomposition ------------------
    // Is the q121/q246 click-count predictor's probability CALIBRATED —
    // does "p̂ = 0.3" convert 30% of the time? The reliability diagram
    // (per-bin mean prediction vs empirical rate) plus the
    // Murphy (1973) Brier decomposition REL − RES + UNC. Prediction
    // p̂ = min(1, clicks/10), so the bin IS the capped click count —
    // eleven integer bins, no float binning. The OUTCOME is q178's
    // high-value conversion (ever purchased with value > 150), not bare
    // purchase: at small SF every sampled user purchases at least once,
    // which collapses emp_rate/base_rate to 1.0 on every row and zeroes
    // the resolution term — the decomposition would certify a tautology
    // and half the output columns would never render a non-trivial
    // value (r11 lesson; same hazard class as q248).
    //   p̄_b − ȳ_b = (sc_b − 10·Y_b)/(10·n_b)   → rel_fac = sc_b·n̂ form
    //   ȳ_b − ȳ   = (Y_b·N − Y·n_b)/(n_b·N)    → res_fac = Y_b·N − Y·n_b
    //   Brier     = Σ_u (sc_u − 10·y_u)² / (100·N) — integer numerator
    // The decomposition ships as UNSQUARED per-bin integer factors
    // (rel_fac = bin·n_b − 10·Y_b, res_fac = Y_b·N − Y·n_b) plus the
    // grand totals nt/yt, all BIGINT: a summed double Σ would
    // hash-mismatch on engine-order ulps, and the r11 SQUARED variant
    // needed a DECIMAL(38,0) column whose all-zero rendering was the
    // only hash-red row of the round — and, per the round-11 advisor,
    // its rel_num square silently wraps BIGINT once a bin holds ~1e9
    // users. The factors are overflow-safe to any realistic corpus
    // (|rel_fac| ≤ 10·n_b; |res_fac| ≤ Y_b·N ≤ N², exact in BIGINT to
    // N ≈ 3e9 users — past that, the (nt, yt, n_pos, n_users) columns
    // alone reconstruct RES exactly without any wide product).
    // The global Brier score and base rate broadcast onto every row as
    // single identical IEEE divisions. Scale shape: one user-level
    // aggregate (the q246 perUser), one 11-bin rollup, one 3-scalar
    // broadcast — no window, no sort.
    NamedQuery(
      "q259_calibration",
      (s, d) => {
        val perUser = events(s, d)
          .groupBy(col("user_id"))
          .agg(least(lit(10L),
              sum(when(col("event_type") === "click", 1L).otherwise(0L)))
              .as("sc"),
            max(when(col("event_type") === "purchase" &&
                col("value") > 150.0, 1L).otherwise(0L))
              .as("y"))
        val bins = perUser.groupBy(col("sc").as("bin"))
          .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_pos"),
            sum((col("sc") - lit(10L) * col("y")) *
              (col("sc") - lit(10L) * col("y"))).as("bin_brier_num"))
        val tot = bins.agg(sum(col("n_users")).as("nt"),
          sum(col("n_pos")).as("yt"), sum(col("bin_brier_num")).as("bn"))
        bins.crossJoin(broadcast(tot))
          .select(col("bin"), col("n_users"), col("n_pos"),
            col("nt"), col("yt"),
            ((col("bin") * col("n_users")).cast("double") /
              (lit(10.0) * col("n_users").cast("double"))).as("mean_pred"),
            (col("n_pos").cast("double") / col("n_users").cast("double"))
              .as("emp_rate"),
            (col("bin") * col("n_users") - lit(10L) * col("n_pos"))
              .as("rel_fac"),
            (col("n_pos") * col("nt") - col("yt") * col("n_users"))
              .as("res_fac"),
            (col("bn").cast("double") /
              (lit(100.0) * col("nt").cast("double"))).as("brier"),
            (col("yt").cast("double") / col("nt").cast("double"))
              .as("base_rate"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(LEAST(10, SUM(CASE WHEN event_type = 'click'
             |                            THEN 1 ELSE 0 END)) AS BIGINT)
             |      AS sc,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |             THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |b AS (
             |  SELECT sc AS bin, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(y) AS BIGINT) AS n_pos,
             |    CAST(SUM((sc - 10*y) * (sc - 10*y)) AS BIGINT)
             |      AS bin_brier_num
             |  FROM u GROUP BY sc),
             |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nt,
             |        CAST(SUM(n_pos) AS BIGINT) AS yt,
             |        CAST(SUM(bin_brier_num) AS BIGINT) AS bn FROM b)
             |SELECT b.bin, b.n_users, b.n_pos, t.nt, t.yt,
             |  CAST(b.bin * b.n_users AS DOUBLE)
             |    / (10.0 * CAST(b.n_users AS DOUBLE)) AS mean_pred,
             |  CAST(b.n_pos AS DOUBLE) / CAST(b.n_users AS DOUBLE)
             |    AS emp_rate,
             |  CAST(b.bin * b.n_users - 10 * b.n_pos AS BIGINT) AS rel_fac,
             |  CAST(b.n_pos * t.nt - t.yt * b.n_users AS BIGINT) AS res_fac,
             |  CAST(t.bn AS DOUBLE) / (100.0 * CAST(t.nt AS DOUBLE))
             |    AS brier,
             |  CAST(t.yt AS DOUBLE) / CAST(t.nt AS DOUBLE) AS base_rate
             |FROM b, t""".stripMargin)),

    // ----- q268: doubly-robust off-policy evaluation ----------------------
    // q200 scores the counterfactual policy with pure importance
    // weighting (IPS) — unbiased but high-variance where the logging
    // policy rarely takes the target's actions. The doubly-robust
    // estimator (Dudík, Langford & Li, ICML 2011) adds a reward MODEL
    // and keeps IPS only for the model's residuals:
    //   V_DR = Σ_a π(a)·q̂(a)  +  (1/n)·Σ_i w(a_i)·(r_i − q̂(a_i))
    // — unbiased if EITHER the model or the propensities are right.
    // Honest protocol: q̂(a) is the per-action mean reward on the
    // even-event_id HALF, evaluation runs on the odd half (the split
    // keeps the model's errors independent of the residuals it
    // corrects); propensities are the eval half's empirical action
    // frequencies, target policy = q200's uniform-over-{click,purchase}.
    // Output: the direct-method, IPS and DR values side by side with
    // the correction term — the spread IS the diagnosis (DM≈DR ⇒ model
    // trusted; big correction ⇒ leaning on propensities). Arithmetic:
    // per-action exact rollups (dsum), doubles only in fixed-order
    // ratios — the q200 determinism discipline. Scale: two 5-row
    // action aggregates from one events pass; everything downstream is
    // action-grid-sized.
    NamedQuery(
      "q268_dr_offpolicy",
      (s, d) => {
        val ev = events(s, d).select(col("event_id"), col("event_type"),
          col("value"))
        def half(mod: Int): DataFrame =
          ev.filter(col("event_id") % 2 === mod)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("na"), dsum(col("value")).as("sr"))
        val model = half(0).select(col("event_type"),
          col("na").as("nm"),
          (col("sr") / col("na").cast("double")).as("qhat"))
        val eval_ = half(1)
        val nEval = eval_.agg(sum(col("na")).as("n_eval"))
        val nModel = model.agg(sum(col("nm")).as("n_model"))
        val joined = eval_.join(model.select(col("event_type"),
            col("qhat")), Seq("event_type"))
          .crossJoin(broadcast(nEval))
          .select(col("event_type"), col("na"), col("sr"), col("qhat"),
            col("n_eval"),
            when(col("event_type").isin("click", "purchase"),
              lit(0.5) * col("n_eval").cast("double") /
                col("na").cast("double"))
              .otherwise(lit(0.0)).as("w"),
            when(col("event_type").isin("click", "purchase"), lit(0.5))
              .otherwise(lit(0.0)).as("pi"))
        joined.groupBy()
          .agg(max(col("n_eval")).as("n_eval"),
            dsum(col("pi") * col("qhat")).as("v_dm"),
            dsum(col("sr") * col("w")).as("rw"),
            dsum((col("sr") - col("na").cast("double") * col("qhat")) *
              col("w")).as("resid"))
          .crossJoin(broadcast(nModel))
          .select(col("n_model"), col("n_eval"), col("v_dm"),
            (col("rw") / col("n_eval").cast("double")).as("v_ips"),
            (col("resid") / col("n_eval").cast("double"))
              .as("dr_correction"),
            (col("v_dm") +
              col("resid") / col("n_eval").cast("double")).as("v_dr"))
      },
      Some(s"""WITH m AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nm,
             |    ${dsumSql("value")} / CAST(COUNT(*) AS DOUBLE) AS qhat
             |  FROM events WHERE event_id % 2 = 0 GROUP BY event_type),
             |e AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS na,
             |    ${dsumSql("value")} AS sr
             |  FROM events WHERE event_id % 2 = 1 GROUP BY event_type),
             |ne AS (SELECT CAST(SUM(na) AS BIGINT) AS n_eval FROM e),
             |nm AS (SELECT CAST(SUM(nm) AS BIGINT) AS n_model FROM m),
             |j AS (
             |  SELECT e.event_type, e.na, e.sr, m.qhat, ne.n_eval,
             |    CASE WHEN e.event_type IN ('click', 'purchase')
             |      THEN 0.5 * CAST(ne.n_eval AS DOUBLE)
             |           / CAST(e.na AS DOUBLE)
             |      ELSE 0.0 END AS w,
             |    CASE WHEN e.event_type IN ('click', 'purchase')
             |      THEN 0.5 ELSE 0.0 END AS pi
             |  FROM e JOIN m USING (event_type) CROSS JOIN ne),
             |agg AS (
             |  SELECT MAX(n_eval) AS n_eval,
             |    ${dsumSql("pi * qhat")} AS v_dm,
             |    ${dsumSql("sr * w")} AS rw,
             |    ${dsumSql("(sr - CAST(na AS DOUBLE) * qhat) * w")}
             |      AS resid
             |  FROM j)
             |SELECT nm.n_model, a.n_eval, a.v_dm,
             |  a.rw / CAST(a.n_eval AS DOUBLE) AS v_ips,
             |  a.resid / CAST(a.n_eval AS DOUBLE) AS dr_correction,
             |  a.v_dm + a.resid / CAST(a.n_eval AS DOUBLE) AS v_dr
             |FROM agg a CROSS JOIN nm""".stripMargin)),

    // ----- q271: Markov removal-effect attribution ------------------------
    // Multi-touch attribution the principled way (Anderl et al.,
    // "Mapping the customer journey", 2014 — the removal-effect model):
    // build the first-order Markov chain over observed journeys
    // (START → channel states → CONV on first purchase, DROP on exit),
    // then credit each channel by how much the chain's conversion
    // probability falls when that channel is knocked out (transitions
    // INTO it redirect to DROP — paths through it fail; probabilities
    // are NOT renormalized, per the model). Absorption probabilities
    // come from an 8-step truncated power iteration — documented
    // truncation, identical in both engines: transition probabilities
    // are single double divisions of exact counts, every mass update is
    // a dsum (the 6-decimal grid), and the five chain variants
    // (full + one removal per channel) iterate as ONE variant-keyed
    // table so the plan is five tiny chains, not five queries. Scale:
    // the journey pass is one user-partitioned window over events
    // (linear); everything after lives on a ≤ |states|² × variants
    // table — state-bounded, the whole point of Markov attribution vs
    // path enumeration.
    NamedQuery(
      "q271_markov_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val channels = Seq("signup", "error", "click", "view")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("rn", row_number().over(w))
        val firstP = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
        val kept = ev.join(firstP, Seq("user_id"), "left")
          .filter(col("prn").isNull || col("rn") <= col("prn"))
          .select(col("user_id"), col("rn"),
            when(col("event_type") === "purchase", lit("CONV"))
              .otherwise(col("event_type")).as("st"))
        val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
        val nxt = kept.withColumn("nxt", lead(col("st"), 1).over(w2))
        val trans = nxt.filter(col("rn") === 1)
            .select(lit("START").as("from_s"), col("st").as("to_s"))
          .unionByName(nxt.filter(col("nxt").isNotNull)
            .select(col("st").as("from_s"), col("nxt").as("to_s")))
          .unionByName(nxt.filter(col("nxt").isNull &&
              col("st") =!= "CONV")
            .select(col("st").as("from_s"), lit("DROP").as("to_s")))
          .groupBy(col("from_s"), col("to_s"))
          .agg(count(lit(1)).as("c"))
        val tot = trans.groupBy(col("from_s"))
          .agg(sum(col("c")).as("t"))
        val tpBase = trans.join(tot, Seq("from_s"))
          .select(col("from_s"), col("to_s"),
            (col("c").cast("double") / col("t").cast("double")).as("p"))
          .persist()
        def variant(name: String, removed: Option[String]): DataFrame =
          removed match {
            case None => tpBase.select(lit(name).as("variant"),
              col("from_s"), col("to_s"), col("p"))
            case Some(c) => tpBase.filter(col("from_s") =!= c)
              .select(lit(name).as("variant"), col("from_s"),
                when(col("to_s") === c, lit("DROP")).otherwise(col("to_s"))
                  .as("to_s"), col("p"))
          }
        val variants = (variant("full", None) +:
          channels.map(c => variant(c, Some(c))))
          .reduce(_.unionByName(_))
          .groupBy(col("variant"), col("from_s"), col("to_s"))
          .agg(dsum(col("p")).as("p")) // collapse redirected collisions
        val names = "full" +: channels
        val loops = names.flatMap(v => Seq(("CONV", v), ("DROP", v)))
          .toDF("st", "variant")
          .select(col("variant"), col("st").as("from_s"),
            col("st").as("to_s"), lit(1.0).as("p"))
        // The 8 absorption steps iterate a states×variants mass vector
        // against the ≤(states²×variants)-row chain — both bounded, so
        // the power iteration runs on the DRIVER over the collected
        // chain (the round-9 constant-cost lesson; this loop's 8 pinned
        // rounds were pure plan/job constants — the r12 scaladoc below
        // measured 20 s unpinned vs ~2 s pinned, and the driver fold
        // removes even the ~2 s). Arithmetic is identical to the
        // oracle's CTE steps: each incoming mass·p product is one IEEE
        // multiply and the per-(variant,state) sum is the 6-decimal
        // dsum grid via java.math HALF_UP — the exact rounding Spark's
        // double→DECIMAL(28,6) cast applies. Join semantics preserved:
        // states with no outgoing row drop from the vector, exactly as
        // the inner join dropped them.
        // audited: this collect's subtree holds the query's only events
        // scans — recorded for the scan gate without a checkpoint job
        val tpRows = OpsKit.audited(variants.unionByName(loops)).collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getDouble(3)))
        def q6(x: Double): BigDecimal =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        var vMap: Map[(String, String), Double] =
          names.map(n => (n, "START") -> 1.0).toMap
        for (_ <- 1 to 8) {
          val next = scala.collection.mutable.Map
            .empty[(String, String), BigDecimal]
          for ((variant, from, to, p) <- tpRows;
               m <- vMap.get((variant, from)))
            next((variant, to)) =
              next.getOrElse((variant, to), BigDecimal(0)) + q6(m * p)
          vMap = next.iterator.map { case (k, s) => k -> s.toDouble }.toMap
        }
        val pFullOpt = vMap.get(("full", "CONV"))
        val remRows = for {
          pFull <- pFullOpt.toSeq
          c <- channels.sorted
          pRem <- vMap.get((c, "CONV"))
        } yield (c, pFull, pRem, math.max(0.0, 1.0 - pRem / pFull))
        val rt = remRows.map { case (_, _, _, r) => q6(r) }.sum.toDouble
        import s.implicits._
        remRows.map { case (c, pFull, pRem, r) =>
          (c, pFull, pRem, r, if (rt > 0) r / rt else 0.0)
        }.toDF("channel", "p_full", "p_removed", "removal_effect",
          "attribution_share")
      },
      Some {
        val channels = Seq("signup", "error", "click", "view")
        val variantsSql = (
          s"""SELECT 'full' AS variant, from_s, to_s, p FROM tpbase""" +:
          channels.map(c =>
            s"""SELECT '$c', from_s,
               |  CASE WHEN to_s = '$c' THEN 'DROP' ELSE to_s END, p
               |FROM tpbase WHERE from_s <> '$c'""".stripMargin))
          .mkString("\n  UNION ALL\n  ")
        val loopsSql = ("full" +: channels).flatMap(v =>
          Seq(s"SELECT '$v' AS variant, 'CONV' AS from_s, 'CONV' AS to_s, CAST(1.0 AS DOUBLE) AS p",
            s"SELECT '$v', 'DROP', 'DROP', CAST(1.0 AS DOUBLE)"))
          .mkString("\n  UNION ALL\n  ")
        val steps = (1 to 8).map { k =>
          s"""v$k AS (
             |  SELECT v.variant, tp.to_s AS state,
             |    ${dsumSql("v.mass * tp.p")} AS mass
             |  FROM v${k - 1} v JOIN tp
             |    ON tp.variant = v.variant AND tp.from_s = v.state
             |  GROUP BY v.variant, tp.to_s)""".stripMargin
        }.mkString(",\n")
        s"""WITH ev AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS rn
           |  FROM events),
           |fp AS (SELECT user_id, MIN(rn) AS prn FROM ev
           |       WHERE event_type = 'purchase' GROUP BY user_id),
           |kept AS (
           |  SELECT e.user_id, e.rn,
           |    CASE WHEN e.event_type = 'purchase' THEN 'CONV'
           |         ELSE e.event_type END AS st
           |  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
           |  WHERE fp.prn IS NULL OR e.rn <= fp.prn),
           |nx AS (
           |  SELECT user_id, rn, st,
           |    lead(st) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
           |  FROM kept),
           |trans AS (
           |  SELECT from_s, to_s, CAST(COUNT(*) AS BIGINT) AS c FROM (
           |    SELECT 'START' AS from_s, st AS to_s FROM nx WHERE rn = 1
           |    UNION ALL
           |    SELECT st, nxt FROM nx WHERE nxt IS NOT NULL
           |    UNION ALL
           |    SELECT st, 'DROP' FROM nx
           |    WHERE nxt IS NULL AND st <> 'CONV')
           |  GROUP BY 1, 2),
           |tot AS (SELECT from_s, CAST(SUM(c) AS BIGINT) AS t
           |        FROM trans GROUP BY 1),
           |tpbase AS (
           |  SELECT trans.from_s, trans.to_s,
           |    CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
           |  FROM trans JOIN tot USING (from_s)),
           |variants AS (
           |  $variantsSql),
           |tp AS (
           |  SELECT variant, from_s, to_s, ${dsumSql("p")} AS p
           |  FROM variants GROUP BY 1, 2, 3
           |  UNION ALL
           |  $loopsSql),
           |v0 AS (
           |  SELECT variant, 'START' AS state, CAST(1.0 AS DOUBLE) AS mass
           |  FROM (SELECT DISTINCT variant FROM tp)),
           |$steps,
           |pconv AS (SELECT variant, mass AS p_conv FROM v8
           |          WHERE state = 'CONV'),
           |fullp AS (SELECT p_conv AS p_full FROM pconv
           |          WHERE variant = 'full'),
           |rem AS (
           |  SELECT p.variant AS channel, f.p_full,
           |    p.p_conv AS p_removed,
           |    greatest(CAST(0.0 AS DOUBLE),
           |      CAST(1.0 AS DOUBLE) - p.p_conv / f.p_full) AS removal
           |  FROM pconv p CROSS JOIN fullp f WHERE p.variant <> 'full'),
           |rt AS (SELECT ${dsumSql("removal")} AS rt FROM rem)
           |SELECT channel, p_full, p_removed, removal AS removal_effect,
           |  CASE WHEN rt.rt > 0 THEN removal / rt.rt
           |       ELSE CAST(0.0 AS DOUBLE) END AS attribution_share
           |FROM rem CROSS JOIN rt""".stripMargin
      }),

    // ----- q272: exact Shapley-value channel attribution ------------------
    // q271's Markov removal effects are one attribution model; the
    // other canonical one is the Shapley value (Shapley 1953) over
    // channel coalitions — the UNIQUE credit split satisfying
    // efficiency/symmetry/dummy. Exact, not sampled: with 4 channels
    // (click/view/signup/error — purchase is the OUTCOME) there are
    // only 16 coalitions, so the full sum runs over a 16-row table.
    // Channel exposure is the EARLY JOURNEY (a user's first 4 events by
    // ts): "ever touched" is degenerate on this data — every sf0.01
    // user touches all four types eventually (measured; the q259
    // all-ones lesson applied at design time) — while the first-4 mask
    // spreads users over all 15 nonempty coalitions. v(S) = converted
    // users (high-value purchase, q178's outcome) whose early mask ⊆ S:
    // the conversions coalition S can claim end-to-end. Shapley with
    // n=4: φ_i = (1/24)·Σ_{S∌i} |S|!·(3−|S|)!·[v(S∪i)−v(S)] — weights
    // {6,2,2,6} by |S|, φ ships as the exact BIGINT numerator φ_num
    // (= 24·φ) plus the single-division double. Efficiency invariant
    // Σφ_num = 24·(v(full) − v(∅)) is spec-asserted — v(∅) counts
    // converters whose first 4 events contain NO channel type (mask 0
    // ⊆ every S), so it need not be zero; both grand-coalition values
    // ship (v_full, v_empty) and `share` normalizes by their
    // difference, so the four shares sum to 1 whenever the game is
    // non-degenerate. Scale shape: one per-user window (partitioned by
    // user_id — linear), one ≤16-row mask rollup; everything
    // downstream lives on broadcast 16-row tables.
    NamedQuery(
      "q272_shapley_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        def early(t: String): org.apache.spark.sql.Column =
          max(when(col("rn") <= 4 && col("event_type") === t, 1L)
            .otherwise(0L))
        val u = events(s, d)
          .select(col("user_id"), col("event_type"), col("value"),
            col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg((early("click") + lit(2L) * early("view") +
            lit(4L) * early("signup") + lit(8L) * early("error"))
            .as("mask"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150.0, 1L).otherwise(0L)).as("conv"))
        val mc = u.groupBy(col("mask")).agg(sum(col("conv")).as("nc"))
        val coal = s.range(16).select(col("id").as("sset"))
        // pinned: the 16-row coalition-value table is read twice by
        // the marginal join (v and v1) — one corpus rollup, not two
        val vS = OpsKit.pinned(coal.join(broadcast(mc),
            col("mask").bitwiseAND(col("sset")) === col("mask"), "left")
          .groupBy(col("sset"))
          .agg(coalesce(sum(col("nc")), lit(0L)).as("v")))
        val ch = s.range(4).select(
          when(col("id") === 0, "click").when(col("id") === 1, "view")
            .when(col("id") === 2, "signup").otherwise("error")
            .as("channel"),
          when(col("id") === 0, 1L).when(col("id") === 1, 2L)
            .when(col("id") === 2, 4L).otherwise(8L).as("bit"))
        val terms = ch.crossJoin(broadcast(vS))
          .filter(col("sset").bitwiseAND(col("bit")) === 0)
          .join(broadcast(vS.select(col("sset").as("s1"),
            col("v").as("v1"))),
            col("s1") === col("sset").bitwiseOR(col("bit")))
          .withColumn("wgt",
            when(expr("bit_count(sset)") === 0, 6L)
              .when(expr("bit_count(sset)") === 3, 6L).otherwise(2L))
        val phi = terms.groupBy(col("channel"))
          .agg(sum(col("wgt") * (col("v1") - col("v"))).as("phi_num"))
        val tot = vS.agg(
          max(when(col("sset") === 15, col("v"))).as("v_full"),
          max(when(col("sset") === 0, col("v"))).as("v_empty"))
        phi.crossJoin(broadcast(tot))
          .select(col("channel"), col("phi_num"),
            (col("phi_num").cast("double") / lit(24.0)).as("phi"),
            col("v_full"), col("v_empty"),
            when(col("v_full") - col("v_empty") > 0,
              col("phi_num").cast("double") /
                (lit(24.0) *
                  (col("v_full") - col("v_empty")).cast("double")))
              .otherwise(lit(0.0)).as("share"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts, event_id) AS rn
             |  FROM events),
             |u AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN rn <= 4 AND event_type = 'click'
             |             THEN 1 ELSE 0 END)
             |    + 2 * MAX(CASE WHEN rn <= 4 AND event_type = 'view'
             |              THEN 1 ELSE 0 END)
             |    + 4 * MAX(CASE WHEN rn <= 4 AND event_type = 'signup'
             |              THEN 1 ELSE 0 END)
             |    + 8 * MAX(CASE WHEN rn <= 4 AND event_type = 'error'
             |              THEN 1 ELSE 0 END) AS mask,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |             THEN 1 ELSE 0 END) AS conv
             |  FROM r GROUP BY user_id),
             |mc AS (SELECT mask, CAST(SUM(conv) AS BIGINT) AS nc
             |       FROM u GROUP BY mask),
             |coal AS (SELECT CAST(range AS BIGINT) AS sset
             |         FROM range(0, 16)),
             |vs AS (
             |  SELECT c.sset, CAST(COALESCE(SUM(m.nc), 0) AS BIGINT) AS v
             |  FROM coal c LEFT JOIN mc m ON (m.mask & c.sset) = m.mask
             |  GROUP BY c.sset),
             |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
             |         ('view', CAST(2 AS BIGINT)),
             |         ('signup', CAST(4 AS BIGINT)),
             |         ('error', CAST(8 AS BIGINT))) AS t(channel, bit)),
             |terms AS (
             |  SELECT ch.channel,
             |    CASE WHEN bit_count(s0.sset) IN (0, 3) THEN 6
             |         ELSE 2 END AS wgt,
             |    s1.v - s0.v AS dv
             |  FROM ch JOIN vs s0 ON (s0.sset & ch.bit) = 0
             |  JOIN vs s1 ON s1.sset = (s0.sset | ch.bit)),
             |phi AS (SELECT channel, CAST(SUM(wgt * dv) AS BIGINT)
             |          AS phi_num
             |        FROM terms GROUP BY channel),
             |tot AS (SELECT MAX(CASE WHEN sset = 15 THEN v END) AS v_full,
             |               MAX(CASE WHEN sset = 0 THEN v END) AS v_empty
             |        FROM vs)
             |SELECT channel, phi_num,
             |  CAST(phi_num AS DOUBLE) / 24.0 AS phi, v_full, v_empty,
             |  CASE WHEN (v_full - v_empty) > 0
             |       THEN CAST(phi_num AS DOUBLE)
             |            / (24.0 * CAST(v_full - v_empty AS DOUBLE))
             |       ELSE 0.0 END AS share
             |FROM phi CROSS JOIN tot""".stripMargin)),

    // ----- q274: split-conformal prediction intervals ---------------------
    // Distribution-free uncertainty for the per-type value predictor:
    // fit μ_t on the even-event_id half, score residuals |v − μ_t| on
    // the odd half, and take the per-type conformal quantile q̂_t = the
    // ⌈(n_cal+1)(1−α)⌉-th smallest calibration residual (α = 0.1) —
    // the split-conformal guarantee (Vovk et al. 2005; Lei et al. 2018)
    // that a FRESH point's residual exceeds q̂_t with probability ≤ α,
    // assuming exchangeability. The quantile is selected by VALUE, not
    // by row: rank k over distinct residuals' cumulative counts, so
    // tie order between equal doubles can't change the answer in
    // either engine. μ_t is davg (exact decimal sum, one IEEE
    // division), residuals are single-subtraction doubles — both
    // engines bit-match. The model-half coverage audit ships in-result
    // (n_train_cov / n_train): optimistic by construction (μ was fit
    // on it) but the cheap sanity that the interval isn't absurd.
    // Scale shape: two per-type aggregates, a broadcast μ join, one
    // per-type-partitioned window over DISTINCT residual values —
    // linear, no global sort.
    NamedQuery(
      "q274_conformal",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("event_id"), col("event_type"),
          col("value"))
        val train = ev.filter(col("event_id") % 2 === 0)
        // the 5-row per-type tables (mu, nk, q) are each referenced
        // 2-3 times downstream; pinned, the corpus is scanned 4 times
        // total instead of 26
        val mu = OpsKit.pinned(train.groupBy(col("event_type"))
          .agg(davg(col("value")).as("mu"),
            count(lit(1)).as("n_train")))
        val cal = ev.filter(col("event_id") % 2 === 1)
          .join(broadcast(mu.select(col("event_type"), col("mu"))),
            Seq("event_type"))
          .select(col("event_type"), abs(col("value") - col("mu"))
            .as("r"))
        val nk = OpsKit.pinned(cal.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_cal"))
          .withColumn("k_rank", expr("((n_cal + 1) * 9 + 9) div 10")))
        val cum = cal.groupBy(col("event_type"), col("r"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy(col("event_type")).orderBy(col("r"))))
        val q = OpsKit.pinned(cum.join(broadcast(nk), Seq("event_type"))
          .filter(col("cum") >= col("k_rank"))
          .groupBy(col("event_type")).agg(min(col("r")).as("qhat")))
        val cov = train
          .join(broadcast(mu.select(col("event_type"), col("mu"))),
            Seq("event_type"))
          .join(broadcast(q), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(sum(when(abs(col("value") - col("mu")) <= col("qhat"),
            1L).otherwise(0L)).as("n_train_cov"))
        nk.join(q, Seq("event_type"))
          .join(mu.select(col("event_type"), col("n_train")),
            Seq("event_type"))
          .join(cov, Seq("event_type"))
          .select(col("event_type"), col("n_cal"), col("k_rank"),
            col("qhat"), col("n_train"), col("n_train_cov"),
            (col("n_train_cov").cast("double") /
              col("n_train").cast("double")).as("train_cov"))
      },
      Some(s"""WITH tr AS (
             |  SELECT event_type, value FROM events
             |  WHERE event_id % 2 = 0),
             |mu AS (
             |  SELECT event_type, ${davgSql("value")} AS mu,
             |    CAST(COUNT(*) AS BIGINT) AS n_train
             |  FROM tr GROUP BY event_type),
             |cal AS (
             |  SELECT e.event_type, abs(e.value - mu.mu) AS r
             |  FROM events e JOIN mu USING (event_type)
             |  WHERE e.event_id % 2 = 1),
             |nk AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
             |    CAST(((COUNT(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k_rank
             |  FROM cal GROUP BY event_type),
             |rv AS (SELECT event_type, r, COUNT(*) AS c
             |       FROM cal GROUP BY event_type, r),
             |cum AS (
             |  SELECT event_type, r,
             |    SUM(c) OVER (PARTITION BY event_type ORDER BY r) AS cum
             |  FROM rv),
             |q AS (
             |  SELECT c.event_type, MIN(c.r) AS qhat
             |  FROM cum c JOIN nk USING (event_type)
             |  WHERE c.cum >= nk.k_rank GROUP BY c.event_type),
             |cov AS (
             |  SELECT tr.event_type,
             |    CAST(SUM(CASE WHEN abs(tr.value - mu.mu) <= q.qhat
             |             THEN 1 ELSE 0 END) AS BIGINT) AS n_train_cov
             |  FROM tr JOIN mu USING (event_type)
             |  JOIN q USING (event_type)
             |  GROUP BY tr.event_type)
             |SELECT nk.event_type, nk.n_cal, nk.k_rank, q.qhat,
             |  mu.n_train, cov.n_train_cov,
             |  CAST(cov.n_train_cov AS DOUBLE)
             |    / CAST(mu.n_train AS DOUBLE) AS train_cov
             |FROM nk JOIN q USING (event_type)
             |JOIN mu USING (event_type)
             |JOIN cov USING (event_type)""".stripMargin)),

    // ----- q279: isotonic calibration (PAV via the minimax identity) ------
    // q259 DIAGNOSES miscalibration; this REPAIRS it: the isotonic
    // regression fit g(bin) = the monotone function closest to the
    // per-bin empirical rates in L², i.e. what Platt's competitor —
    // isotonic calibration — would deploy. Instead of the sequential
    // pool-adjacent-violators walk (inherently serial), the fit is
    // computed by the MINIMAX IDENTITY (Robertson, Wright & Dykstra
    // 1988, Thm 1.4.4): g(k) = max_{i≤k} min_{j≥k} mean(y on bins
    // i..j) — a closed form over O(B³) (bin, range) combinations, and
    // B ≤ 11 here, so the whole lattice is three broadcast joins over
    // tables the size of the diagram. Weighted correctly by
    // construction: range means use POOLED counts Y/N, not bin-mean
    // averages. Prefix-free: range sums come from a bins×bins
    // containment join, so there is no window anywhere (the bins table
    // derives from a count-valued key the plan guard can't bound
    // through a window, and at B ≤ 11 a join is cheaper anyway).
    // Means are single IEEE divisions; min/max over identical doubles
    // — engine-exact. The spec replays the sequential PAV walk and
    // asserts equality, which is exactly the textbook theorem.
    NamedQuery(
      "q279_isotonic_calibration",
      (s, d) => {
        val perUser = events(s, d)
          .groupBy(col("user_id"))
          .agg(least(lit(10L),
              sum(when(col("event_type") === "click", 1L).otherwise(0L)))
              .as("sc"),
            max(when(col("event_type") === "purchase" &&
                col("value") > 150.0, 1L).otherwise(0L))
              .as("y"))
        // pinned: the ≤11-row bin table is referenced five times below
        // (ranges twice, rsum, inner, final) — without the pin each
        // reference re-runs the corpus-wide user rollup
        val bins = OpsKit.pinned(perUser.groupBy(col("sc").as("bin"))
          .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_pos")))
        val ranges = bins.select(col("bin").as("i"))
          .crossJoin(broadcast(bins.select(col("bin").as("j"))))
          .filter(col("i") <= col("j"))
        val rsum = ranges
          .join(broadcast(bins), col("bin") >= col("i") &&
            col("bin") <= col("j"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("n_users")).as("nn"), sum(col("n_pos")).as("yy"))
          .withColumn("m",
            col("yy").cast("double") / col("nn").cast("double"))
        val inner = bins.select(col("bin").as("k"))
          .join(broadcast(rsum), col("i") <= col("k") &&
            col("k") <= col("j"))
          .groupBy(col("k"), col("i")).agg(min(col("m")).as("mn"))
        val fit = inner.groupBy(col("k")).agg(max(col("mn")).as("iso_fit"))
        bins.join(broadcast(fit), col("bin") === col("k"))
          .select(col("bin"), col("n_users"), col("n_pos"),
            (col("n_pos").cast("double") / col("n_users").cast("double"))
              .as("emp_rate"),
            col("iso_fit"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(LEAST(10, SUM(CASE WHEN event_type = 'click'
             |                            THEN 1 ELSE 0 END)) AS BIGINT)
             |      AS sc,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |             THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |b AS (
             |  SELECT sc AS bin, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(y) AS BIGINT) AS n_pos
             |  FROM u GROUP BY sc),
             |rsum AS (
             |  SELECT r.i, r.j, CAST(SUM(b.n_users) AS BIGINT) AS nn,
             |    CAST(SUM(b.n_pos) AS BIGINT) AS yy
             |  FROM (SELECT i.bin AS i, j.bin AS j
             |        FROM b i, b j WHERE i.bin <= j.bin) r
             |  JOIN b ON b.bin >= r.i AND b.bin <= r.j
             |  GROUP BY r.i, r.j),
             |inner_ AS (
             |  SELECT k.bin AS k, r.i,
             |    MIN(CAST(r.yy AS DOUBLE) / CAST(r.nn AS DOUBLE)) AS mn
             |  FROM b k JOIN rsum r ON r.i <= k.bin AND k.bin <= r.j
             |  GROUP BY k.bin, r.i),
             |fit AS (SELECT k, MAX(mn) AS iso_fit FROM inner_ GROUP BY k)
             |SELECT b.bin, b.n_users, b.n_pos,
             |  CAST(b.n_pos AS DOUBLE) / CAST(b.n_users AS DOUBLE)
             |    AS emp_rate,
             |  f.iso_fit
             |FROM b JOIN fit f ON f.k = b.bin""".stripMargin)),

    // ----- q281: group-sequential A/B monitoring (O'Brien–Fleming) --------
    // q178 tests ONCE at the end; real experiments peek. Uncorrected
    // peeking inflates false positives (the "p < 0.05 eventually"
    // fallacy), so interim looks test against the O'Brien–Fleming
    // spending boundaries — stringent early, near-nominal at the final
    // look. Enrollment is STAGGERED the way real experiments fill:
    // each user enters at a deterministic md5-derived look (entry =
    // 1 + md5(user_id) % 5), so look k analyzes the users with
    // entry ≤ k — the information fraction genuinely grows ~k/5 (an
    // event_id prefix cut would not: the generator round-robins
    // users, so every user appears in the first 2% of events).
    // Conversion is the high-value outcome over the user's full
    // history, arms by user parity (an honest A/A — the boundary
    // should NOT cross), and the z statistic is q178's
    // pooled-variance expression verbatim — integer counts into one
    // sqrt. Boundary literals for K = 5, α = .05 two-sided (Jennison
    // & Turnbull 2000, Table 2.3: 4.562 3.226 2.634 2.281 2.040 —
    // fixed-decimal literals, no quantile function). Scale: one
    // user-rollup pass (linear), ×5 broadcast look expansion on the
    // users-sized aggregate, 5-row epilogue.
    NamedQuery(
      "q281_group_sequential",
      (s, d) => {
        val perUser = events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 150.0, 1L).otherwise(0L)).as("conv"))
          .withColumn("arm0", (pmod(col("user_id"), lit(2L)) === 0L)
            .cast("long"))
          .withColumn("entry",
            pmod(LlmKit.strHash(col("user_id").cast("string")),
              lit(5L)) + lit(1L))
        val looks = s.range(1, 6).select(col("id").as("look"),
          when(col("id") === 1, 4.562).when(col("id") === 2, 3.226)
            .when(col("id") === 3, 2.634).when(col("id") === 4, 2.281)
            .otherwise(2.040).as("obf_bound"))
        val st = perUser.crossJoin(broadcast(looks))
          .filter(col("entry") <= col("look"))
          .groupBy(col("look"), col("obf_bound"))
          .agg(sum(col("arm0")).as("n_control"),
            sum(lit(1L) - col("arm0")).as("n_treat"),
            sum(col("arm0") * col("conv")).as("x_control"),
            sum((lit(1L) - col("arm0")) * col("conv")).as("x_treat"))
        val pc = col("x_control").cast("double") /
          col("n_control").cast("double")
        val pt = col("x_treat").cast("double") /
          col("n_treat").cast("double")
        val pp = (col("x_control") + col("x_treat")).cast("double") /
          (col("n_control") + col("n_treat")).cast("double")
        st.select(col("look"), col("n_control"), col("n_treat"),
            col("x_control"), col("x_treat"), col("obf_bound"))
          .withColumn("z_stat", {
            val se = sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n_control").cast("double") +
                lit(1.0) / col("n_treat").cast("double")))
            // nested when: an early look at tiny SF can have an empty
            // arm, and ANSI double division by zero throws — the
            // divisions must sit under the emptiness guard
            when(col("n_control") > 0L && col("n_treat") > 0L,
              when(se > 0.0, (pt - pc) / se))
          })
          .withColumn("crossed", abs(col("z_stat")) > col("obf_bound"))
      },
      Some(s"""WITH pu AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN event_type = 'purchase'
             |        AND value > 150.0 THEN 1 ELSE 0 END) AS conv,
             |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm0,
             |    ${LlmKit.strHashSql("CAST(user_id AS VARCHAR)")} % 5
             |      + 1 AS entry
             |  FROM events GROUP BY user_id),
             |looks AS (
             |  SELECT CAST(range AS BIGINT) AS look,
             |    CASE range WHEN 1 THEN 4.562 WHEN 2 THEN 3.226
             |      WHEN 3 THEN 2.634 WHEN 4 THEN 2.281
             |      ELSE 2.040 END AS obf_bound
             |  FROM range(1, 6)),
             |plu AS (
             |  SELECT l.look, l.obf_bound, p.user_id, p.conv, p.arm0
             |  FROM pu p JOIN looks l ON p.entry <= l.look),
             |st AS (
             |  SELECT look, obf_bound,
             |    CAST(SUM(arm0) AS BIGINT) AS n_control,
             |    CAST(SUM(1 - arm0) AS BIGINT) AS n_treat,
             |    CAST(SUM(arm0 * conv) AS BIGINT) AS x_control,
             |    CAST(SUM((1 - arm0) * conv) AS BIGINT) AS x_treat
             |  FROM plu GROUP BY look, obf_bound),
             |z AS (
             |  SELECT look, n_control, n_treat, x_control, x_treat,
             |    obf_bound,
             |    CASE WHEN n_control = 0 OR n_treat = 0 THEN NULL
             |    WHEN sqrt(
             |        (CAST(x_control + x_treat AS DOUBLE)
             |          / CAST(n_control + n_treat AS DOUBLE))
             |        * (1.0 - CAST(x_control + x_treat AS DOUBLE)
             |            / CAST(n_control + n_treat AS DOUBLE))
             |        * (1.0 / CAST(n_control AS DOUBLE)
             |           + 1.0 / CAST(n_treat AS DOUBLE))) > 0.0
             |    THEN (CAST(x_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
             |          - CAST(x_control AS DOUBLE)
             |            / CAST(n_control AS DOUBLE))
             |      / sqrt(
             |        (CAST(x_control + x_treat AS DOUBLE)
             |          / CAST(n_control + n_treat AS DOUBLE))
             |        * (1.0 - CAST(x_control + x_treat AS DOUBLE)
             |            / CAST(n_control + n_treat AS DOUBLE))
             |        * (1.0 / CAST(n_control AS DOUBLE)
             |           + 1.0 / CAST(n_treat AS DOUBLE)))
             |    END AS z_stat
             |  FROM st)
             |SELECT look, n_control, n_treat, x_control, x_treat,
             |  obf_bound, z_stat, abs(z_stat) > obf_bound AS crossed
             |FROM z""".stripMargin)),

    // ----- q282: quantile treatment effects (distributional A/B) ----------
    // q178 compares conversion RATES and q217 rank-dominance; neither
    // says WHERE in the distribution a treatment moves value — a lift
    // concentrated in the tail looks identical to a uniform shift in
    // both. QTE(τ) = Q_treat(τ) − Q_control(τ) at τ ∈ {.25, .5, .75}
    // over purchase values, arms by user parity. Quantiles are
    // selected BY VALUE (the q274 tie-proof machinery): per-arm
    // distinct-value counts, cumulative rank, first value with
    // cum ≥ ⌈τ·n⌉ — exact integer rank arithmetic, no interpolation,
    // so both engines agree bitwise. Scale: per-arm partitioned
    // windows over DISTINCT purchase values, a 6-row epilogue.
    NamedQuery(
      "q282_qte",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pv = events(s, d)
          .filter(col("event_type") === "purchase")
          .select((pmod(col("user_id"), lit(2L)) === 0L).cast("int")
            .as("arm0"), col("value"))
        val dist = pv.groupBy(col("arm0"), col("value"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy(col("arm0")).orderBy(col("value"))))
        val nArm = pv.groupBy(col("arm0")).agg(count(lit(1)).as("n"))
        val taus = s.range(1, 4).select((col("id") * 25).as("tau_pct"))
        // pinned: the 6-row quantile table is read twice by the
        // control/treat split join
        val q = OpsKit.pinned(dist.join(broadcast(nArm), Seq("arm0"))
          .crossJoin(broadcast(taus))
          .filter(col("cum") * 100 >= col("tau_pct") * col("n"))
          .groupBy(col("arm0"), col("tau_pct"))
          .agg(min(col("value")).as("qv"), max(col("n")).as("n")))
        q.filter(col("arm0") === 1)
          .select(col("tau_pct"), col("qv").as("q_control"),
            col("n").as("n_control"))
          .join(q.filter(col("arm0") === 0)
            .select(col("tau_pct"), col("qv").as("q_treat"),
              col("n").as("n_treat")), Seq("tau_pct"))
          .select(col("tau_pct"), col("n_control"), col("n_treat"),
            col("q_control"), col("q_treat"),
            (col("q_treat") - col("q_control")).as("qte"))
      },
      Some("""WITH pv AS (
             |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
             |      AS arm0, value
             |  FROM events WHERE event_type = 'purchase'),
             |dist AS (
             |  SELECT arm0, value, COUNT(*) AS c FROM pv
             |  GROUP BY arm0, value),
             |cum AS (
             |  SELECT arm0, value,
             |    SUM(c) OVER (PARTITION BY arm0 ORDER BY value) AS cum
             |  FROM dist),
             |na AS (SELECT arm0, CAST(COUNT(*) AS BIGINT) AS n
             |       FROM pv GROUP BY arm0),
             |taus AS (SELECT CAST(range * 25 AS BIGINT) AS tau_pct
             |         FROM range(1, 4)),
             |q AS (
             |  SELECT c.arm0, t.tau_pct, MIN(c.value) AS qv,
             |    MAX(na.n) AS n
             |  FROM cum c JOIN na USING (arm0) CROSS JOIN taus t
             |  WHERE c.cum * 100 >= t.tau_pct * na.n
             |  GROUP BY c.arm0, t.tau_pct)
             |SELECT a.tau_pct,
             |  a.n AS n_control, b.n AS n_treat,
             |  a.qv AS q_control, b.qv AS q_treat,
             |  b.qv - a.qv AS qte
             |FROM q a JOIN q b ON a.tau_pct = b.tau_pct
             |WHERE a.arm0 = 1 AND b.arm0 = 0""".stripMargin)),

    // ----- q285: Mantel–Haenszel stratified odds ratio ---------------------
    // The confounding-proof effect estimate q239's Simpson audit calls
    // for: when a stratifier (user activity band) is associated with
    // both arm exposure and outcome, the crude odds ratio is biased —
    // the Mantel–Haenszel estimator pools the per-stratum 2×2 tables
    // with weights b·c/n, OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) (Mantel &
    // Haenszel 1959, the textbook common-odds-ratio formula). Exact:
    // all cells are integers, each pooled term is one integer-product
    // division, summed on the dsum grid; per-stratum and crude ORs are
    // single divisions of integer products, guarded for empty cells so
    // tiny fixtures yield NULL instead of an ANSI divide-by-zero. The
    // crude OR is reported beside OR_MH so the Simpson gap is visible
    // in one table. Scale: one user rollup (linear), a 3-row stratum
    // grid, scalar epilogue — no shuffles past the first agg.
    NamedQuery(
      "q285_mantel_haenszel",
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("ne"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150.0, 1L).otherwise(0L)).as("y"))
          .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L)
          .withColumn("band", when(col("ne") < 60L, "low")
            .when(col("ne") < 75L, "mid").otherwise("high"))
        val cells = u.groupBy(col("band"))
          .agg(sum(when(col("treat") && col("y") === 1L, 1L)
              .otherwise(0L)).as("n11"),
            sum(when(col("treat") && col("y") === 0L, 1L)
              .otherwise(0L)).as("n10"),
            sum(when(!col("treat") && col("y") === 1L, 1L)
              .otherwise(0L)).as("n01"),
            sum(when(!col("treat") && col("y") === 0L, 1L)
              .otherwise(0L)).as("n00"))
          .withColumn("n",
            col("n11") + col("n10") + col("n01") + col("n00"))
          .withColumn("or_stratum",
            when(col("n10") * col("n01") > 0L,
              (col("n11") * col("n00")).cast("double") /
                (col("n10") * col("n01")).cast("double")))
        // pinned below via cellsP: the 3-row stratum grid feeds both
        // the MH epilogue and the final select
        val cellsP = OpsKit.pinned(cells)
        val mh = cellsP.agg(
          dsum((col("n11") * col("n00")).cast("double") /
            col("n").cast("double")).as("mh_num"),
          dsum((col("n10") * col("n01")).cast("double") /
            col("n").cast("double")).as("mh_den"),
          sum(col("n11")).as("ta"), sum(col("n10")).as("tb"),
          sum(col("n01")).as("tc"), sum(col("n00")).as("td"))
          .select(
            when(col("mh_den") > 0.0, col("mh_num") / col("mh_den"))
              .as("mh_or"),
            when(col("tb") * col("tc") > 0L,
              (col("ta") * col("td")).cast("double") /
                (col("tb") * col("tc")).cast("double")).as("crude_or"))
        cellsP.crossJoin(broadcast(mh))
          .select(col("band"), col("n11"), col("n10"), col("n01"),
            col("n00"), col("or_stratum"), col("mh_or"), col("crude_or"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, COUNT(*) AS ne,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN 1 ELSE 0 END) AS y,
             |    user_id % 2 = 1 AS treat
             |  FROM events GROUP BY user_id),
             |ub AS (
             |  SELECT *, CASE WHEN ne < 60 THEN 'low'
             |    WHEN ne < 75 THEN 'mid' ELSE 'high' END AS band
             |  FROM u),
             |cells AS (
             |  SELECT band,
             |    CAST(SUM(CASE WHEN treat AND y = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(SUM(CASE WHEN treat AND y = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN NOT treat AND y = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN NOT treat AND y = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM ub GROUP BY band),
             |ce AS (
             |  SELECT *, n11 + n10 + n01 + n00 AS n,
             |    CASE WHEN n10 * n01 > 0 THEN
             |      CAST(n11 * n00 AS DOUBLE) / CAST(n10 * n01 AS DOUBLE)
             |    END AS or_stratum
             |  FROM cells),
             |mh AS (
             |  SELECT
             |    CAST(SUM(CAST(CAST(n11 * n00 AS DOUBLE) / CAST(n AS DOUBLE)
             |      AS DECIMAL(28,6))) AS DOUBLE) AS mh_num,
             |    CAST(SUM(CAST(CAST(n10 * n01 AS DOUBLE) / CAST(n AS DOUBLE)
             |      AS DECIMAL(28,6))) AS DOUBLE) AS mh_den,
             |    CAST(SUM(n11) AS BIGINT) AS ta,
             |    CAST(SUM(n10) AS BIGINT) AS tb,
             |    CAST(SUM(n01) AS BIGINT) AS tc,
             |    CAST(SUM(n00) AS BIGINT) AS td
             |  FROM ce),
             |mo AS (
             |  SELECT
             |    CASE WHEN mh_den > 0.0 THEN mh_num / mh_den END AS mh_or,
             |    CASE WHEN tb * tc > 0 THEN
             |      CAST(ta * td AS DOUBLE) / CAST(tb * tc AS DOUBLE)
             |    END AS crude_or
             |  FROM mh)
             |SELECT band, n11, n10, n01, n00, or_stratum, mh_or, crude_or
             |FROM ce CROSS JOIN mo""".stripMargin)),

    // ----- q288: jackknife standard error for ratio metrics ----------------
    // Ratio metrics (revenue per click) have no closed-form variance —
    // the classical fix is the leave-one-unit-out jackknife (Quenouille
    // 1956/Tukey 1958): θ₍₋ᵢ₎ over all units i, SE² = (n−1)/n ·
    // Σ(θ₍₋ᵢ₎ − θ̄)². The resampling-free counterpart to q196's
    // bootstrap: no draws at all, because every leave-one-out total is
    // TOTALS-MINUS-ROW arithmetic (the q276 ablation idiom) — one user
    // rollup, broadcast per-band totals, one subtraction per user.
    // Exact: integer click counts; revenue sums and all Σ over users on
    // the dsum grid; θ₍₋ᵢ₎ is one IEEE division of identical operands.
    // Guards make single-user bands yield NULL, not divide-by-zero.
    // Scale: linear in users, bands bounded (3), zero iteration.
    NamedQuery(
      "q288_jackknife_ratio",
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("c"),
            dsum(when(col("event_type") === "purchase", col("value"))
              .otherwise(lit(0.0))).as("v"))
          .withColumn("band", when(col("c") < 11L, "low")
            .when(col("c") < 16L, "mid").otherwise("high"))
        // pinned: the 3-row band totals and jackknife means are each
        // read twice; the users-sized u/th stay unpinned (linear scans)
        val bt = OpsKit.pinned(u.groupBy(col("band"))
          .agg(count(lit(1)).as("n_users"), sum(col("c")).as("tc"),
            dsum(col("v")).as("tv")))
        val th = u.join(broadcast(bt), "band")
          .select(col("band"),
            when(col("tc") - col("c") > 0L,
              (col("tv") - col("v")) /
                (col("tc") - col("c")).cast("double")).as("th_i"))
        val jm = OpsKit.pinned(th.groupBy(col("band"))
          .agg((dsum(col("th_i")) / count(col("th_i"))).as("jmean")))
        val se = th.join(broadcast(jm), "band")
          .groupBy(col("band"))
          .agg(dsum((col("th_i") - col("jmean")) *
            (col("th_i") - col("jmean"))).as("ssd"),
            count(col("th_i")).as("nj"))
        bt.join(broadcast(se), "band")
          .select(col("band"), col("n_users"),
            col("tc").as("total_clicks"), col("tv").as("revenue"),
            when(col("tc") > 0L, col("tv") / col("tc").cast("double"))
              .as("theta"),
            when(col("nj") > 1L,
              sqrt(((col("nj") - 1L).cast("double") /
                col("nj").cast("double")) * col("ssd"))).as("jack_se"))
      },
      Some(s"""WITH u AS (
             |  SELECT user_id,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c,
             |    ${dsumSql(
               "CASE WHEN event_type = 'purchase' THEN value " +
                 "ELSE CAST(0 AS DOUBLE) END")} AS v
             |  FROM events GROUP BY user_id),
             |ub AS (
             |  SELECT *, CASE WHEN c < 11 THEN 'low'
             |    WHEN c < 16 THEN 'mid' ELSE 'high' END AS band
             |  FROM u),
             |bt AS (
             |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(c) AS BIGINT) AS tc, ${dsumSql("v")} AS tv
             |  FROM ub GROUP BY band),
             |th AS (
             |  SELECT ub.band,
             |    CASE WHEN bt.tc - ub.c > 0 THEN
             |      (bt.tv - ub.v) / CAST(bt.tc - ub.c AS DOUBLE)
             |    END AS th_i
             |  FROM ub JOIN bt ON bt.band = ub.band),
             |jm AS (
             |  SELECT band, ${dsumSql("th_i")} / COUNT(th_i) AS jmean
             |  FROM th GROUP BY band),
             |se AS (
             |  SELECT th.band,
             |    ${dsumSql("(th.th_i - jm.jmean) * (th.th_i - jm.jmean)")}
             |      AS ssd,
             |    CAST(COUNT(th.th_i) AS BIGINT) AS nj
             |  FROM th JOIN jm ON jm.band = th.band
             |  GROUP BY th.band)
             |SELECT bt.band, bt.n_users, bt.tc AS total_clicks,
             |  bt.tv AS revenue,
             |  CASE WHEN bt.tc > 0 THEN bt.tv / CAST(bt.tc AS DOUBLE)
             |  END AS theta,
             |  CASE WHEN se.nj > 1 THEN
             |    sqrt((CAST(se.nj - 1 AS DOUBLE) / CAST(se.nj AS DOUBLE))
             |      * se.ssd)
             |  END AS jack_se
             |FROM bt JOIN se ON se.band = bt.band""".stripMargin)),

    // ----- q289: Kendall's tau-b from the contingency grid -----------------
    // The second rank-correlation lens: q220's Spearman correlates the
    // RANK VALUES; Kendall's τ-b counts concordant vs discordant PAIRS
    // — more robust to a few wild ranks and the statistic behind
    // copula fitting. The O(n²) pair count collapses onto the
    // (clicks, purchases) contingency grid: with t_xy users per cell,
    // concordant C = Σ n₁n₂ over cell pairs with x₂>x₁ ∧ y₂>y₁,
    // discordant D likewise with y₂<y₁, and the tie corrections come
    // from the marginals: τ_b = (C−D)/√((N₀−T₁)(N₀−T₂)) with
    // N₀ = n(n−1)/2, T = Σ t(t−1)/2 (Kendall 1945's tie treatment).
    // Exact: every count is an integer; the one sqrt takes a product
    // of two doubles that are exact images of ≤2⁶³ integers. Scale:
    // the grid is DISTINCT-VALUE-bounded (users collapse onto
    // (x, y) cells), the grid self-join is broadcast, and everything
    // upstream is one user rollup — n² never materializes.
    NamedQuery(
      "q289_kendall_tau",
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        // pinned: the distinct-value-bounded grid feeds four consumers
        // (both sides of the pair join, the two tie rollups, n) — one
        // user-rollup scan instead of five
        val cells = OpsKit.pinned(u.groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("cnt")))
        val cd = cells
          .select(col("x").as("x1"), col("y").as("y1"),
            col("cnt").as("c1"))
          .join(broadcast(cells.select(col("x").as("x2"),
            col("y").as("y2"), col("cnt").as("c2"))),
            col("x1") < col("x2"))
          .agg(sum(when(col("y2") > col("y1"), col("c1") * col("c2"))
              .otherwise(0L)).as("concordant"),
            sum(when(col("y2") < col("y1"), col("c1") * col("c2"))
              .otherwise(0L)).as("discordant"))
        val t1 = cells.groupBy(col("x"))
          .agg(sum(col("cnt")).as("t"))
          .agg(sum(expr("(t * (t - 1)) div 2")).as("ties_x"))
        val t2 = cells.groupBy(col("y"))
          .agg(sum(col("cnt")).as("t"))
          .agg(sum(expr("(t * (t - 1)) div 2")).as("ties_y"))
        val nn = cells.agg(sum(col("cnt")).as("n_users"))
          .select(col("n_users"),
            expr("(n_users * (n_users - 1)) div 2").as("n0"))
        val den1 = (col("n0") - col("ties_x")).cast("double")
        val den2 = (col("n0") - col("ties_y")).cast("double")
        cd.crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
          .crossJoin(broadcast(nn))
          .select(col("n_users"), col("concordant"), col("discordant"),
            col("ties_x"), col("ties_y"),
            when(den1 * den2 > 0.0,
              (col("concordant") - col("discordant")).cast("double") /
                sqrt(den1 * den2)).as("tau_b"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS x,
             |    CAST(SUM(CASE WHEN event_type = 'purchase'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM events GROUP BY user_id),
             |cells AS (
             |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM u GROUP BY x, y),
             |cd AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN c2.y > c1.y THEN c1.cnt * c2.cnt
             |      ELSE 0 END) AS BIGINT) AS concordant,
             |    CAST(SUM(CASE WHEN c2.y < c1.y THEN c1.cnt * c2.cnt
             |      ELSE 0 END) AS BIGINT) AS discordant
             |  FROM cells c1 JOIN cells c2 ON c1.x < c2.x),
             |t1 AS (
             |  SELECT CAST(SUM((t * (t - 1)) // 2) AS BIGINT) AS ties_x
             |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS t
             |        FROM cells GROUP BY x)),
             |t2 AS (
             |  SELECT CAST(SUM((t * (t - 1)) // 2) AS BIGINT) AS ties_y
             |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS t
             |        FROM cells GROUP BY y)),
             |nn AS (
             |  SELECT n_users, (n_users * (n_users - 1)) // 2 AS n0
             |  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS n_users
             |        FROM cells))
             |SELECT nn.n_users, cd.concordant, cd.discordant,
             |  t1.ties_x, t2.ties_y,
             |  CASE WHEN CAST(nn.n0 - t1.ties_x AS DOUBLE)
             |      * CAST(nn.n0 - t2.ties_y AS DOUBLE) > 0.0 THEN
             |    CAST(cd.concordant - cd.discordant AS DOUBLE)
             |      / sqrt(CAST(nn.n0 - t1.ties_x AS DOUBLE)
             |             * CAST(nn.n0 - t2.ties_y AS DOUBLE))
             |  END AS tau_b
             |FROM cd CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN nn"""
        .stripMargin)),

    // ----- q290: Chow structural-break test ---------------------------------
    // q147/q213 fit ONE trend; q210's CUSUM finds WHERE the level
    // moved. The Chow test (1960) answers the remaining question: did
    // the RELATIONSHIP change — are the pre- and post-break
    // regressions the same line? F = ((RSS_p − RSS₁ − RSS₂)/k) /
    // ((RSS₁+RSS₂)/(n₁+n₂−2k)), k = 2, at the midpoint-day break.
    // Exactness is q147's discipline end-to-end: x = integer epoch
    // days, y = integer cents, the six moments per segment summed in
    // DECIMAL(38,0) and cast to double ONCE, then RSS by the
    // moment-only closed form RSS = (dy − num²/dx)/n — no residual
    // pass, so a 100 TB log reduces to two 6-number rows (and one
    // pooled row aggregated independently, NOT by adding rounded
    // segment doubles) before any IEEE arithmetic happens.
    NamedQuery(
      "q290_chow_break",
      (s, d) => {
        val pts0 = events(s, d)
          .filter(col("event_type") === "purchase")
          .select(expr("unix_micros(ts) div 86400000000").as("x"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
              .as("y"))
        val brk = pts0.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
          .select(expr("(lo + hi + 1) div 2").as("bd"))
        val pts = pts0.crossJoin(broadcast(brk))
          .withColumn("segment",
            when(col("x") < col("bd"), "pre").otherwise("post"))
        // ROLLUP(segment) computes the two segment rows AND the pooled
        // grand-total row in ONE aggregation pass (the pooled moments
        // must be aggregated from raw points, not assembled by adding
        // rounded segment doubles — rollup gives exactly that for free)
        val m = pts.rollup(col("segment"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
            sum(col("y").cast("decimal(38,0)")).cast("double").as("sy"),
            sum((col("x") * col("y")).cast("decimal(38,0)"))
              .cast("double").as("sxy"),
            sum((col("x") * col("x")).cast("decimal(38,0)"))
              .cast("double").as("sxx"),
            sum((col("y").cast("decimal(19,0)") *
              col("y").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .cast("double").as("syy"))
          .withColumn("segment",
            coalesce(col("segment"), lit("pooled")))
        val nd = col("n").cast("double")
        val dx = nd * col("sxx") - col("sx") * col("sx")
        val dy = nd * col("syy") - col("sy") * col("sy")
        val num = nd * col("sxy") - col("sx") * col("sy")
        // pinned: the 3-row segment table feeds both the pivot and the
        // final select — unpinned, each re-runs the moment scan
        val seg = OpsKit.pinned(m.select(col("segment"), col("n"),
          when(dx > 0.0, num / dx).as("slope"),
          when(dx > 0.0, (col("sy") - (num / dx) * col("sx")) / nd)
            .as("intercept"),
          when(dx > 0.0, (dy - (num / dx) * num) / nd).as("rss")))
        val f = seg.groupBy()
          .pivot("segment", Seq("pre", "post", "pooled"))
          .agg(first(col("rss")).as("rss"), first(col("n")).as("n"))
          .select(
            when(col("pre_n") + col("post_n") > 4L &&
              col("pre_rss") + col("post_rss") > 0.0,
              ((col("pooled_rss") - col("pre_rss") - col("post_rss")) /
                lit(2.0)) /
                ((col("pre_rss") + col("post_rss")) /
                  (col("pre_n") + col("post_n") - lit(4L))
                    .cast("double"))).as("chow_f"))
        seg.crossJoin(broadcast(f))
      },
      Some("""WITH pts0 AS (
             |  SELECT epoch_us(ts) // 86400000000 AS x,
             |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
             |  FROM events WHERE event_type = 'purchase'),
             |brk AS (
             |  SELECT (MIN(x) + MAX(x) + 1) // 2 AS bd FROM pts0),
             |pts AS (
             |  SELECT x, y,
             |    CASE WHEN x < bd THEN 'pre' ELSE 'post' END AS segment
             |  FROM pts0 CROSS JOIN brk),
             |m AS (
             |  SELECT segment, COUNT(*) AS n,
             |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |      AS DOUBLE) AS sx,
             |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |      AS DOUBLE) AS sy,
             |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
             |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
             |        * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS syy
             |  FROM pts GROUP BY segment
             |  UNION ALL
             |  SELECT 'pooled', COUNT(*),
             |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |      AS DOUBLE),
             |    CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |      AS DOUBLE),
             |    CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE),
             |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE),
             |    CAST(CAST(SUM(CAST(CAST(y AS DECIMAL(19,0))
             |        * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE)
             |  FROM pts),
             |seg AS (
             |  SELECT segment, n,
             |    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0 THEN
             |      (CAST(n AS DOUBLE) * sxy - sx * sy)
             |        / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope,
             |    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0 THEN
             |      (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
             |             / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             |        / CAST(n AS DOUBLE) END AS intercept,
             |    CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0 THEN
             |      ((CAST(n AS DOUBLE) * syy - sy * sy)
             |       - ((CAST(n AS DOUBLE) * sxy - sx * sy)
             |          / (CAST(n AS DOUBLE) * sxx - sx * sx))
             |         * (CAST(n AS DOUBLE) * sxy - sx * sy))
             |        / CAST(n AS DOUBLE) END AS rss
             |  FROM m),
             |f AS (
             |  SELECT CASE WHEN pre_n + post_n > 4
             |      AND pre_rss + post_rss > 0.0 THEN
             |    ((pooled_rss - pre_rss - post_rss) / 2.0)
             |      / ((pre_rss + post_rss)
             |         / CAST(pre_n + post_n - 4 AS DOUBLE)) END AS chow_f
             |  FROM (SELECT
             |    MAX(CASE WHEN segment = 'pre' THEN rss END) AS pre_rss,
             |    MAX(CASE WHEN segment = 'post' THEN rss END) AS post_rss,
             |    MAX(CASE WHEN segment = 'pooled' THEN rss END)
             |      AS pooled_rss,
             |    MAX(CASE WHEN segment = 'pre' THEN n END) AS pre_n,
             |    MAX(CASE WHEN segment = 'post' THEN n END) AS post_n
             |  FROM seg))
             |SELECT seg.segment, seg.n, seg.slope, seg.intercept,
             |  seg.rss, f.chow_f
             |FROM seg CROSS JOIN f""".stripMargin)),

    // ----- q293: exact 1-D Wasserstein (earth-mover) distance matrix -------
    // The integral counterpart to q233's KS sup-norm matrix: W₁ weighs
    // HOW FAR mass moved, not just the worst CDF gap — the right
    // distance when a distribution shifts a little everywhere (KS
    // saturates) or a lot somewhere narrow (KS overreacts). In one
    // dimension W₁ has the exact closed form ∫|F_A − F_B| dv = Σ over
    // consecutive pooled distinct values of |F_A(v) − F_B(v)|·Δv — no
    // transport LP. Exact: CDF steps are integer-count divisions, gaps
    // are double subtractions of identical parquet values, the sum is
    // on the dsum grid. Scale: per-pair work is DISTINCT-VALUE-bounded
    // (continuous data at 100 TB pre-quantizes to a fixed grid first);
    // the window is partitioned per pair — no global single-partition
    // window anywhere.
    NamedQuery(
      "q293_wasserstein",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val vals = events(s, d).groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("cnt"))
        // pinned: the per-type totals row is referenced by both sides
        // of the pair self-join — unpinned, each side re-runs the
        // corpus-wide (type, value) aggregation
        val tots = OpsKit.pinned(vals.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("nt")))
        // explicit broadcast: a checkpointed LogicalRDD carries no
        // stats, so the non-equi self-join would otherwise plan as a
        // CartesianProduct instead of a BNLJ
        val pairs = tots
          .select(col("event_type").as("ta"), col("nt").as("na"))
          .join(broadcast(tots.select(col("event_type").as("tb"),
            col("nt").as("nb"))), col("ta") < col("tb"))
        // ONE broadcast join against the pair list (disjunctive
        // condition → BNLJ over the tiny pair table), not a per-side
        // join + union that would re-aggregate `vals` once per branch
        // and re-scan events four times
        val g = vals.join(broadcast(pairs),
            col("event_type") === col("ta") ||
              col("event_type") === col("tb"))
          .groupBy(col("ta"), col("tb"), col("na"), col("nb"),
            col("value").as("v"))
          .agg(sum(when(col("event_type") === col("ta"), col("cnt"))
              .otherwise(0L)).as("ca"),
            sum(when(col("event_type") === col("tb"), col("cnt"))
              .otherwise(0L)).as("cb"))
        val w = Window.partitionBy(col("ta"), col("tb")).orderBy(col("v"))
        val wc = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val cum = g
          .withColumn("fa", sum(col("ca")).over(wc).cast("double") /
            col("na").cast("double"))
          .withColumn("fb", sum(col("cb")).over(wc).cast("double") /
            col("nb").cast("double"))
          .withColumn("gap", lead(col("v"), 1).over(w) - col("v"))
        cum.groupBy(col("ta"), col("tb"), col("na"), col("nb"))
          .agg(dsum(when(col("gap").isNotNull,
            abs(col("fa") - col("fb")) * col("gap"))
            .otherwise(lit(0.0))).as("w1"))
          .select(col("ta").as("type_a"), col("tb").as("type_b"),
            col("na").as("n_a"), col("nb").as("n_b"), col("w1"))
      },
      Some(s"""WITH vals AS (
             |  SELECT event_type, value AS v, CAST(COUNT(*) AS BIGINT)
             |    AS cnt
             |  FROM events GROUP BY event_type, value),
             |tots AS (
             |  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS nt
             |  FROM vals GROUP BY event_type),
             |pairs AS (
             |  SELECT a.event_type AS ta, b.event_type AS tb,
             |    a.nt AS na, b.nt AS nb
             |  FROM tots a JOIN tots b ON a.event_type < b.event_type),
             |g AS (
             |  SELECT p.ta, p.tb, p.na, p.nb, v.v,
             |    CAST(SUM(CASE WHEN v.event_type = p.ta THEN v.cnt
             |      ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN v.event_type = p.tb THEN v.cnt
             |      ELSE 0 END) AS BIGINT) AS cb
             |  FROM pairs p JOIN vals v
             |    ON v.event_type IN (p.ta, p.tb)
             |  GROUP BY p.ta, p.tb, p.na, p.nb, v.v),
             |cum AS (
             |  SELECT ta, tb, na, nb, v,
             |    CAST(SUM(ca) OVER (PARTITION BY ta, tb ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             |      / CAST(na AS DOUBLE) AS fa,
             |    CAST(SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             |      / CAST(nb AS DOUBLE) AS fb,
             |    lead(v) OVER (PARTITION BY ta, tb ORDER BY v) - v AS gap
             |  FROM g)
             |SELECT ta AS type_a, tb AS type_b, na AS n_a, nb AS n_b,
             |  ${dsumSql(
               "CASE WHEN gap IS NOT NULL THEN abs(fa - fb) * gap " +
                 "ELSE CAST(0 AS DOUBLE) END")} AS w1
             |FROM cum GROUP BY ta, tb, na, nb""".stripMargin)),

    // ----- q294: Theil–Sen robust trend slope -------------------------------
    // q147/q213's OLS slope moves with a single wild day; the Theil–Sen
    // estimator (median of all pairwise slopes, 1950/1968) has a 29.3%
    // breakdown point — the robust-regression counterpart to q173's MAD
    // outliers. The pair set collapses onto the DAY GRID: slopes
    // between daily mean values, ≤ C(30,2) = 435 pairs per type at any
    // corpus size (pairwise-over-days, never pairwise-over-rows), and
    // the median is the rank-⌈(k+1)/2⌉ VALUE of the slope list — a
    // per-type window over a bounded grid, deterministic even under
    // slope ties (equal values make the rank-k value unique). Exact:
    // daily means are davg (dsum grid / count), each slope one IEEE
    // division, no averaging of middle elements (lower median). The
    // OLS slope on the raw (day, cents) points sits beside it — exact
    // DECIMAL(38,0) integer moments, q147's discipline — so the
    // robustness gap is one table. Scale: one (type, day) rollup plus
    // one moment rollup — both linear; the daily table is pinned.
    NamedQuery(
      "q294_theil_sen",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = OpsKit.pinned(events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(davg(floor(col("value") * lit(100.0) + lit(0.5))
            .cast("long")).as("ym")))
        val b = daily.select(col("event_type").as("et2"),
          col("day").as("d2"), col("ym").as("y2"))
        val slopes = daily
          .join(broadcast(b), col("event_type") === col("et2") &&
            col("day") < col("d2"))
          .select(col("event_type"),
            ((col("y2") - col("ym")) /
              (col("d2") - col("day")).cast("double")).as("slp"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("slp"))
        val cnt = slopes.groupBy(col("event_type"))
          .agg(count(lit(1)).as("np"))
        val ts = slopes
          .withColumn("rn", row_number().over(w).cast("long"))
          .join(broadcast(cnt), Seq("event_type"))
          .filter(col("rn") === expr("(np + 1) div 2"))
          .select(col("event_type"), col("np"),
            col("slp").as("theil_sen_slope"))
        // OLS from RAW integer points (q147's moment discipline), not
        // from dsum-gridded day*mean products: quantizing a ~1e8-
        // magnitude double product onto the 6-decimal grid can flip a
        // near-tie differently per engine (observed at sf0.1), while
        // integer moments in DECIMAL(38,0) are exact on both
        val pts = events(s, d).select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
            .as("yc"))
        val m = pts.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nd"),
            sum(col("day").cast("decimal(38,0)")).cast("double")
              .as("sx"),
            sum(col("yc").cast("decimal(38,0)")).cast("double")
              .as("sy"),
            sum((col("day") * col("yc")).cast("decimal(38,0)"))
              .cast("double").as("sxy"),
            sum((col("day") * col("day")).cast("decimal(38,0)"))
              .cast("double").as("sxx"))
        val nd = col("nd").cast("double")
        val dx = nd * col("sxx") - col("sx") * col("sx")
        val ols = m.select(col("event_type"),
          when(dx > 0.0,
            (nd * col("sxy") - col("sx") * col("sy")) / dx)
            .as("ols_slope"))
        ts.join(broadcast(ols), Seq("event_type"))
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             |    ${dsumSql(
               "CAST(floor(value * 100.0 + 0.5) AS BIGINT)")}
             |      / COUNT(*) AS ym
             |  FROM events GROUP BY event_type, day),
             |slopes AS (
             |  SELECT a.event_type,
             |    (b.ym - a.ym) / CAST(b.day - a.day AS DOUBLE) AS slp
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.day < b.day),
             |cnt AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np
             |  FROM slopes GROUP BY event_type),
             |rk AS (
             |  SELECT event_type, slp,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY slp) AS BIGINT) AS rn
             |  FROM slopes),
             |ts AS (
             |  SELECT r.event_type, c.np, r.slp AS theil_sen_slope
             |  FROM rk r JOIN cnt c ON c.event_type = r.event_type
             |  WHERE r.rn = (c.np + 1) // 2),
             |pts AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS yc
             |  FROM events),
             |m AS (
             |  SELECT event_type, COUNT(*) AS nd,
             |    CAST(CAST(SUM(CAST(day AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             |    CAST(CAST(SUM(CAST(yc AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             |    CAST(CAST(SUM(CAST(day * yc AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
             |    CAST(CAST(SUM(CAST(day * day AS DECIMAL(38,0)))
             |      AS DECIMAL(38,0)) AS DOUBLE) AS sxx
             |  FROM pts GROUP BY event_type),
             |ols AS (
             |  SELECT event_type,
             |    CASE WHEN CAST(nd AS DOUBLE) * sxx - sx * sx > 0.0 THEN
             |      (CAST(nd AS DOUBLE) * sxy - sx * sy)
             |        / (CAST(nd AS DOUBLE) * sxx - sx * sx) END
             |      AS ols_slope
             |  FROM m)
             |SELECT t.event_type, t.np, t.theil_sen_slope, o.ols_slope
             |FROM ts t JOIN ols o ON o.event_type = t.event_type"""
        .stripMargin)),

    // ----- q295: Nelson–Aalen cumulative hazard -----------------------------
    // q140's Kaplan–Meier multiplies survival factors (order-pinned
    // fold gymnastics because float multiply isn't associative); the
    // Nelson–Aalen estimator (1972/1978) of the CUMULATIVE HAZARD
    // H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ is the ADDITIVE twin — the natural
    // estimator for a distributed engine, because sums (on the dsum
    // grid) need no ordering tricks at all. Same survival frame as
    // q140: subjects are users, event = first high-value purchase,
    // censoring at last observed event, durations in whole DAYS (the
    // grid is horizon-bounded, so the risk-set suffix sums and the
    // hazard prefix sums are ≤31-row windows, not corpus windows).
    // Exact: integer d/n into one division per step, cumulated on the
    // decimal grid. No exp(−H) column — libm exp differs across
    // engines; H itself is the deliverable.
    NamedQuery(
      "q295_nelson_aalen",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = events(s, d).groupBy(col("user_id"))
          .agg(min(col("ts")).as("t0"),
            min(when(col("event_type") === "purchase" &&
              col("value") > 150.0, col("ts"))).as("tc"),
            max(col("ts")).as("tl"))
        // the duration key is named `day` — it IS a day index, and the
        // plan guard's bounded-key convention (time-domain keys have
        // clock-span cardinality) recognizes it through the ≤31-row
        // global windows below
        val dd = u.select(
          expr("(unix_micros(coalesce(tc, tl)) - unix_micros(t0)) " +
            "div 86400000000").as("day"),
          col("tc").isNotNull.as("ev"))
        val grid = dd.groupBy(col("day"))
          .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("leaving"))
        val w = boundedWin.orderBy(col("day"))
        val risk = grid.withColumn("n_risk",
          sum(col("leaving")).over(w.rowsBetween(Window.currentRow,
            Window.unboundedFollowing)))
        risk.filter(col("d") > 0L)
          .withColumn("h_inc",
            col("d").cast("double") / col("n_risk").cast("double"))
          .withColumn("h_cum",
            sum(col("h_inc").cast("decimal(28,6)"))
              .over(boundedWin.orderBy(col("day"))
                .rowsBetween(Window.unboundedPreceding,
                  Window.currentRow)).cast("double"))
          .select(col("day"), col("n_risk"), col("d"),
            col("h_inc"), col("h_cum"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, MIN(ts) AS t0,
             |    MIN(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN ts END) AS tc,
             |    MAX(ts) AS tl
             |  FROM events GROUP BY user_id),
             |dd AS (
             |  SELECT (epoch_us(COALESCE(tc, tl)) - epoch_us(t0))
             |      // 86400000000 AS dur,
             |    tc IS NOT NULL AS ev
             |  FROM u),
             |grid AS (
             |  SELECT dur,
             |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT)
             |      AS d,
             |    CAST(COUNT(*) AS BIGINT) AS leaving
             |  FROM dd GROUP BY dur),
             |risk AS (
             |  SELECT dur, d, leaving,
             |    CAST(SUM(leaving) OVER (ORDER BY dur
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |      AS BIGINT) AS n_risk
             |  FROM grid),
             |hz AS (
             |  SELECT dur, n_risk, d,
             |    CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h_inc
             |  FROM risk WHERE d > 0)
             |SELECT dur AS day, n_risk, d, h_inc,
             |  CAST(SUM(CAST(h_inc AS DECIMAL(28,6))) OVER (ORDER BY dur
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS h_cum
             |FROM hz""".stripMargin)),

    // ----- q297: A/B power analysis (required sample size per MDE) ---------
    // The design-time complement to q178 (one final test) and q281
    // (sequential monitoring): BEFORE running an experiment, how many
    // users per arm does each minimum-detectable-effect need? The
    // two-proportion formula n = (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/δ²
    // at α = .05 two-sided, 80% power — z's are the FIXED-DECIMAL
    // literals 1.959963984540054 and 0.8416212335729143 (no quantile
    // function at query time; the oracle string-casts them because
    // DuckDB's bare decimal-literal→DOUBLE cast drops the last ulp).
    // p₁ is the observed high-value conversion rate; the MDE grid runs
    // 2–25 pp so the `feasible` verdict (current arm size ≥ required)
    // genuinely flips within the fixture. Exact: one integer user
    // rollup, then a fixed IEEE expression per grid row; ceil of
    // identical doubles is identical. Scale: the corpus reduces to
    // (n, Σy) before any arithmetic — one partial-agg pass.
    NamedQuery(
      "q297_power_analysis",
      (s, d) => {
        val base = events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 150.0, 1L).otherwise(0L)).as("y"))
          .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_pos"))
          .select(col("n_users"), col("n_pos"),
            (col("n_pos").cast("double") / col("n_users").cast("double"))
              .as("p_base"))
        val grid = s.range(1, 6).select(
          when(col("id") === 1, 0.02).when(col("id") === 2, 0.05)
            .when(col("id") === 3, 0.10).when(col("id") === 4, 0.15)
            .otherwise(0.25).as("mde"))
        val z = lit(1.959963984540054) + lit(0.8416212335729143)
        val p1 = col("p_base")
        val p2 = col("p_base") + col("mde")
        grid.crossJoin(broadcast(base))
          .select(col("mde"), col("n_users"), col("p_base"),
            ceil(z * z * (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)) /
              (col("mde") * col("mde"))).cast("long").as("n_required"))
          .withColumn("feasible",
            expr("n_users div 2") >= col("n_required"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
             |        THEN 1 ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |base AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             |    CAST(SUM(y) AS BIGINT) AS n_pos,
             |    CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |      AS p_base
             |  FROM u),
             |grid AS (
             |  SELECT CASE range WHEN 1 THEN 0.02 WHEN 2 THEN 0.05
             |    WHEN 3 THEN 0.10 WHEN 4 THEN 0.15 ELSE 0.25 END AS mde
             |  FROM range(1, 6)),
             |calc AS (
             |  SELECT g.mde, b.n_users, b.p_base,
             |    CAST(ceil(
             |      (CAST('1.959963984540054' AS DOUBLE)
             |       + CAST('0.8416212335729143' AS DOUBLE))
             |      * (CAST('1.959963984540054' AS DOUBLE)
             |         + CAST('0.8416212335729143' AS DOUBLE))
             |      * (b.p_base * (1.0 - b.p_base)
             |         + (b.p_base + g.mde) * (1.0 - (b.p_base + g.mde)))
             |      / (g.mde * g.mde)) AS BIGINT) AS n_required
             |  FROM grid g CROSS JOIN base b)
             |SELECT mde, n_users, p_base, n_required,
             |  n_users // 2 >= n_required AS feasible
             |FROM calc""".stripMargin)),
  )
}
