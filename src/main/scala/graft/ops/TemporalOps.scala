package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (SURVEY.md §2.5 names
  * as-of and range joins as absent from both the reference and Spark):
  *
  *  - q48 as-of join: for each purchase event, the latest EARLIER
  *    non-purchase event of the same user. Implemented as the scalable
  *    union + window reformulation — tag both sides, sort once per user,
  *    carry the last left-side attributes forward — one shuffle, no
  *    inequality join. The oracle uses DuckDB's NATIVE `ASOF LEFT JOIN`,
  *    so the reformulation is checked against a first-class ASOF engine;
  *  - q49 range join: per event, aggregate the same user's events in the
  *    trailing 1-hour window. Implemented as bucket-equi-join + residual
  *    filter (each right row registers in its own hour bucket and the
  *    next; the join is pure equality on (user, bucket)) — the standard
  *    rewrite that keeps a theta join shuffle-partitionable at 100 TB.
  *    The oracle is the direct inequality join;
  *  - q63 attribution join: every (click, purchase) pair of a user within
  *    a 4-hour window — the pair-emitting variant of q49, with a
  *    watermarked stream-stream join twin in
  *    [[graft.streaming.StreamOps.attribution]].
  */
object TemporalOps {
  import OpsKit._

  private val HourMicros = 3600000000L

  def all: Seq[NamedQuery] = Seq(

    // ----- q48: as-of join (union + window vs native ASOF) ----------------
    NamedQuery(
      "q48_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val prior = ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("tag"),
            col("event_id").as("p_id"), col("value").as("p_value"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"),
            col("event_id").as("p_id"), col("value").as("p_value"))
        // ties on ts are impossible ((user_id, ts) is unique), but tag
        // keeps the ordering total anyway; last(...ignoreNulls) carries the
        // most recent prior-event attributes forward
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        prior.unionByName(purch)
          .withColumn("prior_id",
            last(when(col("tag") === 0, col("p_id")), ignoreNulls = true).over(w))
          .withColumn("prior_value",
            last(when(col("tag") === 0, col("p_value")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("p_id").as("event_id"), col("user_id"),
            col("prior_id"), col("prior_value"))
      },
      Some("""SELECT l.event_id, l.user_id,
             |  r.event_id AS prior_id, r.value AS prior_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN
             |     (SELECT * FROM events WHERE event_type <> 'purchase') r
             |ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin)),

    // ----- q49: range join (bucket equi-join + residual filter) -----------
    NamedQuery(
      "q49_range_join",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("us", expr(s"unix_micros(ts)"))
        val left = ev.select(col("event_id"), col("user_id"),
          col("us").as("us_l"), (col("us") / HourMicros).cast("long").as("bucket"))
        // right rows register in their own bucket and the next one, so a
        // left row finds every candidate via pure equality
        val right = ev.select(col("user_id"), col("us").as("us_r"),
          col("value"),
          explode(array((col("us") / HourMicros).cast("long"),
            (col("us") / HourMicros).cast("long") + 1)).as("bucket"))
        left.join(right, Seq("user_id", "bucket"))
          .filter(col("us_r") > col("us_l") - HourMicros &&
            col("us_r") <= col("us_l"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_trailing"),
            dsum(col("value")).as("sum_trailing"))
      },
      Some(s"""SELECT l.event_id, COUNT(*) AS n_trailing,
              |  ${dsumSql("r.value")} AS sum_trailing
              |FROM events l JOIN events r
              |  ON l.user_id = r.user_id
              | AND r.ts > l.ts - INTERVAL '1 hour' AND r.ts <= l.ts
              |GROUP BY l.event_id""".stripMargin)),

    // ----- q63: attribution join (click → purchase within 4 h) ------------
    // The funnel/attribution shape: every (click, purchase) pair of the
    // same user with the purchase inside [click, click + 4 h). Unlike
    // q49 this emits the PAIRS, not an aggregate — the join itself is the
    // product. Same scale rewrite: clicks register in their own 4-hour
    // bucket and the next, the join is pure equality on (user_id, bucket)
    // — shuffle-partitionable at 100 TB where the raw inequality join is
    // not — and the time predicate is a residual filter. The streaming
    // twin is a genuine watermarked stream-stream interval join
    // ([[graft.streaming.StreamOps.attribution]]), checked for parity in
    // StreamOpsSpec. gap_sec is exact integer floor-division — no double.
    NamedQuery(
      "q63_attribution_join",
      (s, d) => {
        val windowUs = 14400000000L // 4 h in microseconds
        val ev = events(s, d).withColumn("us", expr("unix_micros(ts)"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("us").as("us_c"),
            explode(array((col("us") / windowUs).cast("long"),
              (col("us") / windowUs).cast("long") + 1)).as("bucket"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("us").as("us_p"),
            (col("us") / windowUs).cast("long").as("bucket"))
        clicks.join(purchases, Seq("user_id", "bucket"))
          .filter(col("us_p") >= col("us_c") &&
            col("us_p") < col("us_c") + windowUs)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            expr("(us_p - us_c) div 1000000").as("gap_sec"))
      },
      Some("""SELECT l.user_id, l.event_id AS click_id,
             |  r.event_id AS purchase_id,
             |  (epoch_us(r.ts) - epoch_us(l.ts)) // 1000000 AS gap_sec
             |FROM events l JOIN events r
             |  ON l.user_id = r.user_id
             | AND r.ts >= l.ts AND r.ts < l.ts + INTERVAL '4 hours'
             |WHERE l.event_type = 'click' AND r.event_type = 'purchase'""".stripMargin)),

    // ----- q167: daily user-growth accounting (new / active / cumulative) -
    // The growth ledger every event pipeline publishes: per calendar day,
    // event volume, distinct active users, NEW users (first-ever
    // appearance that day), and the cumulative registered-user count —
    // the curve capacity planning and retention models read. First-seen
    // day per user is a min-aggregate (never a window over the event
    // stream); daily actives are one distinct-agg shuffle; the running
    // cumulative is a window over the DAY table — a bounded dimension
    // (365 rows/year), the q136 phased-CDF budget, never a
    // single-partition pass over events. Days render as strings (the
    // TsFmt discipline) so parquet timestamp physics can't split the
    // engines. Exact integers throughout.
    NamedQuery(
      "q167_user_growth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("user_id"))
        val daily = ev.groupBy(col("day"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_active"))
        val news = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
        val w = boundedWin.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(news, Seq("day"), "left")
          .select(col("day"), col("n_events"), col("n_active"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("cum_users", sum(col("n_new")).over(w))
      },
      Some("""WITH ev AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id
             |  FROM events),
             |daily AS (
             |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
             |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
             |  FROM ev GROUP BY day),
             |firsts AS (
             |  SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
             |news AS (
             |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
             |  FROM firsts GROUP BY day)
             |SELECT day, n_events, n_active,
             |  COALESCE(n_new, 0) AS n_new,
             |  CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum_users
             |FROM daily LEFT JOIN news USING (day)""".stripMargin)),

    // ----- q170: exponentially-decayed activity scores (trending) ---------
    // The decayed counter behind every trending/feature-store signal:
    // an event aged a days contributes 2^(−a) to its user's score, so
    // yesterday counts half of today and the ledger never needs
    // resetting — and because the half-life is one DAY, every
    // contribution is an exact power of two: pow(2.0, −a) for integer a
    // is correctly rounded (hence identical) on every IEEE libm, the
    // one transcendental this repo's no-libm rule licenses. Age anchors
    // to the CORPUS max day (datediff of date-truncated timestamps —
    // integer days on both engines); per-user score and per-type
    // breakdown come from one partial-agg shuffle with decimal-exact
    // sums. Emitted per user: total decayed score, purchase-only
    // decayed score, last-active age, event count — the four features a
    // ranking model reads. Scale: one scan, one broadcast scalar (max
    // day), one shuffle on user_id; no windows, no state.
    NamedQuery(
      "q170_decay_scores",
      (s, d) => {
        val ev = events(s, d)
        val anchor = ev.agg(max(to_date(col("ts"))).as("d0"))
        ev.select(col("user_id"), col("event_type"), to_date(col("ts"))
          .as("dy"))
          .crossJoin(broadcast(anchor))
          .select(col("user_id"), col("event_type"),
            datediff(col("d0"), col("dy")).cast("long").as("age"))
          .select(col("user_id"), col("age"),
            pow(lit(2.0), -col("age").cast("double")).as("wt"),
            col("event_type"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("age")).as("last_active_age"),
            dsum(col("wt")).as("decay_score"),
            dsum(when(col("event_type") === "purchase", col("wt"))
              .otherwise(lit(0.0))).as("purchase_decay_score"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, event_type, CAST(ts AS DATE) AS dy
              |  FROM events),
              |a AS (SELECT MAX(dy) AS d0 FROM ev),
              |w AS (
              |  SELECT user_id, event_type,
              |    CAST(date_diff('day', dy, d0) AS BIGINT) AS age,
              |    pow(2.0, -CAST(date_diff('day', dy, d0) AS DOUBLE))
              |      AS wt
              |  FROM ev CROSS JOIN a)
              |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
              |  MIN(age) AS last_active_age,
              |  ${dsumSql("wt")} AS decay_score,
              |  ${dsumSql("CASE WHEN event_type = 'purchase' THEN wt" +
                " ELSE 0.0 END")} AS purchase_decay_score
              |FROM w GROUP BY user_id""".stripMargin)),

    // ----- q184: EWMA forecast + error (daily per-type series) ------------
    // The one-line forecaster every monitoring pipeline runs before it
    // buys a real model: tomorrow ≈ exponentially-weighted mean of the
    // trailing week. Formulated COUNT-WEIGHTED so the whole pipeline
    // stays on the exact grid: day weights are the INTEGERS 2^(7−age)
    // (64…1 — never a fractional 2^−age whose per-term decimal rounding
    // can land on a half-ulp tie and split the engines), day-value sums
    // stay DECIMAL (never re-rounded doubles), and weight·sum products
    // are decimal×integer — exact. The single division double-izes at
    // the very end, one mirrored IEEE op. The trailing-week meet is a
    // bounded-range self join on the DAY table (|days|·|types| rows —
    // the corpus-sized work ends at the daily partial aggregate), so at
    // 100 TB the inequality join runs over thousands of rows, not
    // events. Absolute error per (type, day) is the calibration readout.
    NamedQuery(
      "q184_ewma_forecast",
      (s, d) => {
        val ev = events(s, d)
        val anchor = ev.agg(min(to_date(col("ts"))).as("d0"))
        val daily = ev.crossJoin(broadcast(anchor))
          .select(col("event_type"),
            datediff(to_date(col("ts")), col("d0")).cast("long").as("idx"),
            col("value"))
          .groupBy(col("event_type"), col("idx"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types
              .DecimalType(28, 6))).as("svd"))
        val hist = daily.select(col("event_type").as("h_et"),
          col("idx").as("hidx"), col("n").as("hn"), col("svd").as("hsvd"))
        daily.join(broadcast(hist),
            col("h_et") === col("event_type") &&
              col("hidx") >= col("idx") - 7 && col("hidx") <= col("idx") - 1)
          .select(col("event_type"), col("idx"), col("n"), col("svd"),
            col("hn"), col("hsvd"),
            expr("shiftleft(1L, cast(7 - (idx - hidx) as int))").as("wt"))
          .groupBy(col("event_type"), col("idx"), col("n"), col("svd"))
          .agg(sum(col("hsvd") * col("wt")).as("wnum"),
            sum(col("hn") * col("wt")).as("wden"))
          .select(col("event_type"), col("idx"), col("n"),
            (col("svd").cast("double") / col("n").cast("double"))
              .as("mean"),
            (col("wnum").cast("double") / col("wden").cast("double"))
              .as("forecast"))
          .withColumn("abs_err", abs(col("mean") - col("forecast")))
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type, CAST(ts AS DATE) AS dy, value
             |  FROM events),
             |a AS (SELECT MIN(dy) AS d0 FROM ev),
             |daily AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', d0, dy) AS BIGINT) AS idx,
             |    CAST(COUNT(*) AS BIGINT) AS n,
             |    SUM(CAST(value AS DECIMAL(28,6))) AS svd
             |  FROM ev CROSS JOIN a GROUP BY event_type, idx),
             |j AS (
             |  SELECT c.event_type, c.idx, c.n, c.svd,
             |    h.n AS hn, h.svd AS hsvd,
             |    CAST(pow(2.0, CAST(7 - (c.idx - h.idx) AS DOUBLE))
             |      AS BIGINT) AS wt
             |  FROM daily c JOIN daily h ON c.event_type = h.event_type
             |    AND h.idx >= c.idx - 7 AND h.idx <= c.idx - 1),
             |f AS (
             |  SELECT event_type, idx, n, svd,
             |    SUM(hsvd * wt) AS wnum, CAST(SUM(hn * wt) AS BIGINT)
             |      AS wden
             |  FROM j GROUP BY event_type, idx, n, svd)
             |SELECT event_type, idx, n,
             |  CAST(svd AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |  CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE) AS forecast,
             |  abs(CAST(svd AS DOUBLE) / CAST(n AS DOUBLE)
             |      - CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE))
             |    AS abs_err
             |FROM f""".stripMargin)),

    // ----- q186: activity streaks (gaps-and-islands per user) -------------
    // The retention feature cohort tables can't see: CONSECUTIVE-day
    // activity runs. Classic gaps-and-islands — day index minus the
    // per-user row_number is constant exactly along a streak — entirely
    // in integer arithmetic on the distinct (user, day) table, so the
    // corpus-sized work ends at one distinct. Per user: active days,
    // streak count, longest streak, and the longest streak's start day
    // (earliest on ties, resolved by an explicit len-match join — never
    // an unordered first()). One user-partitioned window over day
    // counts; the q48 shuffle contract.
    NamedQuery(
      "q186_activity_streaks",
      (s, d) => {
        val ev = events(s, d)
        val anchor = ev.agg(min(to_date(col("ts"))).as("d0"))
        val days = ev.crossJoin(broadcast(anchor))
          .select(col("user_id"),
            datediff(to_date(col("ts")), col("d0")).cast("long").as("idx"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("idx"))
        val streaks = days
          .withColumn("grp", col("idx") - row_number().over(w).cast("long"))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"), min(col("idx")).as("start_idx"))
        val per = streaks.groupBy(col("user_id"))
          .agg(sum(col("len")).as("n_active_days"),
            count(lit(1)).as("n_streaks"), max(col("len")).as("longest"))
        val sr = streaks.select(col("user_id").as("s_uid"),
          col("len").as("s_len"), col("start_idx"))
        per.join(sr,
            col("s_uid") === col("user_id") && col("longest") === col("s_len"))
          .groupBy(col("user_id"), col("n_active_days"), col("n_streaks"),
            col("longest"))
          .agg(min(col("start_idx")).as("longest_start"))
      },
      Some("""WITH dy AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_diff('day',
             |      (SELECT MIN(CAST(ts AS DATE)) FROM events),
             |      CAST(ts AS DATE)) AS BIGINT) AS idx
             |  FROM events),
             |st AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
             |    MIN(idx) AS start_idx
             |  FROM (
             |    SELECT user_id, idx,
             |      idx - row_number() OVER (PARTITION BY user_id
             |        ORDER BY idx) AS grp
             |    FROM dy)
             |  GROUP BY user_id, grp),
             |per AS (
             |  SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
             |    CAST(COUNT(*) AS BIGINT) AS n_streaks,
             |    MAX(len) AS longest
             |  FROM st GROUP BY user_id)
             |SELECT p.user_id, p.n_active_days, p.n_streaks, p.longest,
             |  MIN(s.start_idx) AS longest_start
             |FROM per p JOIN st s
             |  ON s.user_id = p.user_id AND s.len = p.longest
             |GROUP BY p.user_id, p.n_active_days, p.n_streaks,
             |  p.longest""".stripMargin)),

    // ----- q190: peak session concurrency (distributed sweep line) --------
    // The capacity-planning number: how many sessions are open AT ONCE.
    // Interval-overlap counting as a sweep line — every session emits
    // +1 at its start and −1 just past its inclusive end, and the
    // running sum over the totally-ordered boundary stream (ends before
    // starts on timestamp ties, so back-to-back sessions never
    // double-count) IS the concurrency curve. The global prefix uses
    // the q136/q140 phased shape: within-hour-bucket running windows
    // plus bucket-level offsets from the bounded bucket table — never a
    // single global-order window over the boundary stream. All integer
    // arithmetic; reported as the per-day maximum (the dashboard
    // grain). Sessions are q122's 30-minute-gap rule, unchanged.
    NamedQuery(
      "q190_max_concurrency",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // pinned (r18 optimization): both sides of the boundary-stream
        // union read `sess` — unpinned, the events scan + two
        // sessionization windows ran twice.
        val sess = graft.ops.OpsKit.pinned(events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_sess")).over(wc))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(unix_micros(col("ts"))).as("t0"),
            max(unix_micros(col("ts"))).as("t1")))
        val bounds = sess.select(col("t0").as("t"), lit(1L).as("delta"),
            col("user_id"), col("sid"))
          .unionByName(sess.select((col("t1") + 1).as("t"),
            lit(-1L).as("delta"), col("user_id"), col("sid")))
          .withColumn("b", expr("t div 3600000000"))
        val wRun = Window.partitionBy(col("b"))
          .orderBy(col("t"), col("delta"), col("user_id"), col("sid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = bounds.groupBy(col("b")).agg(sum(col("delta")).as("tb"))
          .select(col("b"), coalesce(sum(col("tb")).over(wOff), lit(0L))
            .as("boff"))
        bounds.join(broadcast(off), "b")
          .withColumn("conc", col("boff") + sum(col("delta")).over(wRun))
          .groupBy(expr("t div 86400000000").as("day_idx"))
          .agg(max(col("conc")).as("max_concurrent"),
            sum(when(col("delta") === 1L, 1L).otherwise(0L))
              .as("n_starts"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |f AS (
             |  SELECT user_id, us, ts, event_id,
             |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM o),
             |sess AS (
             |  SELECT user_id, sid, MIN(us) AS t0, MAX(us) AS t1 FROM (
             |    SELECT user_id, us,
             |      SUM(new_sess) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |        AS sid
             |    FROM f)
             |  GROUP BY user_id, sid),
             |bounds AS (
             |  SELECT t0 AS t, CAST(1 AS BIGINT) AS delta, user_id, sid
             |  FROM sess
             |  UNION ALL
             |  SELECT t1 + 1, CAST(-1 AS BIGINT), user_id, sid FROM sess),
             |curve AS (
             |  SELECT t, delta,
             |    SUM(delta) OVER (ORDER BY t, delta, user_id, sid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS conc
             |  FROM bounds)
             |SELECT t // 86400000000 AS day_idx,
             |  CAST(MAX(conc) AS BIGINT) AS max_concurrent,
             |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_starts
             |FROM curve GROUP BY t // 86400000000""".stripMargin)),

    // ----- q206: retention cohort matrix ----------------------------------
    // The product-analytics staple every warehouse team rebuilds: users
    // cohorted by FIRST-ACTIVE day, tracked for 7 day-offsets — cell
    // (c, k) = how many of cohort c came back on day c+k, plus the
    // retention share against the cohort's size. Day index is exact
    // integer micros-since-epoch div 86400000000 (no calendar/timezone
    // functions — the q190 day-bucket rule), the share a single double
    // ratio of two BIGINTs. Scale shape: ONE distinct shuffle to the
    // (user, day) activity grid (far smaller than events), a per-user
    // min-agg for the cohort day (partial-aggregable, never a window
    // over raw events), one join back keyed on user_id, and a
    // cohort-bounded rollup. Nothing is ever user×day dense — only
    // observed activity rows flow.
    NamedQuery(
      "q206_retention_cohorts",
      (s, d) => {
        val ud = events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val cohort = ud.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        val sizes = cohort.groupBy(col("cohort_day"))
          .agg(count(lit(1)).as("cohort_n"))
        ud.join(cohort, "user_id")
          .select(col("cohort_day"),
            (col("day") - col("cohort_day")).as("offset"))
          .filter(col("offset") <= 7)
          .groupBy(col("cohort_day"), col("offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort_day")
          .select(col("cohort_day"), col("offset"), col("n_active"),
            col("cohort_n"),
            (col("n_active").cast("double") /
              col("cohort_n").cast("double")).as("retention"))
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(ts) // 86400000000 AS day
             |  FROM events),
             |cohort AS (
             |  SELECT user_id, MIN(day) AS cohort_day
             |  FROM ud GROUP BY user_id),
             |sizes AS (
             |  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
             |  FROM cohort GROUP BY cohort_day),
             |act AS (
             |  SELECT c.cohort_day, ud.day - c.cohort_day AS "offset",
             |    CAST(COUNT(*) AS BIGINT) AS n_active
             |  FROM ud JOIN cohort c ON ud.user_id = c.user_id
             |  WHERE ud.day - c.cohort_day <= 7
             |  GROUP BY 1, 2)
             |SELECT a.cohort_day, a."offset", a.n_active, s.cohort_n,
             |  CAST(a.n_active AS DOUBLE) / CAST(s.cohort_n AS DOUBLE)
             |    AS retention
             |FROM act a JOIN sizes s USING (cohort_day)""".stripMargin)),

    // ----- q207: SCD2 state timeline from the event stream ----------------
    // The slowly-changing-dimension reconstruction every CDC pipeline
    // runs: a user's event stream compressed to STATE intervals — a new
    // interval opens only when event_type CHANGES (consecutive
    // same-type events collapse), valid_to = the next state's start
    // (SCD2's closed-open convention; each user's final open interval
    // is excluded — it has no end yet). Reported per state: interval
    // count, total dwell micros (exact BIGINT sums of micros
    // differences — no float time math), and mean dwell hours as one
    // double ratio. Shape: two per-user windows (lag to mark changes,
    // lead over the CHANGE rows only for the interval end) on the same
    // (user_id, ts) sort — Spark plans one exchange+sort and reuses it
    // — then a state-bounded rollup. At 100 TB this is the single-sort
    // sessionization shape; no self-join, no interval explosion.
    NamedQuery(
      "q207_scd2_dwell",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val marked = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        val w2 = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        marked
          .withColumn("valid_to", lead(unix_micros(col("ts")), 1).over(w2))
          .filter(col("valid_to").isNotNull)
          .select(col("event_type"),
            (col("valid_to") - unix_micros(col("ts"))).as("dwell_us"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dwell_us")).as("total_us"))
          .select(col("event_type"), col("n_intervals"), col("total_us"),
            (col("total_us").cast("double") / lit(3600000000.0) /
              col("n_intervals").cast("double")).as("mean_dwell_hours"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |changes AS (
             |  SELECT user_id, epoch_us(ts) AS us, ts, event_id, event_type
             |  FROM o
             |  WHERE prev_type IS NULL OR prev_type <> event_type),
             |iv AS (
             |  SELECT event_type,
             |    lead(us) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) - us AS dwell_us
             |  FROM changes)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
             |  CAST(SUM(dwell_us) AS BIGINT) AS total_us,
             |  CAST(SUM(dwell_us) AS DOUBLE) / 3600000000.0
             |    / CAST(COUNT(*) AS DOUBLE) AS mean_dwell_hours
             |FROM iv WHERE dwell_us IS NOT NULL
             |GROUP BY event_type""".stripMargin)),

    // ----- q237: inter-arrival burstiness per stream ------------------------
    // Is a stream's arrival process Poisson or bursty? The
    // coefficient-of-variation test on per-user inter-arrival gaps: a
    // memoryless process has CV ≈ 1, human sessions cluster (CV > 1),
    // a rate-limited machine feed is regular (CV < 1); Goh & Barabási's
    // B = (CV−1)/(CV+1) maps it onto [−1, 1]. Gaps are integer
    // microseconds from the SAME per-user lag window every sessionizer
    // here uses (bounded per-user partitions, q122's shape); (n, Σg,
    // Σg²) accumulate in DECIMAL(38,0) (Σg² passes 2^63 at ~hours-long
    // gaps), and CV is one identical double tree with one IEEE sqrt.
    NamedQuery(
      "q237_interarrival_cv",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = OpsKit.events(s, d)
          .select(col("event_type"), col("user_id"), col("ts"),
            col("event_id"), expr("unix_micros(ts)").as("us"))
          .withColumn("g", col("us") - lag(col("us"), 1).over(w))
          .filter(col("g").isNotNull)
        val st = gaps.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(expr("CAST(g AS DECIMAL(38,0))")).cast("double").as("sg"),
          sum(expr("CAST(g AS DECIMAL(38,0)) * g")).cast("double")
            .as("sgg"))
        val nd = col("n").cast("double")
        val mean = col("sg") / nd
        val cv = sqrt(col("sgg") / nd - mean * mean) / mean
        st.select(col("event_type"), col("n"),
          (mean / lit(1000000.0)).as("mean_gap_s"),
          cv.as("cv"),
          ((cv - lit(1.0)) / (cv + lit(1.0))).as("burstiness"),
          (cv > lit(1.5)).as("bursty"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS g
             |  FROM events),
             |st AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(g AS HUGEINT)) AS DOUBLE) AS sg,
             |    CAST(SUM(CAST(g AS HUGEINT) * g) AS DOUBLE) AS sgg
             |  FROM g WHERE g IS NOT NULL GROUP BY event_type),
             |m AS (
             |  SELECT event_type, n, sg / CAST(n AS DOUBLE) AS mean,
             |    sqrt(sgg / CAST(n AS DOUBLE)
             |      - (sg / CAST(n AS DOUBLE))
             |        * (sg / CAST(n AS DOUBLE)))
             |      / (sg / CAST(n AS DOUBLE)) AS cv
             |  FROM st)
             |SELECT event_type, n, mean / 1000000.0 AS mean_gap_s, cv,
             |  (cv - 1.0) / (cv + 1.0) AS burstiness,
             |  cv > 1.5 AS bursty
             |FROM m""".stripMargin)),
  )
}
