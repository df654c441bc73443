package graft.ops

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
  *    truncate weeks to ISO Monday, and counts are exact.
  */
object AnalyticsOps {
  import OpsKit._

  def all: Seq[NamedQuery] = Seq(

    // ----- q68: funnel conversion (signup → click → purchase) -------------
    NamedQuery(
      "q68_funnel",
      (s, d) => {
        val ev = events(s, d)
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
  )
}
