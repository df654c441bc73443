package graft.ops

import org.apache.spark.sql.functions._

/** Time-window operator surface over `events` (SURVEY.md §2.7): batch-mode
  * equivalents of the Structured Streaming windows in
  * [[graft.streaming.StreamOps]], so the DuckDB oracle can check them.
  * Window starts are emitted as formatted strings — the only transport the
  * two engines are guaranteed to agree on.
  */
object TimeWindowOps {
  import OpsKit._

  def all: Seq[NamedQuery] = Seq(

    // Tumbling 1h window: equivalent to groupBy(window($"ts", "1 hour")).
    NamedQuery(
      "q19_tumbling_window",
      (s, d) =>
        events(s, d)
          .groupBy(date_format(date_trunc("hour", col("ts")), TsFmt)
            .as("window_start"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '$TsFmtDuck') AS window_start,
              |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // Sliding window, size 1h / slide 30m: each event lands in 2 windows.
    // Oracle reproduces Spark's window assignment: starts at
    // align_30m(ts) and align_30m(ts) - 30m.
    NamedQuery(
      "q20_sliding_window",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(date_format(col("window.start"), TsFmt).as("window_start"),
            col("n"), col("sum_value")),
      Some(s"""SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
              |    - k * INTERVAL '30 minutes', '$TsFmtDuck') AS window_start,
              |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events, unnest([0, 1]) AS u(k)
              |GROUP BY 1""".stripMargin)),

    // Session window, 10-minute gap, per user. Spark session semantics:
    // an event extends the session iff ts < prev_ts + gap, so a gap of
    // exactly 10min starts a new session — the oracle uses >=.
    NamedQuery(
      "q21_session_window",
      (s, d) => {
        val df = events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        df.select(col("user_id"),
          date_format(col("session_window.start"), TsFmt).as("session_start"),
          col("n_events"), col("sum_value"))
      },
      Some(s"""WITH marked AS (
              |  SELECT user_id, ts, value,
              |    CASE WHEN lag(ts) OVER w IS NULL
              |           OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
              |), numbered AS (
              |  SELECT user_id, ts, value,
              |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              |      ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM marked)
              |SELECT user_id, strftime(MIN(ts), '$TsFmtDuck') AS session_start,
              |  COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
              |FROM numbered GROUP BY user_id, sid""".stripMargin)),

    // Lag/lead analytics over the event stream (§2.6 extension surface):
    // per-user delta between consecutive purchase values.
    NamedQuery(
      "q22_lag_delta",
      (s, d) =>
        events(s, d).filter(col("event_type") === "purchase")
          .withColumn("prev_value", lag(col("value"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))))
          .select(col("event_id"), col("user_id"), col("value"),
            col("prev_value")),
      Some("""SELECT event_id, user_id, value,
             |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS prev_value
             |FROM events WHERE event_type = 'purchase'""".stripMargin)),
  )
}
