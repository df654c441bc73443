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
  *    The oracle is the direct inequality join.
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
  )
}
