package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.RefSchemas

/** Pipeline B (SURVEY.md §3): credits.csv → persons, directors, actors
  * (reference loader.py:238-282, 494-523).
  *
  * Semantics reproduced:
  *  - bad movie id → row skipped (loader.py:250-255);
  *  - duplicate movie id → LAST *non-empty* row wins, per column: the
  *    reference only stores a row's crew when the crew dict has ≥1 entry
  *    (`if len(crew.keys()) > 0`, loader.py:265) and a row's cast when the
  *    list is non-empty (`if len(cast) > 0`, loader.py:274) — so a later
  *    duplicate with an empty cast/crew does NOT erase the earlier data.
  *    A crew entry enters the dict only if it has a 'job' key, so a crew
  *    made solely of job-less entries counts as empty. (Our struct parse
  *    cannot distinguish a missing 'job' key from an explicit `'job': None`;
  *    the reference would treat the latter as a non-empty crew keyed on
  *    None — not observed in the dataset, documented deviation);
  *  - persons dedup is FIRST-wins across ALL rows, with crew processed
  *    before cast within each row (loader.py:258-276);
  *  - a crew entry with no 'job' key joins persons but not the crew map
  *    (loader.py:259);
  *  - directors = crew entries with job == 'Director', set-dedup per movie
  *    (loader.py:506-513);
  *  - actors keep the cast LIST as-is — duplicates preserved, billing
  *    order kept (loader.py:269-276, 515-521).
  */
object CreditsPipeline {
  import EtlKit._

  final case class CreditsTables(
      persons: DataFrame,
      directors: DataFrame,
      actors: DataFrame)

  def fromCsv(spark: SparkSession, creditsCsvPath: String): CreditsTables =
    build(readCsv(spark, creditsCsvPath, RefSchemas.creditsCsv))

  def build(creditsRaw: DataFrame): CreditsTables = {
    val base = creditsRaw
      .withColumn("movie_id", strictInt(col("id")).cast("int"))
      .filter(col("movie_id").isNotNull)
      .select(col("movie_id"), col(SeqCol),
        parsePy(col("crew"), RefSchemas.crew).as("crew_a"),
        parsePy(col("cast"), RefSchemas.cast).as("cast_a"))
      .cache()

    // Last-wins among rows where the column is non-empty (loader.py:265,
    // 274): empty duplicates never overwrite.
    val wLast = Window.partitionBy(col("movie_id")).orderBy(col(SeqCol).desc)
    def lastNonEmpty(nonEmptyRow: org.apache.spark.sql.Column): DataFrame =
      base.filter(nonEmptyRow)
        .withColumn("_rn", row_number().over(wLast))
        .filter(col("_rn") === 1).drop("_rn")
    // crew counts as non-empty only if some entry has a 'job' key
    val crewHub = lastNonEmpty(exists(col("crew_a"), p => p("job").isNotNull))
    val castHub = lastNonEmpty(size(col("cast_a")) > 0)

    // ---- persons: first-wins across (row, crew-before-cast, position) ----
    val crewSight = base
      .select(col(SeqCol).as("seq"), posexplode(col("crew_a")).as(Seq("pos", "p")))
      .select(col("seq"), lit(0).as("stream"), col("pos"),
        col("p.id").as("pid"), col("p.name").as("pname"))
    val castSight = base
      .select(col(SeqCol).as("seq"), posexplode(col("cast_a")).as(Seq("pos", "p")))
      .select(col("seq"), lit(1).as("stream"), col("pos"),
        col("p.id").as("pid"), col("p.name").as("pname"))
    // A-6: union of the two explode streams + first-wins dedup. Persons can
    // be fact-scale, so this is a plain shuffled hash aggregation on id —
    // no global window anywhere.
    val persons = crewSight.unionByName(castSight)
      .filter(col("pid").isNotNull)
      .groupBy(col("pid").as("id"))
      .agg(min(struct(col("seq"), col("stream"), col("pos"),
        col("pname").as("name"))).as("first"))
      .select(col("id"), col("first.name").as("name"))

    // ---- directors: J-3 filter + set-dedup over last-wins rows -----------
    val directors = crewHub
      .select(col("movie_id"), explode(col("crew_a")).as("p"))
      .filter(col("p.job") === "Director")
      .select(col("movie_id"), col("p.id").as("director_id"))
      .filter(col("director_id").isNotNull)
      .distinct()

    // ---- actors: X-6 explode keeping billing order, duplicates kept ------
    val actors = castHub
      .select(col("movie_id"), explode(col("cast_a")).as("p"))
      .select(col("movie_id"), col("p.id").as("person_id"),
        col("p.order").as("order_id"))
      .filter(col("person_id").isNotNull)

    CreditsTables(persons, directors, actors)
  }
}
