package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's four CSV inputs and the nested
  * Python-literal payloads inside them (SURVEY.md §1.3; reference
  * loader.py:97-104, 240-243, 287-290, 315-318; db_schema.json).
  *
  * All CSV columns are read as strings — the reference's own coercions
  * (int-or-skip, positive-or-NULL) are applied downstream as typed
  * expressions, never left to CSV type inference, so a malformed cell can
  * never flip a whole column's type the way pandas inference can.
  */
object RefSchemas {

  private def allString(names: String*): StructType =
    StructType(names.map(StructField(_, StringType)))

  /** movies_metadata.csv — the 14 relevant columns (loader.py:97-101). */
  val moviesCsv: StructType = allString(
    "id", "original_title", "belongs_to_collection", "original_language",
    "spoken_languages", "production_companies", "production_countries",
    "release_date", "genres", "budget", "popularity", "revenue", "runtime",
    "overview")

  /** credits.csv (loader.py:240). */
  val creditsCsv: StructType = allString("id", "cast", "crew")

  /** keywords.csv (loader.py:287). */
  val keywordsCsv: StructType = allString("id", "keywords")

  /** ratings.csv (loader.py:315). */
  val ratingsCsv: StructType = allString("movieId", "rating")

  // ---- nested Python-literal payload schemas (after py_to_json) ----------

  /** genres / keywords / production_companies: `[{'id': …, 'name': …}]`. */
  val idName: ArrayType = ArrayType(StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType))))

  /** belongs_to_collection: single `{'id': …, 'name': …}` dict. */
  val collection: StructType = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  /** spoken_languages: `[{'iso_639_1': …, 'name': …}]` (loader.py:175). */
  val spokenLanguages: ArrayType = ArrayType(StructType(Seq(
    StructField("iso_639_1", StringType), StructField("name", StringType))))

  /** production_countries: `[{'iso_3166_1': …, 'name': …}]` (loader.py:207). */
  val productionCountries: ArrayType = ArrayType(StructType(Seq(
    StructField("iso_3166_1", StringType), StructField("name", StringType))))

  /** credits.crew entries (loader.py:258-263); extra Kaggle keys are simply
    * not projected by the schema. A missing 'job' key → null. */
  val crew: ArrayType = ArrayType(StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("job", StringType))))

  /** credits.cast entries keep billing order (loader.py:269-276). */
  val cast: ArrayType = ArrayType(StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("order", IntegerType))))
}
