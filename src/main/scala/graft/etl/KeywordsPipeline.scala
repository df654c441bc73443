package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.RefSchemas

/** Pipeline C (SURVEY.md §3): keywords.csv → keywords dim + movies_keywords
  * bridge (reference loader.py:285-310, 526-546).
  *
  * Unlike movies/credits there is NO last-wins here: duplicate movie rows
  * all contribute to the per-keyword movie set (the reference accumulates
  * into `extracted_keywords[id]['movies']` for every row, loader.py:302-309).
  * Keyword names are first-wins in scan order.
  */
object KeywordsPipeline {
  import EtlKit._

  final case class KeywordsTables(
      keywords: DataFrame,
      moviesKeywords: DataFrame)

  def fromCsv(spark: SparkSession, keywordsCsvPath: String): KeywordsTables =
    build(readCsv(spark, keywordsCsvPath, RefSchemas.keywordsCsv))

  def build(keywordsRaw: DataFrame): KeywordsTables = {
    val exp = keywordsRaw
      .withColumn("movie_id", strictInt(col("id")).cast("int"))
      .filter(col("movie_id").isNotNull)
      .select(col("movie_id"), col(SeqCol).as("seq"),
        posexplode(parsePy(col("keywords"), RefSchemas.idName))
          .as(Seq("pos", "k")))
      .filter(col("k.id").isNotNull)
      .select(col("movie_id"), col("seq"), col("pos"),
        col("k.id").as("keyword_id"), col("k.name").as("kname"))
      .cache()

    val keywords = exp
      .groupBy(col("keyword_id").as("id"))
      .agg(min(struct(col("seq"), col("pos"), col("kname").as("name")))
        .as("first"))
      .select(col("id"), col("first.name").as("keyword"))

    val moviesKeywords = exp
      .select(col("movie_id"), col("keyword_id"))
      .distinct()

    KeywordsTables(keywords, moviesKeywords)
  }
}
