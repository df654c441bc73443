package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{CreditsPipeline, KeywordsPipeline, MoviesPipeline}

/** Golden-fixture test of the full reference ETL (FIXTURES.md §A): the
  * miniature CSVs cover every quirk row — bad ids, zero budget, repeated
  * genre, duplicate movie rows (last-wins), shared person in cast+crew
  * (first-wins), language name backfill, unrated movie, multi-line cells.
  * Expected values are hand-derived from the reference semantics
  * (loader.py:95-234, 238-310, 313-336).
  */
class EtlPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val mt = MoviesPipeline.fromCsv(spark,
    TestSpark.fixture("movies_metadata.csv"), TestSpark.fixture("ratings.csv"))
  private lazy val ct = CreditsPipeline.fromCsv(spark,
    TestSpark.fixture("credits.csv"))
  private lazy val kt = KeywordsPipeline.fromCsv(spark,
    TestSpark.fixture("keywords.csv"))

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("movies hub: coercions, last-wins, rating left join, FKs") {
    val got = mt.movies.collect().map(r => r.getAs[Int]("id") -> r).toMap
    assert(got.keySet == Set(11, 12, 13, 15))

    val m11 = got(11)
    assert(m11.getAs[String]("title") == "Star Wars")
    assert(m11.getAs[String]("release_date") == "1977-05-25")
    assert(m11.getAs[Long]("budget") == 11000000L)
    assert(m11.getAs[Long]("revenue") == 775398007L)
    assert(m11.getAs[Double]("popularity") == 42.1)
    assert(m11.getAs[Int]("runtime") == 121)
    assert(m11.getAs[Double]("rating") == 4.5)
    assert(m11.getAs[Int]("original_language") == 0)
    assert(m11.getAs[Int]("belongs_to_collection") == 10)

    val m12 = got(12)
    assert(m12.getAs[String]("title") == "Miller's Crossing")
    // 0 / 0.0 / -5 / empty → NULL (loader.py:132-142)
    assert(m12.isNullAt(m12.fieldIndex("budget")))
    assert(m12.isNullAt(m12.fieldIndex("revenue")))
    assert(m12.isNullAt(m12.fieldIndex("popularity")))
    assert(m12.isNullAt(m12.fieldIndex("runtime")))
    assert(m12.isNullAt(m12.fieldIndex("overview")))
    assert(m12.isNullAt(m12.fieldIndex("release_date")))
    assert(m12.getAs[Double]("rating") == 3.0)
    assert(m12.getAs[Int]("original_language") == 1)
    assert(m12.isNullAt(m12.fieldIndex("belongs_to_collection")))

    // duplicate id 13 → LAST row wins; no ratings → NULL
    val m13 = got(13)
    assert(m13.getAs[String]("title") == "Second Version")
    assert(m13.getAs[String]("release_date") == "2001-02-03")
    assert(m13.isNullAt(m13.fieldIndex("rating")))
    assert(m13.getAs[Int]("original_language") == 0) // en, reused id

    // missing original_language → the 'nan' sentinel's dense id
    // (loader.py:163 has no validity guard; NaN mints a real entry)
    val m15 = got(15)
    assert(m15.getAs[Int]("original_language") == 3)
  }

  test("strict quirk mode keeps the reference's literal 'nan' overview") {
    val strict = MoviesPipeline.fromCsv(spark,
      TestSpark.fixture("movies_metadata.csv"),
      TestSpark.fixture("ratings.csv"),
      graft.etl.ReferenceQuirks.strict)
    val got = strict.movies.collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[String]("overview")).toMap
    // row 12's overview cell is empty: pandas reads it as NaN and the
    // reference serializes the literal 'nan' (loader.py:141-142)
    assert(got(12) == "nan")
    // non-empty overviews are untouched by the quirk
    assert(got(11) == "A long time ago in a galaxy far away")
    // and the default mode emits NULL for the same row (documented
    // deviation) — asserted against the shared `mt` build
    val def12 = mt.movies.filter(col("id") === 12).head()
    assert(def12.isNullAt(def12.fieldIndex("overview")))
  }

  test("languages: dense first-appearance ids + O-9 name backfill") {
    assert(rows(mt.languages) == Set(
      Seq(0, "en", "English"),   // minted by orig, backfilled by spoken
      Seq(1, "fr", "Français"),  // 'English Dup' loses: name already set
      Seq(2, "de", null),        // never named
      Seq(3, "nan", null),       // NaN sentinel from row 15's missing lang
      Seq(4, "ja", "Japanese"))) // minted AFTER the sentinel (orig first)
  }

  test("countries: dense ids, first-sighting name wins") {
    assert(rows(mt.countries) == Set(
      Seq(0, "US", "United States of America"), // 'US Dup' loses
      Seq(1, "JP", "Japan")))
  }

  test("genres dim: first-wins from ALL rows incl. overwritten; skipped row excluded") {
    assert(rows(mt.genres) == Set(
      Seq(12, "Adventure"), // 'Adventure Dup' loses within the same cell
      Seq(28, "Action"),    // 'Action 2' (row 13b) loses to row 11
      Seq(16, "Animation"), // from the overwritten 13a row — still in dim
      Seq(99, null)))       // name None → NULL; 'IGNORED' (bad id row) absent
  }

  test("collections and production companies dims") {
    assert(rows(mt.collections) == Set(Seq(10, "Star Wars Collection")))
    assert(rows(mt.productionCompanies) == Set(
      Seq(1, "Lucasfilm"), // 'Lucasfilm Dup' loses
      Seq(2, "Ghibli")))
  }

  test("bridges: set-dedup over last-wins hub rows") {
    assert(rows(mt.moviesGenres) == Set(
      Seq(11, 12), Seq(11, 28), // dup genre 12 collapsed
      Seq(13, 28), Seq(13, 99))) // 13a's genre 16 gone (last-wins)
    assert(rows(mt.spokenLanguages) == Set(
      Seq(11, 0), Seq(12, 1), Seq(12, 0), Seq(15, 4)))
    assert(rows(mt.productionCountries) == Set(
      Seq(11, 0), Seq(12, 0), Seq(13, 1)))
    assert(rows(mt.moviesProductionCompanies) == Set(
      Seq(11, 1), Seq(12, 1), Seq(13, 2)))
  }

  test("persons: first-wins across crew-before-cast (A-6)") {
    assert(rows(ct.persons) == Set(
      Seq(2, "MH Crew"),        // crew name beats cast 'Mark Hamill'
      Seq(3, "Harrison Ford"),  // 'HF Again' (row 14) loses
      Seq(7, "George Lucas"),   // 'GL Dup' (row 12) loses
      Seq(8, "No Job Person"),  // no 'job' key → persons only
      Seq(9, "Joel")))
  }

  test("directors: job == 'Director' filter, set-dedup (J-3)") {
    // the later duplicate row for 12 has an EMPTY crew → must not erase
    // (loader.py:265 `if len(crew.keys()) > 0`); 14's duplicate crew has
    // only a job-less entry → also counts as empty
    assert(rows(ct.directors) == Set(Seq(11, 7), Seq(12, 7), Seq(12, 9)))
  }

  test("actors: billing order kept, duplicates preserved (X-6)") {
    val got = ct.actors.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    // 12's later non-empty cast DOES overwrite (empty first version);
    // 14's later EMPTY cast does NOT (loader.py:274 `if len(cast) > 0`)
    assert(got.sorted.toSeq == Seq(
      (11, 2, 0), (11, 2, 5), (11, 3, 1), (12, 3, 2), (14, 3, 0)))
    assert(got.length == 5) // person 2 twice — list, not set
  }

  test("keywords: first-wins names, accumulating movie sets (A-7)") {
    assert(rows(kt.keywords) == Set(
      Seq(931, "jealousy"), // 'jealousy dup' loses
      Seq(1, "space"), Seq(2, "robot")))
    assert(rows(kt.moviesKeywords) == Set(
      Seq(11, 931), Seq(11, 1), Seq(12, 931), Seq(11, 2)))
  }
}
