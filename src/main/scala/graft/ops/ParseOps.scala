package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-document parsing surface (SURVEY.md §2.2 P-10, §2.3 X-1..X-7,
  * §2.4 O-9): the reference's Python-literal columns re-created from
  * testdata, parsed with the native [[graft.parse.PyToJson]] expression,
  * then exploded/deduped exactly like the movies pipeline does.
  *
  * The queries CONSTRUCT the Python literal inside the query (from document
  * columns), so the DuckDB oracle can state the expected round-trip output
  * directly from the source columns — the parser is the only thing under
  * test. Apostrophes, `None`, and escaped quotes are injected on purpose.
  */
object ParseOps {
  import OpsKit._

  private val pyParse = (c: org.apache.spark.sql.Column) =>
    call_function("py_to_json", c)

  def all: Seq[NamedQuery] = Seq(

    // ----- q23: P-10 round-trip through py_to_json + from_json ------------
    // Literal shape mirrors a movies_metadata nested cell
    // (loader.py:146): list of one dict, single-quoted strings, an escaped
    // apostrophe (`it\'s`), and None for a missing value.
    NamedQuery(
      "q23_pyliteral_roundtrip",
      (s, d) => {
        val docs = tbl(s, d, "documents")
        val escText = replace(replace(col("text"), lit("\\"), lit("\\\\")),
          lit("'"), lit("\\'"))
        val pyLit = concat(
          lit("[{'id': "), col("doc_id").cast("string"),
          lit(", 'lang': '"), col("lang"),
          lit("', 'src': "),
          when(col("source") === "src0", lit("None"))
            .otherwise(concat(lit("'"), col("source"), lit("'"))),
          lit(", 'txt': 'it\\'s "), escText, lit("'}]"))
        val schema = ArrayType(StructType(Seq(
          StructField("id", LongType), StructField("lang", StringType),
          StructField("src", StringType), StructField("txt", StringType))))
        docs
          .select(explode(from_json(pyParse(pyLit), schema)).as("e"))
          .select(col("e.id").as("id"), col("e.lang").as("lang_out"),
            col("e.src").as("src_out"), col("e.txt").as("txt"))
      },
      Some("""SELECT doc_id AS id, lang AS lang_out,
             |  CASE WHEN source = 'src0' THEN NULL ELSE source END AS src_out,
             |  concat('it''s ', text) AS txt
             |FROM documents""".stripMargin)),

    // ----- q24: X-1-shaped nested explode + within-doc first-wins ---------
    // Builds a genres-like `[{'id': …, 'name': …}, …]` literal from the
    // first 5 tokens (id = token length → guaranteed collisions, so the
    // set-dedup path of loader.py:145-150 is actually exercised), parses,
    // posexplodes, and keeps the first occurrence per (doc, id).
    NamedQuery(
      "q24_nested_explode_firstwins",
      (s, d) => {
        val toks = slice(split(col("text"), " "), 1, 5)
        val pyLit = concat(lit("["),
          array_join(transform(toks, t =>
            concat(lit("{'id': "), length(t).cast("string"),
              lit(", 'name': '"), t, lit("'}"))), ", "),
          lit("]"))
        // id is LongType to match DuckDB's BIGINT length()
        val schema = ArrayType(StructType(Seq(
          StructField("id", LongType), StructField("name", StringType))))
        val exploded = tbl(s, d, "documents")
          .select(col("doc_id"),
            posexplode(from_json(pyParse(pyLit), schema)).as(Seq("pos", "g")))
        val w = Window.partitionBy(col("doc_id"), col("g.id"))
          .orderBy(col("pos"))
        exploded
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("g.id").as("id"),
            col("g.name").as("name"))
      },
      Some("""SELECT doc_id, id, name FROM (
             |  SELECT doc_id, length(l[i]) AS id, l[i] AS name,
             |    row_number() OVER (PARTITION BY doc_id, length(l[i])
             |      ORDER BY i) AS rn
             |  FROM (SELECT doc_id, string_split(text, ' ') AS l
             |        FROM documents),
             |       unnest(range(1, least(len(l), 5) + 1)) AS u(i))
             |WHERE rn = 1""".stripMargin)),

    // ----- q25: O-9 language-name backfill + O-8 dense surrogate keys -----
    // Reference semantics (loader.py:161-193): `original_language` sightings
    // create the dim row with name=NULL; a later `spoken_languages` record
    // supplies the name. First-appearance order mints the dense id; a lang
    // never named stays NULL ('de' here, by construction).
    NamedQuery(
      "q25_name_backfill",
      (s, d) => {
        val docs = tbl(s, d, "documents")
        // stream A: code sightings only (name unknown)
        val a = docs.select(col("lang"), lit(null).cast("string").as("lname"),
          (col("doc_id") * 2).as("seq"))
        // stream B: named sightings from one source, 'de' withheld
        val b = docs.filter(col("source") === "src1" && col("lang") =!= "de")
          .select(col("lang"),
            concat(upper(col("lang")), lit("-name")).as("lname"),
            (col("doc_id") * 2 + 1).as("seq"))
        val u = a.unionByName(b)
        val dims = u.groupBy(col("lang")).agg(min(col("seq")).as("first_seen"))
        val named = u.filter(col("lname").isNotNull)
          .groupBy(col("lang")).agg(min_by(col("lname"), col("seq")).as("name"))
        dims.join(named, Seq("lang"), "left")
          // post-aggregation dim rows only (5 langs) → 1-partition window OK
          .withColumn("lang_sk",
            (row_number().over(boundedWin.orderBy(col("first_seen"))) - 1)
              .cast("long"))
          .select(col("lang"), col("lang_sk"), col("name"))
      },
      Some("""WITH u AS (
             |  SELECT lang, CAST(NULL AS VARCHAR) AS lname, doc_id * 2 AS seq
             |  FROM documents
             |  UNION ALL
             |  SELECT lang, upper(lang) || '-name' AS lname, doc_id * 2 + 1 AS seq
             |  FROM documents WHERE source = 'src1' AND lang <> 'de')
             |SELECT d.lang,
             |  row_number() OVER (ORDER BY d.first_seen) - 1 AS lang_sk,
             |  n.name
             |FROM (SELECT lang, min(seq) AS first_seen FROM u GROUP BY lang) d
             |LEFT JOIN (SELECT lang, arg_min(lname, seq) AS name FROM u
             |           WHERE lname IS NOT NULL GROUP BY lang) n
             |USING (lang)""".stripMargin)),
  )
}
