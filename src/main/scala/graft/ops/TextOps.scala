package graft.ops

import org.apache.spark.sql.functions._

/** Text-analysis operator family over `documents` (LLM-pipeline surface):
  *
  *  - q33 language-ID: marker-token scoring (the n-gram/stopword heuristic
  *    shape — the marker lists here are derived from the synthetic corpus
  *    vocabulary; real per-language stopword lists drop in unchanged);
  *  - q34 quality scoring: length / stopword-ratio / uniqueness features
  *    combined into one double score (identical op order both engines);
  *  - q35 token counting: whitespace tokens + regex token classes (a
  *    BPE-ish `[a-z]{1,4}` chunker);
  *  - q36 document fingerprinting: polynomial rolling hash over the whole
  *    text + a winnowing-style minimum over 16-char window hashes;
  *  - q52 token-diversity Gini score (repetition detector);
  *  - q59 PII redaction: email/phone spans replaced with typed
  *    placeholders plus per-class counts (the corpus plants deterministic
  *    PII so recall is verifiable, mirroring the dedup corpora);
  *  - q60 vocabulary heavy hitters: global top-k tokens by frequency;
  *  - q61 intra-document repetition metrics (Gopher-style duplicate- and
  *    top-bigram fractions);
  *  - q62 unigram-LM document score (mean token probability + rare-token
  *    fraction against the corpus's own unigram distribution);
  *  - q77 BPE pair-merge statistics: corpus-weighted adjacent-character
  *    pair counts over the distinct-word table — tokenizer training
  *    step 1, vocabulary-sized work instead of token-stream-sized;
  *  - q84 iterated BPE merges: the k-round training loop over the same
  *    vocabulary-sized table (count pairs → argmax → apply merge),
  *    producing the learned merge table itself;
  *  - q88 BPE encode: applies the learned merges to the corpus — each
  *    distinct word encoded once, token stream joins the vocab-sized
  *    encoding table, per-doc BPE token counts out;
  *  - q91 vocabulary coverage / OOV rate: per-doc fraction of token
  *    occurrences outside the broadcast top-100 vocabulary;
  *  - q107 bigram-LM document score (mean joint bigram probability +
  *    surprising-transition fraction against the corpus's own bigram
  *    statistics — the conditional-LM counterpart of q62);
  *  - q110 TF-IDF top terms per source: vocabulary-bounded tf and df
  *    aggregates meet in one hash join, per-source top-5 window (idf as
  *    the plain ratio N/df — same ranking as ln-idf, cross-engine exact);
  *  - q118 PMI collocations: top word pairs by lift c12·N/(c1·c2) (the
  *    exp of PMI, so the same ranking, log-free) — marginals from ONE
  *    bigram aggregation, c12 ≥ 5 sparse-pair guard, TakeOrdered top-20;
  *  - q151 Good-Turing unseen-vocabulary mass per source (p0 = V1/N —
  *    the is-the-sample-big-enough gate for tokenizer training);
  *  - q155 Zipf slope of the vocabulary: OLS on integer floor-log2
  *    coordinates (exact cross-engine; natural-language shape check);
  *  - q157 surprise-bucket mixing report: q107's per-doc scores rolled
  *    into a (source, fixed-width surprise bucket) grid — the CCNet
  *    head/middle/tail selection table, zero extra shuffles;
  *  - q158 interpolated Kneser-Ney bigram document score: the
  *    continuation-count smoother (D = 0.75) over the same persisted
  *    bigram working set — mean smoothed probability + backoff mass.
  *
  * All per-row with no shuffle (q33-q36, q59), or hash-aggregated with
  * map-side partial aggregation (q52, q60-q62) — linear and partition-
  * independent at any corpus size.
  */
object TextOps {
  import OpsKit._

  private val Stop = Seq("the", "a")
  private val DbMarkers = Seq("table", "row", "query", "join", "column")
  private val ExecMarkers = Seq("scan", "merge", "sort", "hash", "filter")

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  private val HashMod = 1000000007L
  private val WinnowLen = 16

  /** The (doc_id, source, bg, k) bigram working set — each document's
    * adjacent word pairs, already collapsed to per-doc counts by the one
    * expensive explode + shuffle. Persisted: q107 (bigram LM), q118 (PMI
    * collocations), q157/q158, and q298 (DoReMi — the reason `source`
    * rides along: doc_id determines it, so the groupBy keys widen without
    * changing any count, and the mixture query joins nothing extra) all
    * derive every downstream table (corpus bigram counts, prefix/suffix
    * marginals, totals, per-source grids) from THIS output, and Spark's
    * plan-keyed cache manager gives them one shared in-memory copy per
    * session (the kmCorpus mechanism, SimilarityOps.scala:156-169). The
    * persisted set is (doc, bigram) distinct pairs — corpus-token scale,
    * the honest O(tokens) budget these operators already carry;
    * MEMORY_AND_DISK spills rather than OOMs at 100 TB. */
  private[graft] def docBigrams(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // the token array is BOUND in its own projection before the lambda
    // touches it — an inline split would re-tokenize the document once
    // per bigram element, O(len²) character work per doc (the HOF
    // recompute trap, bpeTrain's documented lesson; measured 3.0 s →
    // 0.25 s on the sf0.1 explode when this binding was added)
    val w = col("wt")
    tbl(s, d, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("wt"))
      .filter(size(w) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit("\u0001"),
            element_at(w, i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("source"), col("bg"))
      .agg(count(lit(1)).as("k"))
      .persist()
  }

  /** Per-document bigram-LM scores (doc_id, n_bigrams, mean_bigram_prob,
    * surprise_frac) over the persisted docBigrams working set — the body
    * of q107, extracted so q157's mixing buckets consume the SAME plan
    * (and the same oracle CTE chain, [[bigramScoreCteSql]]). */
  private def bigramDocScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val grouped = docBigrams(s, d)
    val counts = grouped.groupBy(col("bg"))
      .agg(sum(col("k")).as("c12"))
      .withColumn("w1", substring_index(col("bg"), "\u0001", 1))
    val prefix = counts.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val lm = counts.join(prefix, "w1")
    val total = counts.agg(sum(col("c12")).as("b_total"))
    grouped.join(lm, "bg")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        // Σ k·c in decimal, one trailing double division — cf. q62
        sum((col("k") * col("c12")).cast("decimal(38,0)")).as("sumc"),
        sum(when(col("c12") * 20 < col("c1"), col("k")).otherwise(0L))
          .as("n_surprise"),
        max(col("b_total")).as("b"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sumc").cast("double") /
          (col("n_bigrams").cast("double") * col("b").cast("double")))
          .as("mean_bigram_prob"),
        (col("n_surprise").cast("double") /
          col("n_bigrams").cast("double")).as("surprise_frac"))
  }

  /** The q107 oracle's CTE chain up to a `scores` table mirroring
    * [[bigramDocScores]] — shared verbatim by the q107 and q157 oracles
    * so the two can never drift. */
  private val bigramScoreCteSql: String =
    """tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |big AS (
      |  SELECT doc_id,
      |    unnest([w[i] || chr(1) || w[i+1]
      |            for i in range(1, len(w))]) AS bg
      |  FROM tok),
      |bgp AS (
      |  SELECT doc_id, bg, string_split(bg, chr(1))[1] AS w1
      |  FROM big),
      |c AS (SELECT bg, COUNT(*) AS c12 FROM bgp GROUP BY bg),
      |p AS (SELECT w1, COUNT(*) AS c1 FROM bgp GROUP BY w1),
      |n AS (SELECT CAST(SUM(c12) AS BIGINT) AS b FROM c),
      |scores AS (
      |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(c.c12) AS DOUBLE) /
      |      (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(n.b) AS DOUBLE))
      |        AS mean_bigram_prob,
      |    CAST(SUM(CASE WHEN c.c12 * 20 < p.c1 THEN 1 ELSE 0 END)
      |         AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS surprise_frac
      |  FROM bgp t JOIN c USING (bg) JOIN p USING (w1) CROSS JOIN n
      |  GROUP BY t.doc_id)""".stripMargin

  // ---- BPE training (shared by q84 learn-merges and q88 encode) ---------
  /** k rounds of count-pairs → argmax → apply-merge over the wrapped
    * vocabulary (see q84's operator comment for the full semantics and
    * parity argument). Returns the learned (step, pair, weight) merges;
    * the per-round argmax is ONE driver scalar, localCheckpoint truncates
    * lineage per round. */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int): Seq[(Long, String, Long)] = {
    var vocab: org.apache.spark.sql.DataFrame = tbl(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), concat(lit("("),
        array_join(split(col("tok"), ""), ")("), lit(")")).as("w"))
      .transform(pinned)
    val merges = Seq.newBuilder[(Long, String, Long)]
    for (step <- 1 to k) {
      // syms is BOUND in its own projection before the transform lambda
      // touches it — an inline split expression would re-evaluate once
      // per outer lambda element (the HOF recompute trap, q31 lesson)
      val best = vocab
        .select(col("freq"),
          split(expr("substring(w, 2, length(w) - 2)"), "\\)\\(")
            .as("syms"))
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1), i =>
            concat(lit("("), element_at(col("syms"), i), lit(")("),
              element_at(col("syms"), i + 1), lit(")"))))
          .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("wt"))
        .orderBy(col("wt").desc, col("pair")).limit(1)
        .head()
      val pair = best.getString(0)
      merges += ((step.toLong, pair, best.getLong(1)))
      if (step < k) vocab = pinned(vocab.select(col("freq"),
        replace(col("w"), lit(pair), lit(pair.replace(")(", ""))).as("w")))
    }
    merges.result()
  }

  /** One merge round's pair-count CTE over a vocab CTE `vn`(freq, w). */
  private def bpePairsCte(pn: String, vn: String): String = {
    val syms = "string_split(substr(w, 2, len(w) - 2), ')(')"
    s"""$pn AS (
       |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS wt FROM (
       |    SELECT freq, unnest(
       |      CASE WHEN len($syms) >= 2
       |        THEN [('(' || $syms[i] || ')(' || $syms[i + 1] || ')')
       |              for i in range(1, len($syms))]
       |        ELSE [] END) AS pair
       |    FROM $vn)
       |  GROUP BY pair)""".stripMargin
  }

  private def bpeBestCte(bn: String, pn: String): String =
    s"$bn AS (SELECT pair, wt FROM $pn ORDER BY wt DESC, pair LIMIT 1)"

  private def bpeApplyCte(vn1: String, vn0: String, bn: String): String =
    s"""$vn1 AS (
       |  SELECT freq, replace(w, (SELECT pair FROM $bn),
       |    replace((SELECT pair FROM $bn), ')(', '')) AS w
       |  FROM $vn0)""".stripMargin

  /** (tok, n_syms) for every distinct input token: wrap each character as
    * `(c)(c)…`, apply the learned merges in training order, and count the
    * surviving symbol groups — the encode table q88 (per-doc) and q102
    * (per-source) both join the token stream against. Vocabulary-sized
    * work: the fold runs over distinct tokens, never the token stream. */
  private def bpeSymbols(merges: Seq[String],
      toks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wrapped = toks.distinct()
      .select(col("tok"), concat(lit("("),
        array_join(split(col("tok"), ""), ")("), lit(")")).as("w"))
    merges.foldLeft(wrapped)((df, pair) =>
      df.withColumn("w",
        replace(col("w"), lit(pair), lit(pair.replace(")(", "")))))
      .select(col("tok"),
        (length(col("w")) -
          length(replace(col("w"), lit("("), lit(""))))
          .cast("long").as("n_syms"))
  }

  /** The k=3 training CTE chain `vt, v0, p1, b1, v1, …, p3, b3` shared by
    * the q84, q88, and q102 oracles — b1..b3 hold the learned merges. */
  private def bpeTrainCtes: String =
    s"""vt AS (
       |  SELECT tok, COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  GROUP BY tok),
       |v0 AS (
       |  SELECT freq,
       |    '(' || array_to_string(list_transform(
       |      range(1, len(tok) + 1), i -> tok[i:i]), ')(') || ')' AS w
       |  FROM vt),
       |${bpePairsCte("p1", "v0")},
       |${bpeBestCte("b1", "p1")},
       |${bpeApplyCte("v1", "v0", "b1")},
       |${bpePairsCte("p2", "v1")},
       |${bpeBestCte("b2", "p2")},
       |${bpeApplyCte("v2", "v1", "b2")},
       |${bpePairsCte("p3", "v2")},
       |${bpeBestCte("b3", "p3")}""".stripMargin

  def all: Seq[NamedQuery] = Seq(

    // ----- q33: marker-based language/domain identification ---------------
    NamedQuery(
      "q33_lang_id",
      (s, d) => {
        val toks = split(col("text"), " ")
        val sEn = size(filter(toks, t => t.isin(Stop: _*))).cast("long")
        val sDb = size(filter(toks, t => t.isin(DbMarkers: _*))).cast("long")
        val sEx = size(filter(toks, t => t.isin(ExecMarkers: _*))).cast("long")
        tbl(s, d, "documents").select(
          col("doc_id"), sEn.as("s_en"), sDb.as("s_db"), sEx.as("s_exec"),
          when(sEn >= sDb && sEn >= sEx, "en")
            .when(sDb >= sEx, "db").otherwise("exec").as("predicted"))
      },
      Some(s"""SELECT doc_id,
              |  len(list_filter(string_split(text,' '),
              |      t -> t IN ${sqlList(Stop)})) AS s_en,
              |  len(list_filter(string_split(text,' '),
              |      t -> t IN ${sqlList(DbMarkers)})) AS s_db,
              |  len(list_filter(string_split(text,' '),
              |      t -> t IN ${sqlList(ExecMarkers)})) AS s_exec,
              |  CASE
              |    WHEN len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(Stop)}))
              |      >= len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(DbMarkers)}))
              |     AND len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(Stop)}))
              |      >= len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(ExecMarkers)}))
              |    THEN 'en'
              |    WHEN len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(DbMarkers)}))
              |      >= len(list_filter(string_split(text,' '),
              |           t -> t IN ${sqlList(ExecMarkers)}))
              |    THEN 'db' ELSE 'exec' END AS predicted
              |FROM documents""".stripMargin)),

    // ----- q34: quality scoring -------------------------------------------
    NamedQuery(
      "q34_quality_score",
      (s, d) => {
        val toks = split(col("text"), " ")
        val nTok = size(toks).cast("double")
        val uniqR = size(array_distinct(toks)).cast("double") / nTok
        val stopR = size(filter(toks, t => t.isin(Stop: _*))).cast("double") / nTok
        val avgW = (col("n_chars").cast("double") - (nTok - 1.0)) / nTok
        tbl(s, d, "documents").select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          uniqR.as("uniq_ratio"), stopR.as("stop_ratio"),
          (lit(0.4) * uniqR + lit(0.3) * (lit(1.0) - stopR)
            + lit(0.3) * least(avgW / 8.0, lit(1.0))).as("quality"))
      },
      Some {
        val nTok = "CAST(len(string_split(text,' ')) AS DOUBLE)"
        val uniqR = s"CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / $nTok"
        val stopR = s"CAST(len(list_filter(string_split(text,' '), t -> t IN ${sqlList(Stop)})) AS DOUBLE) / $nTok"
        val avgW = s"(CAST(n_chars AS DOUBLE) - ($nTok - 1.0)) / $nTok"
        s"""SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
           |  $uniqR AS uniq_ratio, $stopR AS stop_ratio,
           |  0.4 * ($uniqR) + 0.3 * (1.0 - $stopR)
           |    + 0.3 * least(($avgW) / 8.0, 1.0) AS quality
           |FROM documents""".stripMargin
      }),

    // ----- q35: token counting (whitespace + regex token classes) ---------
    NamedQuery(
      "q35_token_count",
      (s, d) =>
        tbl(s, d, "documents").select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          regexp_count(col("text"), lit("[a-z]+")).cast("long").as("n_alpha"),
          regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long").as("n_bpe"),
          length(col("text")).cast("long").as("n_chars_out")),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_ws,
             |  len(regexp_extract_all(text, '[a-z]+')) AS n_alpha,
             |  len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_bpe,
             |  length(text) AS n_chars_out
             |FROM documents""".stripMargin)),

    // ----- q36: fingerprint (full poly-hash + winnowed window min) --------
    NamedQuery(
      "q36_fingerprint",
      (s, d) => {
        // cs is referenced twice in the upper projection (full + winnow),
        // so CollapseProject keeps it a separate materialized projection —
        // codepoints are computed once per row.
        val withCs = tbl(s, d, "documents")
          .select(col("doc_id"),
            transform(split(col("text"), ""), c => ascii(c)).as("cs"))
        val full = aggregate(col("cs"), lit(0L),
          (acc, c) => (acc * 31 + c) % HashMod)
        val nWin = greatest(size(col("cs")) - (WinnowLen - 1), lit(1))
        val winnow = array_min(transform(sequence(lit(1), nWin), i =>
          aggregate(slice(col("cs"), i, lit(WinnowLen)), lit(0L),
            (acc, c) => (acc * 31 + c) % HashMod)))
        withCs.select(col("doc_id"), full.as("full_hash"),
          winnow.as("winnow_hash"))
      },
      Some {
        val cs = "list_transform(string_split(text, ''), c -> unicode(c))"
        val full = s"list_reduce(list_prepend(CAST(0 AS BIGINT), $cs), (acc, c) -> (acc * 31 + c) % $HashMod)"
        val nWin = s"greatest(len($cs) - ${WinnowLen - 1}, 1)"
        val winnow =
          s"""list_min(list_transform(range(1, $nWin + 1), i ->
             | list_reduce(list_prepend(CAST(0 AS BIGINT), ($cs)[i:i+${WinnowLen - 1}]),
             |   (acc, c) -> (acc * 31 + c) % $HashMod)))"""
            .stripMargin.replace("\n", " ")
        s"""SELECT doc_id, $full AS full_hash, $winnow AS winnow_hash
           |FROM documents""".stripMargin
      }),

    // ----- q52: token-diversity quality score (Gini impurity) -------------
    // Repetition detector for pretraining curation: gini = 1 − Σ(c_i/n)²
    // over the per-doc token histogram — near 1 for diverse text, near 0
    // for a document that repeats one token. Unlike entropy (ln() differs
    // across libm implementations) every input here is an exact INTEGER
    // (Σc_i, Σc_i²) and the score is one double division — bit-identical
    // across engines with no ordering contract needed. Two-level partial
    // aggregation: (doc, token) counts shuffle once, per-doc moments
    // shuffle once — no per-row state, linear at any corpus size.
    NamedQuery(
      "q52_token_gini",
      (s, d) =>
        tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            // c·c in decimal: a LongType c² wraps (or throws under ANSI)
            // past c ≈ 3e9 — i.e. exactly the degenerate one-token
            // documents gini exists to flag — while the oracle's HUGEINT
            // stays exact. decimal(38) holds c² for any c the count fits,
            // and both exact-integer → double conversions round identically
            sum(col("c").cast("decimal(19,0)") * col("c")).as("sumsq"))
          // n_tokens² AFTER the double cast for the same reason —
          // double·double is the same IEEE op in both engines
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            (lit(1.0) - col("sumsq").cast("double") /
              (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
              .as("gini")),
      Some("""WITH tc AS (
             |  SELECT doc_id, tok, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |  COUNT(*) AS n_distinct,
             |  1.0 - CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
             |      / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS gini
             |FROM tc GROUP BY doc_id""".stripMargin)),

    // ----- q59: PII redaction (email/phone scrub + per-class counts) ------
    // The pre-training scrub pass: replace email and phone spans with
    // typed placeholders and count what was removed per document. The
    // synthetic corpus has no PII, so the query plants it
    // deterministically (every 3rd doc gets an email, every 4th a phone —
    // some docs get both, some neither, exercising all four cases) the
    // same way the dedup corpora plant duplicates. Patterns stay within
    // the regex subset Java and RE2 interpret identically (character
    // classes + bounded repetition — no backrefs, no lookaround).
    // Per-row, zero shuffle.
    NamedQuery(
      "q59_pii_redact",
      (s, d) => {
        val emailRe = "[a-z0-9]+@[a-z]+[.][a-z]+"
        val phoneRe = "[0-9]{3}-[0-9]{4}"
        val planted = tbl(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id"),
                lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 4 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))).as("text"))
        planted.select(col("doc_id"),
          regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("red_text"))
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    text ||
             |    CASE WHEN doc_id % 3 = 0
             |         THEN ' contact user' || doc_id || '@example.com now'
             |         ELSE '' END ||
             |    CASE WHEN doc_id % 4 = 0
             |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |         ELSE '' END AS text
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+[.][a-z]+'))
             |    AS n_emails,
             |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS n_phones,
             |  regexp_replace(
             |    regexp_replace(text, '[a-z0-9]+@[a-z]+[.][a-z]+', '<EMAIL>', 'g'),
             |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red_text
             |FROM planted""".stripMargin)),

    // ----- q60: vocabulary heavy hitters (global top-k tokens) ------------
    // Corpus-level token frequencies, top 30 by count with a total-order
    // tiebreak. The scale shape matters more than the query: partial
    // (map-side) aggregation absorbs the classic token-frequency skew —
    // every partition pre-counts 'the' locally, so the shuffle carries one
    // row per (partition, token), not one per occurrence — and the final
    // top-k is TakeOrderedAndProject, never a global sort.
    NamedQuery(
      "q60_vocab_topk",
      (s, d) =>
        tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("tok"))
          .limit(30),
      Some("""SELECT tok, COUNT(*) AS freq
             |FROM (SELECT unnest(string_split(text, ' ')) AS tok
             |      FROM documents)
             |GROUP BY tok
             |ORDER BY freq DESC, tok
             |LIMIT 30""".stripMargin)),

    // ----- q61: intra-document repetition metrics (bigram fractions) ------
    // The Gopher-style repetition filters: fraction of bigram occurrences
    // that are repeats of an earlier bigram in the SAME document, and the
    // share taken by the single most frequent bigram. High values flag
    // boilerplate / generated spam for removal before pretraining.
    // Bigrams come from zip_with over two slices of the token array (no
    // self-join, no UDF); the per-doc histogram shuffles once on
    // (doc_id, bigram) with map-side partial counts, then once on doc_id
    // — linear in corpus size, and every fraction is one double division
    // of exact integers, so results are partition-count independent.
    NamedQuery(
      "q61_repetition",
      (s, d) => {
        val toks = split(col("text"), " ")
        val n = size(toks)
        val bigrams = zip_with(
          slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
          (a, b) => concat(a, lit(" "), b))
        tbl(s, d, "documents")
          .select(col("doc_id"), explode(bigrams).as("g"))
          .groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bigrams"),
            max(col("c")).as("maxc"),
            sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dupc"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("maxc").cast("double") / col("n_bigrams").cast("double"))
              .as("top_bigram_frac"),
            (col("dupc").cast("double") / col("n_bigrams").cast("double"))
              .as("dup_bigram_frac"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |bg AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(tk)),
             |                          i -> tk[i] || ' ' || tk[i + 1])) AS g
             |  FROM t),
             |c AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             |    AS top_bigram_frac,
             |  CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
             |    / CAST(SUM(c) AS DOUBLE) AS dup_bigram_frac
             |FROM c GROUP BY doc_id""".stripMargin)),

    // ----- q62: unigram-LM document score (corpus-frequency features) -----
    // The unigram-language-model quality signal used by pretraining
    // filters: score each document by how probable its tokens are under
    // the corpus's own unigram distribution. Two exact-arithmetic
    // features per doc: mean token probability Σc_t / (n·N) (the
    // exact-integer stand-in for mean log-prob — same ranking, and ln()
    // differs across libm implementations, see q52), and the fraction of
    // tokens rarer than 1% of corpus mass (100·c < N — an integer
    // compare, no division). Scale shape: the vocab aggregate is tiny by
    // Heaps' law, so it broadcast-joins back onto the exploded token
    // stream — one shuffle for the vocab, one for the per-doc aggregate,
    // nothing quadratic, no driver-side collect.
    NamedQuery(
      "q62_unigram_score",
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val total = vocab.agg(sum(col("c")).as("total"))
        toks
          .join(broadcast(vocab), "tok")
          .crossJoin(broadcast(total))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            // Σc in decimal: per-occurrence corpus counts sum toward
            // n_doc·N, which exceeds Long for a boilerplate-heavy doc at
            // corpus scale — the oracle's SUM promotes to HUGEINT; both
            // exact-integer → double conversions round identically
            sum(col("c").cast("decimal(38,0)")).as("sumc"),
            sum(when(col("c") * 100 < col("total"), lit(1L))
              .otherwise(lit(0L))).as("nrare"),
            max(col("total")).as("n"))
          // n·N as double·double: the long product overflows past ~3e9
          // tokens per doc·corpus while the double is the same IEEE op
          // in both engines (cf. q52)
          .select(col("doc_id"), col("n_tokens"),
            (col("sumc").cast("double") /
              (col("n_tokens").cast("double") * col("n").cast("double")))
              .as("mean_tok_prob"),
            (col("nrare").cast("double") / col("n_tokens").cast("double"))
              .as("rare_frac"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM v)
             |SELECT t.doc_id, COUNT(*) AS n_tokens,
             |  CAST(SUM(v.c) AS DOUBLE)
             |    / (CAST(COUNT(*) AS DOUBLE) * CAST(MAX(n.total) AS DOUBLE))
             |    AS mean_tok_prob,
             |  CAST(SUM(CASE WHEN v.c * 100 < n.total THEN 1 ELSE 0 END)
             |       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rare_frac
             |FROM tok t JOIN v USING (tok) CROSS JOIN n
             |GROUP BY t.doc_id""".stripMargin)),

    // ----- q77: BPE pair-merge statistics (tokenizer training, step 1) ----
    // The first iteration of byte-pair-encoding training: count adjacent
    // character pairs across the corpus, weighted by word frequency —
    // the argmax is the first merge a BPE tokenizer would learn. The
    // scale trick is WORD-level aggregation first: pairs are generated
    // over the DISTINCT word table (vocabulary-sized, Heaps' law) and
    // weighted by the word's corpus frequency, so the expensive explode
    // runs over thousands of words, not billions of tokens. Top-20 via
    // TakeOrderedAndProject with a total-order tiebreak.
    NamedQuery(
      "q77_bpe_pairs",
      (s, d) => {
        val vocab = tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        vocab
          .select(col("freq"), explode(when(length(col("tok")) >= 2,
            expr("transform(sequence(1, length(tok) - 1)," +
              " i -> substring(tok, i, 2))"))
            .otherwise(array().cast("array<string>"))).as("pair"))
          .groupBy(col("pair"))
          .agg(sum(col("freq")).as("w"))
          .orderBy(col("w").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH v AS (
             |  SELECT tok, COUNT(*) AS freq
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY tok),
             |p AS (
             |  SELECT freq, unnest(CASE WHEN len(tok) >= 2
             |    THEN [tok[i:i+1] for i in range(1, len(tok))]
             |    ELSE [] END) AS pair
             |  FROM v)
             |SELECT pair, CAST(SUM(freq) AS BIGINT) AS w
             |FROM p GROUP BY pair
             |ORDER BY w DESC, pair LIMIT 20""".stripMargin)),

    // ----- q84: iterated BPE merges (tokenizer training, k rounds) --------
    // q77 computes merge step 1; this runs the LOOP: k=3 rounds of
    // count-pairs → argmax → apply-merge — the actual BPE training shape.
    // Work stays vocabulary-sized the whole way (Heaps' law: distinct
    // words × frequency weights, never the token stream), and the merge
    // APPLICATION is one literal string replace per word: symbols are
    // wrapped as "(a)(b)(c)" and the winning pair's pattern "(a)(b)"
    // replaces left-to-right non-overlapping with "(ab)" — exactly the
    // greedy semantics a sequential BPE merge applies, with the wrapper
    // chars making cross-symbol false matches impossible (both engines'
    // replace() scans the original string and never rescans the inserted
    // target, so the two sides are character-identical). The per-round
    // argmax is ONE tiny driver scalar (same budget as StarCC's
    // convergence witness); ties break (weight DESC, pair ASC) in both
    // engines; localCheckpoint per round truncates lineage. Output: the
    // k learned merges — the table a trained tokenizer ships.
    NamedQuery(
      "q84_bpe_merges",
      (s, d) => {
        import s.implicits._
        bpeTrain(s, d, 3).toDF("step", "pair", "wt")
      },
      Some {
        s"""WITH $bpeTrainCtes
           |SELECT CAST(1 AS BIGINT) AS step, pair, wt FROM b1
           |UNION ALL SELECT CAST(2 AS BIGINT), pair, wt FROM b2
           |UNION ALL SELECT CAST(3 AS BIGINT), pair, wt FROM b3"""
          .stripMargin
      }),

    // ----- q88: BPE encode — apply the trained merges to the corpus -------
    // q84 trains the tokenizer; this APPLIES it — the second half of the
    // tokenizer loop and the op that actually runs at token-stream scale
    // in a pretraining pipeline. The scale shape is the point: each
    // DISTINCT word is encoded exactly once (wrap → the k learned merges
    // as literal replaces → symbol count = '(' count), a vocabulary-sized
    // table by Heaps' law, and the token stream only ever meets it in a
    // hash join on the word — the join AQE broadcasts once the vocab side
    // proves small. The 3 merge literals are driver scalars from the same
    // bounded training loop q84 runs (vocabulary-sized argmax per round —
    // the bloom-filter budget class, not a data collect). Output per doc:
    // whitespace token count, pre-merge symbol (=char) count, and
    // post-merge BPE symbol count — the compression the merges bought.
    NamedQuery(
      "q88_bpe_encode",
      (s, d) => {
        val merges = bpeTrain(s, d, 3).map(_._2)
        val tc = tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        tc.join(bpeSymbols(merges, tc.select(col("tok"))), Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            sum(col("c") * length(col("tok")).cast("long"))
              .as("n_char_syms"),
            sum(col("c") * col("n_syms")).as("n_bpe_syms"))
      },
      Some {
        def applyEnc(en1: String, en0: String, bn: String): String =
          s"""$en1 AS (
             |  SELECT tok, replace(w, (SELECT pair FROM $bn),
             |    replace((SELECT pair FROM $bn), ')(', '')) AS w
             |  FROM $en0)""".stripMargin
        s"""WITH $bpeTrainCtes,
           |tc AS (
           |  SELECT doc_id, tok, COUNT(*) AS c
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY doc_id, tok),
           |w0 AS (
           |  SELECT tok,
           |    '(' || array_to_string(list_transform(
           |      range(1, len(tok) + 1), i -> tok[i:i]), ')(') || ')' AS w
           |  FROM (SELECT DISTINCT tok FROM tc)),
           |${applyEnc("e1", "w0", "b1")},
           |${applyEnc("e2", "e1", "b2")},
           |${applyEnc("e3", "e2", "b3")},
           |sy AS (
           |  SELECT tok, len(w) - len(replace(w, '(', '')) AS n_syms
           |  FROM e3)
           |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           |  CAST(SUM(c * len(tok)) AS BIGINT) AS n_char_syms,
           |  CAST(SUM(c * n_syms) AS BIGINT) AS n_bpe_syms
           |FROM tc JOIN sy USING (tok)
           |GROUP BY doc_id""".stripMargin
      }),

    // ----- q102: tokenizer fertility / compression per source -------------
    // The report the BPE family exists to produce: for each source, how
    // many BPE symbols the learned tokenizer spends per whitespace word
    // (fertility — the sequence-length multiplier training actually pays)
    // and how many characters each symbol absorbs (compression). Reuses
    // q84's training loop and q88's vocabulary-sized encode table; the
    // token stream only ever meets the vocab-sized (tok, n_syms) table in
    // a hash join — per-source totals are one partial-aggregated groupBy.
    // Ratios are IEEE double divisions of exact longs: bit-identical
    // cross-engine, no tolerance needed.
    NamedQuery(
      "q102_tokenizer_fertility",
      (s, d) => {
        val merges = bpeTrain(s, d, 3).map(_._2)
        // pinned (r18 optimization): tc feeds both the final join's left
        // side and the distinct-token input to the encode table —
        // unpinned, the corpus explode + (source, tok) aggregation ran
        // twice.
        val tc = OpsKit.pinned(tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c")))
        tc.join(bpeSymbols(merges, tc.select(col("tok"))), Seq("tok"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_words"),
            sum(col("c") * length(col("tok")).cast("long")).as("n_chars"),
            sum(col("c") * col("n_syms")).as("n_bpe_syms"))
          .select(col("source"), col("n_words"), col("n_chars"),
            col("n_bpe_syms"),
            (col("n_bpe_syms").cast("double") / col("n_words").cast("double"))
              .as("fertility"),
            (col("n_chars").cast("double") / col("n_bpe_syms").cast("double"))
              .as("chars_per_sym"))
      },
      Some {
        def applyEnc(en1: String, en0: String, bn: String): String =
          s"""$en1 AS (
             |  SELECT tok, replace(w, (SELECT pair FROM $bn),
             |    replace((SELECT pair FROM $bn), ')(', '')) AS w
             |  FROM $en0)""".stripMargin
        s"""WITH $bpeTrainCtes,
           |tc AS (
           |  SELECT source, tok, COUNT(*) AS c
           |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY source, tok),
           |w0 AS (
           |  SELECT tok,
           |    '(' || array_to_string(list_transform(
           |      range(1, len(tok) + 1), i -> tok[i:i]), ')(') || ')' AS w
           |  FROM (SELECT DISTINCT tok FROM tc)),
           |${applyEnc("e1", "w0", "b1")},
           |${applyEnc("e2", "e1", "b2")},
           |${applyEnc("e3", "e2", "b3")},
           |sy AS (
           |  SELECT tok, len(w) - len(replace(w, '(', '')) AS n_syms
           |  FROM e3),
           |agg AS (
           |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_words,
           |    CAST(SUM(c * len(tok)) AS BIGINT) AS n_chars,
           |    CAST(SUM(c * n_syms) AS BIGINT) AS n_bpe_syms
           |  FROM tc JOIN sy USING (tok)
           |  GROUP BY source)
           |SELECT source, n_words, n_chars, n_bpe_syms,
           |  CAST(n_bpe_syms AS DOUBLE) / CAST(n_words AS DOUBLE)
           |    AS fertility,
           |  CAST(n_chars AS DOUBLE) / CAST(n_bpe_syms AS DOUBLE)
           |    AS chars_per_sym
           |FROM agg""".stripMargin
      }),

    // ----- q91: vocabulary coverage / OOV rate per document ---------------
    // The metric a fixed-vocabulary tokenizer or embedding table imposes:
    // for each document, what fraction of its token OCCURRENCES falls
    // outside the top-20 corpus vocabulary. 20, not 100: the synthetic
    // corpus draws from a 31-token vocabulary, so a top-100 cut covered
    // EVERYTHING and n_oov/oov_rate were all-zero at every SF (r12
    // degeneracy sweep) — the cut must sit inside the observed type
    // inventory for the metric to measure anything. The vocab is a
    // deterministic top-k (freq DESC, tok ASC — the q60 order contract)
    // that broadcasts
    // to the token stream; the scan never shuffles on the token — one
    // per-doc partial aggregation and a broadcast hash join is the whole
    // plan, linear at any corpus size.
    NamedQuery(
      "q91_oov_rate",
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("tok")).limit(20)
          .select(col("tok"), lit(1).as("inv"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            (col("n_oov").cast("double") / col("n_tokens").cast("double"))
              .as("oov_rate"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |vocab AS (
             |  SELECT tok FROM (
             |    SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
             |  ORDER BY freq DESC, tok LIMIT 20)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov,
             |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
             |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
             |GROUP BY doc_id""".stripMargin)),

    // ----- q107: bigram-LM document score ---------------------------------
    // The conditional-LM quality signal — the distributable skeleton of a
    // CCNet-style perplexity filter: score each document by how typical
    // its word TRANSITIONS are under the corpus's own bigram statistics
    // (q62 scores isolated token frequency; shuffled word soup passes q62
    // but fails this). Exact arithmetic throughout (ln() differs across
    // libm builds — q52's lesson): per doc, the mean JOINT bigram
    // probability Σc(b) / (n_bigrams·B) (exact-integer stand-in for mean
    // log joint prob — same ranking), and the SURPRISE fraction: bigrams
    // whose conditional probability P(w2|w1) = c(w1w2)/c(w1·) is below
    // 5%, tested as the integer compare 20·c(w1w2) < c(w1·). Scale
    // shape: distinct BIGRAMS grow much faster than the unigram vocab —
    // near-linearly in corpus tokens on low-redundancy text (measured:
    // ×4.7 wall for ×10 docs on a permuted corpus, SCALING.md) — so the
    // honest budget is O(corpus tokens) LM state, sharded: both count
    // tables are built by partial-agg shuffles and met in hash
    // equi-joins (AQE broadcasts them only if they prove small) — no
    // per-row state, no all-pairs anywhere. A production CCNet-style
    // filter would train the LM once on a fixed reference slice and
    // broadcast it; self-training on the scored corpus itself, as here,
    // is the harder fully-distributed case. Docs with fewer than two
    // tokens have no transitions and drop out on both engines.
    NamedQuery(
      "q107_bigram_lm",
      // two-level shape (cf. q52): the exploded stream is aggregated
      // ONCE to (doc, bigram, k) — the persisted docBigrams working set,
      // shared with q118 — and everything else (the bigram LM, the
      // prefix counts, the corpus total) derives from that vocabulary-
      // shaped output, so the token stream is never re-exploded (the
      // first cut scanned it four times and was the bench's slowest
      // query); body extracted as bigramDocScores, shared with q157
      (s, d) => bigramDocScores(s, d),
      Some(s"""WITH $bigramScoreCteSql
              |SELECT doc_id, n_bigrams, mean_bigram_prob, surprise_frac
              |FROM scores""".stripMargin)),

    // ----- q118: PMI collocations (top word pairs by lift) ----------------
    // Collocation extraction — the statistical phrase detector a corpus
    // pipeline runs before building phrase vocabularies: rank adjacent
    // word pairs by lift = P(w1,w2) / (P(w1)·P(w2)) = c12·N / (c1·c2),
    // the exp of PMI and monotone with it, so the ranking is identical
    // while the arithmetic stays log-free and cross-engine exact (q52's
    // libm lesson). Marginals are the bigram table's own left/right
    // sums, so everything derives from ONE bigram aggregation (q107's
    // two-level shape); c12 ≥ 5 is the standard sparse-pair guard —
    // below it, lift is dominated by noise. The numerator/denominator
    // long products would overflow past ~3e9 tokens, so both are
    // double·double products (same IEEE op order both engines, cf. q62).
    // Top-20 via TakeOrderedAndProject with a total-order tiebreak.
    NamedQuery(
      "q118_pmi_collocations",
      (s, d) => {
        // corpus bigram counts derive from the persisted docBigrams
        // working set (shared with q107): sum the per-doc k instead of
        // re-exploding the token stream — same counts, one shared scan
        val bg = docBigrams(s, d)
          .groupBy(col("bg")).agg(sum(col("k")).as("c12"))
          .withColumn("w1", substring_index(col("bg"), "\u0001", 1))
          .withColumn("w2", substring_index(col("bg"), "\u0001", -1))
        val left = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val right = bg.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
        val total = bg.agg(sum(col("c12")).as("n"))
        bg.join(left, "w1").join(right, "w2")
          .crossJoin(broadcast(total))
          .filter(col("c12") >= 5)
          .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
            ((col("c12").cast("double") * col("n").cast("double")) /
              (col("c1").cast("double") * col("c2").cast("double")))
              .as("lift"))
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT string_split(text, ' ') AS w FROM documents),
             |big AS (
             |  SELECT unnest([w[i] || chr(1) || w[i+1]
             |                 for i in range(1, len(w))]) AS bg
             |  FROM tok WHERE len(w) >= 2),
             |b AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
             |bb AS (SELECT bg, c12,
             |         string_split(bg, chr(1))[1] AS w1,
             |         string_split(bg, chr(1))[2] AS w2 FROM b),
             |l AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
             |      FROM bb GROUP BY w1),
             |r AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2
             |      FROM bb GROUP BY w2),
             |n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bb)
             |SELECT w1, w2, c12, c1, c2,
             |  (CAST(c12 AS DOUBLE) * CAST(n.n AS DOUBLE)) /
             |    (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)) AS lift
             |FROM bb JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
             |WHERE c12 >= 5
             |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ----- q110: TF-IDF top terms per source ------------------------------
    // The classic per-collection term-weighting report: for each source,
    // the 5 tokens with the highest tf·idf, where tf is the token's
    // occurrence count within the source and idf = N/df over DOCUMENT
    // granularity (df = how many documents contain the token). ln() is
    // deliberately absent — idf as a plain ratio preserves the ranking
    // (ln is monotone) and keeps the score cross-engine bit-exact
    // (libm ln() differs; cf. q52/q62). Scale shape: the token stream
    // aggregates to (source, tok) and (doc, tok) tables — both
    // vocabulary-bounded by Heaps' law — then one hash join on tok and a
    // per-source top-5 window over vocab-sized rows. Two token-keyed
    // shuffles, nothing quadratic, no driver-side state. The score is
    // (tf·double × N·double)/df·double — the long product tf·N would
    // overflow past ~1e10 tokens·docs while the double is the same IEEE
    // op sequence in both engines (cf. q62's n·N comment).
    NamedQuery(
      "q110_tfidf_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("tok"))
        val tf = toks.groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"), col("tok")).distinct()
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val nDocs = tbl(s, d, "documents")
          .agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("tfidf").desc, col("tok"))
        tf.join(df, "tok")
          .crossJoin(broadcast(nDocs))
          .select(col("source"), col("tok"), col("tf"), col("df"),
            (col("tf").cast("double") * col("n_docs").cast("double") /
              col("df").cast("double")).as("tfidf"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tf AS (SELECT source, tok, COUNT(*) AS tf
             |       FROM tok GROUP BY source, tok),
             |df AS (SELECT tok, COUNT(*) AS df
             |       FROM (SELECT DISTINCT doc_id, tok FROM tok)
             |       GROUP BY tok),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents)
             |SELECT source, tok, tf, df, tfidf, rk FROM (
             |  SELECT tf.source, tf.tok, tf.tf, df.df,
             |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
             |      / CAST(df.df AS DOUBLE) AS tfidf,
             |    CAST(row_number() OVER (PARTITION BY tf.source
             |      ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
             |        / CAST(df.df AS DOUBLE) DESC, tf.tok) AS BIGINT) AS rk
             |  FROM tf JOIN df USING (tok) CROSS JOIN n)
             |WHERE rk <= 5""".stripMargin)),

    // ----- q134: Gopher-style composite quality gates ---------------------
    // The rule-based document filter every crawl pipeline runs before the
    // statistical ones (Rae et al., Gopher, 2021 §A1.1 — adapted bounds):
    // token-count window, mean-word-length window, minimum stop-word
    // evidence, and a repetition cap on the single most frequent token.
    // Every gate is an INTEGER comparison (mean length as 3n ≤ Σlen with
    // 2·Σlen ≤ 9n — upper mean 4.5, adapted to the synthetic corpus
    // whose per-doc means span 3.7–5.3, so the gate actually
    // discriminates; Gopher's own 10 was above every document and the
    // verdict column was all-true at every SF, r12 degeneracy sweep —
    // repetition as 5·top ≤ n) so no float ratio ever crosses an engine
    // boundary — the q52/q62 parity rule applied to thresholds. Shape: one
    // explode into a (doc, token) count (partial-agg shuffle) and one
    // per-doc rollup — the per-row mode() computed as a groupBy instead of
    // a quadratic in-row scan, so a pathological 1 GB document costs its
    // token count, not its token count squared. Output keeps each gate's
    // verdict separately (the curation-review view: WHICH rule fired), plus
    // the composite keep.
    NamedQuery(
      "q134_gopher_gates",
      (s, d) => {
        val tc = tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
        tc.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_toks"),
            sum(length(col("tok")) * col("c")).as("sum_len"),
            sum(when(col("tok").isin("the", "a"), col("c"))
              .otherwise(lit(0L))).as("n_stop"),
            max(col("c")).as("top_c"))
          .select(col("doc_id"), col("n_toks"),
            col("n_toks").between(40, 100000).as("g_len"),
            (col("sum_len") >= col("n_toks") * 3 &&
              col("sum_len") * 2 <= col("n_toks") * 9).as("g_wordlen"),
            (col("n_stop") >= 2).as("g_stop"),
            (col("top_c") * 5 <= col("n_toks")).as("g_rep"))
          .withColumn("keep",
            col("g_len") && col("g_wordlen") && col("g_stop") && col("g_rep"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, COUNT(*) AS c
             |       FROM t GROUP BY doc_id, tok),
             |agg AS (SELECT doc_id,
             |    CAST(SUM(c) AS BIGINT) AS n_toks,
             |    CAST(SUM(len(tok) * c) AS BIGINT) AS sum_len,
             |    CAST(SUM(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END)
             |      AS BIGINT) AS n_stop,
             |    MAX(c) AS top_c
             |  FROM tc GROUP BY doc_id)
             |SELECT doc_id, n_toks,
             |  (n_toks BETWEEN 40 AND 100000) AS g_len,
             |  (sum_len >= n_toks * 3 AND sum_len * 2 <= n_toks * 9)
             |    AS g_wordlen,
             |  (n_stop >= 2) AS g_stop,
             |  (top_c * 5 <= n_toks) AS g_rep,
             |  (n_toks BETWEEN 40 AND 100000
             |   AND sum_len >= n_toks * 3 AND sum_len * 2 <= n_toks * 9
             |   AND n_stop >= 2 AND top_c * 5 <= n_toks) AS keep
             |FROM agg""".stripMargin)),

    // ----- q139: BM25 retrieval scoring (lift idf, log-free) --------------
    // Full-corpus retrieval ranking (Robertson & Zaragoza's BM25 with
    // k1 = 1.5, b = 0.75 — both DYADIC rationals, exactly representable)
    // for query-by-document: every doc_id % 100 == 0 document's distinct
    // terms rank the whole corpus. One deliberate, documented deviation:
    // idf is the RATIO (N − df + ½)/(df + ½) rather than its log — ln
    // across engines differs in the last ulp (the q52/q62/q118 rule), and
    // the lift form keeps per-term monotonicity in df, which is what the
    // downstream trimming decisions consume. Scale shape is the classic
    // inverted-index DAAT plan: candidate postings = tf ⋈ broadcast(query
    // terms) — cost Σ df over query terms, never corpus × queries; df and
    // avgdl reduce to a vocab-sized table and ONE broadcast scalar row;
    // the per-(query, doc) sum is dsum (exact decimal), so scores and the
    // (score desc, doc_id) top-5 are partition-count-deterministic.
    NamedQuery(
      "q139_bm25",
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        // tf feeds FOUR consumers (postings, dl, df, query terms); persist
        // so the explode+count runs once — plan-keyed, so repeat calls in
        // one session share the same cache entry (the kmCorpus mechanism)
        // pinned(tf) tried and REVERTED (r19, r18 verdict item 6): four
        // interleaved A/B pairs read the pinned form 2.5-3x slower
        // (6.8-8.1 s vs 2.6-3.2 s at sf0.1) — the checkpoint pays an
        // eager materialization per invocation, forfeits the plan-keyed
        // cache hit, and its unknown stats demote the unhinted dl join
        // off broadcast (the q247 mechanism). persist() stays. Eviction
        // safety: unlike the r9 closure-family failure, tf's subtree
        // contains no localCheckpoint, so its canonical plan stays
        // rematchable — an evicted block recomputes and RE-CACHES from
        // the one parquet scan, it cannot silently double-bill every
        // later consumer the way checkpoint-keyed plans did.
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
          .persist()
        val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
            sum(col("dl")).as("tot"))
          .select(col("n_docs"), (col("tot").cast("double") /
            col("n_docs").cast("double")).as("avgdl"))
        val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val qterms = tf.filter(isPanel(col("doc_id")))
          .select(col("doc_id").as("q_id"), col("tok"))
        // df restricted to query terms stays query-vocabulary-sized
        val dfq = dft.join(
          broadcast(qterms.select(col("tok")).distinct()), Seq("tok"))
        val idf = (col("n_docs").cast("double") -
          col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))
        val tfd = col("tf").cast("double")
        val tpart = tfd * lit(2.5) / (tfd + lit(1.5) *
          (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") / col("avgdl"))))
        val scored = tf.join(broadcast(qterms), Seq("tok"))
          .join(broadcast(dfq), Seq("tok"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .select(col("q_id"), col("doc_id"), (idf * tpart).as("contrib"))
          .groupBy(col("q_id"), col("doc_id"))
          .agg(dsum(col("contrib")).as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              |  FROM documents),
              |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t
              |       WHERE tok <> '' GROUP BY doc_id, tok),
              |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
              |       FROM tf GROUP BY doc_id),
              |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
              |      AS avgdl
              |  FROM dl),
              |dft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
              |        FROM tf GROUP BY tok),
              |q AS (SELECT doc_id AS q_id, tok FROM tf
              |      WHERE doc_id % 100 = 0 AND doc_id < 6400),
              |p AS (
              |  SELECT q.q_id, f.doc_id,
              |    ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              |      / (CAST(d.df AS DOUBLE) + 0.5))
              |    * (CAST(f.tf AS DOUBLE) * 2.5
              |       / (CAST(f.tf AS DOUBLE) + 1.5
              |          * (0.25 + 0.75
              |             * (CAST(l.dl AS DOUBLE) / s.avgdl))))
              |      AS contrib
              |  FROM tf f JOIN q ON f.tok = q.tok
              |  JOIN dft d ON f.tok = d.tok
              |  JOIN dl l ON f.doc_id = l.doc_id
              |  CROSS JOIN stats s),
              |sc AS (SELECT q_id, doc_id, ${dsumSql("contrib")} AS score
              |       FROM p GROUP BY q_id, doc_id)
              |SELECT q_id, doc_id, score, rank FROM (
              |  SELECT q_id, doc_id, score,
              |    CAST(row_number() OVER (PARTITION BY q_id
              |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
              |  FROM sc)
              |WHERE rank <= 5""".stripMargin)),

    // ----- q151: Good-Turing unseen-vocabulary mass per source ------------
    // The corpus-coverage health metric a tokenizer-training run reads
    // before freezing its vocabulary: the Good-Turing estimate of the
    // probability mass of UNSEEN words, p0 = V1/N (singleton count over
    // token count, Good 1953) — if 10% of a source's token draws would be
    // words never seen in the sample, the sample is too small for that
    // source. Per source: tokens N, vocab V, singletons V1, doubletons V2
    // (the first two frequency-of-frequency terms, enough for the smoothed
    // singleton-mass estimate), and p0. Everything is exact-integer until
    // the ONE final division, so the hash gate is trivial. Scale shape:
    // (source, tok) partial-agg shuffle, then a source-level re-agg over
    // the vocabulary-sized table — the q52/q62 two-level shape; linear in
    // corpus tokens, vocabulary-bounded after level 1, no joins at all.
    NamedQuery(
      "q151_unseen_mass",
      (s, d) => {
        val freqs = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("f"))
        freqs.groupBy(col("source"))
          .agg(sum(col("f")).as("n_tokens"),
            count(lit(1)).as("n_vocab"),
            sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_singletons"),
            sum(when(col("f") === 2, 1L).otherwise(0L)).as("n_doubletons"))
          .select(col("source"), col("n_tokens"), col("n_vocab"),
            col("n_singletons"), col("n_doubletons"),
            (col("n_singletons").cast("double") /
              col("n_tokens").cast("double")).as("unseen_mass"))
      },
      Some("""WITH f AS (
             |  SELECT source, tok, COUNT(*) AS f FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  GROUP BY source, tok)
             |SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
             |  CAST(COUNT(*) AS BIGINT) AS n_vocab,
             |  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_singletons,
             |  CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_doubletons,
             |  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
             |    CAST(SUM(f) AS DOUBLE) AS unseen_mass
             |FROM f GROUP BY source""".stripMargin)),

    // ----- q155: Zipf slope of the vocabulary (log2-bucket OLS) -----------
    // Does the corpus LOOK like natural language? Natural text has token
    // frequencies falling like rank^(-s) with s near 1 (Zipf 1949);
    // machine-generated or template spam bends the curve. The slope is
    // fit by OLS on (log2 rank, log2 freq) — but ln/log2 of a double
    // differs across libm builds (the q52 lesson), so both coordinates
    // use the INTEGER floor-log2, computed exactly as
    // length(binary-digit-string) - 1 on both engines (Spark conv(),
    // DuckDB bin() — string length is exact where floor(log2(x)) can
    // round across a power-of-two boundary). All five OLS moments (n,
    // Σx, Σy, Σxy, Σx²) are exact integers; slope and intercept are the
    // only doubles, derived in one identical expression each. Scale
    // shape: the vocabulary table is token-stream partial-agg; the
    // global rank is a window over the VOCABULARY (Heaps-bounded, far
    // smaller than the corpus — same budget q60/q77 already accept);
    // moments are one more partial agg. Output: one row.
    NamedQuery(
      "q155_zipf_slope",
      (s, d) => {
        // Scale-safe global rank, r11 form: the regression consumes the
        // rank ONLY through x = floor(log2 rank), and within a frequency
        // tie block the ranks are the contiguous run [o+1, o+c] — so
        // instead of ranking the vocabulary (an unpartitioned row_number
        // over a table that is ~10^8 rows at 100 TB), work on the
        // COUNT-OF-COUNTS table (one row per distinct frequency,
        // O(sqrt n) by Zipf): compute each block's exclusive offset o
        // with a log2(f)-banded running sum (bands ≤ 64 — every window
        // below is band-bounded), then expand each block's Σx / Σx²
        // analytically over the ≤48 log2 rank bands that intersect its
        // run. Token order inside a tie block is irrelevant to the x
        // multiset, so this is value-identical to the oracle's
        // row_number() ORDER BY f DESC, tok.
        val W = org.apache.spark.sql.expressions.Window
        val vocab = tbl(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        val ff = vocab.groupBy(col("f")).agg(count(lit(1)).as("c"))
          .withColumn("band", (length(conv(col("f"), 10, 2)) - 1).cast("int"))
        val run = ff.withColumn("rc", sum(col("c"))
          .over(W.partitionBy(col("band")).orderBy(col("f").desc)))
        val off = ff.groupBy(col("band")).agg(sum(col("c")).as("tb"))
          .select(col("band"), coalesce(sum(col("tb")).over(
            OpsKit.boundedWin.orderBy(col("band").desc)
              .rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("bo"))
        val blocks = run.join(broadcast(off), "band")
          .select(col("c"), (col("bo") + col("rc") - col("c")).as("o"),
            (length(conv(col("f"), 10, 2)) - 1).cast("long").as("y"))
        // m = |[2^j, 2^{j+1}-1] ∩ [o+1, o+c]| tokens of this block have
        // x = j; 48 bands cover every possible vocabulary rank
        val expanded = blocks
          .select(col("c"), col("o"), col("y"),
            explode(sequence(lit(0), lit(47))).as("j"))
          .withColumn("jlo", expr("shiftleft(CAST(1 AS BIGINT), j)"))
          .withColumn("jhi", expr("shiftleft(CAST(1 AS BIGINT), j + 1) - 1"))
          .withColumn("m", greatest(lit(0L),
            least(col("jhi"), col("o") + col("c")) -
              greatest(col("jlo"), col("o") + 1) + 1))
          .filter(col("m") > 0)
          .withColumn("x", col("j").cast("long"))
        expanded
          .agg(sum(col("m")).as("n"),
            sum(col("x") * col("m")).as("sx"),
            sum(col("y") * col("m")).as("sy"),
            sum(col("x") * col("y") * col("m")).as("sxy"),
            sum(col("x") * col("x") * col("m")).as("sxx"))
          .select(col("n").as("n_vocab"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              .as("zipf_slope"),
            ((col("sy").cast("double") -
              ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
                * col("sx").cast("double")) / col("n").cast("double"))
              .as("intercept"))
      },
      Some("""WITH v AS (
             |  SELECT tok, COUNT(*) AS f FROM (
             |    SELECT unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  GROUP BY tok),
             |r AS (
             |  SELECT CAST(length(bin(row_number() OVER
             |      (ORDER BY f DESC, tok))) - 1 AS BIGINT) AS x,
             |    CAST(length(bin(f)) - 1 AS BIGINT) AS y
             |  FROM v),
             |m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx
             |  FROM r)
             |SELECT n AS n_vocab,
             |  CAST(n * sxy - sx * sy AS DOUBLE) /
             |    CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope,
             |  (CAST(sy AS DOUBLE) -
             |    (CAST(n * sxy - sx * sy AS DOUBLE) /
             |     CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS intercept
             |FROM m""".stripMargin)),

    // ----- q157: surprise-bucket mixing report (CCNet head/middle/tail) ---
    // The selection table a CCNet-style LM filter actually emits: per
    // (source, surprise bucket), how many documents and tokens sit there
    // — the grid an operator reads to set per-source keep thresholds
    // ("head" = typical transitions, "tail" = word soup). Buckets are
    // FIXED-WIDTH tenths of q107's surprise_frac (floor(s·10) clamped to
    // 9) rather than global quantiles: fixed cutoffs are what CCNet
    // ships (precomputed per language), they cost ZERO extra shuffles —
    // the alternative global rank is exactly the single-partition window
    // this repo bans — and the floor is cross-engine exact because both
    // engines compute s = k/n and s·10 with the same two IEEE ops.
    // Consumes the SAME bigramDocScores plan (and oracle CTE) as q107 —
    // in a session that ran q107, the scores' docBigrams input is
    // already materialized. Output: (source, bucket) grid with doc and
    // bigram-token volumes and the decimal-exact mean surprise per cell.
    NamedQuery(
      "q157_surprise_buckets",
      (s, d) => {
        val scores = bigramDocScores(s, d)
        val bucket = least(floor(col("surprise_frac") * 10), lit(9.0))
          .cast("long")
        tbl(s, d, "documents").select(col("doc_id"), col("source"))
          .join(scores, "doc_id")
          .select(col("source"), bucket.as("bucket"),
            col("n_bigrams"), col("surprise_frac"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bigrams")).as("n_bigrams"),
            (dsum(col("surprise_frac")) / count(lit(1)))
              .as("mean_surprise"))
      },
      Some(s"""WITH $bigramScoreCteSql
              |SELECT d.source,
              |  CAST(least(floor(s.surprise_frac * 10), 9) AS BIGINT)
              |    AS bucket,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(s.n_bigrams) AS BIGINT) AS n_bigrams,
              |  ${dsumSql("s.surprise_frac")} / COUNT(*) AS mean_surprise
              |FROM scores s JOIN documents d USING (doc_id)
              |GROUP BY d.source, bucket""".stripMargin)),

    // ----- q158: interpolated Kneser-Ney bigram document score ------------
    // The smoothed counterpart to q107's raw bigram LM — the estimator a
    // production perplexity filter actually uses (Kneser & Ney 1995;
    // Chen & Goodman 1998's interpolated form with a fixed absolute
    // discount D = 0.75, exactly representable in binary so both engines
    // compute identical doubles):
    //   P_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    //               + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/N1+(··)
    // The second term is what distinguishes KN from simple backoff: a
    // word's unigram weight is how many distinct CONTEXTS it follows
    // (continuation count), not its raw frequency — "Francisco" is
    // frequent but only ever follows "San", so KN correctly refuses to
    // predict it in fresh contexts where a raw-frequency backoff
    // over-scores it. Per document: occurrence-weighted mean P_KN over
    // its bigrams and the mean backoff mass λ(w1) = D·N1+(w1,·)/c(w1·)
    // (how much of the doc's probability came from the smoother rather
    // than observed transitions — high λ = the doc lives in sparse
    // contexts). All counts (c12, c1, the three N1+ type counts) are
    // exact integers derived from the SAME persisted docBigrams working
    // set as q107/q118/q157 — no re-explode; the only doubles are the
    // final per-type P_KN/λ expressions (identical IEEE trees both
    // engines) and the decimal-exact per-doc sums (dsum, q62's
    // discipline). Scale shape: three partial-agg shuffles over the
    // BIGRAM-TYPE table (far below token-stream scale), hash equi-joins
    // back, one broadcast scalar for N1+(··); linear in corpus tokens,
    // no windows, no driver state.
    NamedQuery(
      "q158_kneser_ney",
      (s, d) => {
        val grouped = docBigrams(s, d)
        val types = grouped.groupBy(col("bg")).agg(sum(col("k")).as("c12"))
          .withColumn("w1", substring_index(col("bg"), "\u0001", 1))
          .withColumn("w2", substring_index(col("bg"), "\u0001", -1))
        val pre = types.groupBy(col("w1"))
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
        val cont = types.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
        val ntypes = types.agg(count(lit(1)).as("nt"))
        val lam = lit(0.75) * col("n1f").cast("double") /
          col("c1").cast("double")
        val pkn = types.join(pre, "w1").join(cont, "w2")
          .crossJoin(broadcast(ntypes))
          .select(col("bg"),
            (greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) /
              col("c1").cast("double") +
              lam * (col("n1p").cast("double") / col("nt").cast("double")))
              .as("pkn"),
            lam.as("lam"))
        grouped.join(pkn, "bg")
          .groupBy(col("doc_id"))
          .agg(sum(col("k")).as("n_bigrams"),
            dsum(col("k").cast("double") * col("pkn")).as("skn"),
            dsum(col("k").cast("double") * col("lam")).as("slam"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("skn") / col("n_bigrams").cast("double"))
              .as("mean_kn_prob"),
            (col("slam") / col("n_bigrams").cast("double"))
              .as("mean_backoff"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split(text, ' ') AS w
              |  FROM documents),
              |big AS (
              |  SELECT doc_id, unnest([w[i] || chr(1) || w[i+1]
              |                         for i in range(1, len(w))]) AS bg
              |  FROM tok WHERE len(w) >= 2),
              |g AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS k
              |      FROM big GROUP BY doc_id, bg),
              |t AS (SELECT bg, CAST(SUM(k) AS BIGINT) AS c12,
              |        string_split(bg, chr(1))[1] AS w1,
              |        string_split(bg, chr(1))[2] AS w2
              |      FROM g GROUP BY bg),
              |pre AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
              |          CAST(COUNT(*) AS BIGINT) AS n1f
              |        FROM t GROUP BY w1),
              |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p
              |         FROM t GROUP BY w2),
              |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM t),
              |pk AS (
              |  SELECT t.bg,
              |    greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
              |        / CAST(c1 AS DOUBLE)
              |      + (0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
              |        * (CAST(n1p AS DOUBLE) / CAST(nt.nt AS DOUBLE))
              |      AS pkn,
              |    0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE) AS lam
              |  FROM t JOIN pre USING (w1) JOIN cont USING (w2)
              |  CROSS JOIN nt)
              |SELECT g.doc_id, CAST(SUM(g.k) AS BIGINT) AS n_bigrams,
              |  ${dsumSql("CAST(g.k AS DOUBLE) * pk.pkn")}
              |    / CAST(SUM(g.k) AS DOUBLE) AS mean_kn_prob,
              |  ${dsumSql("CAST(g.k AS DOUBLE) * pk.lam")}
              |    / CAST(SUM(g.k) AS DOUBLE) AS mean_backoff
              |FROM g JOIN pk USING (bg)
              |GROUP BY g.doc_id""".stripMargin)),

    // ----- q164: self-trained language-ID evaluation (confusion matrix) ---
    // The eval loop a pipeline's lang-ID component actually runs: TRAIN
    // marker vocabularies from the labeled corpus itself (top-20 most
    // DISTINCTIVE tokens per language by lift c_lt·N/(c_t·n_l) — q118's
    // log-free PMI ranking — with the c ≥ 5 sparse guard), APPLY them
    // as a broadcast marker join scoring each doc by marker hits per
    // language, and EVALUATE as a (actual, predicted) confusion matrix.
    // Unlike q33 (fixed heuristic marker lists, emits raw scores), this
    // derives its vocabulary from the data and grades itself against
    // the labels. The per-doc argmax is deterministic via a composite
    // ordering key — Spark min(struct(BIG − hits, lang)), DuckDB
    // arg_min over the zero-padded string rendering of the same key —
    // max hits first, lexicographically smallest language on ties;
    // docs with zero marker hits predict 'unk' (left-join coalesce on
    // both engines). Scale shape: vocab-sized lift table, ~100-row
    // marker table broadcast into the token stream, one confusion
    // aggregation — the corpus streams twice, no windows over
    // unbounded partitions (the rank window is per-language over the
    // vocabulary).
    NamedQuery(
      "q164_langid_eval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
        // pinned (r18 optimization): clt feeds four consumers (ct, nl,
        // n, the lift table) — unpinned, each re-paid the corpus explode
        // + (lang, tok) aggregation.
        val clt = OpsKit.pinned(toks.groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("c")))
        val ct = clt.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
        val nl = clt.groupBy(col("lang")).agg(sum(col("c")).as("nl"))
        val n = clt.agg(sum(col("c")).as("n"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("lift").desc, col("tok"))
        val mk = clt.filter(col("c") >= 5)
          .join(ct, "tok").join(nl, "lang").crossJoin(broadcast(n))
          .select(col("lang"), col("tok"),
            ((col("c").cast("double") * col("n").cast("double")) /
              (col("ct").cast("double") * col("nl").cast("double")))
              .as("lift"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("lang").as("lang_m"), col("tok"))
        val pred = toks.join(broadcast(mk), "tok")
          .groupBy(col("doc_id"), col("lang_m"))
          .agg(count(lit(1)).as("m"))
          .groupBy(col("doc_id"))
          .agg(min(struct((lit(100000000L) - col("m")).as("k"),
            col("lang_m").as("lm"))).as("best"))
          .select(col("doc_id"), col("best.lm").as("predicted"))
        tbl(s, d, "documents").select(col("doc_id"), col("lang"))
          .join(pred, Seq("doc_id"), "left")
          .select(col("lang"), coalesce(col("predicted"), lit("unk"))
            .as("predicted"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("is_correct", col("lang") === col("predicted"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |clt AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
             |        FROM toks GROUP BY lang, tok),
             |ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct
             |       FROM clt GROUP BY tok),
             |nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nl
             |       FROM clt GROUP BY lang),
             |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM clt),
             |lifted AS (
             |  SELECT clt.lang, clt.tok,
             |    (CAST(c AS DOUBLE) * CAST(n.n AS DOUBLE))
             |      / (CAST(ct.ct AS DOUBLE) * CAST(nl.nl AS DOUBLE))
             |      AS lift
             |  FROM clt JOIN ct USING (tok)
             |    JOIN nl ON clt.lang = nl.lang CROSS JOIN n
             |  WHERE c >= 5),
             |mk AS (
             |  SELECT lang AS lang_m, tok FROM (
             |    SELECT lang, tok, row_number() OVER (
             |      PARTITION BY lang ORDER BY lift DESC, tok) AS rn
             |    FROM lifted)
             |  WHERE rn <= 20),
             |hits AS (
             |  SELECT t.doc_id, m.lang_m, CAST(COUNT(*) AS BIGINT) AS m
             |  FROM toks t JOIN mk m USING (tok)
             |  GROUP BY t.doc_id, m.lang_m),
             |pred AS (
             |  SELECT doc_id,
             |    arg_min(lang_m,
             |      lpad(CAST(100000000 - m AS VARCHAR), 9, '0') || lang_m)
             |      AS predicted
             |  FROM hits GROUP BY doc_id)
             |SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  lang = predicted AS is_correct
             |FROM (
             |  SELECT d.lang, COALESCE(p.predicted, 'unk') AS predicted
             |  FROM documents d LEFT JOIN pred p USING (doc_id))
             |GROUP BY lang, predicted""".stripMargin)),


    // ----- q176: pairwise source divergence (TV + Hellinger) --------------
    // The mixture-design question q76's MinHash answer can't see: HOW FAR
    // APART are two sources as unigram DISTRIBUTIONS (not just how much
    // raw text they share). Total-variation distance (½Σ|p−q|, pure
    // rational) and squared Hellinger distance (1−Σ√(pq) — sqrt is
    // IEEE-correctly-rounded on both engines, the cosineSql contract, so
    // this is the one f-divergence the no-libm rule licenses; KL/JSD's ln
    // is why chi-square guards drift in q96 instead). Distributions are
    // densified over the corpus top-V vocabulary (V=200, count-desc/tok
    // tie-break) plus an explicit '<other>' residual bucket so both
    // vectors sum to exactly 1 and the pair meet is a bounded
    // sources×(V+1) frame; per-term contributions round onto the decimal
    // grid before the order-independent sum. Scale: sources are
    // provenance-bounded (≤ thousands), vocab is capped — the quadratic
    // lives on S²·(V+1), never on the corpus.
    NamedQuery(
      "q176_source_divergence",
      (s, d) => {
        val toks = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        val st = toks.groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
        val tot = st.groupBy(col("source")).agg(sum(col("c")).as("tot"))
        val vocab = st.groupBy(col("tok")).agg(sum(col("c")).as("gc"))
          .orderBy(col("gc").desc, col("tok")).limit(200)
          .select(col("tok"))
        val inVocab = st.join(broadcast(vocab), "tok")
        val other = inVocab.groupBy(col("source"))
          .agg(sum(col("c")).as("vc"))
          .join(tot, "source")
          .select(col("source"), lit("<other>").as("tok"),
            (col("tot") - col("vc")).as("c"))
        val universe = vocab.select(col("tok"))
          .unionByName(s.range(1).select(lit("<other>").as("tok")))
        val dense = tot.select(col("source"), col("tot"))
          .crossJoin(broadcast(universe))
          .join(inVocab.select(col("source"), col("tok"), col("c"))
            .unionByName(other), Seq("source", "tok"), "left")
          .select(col("source"), col("tok"),
            (coalesce(col("c"), lit(0L)).cast("double") /
              col("tot").cast("double")).as("p"))
        val a = dense.select(col("source").as("s1"), col("tok"),
          col("p").as("pa"))
        val b = dense.select(col("source").as("s2"), col("tok"),
          col("p").as("pb"))
        a.join(b, Seq("tok")).filter(col("s1") < col("s2"))
          .select(col("s1"), col("s2"),
            abs(col("pa") - col("pb")).as("td"),
            sqrt(col("pa") * col("pb")).as("bc"))
          .groupBy(col("s1"), col("s2"))
          .agg((lit(0.5) * dsum(col("td"))).as("tv_dist"),
            (lit(1.0) - dsum(col("bc"))).as("hellinger2"))
      },
      Some(s"""WITH tok AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
             |       FROM tok GROUP BY source, tok),
             |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot
             |        FROM st GROUP BY source),
             |vocab AS (SELECT tok FROM (
             |  SELECT tok, SUM(c) AS gc FROM st GROUP BY tok
             |  ORDER BY gc DESC, tok LIMIT 200)),
             |iv AS (SELECT st.* FROM st JOIN vocab USING (tok)),
             |oth AS (
             |  SELECT iv.source, '<other>' AS tok,
             |    tot.tot - SUM(iv.c) AS c
             |  FROM iv JOIN tot USING (source)
             |  GROUP BY iv.source, tot.tot),
             |uni AS (SELECT tok FROM vocab UNION ALL SELECT '<other>'),
             |cnt AS (SELECT source, tok, c FROM iv
             |        UNION ALL SELECT source, tok, c FROM oth),
             |dense AS (
             |  SELECT t.source, u.tok,
             |    CAST(COALESCE(cnt.c, 0) AS DOUBLE)
             |      / CAST(t.tot AS DOUBLE) AS p
             |  FROM tot t CROSS JOIN uni u
             |  LEFT JOIN cnt ON cnt.source = t.source AND cnt.tok = u.tok)
             |SELECT a.source AS s1, b.source AS s2,
             |  0.5 * ${dsumSql("abs(a.p - b.p)")} AS tv_dist,
             |  1.0 - ${dsumSql("sqrt(a.p * b.p)")} AS hellinger2
             |FROM dense a JOIN dense b
             |  ON a.tok = b.tok AND a.source < b.source
             |GROUP BY a.source, b.source""".stripMargin)),

    // ----- q187: positional phrase search ---------------------------------
    // The retrieval feature tf can't fake: exact PHRASE match. A
    // positional posting list (term → (doc, position)) for each phrase
    // term, adjacency joined on (doc, pos+1) — the standard inverted-
    // index phrase walk, here for the bigram "table hash". The term
    // filters push into the token explode, so only the two phrase
    // terms' postings ever leave the scan (posting-list-sized, not
    // corpus-sized — the q139 DAAT contract); the adjacency meet is an
    // equi join on (doc_id, p). Per matching doc: occurrence count and
    // the first match position (1-based), top-20 by count. Extending to
    // k-term phrases chains k−1 of the same join.
    NamedQuery(
      "q187_phrase_search",
      (s, d) => {
        // pos_tokens: the native single-pass generator (PosTokensGen) —
        // value-identical to posexplode(split(text,' ')), parity-pinned
        // in NativeExprSpec, no intermediate token array per row
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"),
            expr("pos_tokens(text)").as(Seq("pos", "tok")))
        val p1 = toks.filter(col("tok") === "table")
          .select(col("doc_id"), col("pos").as("p"))
        val p2 = toks.filter(col("tok") === "hash")
          .select(col("doc_id"), (col("pos") - 1).as("p"))
        p1.join(p2, Seq("doc_id", "p"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_occurrences"),
            (min(col("p")) + 1).cast("long").as("first_pos"))
          .orderBy(col("n_occurrences").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS l
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, i, l[i] AS tok
             |  FROM t, unnest(range(1, len(l) + 1)) AS u(i)),
             |hits AS (
             |  SELECT a.doc_id, a.i
             |  FROM pos a JOIN pos b
             |    ON b.doc_id = a.doc_id AND b.i = a.i + 1
             |  WHERE a.tok = 'table' AND b.tok = 'hash')
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             |  CAST(MIN(i) AS BIGINT) AS first_pos
             |FROM hits GROUP BY doc_id
             |ORDER BY n_occurrences DESC, doc_id LIMIT 20""".stripMargin)),

    // ----- q209: Hellinger distance between source word distributions -----
    // The domain-shift matrix a data-mixing decision reads: for every
    // source pair, the Hellinger distance H = √(1 − BC) between their
    // unigram distributions, with the Bhattacharyya coefficient
    // BC = Σ_t √(p_t·q_t) summed over the shared vocabulary (a term in
    // only one source contributes 0). Hellinger over KL/JS because √ is
    // a correctly-rounded IEEE primitive (the q176 transcendental rule)
    // where ln is libm — so the statistic is engine-exact. The BC sum
    // runs through dsum (6-decimal grid) for partition-order
    // independence; 1−BC is clamped at 0 (Cauchy–Schwarz gives BC ≤ 1,
    // the decimal grid can land a hair under from above). Scale shape:
    // per-source unigram tables are vocab-bounded (Heaps' law); the
    // pair expansion joins them on tok, so work is vocab × (pairs
    // sharing the token) — sources², never corpus²; totals broadcast.
    NamedQuery(
      "q209_hellinger_matrix",
      (s, d) => {
        val c = tbl(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
        val n = c.groupBy(col("source")).agg(sum(col("c")).as("n"))
        val p = c.join(broadcast(n), "source")
          .select(col("source"), col("tok"),
            (col("c").cast("double") / col("n").cast("double")).as("p"))
        val bc = p.select(col("source").as("src_a"), col("tok"),
            col("p").as("pa"))
          .join(p.select(col("source").as("src_b"), col("tok"),
            col("p").as("pb")), Seq("tok"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(dsum(sqrt(col("pa") * col("pb"))).as("bc"))
        bc.select(col("src_a"), col("src_b"), col("bc"),
          sqrt(greatest(lit(0.0), lit(1.0) - col("bc"))).as("hellinger"))
      },
      Some(s"""WITH c AS (
              |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
              |  FROM (SELECT source,
              |          unnest(string_split(text, ' ')) AS tok
              |        FROM documents)
              |  GROUP BY source, tok),
              |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
              |      FROM c GROUP BY source),
              |p AS (
              |  SELECT c.source, c.tok,
              |    CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS p
              |  FROM c JOIN n USING (source)),
              |bc AS (
              |  SELECT a.source AS src_a, b.source AS src_b,
              |    ${dsumSql("sqrt(a.p * b.p)")} AS bc
              |  FROM p a JOIN p b ON a.tok = b.tok
              |    AND a.source < b.source
              |  GROUP BY 1, 2)
              |SELECT src_a, src_b, bc,
              |  sqrt(greatest(0.0, 1.0 - bc)) AS hellinger
              |FROM bc""".stripMargin)),

    // ----- q238: token burstiness (variance-to-mean over documents) -------
    // Church & Gale's observation, operationalized: a topical word
    // arrives in BURSTS (many occurrences in few documents — VMR ≫ 1)
    // while a function word spreads Poisson-like (VMR ≈ 1); the index
    // of dispersion over per-document counts INCLUDING zeros separates
    // them where raw frequency can't. The zeros cost nothing: with
    // (df, Σc, Σc²) per token and the document total N, every moment
    // of the zero-padded distribution is already determined — no dense
    // token×document grid exists anywhere. Σc² widens to DECIMAL/
    // HUGEINT before the square (corpus-scale counts); a df ≥ 5 floor
    // keeps one-off typos out of the ranking; the top-20 lands via
    // TakeOrderedAndProject with the token as tie-break.
    NamedQuery(
      "q238_token_burstiness",
      (s, d) => {
        val tc = tbl(s, d, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok"), col("doc_id"))
          .agg(count(lit(1)).as("c"))
        val st = tc.groupBy(col("tok")).agg(
          count(lit(1)).as("df"),
          sum(col("c")).as("tf"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).cast("double")
            .as("s2"))
        val nDocs = tbl(s, d, "documents")
          .agg(count(lit(1)).as("n_docs"))
        val j = st.filter(col("df") >= 5).crossJoin(broadcast(nDocs))
        val nd = col("n_docs").cast("double")
        val mean = col("tf").cast("double") / nd
        val vmr = (col("s2") / nd - mean * mean) / mean
        j.select(col("tok"), col("df"), col("tf"),
            mean.as("mean_count"), vmr.as("vmr"))
          .orderBy(col("vmr").desc, col("tok"))
          .limit(20)
      },
      Some("""WITH tc AS (
             |  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id,
             |          unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY tok, doc_id),
             |st AS (
             |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
             |    CAST(SUM(c) AS BIGINT) AS tf,
             |    CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS s2
             |  FROM tc GROUP BY tok),
             |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
             |       FROM documents)
             |SELECT tok, df, tf,
             |  CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_count,
             |  (s2 / CAST(n_docs AS DOUBLE)
             |    - (CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |      * (CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE)))
             |    / (CAST(tf AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS vmr
             |FROM st, nd WHERE df >= 5
             |ORDER BY vmr DESC, tok LIMIT 20""".stripMargin)),

    // ----- q252: keyness — each source's distinctive vocabulary -----------
    // Corpus linguistics' keyword extraction (chi-square keyness — the
    // log-likelihood G² variant is libm, χ² is rational): for every
    // (source, token), the 2×2 association of "this token" × "this
    // source" against the rest of the corpus, keeping only
    // OVER-represented tokens (observed > expected by integer
    // cross-multiplication — under-representation scores high χ² too
    // and would pollute a keyword list). Top-10 per source through the
    // custom TopKPerGroup operator (its third call site — a 20-way
    // grouped top-k over a vocab×sources table is exactly the shape
    // the bounded-heap operator exists for). χ²'s products run as
    // identical double trees; all counts exact integers; everything
    // vocab×source-bounded after one token rollup.
    NamedQuery(
      "q252_keyness",
      (s, d) => {
        val tc = tbl(s, d, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("a"))
        val tokTot = tc.groupBy(col("tok")).agg(sum(col("a")).as("t_tok"))
        val srcTot = tc.groupBy(col("source")).agg(sum(col("a")).as("t_src"))
        val grand = tc.agg(sum(col("a")).as("t_all"))
        val cells = tc.join(tokTot, "tok")
          .join(broadcast(srcTot), "source")
          .crossJoin(broadcast(grand))
          // over-representation gate: a·N > t_tok·t_src (integer-exact)
          .filter(expr("CAST(a AS DECIMAL(38,0)) * t_all") >
            expr("CAST(t_tok AS DECIMAL(38,0)) * t_src"))
        val ad = col("a").cast("double")
        val bd = (col("t_tok") - col("a")).cast("double")
        val cd = (col("t_src") - col("a")).cast("double")
        val dd = (col("t_all") - col("t_tok") - col("t_src") + col("a"))
          .cast("double")
        val nd = col("t_all").cast("double")
        val chi = nd * (ad * dd - bd * cd) * (ad * dd - bd * cd) /
          ((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd))
        val scored = cells.select(col("source"), col("tok"), col("a"),
          col("t_tok"), chi.as("chi2"))
        graft.plans.TopKPerGroup.topK(scored, keys = Seq("source"),
          order = Seq(("chi2", true), ("tok", false)), k = 10)
      },
      Some("""WITH tc AS (
             |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS a
             |  FROM (SELECT source,
             |          unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY source, tok),
             |tt AS (SELECT tok, CAST(SUM(a) AS BIGINT) AS t_tok
             |       FROM tc GROUP BY tok),
             |ts AS (SELECT source, CAST(SUM(a) AS BIGINT) AS t_src
             |       FROM tc GROUP BY source),
             |g AS (SELECT CAST(SUM(a) AS BIGINT) AS t_all FROM tc),
             |cells AS (
             |  SELECT tc.source, tc.tok, tc.a, tt.t_tok, ts.t_src,
             |    g.t_all
             |  FROM tc JOIN tt USING (tok) JOIN ts USING (source), g
             |  WHERE CAST(tc.a AS HUGEINT) * g.t_all
             |        > CAST(tt.t_tok AS HUGEINT) * ts.t_src),
             |scored AS (
             |  SELECT source, tok, a, t_tok,
             |    CAST(t_all AS DOUBLE)
             |      * (CAST(a AS DOUBLE)
             |           * CAST(t_all - t_tok - t_src + a AS DOUBLE)
             |         - CAST(t_tok - a AS DOUBLE)
             |           * CAST(t_src - a AS DOUBLE))
             |      * (CAST(a AS DOUBLE)
             |           * CAST(t_all - t_tok - t_src + a AS DOUBLE)
             |         - CAST(t_tok - a AS DOUBLE)
             |           * CAST(t_src - a AS DOUBLE))
             |      / ((CAST(a AS DOUBLE) + CAST(t_tok - a AS DOUBLE))
             |         * (CAST(t_src - a AS DOUBLE)
             |            + CAST(t_all - t_tok - t_src + a AS DOUBLE))
             |         * (CAST(a AS DOUBLE) + CAST(t_src - a AS DOUBLE))
             |         * (CAST(t_tok - a AS DOUBLE)
             |            + CAST(t_all - t_tok - t_src + a AS DOUBLE)))
             |      AS chi2
             |  FROM cells)
             |SELECT source, tok, a, t_tok, chi2 FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source
             |    ORDER BY chi2 DESC, tok) AS rk
             |  FROM scored)
             |WHERE rk <= 10""".stripMargin)),

    // ----- q275: vocabulary richness — Chao1 + Good–Turing ----------------
    // "How much of the corpus's type inventory have we actually seen?"
    // — the coverage question behind dedup budgeting and tokenizer
    // sizing. Over 3-gram shingle hashes (the raw 31-token synthetic
    // vocabulary is fully saturated at any SF, so token-level
    // frequencies-of-frequencies would be degenerate — the standing
    // hashedShingles discipline): D observed types, f_r = types seen
    // exactly r times, and two classical estimators from the SAME
    // frequency-of-frequency table:
    //   Chao1 (bias-corrected, Chao 1984):  D + f1·(f1−1)/(2·(f2+1))
    //   Good–Turing adjusted counts (1953): r* = (r+1)·f_{r+1}/f_r
    // Output: one row per r ≤ 10 (r, f_r, r_star) with the global
    // D / f1 / f2 / chao1 broadcast onto each — every count a BIGINT,
    // chao1 and r_star single fixed-order IEEE expressions. Scale
    // shape: shingle explode (linear) → type-count groupBy →
    // frequency-of-frequency groupBy — the second aggregate's input is
    // |vocab| rows and the third's is ≤ max-count rows; the lead()
    // window runs over that ≤max-count-row table, effectively bounded.
    NamedQuery(
      "q275_vocab_richness",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = tbl(s, d, "documents")
          .select(explode(LlmKit.hashedShingles(col("text"))).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("r"))
        val fof = counts.groupBy(col("r")).agg(count(lit(1)).as("f_r"))
        val tot = fof.agg(sum(col("f_r")).as("types"),
          sum(when(col("r") === 1, col("f_r")).otherwise(0L)).as("f1"),
          sum(when(col("r") === 2, col("f_r")).otherwise(0L)).as("f2"))
        // lead over the FoF table ordered by r: f_{r+1} may be absent
        // (no type occurs exactly r+1 times) → r_star NULL, not 0 — an
        // absent class is "no estimate", not "estimate zero"
        val w = boundedWin.orderBy(col("r"))
        fof.withColumn("r_next", lead(col("r"), 1).over(w))
          .withColumn("f_next", lead(col("f_r"), 1).over(w))
          .filter(col("r") <= 10)
          .crossJoin(broadcast(tot))
          .select(col("r"), col("f_r"),
            when(col("r_next") === col("r") + 1,
              (col("r") + 1).cast("double") *
                col("f_next").cast("double") /
                col("f_r").cast("double")).as("r_star"),
            col("types"), col("f1"), col("f2"),
            (col("types").cast("double") +
              col("f1").cast("double") * (col("f1") - 1).cast("double") /
                (lit(2.0) * (col("f2") + 1).cast("double"))).as("chao1"))
      },
      Some(s"""WITH sh AS (
             |  SELECT unnest(${LlmKit.hashedShinglesSql("text",
                 LlmKit.tokenHashesSql("text"))}) AS sh
             |  FROM documents),
             |counts AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS r
             |           FROM sh GROUP BY sh),
             |fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS f_r
             |        FROM counts GROUP BY r),
             |tot AS (SELECT CAST(SUM(f_r) AS BIGINT) AS types,
             |  CAST(SUM(CASE WHEN r = 1 THEN f_r ELSE 0 END) AS BIGINT)
             |    AS f1,
             |  CAST(SUM(CASE WHEN r = 2 THEN f_r ELSE 0 END) AS BIGINT)
             |    AS f2
             |  FROM fof),
             |led AS (
             |  SELECT r, f_r, lead(r, 1) OVER (ORDER BY r) AS r_next,
             |    lead(f_r, 1) OVER (ORDER BY r) AS f_next
             |  FROM fof)
             |SELECT l.r, l.f_r,
             |  CASE WHEN l.r_next = l.r + 1
             |       THEN CAST(l.r + 1 AS DOUBLE) * CAST(l.f_next AS DOUBLE)
             |            / CAST(l.f_r AS DOUBLE) END AS r_star,
             |  t.types, t.f1, t.f2,
             |  CAST(t.types AS DOUBLE)
             |    + CAST(t.f1 AS DOUBLE) * CAST(t.f1 - 1 AS DOUBLE)
             |      / (2.0 * CAST(t.f2 + 1 AS DOUBLE)) AS chao1
             |FROM led l CROSS JOIN tot t WHERE l.r <= 10""".stripMargin)),

    // ----- q303: learned language-ID confusion matrix (r15) ----------------
    // q33 identifies via fixed marker lists; this is the LEARNED form a
    // real pipeline runs: train a token→language model on half the
    // corpus (even doc_ids), keep only DISCRIMINATIVE tokens (top
    // language holds ≥ 2/3 of the token's training mass — the filter
    // that separates language-bearing vocabulary from shared filler),
    // and measure on the held-out half against the `lang` labels: the
    // confusion matrix + unknown column a language-filter rollout is
    // judged by. The testdata's text is lexically language-neutral, so
    // the signal is PLANTED the way q59 plants PII: 3 in 4 documents
    // (by salted md5) carry one language-marker token ("xx" + lang)
    // prepended to the text on BOTH engine and oracle; markers train to
    // 100% concentration and survive the filter, shared filler spreads
    // across languages (en holds ~44% of docs — far below 2/3) and
    // drops out, so marked test docs classify to their language and
    // unmarked ones fall to 'unk' — every matrix branch visibly fires
    // (the r12 degeneracy discipline applied at design time). All
    // counts are integers; ties break (count desc, language asc) on
    // both engines. Scale shape: the model is VOCABULARY-sized (one
    // groupBy + per-token argmax window partitioned by token + one
    // vocabulary-local total), test postings meet it in one hash join,
    // and the per-doc argmax is a bounded min(struct) aggregate — two
    // corpus scans, no corpus-squared term anywhere.
    NamedQuery(
      "q303_langid_confusion",
      (s, d) => {
        val marked = LlmKit.strHash(
          concat(lit("l:"), col("doc_id").cast("string"))) % 4 < 3
        val text2 = when(marked,
          concat(lit("xx"), col("lang"), lit(" "), col("text")))
          .otherwise(col("text"))
        val docs = tbl(s, d, "documents")
          .select(col("doc_id"), col("lang"), text2.as("text"))
        val toks = docs
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val wTok = org.apache.spark.sql.expressions.Window
          .partitionBy(col("tok"))
          .orderBy(col("c").desc, col("lang"))
        val counts = toks.filter(col("doc_id") % 2 === 0)
          .groupBy(col("tok"), col("lang"))
          .agg(count(lit(1)).as("c"))
        val model = counts
          .withColumn("rn", row_number().over(wTok))
          .withColumn("ctot", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("tok"))))
          .filter(col("rn") === 1 && col("c") * 3 >= col("ctot") * 2)
          .select(col("tok"), col("lang").as("tok_lang"))
        // LEFT join so unmatched tokens ride along and a doc with zero
        // discriminative tokens still yields a row — the test half is
        // scanned ONCE (a separate label scan would be a third corpus
        // scan); the per-doc argmax prefers any non-null vote (struct
        // ordering: isNull false < true), then count desc, then language
        val votes = toks.filter(col("doc_id") % 2 === 1)
          .join(model, Seq("tok"), "left")
          .groupBy(col("doc_id"), col("lang"), col("tok_lang"))
          .agg(count(lit(1)).as("v"))
        votes.groupBy(col("doc_id"), col("lang"))
          .agg(min(struct(col("tok_lang").isNull.as("nu"),
            (-col("v")).as("nv"),
            coalesce(col("tok_lang"), lit("unk")).as("tl"))).as("m"))
          .select(col("lang"), col("m.tl").as("predicted"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH docs AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN ${LlmKit.strHashSql(
                  "concat('l:', CAST(doc_id AS VARCHAR))")} % 4 < 3
             |      THEN 'xx' || lang || ' ' || text ELSE text END AS text
             |  FROM documents),
             |t AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             |  FROM docs),
             |tf AS (SELECT doc_id, lang, tok FROM t WHERE tok <> ''),
             |m0 AS (
             |  SELECT tok, lang, COUNT(*) AS c
             |  FROM tf WHERE doc_id % 2 = 0 GROUP BY tok, lang),
             |model AS (
             |  SELECT tok, lang AS tok_lang
             |  FROM (SELECT tok, lang, c,
             |          row_number() OVER (PARTITION BY tok
             |            ORDER BY c DESC, lang) AS rn,
             |          SUM(c) OVER (PARTITION BY tok) AS ctot
             |        FROM m0)
             |  WHERE rn = 1 AND c * 3 >= ctot * 2),
             |votes AS (
             |  SELECT f.doc_id, f.lang, m.tok_lang, COUNT(*) AS v
             |  FROM tf f LEFT JOIN model m USING (tok)
             |  WHERE f.doc_id % 2 = 1
             |  GROUP BY f.doc_id, f.lang, m.tok_lang),
             |pred AS (
             |  SELECT lang, COALESCE(tok_lang, 'unk') AS predicted
             |  FROM (SELECT doc_id, lang, tok_lang,
             |          row_number() OVER (PARTITION BY doc_id
             |            ORDER BY (tok_lang IS NULL), v DESC, tok_lang)
             |            AS rn
             |        FROM votes)
             |  WHERE rn = 1)
             |SELECT lang, predicted, COUNT(*) AS n
             |FROM pred GROUP BY lang, predicted""".stripMargin)),

    // ----- q307: char-3-gram lang-ID — generalization past the marker ------
    // q303's signal is ONE recognizable marker token; this is the second
    // feature family the r15 verdict asked for: character 3-grams hashed
    // into 4096 slots (q223's hashing-trick machinery), trained/tested
    // on the same even/odd split with the same 2/3-concentration filter
    // and integer-tie contract. The signal here is DISTRIBUTED
    // orthography, not a marker: in 3-of-4 documents (salted md5), every
    // token at a hash-selected 1-in-3 position gains its language's
    // characteristic digraph ("th"/"sch"/"aux"/"cion"/"zhi") — so the
    // model must aggregate sub-word evidence across MANY wordforms
    // (every "...sch" trigram family votes de), and held-out docs
    // classify from combinations of (wordform × position) the training
    // half never saw — non-marker diagonal mass by construction. A
    // 1-in-8 code-switched subset carries the NEXT language's digraph
    // (de→en→es→fr→zh→de), so off-diagonal cells fire deterministically;
    // unmarked docs carry only filler grams (concentration ≈ the en
    // prior, far below 2/3 — filtered) and fall to 'unk'. Every matrix
    // branch fires (r12 degeneracy discipline). Scale shape = q303's:
    // the model is SLOT-bounded (≤4096 rows), the argmax window
    // partitions by slot, test grams meet it in one hash join, the
    // per-doc argmax is a bounded min(struct) — two corpus scans, no
    // corpus² term.
    NamedQuery(
      "q307_langid_chargrams",
      (s, d) => {
        val nextLang = when(col("lang") === "de", "en")
          .when(col("lang") === "en", "es")
          .when(col("lang") === "es", "fr")
          .when(col("lang") === "fr", "zh").otherwise("de")
        val dgLang = when(LlmKit.strHash(
          concat(lit("w:"), col("doc_id").cast("string"))) % 8 === 0,
          nextLang).otherwise(col("lang"))
        val dg = when(dgLang === "en", "th").when(dgLang === "de", "sch")
          .when(dgLang === "fr", "aux").when(dgLang === "es", "cion")
          .otherwise("zhi")
        val marked = LlmKit.strHash(
          concat(lit("o:"), col("doc_id").cast("string"))) % 4 < 3
        val tk = split(col("text"), " ")
        val suffixed = transform(tk, (t, i) =>
          when(LlmKit.strHash(concat(col("doc_id").cast("string"),
            lit(":"), (i + 1).cast("string"))) % 3 === 0,
            concat(t, col("dg"))).otherwise(t))
        val toks = tbl(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"), dg.as("dg"))
          .select(col("doc_id"), col("lang"),
            explode(when(marked, suffixed).otherwise(tk)).as("tok"))
          .filter(col("tok") =!= "")
        // One-scan form (pinned slot table shared by the train/test
        // branches) tried and REVERTED (r19, r18 verdict item 7): six
        // interleaved pre/post A/B pairs at sf0.1 read the pinned form
        // slower in 4/6 (medians 3.4 s two-branch vs 3.9 s pinned) — the
        // checkpoint write+read of the corpus-scale (doc, lang, slot)
        // explode costs more than re-hashing each gram once per branch,
        // confirming the r18 defense of the doc_id%2 two-branch split.
        val slots = toks.select(col("doc_id"), col("lang"),
          explode(transform(
            sequence(lit(1), greatest(length(col("tok")) - 2, lit(1))),
            i => LlmKit.strHash(col("tok").substr(i, lit(3))) % 4096))
            .as("slot"))
        val wSlot = org.apache.spark.sql.expressions.Window
          .partitionBy(col("slot")).orderBy(col("c").desc, col("lang"))
        val model = slots.filter(col("doc_id") % 2 === 0)
          .groupBy(col("slot"), col("lang")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(wSlot))
          .withColumn("ctot", sum(col("c")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("slot"))))
          .filter(col("rn") === 1 && col("c") * 3 >= col("ctot") * 2)
          .select(col("slot"), col("lang").as("slot_lang"))
        val votes = slots.filter(col("doc_id") % 2 === 1)
          .join(model, Seq("slot"), "left")
          .groupBy(col("doc_id"), col("lang"), col("slot_lang"))
          .agg(count(lit(1)).as("v"))
        votes.groupBy(col("doc_id"), col("lang"))
          .agg(min(struct(col("slot_lang").isNull.as("nu"),
            (-col("v")).as("nv"),
            coalesce(col("slot_lang"), lit("unk")).as("tl"))).as("m"))
          .select(col("lang"), col("m.tl").as("predicted"))
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH docs7 AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS tk,
             |    ${LlmKit.strHashSql(
                  "concat('o:', CAST(doc_id AS VARCHAR))")} % 4 < 3
             |      AS marked,
             |    CASE WHEN ${LlmKit.strHashSql(
                  "concat('w:', CAST(doc_id AS VARCHAR))")} % 8 = 0
             |      THEN CASE lang WHEN 'de' THEN 'en' WHEN 'en' THEN 'es'
             |                     WHEN 'es' THEN 'fr' WHEN 'fr' THEN 'zh'
             |                     ELSE 'de' END
             |      ELSE lang END AS dglang
             |  FROM documents),
             |d2 AS (
             |  SELECT doc_id, lang, tk, marked,
             |    CASE dglang WHEN 'en' THEN 'th' WHEN 'de' THEN 'sch'
             |                WHEN 'fr' THEN 'aux' WHEN 'es' THEN 'cion'
             |                ELSE 'zhi' END AS dg
             |  FROM docs7),
             |toks AS (
             |  SELECT doc_id, lang,
             |    unnest(CASE WHEN marked THEN
             |      [CASE WHEN ${LlmKit.strHashSql(
                    "concat(CAST(doc_id AS VARCHAR), ':', " +
                      "CAST(i AS VARCHAR))")} % 3 = 0
             |            THEN tk[i] || dg ELSE tk[i] END
             |       for i in range(1, len(tk) + 1)]
             |      ELSE tk END) AS tok
             |  FROM d2),
             |tf AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
             |grams AS (
             |  SELECT doc_id, lang,
             |    unnest([substr(tok, i, 3)
             |            for i in range(1, greatest(len(tok) - 2, 1) + 1)])
             |      AS g
             |  FROM tf),
             |slots AS (SELECT doc_id, lang, ${LlmKit.strHashSql("g")} % 4096
             |            AS slot
             |          FROM grams),
             |m7 AS (SELECT slot, lang, COUNT(*) AS c FROM slots
             |       WHERE doc_id % 2 = 0 GROUP BY slot, lang),
             |model AS (
             |  SELECT slot, lang AS slot_lang FROM (
             |    SELECT slot, lang, c,
             |      row_number() OVER (PARTITION BY slot
             |        ORDER BY c DESC, lang) AS rn,
             |      SUM(c) OVER (PARTITION BY slot) AS ctot
             |    FROM m7) WHERE rn = 1 AND c * 3 >= ctot * 2),
             |votes AS (
             |  SELECT s.doc_id, s.lang, m.slot_lang, COUNT(*) AS v
             |  FROM slots s LEFT JOIN model m USING (slot)
             |  WHERE s.doc_id % 2 = 1 GROUP BY s.doc_id, s.lang,
             |    m.slot_lang),
             |pred AS (
             |  SELECT lang, COALESCE(slot_lang, 'unk') AS predicted
             |  FROM (SELECT doc_id, lang, slot_lang,
             |          row_number() OVER (PARTITION BY doc_id
             |            ORDER BY (slot_lang IS NULL), v DESC, slot_lang)
             |            AS rn
             |        FROM votes) WHERE rn = 1)
             |SELECT lang, predicted, COUNT(*) AS n
             |FROM pred GROUP BY lang, predicted""".stripMargin)),
  )
}
