package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared primitives for the LLM-data-pipeline operators (dedup, similarity,
  * text analysis) over `documents` / `embeddings`.
  *
  * Every primitive here exists in TWO renderings that must stay in lockstep:
  * a Spark Column expression and a DuckDB SQL fragment (the oracle). The
  * parity contract:
  *  - token/shingle hash = first 15 hex chars of md5 → 60-bit integer
  *    (identical hex in both engines; both parse as positive int64);
  *  - all floating-point reductions are LEFT FOLDS with a 0.0 init — both
  *    engines execute the same IEEE-754 double op sequence, so results are
  *    bit-identical, no rounding needed for the hash compare;
  *  - integer arithmetic stays below 2^62 so BIGINT never overflows.
  *
  * Scale notes: everything is per-row (HOFs over arrays) or hash-shuffled
  * by a key — no driver-side loops, no cartesian products except where a
  * bounded candidate subset is explicit.
  */
object LlmKit {

  /** Whitespace tokens (the reference's only tokenizer analog, q05). */
  def toks(c: Column): Column = split(c, " ")

  /** Word 3-gram shingles; short texts fall back to the whole text as a
    * single shingle. Count = n_tokens - 2, matching the oracle's
    * `range(1, len(l)-1)` slice windows. */
  def shingles(c: Column): Column = {
    val t = toks(c)
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3))))
      .otherwise(array(c))
  }

  /** DuckDB rendering of [[shingles]] applied to column expression `e`
    * (binds `l` internally). */
  def shinglesSql(e: String): String =
    s"""CASE WHEN len(string_split($e,' ')) >= 3
       | THEN [array_to_string((string_split($e,' '))[i:i+2], ' ')
       |       for i in range(1, len(string_split($e,' ')) - 1)]
       | ELSE [$e] END""".stripMargin.replace("\n", " ")

  /** 60-bit deterministic string hash: first 15 hex chars of md5. */
  def strHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def strHashSql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  // ---- MinHash ----------------------------------------------------------
  /** Mersenne prime 2^31-1; permutation i is h → (A(i)·h + B(i)) mod P with
    * A(i) = 1103515245·(i+1) mod P, B(i) = (12345 + 2654435761·i) mod P —
    * the same closed form is inlined in the oracle SQL so neither side
    * carries literal tables. */
  val MinhashP = 2147483647L
  val NumHashes = 32
  val LshBands = 8
  val LshRows = 4 // NumHashes / LshBands

  /** Hot-bucket cap for the LSH band self-join: a (band, bkey) bucket of k
    * docs yields k·(k−1)/2 candidate pairs, so one degenerate bucket
    * (boilerplate pages, empty/near-empty docs sharing a signature) turns
    * into a quadratic straggler task on a real crawl. Buckets larger than
    * this are dropped BEFORE the self-join — the LSH analog of q53's
    * stop-gram guard. A true near-dup pair loses recall only if it
    * co-occurs in NO sub-cap bucket across all 8 bands, i.e. both docs sit
    * inside degenerate boilerplate clusters — exactly the pairs exact-hash
    * dedup (q26) already catches. 64² / 2 ≈ 2 K pairs bounds any one
    * bucket's work. */
  val MaxLshBucket = 64

  /** Hashed 3-gram shingles: the native one-pass expression
    * [[graft.functions.HashedShingles]] (md5 per token, arithmetic 3-gram
    * combine, zero intermediate allocation). */
  def hashedShingles(text: Column): Column =
    call_function("hashed_shingles", text)

  /** Declarative reference implementation of [[hashedShingles]] — hash
    * each token once (md5 over ~5 chars, not 3-gram strings), then combine
    * consecutive token hashes arithmetically in a single struct-state fold
    * (state = shingles-so-far + previous two hashes) so the md5-bearing
    * token-hash expression is the aggregate's input, evaluated once per
    * row — the per-outer-element trap documented on
    * [[minhashSigFromHashes]] applies to any `transform(sequence…)` over a
    * recomputed array. Kept as the parity-spec oracle for the native
    * expression (NativeExprSpec). */
  def hashedShinglesDeclarative(text: Column): Column = {
    val th = transform(split(text, " "), t => strHash(t) % MinhashP)
    val init = struct(
      array().cast("array<bigint>").as("hs"),
      lit(-1L).as("p1"), lit(-1L).as("p2"))
    val folded = aggregate(
      th, init,
      (acc, h) => struct(
        when(acc.getField("p1") >= 0,
          concat(acc.getField("hs"), array(
            ((acc.getField("p1") * 31 + acc.getField("p2")) % MinhashP * 31
              + h) % MinhashP)))
          .otherwise(acc.getField("hs")).as("hs"),
        acc.getField("p2").as("p1"), h.as("p2")),
      acc => acc.getField("hs"))
    when(size(split(text, " ")) >= 3, folded)
      .otherwise(array(strHash(text) % MinhashP))
  }

  /** DuckDB rendering of [[hashedShingles]]; `th` must be a bound column
    * holding the token-hash list (see [[tokenHashesSql]]). */
  def hashedShinglesSql(textExpr: String, th: String): String =
    s"""CASE WHEN len($th) >= 3
       | THEN [(($th[i]*31 + $th[i+1]) % $MinhashP * 31 + $th[i+2]) % $MinhashP
       |       for i in range(1, len($th) - 1)]
       | ELSE [${strHashSql(textExpr)} % $MinhashP] END"""
      .stripMargin.replace("\n", " ")

  def tokenHashesSql(textExpr: String): String =
    s"""list_transform(string_split($textExpr, ' '),
       | t -> ${strHashSql("t")} % $MinhashP)""".stripMargin.replace("\n", " ")

  /** MinHash signature (array of NumHashes longs) over a hash array: the
    * native one-pass expression [[graft.functions.MinhashSig]] (primitive
    * long[] minima, 32 multiply-mods per element, zero per-element
    * allocation). */
  def minhashSigFromHashes(hs: Column): Column =
    call_function("minhash_sig", hs)

  /** Declarative reference implementation of [[minhashSigFromHashes]]:
    * ONE left fold over the hashes that maintains all 32 running minima.
    * The naive shape — `transform(0..31, i -> array_min(transform(hs, …)))`
    * — re-evaluates the `hs` argument (with its md5 per shingle) once per
    * OUTER lambda element, i.e. md5 × 32 per shingle: measured 250 s vs
    * ~4 s at sf0.1 for the full LSH query. In the fold, `hs` is the
    * aggregate's input evaluated once per row, and each element costs 32
    * integer ops (but allocates a fresh 32-element accumulator array per
    * element — the native expression removes that too). Kept as the
    * parity-spec oracle for the native expression (NativeExprSpec). */
  def minhashSigDeclarative(hs: Column): Column =
    aggregate(
      hs,
      transform(sequence(lit(0), lit(NumHashes - 1)), _ => lit(MinhashP)),
      (acc, h) => transform(sequence(lit(0), lit(NumHashes - 1)), i => {
        val a = (lit(1103515245L) * (i + 1)) % MinhashP
        val b = (lit(12345L) + lit(2654435761L) * i) % MinhashP
        least(element_at(acc, (i + 1).cast("int")), (a * h + b) % MinhashP)
      }))

  /** DuckDB rendering of [[minhashSigFromHashes]] over an ALREADY-HASHED
    * list expression (ideally a bound CTE column, so it isn't recomputed
    * per signature index). */
  def minhashSigOverHashesSql(hsExpr: String): String =
    s"""list_transform(range(0, $NumHashes), i ->
       | list_min(list_transform($hsExpr,
       |   h -> (((1103515245 * (i+1)) % $MinhashP) * h
       |         + ((12345 + 2654435761 * i) % $MinhashP)) % $MinhashP)))"""
      .stripMargin.replace("\n", " ")

  /** TF-weighted 16-bit SimHash of a text column: one fold over ALL token
    * hashes carrying 16 per-bit counters (a token appearing k times
    * contributes k — that is the TF weight), bits assembled in the finish
    * lambda. Superseded in the query surface by the native codegen
    * expression `simhash16_weighted` ([[graft.functions.Simhash16]]);
    * kept as the parity-spec reference (NativeExprSpec). */
  def simhashWeighted(text: Column): Column =
    simhashFold(transform(split(text, " "), t => strHash(t)))

  /** Set 16-bit SimHash (each DISTINCT token votes once — distinct on the
    * token strings, before hashing). Superseded in the query surface by
    * the native `simhash16`; kept as the parity-spec reference. */
  def simhashSetDeclarative(text: Column): Column =
    simhashFold(transform(array_distinct(split(text, " ")), t => strHash(t)))

  private def simhashFold(hs: Column): Column =
    aggregate(
      hs,
      transform(sequence(lit(0), lit(15)), _ => lit(0L)),
      (acc, h) => transform(sequence(lit(0), lit(15)), j =>
        element_at(acc, (j + 1).cast("int")) +
          when(h.bitwiseAND(pow(lit(2), j).cast("long")) > 0, 1L)
            .otherwise(-1L)),
      bits => aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) =>
        acc + when(element_at(bits, (j + 1).cast("int")) > 0,
          pow(lit(2), j).cast("long")).otherwise(0L)))

  // ---- MinHash + LSH candidate-pair pipeline ----------------------------
  /** Candidate near-dup pairs (id1 < id2, shingle Jaccard ≥ 0.5) over an
    * (doc_id, text) corpus: signature → 8×4 banding → bucket self-join →
    * exact Jaccard on candidates only. Used by q27, q45, q47.
    *
    * shuffle_hash hints (not broadcast): both self-join sides then produce
    * IDENTICAL shuffle exchanges and Spark reuses the first — the
    * signature subtree is computed once, not per join side. */
  /** (doc_id, ds, sig): distinct shingle hashes + MinHash signature per
    * doc. The reusable first stage of every LSH consumer (self-join
    * dedup, cross-corpus contamination, streaming guard). */
  def shingleSigs(corpus: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    corpus
      .select(col("doc_id"),
        array_distinct(hashedShingles(col("text"))).as("ds"))
      .withColumn("sig", minhashSigFromHashes(col("ds")))

  /** The 8×4 banding of a bound `sig` column as an exploded
    * struct(band, bkey) — THE one definition of the band layout. Both
    * batch ([[sigBands]]) and the streaming paths (contaminationHits,
    * clusterAssign — which must carry ts/ds through the explode) use this
    * column, so stream and batch can never band differently. */
  def bandStruct: Column =
    explode(transform(sequence(lit(0), lit(LshBands - 1)), b =>
      struct(b.as("band"),
        array_join(transform(sequence(lit(1), lit(LshRows)), r =>
          element_at(col("sig"), (b * LshRows + r).cast("int"))
            .cast("string")), "_").as("bkey"))))

  /** (doc_id, band, bkey): the 8×4 banding of a signature table —
    * equality on (band, bkey) is the LSH candidate condition. */
  def sigBands(sigs: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    sigs.select(col("doc_id"), bandStruct.as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** Exact shingle-set Jaccard between two bound ds columns. */
  def jaccardOf(s1: Column, s2: Column): Column = {
    val icnt = size(array_intersect(s1, s2))
    icnt.cast("double") / (size(s1) + size(s2) - icnt)
  }

  /** [[sigBands]] with buckets over [[MaxLshBucket]] removed: one window
    * count over the same (band, bkey) key the self-join shuffles on, so
    * the guard adds no extra exchange. [[lshDroppedBuckets]] reports what
    * a given corpus loses. */
  def cappedBands(sigs: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bkey"))
    sigBands(sigs)
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= MaxLshBucket)
      .drop("bsz")
  }

  /** Diagnostic twin of the guard in [[cappedBands]]: the (band, bkey,
    * bucket-size) rows that the cap drops for this corpus — run it (and
    * log the count) whenever near-dup recall on a new corpus matters. */
  def lshDroppedBuckets(corpus: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    sigBands(shingleSigs(corpus))
      .groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > MaxLshBucket)

  def lshCandidatePairs(corpus: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    // The signature table feeds the band pipeline once and the candidate
    // verification twice (s1/s2); without materialization each consumer
    // re-runs the md5-per-token shingle hashing over the full corpus.
    // cache() makes it compute once — and because Spark's CacheManager
    // matches by canonicalized plan, every LSH query over the same corpus
    // (q27/q45/q47/q56/q57, streaming guards) shares the one
    // materialization instead of re-hashing per query.
    val sigs = shingleSigs(corpus).cache()
    val bands = cappedBands(sigs)
    val cand = bands.select(col("band"), col("bkey"), col("doc_id").as("id1"))
      .hint("shuffle_hash")
      .join(bands.select(col("band"), col("bkey"), col("doc_id").as("id2"))
        .hint("shuffle_hash"), Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val sets = sigs.select(col("doc_id"), col("ds"))
    val icnt = size(array_intersect(col("s1"), col("s2")))
    val ucnt = size(col("s1")) + size(col("s2")) - icnt
    cand
      .join(sets.select(col("doc_id").as("id1"), col("ds").as("s1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("ds").as("s2")), Seq("id2"))
      .select(col("id1"), col("id2"), (icnt.cast("double") / ucnt).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Oracle CTE chain for ONE side's signatures + bands, prefix-named so
    * two sides can coexist in a query: emits `${p}_sigs($idCol, ds, sig)`
    * and `${p}_bands($idCol, b, bkey)` over a caller CTE `$src($idCol,
    * text)`. Deliberately NO bucket cap — the stream-static paths
    * ([[graft.streaming.StreamOps.contaminationHits]], `clusterAssign`)
    * band each side independently and equi-join across sides (the static
    * side is the bounded one there), and the oracle must mirror that. */
  def sideBandsCteSql(p: String, src: String, idCol: String): String =
    s"""${p}_tokh AS (
       |  SELECT $idCol, text, ${tokenHashesSql("text")} AS th FROM $src),
       |${p}_shg AS (
       |  SELECT $idCol, list_distinct(${hashedShinglesSql("text", "th")}) AS ds
       |  FROM ${p}_tokh),
       |${p}_sigs AS (
       |  SELECT $idCol, ds, ${minhashSigOverHashesSql("ds")} AS sig
       |  FROM ${p}_shg),
       |${p}_bands AS (
       |  SELECT $idCol, b,
       |    array_to_string(list_transform(range(1, ${LshRows + 1}),
       |      r -> CAST(sig[b * $LshRows + r] AS VARCHAR)), '_') AS bkey
       |  FROM ${p}_sigs, unnest(range(0, $LshBands)) AS u(b))""".stripMargin

  /** Oracle rendering of [[jaccardOf]] over two bound distinct-list
    * columns (intersection by filter+contains — equal to array_intersect
    * size because both inputs are distinct). */
  def jaccardSql(a: String, b: String): String =
    s"""CAST(len(list_filter($a, x -> list_contains($b, x))) AS DOUBLE)
       | / (len($a) + len($b)
       |    - len(list_filter($a, x -> list_contains($b, x))))"""
      .stripMargin.replace("\n", " ")

  /** Oracle rendering of the LSH candidate-generation prefix: a CTE chain
    * ending in `sigs(doc_id, ds, sig)` and `cand(id1, id2)` over a
    * caller-defined `corpus(doc_id, text)` CTE — for queries that verify
    * candidates with a metric other than thresholded Jaccard (q95's
    * containment). */
  val lshPairsBandCtesSql: String = {
    val sh = hashedShinglesSql("text", "th")
    s"""tokh AS (
       |  SELECT doc_id, text, ${tokenHashesSql("text")} AS th FROM corpus),
       |shg AS (SELECT doc_id, list_distinct($sh) AS ds FROM tokh),
       |sigs AS (
       |  SELECT doc_id, ds, ${minhashSigOverHashesSql("ds")} AS sig FROM shg),
       |bands_all AS (
       |  SELECT doc_id, b,
       |    array_to_string(list_transform(range(1, ${LshRows + 1}),
       |      r -> CAST(sig[b * $LshRows + r] AS VARCHAR)), '_') AS bkey
       |  FROM sigs, unnest(range(0, $LshBands)) AS u(b)),
       |bands AS (
       |  SELECT doc_id, b, bkey FROM (
       |    SELECT doc_id, b, bkey,
       |      COUNT(*) OVER (PARTITION BY b, bkey) AS bsz FROM bands_all) t
       |  WHERE bsz <= $MaxLshBucket),
       |cand AS (
       |  SELECT DISTINCT b1.doc_id AS id1, b2.doc_id AS id2
       |  FROM bands b1 JOIN bands b2
       |    ON b1.b = b2.b AND b1.bkey = b2.bkey AND b1.doc_id < b2.doc_id)"""
      .stripMargin
  }

  /** Oracle rendering of [[lshCandidatePairs]]: a CTE chain ending in
    * `pairs(id1, id2, jaccard)`, over a caller-defined `corpus(doc_id,
    * text)` CTE. */
  val lshPairsCteSql: String = {
    s"""$lshPairsBandCtesSql,
       |pairs AS (
       |  SELECT id1, id2,
       |    CAST(len(list_filter(s1.ds, x -> list_contains(s2.ds, x))) AS DOUBLE)
       |      / (len(s1.ds) + len(s2.ds)
       |         - len(list_filter(s1.ds, x -> list_contains(s2.ds, x))))
       |      AS jaccard
       |  FROM cand JOIN sigs s1 ON cand.id1 = s1.doc_id
       |            JOIN sigs s2 ON cand.id2 = s2.doc_id
       |  WHERE CAST(len(list_filter(s1.ds, x -> list_contains(s2.ds, x))) AS DOUBLE)
       |      / (len(s1.ds) + len(s2.ds)
       |         - len(list_filter(s1.ds, x -> list_contains(s2.ds, x)))) >= 0.5)"""
      .stripMargin
  }

  // ---- exact double arithmetic (left folds) -----------------------------
  /** Bit-exact dot product of two float-array columns: double-precision
    * left fold in index order, via the native codegen expression
    * [[graft.functions.VecDot]] (identical values to the declarative
    * `aggregate(zip_with(...))` form, ~an order of magnitude faster in the
    * per-pair join hot path). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** DuckDB rendering of [[dot]] for 64-dim list columns. */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       | [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)
       |  for i in range(1, 65)]), (acc, x) -> acc + x)"""
      .stripMargin.replace("\n", " ")

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  // ---- corpora for the dedup queries ------------------------------------
  /** documents ∪ exact copies of doc_id < 100 (re-keyed +100000): the
    * deterministic duplicate corpus for exact-dedup. */
  def corpusWithDups(spark: org.apache.spark.sql.SparkSession, d: String):
      org.apache.spark.sql.DataFrame = {
    val docs = OpsKit.tbl(spark, d, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  val corpusWithDupsSql: String =
    """SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 100000 AS doc_id, text FROM documents
      | WHERE doc_id < 100""".stripMargin.replace("\n", " ")

  /** Drop the first whitespace token — the deterministic near-duplicate
    * perturbation (shingle-set Jaccard ≈ (n-5)/n for n shingles). */
  def dropFirstToken(c: Column): Column =
    c.substr(instr(c, " ") + 1, length(c))

  def dropFirstTokenSql(e: String): String =
    s"substr($e, strpos($e, ' ') + 1)"

  /** First ⌊n/2⌋ tokens (min 1) rejoined — the subset-duplicate
    * perturbation for containment detection (q95). */
  def firstHalfTokens(c: Column): Column = {
    val toks = split(c, " ")
    array_join(
      slice(toks, lit(1), greatest(floor(size(toks) / 2), lit(1)).cast("int")),
      " ")
  }

  /** DuckDB rendering of [[firstHalfTokens]] (inclusive list slice). */
  def firstHalfTokensSql(e: String): String =
    s"""array_to_string(string_split($e, ' ')[1:greatest(
       | len(string_split($e, ' ')) // 2, 1)], ' ')"""
      .stripMargin.replace("\n", " ")

  /** documents ∪ near-duplicate perturbations (re-keyed +100000). */
  def corpusWithNearDups(spark: org.apache.spark.sql.SparkSession, d: String):
      org.apache.spark.sql.DataFrame = {
    val docs = OpsKit.tbl(spark, d, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"),
        dropFirstToken(col("text")).as("text")))
  }

  val corpusWithNearDupsSql: String =
    s"""SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 100000 AS doc_id,
       |   ${dropFirstTokenSql("text")} AS text FROM documents"""
      .stripMargin.replace("\n", " ")
}
