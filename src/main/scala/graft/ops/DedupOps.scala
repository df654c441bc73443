package graft.ops

import org.apache.spark.sql.functions._

/** Deduplication operator family over `documents` (the LLM-training-data
  * pipeline surface; SURVEY.md §7.2 step 8):
  *
  *  - q26 exact dedup: content-hash groupBy — the 100 TB shape is a single
  *    hash-shuffle on the digest, never a pairwise compare;
  *  - q27 MinHash+LSH near-dup: shingle → 32-hash signature → 8×4 banding →
  *    bucket self-join → exact Jaccard ONLY on candidates. No all-pairs
  *    stage anywhere: cost is O(rows·sig) + O(candidate pairs);
  *  - q28 SimHash: 16-bit signature + Hamming distance to the perturbed
  *    twin via xor/bit_count;
  *  - q29 n-gram Jaccard: exact shingle-set similarity, one row per doc;
  *  - q56 incremental dedup: a new batch against an existing corpus;
  *  - q101 exact-substring shared spans: positional gram postings joined
  *    across doc pairs, maximal diagonal runs via gaps-and-islands — the
  *    distributable re-expression of suffix-array ExactSubstr dedup;
  *  - q152 Hamming-distance self-join via pigeonhole blocking over
  *    SimHash fingerprints (4 disjoint blocks, distance ≤ 3 forces one
  *    exact block match; per-doc twin summary out);
  *  - q120 exact set-similarity join via prefix filtering (PPJoin
  *    family): zero-false-negative Jaccard ≥ 0.8 over shingle sets,
  *    candidates from rarest-first prefixes, all-integer verification —
  *    hash-gated against a brute-force all-pairs oracle, so the gate
  *    itself proves the filter's completeness;
  *  - q159 robust winnowing (MOSS) fingerprints: window-of-8 minima over
  *    gram hashes, doc pairs from a stop-print-guarded fingerprint
  *    equi-join — partial-overlap detection at ~2/(W+1) storage.
  *
  * The near-dup corpora are self-constructed (documents ∪ re-keyed
  * perturbations) so recall is verifiable deterministically — the driver's
  * testdata has no natural duplicates (verified: 0 duplicate texts).
  */
object DedupOps {
  import LlmKit._
  import OpsKit._

  def all: Seq[NamedQuery] = Seq(

    // ----- q26: exact dedup by content hash -------------------------------
    NamedQuery(
      "q26_exact_dedup",
      (s, d) =>
        corpusWithDups(s, d)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
      Some(s"""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
              |  COUNT(*) AS n_copies
              |FROM ($corpusWithDupsSql) GROUP BY 1""".stripMargin)),

    // ----- q27: MinHash signatures + LSH banding + candidate Jaccard ------
    NamedQuery(
      "q27_minhash_lsh",
      // the full pipeline lives in LlmKit.lshCandidatePairs (hashed
      // shingles, one-pass signatures, banding, candidate-only Jaccard) —
      // shared with the contamination (q45) and clustering (q47) operators
      (s, d) => lshCandidatePairs(corpusWithNearDups(s, d)),
      Some(
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |$lshPairsCteSql
           |SELECT id1, id2, jaccard FROM pairs""".stripMargin)),

    // ----- q28: SimHash + Hamming distance to the perturbed twin ----------
    NamedQuery(
      "q28_simhash",
      (s, d) => {
        // bit j weight: +1 if the 60-bit token hash has bit j set, else -1;
        // simhash bit j set iff the sum over distinct tokens is positive.
        // Native one-pass expression (primitive int[16] counters, zero
        // per-token allocation); LlmKit.simhashSetDeclarative is the
        // parity-spec reference fold.
        val sims = corpusWithNearDups(s, d)
          .select(col("doc_id"),
            call_function("simhash16", col("text")).as("sh"))
        sims.filter(col("doc_id") < 100000)
          .join(sims.filter(col("doc_id") >= 100000)
            .select((col("doc_id") - 100000).as("doc_id"),
              col("sh").as("sh_pert")), Seq("doc_id"))
          .select(col("doc_id"), col("sh").as("simhash"), col("sh_pert"),
            bit_count(col("sh").bitwiseXOR(col("sh_pert")))
              .cast("int").as("hamming"))
      },
      Some {
        val hsSql = s"""list_transform(list_distinct(string_split(text, ' ')),
          | t -> ${strHashSql("t")})""".stripMargin.replace("\n", " ")
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |sims AS (
           |  SELECT doc_id,
           |    list_reduce(list_prepend(0, list_transform(range(0, 16), j ->
           |      CASE WHEN list_reduce(list_prepend(0,
           |          list_transform($hsSql, h ->
           |            CASE WHEN (h & CAST(pow(2, j) AS BIGINT)) > 0
           |                 THEN 1 ELSE -1 END)),
           |          (a, b) -> a + b) > 0
           |        THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)),
           |      (a, b) -> a + b) AS sh
           |  FROM corpus)
           |SELECT a.doc_id, a.sh AS simhash, b.sh AS sh_pert,
           |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
           |FROM sims a JOIN sims b ON b.doc_id = a.doc_id + 100000
           |WHERE a.doc_id < 100000""".stripMargin
      }),

    // ----- q29: exact n-gram Jaccard, one row per doc ---------------------
    // Perturbation strength ALTERNATES by doc parity: even docs get the
    // mild drop-first-token edit (jaccard ≈ (n−5)/n, above the 0.8
    // near-dup bar), odd docs the heavy first-half truncation
    // (jaccard ≈ 0.5, below it) — so is_near_dup genuinely varies. A
    // single mild perturbation made the flag all-true at every SF (r12
    // degeneracy sweep): a threshold no row can fail certifies nothing.
    NamedQuery(
      "q29_ngram_jaccard",
      (s, d) => {
        val pert = when(col("doc_id") % 2 === 0,
          dropFirstToken(col("text")))
          .otherwise(firstHalfTokens(col("text")))
        val s1 = array_distinct(shingles(col("text")))
        val s2 = array_distinct(shingles(pert))
        val icnt = size(array_intersect(s1, s2))
        val ucnt = size(s1) + size(s2) - icnt
        tbl(s, d, "documents").select(
          col("doc_id"), size(s1).cast("long").as("n_shingles"),
          (icnt.cast("double") / ucnt).as("jaccard"),
          (icnt.cast("double") / ucnt >= 0.8).as("is_near_dup"))
      },
      Some {
        val pertSql = s"""CASE WHEN doc_id % 2 = 0
           | THEN ${dropFirstTokenSql("text")}
           | ELSE ${firstHalfTokensSql("text")} END"""
          .stripMargin.replace("\n", " ")
        val s1 = s"list_distinct(${shinglesSql("text")})"
        val s2 = s"list_distinct(${shinglesSql(pertSql)})"
        val icnt = s"len(list_filter($s1, x -> list_contains($s2, x)))"
        val ucnt = s"(len($s1) + len($s2) - $icnt)"
        s"""SELECT doc_id, len($s1) AS n_shingles,
           |  CAST($icnt AS DOUBLE) / $ucnt AS jaccard,
           |  CAST($icnt AS DOUBLE) / $ucnt >= 0.8 AS is_near_dup
           |FROM documents""".stripMargin
      }),

    // ----- q56: incremental dedup (new batch vs existing corpus) ----------
    // The daily-crawl path: an incoming batch is admitted against the
    // EXISTING corpus without re-clustering it. Old = doc_id < 400; new =
    // the rest plus planted leaks (exact copies of old docs re-keyed
    // +300000, near-dup perturbations re-keyed +400000, within-batch
    // copies re-keyed +500000) so every branch is exercised.
    // Decision priority per new doc:
    //   exact_dup_old  — content hash seen in the old corpus
    //   batch_dup      — hash duplicated WITHIN the batch, keep-first
    //   near_dup_old   — LSH candidate against an old doc, Jaccard ≥ 0.5
    //   new            — admit
    // Scale shape: two hash joins on the digest + the shared banded-LSH
    // pipeline over old ∪ new (pairs crossing the old/new boundary only);
    // the old corpus is never re-paired with itself downstream.
    NamedQuery(
      "q56_incremental_dedup",
      (s, d) => {
        val docs = tbl(s, d, "documents").select(col("doc_id"), col("text"))
        val old = docs.filter(col("doc_id") < 400)
        val newBatch = docs.filter(col("doc_id") >= 400)
          .unionByName(old.filter(col("doc_id") < 50)
            .select((col("doc_id") + 300000).as("doc_id"), col("text")))
          .unionByName(old.filter(col("doc_id") >= 50 && col("doc_id") < 100)
            .select((col("doc_id") + 400000).as("doc_id"),
              dropFirstToken(col("text")).as("text")))
          .unionByName(docs.filter(col("doc_id") >= 400 && col("doc_id") < 410)
            .select((col("doc_id") + 500000).as("doc_id"), col("text")))
        val oldHashes = old.select(md5(col("text")).as("h")).distinct()
          .withColumn("in_old", lit(true))
        val withH = newBatch.withColumn("h", md5(col("text")))
        val batchKeep = withH.groupBy(col("h"))
          .agg(min(col("doc_id")).as("batch_keep_id"))
        // LSH pairs over old ∪ new, keep only pairs crossing the boundary
        // (id1 < id2 and old ids < 400 < every new id, so id1 is old)
        val nearOld = lshCandidatePairs(old.unionByName(newBatch))
          .filter(col("id1") < 400 && col("id2") >= 400)
          .select(col("id2").as("doc_id")).distinct()
          .withColumn("near_old", lit(true))
        withH
          .join(broadcast(oldHashes), Seq("h"), "left")
          .join(batchKeep, Seq("h"))
          .join(nearOld, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("in_old"), lit("exact_dup_old"))
              .when(col("doc_id") =!= col("batch_keep_id"), lit("batch_dup"))
              .when(col("near_old"), lit("near_dup_old"))
              .otherwise(lit("new")).as("decision"))
      },
      Some {
        s"""WITH old AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 400),
           |newb AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
           |  UNION ALL
           |  SELECT doc_id + 300000, text FROM old WHERE doc_id < 50
           |  UNION ALL
           |  SELECT doc_id + 400000, ${dropFirstTokenSql("text")}
           |  FROM old WHERE doc_id >= 50 AND doc_id < 100
           |  UNION ALL
           |  SELECT doc_id + 500000, text FROM documents
           |  WHERE doc_id >= 400 AND doc_id < 410),
           |corpus AS (
           |  SELECT * FROM old UNION ALL SELECT * FROM newb),
           |$lshPairsCteSql,
           |near_old AS (
           |  SELECT DISTINCT id2 AS doc_id FROM pairs
           |  WHERE id1 < 400 AND id2 >= 400),
           |wh AS (SELECT doc_id, md5(text) AS h FROM newb),
           |batch_keep AS (
           |  SELECT h, min(doc_id) AS batch_keep_id FROM wh GROUP BY h)
           |SELECT wh.doc_id,
           |  CASE WHEN wh.h IN (SELECT md5(text) FROM old)
           |         THEN 'exact_dup_old'
           |       WHEN wh.doc_id <> bk.batch_keep_id THEN 'batch_dup'
           |       WHEN wh.doc_id IN (SELECT doc_id FROM near_old)
           |         THEN 'near_dup_old'
           |       ELSE 'new' END AS decision
           |FROM wh JOIN batch_keep bk ON wh.h = bk.h""".stripMargin
      }),

    // ----- q101: exact-substring shared spans (diagonal run merging) ------
    // The detection half of exact-substring dedup (Lee et al. 2022 find
    // ≥50-token verbatim repeats with a suffix array; a suffix array does
    // not distribute): re-expressed relationally as fingerprint diagonals.
    // Positional 3-token shingle postings (doc, position, gram) equi-join
    // on the gram across doc pairs; a shared L-token span shows up as
    // L-2 consecutive matches on one diagonal (p1 - p2 constant), merged
    // with gaps-and-islands (island = p1 - row_number over the diagonal)
    // into maximal spans. Every stage is a hash shuffle on uniform keys
    // (gram, then (doc1,doc2,diag)); the q53-style doc-frequency guard
    // drops boilerplate grams BEFORE the posting self-join, bounding any
    // gram's pair fan-out at df²≤100² regardless of corpus size — no
    // all-pairs, no global sort, windows only over per-pair diagonals.
    // Integer-only arithmetic, so the oracle is exact.
    NamedQuery(
      "q101_substr_spans",
      (s, d) => {
        // pinned (r18 optimization): the postings table feeds THREE
        // consumers — the df guard and both sides of the gram self-join.
        // Unpinned, the posexplode + per-gram hashing ran once for the
        // guard and once for the join's shared shuffle map (exchange
        // reuse covers only the two join sides); pinning materializes
        // the explode exactly once and the three consumers read the
        // checkpoint — at scale, 1 corpus scan + 1 postings write
        // replaces 2 full explode+hash passes. Values unchanged.
        val posts = OpsKit.pinned(corpusWithNearDups(s, d)
          .select(col("doc_id"), posexplode(hashedShingles(col("text"))))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
            col("col").as("g")))
        val hot = posts.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") > 100).select(col("g"))
        // broadcast(hot) tried and REVERTED (r19, r18 verdict item 4):
        // the pin demotes this anti-join to SMJ, but the SMJ rides the
        // Exchange(g) the pair self-join below needs anyway (the plan
        // shows ReusedExchange), so restoring the broadcast only ADDS a
        // build: interleaved pre/post A/B at sf0.1, both orderings,
        // read the hinted form ~+15% on q101 (2.30-2.41 s unhinted vs
        // 2.65-3.44 s hinted; plans/r19/q101_* dumps). Same verdict for
        // broadcast(dfreq) in q120 (+12%) and q135 (+7%) — dfreq's own
        // aggregation shares the postings exchange the SMJ reuses.
        val pr = posts.join(hot, Seq("g"), "left_anti")
        val m = pr.select(col("g"), col("doc_id").as("doc1"), col("p").as("p1"))
          .join(pr.select(col("g"), col("doc_id").as("doc2"), col("p").as("p2")),
            Seq("g"))
          .filter(col("doc1") < col("doc2"))
        // prune before the ordered window: a diagonal with < 6 matches
        // cannot contain a 6-run (span ≥ 8 tokens); random-collision
        // diagonals are overwhelmingly singletons, so this count-window
        // drops most of the ordered sort + aggregate input. diag is
        // materialized ONCE as a column — both windows then partition on
        // the same attribute and Catalyst plans a single exchange for the
        // pair (an inline p1−p2 expression becomes a fresh attribute per
        // window and re-shuffles; plan-asserted in PlanShapeSpec)
        val wp = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc1"), col("doc2"), col("diag"))
        val w = wp.orderBy(col("p1"))
        m.withColumn("diag", col("p1") - col("p2"))
          .withColumn("n_diag", count(lit(1)).over(wp))
          .filter(col("n_diag") >= 6)
          .withColumn("island",
            col("p1") - row_number().over(w).cast("long"))
          .groupBy(col("doc1"), col("doc2"), col("diag"), col("island"))
          .agg(min(col("p1")).as("start1"), min(col("p2")).as("start2"),
            (count(lit(1)) + 2).as("span_toks"))
          .filter(col("span_toks") >= 8)
          .select(col("doc1"), col("doc2"), col("start1"), col("start2"),
            col("span_toks"))
      },
      Some {
        val P = MinhashP
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |th AS (
           |  SELECT doc_id, ${tokenHashesSql("text")} AS h, text FROM corpus),
           |posts AS (
           |  SELECT doc_id, unnest(
           |    CASE WHEN len(h) >= 3
           |    THEN [{'p': i,
           |           'g': ((h[i]*31 + h[i+1]) % $P * 31 + h[i+2]) % $P}
           |          for i in range(1, len(h) - 1)]
           |    ELSE [{'p': CAST(1 AS BIGINT), 'g': ${strHashSql("text")} % $P}]
           |    END, recursive := true)
           |  FROM th),
           |hot AS (
           |  SELECT g FROM posts GROUP BY g
           |  HAVING COUNT(DISTINCT doc_id) > 100),
           |pr AS (SELECT * FROM posts WHERE g NOT IN (SELECT g FROM hot)),
           |m AS (
           |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, a.p AS p1, b.p AS p2
           |  FROM pr a JOIN pr b ON a.g = b.g AND a.doc_id < b.doc_id),
           |md AS (
           |  SELECT *, COUNT(*) OVER (
           |    PARTITION BY doc1, doc2, p1 - p2) AS n_diag FROM m),
           |isl AS (
           |  SELECT doc1, doc2, p1 - p2 AS diag, p1, p2,
           |    p1 - ROW_NUMBER() OVER (
           |      PARTITION BY doc1, doc2, p1 - p2 ORDER BY p1) AS island
           |  FROM md WHERE n_diag >= 6)
           |SELECT doc1, doc2, min(p1) AS start1, min(p2) AS start2,
           |  COUNT(*) + 2 AS span_toks
           |FROM isl GROUP BY doc1, doc2, diag, island
           |HAVING COUNT(*) + 2 >= 8""".stripMargin
      }),

    // ----- q120: EXACT set-similarity join via prefix filtering -----------
    // The PPJoin-family alternative to LSH banding (q27): an exact
    // shingle-set Jaccard ≥ 0.8 self-join with ZERO false negatives
    // (the same 3-gram shingle sets q27/q29 hash — selective enough
    // that near-identical docs match and unrelated ones don't).
    // Candidate generation is the classic prefix filter — order every
    // doc's distinct shingles rarest-first by global document frequency
    // (rare shingles make the fewest candidate collisions) and emit only
    // the first n − ⌈0.8·n⌉ + 1 of them: two sets with Jaccard ≥ τ must
    // overlap in ≥ τ·n elements of either set (i(1+τ) ≥ τ(n₁+n₂) and
    // n₂ ≥ i give i ≥ τ·n₁), so two qualifying docs MUST share a prefix
    // token — soundness is a theorem, not a recall estimate. All
    // arithmetic is integer: τ = 4/5, prefix keep-count ⌈4n/5⌉ =
    // (4n+4) div 5, and the verification 5·i ≥ 4·(n₁+n₂−i); the only
    // double is the final reported Jaccard. THE ORACLE IS BRUTE-FORCE
    // ALL-PAIRS — the hash gate therefore PROVES the filter's
    // completeness against exhaustive search on every run, the q101
    // soundness idea promoted into the driver gate. Scale shape: df is
    // a vocab aggregate, the per-doc rarity sort is array_sort inside
    // the row (no global sort partition), candidates come from a
    // token-keyed equi-join on prefix tokens only, verification touches
    // candidate pairs only. Rare-first ordering keeps prefix postings
    // short; a df-capped stop-token guard (q53's) would bolt on
    // unchanged for adversarial corpora.
    NamedQuery(
      "q120_prefix_simjoin",
      (s, d) => {
        // pinned (r18 optimization): the shingle-set table feeds FOUR
        // consumers (df counts, the rarity ordering, and both
        // verification sides a/b) — unpinned, the corpus scan +
        // shingle hash + array_sort(array_distinct(...)) ran once per
        // consumer. One materialization, four checkpoint reads.
        val toks = OpsKit.pinned(corpusWithNearDups(s, d)
          .select(col("doc_id"),
            array_sort(array_distinct(hashedShingles(col("text"))))
              .as("ts")))
        val dfreq = toks
          .select(col("doc_id"), explode(col("ts")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        // pinned too: `pref` below feeds both sides of the candidate
        // join with DIFFERENT filters (the asymmetric prefixes), so
        // exchange reuse cannot dedup them and the collect_list
        // re-aggregation would run twice. broadcast(dfreq) tried and
        // REVERTED (r19): the SMJ reuses the Exchange(tok) dfreq's own
        // aggregation pays regardless, so the hint only adds a broadcast
        // build — interleaved A/B read it +12% (see q101's comment).
        val ordered = OpsKit.pinned(toks
          .select(col("doc_id"), explode(col("ts")).as("tok"))
          .join(dfreq, "tok")
          .groupBy(col("doc_id"))
          .agg(expr("transform(array_sort(collect_list(struct(df, tok))), " +
            "s -> s.tok)").as("ots"), count(lit(1)).as("n")))
        // prefix entries carry (position, set size) so the join can apply
        // PPJoin's three sound candidate filters BEFORE the distinct:
        //  - asymmetric prefixes (the PPJoin indexing prefix, Xiao/Wang/
        //    Lin/Yu WWW'08): order the pair by (n, doc_id) and let x be
        //    the larger side. The required overlap α = ⌈τ/(1+τ)·(nₓ+nᵧ)⌉
        //    satisfies α ≥ τ·nₓ (since nᵧ ≥ τ·nₓ) and α ≥ 2τ/(1+τ)·nᵧ
        //    (since nₓ ≥ nᵧ), so by the prefix principle x's PROBING
        //    prefix (n − ⌈4n/5⌉ + 1 ≈ n/5 entries at τ = 4/5) must
        //    intersect y's shorter INDEXING prefix (n − ⌈8n/9⌉ + 1 ≈ n/9,
        //    from 2τ/(1+τ) = 8/9) — the hot posting join's small side
        //    shrinks ~1.8× with zero recall loss;
        //  - length: J ≥ 4/5 forces 5·nᵧ ≥ 4·nₓ (nᵧ ≤ nₓ by the order);
        //  - positional: overlap ≤ 1 + min(nₓ−pₓ, nᵧ−pᵧ) when the shared
        //    token sits at (df-order) positions pₓ/pᵧ, and J ≥ τ needs
        //    overlap·(1+τ) ≥ τ(nₓ+nᵧ), i.e. 9·(1+min(nₓ−pₓ, nᵧ−pᵧ)) ≥
        //    4·(nₓ+nᵧ). All three only DROP pairs that provably cannot
        //    reach τ, so completeness (and the brute-force oracle) is
        //    intact — they matter on saturated shingle spaces where
        //    prefix tokens alone stop being selective (SCALING.md).
        val pref = ordered.select(col("doc_id"), col("n"),
          expr("n - ((8 * n + 8) DIV 9) + 1").as("ilen"),
          posexplode(expr("slice(ots, 1, CAST(n - ((4 * n + 4) DIV 5) + 1 " +
            "AS INT))")).as(Seq("p0", "tok")))
          .select(col("doc_id"), col("n"), col("ilen"),
            (col("p0") + 1).as("p"), col("tok"))
        val cands = pref
          .select(col("doc_id").as("id1"), col("n").as("na"),
            col("p").as("pa"), col("tok"))
          .join(pref.filter(col("p") <= col("ilen"))
            .select(col("doc_id").as("id2"), col("n").as("nb"),
              col("p").as("pb"), col("tok")), "tok")
          .filter(col("nb") < col("na") ||
            (col("nb") === col("na") && col("id2") < col("id1")))
          .filter(col("nb") * 5 >= col("na") * 4)
          .filter((lit(1) + least(col("na") - col("pa"),
            col("nb") - col("pb"))) * 9 >= (col("na") + col("nb")) * 4)
          .select(least(col("id1"), col("id2")).as("id1"),
            greatest(col("id1"), col("id2")).as("id2")).distinct()
        val a = toks.select(col("doc_id").as("id1"), col("ts").as("ts1"))
        val b = toks.select(col("doc_id").as("id2"), col("ts").as("ts2"))
        cands.join(a, "id1").join(b, "id2")
          .select(col("id1"), col("id2"),
            size(array_intersect(col("ts1"), col("ts2"))).cast("long")
              .as("i"),
            size(col("ts1")).cast("long").as("n1"),
            size(col("ts2")).cast("long").as("n2"))
          .filter(col("i") * 5 >= (col("n1") + col("n2") - col("i")) * 4)
          .select(col("id1"), col("id2"),
            (col("i").cast("double") /
              (col("n1") + col("n2") - col("i")).cast("double"))
              .as("jaccard"))
      },
      Some(s"""WITH tt AS (
              |  SELECT doc_id, text, ${tokenHashesSql("text")} AS th
              |  FROM ($corpusWithNearDupsSql)),
              |t AS (
              |  SELECT doc_id,
              |    list_sort(list_distinct(
              |      ${hashedShinglesSql("text", "th")})) AS ts
              |  FROM tt),
              |p AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2,
              |    CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
              |    CAST(len(a.ts) AS BIGINT) AS n1,
              |    CAST(len(b.ts) AS BIGINT) AS n2
              |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
              |SELECT id1, id2,
              |  CAST(i AS DOUBLE) / CAST(n1 + n2 - i AS DOUBLE) AS jaccard
              |FROM p WHERE i * 5 >= (n1 + n2 - i) * 4""".stripMargin)),

    // ----- q132: fixed token-window exact dedup (sub-document) ------------
    // RefinedWeb/C4-style SUB-document dedup: the unit of duplication is a
    // fixed 20-token window, not the whole document, so boilerplate that
    // repeats INSIDE otherwise-distinct pages is caught where q26's
    // whole-doc hash is blind. Every window is hashed (md5), the global
    // first occurrence wins (minimum of an encoded (doc_id, win_idx)
    // order key — the same deterministic first-wins contract as O-7), and
    // each document reports how many of its windows it actually
    // contributes vs inherits. Scale shape: one hash-shuffled groupBy on
    // the window digest plus one join keyed the same — both key on a
    // uniform md5, so the plan is linear and skew-free no matter how
    // duplicated the corpus is; no pairwise stage exists at all. The
    // order-key encoding (doc_id·10^6 + win_idx) is exact: win_idx is
    // bounded by tokens/20 and doc_ids are < 2^43 before the encode
    // overflows a long.
    NamedQuery(
      "q132_window_dedup",
      (s, d) => {
        val W = 20
        // token array bound before the lambda (HOF recompute trap —
        // an inline split re-tokenizes the doc once per window)
        val toks = col("wt")
        val nWin = ceil(size(toks) / lit(W.toDouble)).cast("int")
        val win = corpusWithDups(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("wt"))
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(0), nWin - 1), i =>
              array_join(slice(toks, i * W + 1, lit(W)), " ")))
              .as(Seq("win_idx", "win_text")))
          .select(col("doc_id"),
            (col("doc_id") * 1000000L + col("win_idx")).as("okey"),
            md5(col("win_text")).as("wh"))
        val firsts = win.groupBy(col("wh")).agg(min(col("okey")).as("fk"))
        win.join(firsts, "wh")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(when(col("okey") === col("fk"), lit(1L)).otherwise(lit(0L)))
              .as("n_kept"))
          .select(col("doc_id"), col("n_windows"), col("n_kept"),
            (col("n_windows") - col("n_kept")).as("n_dup"))
      },
      Some {
        val toks = "string_split(text, ' ')"
        s"""WITH corpus AS ($corpusWithDupsSql),
           |win AS (
           |  SELECT doc_id,
           |    doc_id * 1000000 + (i - 1) AS okey,
           |    md5(array_to_string(
           |      ($toks)[(i-1)*20 + 1 : i*20], ' ')) AS wh
           |  FROM corpus, unnest(range(1,
           |    CAST(ceil(len($toks) / 20.0) AS BIGINT) + 1)) AS u(i)),
           |firsts AS (SELECT wh, MIN(okey) AS fk FROM win GROUP BY wh)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           |  CAST(SUM(CASE WHEN okey = fk THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(COUNT(*) - SUM(CASE WHEN okey = fk THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dup
           |FROM win JOIN firsts USING (wh)
           |GROUP BY doc_id""".stripMargin
      }),

    // ----- q135: measured LSH recall vs the exact similarity join ---------
    // The dedup-QA audit q85 runs for ANN, applied to MinHash+LSH: how
    // much of the TRUE Jaccard ≥ 0.5 pair set does the banded candidate
    // generation actually surface, per similarity band? Ground truth is
    // the EXACT join — prefix filtering at τ = 1/2 (the q120 machinery
    // with re-derived integer constants: prefix keep-count n − ⌈n/2⌉ + 1,
    // length filter 3·min ≥ n₁+n₂, positional filter 3·(1 + min(nᵢ−pᵢ))
    // ≥ n₁+n₂, verification 3·i ≥ n₁+n₂ ⟺ J ≥ 1/2 — all sound, zero
    // false negatives), so the audit itself never does all-pairs on the
    // Spark side; the ORACLE is honest brute force. The similarity band
    // is the integer floor (10·i) div (n₁+n₂−i), so band edges cannot
    // drift across engines. Per band: exact pairs, LSH-found pairs, and
    // the recall ratio — the measured S-curve that tells you whether 8×4
    // banding is enough before you ship a dedup run on a real crawl.
    //
    // The audit runs over a bounded QUERY PANEL (pairs whose smaller id
    // is < 1000), not corpus x corpus: a recall estimate needs a fixed
    // sample, and the exact tau=1/2 join over the WHOLE corpus is
    // inherently super-linear on low-entropy corpora (tau=1/2 keeps
    // about half of each doc's shingles in the prefix — ScaleProbe
    // measured x28 at 10x docs un-paneled). The panel is also the only
    // honest 100 TB shape: the full exact join is the computation LSH
    // exists to avoid; the audit samples it.
    NamedQuery(
      "q135_lsh_recall",
      (s, d) => {
        val corpus = corpusWithNearDups(s, d)
        // pinned (r18 optimization, q120's reasoning): toks feeds four
        // consumers and `ordered` feeds both asymmetric prefix sides —
        // unpinned, the corpus scan + shingle hash + sort ran per
        // consumer and the collect_list re-aggregation ran twice.
        val toks = OpsKit.pinned(corpus
          .select(col("doc_id"),
            array_sort(array_distinct(hashedShingles(col("text")))).as("ts")))
        val dfreq = toks
          .select(col("doc_id"), explode(col("ts")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val ordered = OpsKit.pinned(toks
          .select(col("doc_id"), explode(col("ts")).as("tok"))
          .join(dfreq, "tok")
          .groupBy(col("doc_id"))
          .agg(expr("transform(array_sort(collect_list(struct(df, tok))), " +
            "s -> s.tok)").as("ots"), count(lit(1)).as("n")))
        val pref = ordered.select(col("doc_id"), col("n"),
          posexplode(expr("slice(ots, 1, CAST(n - ((n + 1) DIV 2) + 1 " +
            "AS INT))")).as(Seq("p0", "tok")))
          .select(col("doc_id"), col("n"), (col("p0") + 1).as("p"),
            col("tok"))
        // broadcast(dfreq) tried and REVERTED here too (r19): +7% in the
        // interleaved A/B, same exchange-reuse mechanism as q120.
        // the panel side is cut BEFORE the posting join, so join input —
        // not just output — is bounded by the panel
        val cands = pref.filter(col("doc_id") < 1000)
          .select(col("doc_id").as("id1"), col("n").as("na"),
            col("p").as("pa"), col("tok"))
          .join(pref.select(col("doc_id").as("id2"), col("n").as("nb"),
            col("p").as("pb"), col("tok")), "tok")
          .filter(col("id1") < col("id2"))
          .filter(least(col("na"), col("nb")) * 3 >= col("na") + col("nb"))
          .filter((lit(1) + least(col("na") - col("pa"),
            col("nb") - col("pb"))) * 3 >= col("na") + col("nb"))
          .select(col("id1"), col("id2")).distinct()
        val a = toks.select(col("doc_id").as("id1"), col("ts").as("ts1"))
        val b = toks.select(col("doc_id").as("id2"), col("ts").as("ts2"))
        val exact = cands.join(a, "id1").join(b, "id2")
          .select(col("id1"), col("id2"),
            size(array_intersect(col("ts1"), col("ts2"))).cast("long")
              .as("i"),
            (size(col("ts1")) + size(col("ts2"))).cast("long").as("nn"))
          .filter(col("i") * 3 >= col("nn"))
        val lsh = lshCandidatePairs(corpus)
          .select(col("id1"), col("id2"), lit(1L).as("hit"))
        exact.join(lsh, Seq("id1", "id2"), "left")
          .groupBy(expr("(10 * i) div (nn - i)").as("jband"))
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_lsh"))
          .select(col("jband"), col("n_exact"), col("n_lsh"),
            (col("n_lsh").cast("double") / col("n_exact").cast("double"))
              .as("recall"))
      },
      Some(s"""WITH corpus AS ($corpusWithNearDupsSql),
              |$lshPairsCteSql,
              |tt AS (
              |  SELECT doc_id, text, ${tokenHashesSql("text")} AS th
              |  FROM corpus),
              |t AS (
              |  SELECT doc_id,
              |    list_sort(list_distinct(
              |      ${hashedShinglesSql("text", "th")})) AS ts
              |  FROM tt),
              |exact AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2,
              |    CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
              |    CAST(len(a.ts) + len(b.ts) AS BIGINT) AS nn
              |  FROM t a JOIN t b ON a.doc_id < b.doc_id
              |  WHERE a.doc_id < 1000
              |    AND len(list_intersect(a.ts, b.ts)) * 3
              |        >= len(a.ts) + len(b.ts))
              |SELECT (10 * i) // (nn - i) AS jband,
              |  CAST(COUNT(*) AS BIGINT) AS n_exact,
              |  CAST(SUM(CASE WHEN p.id1 IS NOT NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_lsh,
              |  CAST(SUM(CASE WHEN p.id1 IS NOT NULL THEN 1 ELSE 0 END)
              |       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
              |FROM exact e LEFT JOIN pairs p
              |  ON e.id1 = p.id1 AND e.id2 = p.id2
              |GROUP BY 1""".stripMargin)),

    // ----- q145: fuzzy entity matching (blocked edit-distance join) -------
    // Record-level entity resolution, the blocking way (Fellegi–Sunter
    // pipelines; Christen's "Data Matching"): candidate pairs come from
    // an equi-join on a cheap BLOCKING KEY (here the head noun of the
    // part name — at scale: phonetic codes, sorted-neighborhood keys),
    // then a length filter |len₁−len₂| ≤ k prunes for free (edit
    // distance ≥ length gap, so no false negatives), and only survivors
    // pay the O(len²) levenshtein verify. Never name × name: the join
    // runs over DISTINCT name variants (records collapse to their
    // spelling first — byte-identical duplicates are q26's exact-dedup
    // job), pair work is Σ block² over variants, and blocks are
    // vocabulary-bounded. Both engines implement classic unweighted
    // Levenshtein over ASCII — an exact integer, no parity risk.
    // Output: the ER review table — variant pairs at distance 1..3 with
    // the record count behind each spelling, name1 < name2 canonical.
    NamedQuery(
      "q145_fuzzy_match",
      (s, d) => {
        val p = tbl(s, d, "part")
          .groupBy(col("p_name"))
          .agg(count(lit(1)).as("n"))
          .select(col("p_name").as("nm"), col("n"),
            element_at(split(col("p_name"), " "), -1).as("blk"))
        val a = p.select(col("nm").as("name1"), col("n").as("n1"),
          col("blk"))
        val b = p.select(col("nm").as("name2"), col("n").as("n2"),
          col("blk"))
        a.join(b, Seq("blk"))
          .filter(col("name1") < col("name2"))
          .filter(abs(length(col("name1")) - length(col("name2"))) <= 3)
          .filter(levenshtein(col("name1"), col("name2")) <= 3)
          .select(col("name1"), col("name2"),
            levenshtein(col("name1"), col("name2")).cast("long").as("dist"),
            col("n1"), col("n2"))
      },
      Some("""WITH p AS (
             |  SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n,
             |    string_split(p_name, ' ')[-1] AS blk
             |  FROM part GROUP BY p_name)
             |SELECT a.nm AS name1, b.nm AS name2,
             |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
             |  a.n AS n1, b.n AS n2
             |FROM p a JOIN p b ON a.blk = b.blk AND a.nm < b.nm
             |WHERE abs(len(a.nm) - len(b.nm)) <= 3
             |  AND levenshtein(a.nm, b.nm) <= 3""".stripMargin)),

    // ----- q146: LSH banding parameter sweep (the index-tuning table) -----
    // The table an engineer reads before committing a dedup run: for the
    // SAME 32-hash MinHash signatures, how do 16×2 / 8×4 / 4×8 bandings
    // trade candidate volume (cost) against recall of the planted
    // near-dup pairs (quality)? More bands × fewer rows shifts the LSH
    // S-curve left: more candidates, higher recall. All three configs
    // re-band ONE cached signature table (the same plan-keyed cache the
    // production path q27 shares — signatures are computed once per
    // session, the sweep only re-slices them); per config the work is
    // one (band, bkey) self-join + one count — no exact Jaccard, no
    // verification pass, because the sweep measures the FILTER, not the
    // verifier. Ground truth is free: every doc has exactly one planted
    // near-dup at doc_id + 100000, so recall is an exact fraction, not
    // an estimate. The MaxLshBucket cap is deliberately NOT applied —
    // it is an orthogonal cost guard, and the sweep must show raw
    // banding selectivity.
    NamedQuery(
      "q146_lsh_band_sweep",
      (s, d) => {
        val sigs = shingleSigs(corpusWithNearDups(s, d)).cache()
        val nTrue = tbl(s, d, "documents").agg(count(lit(1)).as("n_true"))
        def cfg(nb: Int, nr: Int): org.apache.spark.sql.DataFrame = {
          val bands = sigs.select(col("doc_id"),
            explode(transform(sequence(lit(0), lit(nb - 1)), b =>
              struct(b.as("band"),
                array_join(transform(sequence(lit(1), lit(nr)), r =>
                  element_at(col("sig"), (b * nr + r).cast("int"))
                    .cast("string")), "_").as("bkey")))).as("bk"))
            .select(col("doc_id"), col("bk.band").as("band"),
              col("bk.bkey").as("bkey"))
          val cand = bands.select(col("band"), col("bkey"),
              col("doc_id").as("id1"))
            .join(bands.select(col("band"), col("bkey"),
              col("doc_id").as("id2")), Seq("band", "bkey"))
            .filter(col("id1") < col("id2"))
            .select(col("id1"), col("id2")).distinct()
          cand
            .agg(count(lit(1)).as("n_cand"),
              sum(when(col("id2") === col("id1") + 100000, lit(1L))
                .otherwise(lit(0L))).as("n_found"))
            .crossJoin(broadcast(nTrue))
            .select(lit(nb).as("n_bands"), lit(nr).as("n_rows"),
              col("n_cand"), col("n_true"), col("n_found"),
              (col("n_found").cast("double") /
                col("n_true").cast("double")).as("recall"))
        }
        cfg(16, 2).unionByName(cfg(8, 4)).unionByName(cfg(4, 8))
      },
      Some {
        def cfgSql(nb: Int, nr: Int): String =
          s"""SELECT $nb AS n_bands, $nr AS n_rows,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_${nb}_$nr)
             |    AS n_cand,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_true,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_${nb}_$nr
             |   WHERE id2 = id1 + 100000) AS n_found,
             |  (SELECT CAST(COUNT(*) AS DOUBLE) FROM cand_${nb}_$nr
             |   WHERE id2 = id1 + 100000)
             |    / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents)
             |    AS recall""".stripMargin
        def bandsSql(nb: Int, nr: Int): String =
          s"""bands_${nb}_$nr AS (
             |  SELECT doc_id, b,
             |    array_to_string(list_transform(range(1, ${nr + 1}),
             |      r -> CAST(sig[b * $nr + r] AS VARCHAR)), '_') AS bkey
             |  FROM c_sigs, unnest(range(0, $nb)) AS u(b)),
             |cand_${nb}_$nr AS (
             |  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
             |  FROM bands_${nb}_$nr a JOIN bands_${nb}_$nr c
             |    ON a.b = c.b AND a.bkey = c.bkey
             |    AND a.doc_id < c.doc_id)""".stripMargin
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |${sideBandsCteSql("c", "corpus", "doc_id")},
           |${bandsSql(16, 2)},
           |${bandsSql(8, 4)},
           |${bandsSql(4, 8)}
           |${cfgSql(16, 2)}
           |UNION ALL ${cfgSql(8, 4)}
           |UNION ALL ${cfgSql(4, 8)}""".stripMargin
      }),

    // ----- q152: Hamming-distance self-join via pigeonhole blocking -------
    // The SimHash-side near-dup JOIN (q28 only scores each doc against
    // its planted twin; this finds ALL pairs within Hamming distance 3).
    // Candidate generation is the pigeonhole principle (the Manku/Jain/
    // Das Sarma WWW'07 SimHash-dedup blocking): split the 16-bit
    // fingerprint into 4 disjoint 4-bit blocks — two fingerprints within
    // distance 3 differ in at most 3 blocks, so they MUST agree exactly
    // on at least one block. Candidates come from 4 equi-joins on
    // (block index, block value) — zero false negatives by counting
    // WITHIN sub-cap blocks, the q120 theorem contract — and the
    // verifier is one codegen'd bit_count(xor) ≤ 3 per candidate. A
    // degenerate block value (this corpus's shared vocabulary pushes
    // most fingerprints into a few patterns, exactly like boilerplate
    // at crawl scale) would make one bucket's self-join quadratic in
    // the corpus, so blocks with more than 256 members are dropped
    // BEFORE the join — the LSH MaxLshBucket discipline; a pair is
    // reported iff it shares at least one NON-degenerate block, and
    // the ORACLE MIRRORS THE CAP EXACTLY, so the driver's hash gate
    // proves the capped semantics complete on every run (the uncapped
    // first cut spent 45 s at sf0.1 materializing ~20 M pairs of a
    // saturated 16-bit space — the miniature of the production shape,
    // 64-bit SimHash with 16-bit blocks, where only true boilerplate
    // saturates and the same cap bounds it).
    NamedQuery(
      "q152_hamming_join",
      (s, d) => {
        val sims = corpusWithNearDups(s, d)
          .select(col("doc_id"),
            call_function("simhash16", col("text")).as("sh"))
        val blocks = sims.select(col("doc_id"), col("sh"),
          posexplode(array((0 to 3).map(b =>
            shiftright(col("sh"), b * 4).bitwiseAND(lit(15L))): _*))
            .as(Seq("blk", "bval")))
        val bsz = blocks.groupBy(col("blk"), col("bval"))
          .agg(count(lit(1)).as("bsz"))
        val keep = blocks
          .join(bsz.filter(col("bsz") <= 256).select(col("blk"),
            col("bval")), Seq("blk", "bval"))
        val cands = keep
          .select(col("doc_id").as("id1"), col("sh").as("sh1"),
            col("blk"), col("bval"))
          .join(keep.select(col("doc_id").as("id2"), col("sh").as("sh2"),
            col("blk"), col("bval")), Seq("blk", "bval"))
          .filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"), col("sh1"), col("sh2")).distinct()
        val pairs = cands
          .select(col("id1"), col("id2"),
            bit_count(col("sh1").bitwiseXOR(col("sh2")))
              .cast("long").as("hamming"))
          .filter(col("hamming") <= 3)
        // pair list → per-doc twin summary (the row a fingerprint-dedup
        // pass consumes): neighbor degree + deterministic nearest twin.
        // On a saturated fingerprint space the PAIR set is quadratic in
        // the bucket occupancy, but it is never materialized beyond the
        // verify filter — the groupBy collapses it map-side.
        pairs.select(col("id1").as("doc_id"), col("id2").as("nbr"),
            col("hamming"))
          .unionByName(pairs.select(col("id2").as("doc_id"),
            col("id1").as("nbr"), col("hamming")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_twins"),
            min(struct(col("hamming"), col("nbr"))).as("mn"))
          .select(col("doc_id"), col("n_twins"),
            col("mn.hamming").as("min_hamming"),
            col("mn.nbr").as("nearest_twin"))
      },
      Some {
        val hsSql = s"""list_transform(list_distinct(string_split(text, ' ')),
          | t -> ${strHashSql("t")})""".stripMargin.replace("\n", " ")
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |sims AS (
           |  SELECT doc_id,
           |    list_reduce(list_prepend(0, list_transform(range(0, 16), j ->
           |      CASE WHEN list_reduce(list_prepend(0,
           |          list_transform($hsSql, h ->
           |            CASE WHEN (h & CAST(pow(2, j) AS BIGINT)) > 0
           |                 THEN 1 ELSE -1 END)),
           |          (a, b) -> a + b) > 0
           |        THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)),
           |      (a, b) -> a + b) AS sh
           |  FROM corpus)
           |, blocks AS (
           |  SELECT s.doc_id, s.sh, r.blk,
           |    (s.sh >> (r.blk * 4)) & 15 AS bval
           |  FROM sims s, (SELECT unnest(range(0, 4)) AS blk) r),
           |bsz AS (SELECT blk, bval, COUNT(*) AS bsz
           |        FROM blocks GROUP BY blk, bval),
           |keep AS (SELECT bl.doc_id, bl.sh, bl.blk, bl.bval
           |         FROM blocks bl JOIN bsz USING (blk, bval)
           |         WHERE bsz.bsz <= 256),
           |p AS (
           |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
           |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
           |  FROM keep a JOIN keep b
           |    ON a.blk = b.blk AND a.bval = b.bval
           |    AND a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
           |e AS (
           |  SELECT id1 AS doc_id, id2 AS nbr, hamming FROM p
           |  UNION ALL SELECT id2, id1, hamming FROM p)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_twins,
           |  MIN(hamming) AS min_hamming,
           |  arg_min(nbr, hamming * 1000000 + nbr) AS nearest_twin
           |FROM e GROUP BY doc_id""".stripMargin
      }),

    // ----- q159: robust winnowing fingerprints + doc-pair overlap ---------
    // The MOSS fingerprinting scheme (Schleimer, Wilkerson & Aiken,
    // SIGMOD 2003) as a distributed overlap detector: per document, hash
    // every word 3-gram (the shared hashed_shingles expression), slide a
    // window of W = 8 consecutive gram hashes, and keep each window's
    // MINIMUM — the winnowing guarantee is that any shared run of
    // W + 2 grams between two documents contributes at least one
    // IDENTICAL selected fingerprint to both, so matching fingerprint
    // VALUES (no positions needed) finds every sufficiently long overlap
    // while storing ~2/(W+1) of the grams. Doc pairs then meet in a
    // fingerprint equi-join — never all-pairs — with q53's stop-gram
    // discipline: a fingerprint appearing in > 100 documents is
    // boilerplate and is dropped BEFORE the self-join, bounding any one
    // join key's work at C(100,2) pairs regardless of corpus size.
    // Output: pairs sharing ≥ 2 fingerprints with coverage ≥ 0.5
    // (shared / the smaller doc's fingerprint count) — the planted
    // near-dup twins (drop-first-token perturbations) all clear it.
    // Scale shape: per-row HOF fingerprinting (no shuffle), one postings
    // shuffle, one capped equi-join, two broadcast-sized count joins.
    // vs q36: that query emits ONE winnow hash per doc (a cheap global
    // id); this one keeps the full fingerprint SET — the form that
    // detects PARTIAL overlap, not just whole-doc identity.
    NamedQuery(
      "q159_winnow_overlap",
      (s, d) => {
        val W = 8
        // the gram array is BOUND in its own projection before the
        // window lambdas touch it (the HOF recompute trap — an inline
        // hashed_shingles would re-hash the document once per window)
        val gs = corpusWithNearDups(s, d)
          .select(col("doc_id"), hashedShingles(col("text")).as("g"))
        val nWin = greatest(size(col("g")) - (W - 1), lit(1))
        val fp = gs.select(col("doc_id"),
          array_distinct(transform(sequence(lit(1), nWin),
            i => array_min(slice(col("g"), i, lit(W))))).as("fps"))
          .persist()
        val nf = fp.select(col("doc_id"), size(col("fps")).cast("long").as("nf"))
        val post = fp.select(col("doc_id"), explode(col("fps")).as("f"))
        val keep = post.groupBy(col("f")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 100).select(col("f"))
        val pk = post.join(keep, "f")
        val pairs = pk.select(col("doc_id").as("id1"), col("f"))
          .join(pk.select(col("doc_id").as("id2"), col("f")), "f")
          .filter(col("id1") < col("id2"))
          .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2)
        pairs
          .join(nf.select(col("doc_id").as("id1"), col("nf").as("n1")), "id1")
          .join(nf.select(col("doc_id").as("id2"), col("nf").as("n2")), "id2")
          .withColumn("coverage", col("shared").cast("double") /
            least(col("n1"), col("n2")).cast("double"))
          .filter(col("coverage") >= 0.5)
          .select(col("id1"), col("id2"), col("shared"), col("n1"),
            col("n2"), col("coverage"))
      },
      Some {
        val W = 8
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |tokh AS (SELECT doc_id, text,
           |           ${tokenHashesSql("text")} AS th FROM corpus),
           |gs AS (SELECT doc_id,
           |         ${hashedShinglesSql("text", "th")} AS g FROM tokh),
           |fp AS (SELECT doc_id,
           |         list_distinct([list_min(g[i:i+${W - 1}])
           |           for i in range(1, greatest(len(g) - ${W - 1}, 1) + 1)])
           |           AS fps
           |       FROM gs),
           |nf AS (SELECT doc_id, CAST(len(fps) AS BIGINT) AS nf FROM fp),
           |post AS (SELECT doc_id, unnest(fps) AS f FROM fp),
           |keep AS (SELECT f FROM post GROUP BY f HAVING COUNT(*) <= 100),
           |pk AS (SELECT p.doc_id, p.f FROM post p JOIN keep USING (f)),
           |pairs AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2,
           |    CAST(COUNT(*) AS BIGINT) AS shared
           |  FROM pk a JOIN pk b ON a.f = b.f AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
           |SELECT id1, id2, shared, n1.nf AS n1, n2.nf AS n2,
           |  CAST(shared AS DOUBLE) / CAST(least(n1.nf, n2.nf) AS DOUBLE)
           |    AS coverage
           |FROM pairs JOIN nf n1 ON id1 = n1.doc_id
           |           JOIN nf n2 ON id2 = n2.doc_id
           |WHERE CAST(shared AS DOUBLE) / CAST(least(n1.nf, n2.nf) AS DOUBLE)
           |      >= 0.5""".stripMargin
      }),

    // ----- q224: sorted-neighborhood dedup blocking (SNM) -----------------
    // The OTHER classical blocking family (Hernández & Stolfo 1995,
    // merge/purge): sort the corpus by a content key and compare only
    // rank-neighbors inside a width-w window — candidate volume is
    // EXACTLY (w−1)·n by construction, no bucket-size guard needed (the
    // property LSH only gets back via the hot-bucket cap). The sort key
    // must survive the perturbation it hunts AND discriminate between
    // unrelated documents, and both failure modes were MEASURED here:
    // a raw text prefix breaks under q92's drop-leading-token planting,
    // and any token-set key fails the other way on this corpus — the
    // vocabulary is 31 tokens with ~23 distinct per document, so token
    // minima collapse hundreds of unrelated docs into one run whose
    // doc_id tie-break strands true pairs (5/500, then 58/500 planted
    // pairs adjacent at sf0.001 for 1- and 4-min token keys). The unit
    // with discriminating power is the 3-token SHINGLE (order matters —
    // the same reason q27/q29 shingle before hashing), so the key is
    // the FOUR smallest distinct shingle hashes, zero-padded and
    // concatenated: dropping the lead token costs ≤3 of ~n shingles, so
    // planted pairs keep all four minima w.h.p. and land adjacent (the
    // `planted` witness column measures exactly this recall), while
    // unrelated docs must share all four minima to collide. The
    // multi-pass key trick of Hernández & Stolfo, collapsed into one
    // composite pass. The global rank is the q148 phased construction
    // (key-prefix range buckets, per-bucket running counts + bucket
    // offsets — the TeraSort shape, never one sort partition); neighbor
    // pairs are two SHIFTED EQUI-JOINS on the rank (rn → rn+1, rn+2),
    // i.e. hash joins at any scale. Verified pairs carry exact shingle
    // Jaccard and a τ=½ dup flag (integer cross-multiplication, never
    // a float threshold).
    NamedQuery(
      "q224_sorted_neighborhood",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val corpus = corpusWithNearDups(s, d)
          .select(col("doc_id"),
            array_sort(array_distinct(hashedShingles(col("text"))))
              .as("ts"))
          .select(col("doc_id"), col("ts"),
            concat_ws("", transform(slice(col("ts"), 1, 4),
              h => lpad(h.cast("string"), 10, "0"))).as("m"))
        // first 4 digits of the zero-padded first hash → ≤ 215 ranges
        val keyed = corpus.withColumn("b", substring(col("m"), 1, 4))
        val wRun = Window.partitionBy(col("b"))
          .orderBy(col("m"), col("doc_id"))
        val run = keyed.withColumn("r", row_number().over(wRun)
          .cast("long"))
        // unpartitioned BY DESIGN, and safe: the window runs over the
        // block-COUNT table, whose cardinality is the 4-digit prefix
        // domain (≤ 10^4 rows however large the corpus — the key is a
        // digit prefix of a zero-padded HASH, not of the data). If the
        // block key ever grows with the corpus, switch to the two-level
        // offset aggregate (q148 shape).
        val wOff = boundedWin.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val off = keyed.groupBy(col("b")).agg(count(lit(1)).as("tb"))
          .select(col("b"),
            coalesce(sum(col("tb")).over(wOff), lit(0L)).as("o"))
        val rk = run.join(broadcast(off), "b")
          .select(col("doc_id"), col("ts"), (col("o") + col("r")).as("rn"))
        def shifted(gap: Int) = rk
          .select(col("doc_id").as("id1"), col("ts").as("ts1"),
            (col("rn") + gap).as("rn"))
          .join(rk.select(col("doc_id").as("id2"), col("ts").as("ts2"),
            col("rn")), "rn")
          .select(col("id1"), col("id2"), lit(gap.toLong).as("gap"),
            col("ts1"), col("ts2"))
        shifted(1).unionByName(shifted(2))
          .select(col("id1"), col("id2"), col("gap"),
            size(array_intersect(col("ts1"), col("ts2"))).cast("long")
              .as("i"),
            size(col("ts1")).cast("long").as("n1"),
            size(col("ts2")).cast("long").as("n2"))
          .select(col("id1"), col("id2"), col("gap"),
            (col("i").cast("double") /
              (col("n1") + col("n2") - col("i")).cast("double"))
              .as("jaccard"),
            (col("i") * 2 >= col("n1") + col("n2") - col("i"))
              .as("is_dup"),
            (abs(col("id1") - col("id2")) === 100000).as("planted"))
      },
      Some {
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |tt AS (SELECT doc_id, text,
           |         ${tokenHashesSql("text")} AS th FROM corpus),
           |kk AS (SELECT doc_id,
           |    list_sort(list_distinct(
           |      ${hashedShinglesSql("text", "th")})) AS ts
           |  FROM tt),
           |k AS (SELECT doc_id, ts,
           |    array_to_string(list_transform(ts[1:4],
           |      h -> lpad(CAST(h AS VARCHAR), 10, '0')), '') AS m
           |  FROM kk),
           |rk AS (SELECT doc_id, ts,
           |    CAST(row_number() OVER (ORDER BY m, doc_id) AS BIGINT)
           |      AS rn
           |  FROM k),
           |pairs AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, b.rn - a.rn AS gap,
           |    CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
           |    CAST(len(a.ts) AS BIGINT) AS n1,
           |    CAST(len(b.ts) AS BIGINT) AS n2
           |  FROM rk a JOIN rk b ON b.rn - a.rn IN (1, 2))
           |SELECT id1, id2, gap,
           |  CAST(i AS DOUBLE) / CAST(n1 + n2 - i AS DOUBLE) AS jaccard,
           |  i * 2 >= n1 + n2 - i AS is_dup,
           |  abs(id1 - id2) = 100000 AS planted
           |FROM pairs""".stripMargin
      }),

    // ----- q235: dedup threshold sweep (precision/recall vs τ) ------------
    // The tuning report that decides τ before anyone deletes anything:
    // run the LSH candidate pipeline ONCE, score each candidate pair's
    // exact shingle Jaccard, then classify the same pair table at seven
    // thresholds (τ = 0.3 … 0.9) and report precision / recall / F1
    // against the planted drop-token truth. Recall's denominator is ALL
    // planted pairs (one per document), not just LSH survivors — so the
    // sweep charges LSH's candidate misses too, the honest end-to-end
    // number. Classification is integer cross-multiplication (i·10 ≥
    // τ₁₀·u — never a float threshold compare); the τ grid is a 7-row
    // broadcast; everything downstream of the (banded, capped)
    // candidate join is candidate-pair-sized.
    NamedQuery(
      "q235_threshold_sweep",
      (s, d) => {
        val corpus = corpusWithNearDups(s, d)
        val toks = corpus.select(col("doc_id"),
          array_sort(array_distinct(hashedShingles(col("text"))))
            .as("ts"))
        val scored = lshCandidatePairs(corpus)
          .select(col("id1"), col("id2"))
          .join(toks.select(col("doc_id").as("id1"),
            col("ts").as("ts1")), "id1")
          .join(toks.select(col("doc_id").as("id2"),
            col("ts").as("ts2")), "id2")
          .select(col("id1"), col("id2"),
            size(array_intersect(col("ts1"), col("ts2"))).cast("long")
              .as("i"),
            (size(col("ts1")) + size(col("ts2"))).cast("long").as("nn"),
            (abs(col("id1") - col("id2")) === 100000).cast("long")
              .as("planted"))
        val taus = s.range(3, 10).select(col("id").as("tau10"))
        val nPlanted = tbl(s, d, "documents")
          .agg(count(lit(1)).as("n_planted"))
        val cls = scored.crossJoin(broadcast(taus))
          .select(col("tau10"), col("planted"),
            (col("i") * 10 >= col("tau10") * (col("nn") - col("i")))
              .cast("long").as("pred"))
        val agg = cls.groupBy(col("tau10"))
          .agg(sum(col("pred")).as("n_pred"),
            sum(col("pred") * col("planted")).as("tp"))
          .crossJoin(broadcast(nPlanted))
        val prec = when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred").cast("double"))
        val rec = col("tp").cast("double") /
          col("n_planted").cast("double")
        agg.select(col("tau10"), col("n_pred"), col("tp"),
          col("n_planted"), prec.as("precision"), rec.as("recall"),
          // tp = 0 would make the harmonic mean 0/0 — NULL, not NaN
          when(col("tp") > 0,
            lit(2.0) * prec * rec / (prec + rec)).as("f1"))
      },
      Some {
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |tt AS (SELECT doc_id, text,
           |         ${tokenHashesSql("text")} AS th FROM corpus),
           |tk AS (SELECT doc_id,
           |    list_sort(list_distinct(
           |      ${hashedShinglesSql("text", "th")})) AS ts
           |  FROM tt),
           |$lshPairsCteSql,
           |scored AS (
           |  SELECT p.id1, p.id2,
           |    CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
           |    CAST(len(a.ts) + len(b.ts) AS BIGINT) AS nn,
           |    CASE WHEN abs(p.id1 - p.id2) = 100000
           |      THEN 1 ELSE 0 END AS planted
           |  FROM pairs p JOIN tk a ON a.doc_id = p.id1
           |               JOIN tk b ON b.doc_id = p.id2),
           |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_planted
           |       FROM documents),
           |cls AS (
           |  SELECT t.tau10, s.planted,
           |    CASE WHEN s.i * 10 >= t.tau10 * (s.nn - s.i)
           |      THEN 1 ELSE 0 END AS pred
           |  FROM scored s,
           |       (SELECT unnest(range(3, 10)) AS tau10) t),
           |agg AS (
           |  SELECT tau10, CAST(SUM(pred) AS BIGINT) AS n_pred,
           |    CAST(SUM(pred * planted) AS BIGINT) AS tp
           |  FROM cls GROUP BY tau10)
           |SELECT a.tau10, a.n_pred, a.tp, np.n_planted,
           |  CASE WHEN a.n_pred > 0 THEN CAST(a.tp AS DOUBLE)
           |    / CAST(a.n_pred AS DOUBLE) END AS precision,
           |  CAST(a.tp AS DOUBLE) / CAST(np.n_planted AS DOUBLE)
           |    AS recall,
           |  CASE WHEN a.tp > 0 THEN
           |    2.0 * (CAST(a.tp AS DOUBLE) / CAST(a.n_pred AS DOUBLE))
           |      * (CAST(a.tp AS DOUBLE) / CAST(np.n_planted AS DOUBLE))
           |    / (CAST(a.tp AS DOUBLE) / CAST(a.n_pred AS DOUBLE)
           |       + CAST(a.tp AS DOUBLE) / CAST(np.n_planted AS DOUBLE))
           |  END AS f1
           |FROM agg a, np""".stripMargin
      }),

    // ----- q264: Fellegi–Sunter probabilistic record linkage --------------
    // The statistical backbone of record linkage (Fellegi & Sunter,
    // JASA 1969): for each candidate pair, compare a vector of cheap
    // field agreements and score with the likelihood ratio
    //   w = Π_k  m_k/u_k        if field k agrees
    //            (1−m_k)/(1−u_k) if it disagrees
    // where m_k = P(agree | match) and u_k = P(agree | non-match) are
    // estimated from a labeled pair sample — here the planted-dup
    // ground truth (id2 = id1 + 100000) over the family's shared LSH
    // candidate pairs, which is exactly how linkage deployments
    // bootstrap m/u from a reviewed sample. Four fields: length band,
    // first token, token-count band, Jaccard ≥ 0.95 (0.95, not 0.8: every
    // LSH candidate pair on this corpus clears 0.8, so that cut made
    // a_jac constant-true and the field informationless — the r12
    // degeneracy sweep; at 0.95 the field splits ~5:1 at every SF).
    // Laplace-smoothed
    // m/u keep every factor finite; each factor is a ratio of exact
    // integer products ((am+1)(U+2) / ((au+1)(M+2))), and w multiplies
    // the four factor doubles in FIXED field order — IEEE multiply is
    // exact-rounded and order-pinned, so w hash-matches the oracle with
    // no libm anywhere (cf. q52's discipline). Output: per-pair
    // agreement vector, weight, and the w > 2 decision against ground
    // truth (2, not the textbook-ish 8: the four weak fields cap the
    // achievable weight near 5 on this corpus, so an unreachable cut
    // made predicted_match constant-false — same sweep finding). Scale: pairs are the LSH-capped candidate set; the m/u
    // table is ONE global aggregate row broadcast back — two linear
    // passes over candidates, nothing quadratic.
    NamedQuery(
      "q264_fellegi_sunter",
      (s, d) => {
        val corpus = corpusWithNearDups(s, d)
        val attrs = corpus.select(col("doc_id"),
          floor(length(col("text")) / 100).cast("long").as("len_band"),
          split(col("text"), " ").getItem(0).as("tok0"),
          floor(size(split(col("text"), " ")) / lit(20)).cast("long")
            .as("ntok_band"))
        val pairs = GovernanceOps.sharedPairs(s, d)
          .select(col("id1"), col("id2"), col("jaccard"))
        val cmp = pairs
          .join(attrs.select(col("doc_id").as("id1"),
            col("len_band").as("lb1"), col("tok0").as("t1"),
            col("ntok_band").as("nb1")), Seq("id1"))
          .join(attrs.select(col("doc_id").as("id2"),
            col("len_band").as("lb2"), col("tok0").as("t2"),
            col("ntok_band").as("nb2")), Seq("id2"))
          .select(col("id1"), col("id2"),
            (col("id2") - col("id1") === 100000).as("is_match"),
            (col("lb1") === col("lb2")).as("a_len"),
            (col("t1") === col("t2")).as("a_tok0"),
            (col("nb1") === col("nb2")).as("a_ntok"),
            (col("jaccard") >= 0.95).as("a_jac"))
        val fields = Seq("a_len", "a_tok0", "a_ntok", "a_jac")
        val muCols =
          Seq(sum(when(col("is_match"), 1L).otherwise(0L)).as("m_tot"),
            sum(when(!col("is_match"), 1L).otherwise(0L)).as("u_tot")) ++
          fields.map(f => sum(when(col("is_match") && col(f), 1L)
            .otherwise(0L)).as(s"am_$f")) ++
          fields.map(f => sum(when(!col("is_match") && col(f), 1L)
            .otherwise(0L)).as(s"au_$f"))
        val mu = cmp.agg(muCols.head, muCols.tail: _*)
        val scored = cmp.crossJoin(broadcast(mu))
        // factor k: agree → (am+1)(U+2) / ((au+1)(M+2));
        // disagree → (M−am+1)(U+2) / ((U−au+1)(M+2)) — Laplace on both
        val factor = (f: String) => {
          val am = col(s"am_$f"); val au = col(s"au_$f")
          val M = col("m_tot"); val U = col("u_tot")
          when(col(f),
            ((am + 1) * (U + 2)).cast("double") /
              ((au + 1) * (M + 2)).cast("double"))
            .otherwise(((M - am + 1) * (U + 2)).cast("double") /
              ((U - au + 1) * (M + 2)).cast("double"))
        }
        scored.select(col("id1"), col("id2"), col("is_match"),
            col("a_len"), col("a_tok0"), col("a_ntok"), col("a_jac"),
            (factor("a_len") * factor("a_tok0") * factor("a_ntok") *
              factor("a_jac")).as("weight"))
          .withColumn("predicted_match", col("weight") > 2.0)
      },
      Some {
        def factorSql(f: String): String =
          s"""CASE WHEN c.$f THEN
             |  CAST((mu.am_$f + 1) * (mu.u_tot + 2) AS DOUBLE)
             |    / CAST((mu.au_$f + 1) * (mu.m_tot + 2) AS DOUBLE)
             |ELSE
             |  CAST((mu.m_tot - mu.am_$f + 1) * (mu.u_tot + 2) AS DOUBLE)
             |    / CAST((mu.u_tot - mu.au_$f + 1) * (mu.m_tot + 2)
             |           AS DOUBLE)
             |END""".stripMargin
        val fields = Seq("a_len", "a_tok0", "a_ntok", "a_jac")
        s"""WITH corpus AS ($corpusWithNearDupsSql),
           |$lshPairsCteSql,
           |attrs AS (
           |  SELECT doc_id,
           |    CAST(floor(length(text) / 100.0) AS BIGINT) AS len_band,
           |    string_split(text, ' ')[1] AS tok0,
           |    CAST(floor(len(string_split(text, ' ')) / 20.0) AS BIGINT)
           |      AS ntok_band
           |  FROM corpus),
           |cmp AS (
           |  SELECT p.id1, p.id2,
           |    p.id2 - p.id1 = 100000 AS is_match,
           |    a1.len_band = a2.len_band AS a_len,
           |    a1.tok0 = a2.tok0 AS a_tok0,
           |    a1.ntok_band = a2.ntok_band AS a_ntok,
           |    p.jaccard >= 0.95 AS a_jac
           |  FROM pairs p
           |  JOIN attrs a1 ON a1.doc_id = p.id1
           |  JOIN attrs a2 ON a2.doc_id = p.id2),
           |mu AS (
           |  SELECT
           |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
           |      AS m_tot,
           |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END)
           |      AS BIGINT) AS u_tot,
           |    ${fields.map(f =>
              s"""CAST(SUM(CASE WHEN is_match AND $f THEN 1 ELSE 0 END)
                 |      AS BIGINT) AS am_$f,
                 |    CAST(SUM(CASE WHEN NOT is_match AND $f THEN 1 ELSE 0
                 |      END) AS BIGINT) AS au_$f""".stripMargin)
              .mkString(",\n    ")}
           |  FROM cmp)
           |SELECT c.id1, c.id2, c.is_match,
           |  c.a_len, c.a_tok0, c.a_ntok, c.a_jac,
           |  ${factorSql("a_len")} * ${factorSql("a_tok0")}
           |    * ${factorSql("a_ntok")} * ${factorSql("a_jac")} AS weight,
           |  ${factorSql("a_len")} * ${factorSql("a_tok0")}
           |    * ${factorSql("a_ntok")} * ${factorSql("a_jac")} > 2.0
           |    AS predicted_match
           |FROM cmp c CROSS JOIN mu""".stripMargin
      }),
  )
}
