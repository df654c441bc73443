package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` stream (SURVEY.md §2.7):
  * the streaming forms of the batch window queries q19-q21 plus an
  * explicit-state aggregation via flatMapGroupsWithState.
  *
  * Batch/stream parity is the design invariant: each transform here uses
  * the same expressions as its batch twin in
  * [[graft.ops.TimeWindowOps]], and StreamOpsSpec proves result equality
  * on the same input. Sums go through exact decimal arithmetic
  * ([[graft.ops.OpsKit.dsum]]) so microbatch boundaries can't change
  * results.
  *
  * Scale notes: all aggregations are keyed (window / user_id) so state is
  * hash-partitioned across executors; watermarks bound state size — an
  * unbounded-state shape (complete mode, no watermark) appears nowhere.
  */
object StreamOps {
  import graft.ops.OpsKit.{dsum, TsFmt}

  /** Deployment-shaped event schema (micros timestamps; the TIMESTAMP_NANOS
    * quirk is a testdata-file artifact handled by the batch reader only). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream: one file per microbatch so watermarks advance
    * between chunks (admission control under Trigger.AvailableNow too). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** q19 streaming twin: tumbling 1 h windows, 1 h watermark. */
  def tumbling(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n"), col("sum_value"))

  /** q20 streaming twin: sliding 1 h / 30 min windows. */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n"), col("sum_value"))

  /** q21 streaming twin: per-user session windows, 10 min gap. */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), TsFmt).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id: watermark-bounded state (an id
    * older than the watermark can be dropped from the dedup map), the
    * standard at-least-once → exactly-once ingestion repair. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-dup suppression: drop a document whose TF-weighted
    * 60-bit SimHash was already seen within the watermark — the streaming
    * form of content-signature dedup (exact dedup keys on the raw hash;
    * this keys on a similarity signature, so exact and minimally-edited
    * re-posts are suppressed too). Signature width (r14 ADVICE): at 16
    * bits, DISTINCT documents birthday-collide after ~300 per watermark
    * window and are silently dropped; at the full 60-bit strHash width
    * the first expected false drop sits near 2^30 distinct docs per
    * window. The trade: heavier edits now move the signature and pass
    * through — by design, streamed ingest suppresses exact/near-exact
    * re-posts between batch rebuilds, and the batch LSH + closure pass
    * ([[graft.sink.CorpusBuild]] stage 1) remains the authoritative
    * near-dup collapse. State = one row per distinct signature, bounded
    * by the watermark. Input schema: (ts TIMESTAMP, doc_id LONG,
    * text STRING). */
  def nearDupFilter(docs: DataFrame): DataFrame =
    docs
      .withColumn("simhash", call_function("simhash60_weighted", col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("simhash")

  /** Streaming k-means assignment: a stream of (ts, vec_id, embedding)
    * assigned to the STATIC centroids a [[graft.ops.SimilarityOps
    * .kmeansCentroids]] training run produced — the online scoring half
    * of the offline-train / online-assign split (same pattern as
    * clusterAssign for text near-dup clusters). Each point is quantized
    * with the SAME 2^20 grid expression the trainer used, joined against
    * the broadcast centroid table (stream-static, stateless), and the
    * argmin emerges from a watermark-bounded windowed min_by — ties
    * break toward the smallest cluster id, mirroring the batch
    * assignment's (dist, cluster) ordering. The static side is persisted
    * so the training plan does not re-execute per microbatch. Output:
    * (vec_id, cluster, dist) with dist de-scaled to original embedding
    * units (exact /2^40 binary division). */
  def kmeansAssign(points: DataFrame, cents: DataFrame): DataFrame = {
    val cp = cents.persist()
    points
      .withColumn("qe", expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"))
      .withWatermark("ts", "1 hour")
      .join(broadcast(cp))
      .withColumn("gdist", expr("aggregate(zip_with(qe, ce, (x, c) -> " +
        "(CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), 0D, " +
        "(a, v) -> a + v)"))
      .groupBy(window(col("ts"), "1 hour"), col("vec_id"))
      .agg(
        min_by(col("cluster"), struct(col("gdist"), col("cluster")))
          .as("cluster"),
        min(col("gdist")).as("gdist"))
      .select(col("vec_id"), col("cluster"),
        (col("gdist") / lit(1099511627776.0)).as("dist"))
  }

  /** Streaming ANN: a stream of (ts, query_id, embedding) matched against
    * a STATIC vector index — the online form of the batch LSH ANN (q32).
    * The index is bucketed ONCE with the same deterministic `lsh_bucket`
    * expression the batch path uses; each microbatch equi-joins on the
    * bucket (stream-static join: stateless, no per-batch index rebuild),
    * scores the bucket's candidates with the exact cosine, and emits each
    * query's best match when its event-time window closes. Determinism:
    * ties on cosine break toward the smallest candidate id. State = the
    * open (window, query) aggregates only, bounded by the watermark; the
    * candidate join itself keeps no state. At scale the index side is a
    * bucket-partitioned table, so each stream task probes one bucket's
    * candidates — never the full index. */
  def annMatch(queries: DataFrame, index: DataFrame): DataFrame = {
    import graft.ops.LlmKit
    val idx = index.select(
      call_function("lsh_bucket", col("embedding")).as("bucket"),
      col("vec_id").as("cand_id"), col("embedding").as("cand_emb"))
    queries
      .withColumn("bucket", call_function("lsh_bucket", col("embedding")))
      .withWatermark("ts", "1 hour")
      .join(idx, Seq("bucket"))
      .withColumn("cos", LlmKit.cosine(col("embedding"), col("cand_emb")))
      .groupBy(window(col("ts"), "1 hour"), col("query_id"))
      .agg(
        max_by(col("cand_id"), struct(col("cos"), -col("cand_id")))
          .as("best_id"),
        max(col("cos")).as("best_cos"))
      .select(col("query_id"), col("best_id"), col("best_cos"))
  }

  /** Streaming attribution: the watermarked STREAM-STREAM interval join —
    * every (click, purchase) pair of the same user with the purchase
    * inside [click, click + 4 h), the streaming twin of batch q63
    * ([[graft.ops.TemporalOps]]). Both sides carry their own watermark
    * and the join condition bounds purchase_ts relative to click_ts, so
    * Spark derives a state-expiry horizon for each side: a click older
    * than watermark − 4 h can never match a future purchase and is
    * evicted. Inner-join results emit as soon as both rows arrive —
    * state is bounded by (watermark + window), never the stream length.
    * At scale the join shuffles both streams on user_id once. */
  def attribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 4 HOURS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("gap_sec"))
  }

  /** Streaming cluster assignment: route each incoming document to the
    * near-dup cluster of a STATIC clustered corpus — the online
    * maintenance step for the batch clustering (q47/q57): the expensive
    * connected-components closure runs offline, and between runs every
    * arriving document is assigned to its cluster (or recognized as
    * novel) at ingestion time. The static side's signatures and bands
    * are computed once with the same deterministic expressions the batch
    * path uses; each microbatch bands its rows and equi-joins on
    * (band, bkey) (stream-static, stateless), verifies candidates with
    * the exact Jaccard (≥ 0.5), and emits the best cluster per document
    * when its event-time window closes — ties break toward the smallest
    * cluster rep. Documents matching nothing don't appear (the caller
    * treats absence as "new cluster seed"). State = the open
    * (window, doc) aggregates only, bounded by the watermark.
    * Input: docs (ts, doc_id, text); clustered (doc_id, text,
    * cluster_rep). */
  def clusterAssign(docs: DataFrame, clustered: DataFrame): DataFrame = {
    import graft.ops.LlmKit
    val statSigs = LlmKit.shingleSigs(
      clustered.select(col("doc_id"), col("text")))
    // persist: a stream-static join re-executes the static plan every
    // microbatch — without this the md5 + MinHash pass over the WHOLE
    // clustered corpus would run per trigger, not once
    val statBands = LlmKit.sigBands(statSigs)
      .join(statSigs.select(col("doc_id"), col("ds")), "doc_id")
      .join(clustered.select(col("doc_id"), col("cluster_rep")), "doc_id")
      .select(col("band"), col("bkey"), col("cluster_rep"),
        col("ds").as("cand_ds"))
      .persist()
    // band the stream inline (sigBands is batch-shaped; the stream must
    // carry ts/ds through the explode — same bandStruct, so stream and
    // batch cannot band differently)
    val banded = docs
      .withColumn("ds", array_distinct(LlmKit.hashedShingles(col("text"))))
      .withColumn("sig", LlmKit.minhashSigFromHashes(col("ds")))
      .select(col("ts"), col("doc_id"), col("ds"), LlmKit.bandStruct.as("bk"))
      .select(col("ts"), col("doc_id"), col("ds"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    banded
      .withWatermark("ts", "1 hour")
      .join(statBands, Seq("band", "bkey"))
      .withColumn("jaccard", LlmKit.jaccardOf(col("ds"), col("cand_ds")))
      .filter(col("jaccard") >= 0.5)
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"))
      .agg(
        max_by(col("cluster_rep"), struct(col("jaccard"), -col("cluster_rep")))
          .as("cluster_rep"),
        max(col("jaccard")).as("best_jaccard"))
      .select(col("doc_id"), col("cluster_rep"), col("best_jaccard"))
  }

  /** Streaming contamination guard: flag an incoming document when it
    * near-duplicates (shingle Jaccard ≥ 0.5) any document of a STATIC
    * eval set — "don't train on eval" enforced at ingestion time, the
    * streaming twin of batch q45. The eval side's signatures and bands
    * are computed once from the same deterministic expressions the batch
    * path uses; each microbatch bands its rows and equi-joins on
    * (band, bkey) (stream-static, stateless), then verifies candidates
    * with the exact Jaccard. A pair matching in several bands collapses
    * via watermark-bounded dedup — the only stateful step, sized by the
    * watermark, not the corpus. Input: (ts, doc_id, text). */
  def contaminationGuard(docs: DataFrame, evalDocs: DataFrame): DataFrame =
    contaminationHits(docs, evalDocs)
      .dropDuplicatesWithinWatermark("doc_id", "eval_id")
      .select(col("doc_id"), col("eval_id"), col("jaccard"))

  /** The stateless stage of [[contaminationGuard]]: per-band hits with
    * exact Jaccard, duplicates across bands NOT yet collapsed. Pure
    * expressions + stream-static joins, so the identical code also runs
    * in batch mode — StreamOpsSpec uses that for stream==batch parity
    * (batch mode cannot run the watermark dedup; it collapses with a
    * plain distinct instead). */
  def contaminationHits(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    import graft.ops.LlmKit._
    val evalSigs = shingleSigs(evalDocs)
    val evalBands = sigBands(evalSigs)
      .select(col("doc_id").as("eval_id"), col("band"), col("bkey"))
    val evalSets = evalSigs
      .select(col("doc_id").as("eval_id"), col("ds").as("eval_ds"))
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("ds", array_distinct(hashedShingles(col("text"))))
      .withColumn("sig", minhashSigFromHashes(col("ds")))
      .select(col("ts"), col("doc_id"), col("ds"), bandStruct.as("bk"))
      .select(col("ts"), col("doc_id"), col("ds"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .join(evalBands, Seq("band", "bkey"))
      .join(evalSets, Seq("eval_id"))
      .withColumn("jaccard", jaccardOf(col("ds"), col("eval_ds")))
      .filter(col("jaccard") >= 0.5)
  }

  /** Streaming drift monitor: per event-time window, the chi-square
    * terms of the window's length histogram against a STATIC reference
    * corpus — q96's batch-over-batch gate run continuously at ingestion
    * (alert when a window's chi2 spikes: the incoming mix changed). The
    * whole window histogram is ONE streaming aggregate (13 fixed-bucket
    * conditional sums — no second stateful agg for the window total),
    * exploded after the window closes and met by the broadcast reference
    * histogram in a stateless stream-static join. State = open windows ×
    * 13 counters, bounded by the watermark. Pure expressions + a static
    * join, so the identical code runs in batch mode (q99's oracle twin).
    * ALL 13 buckets are emitted per window, including n_new = 0 rows:
    * a reference-heavy bucket that vanishes from a window is the
    * strongest possible mix shift, and its (0 − e)²/e = e term must
    * reach the alert, not be dropped as an absent group. Input:
    * docs (ts, doc_id, text); reference (n_chars). */
  /** Streaming Benford gate — q175's first-digit audit as a continuous
    * monitor: per event-time hour window, the observed first-digit
    * histogram against the literal Benford masses
    * ([[graft.ops.AnalyticsOps.BenfordMass]] — log10 at query time
    * would be libm). Digits use q175's exact integer-cents extraction;
    * the window aggregate carries nine conditional sums so every
    * digit's chi-square term — including a vanished digit's (0−e)²/e —
    * survives into the output. Watermark bounds state to open hour
    * windows. Batch twin: q192 runs this SAME function in batch mode
    * under the driver's hash gate; StreamOpsSpec proves stream ==
    * batch on the same input.
    */
  def benfordGate(events: DataFrame): DataFrame = {
    val masses = graft.ops.AnalyticsOps.BenfordMass
    val benford = masses.tail.foldLeft(
      when(col("digit") === masses.head._1, lit(masses.head._2))) {
      case (acc, (dg, p)) => acc.when(col("digit") === dg, lit(p))
    }
    val digit = substring(
      floor(col("value") * 100 + lit(0.5)).cast("string"), 1, 1)
      .cast("int")
    // No pre-aggregate row filter: Catalyst pushes one below the
    // EventTimeWatermark node, and a row dropped there never advances
    // event time (a zero-value straggler — or the spec's sentinel —
    // must still move the watermark). Invalid amounts become a NULL
    // digit instead; windows holding ONLY invalid rows are dropped
    // post-aggregate, which is a plain filter on the aggregate output.
    // "Invalid" includes values in (0, 0.005): their scaled cents are 0,
    // a digit with no cell in the 1–9 grid — counting them in n_win
    // would inflate every expected mass (q175's rule, mirrored in the
    // q192 oracle).
    val hist = events
      .select(col("ts"),
        when(col("value") > 0.0 &&
          floor(col("value") * 100 + lit(0.5)) >= 1, digit).as("digit"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sum(when(col("digit").isNotNull, 1L).otherwise(0L)).as("n_win"),
        (1 to 9).map(i =>
          sum(when(col("digit") === i, 1L).otherwise(0L)).as(s"d$i")): _*)
      .filter(col("n_win") > 0)
    hist
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n_win"),
        explode(array((1 to 9).map(i =>
          struct(lit(i).as("digit"), col(s"d$i").as("n_obs"))): _*))
          .as("dn"))
      .select(col("window_start"), col("dn.digit").as("digit"),
        col("dn.n_obs").as("n_obs"), col("n_win"))
      .withColumn("expected", col("n_win").cast("double") * benford)
      .withColumn("chi2_term",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) /
          col("expected"))
  }

  /** Streaming sample-ratio-mismatch gate — q244's A/B assignment
    * audit as a continuous monitor: per event-time hour window, the
    * event volume each parity arm received and the exact 1-dof
    * chi-square (o₁−o₂)²/n with the α = 0.05 alarm. A logging outage
    * or assignment bug skews the split in the hour it happens — this
    * trips there, not when the experiment is read out. Event-level
    * arms (windowed DISTINCT users would need dedup state; volume SRM
    * is the standard streaming form, and an arm-biased outage skews
    * volume first). Watermark bounds state to open hour windows.
    * Batch twin: q253 runs this SAME function in batch mode under the
    * driver's hash gate; StreamOpsSpec proves stream == batch. */
  def srmGate(events: DataFrame): DataFrame = {
    val st = events
      .select(col("ts"),
        (col("user_id") % 2 === 0).cast("long").as("arm0"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("arm0")).as("n_arm0"))
    val o1 = col("n_arm0").cast("double")
    val o2 = (col("n") - col("n_arm0")).cast("double")
    val chi = (o1 - o2) * (o1 - o2) / col("n").cast("double")
    st.select(date_format(col("window.start"), TsFmt).as("window_start"),
      col("n"), col("n_arm0"), (col("n") - col("n_arm0")).as("n_arm1"),
      chi.as("chi2"), (chi > lit(3.841)).as("srm_alarm"))
  }

  /** Per-hour KLL quantile monitor: the q254 sketch run as a windowed
    * streaming aggregation — the latency/throughput profile a 100-TB
    * ingest pipeline actually watches (p50/p95 per event-time hour)
    * without ever buffering a window's raw values. The typed Aggregator
    * rides Spark's streaming state store exactly like a built-in agg:
    * each microbatch folds its rows into the window's KllBuf partial,
    * the watermark closes and emits windows, state stays O(k·log(n/k))
    * per open window.
    *
    * Parity contract (weaker than srmGate's BIT equality, necessarily):
    * a KLL estimate depends on the merge tree, and stream microbatch
    * boundaries ARE a different merge tree than batch partitions — so
    * stream est ≠ batch est in general. What IS invariant — and what
    * StreamOpsSpec asserts for both modes against a Scala re-derivation
    * — is the sketch's rank-error contract: every emitted estimate's
    * exact in-window rank sits within 2%·n of the target, and `n` per
    * window is exact in both modes. The registered batch twin
    * (q257_stream_quantiles) additionally certifies the batch run
    * in-query against the phased-CDF witness under the driver's hash
    * gate. */
  def quantileSketchWindows(events: DataFrame): DataFrame = {
    val kll = udaf(new graft.functions.KllQuantiles(256, Array(0.5, 0.95)))
    events
      .select(col("ts"), col("value").cast("double").as("v"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kll(col("v")).as("sk"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("sk.n").as("n"),
        element_at(col("sk.est"), 1).as("est_p50"),
        element_at(col("sk.est"), 2).as("est_p95"))
  }

  /** Per-hour distinct-user monitor: HLL++ cardinality as a windowed
    * streaming aggregation — the audience/abuse readout (unique actors
    * per hour) that exact windowed DISTINCT can't give a stream without
    * per-user dedup state. HLL registers merge by per-register max, so
    * the estimate is merge-order-INsensitive: unlike the KLL monitor,
    * stream == batch holds bit-exactly across any microbatch split
    * (StreamOpsSpec asserts plain equality). Batch twin q258 gates the
    * estimate against the exact per-window distinct count under the
    * driver's hash gate, q41's bounded-error-boolean discipline. */
  def cardinalityWindows(events: DataFrame): DataFrame =
    events
      .select(col("ts"), col("user_id"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n"), col("approx_users"))

  /** Per-hour heavy-hitters monitor — the third of the live-ingest
    * monitor trio (q257 quantiles, q258 cardinality, q265 top keys):
    * space-saving top-5 keys per window via the
    * [[graft.functions.SpaceSavingTopK]] typed Aggregator running
    * through the streaming state store. State is the aggregator's
    * bounded buffer (≤ cap counters per open window — the whole point
    * of space-saving on a stream; an exact windowed top-k would hold
    * every distinct key). While a window's distinct keys stay ≤ cap the
    * summary is EXACT and merge-order-insensitive, so stream == batch
    * == exact holds bit-identically (StreamOpsSpec asserts it); past
    * cap the documented ±(n/cap) bound takes over. Batch twin
    * q265_stream_topk certifies every emitted count against the exact
    * per-window counts under the driver's hash gate. */
  def heavyHitterWindows(events: DataFrame): DataFrame = {
    val ss = udaf(new graft.functions.SpaceSavingTopK(64, 5))
    events
      .select(col("ts"), col("event_type"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), ss(col("event_type")).as("hh"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n"),
        posexplode(arrays_zip(col("hh.top_toks"), col("hh.top_counts"))))
      .select(col("window_start"), col("n"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.top_toks").as("tok"),
        col("col.top_counts").as("cnt"))
  }

  def driftMonitor(docs: DataFrame, reference: DataFrame): DataFrame = {
    val nBuckets = 13
    val ref = reference
      .select(least(floor(col("n_chars") / 25), lit(12)).cast("long")
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_old"))
    val refT = ref.crossJoin(ref.agg(sum(col("n_old")).as("t_old")))
    val hist = docs
      .select(col("ts"),
        least(floor(length(col("text")) / 25), lit(12)).cast("long")
          .as("bucket"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_win"),
        (0 until nBuckets).map(i =>
          sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"b$i")): _*)
    val e = (col("n_old").cast("double") / col("t_old").cast("double")) *
      col("n_win").cast("double")
    hist
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n_win"),
        explode(array((0 until nBuckets).map(i =>
          struct(lit(i.toLong).as("bucket"), col(s"b$i").as("n_new"))): _*))
          .as("bn"))
      .select(col("window_start"), col("bn.bucket").as("bucket"),
        col("bn.n_new").as("n_new"), col("n_win"))
      .join(broadcast(refT), Seq("bucket"), "left")
      .select(col("window_start"), col("bucket"), col("n_new"),
        col("n_win"),
        when(col("n_old") > 0, e).as("expected_new"),
        when(col("n_old") > 0,
          (col("n_new").cast("double") - e) *
            (col("n_new").cast("double") - e) / e).as("chi2_term"))
  }

  /** Per-row Gopher-style quality gates (q134's rules) as PURE
    * expressions — no per-doc groupBy, so the same code runs in a
    * stream with a single downstream stateful aggregation. The per-doc
    * top-token count (q134 computes it as a groupBy max) is here the
    * longest equal-run of the SORTED token array, folded in one pass
    * with a struct accumulator — same multiset, same maximum, and the
    * sort+fold is O(n log n) per row, charged to the row that carries
    * the tokens. Token semantics match q134 exactly (split on single
    * space, empty tokens count).
    *
    * Output schema contract (changed in r14, called out per ADVICE):
    * EVERY input column passes through unchanged — (ts, doc_id, text)
    * plus whatever else the caller supplies (the composed ingest needs
    * `source` downstream) — with the gate columns appended: n_toks,
    * g_len, g_wordlen, g_stop, g_rep, keep. Memory-sink consumers
    * asserting exact schemas must list their own input columns too. */
  def qualityGates(docs: DataFrame): DataFrame = {
    val topRun = "aggregate(array_sort(tk), " +
      "named_struct('p', CAST(NULL AS STRING), 'r', CAST(0 AS BIGINT), " +
      "'b', CAST(0 AS BIGINT)), " +
      "(a, x) -> named_struct('p', x, " +
      "'r', IF(a.p <=> x, a.r + CAST(1 AS BIGINT), CAST(1 AS BIGINT)), " +
      "'b', GREATEST(a.b, IF(a.p <=> x, a.r + CAST(1 AS BIGINT), " +
      "CAST(1 AS BIGINT)))), " +
      "a -> a.b)"
    docs
      // tk is BOUND before any HOF touches it (the q31 recompute trap)
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n_toks", size(col("tk")).cast("long"))
      .withColumn("sum_len",
        expr("aggregate(tk, CAST(0 AS BIGINT), (a, x) -> a + length(x))"))
      .withColumn("n_stop",
        expr("CAST(size(filter(tk, x -> x IN ('the', 'a'))) AS BIGINT)"))
      .withColumn("top_c", expr(topRun))
      .withColumn("g_len", col("n_toks").between(40, 100000))
      // bounds mirror q134_gopher_gates (TextOps) — keep in lockstep:
      // upper mean word length 4.5 as 2*suml <= 9*n (r12 de-degeneracy)
      .withColumn("g_wordlen", col("sum_len") >= col("n_toks") * 3 &&
        col("sum_len") * 2 <= col("n_toks") * 9)
      .withColumn("g_stop", col("n_stop") >= 2)
      .withColumn("g_rep", col("top_c") * 5 <= col("n_toks"))
      .withColumn("keep",
        col("g_len") && col("g_wordlen") && col("g_stop") && col("g_rep"))
      // input columns ride through (r14: the composed ingest needs text
      // and source downstream of the gates); only intermediates drop
      .drop("tk", "sum_len", "n_stop", "top_c")
  }

  /** The streaming twin of the batch corpus build's gate chain
    * ([[graft.sink.CorpusBuild]] runs decisions → weights → sample →
    * pack → publish as a REBUILD; this is the incremental ingest a
    * production corpus runs between rebuilds). Per arriving
    * (ts, doc_id, text, source) row, in the batch chain's precedence:
    *   1. q134's per-row quality gates ([[qualityGates]]) — keep only;
    *   2. exact decontamination (q53's form): a stream-static LEFT ANTI
    *      join on md5(text) against the static eval corpus — stateless,
    *      broadcast at eval-set size;
    *   3. near-dup suppression ([[nearDupFilter]]) — watermark-bounded
    *      60-bit simhash state, so exact and minimally-edited re-posts
    *      drop too (heavier edits defer to the batch LSH closure; see
    *      nearDupFilter's width rationale).
    * Stages 1–2 plus the signature are the stateless [[ingestHits]]
    * (pure expressions + a stream-static join, so the identical code
    * also runs in batch — the [[contaminationGuard]] split); only the
    * final watermark dedup is stream-only, and in batch it collapses to
    * a plain signature dedup. StreamCorpusIngestSpec pins
    * stream == batch signature-for-signature on the planted corpus.
    * Output keeps the admitting simhash as the dedup witness. */
  def ingestGates(docs: DataFrame, evalDocs: DataFrame): DataFrame =
    ingestHits(docs, evalDocs)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("simhash")

  /** The stateless stage of [[ingestGates]]: quality-gated,
    * decontaminated, signature-carrying rows — near-dup duplicates NOT
    * yet collapsed. */
  def ingestHits(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val kept = qualityGates(docs).filter(col("keep"))
      .select(col("ts"), col("doc_id"), col("text"), col("source"))
    val evalHashes = evalDocs
      .select(md5(col("text")).as("__eh")).distinct()
    kept.withColumn("__h", md5(col("text")))
      .join(broadcast(evalHashes), col("__h") === col("__eh"), "left_anti")
      .drop("__h")
      // 60-bit signature (r14 ADVICE): see [[nearDupFilter]] for the
      // width rationale — 16 bits false-drops distinct docs at birthday
      // scale (~300/window); 60 bits is safe to ~2^30 per window
      .withColumn("simhash",
        call_function("simhash60_weighted", col("text")))
  }

  /** End-to-end incremental ingest: [[ingestGates]] landed through the
    * exactly-once [[publishStream]] layout (deterministic per-batch
    * paths + commit markers — a replayed microbatch overwrites its own
    * previous attempt and can never clobber a committed one). */
  def ingestCorpus(docs: DataFrame, evalDocs: DataFrame, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    publishStream(ingestGates(docs, evalDocs), outDir, checkpoint)

  /** Streaming quality-gate monitor: per event-time hour, how much of
    * the incoming corpus passes the Gopher gates — the live dashboard a
    * crawl-ingest pipeline watches (a pass-rate cliff means the crawler
    * started pulling boilerplate, navigation soup, or truncated docs).
    * Stateless per-row gates ([[qualityGates]]) feed ONE watermarked
    * windowed aggregation; identical code runs in batch (q150's oracle
    * twin). */
  def qualityGateMonitor(docs: DataFrame): DataFrame =
    qualityGates(docs)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_pass"))
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs").cast("double"))
          .as("pass_rate"))

  /** Streaming mixture monitor — the live twin of the q298/q299 mixture
    * design: per event-time hour, the ACHIEVED per-source share of the
    * ingest stream against the TARGET mixture weights (the kept-pool
    * DoReMi alphas from [[graft.sink.CorpusBuild.doremiTargets]], or any
    * (source, weight) list), with a per-source chi-square term and a
    * drift alarm — the dashboard that catches a crawler flooding one
    * domain before the next batch rebuild would.
    *
    * Streaming shape: targets are STATIC (K driver scalars), so the
    * per-source counts are K conditional aggregates inside ONE
    * watermarked window aggregation — one stateful operator, legal in
    * append mode — and the per-source rows re-emerge from a stateless
    * explode over the K-literal array. n_total rides each row, so
    * share/expected/chi2 are pure post-agg expressions; identical code
    * runs in batch (q301's oracle twin; StreamOpsSpec pins
    * stream == batch). The alarm is per (window, source): achieved
    * share outside [weight/2, 2·weight]. Input schema:
    * (ts TIMESTAMP, …, source STRING). */
  def mixtureMonitor(docs: DataFrame,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "mixture targets must be non-empty")
    val countCols = targets.zipWithIndex.map { case ((src, _), i) =>
      sum(when(col("source") === src, 1L).otherwise(0L)).as(s"__n$i")
    }
    val byWin = docs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_total"), countCols: _*)
    val perSrc = explode(array(targets.zipWithIndex.map {
      case ((src, w), i) =>
        struct(lit(src).as("source"), lit(w).as("weight"),
          col(s"__n$i").as("n_docs"))
    }: _*)).as("z")
    val nD = col("n_docs").cast("double")
    val totD = col("n_total").cast("double")
    byWin
      .select(date_format(col("window.start"), TsFmt).as("window_start"),
        col("n_total"), perSrc)
      .select(col("window_start"), col("z.source").as("source"),
        col("z.n_docs").as("n_docs"), col("n_total"),
        col("z.weight").as("weight"))
      .withColumn("share", nD / totD)
      .withColumn("expected", col("weight") * totD)
      .withColumn("chi2_term",
        (nD - col("expected")) * (nD - col("expected")) / col("expected"))
      .withColumn("drifted",
        col("share") * lit(2.0) < col("weight") ||
          col("share") > col("weight") * lit(2.0))
  }

  final case class AdmitIn(ts: java.sql.Timestamp, wstart: String,
      wend_ms: Long, source: String, doc_id: Long, h: Long, n_toks: Long,
      quota: Long)
  final case class AdmitDecision(window_start: String, source: String,
      doc_id: Long, n_toks: Long, admitted: Boolean)

  /** Default per-window global token budget for [[admissionThrottle]]:
    * sized so at the test SFs the flooded source saturates its share
    * while honest sources clear theirs (q305's batch twin pins the
    * arithmetic under the hash gate). */
  val AdmissionWindowTokens = 4096.0

  /** Streaming admission controller — the CONTROL half of the q301
    * mixture monitor (r15 verdict item 4): per event-time hour, each
    * source may admit at most floor(weight · `windowTokens`) tokens,
    * where the weights are the same kept-pool DoReMi targets the batch
    * build samples by ([[graft.sink.CorpusBuild.doremiTargets]]) — the
    * streaming twin of waterFillQuotas. A source flooding the ingest
    * (a crawler stuck on one domain) exhausts its window quota and its
    * excess documents are dropped-and-counted at the gate, so the
    * achieved mixture stays inside the monitor's [w/2, 2w] band instead
    * of just alarming about it.
    *
    * State shape: flatMapGroupsWithState keyed by (window, source) with
    * ONE long of state (tokens OFFERED so far) — K·active-windows
    * scalars cluster-wide, expired by event-time timeout one hour past
    * the window end. Admission is the PREFIX rule: a document is
    * admitted iff the group's running offered-token cumsum, taken in
    * deterministic (md5-salt, doc_id) priority order within each batch,
    * still fits the quota — exactly the window-cumsum rule the
    * hash-gated q305 batch twin replays in SQL (a skip-greedy variant
    * would admit slightly more but is not window-expressible, so batch
    * and stream could never be oracle-pinned to each other). A
    * single-batch window reproduces the batch rule row-for-row; across
    * batches the prefix accumulates in arrival order — the honest
    * semantics of a live gate. The spec pins both: one-batch parity,
    * and the quota/band properties under a two-batch flood. Input
    * schema: (ts TIMESTAMP, doc_id LONG, source STRING, n_toks LONG). */
  def admissionThrottle(docs: DataFrame, targets: Seq[(String, Double)],
      windowTokens: Double = AdmissionWindowTokens):
      Dataset[AdmitDecision] = {
    require(targets.nonEmpty, "admission targets must be non-empty")
    val sess = docs.sparkSession
    import sess.implicits._
    val wt = targets.toDF("__src", "__w")
    val win = window(col("ts"), "1 hour")
    val prepared = docs
      .withWatermark("ts", "1 hour")
      .join(broadcast(wt), col("source") === col("__src"))
      .select(col("ts"),
        date_format(win.getField("start"), TsFmt).as("wstart"),
        (unix_timestamp(win.getField("end")) * 1000).as("wend_ms"),
        col("source"), col("doc_id"),
        graft.ops.LlmKit.strHash(concat(lit("q305:"),
          col("doc_id").cast("string"))).as("h"),
        col("n_toks"),
        floor(col("__w") * lit(windowTokens)).cast("long").as("quota"))
      .as[AdmitIn]
    prepared
      .groupByKey(r => (r.wstart, r.source))
      .flatMapGroupsWithState[Long, AdmitDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((wstart, source), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cum = state.getOption.getOrElse(0L)
            val arr = rows.toArray.sortBy(r => (r.h, r.doc_id))
            val out = arr.map { r =>
              cum += r.n_toks
              AdmitDecision(wstart, source, r.doc_id, r.n_toks,
                cum <= r.quota)
            }
            state.update(cum)
            // late-arriving rows (watermark already past the window) are
            // still decided, but the expiry must never be set behind the
            // current watermark — clamp forward so the state dies on the
            // next watermark advance instead of crashing the query
            state.setTimeoutTimestamp(math.max(
              arr.head.wend_ms + 3600000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  final case class ThrottleDoc(ts: java.sql.Timestamp, wstart: String,
      wend_ms: Long, source: String, doc_id: Long, h: Long, n_toks: Long,
      quota: Long, text: String, simhash: Long)
  final case class AdmittedDoc(ts: java.sql.Timestamp, source: String,
      doc_id: Long, n_toks: Long, text: String, simhash: Long)

  /** [[admissionThrottle]]'s document-carrying form: same (window,
    * source) prefix rule, same one-long state and event-time expiry,
    * but rows keep their text and dedup signature and only ADMITTED
    * documents are emitted — the shape a publish sink consumes
    * directly. Input schema: (ts TIMESTAMP, doc_id LONG, source STRING,
    * n_toks LONG, text STRING, simhash LONG). */
  def admissionThrottleDocs(docs: DataFrame,
      targets: Seq[(String, Double)],
      windowTokens: Double = AdmissionWindowTokens):
      Dataset[AdmittedDoc] = {
    require(targets.nonEmpty, "admission targets must be non-empty")
    val sess = docs.sparkSession
    import sess.implicits._
    val wt = targets.toDF("__src", "__w")
    val win = window(col("ts"), "1 hour")
    val prepared = docs
      .withWatermark("ts", "1 hour")
      .join(broadcast(wt), col("source") === col("__src"))
      .select(col("ts"),
        date_format(win.getField("start"), TsFmt).as("wstart"),
        (unix_timestamp(win.getField("end")) * 1000).as("wend_ms"),
        col("source"), col("doc_id"),
        graft.ops.LlmKit.strHash(concat(lit("q305:"),
          col("doc_id").cast("string"))).as("h"),
        col("n_toks"),
        floor(col("__w") * lit(windowTokens)).cast("long").as("quota"),
        col("text"), col("simhash"))
      .as[ThrottleDoc]
    prepared
      .groupByKey(r => (r.wstart, r.source))
      .flatMapGroupsWithState[Long, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((_, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cum = state.getOption.getOrElse(0L)
            val arr = rows.toArray.sortBy(r => (r.h, r.doc_id))
            val out = arr.flatMap { r =>
              cum += r.n_toks
              if (cum <= r.quota)
                Some(AdmittedDoc(r.ts, r.source, r.doc_id, r.n_toks,
                  r.text, r.simhash))
              else None
            }
            state.update(cum)
            state.setTimeoutTimestamp(math.max(
              arr.head.wend_ms + 3600000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  final case class DeferIn(ts: java.sql.Timestamp, wstart: String,
      nwstart: String, wend_ms: Long, source: String, doc_id: Long,
      h: Long, n_toks: Long, quota: Long)
  final case class DeferDecision(wstart: String, source: String,
      doc_id: Long, n_toks: Long, status: String)
  final case class DeferState(wendMs: Long, cum: Long, quota: Long,
      pending: List[(Long, Long, Long, String)])

  /** [[admissionThrottle]]'s DEFER variant (r16 verdict item 3): excess
    * documents are re-offered ONCE in the next hour window instead of
    * dropped. Semantics (the window-cumsum-expressible rule the batch
    * twin q310 replays):
    *
    *  - within a window, deferred docs rank FIRST (among themselves by
    *    the same (hash, doc_id) priority), then new docs; admission is
    *    the same prefix token-cumsum ≤ quota — so the admitted set is
    *    always a rank prefix and the cross-window coupling reduces to
    *    two scalars per (source, window): the deferred-in token total
    *    and the admitted-cum boundary;
    *  - a deferred doc that misses again is DROPPED (one hop — no
    *    unbounded re-queue at 100 TB); its tokens still count in the
    *    prefix, exactly like q305's dropped docs;
    *  - new docs that overflow are deferred to the next window; docs
    *    still pending when the stream's watermark never reaches their
    *    resolution window (the span's last window) are never emitted —
    *    the batch twin counts them as `deferred_out`.
    *
    * Conservation — offered == admitted + admitted_deferred + dropped +
    * deferred_out — is pinned per (window, source) by q310's
    * `conserved` column and doc-for-doc by StreamOpsSpec. State per
    * source: current window end, running cum, quota, and the pending
    * deferral list — bounded by ONE window's overflow (the one-hop
    * rule), expiring via event-time timeout one window after the last
    * seen (resolving any pending docs first, since deferred docs'
    * admission depends only on their own cumsum, never on the next
    * window's new arrivals). Late rows for an already-advanced window
    * are decided against the CURRENT window's remaining quota — the
    * honest live-gate reading, same spirit as q305's late handling. */
  /** Shared watermark/window/priority/quota prep for the deferral
    * throttles — one definition so the one-hop and two-hop variants can
    * never disagree about ranking or quotas. */
  private def prepareDefer(docs: DataFrame,
      targets: Seq[(String, Double)],
      windowTokens: Double): Dataset[DeferIn] = {
    require(targets.nonEmpty, "admission targets must be non-empty")
    val sess = docs.sparkSession
    import sess.implicits._
    val wt = targets.toDF("__src", "__w")
    val win = window(col("ts"), "1 hour")
    docs
      .withWatermark("ts", "1 hour")
      .join(broadcast(wt), col("source") === col("__src"))
      .select(col("ts"),
        date_format(win.getField("start"), TsFmt).as("wstart"),
        date_format(win.getField("end"), TsFmt).as("nwstart"),
        (unix_timestamp(win.getField("end")) * 1000).as("wend_ms"),
        col("source"), col("doc_id"),
        graft.ops.LlmKit.strHash(concat(lit("q305:"),
          col("doc_id").cast("string"))).as("h"),
        col("n_toks"),
        floor(col("__w") * lit(windowTokens)).cast("long").as("quota"))
      .as[DeferIn]
  }

  def admissionThrottleDefer(docs: DataFrame,
      targets: Seq[(String, Double)],
      windowTokens: Double = AdmissionWindowTokens):
      Dataset[DeferDecision] = {
    val sess = docs.sparkSession
    import sess.implicits._
    val prepared = prepareDefer(docs, targets, windowTokens)
    // resolve a pending list at its next window: deferred docs rank
    // first, so their fate is their own (hash, id)-ordered cumsum vs
    // the quota; ALL their tokens (admitted or dropped) carry into the
    // window's prefix as the deferred-in total
    def resolve(pending: List[(Long, Long, Long, String)], quota: Long):
        (List[DeferDecision], Long) = {
      var d = 0L
      val out = pending.sortBy(p => (p._1, p._2)).map {
        case (_, docId, toks, nw) =>
          d += toks
          DeferDecision(nw, "", docId, toks,
            if (d <= quota) "admitted_deferred" else "dropped")
      }
      (out, d)
    }
    prepared
      .groupByKey(_.source)
      .flatMapGroupsWithState[DeferState, DeferDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (source, rows, state) =>
          if (state.hasTimedOut) {
            val st = state.get
            val (res, _) = resolve(st.pending, st.quota)
            state.remove()
            res.map(_.copy(source = source)).iterator
          } else {
            val arr = rows.toArray.sortBy(r => (r.wend_ms, r.h, r.doc_id))
            val quota = arr.head.quota
            var st = state.getOption
              .getOrElse(DeferState(arr.head.wend_ms, 0L, quota, Nil))
            val out = scala.collection.mutable.ArrayBuffer
              .empty[DeferDecision]
            for (r <- arr) {
              while (r.wend_ms > st.wendMs) {
                val (res, tdNext) = resolve(st.pending, quota)
                out ++= res.map(_.copy(source = source))
                st = DeferState(st.wendMs + 3600000L, tdNext, quota, Nil)
              }
              st = st.copy(cum = st.cum + r.n_toks)
              if (st.cum <= quota)
                out += DeferDecision(r.wstart, source, r.doc_id,
                  r.n_toks, "admitted")
              else
                st = st.copy(pending =
                  (r.h, r.doc_id, r.n_toks, r.nwstart) :: st.pending)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              st.wendMs + 3600000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  final case class Defer2State(wendMs: Long, cum: Long, quota: Long,
      pending: List[(Long, Long, Long, Long, Int)])

  /** [[admissionThrottleDefer]] generalized to TWO hops (r17 verdict
    * item 5): a document that overflows its first window is re-offered
    * in the next window (hop 1) and, if it misses again, ONCE more in
    * the window after that (hop 2) before being dropped. Priority
    * within a window is hop-descending — the hop-2 cohort ranks first,
    * then hop-1, then new documents; within a cohort the same
    * (hash, doc_id) order as everywhere else. Admission stays the
    * prefix token-cumsum ≤ quota, so the admitted set of every cohort
    * is a rank prefix and the cross-window coupling collapses to FOUR
    * scalars per (source, window) — deferred-in token totals t1/t2 and
    * admitted-cum boundaries a0/a1 — which is exactly the recurrence
    * the batch twin q314 unrolls (its `conserved` column certifies the
    * rollup). Key property the expressibility argument leans on: a
    * deferred cohort's admission depends only on the PRIOR windows'
    * scalars and its own cumsum, never on the resolution window's new
    * arrivals — which is why a state timeout may resolve both
    * remaining hops immediately (≤ 2 bounded rounds) instead of
    * waiting for rows that will never come. State per source is
    * bounded by TWO windows' overflow. Emitted statuses: `admitted`,
    * `admitted_h1`, `admitted_h2`, `dropped`. */
  def admissionThrottleDefer2(docs: DataFrame,
      targets: Seq[(String, Double)],
      windowTokens: Double = AdmissionWindowTokens):
      Dataset[DeferDecision] = {
    val sess = docs.sparkSession
    import sess.implicits._
    val prepared = prepareDefer(docs, targets, windowTokens)
    // resolve the pending cohorts at the window STARTING at `wsMs`:
    // hop-2 docs first, then hop-1, each by (hash, id); every pending
    // token (admitted or not) carries into the window's prefix; hop-1
    // misses re-pend at the NEXT window as hop 2, hop-2 misses drop.
    // Returns (decisions, carried token total, re-pends).
    def resolve2(pending: List[(Long, Long, Long, Long, Int)],
        quota: Long, wsMs: Long): (List[DeferDecision], Long,
        List[(Long, Long, Long, Long, Int)]) = {
      var cum = 0L
      var repends = List.empty[(Long, Long, Long, Long, Int)]
      // built per call: DateTimeFormatter is not serializable, so it
      // must not be captured by the flatMapGroupsWithState closure
      val ws = java.time.format.DateTimeFormatter.ofPattern(TsFmt)
        .withZone(java.time.ZoneId.of("UTC"))
        .format(java.time.Instant.ofEpochMilli(wsMs))
      val out = pending.sortBy(p => (-p._5, p._1, p._2)).map {
        case (h, docId, toks, _, hop) =>
          cum += toks
          if (cum <= quota)
            Some(DeferDecision(ws, "", docId, toks, s"admitted_h$hop"))
          else if (hop == 1) {
            repends ::= ((h, docId, toks, wsMs + 3600000L, 2))
            None
          } else
            Some(DeferDecision(ws, "", docId, toks, "dropped"))
      }.flatten
      (out, cum, repends.reverse)
    }
    prepared
      .groupByKey(_.source)
      .flatMapGroupsWithState[Defer2State, DeferDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (source, rows, state) =>
          if (state.hasTimedOut) {
            // bounded two-round drain: deferred admissions never depend
            // on new arrivals, so both hops resolve immediately
            var st = state.get
            val out = scala.collection.mutable.ArrayBuffer
              .empty[DeferDecision]
            var wsMs = st.wendMs
            var pend = st.pending
            while (pend.nonEmpty) {
              val (res, _, rep) = resolve2(pend, st.quota, wsMs)
              out ++= res.map(_.copy(source = source))
              pend = rep
              wsMs += 3600000L
            }
            state.remove()
            out.iterator
          } else {
            val arr = rows.toArray.sortBy(r => (r.wend_ms, r.h, r.doc_id))
            val quota = arr.head.quota
            var st = state.getOption
              .getOrElse(Defer2State(arr.head.wend_ms, 0L, quota, Nil))
            val out = scala.collection.mutable.ArrayBuffer
              .empty[DeferDecision]
            for (r <- arr) {
              while (r.wend_ms > st.wendMs) {
                val (res, carried, repends) =
                  resolve2(st.pending, quota, st.wendMs)
                out ++= res.map(_.copy(source = source))
                st = Defer2State(st.wendMs + 3600000L, carried, quota,
                  repends)
              }
              st = st.copy(cum = st.cum + r.n_toks)
              if (st.cum <= quota)
                out += DeferDecision(r.wstart, source, r.doc_id,
                  r.n_toks, "admitted")
              else
                st = st.copy(pending =
                  (r.h, r.doc_id, r.n_toks, r.wend_ms, 1) :: st.pending)
            }
            state.update(st)
            // the drain may need up to TWO windows past the last seen
            state.setTimeoutTimestamp(math.max(
              st.wendMs + 7200000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** The full ingest control loop, composed as the bronze→silver chain
    * a production lake runs: stage 1 ([[ingestCorpus]]) lands the
    * gate/decontamination/dedup survivors exactly-once under
    * `stageDir`; stage 2 re-reads the landed batches AS A STREAM and
    * meters them through [[admissionThrottleDocs]] with the kept-pool
    * DoReMi targets, landing only the ADMITTED documents under
    * `outDir`. Chaining through storage keeps each query a single
    * stateful operator (Spark's arbitrary-state op does not compose
    * with the watermark dedup inside one query plan) and gives the
    * gate a natural replay/backfill point — the staged survivors are
    * themselves an exactly-once corpus. Both stages run
    * Trigger.AvailableNow to completion; quotas come from
    * floor(weight · `windowTokens`) exactly as q305's hash-gated twin
    * replays. */
  def throttledIngestCorpus(docs: DataFrame, evalDocs: DataFrame,
      targets: Seq[(String, Double)], stageDir: String, outDir: String,
      checkpointRoot: String,
      windowTokens: Double = AdmissionWindowTokens): Unit = {
    val sess = docs.sparkSession
    ingestCorpus(docs, evalDocs, stageDir, s"$checkpointRoot/gate")
      .awaitTermination()
    val survivors = sess.readStream
      .schema("ts TIMESTAMP, doc_id LONG, text STRING, simhash LONG, " +
        "ingest_batch LONG, source STRING")
      .option("basePath", stageDir)
      .parquet(stageDir)
      .select(col("ts"), col("doc_id"), col("source").cast("string")
        .as("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"),
        col("text"), col("simhash"))
    val admitted = admissionThrottleDocs(survivors, targets, windowTokens)
    publishStream(admitted.toDF()
      .select(col("ts"), col("doc_id"), col("text"), col("simhash"),
        col("source")),
      outDir, s"$checkpointRoot/admit")
      .awaitTermination()
  }

  /** Streaming JDBC ingestion: each microbatch appends through the batch
    * sink path (same batchsize-50000 writer as [[graft.sink.JdbcSink]]),
    * giving the reference's one-shot import a continuous form. Exactly-once
    * requires an idempotent target (append of deduped events is). */
  def jdbcSink(events: DataFrame, url: String, table: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sink.JdbcSink.writeTable(batch.toDF(), url, table)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming corpus publish: each microbatch lands through
    * [[graft.sink.CorpusPublish.publishBatch]] under a deterministic
    * `ingest_batch=<id>` path, so a replayed batch overwrites its own
    * previous attempt — effective exactly-once into plain parquet (the
    * continuous form of the batch publisher's layout; same source
    * partitioning, in-file sort, and file bounds below each batch dir).
    * The `_manifest` is NOT updated per batch (a half-written manifest
    * is worse than none); regenerate it from the files with
    * `CorpusPublish.manifestOf(..., excludeCols = Set("ingest_batch"))`
    * when the stream quiesces — it certifies what is on disk either way.
    * `outDir` must be a fresh or streaming-published directory: the batch
    * publisher's `source=X/…` layout conflicts with this path's
    * `ingest_batch=N/source=X/…` one, and publishBatch refuses to mix
    * them; a batch-id restart against already-committed batches (new
    * checkpoint, same outDir) throws instead of clobbering — see the
    * commit protocol on [[graft.sink.CorpusPublish.publishBatch]]. */
  def publishStream(docs: DataFrame, outDir: String, checkpoint: String,
      maxRecordsPerFile: Int = 100000)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          graft.sink.CorpusPublish.publishBatch(
            batch.toDF(), outDir, id, "source", "doc_id", maxRecordsPerFile)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // ---- explicit state: flatMapGroupsWithState ---------------------------

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  final case class UserAgg(user_id: Long, n_events: Long)

  /** Per-user lifetime event count, emitted once the user has been idle
    * past the watermark (EventTimeTimeout) — the custom-state shape that
    * windowed aggregations can't express. State is one long per live user,
    * bounded by the watermark. */
  def userActivity(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.get
            state.remove()
            Iterator.single(UserAgg(uid, n))
          } else {
            state.update(state.getOption.getOrElse(0L) + evs.size)
            // flush once the watermark moves 10 min past what we've seen
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 600000L)
            Iterator.empty
          }
      }
  }

  final case class FirstTouch(user_id: Long, first_day: String)

  /** Per-user first-touch extraction — the streaming half of q167's
    * growth ledger: emit each user's first calendar day exactly once, on
    * the microbatch where the user first appears; every later event is a
    * returning visit and emits nothing. State is ONE boolean per user
    * ever seen — the registration-dedup state a growth pipeline
    * genuinely must carry for its lifetime (production bounds it with a
    * TTL or swaps in a bloom filter once exactness stops mattering; the
    * shape is identical). Day strings are formatted in UTC to match the
    * batch side's session-timezone date_format (Sessions pins UTC).
    * Downstream, `groupBy(first_day).count` IS q167's n_new column —
    * the spec asserts that equality, so the stream is gated against an
    * oracle-checked batch twin. */
  def firstTouch(events: Dataset[Ev]): Dataset[FirstTouch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, FirstTouch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val first = evs.minBy(_.ts.getTime)
            state.update(true)
            val day = java.time.Instant.ofEpochMilli(first.ts.getTime)
              .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            Iterator.single(FirstTouch(uid, day))
          }
      }
  }
}
