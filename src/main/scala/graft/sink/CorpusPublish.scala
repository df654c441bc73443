package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Last-mile publisher for a curated corpus: the write layout a training
  * job actually consumes (reference analog: loader.py's batched INSERT is
  * the reference's only sink; this is the parquet-native equivalent at
  * corpus scale, SURVEY.md §5).
  *
  * Layout contract, all enforced by `CorpusPublishSpec`:
  *  - hive-partitioned by `partitionCol` (one directory per source) so a
  *    training job reading one slice scans one directory — partition
  *    pruning, not a filter over 100 TB;
  *  - ONE shuffle: `repartition(partitionCol)` co-locates each partition's
  *    rows before the write, so a 1000-executor run emits one file set per
  *    partition value instead of executors × partitions small files (the
  *    classic small-file explosion);
  *  - `maxRecordsPerFile` bounds every file so downstream readers get
  *    splittable, evenly-sized inputs regardless of source skew;
  *  - rows inside each file sorted by `sortCol` (`sortWithinPartitions`
  *    after the repartition — no global sort): parquet writes min/max
  *    stats per row group, so point lookups prune row groups, and the
  *    byte layout is deterministic for a given input;
  *  - a `_manifest` dataset (per-partition row count + order-independent
  *    content checksum) published next to the data — the sign-off /
  *    resume artifact; checksum is the bitwise XOR of per-row 64-bit
  *    hashes, so it is independent of row order and file split (and
  *    overflow-free under ANSI arithmetic); paired with `n_rows` because
  *    XOR alone cancels identical-row pairs — the publish input is a
  *    curated keep-set, so identical rows indicate an upstream bug the
  *    count still surfaces.
  *
  * The batch ([[publish]]) and streaming ([[publishBatch]]) paths write
  * INCOMPATIBLE hive layouts (`source=X/…` vs `ingest_batch=N/source=X/…`)
  * and therefore refuse to write into each other's directories — mixing
  * them would make partition discovery fail on the whole corpus.
  */
object CorpusPublish {

  final case class PartitionManifest(
      partition: String, n_rows: Long, checksum: Long)

  // Marker and layout-guard file probes use java.nio (local paths) to
  // match this project's local-mode harness; on a cluster the same
  // protocol runs over org.apache.hadoop.fs.FileSystem — the logic
  // (probe marker, compare token, write marker last) is FS-agnostic.

  /** The one definition of the on-disk layout — both publish paths write
    * through here, so the shape below a batch directory cannot drift from
    * the batch publisher's. */
  private def writeLayout(
      df: DataFrame,
      path: String,
      partitionCol: String,
      sortCol: String,
      maxRecordsPerFile: Int): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Top-level `name=value` hive directories under `dir`, excluding the
    * given prefixes — the layout-conflict probes list what partition
    * columns a directory already commits to, whatever their names. */
  private def hivePartitionDirs(
      dir: String, excludePrefixes: Seq[String]): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val found = Seq.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.contains("=") && !n.startsWith("_") &&
            !excludePrefixes.exists(n.startsWith))
            found += n
        }
        found.result()
      } finally s.close()
    }
  }

  /** Writes `df` under `outDir` partitioned by `partitionCol`; returns the
    * manifest (also written to `outDir/_manifest`). Overwrite semantics:
    * a re-publish of the same input yields byte-identical layout and
    * checksums (proven idempotent in the spec). */
  def publish(
      df: DataFrame,
      outDir: String,
      partitionCol: String,
      sortCol: String,
      maxRecordsPerFile: Int): Seq[PartitionManifest] = {
    val existing = hivePartitionDirs(outDir, Seq(s"$partitionCol="))
    require(existing.isEmpty,
      s"$outDir already holds a conflicting hive layout " +
        s"(${existing.take(3).mkString(", ")}…); batch publish with " +
        s"partitionCol=$partitionCol into it would break partition " +
        "discovery for the whole corpus")
    writeLayout(df, outDir, partitionCol, sortCol, maxRecordsPerFile)

    val spark = df.sparkSession
    val manifest = manifestOf(spark, outDir, partitionCol)
    spark.createDataFrame(manifest)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Per-partition row count + order-independent checksum of the published
    * data: XOR of xxhash64 over every non-partition column, read back from
    * the files themselves (so the manifest certifies what is on disk, not
    * what the writer intended to put there). `excludeCols` drops layout
    * bookkeeping columns (e.g. the streaming path's `ingest_batch`) from
    * the checksum so batch and streaming publishes of the same rows
    * certify identically. */
  def manifestOf(
      spark: SparkSession,
      outDir: String,
      partitionCol: String,
      excludeCols: Set[String] = Set.empty): Seq[PartitionManifest] = {
    import spark.implicits._
    val published = spark.read.parquet(outDir)
    val dataCols = published.columns
      .filter(c => c != partitionCol && !excludeCols(c)).sorted
    published
      .groupBy(col(partitionCol).cast("string").as("partition"))
      .agg(
        count(lit(1)).as("n_rows"),
        bit_xor(xxhash64(dataCols.map(col): _*)).as("checksum"))
      .as[PartitionManifest]
      .collect()
      .sortBy(_.partition)
      .toSeq
  }

  /** One streaming microbatch, published under a DETERMINISTIC per-batch
    * path (`outDir/ingest_batch=<id>`) with `mode(overwrite)` scoped to
    * that path: a replayed batch (failure after write, before the
    * checkpoint commit) overwrites its own previous attempt instead of
    * appending duplicates — effective exactly-once from an at-least-once
    * retry contract, with no transactional sink. Layout below the batch
    * directory is [[writeLayout]], identical to the batch publisher's;
    * `spark.read.parquet(outDir)` discovers both hive levels, and a
    * `source = X` filter still partition-prunes across batches.
    *
    * Commit protocol against BATCH-ID RESTARTS (new/deleted checkpoint
    * pointing at an already-published outDir — batchIds restart at 0 and
    * the deterministic path would silently clobber committed data): a
    * `_graft_commit` marker holding the batch's content token is written
    * atomically AFTER the data. On arrival at a batch path:
    *  - no marker → previous attempt died mid-write → overwrite (replay);
    *  - marker matches this batch's token → the batch is already
    *    committed and identical → no-op (replay after a lost checkpoint
    *    commit);
    *  - marker differs → a DIFFERENT batch committed here → throw; this
    *    is a batch-id collision, not a replay, and overwriting would lose
    *    published data.
    *
    * The token is `count : xor-of-row-hashes : exact-decimal-sum-of-row-
    * hashes` — XOR alone cancels on duplicate-row pairs (so {A,A,B} and
    * {C,C,B} would collide), the additive sum breaks exactly that
    * ambiguity, and together a collision needs equal count AND equal xor
    * AND equal sum of 64-bit hashes.
    *
    * CONTRACT: the batch content must be deterministic under replay (the
    * standard requirement for any idempotent Spark sink) — a
    * processing-time column or non-deterministic UDF in the stream makes
    * a legitimate replay token-mismatch and throw. Put such columns in
    * the layout path (like `ingest_batch` itself), not the data. */
  def publishBatch(
      batch: DataFrame,
      outDir: String,
      batchId: Long,
      partitionCol: String,
      sortCol: String,
      maxRecordsPerFile: Int): Unit = {
    val existing = hivePartitionDirs(outDir, Seq("ingest_batch="))
    require(existing.isEmpty,
      s"$outDir already holds a conflicting hive layout " +
        s"(${existing.take(3).mkString(", ")}…); streaming publish into " +
        "it would break partition discovery for the whole corpus")
    batch.persist()
    try {
      val dataCols = batch.columns.sorted
      val h = xxhash64(dataCols.map(col): _*)
      val tok = batch
        .agg(count(lit(1)).as("n"), bit_xor(h).as("x"),
          sum(h.cast("decimal(38,0)")).as("s"))
        .head()
      val token = s"${tok.getLong(0)}:" +
        s"${if (tok.isNullAt(1)) 0L else tok.getLong(1)}:" +
        s"${if (tok.isNullAt(2)) "0" else tok.getDecimal(2).toBigInteger}"
      val path = s"$outDir/ingest_batch=$batchId"
      val marker = Paths.get(path, "_graft_commit")
      if (Files.exists(marker)) {
        val prev =
          new String(Files.readAllBytes(marker), StandardCharsets.UTF_8)
        if (prev == token) return // committed replay — idempotent no-op
        throw new IllegalStateException(
          s"batch $batchId already committed at $path with different " +
            s"content ($prev vs $token): batch-id restart against a " +
            "published corpus — refusing to clobber")
      }
      writeLayout(batch, path, partitionCol, sortCol, maxRecordsPerFile)
      // atomic marker publish: a crash mid-write must leave NO marker
      // (overwritable attempt), never a torn one (poisoned replays)
      val tmp = Paths.get(path, "._graft_commit.tmp")
      Files.write(tmp, token.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, marker,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally batch.unpersist()
  }
}
