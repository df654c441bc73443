package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
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

  // ALL marker and layout-guard I/O goes through the Hadoop FileSystem
  // resolved from the output path itself, so the protocol runs unchanged
  // on local paths, file://, and hdfs:// — the probe cannot silently
  // "see no marker" just because the path is not java.io-local. S3
  // CAVEAT: S3A has no atomic rename — the marker publish degrades to
  // copy+delete, so a crash inside the rename can leave a torn marker
  // there; on S3 pair this sink with an S3A committer or a manifest
  // check, as with any rename-commit Spark sink.
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

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
      spark: SparkSession,
      dir: String,
      excludePrefixes: Seq[String]): Seq[String] = {
    val fs = fsFor(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Seq.empty
    else
      fs.listStatus(p).iterator.map(_.getPath.getName).filter { n =>
        n.contains("=") && !n.startsWith("_") &&
        !excludePrefixes.exists(n.startsWith)
      }.toSeq
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
    val spark = df.sparkSession
    val existing = hivePartitionDirs(spark, outDir, Seq(s"$partitionCol="))
    require(existing.isEmpty,
      s"$outDir already holds a conflicting hive layout " +
        s"(${existing.take(3).mkString(", ")}…); batch publish with " +
        s"partitionCol=$partitionCol into it would break partition " +
        "discovery for the whole corpus")
    writeLayout(df, outDir, partitionCol, sortCol, maxRecordsPerFile)

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
    * via rename AFTER the data (atomic on local FS and HDFS; see the S3
    * caveat on [[fsFor]]). On arrival at a batch path:
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
    * CONTRACT — single writer per (outDir, batchId): the marker protocol
    * serializes RESTARTS, not RACES. Two live writers on the same batch
    * path can interleave writeLayout's delete+write before either marker
    * lands, leaving mixed data under one marker. This is the standard
    * Spark file-sink contract (one streaming query owns one checkpoint
    * owns one outDir); the no-overwrite tmp-marker create below makes the
    * second concurrent committer fail loudly rather than silently win.
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
    val spark = batch.sparkSession
    val existing = hivePartitionDirs(spark, outDir, Seq("ingest_batch="))
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
      val fs = fsFor(spark, outDir)
      val marker = new Path(path, "_graft_commit")
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val prev =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](4096)
            var n = in.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            new String(buf.toByteArray, "UTF-8")
          } finally in.close()
        if (prev == token) return // committed replay — idempotent no-op
        throw new IllegalStateException(
          s"batch $batchId already committed at $path with different " +
            s"content ($prev vs $token): batch-id restart against a " +
            "published corpus — refusing to clobber")
      }
      // mode(overwrite) wipes the batch dir first, so a stale tmp marker
      // from a crashed attempt cannot block this one
      writeLayout(batch, path, partitionCol, sortCol, maxRecordsPerFile)
      // marker publish via rename: a crash mid-write must leave NO marker
      // (overwritable attempt), never a torn one (poisoned replays).
      // overwrite=false on the tmp create makes a second concurrent
      // committer on the same batch path fail fast instead of racing.
      val tmp = new Path(path, "._graft_commit.tmp")
      val os = fs.create(tmp, /* overwrite = */ false)
      try os.write(token.getBytes("UTF-8"))
      finally os.close()
      if (!fs.rename(tmp, marker))
        throw new IllegalStateException(
          s"could not publish commit marker $marker (rename failed — " +
            "concurrent writer on the same batch path?)")
    } finally batch.unpersist()
  }

  final case class RangeFileManifest(
      file: String, seq: Int, min_key: Long, max_key: Long, n_rows: Long)

  /** GLOBAL-TOTAL-ORDER publish: the warehouse layout primitive the
    * hive-partitioned paths above cannot express — `ORDER BY key` across
    * the WHOLE corpus, at scale. A single-partition `orderBy().write`
    * funnels 100 TB through one task; the scale-safe form (TeraSort's,
    * and what Spark's own global sort plans) is sampled range boundaries:
    * `repartitionByRange` samples O(partitions) keys, broadcasts the
    * cut points, and every executor shuffles rows to their range — ONE
    * shuffle, no global funnel — then sorts its range locally. The
    * resulting files ARE the total order: file ranges are pairwise
    * disjoint and rows are sorted within each file, so a merge-reader
    * (or a BETWEEN-predicate reader: parquet min/max footer stats prune
    * whole files) consumes the corpus in key order without re-sorting.
    *
    * Published next to the data: `_range_manifest`, one row per file with
    * its [min,max] key range and row count, read back FROM THE FILES (it
    * certifies what is on disk, not what the writer intended). `seq` is
    * the file's position in the total order. Certification that the
    * ranges are disjoint/ordered/complete is q255's oracle-gated job.
    *
    * Determinism caveat (why the manifest carries ranges, not expected
    * file SPLITS): the sampled cut points depend on the input's partition
    * layout, so two publishes of the same rows from different upstream
    * plans may split files differently while still certifying the same
    * total order — the [[manifestOf]]-style row-content checksum is the
    * layout-independent completeness witness. */
  def publishGlobalSorted(
      df: DataFrame,
      outDir: String,
      sortCol: String,
      numFiles: Int): Seq[RangeFileManifest] = {
    val spark = df.sparkSession
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(outDir)
    val manifest = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(sortCol)).cast("long").as("min_key"),
        max(col(sortCol)).cast("long").as("max_key"),
        count(lit(1)).as("n_rows"))
      .collect() // bounded: one row per published file (≤ numFiles)
      .sortBy(r => r.getLong(1))
      .zipWithIndex
      .map { case (r, i) =>
        RangeFileManifest(r.getString(0), i, r.getLong(1), r.getLong(2),
          r.getLong(3))
      }
      .toSeq
    spark.createDataFrame(manifest)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/_range_manifest")
    manifest
  }
}
