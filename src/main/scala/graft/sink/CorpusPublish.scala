package graft.sink

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
  */
object CorpusPublish {

  final case class PartitionManifest(
      partition: String, n_rows: Long, checksum: Long)

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
    df.repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .parquet(outDir)

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
    * directory is the same source-partitioned/sorted/bounded shape as
    * [[publish]]; `spark.read.parquet(outDir)` discovers both hive levels,
    * and a `source = X` filter still partition-prunes across batches. */
  def publishBatch(
      batch: DataFrame,
      outDir: String,
      batchId: Long,
      partitionCol: String,
      sortCol: String,
      maxRecordsPerFile: Int): Unit =
    batch
      .repartition(col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .parquet(s"$outDir/ingest_batch=$batchId")
}
