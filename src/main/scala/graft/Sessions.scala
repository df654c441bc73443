package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for every entrypoint (Verify, Bench,
  * Scratch, tests). Keeps session-level flags in ONE place so no query
  * builder ever mutates conf as a side effect.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // keep saveAsTable data out of the working tree (static conf, so it
      // must be set here, not via spark.conf)
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read the raw long and
      // convert explicitly (OpsKit.events) instead of failing the scan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Derby-backed tests and the JDBC sink share the driver JVM.
      .config("spark.sql.adaptive.enabled", "true")
      // Bounded single-partition windows are written as
      // partitionBy(lit(0)) (OpsKit.boundedWin) so WindowExec's "No
      // Partition Defined" warning stays a real signal for UNINTENDED
      // global windows; EliminateWindowPartitions would fold the
      // constant away and resurrect the warning (and the empty spec) on
      // every sanctioned site, so it is excluded. The rule only ever
      // fires on foldable partition keys — which this codebase produces
      // solely through boundedWin, by design.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
}
